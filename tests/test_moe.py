"""Expert parallelism (SURVEY.md §2.4: top-k MoE with experts sharded over a
mesh axis, all_to_all token routing, fixed per-device capacity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from holoagent_tpu.parallel.moe import (
    init_moe_mlp,
    moe_apply,
    moe_dense_reference,
)


def _mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.array(devs[:n]), ("expert",))


def test_moe_matches_dense_reference():
    """Under capacity, the routed EP forward equals computing every expert
    densely and combining by the same gate."""
    e, d, dh, t = 8, 16, 32, 24
    params = init_moe_mlp(jax.random.key(0), e, d, dh)
    gate_w = jax.random.normal(jax.random.key(1), (d, e)) * 0.5
    x = jax.random.normal(jax.random.key(2), (t, d), jnp.float32)
    mesh = _mesh(8)
    out = moe_apply(params, gate_w, x, mesh, top_k=2, capacity_factor=8.0)
    ref = moe_dense_reference(params, gate_w, x, top_k=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_moe_multiple_experts_per_device():
    """16 experts over 8 devices: two local experts each."""
    e, d, dh, t = 16, 8, 16, 32
    params = init_moe_mlp(jax.random.key(3), e, d, dh)
    gate_w = jax.random.normal(jax.random.key(4), (d, e)) * 0.5
    x = jax.random.normal(jax.random.key(5), (t, d), jnp.float32)
    mesh = _mesh(8)
    out = moe_apply(params, gate_w, x, mesh, top_k=2, capacity_factor=8.0)
    ref = moe_dense_reference(params, gate_w, x, top_k=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_moe_capacity_drop_is_bounded_and_renormalized():
    """Tiny capacity drops assignments but the output stays finite and the
    surviving gate weights renormalize (Switch/GShard drop semantics)."""
    e, d, dh, t = 8, 8, 16, 64
    params = init_moe_mlp(jax.random.key(6), e, d, dh)
    # gate heavily biased to expert 0 -> guaranteed overflow at low capacity
    gate_w = jnp.zeros((d, e)).at[:, 0].set(1.0)
    x = jnp.abs(jax.random.normal(jax.random.key(7), (t, d), jnp.float32))
    mesh = _mesh(8)
    out = moe_apply(params, gate_w, x, mesh, top_k=2, capacity_factor=0.25)
    assert np.isfinite(np.asarray(out)).all()
    # under generous capacity the same call matches the dense reference,
    # proving the drop path is the only divergence
    out_full = moe_apply(params, gate_w, x, mesh, top_k=2, capacity_factor=16.0)
    ref = moe_dense_reference(params, gate_w, x, top_k=2)
    np.testing.assert_allclose(np.asarray(out_full), np.asarray(ref), atol=1e-4)
    assert float(np.abs(np.asarray(out) - np.asarray(ref)).max()) > 1e-6
