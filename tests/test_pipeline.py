"""Pipeline parallelism (SURVEY.md §2.4 new design obligation: GPipe-style
microbatched stage execution over a mesh axis via shard_map + ppermute)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from holoagent_tpu.parallel.pipeline import pipeline_apply, stack_stages


def _mesh(n, name="stage"):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.array(devs[:n]), (name,))


def _mlp_stage(p, h):
    return jnp.tanh(h @ p["w"] + p["b"])


def _stages(key, n, d):
    ks = jax.random.split(key, n)
    return [
        {"w": jax.random.normal(k, (d, d), jnp.float32) * 0.3,
         "b": jnp.zeros((d,), jnp.float32)}
        for k in ks
    ]


def test_pipeline_matches_sequential():
    """S=4 stages x M=8 microbatches over the ring == the plain loop."""
    d = 16
    stages = _stages(jax.random.key(0), 4, d)
    x = jax.random.normal(jax.random.key(1), (8, 5, d), jnp.float32)
    mesh = _mesh(4)
    out = pipeline_apply(_mlp_stage, stack_stages(stages), x, mesh)
    ref = x
    for p in stages:
        ref = jax.vmap(lambda h: _mlp_stage(p, h))(ref)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pipeline_single_microbatch():
    d = 8
    stages = _stages(jax.random.key(2), 8, d)
    x = jax.random.normal(jax.random.key(3), (1, 3, d), jnp.float32)
    mesh = _mesh(8)
    out = pipeline_apply(_mlp_stage, stack_stages(stages), x, mesh)
    ref = x
    for p in stages:
        ref = jax.vmap(lambda h: _mlp_stage(p, h))(ref)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pipeline_transformer_blocks():
    """Pipelining real transformer blocks (the VLM stack's stage shape)."""
    from holoagent_tpu.models import transformer as tfm

    width, heads, layers = 32, 4, 4
    keys = jax.random.split(jax.random.key(4), layers)

    def init_block(k):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        s = 0.2
        return {
            "ln1_g": jnp.ones((width,)), "ln1_b": jnp.zeros((width,)),
            "wqkv": jax.random.normal(k1, (width, 3 * width)) * s,
            "bqkv": jnp.zeros((3 * width,)),
            "wo": jax.random.normal(k2, (width, width)) * s,
            "bo": jnp.zeros((width,)),
            "ln2_g": jnp.ones((width,)), "ln2_b": jnp.zeros((width,)),
            "w1": jax.random.normal(k3, (width, 4 * width)) * s,
            "b1": jnp.zeros((4 * width,)),
            "w2": jax.random.normal(k4, (4 * width, width)) * s,
            "b2": jnp.zeros((width,)),
        }

    stages = [init_block(k) for k in keys]
    stage_fn = lambda p, h: tfm.block(h, p, heads)  # noqa: E731
    x = jax.random.normal(jax.random.key(5), (4, 2, 6, width), jnp.float32)
    mesh = _mesh(4)
    out = pipeline_apply(stage_fn, stack_stages(stages), x, mesh)
    ref = x
    for p in stages:
        ref = jax.vmap(lambda h: tfm.block(h, p, heads))(ref)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
