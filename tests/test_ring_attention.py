import jax.numpy as jnp
import numpy as np
import pytest

from holoagent_tpu.config import MeshConfig
from holoagent_tpu.parallel import make_mesh
from holoagent_tpu.parallel.ring_attention import ring_attention


def _ref(q, k, v, causal=False):
    b, h, t, d = q.shape
    s = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d)
    if causal:
        s = np.where(np.tril(np.ones((t, t), bool)), s, -np.inf)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_matches_reference(rng, causal):
    mesh = make_mesh(MeshConfig(data=-1, model=1))
    nd = mesh.shape["data"]
    b, h, d = 1, 2, 32
    t = 16 * nd
    q = rng.normal(0, 1, (b, h, t, d)).astype(np.float32)
    k = rng.normal(0, 1, (b, h, t, d)).astype(np.float32)
    v = rng.normal(0, 1, (b, h, t, d)).astype(np.float32)
    out = ring_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mesh, causal=causal
    )
    np.testing.assert_allclose(
        np.asarray(out), _ref(q, k, v, causal), atol=2e-4, rtol=2e-4
    )
