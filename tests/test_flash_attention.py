import jax
import jax.numpy as jnp
import numpy as np
import pytest

from holoagent_tpu.ops.flash_attention import flash_attention


def _ref_attention(q, k, v, causal=False):
    b, h, t, d = q.shape
    s = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d)
    if causal:
        mask = np.tril(np.ones((t, t), bool))
        s = np.where(mask, s, -np.inf)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("t", [256, 384])
def test_flash_matches_reference(rng, causal, t):
    b, h, d = 2, 3, 64
    q = rng.normal(0, 1, (b, h, t, d)).astype(np.float32)
    k = rng.normal(0, 1, (b, h, t, d)).astype(np.float32)
    v = rng.normal(0, 1, (b, h, t, d)).astype(np.float32)
    out = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        causal=causal, block_q=128, block_k=128, interpret=True,
    )
    ref = _ref_attention(q, k, v, causal)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3, rtol=2e-3)


def test_flash_unaligned_length(rng):
    """T not a multiple of the block: padded keys must not leak attention."""
    b, h, t, d = 1, 2, 200, 64
    q = rng.normal(0, 1, (b, h, t, d)).astype(np.float32)
    k = rng.normal(0, 1, (b, h, t, d)).astype(np.float32)
    v = rng.normal(0, 1, (b, h, t, d)).astype(np.float32)
    out = flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        block_q=128, block_k=128, interpret=True,
    )
    ref = _ref_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3, rtol=2e-3)
