import jax
import jax.numpy as jnp
import numpy as np
import pytest

from holoagent_tpu.ops.flash_attention import flash_attention, flash_attention_2d


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


@pytest.mark.parametrize("g", [16, 32])
def test_flash2d_matches_relpos_reference(rng, g):
    """Decomposed rel-pos flash == dense rel-pos attention (SAM global attn)."""
    bh, d = 3, 32
    n = g * g
    q = rng.normal(0, 1, (bh, n, d)).astype(np.float32)
    k = rng.normal(0, 1, (bh, n, d)).astype(np.float32)
    v = rng.normal(0, 1, (bh, n, d)).astype(np.float32)
    rel_h = rng.normal(0, 0.5, (2 * g - 1, d)).astype(np.float32)
    rel_w = rng.normal(0, 0.5, (2 * g - 1, d)).astype(np.float32)
    # dense reference: bias(n, m) = q_n . rel_h[y-y'] + q_n . rel_w[x-x']
    idx = np.arange(g)
    rel = idx[:, None] - idx[None, :] + g - 1
    rh = rel_h[rel]  # (g, g, d) [y, y']
    rw = rel_w[rel]
    qg = q.reshape(bh, g, g, d)
    bias_h = np.einsum("byxd,ykd->byxk", qg, rh)  # (bh, g, g, g) over key rows
    bias_w = np.einsum("byxd,xkd->byxk", qg, rw)
    s = np.einsum("bnd,bmd->bnm", q, k) / np.sqrt(d)
    s = s.reshape(bh, g, g, g, g)
    s = s + bias_h[..., :, None] + bias_w[..., None, :]
    s = s.reshape(bh, n, n)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    ref = np.einsum("bnm,bmd->bnd", p, v)
    out = flash_attention_2d(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(bias_h.reshape(bh, n, g)), jnp.asarray(bias_w.reshape(bh, n, g)),
        grid_hw=(g, g), block_q=128 if n % 128 == 0 else 64, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3, rtol=2e-3)


def test_sam_encoder_flash_matches_xla(rng):
    """encode_image(impl='flash') == encode_image(impl='xla') on a tiny SAM."""
    import dataclasses

    from holoagent_tpu.models import sam as sam_mod

    # tiny variant with a 16x16 global grid so the kernel path engages
    v = dataclasses.replace(
        sam_mod.VARIANTS["test-tiny"], img_size=64, patch=4, window=2
    )
    params = sam_mod.init_sam(jax.random.key(0), v)
    img = jnp.asarray(rng.uniform(0, 1, (1, v.img_size, v.img_size, 3)), jnp.float32)
    ref = sam_mod.encode_image(params["encoder"], img, v, dtype=jnp.float32, impl="xla")
    out = sam_mod.encode_image(
        params["encoder"], img, v, dtype=jnp.float32, impl="flash", interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3, rtol=2e-3)


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


def test_sam_encoder_flash_falls_back_on_nontiling_grid(rng):
    """g=24 (n=576: block_q=64 divides, block_k=120 doesn't) must take the
    XLA path instead of crashing in the kernel's tiling assert."""
    import dataclasses

    from holoagent_tpu.models import sam as sam_mod

    v = dataclasses.replace(
        sam_mod.VARIANTS["test-tiny"], img_size=96, patch=4, window=2
    )  # 24x24 global grid
    params = sam_mod.init_sam(jax.random.key(0), v)
    img = jnp.asarray(rng.uniform(0, 1, (1, v.img_size, v.img_size, 3)), jnp.float32)
    ref = sam_mod.encode_image(params["encoder"], img, v, dtype=jnp.float32, impl="xla")
    out = sam_mod.encode_image(
        params["encoder"], img, v, dtype=jnp.float32, impl="flash", interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_sam_encoder_flash_matches_xla_bf16(rng):
    """bf16 production path: the f32 bias/scale handling inside the flash
    wrapper must keep parity with the XLA path at bf16 tolerances."""
    import dataclasses

    from holoagent_tpu.models import sam as sam_mod

    v = dataclasses.replace(
        sam_mod.VARIANTS["test-tiny"], img_size=64, patch=4, window=2
    )
    params = sam_mod.init_sam(jax.random.key(0), v)
    img = jnp.asarray(rng.uniform(0, 1, (1, v.img_size, v.img_size, 3)), jnp.float32)
    ref = sam_mod.encode_image(
        params["encoder"], img, v, dtype=jnp.bfloat16, impl="xla"
    ).astype(jnp.float32)
    out = sam_mod.encode_image(
        params["encoder"], img, v, dtype=jnp.bfloat16, impl="flash", interpret=True
    ).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.05, rtol=0.05)
