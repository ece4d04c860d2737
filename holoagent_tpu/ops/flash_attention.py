"""Pallas flash attention for the transformer towers.

Blockwise online-softmax attention (never materializes the (T, T) score
matrix in HBM) for the encoder/decoder stacks.  The XLA fallback in
models.transformer materializes scores in f32 — fine for CLIP's 257 tokens,
wasteful for SAM-ViT global layers (4096 tokens) and long multi-image VLM
prefills (SURVEY.md §5.7).  Grid: (batch*heads, q blocks); K/V stream through
VMEM in BLOCK_K slices with running max/sum renormalization.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, *, block_k: int, causal: bool, scale: float,
    t_valid: int,
):
    """Head-folded flash block: refs are (1, HB, bq|tp, d); a static python
    loop over the HB heads runs each head's online-softmax sweep inside ONE
    grid step.  Folding heads into the block is what makes the kernel win at
    encoder shapes (CLIP: 129x16 heads x 257 tokens): one-(batch,head)-per-
    step grids pay per-step overhead on ~8 MFLOP dots — measured 152 ms for
    the 24-layer stack vs 128 ms XLA; head-folded: see bench notes.

    Dots stay in the input dtype (bf16 on the MXU, f32 accumulation) — same
    numerics as the XLA preferred_element_type=f32 path; upcasting to f32
    before the dot quarters the MXU rate (the mistake _flash2d_kernel's
    docstring records for the SAM kernel)."""
    _, hb, bq, _ = q_ref.shape
    d = v_ref.shape[3]  # true head dim (q/k may carry a padding-bias column)
    t = k_ref.shape[2]
    qi = pl.program_id(2)
    num_kb = t // block_k

    for h in range(hb):  # static unroll over the head chunk
        q = q_ref[0, h]

        m = jnp.full((bq, 1), NEG_INF, jnp.float32)
        l = jnp.zeros((bq, 1), jnp.float32)
        acc = jnp.zeros((bq, d), jnp.float32)

        def body(kb, carry, h=h):
            m, l, acc = carry
            k = k_ref[0, h, pl.ds(kb * block_k, block_k), :]
            v = v_ref[0, h, pl.ds(kb * block_k, block_k), :]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale  # (bq, bk) f32
            k_idx = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_k), 1
            )
            if causal:
                q_idx = qi * bq + jax.lax.broadcasted_iota(
                    jnp.int32, (bq, block_k), 0
                )
                s = jnp.where(q_idx >= k_idx, s, NEG_INF)
            if t_valid != t:
                # T padded to the block multiple: mask the phantom keys
                # (cheaper than the padding-bias-column trick, which widens
                # the head dim to 65 and pads the k/q lane dim to 128)
                s = jnp.where(k_idx < t_valid, s, NEG_INF)
            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m - m_new)
            l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc = acc * alpha + jnp.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            )
            return m_new, l, acc

        if causal:
            # only blocks up to and including the diagonal contribute
            last = (qi + 1) * bq  # first k index beyond this q block
            num_needed = pl.cdiv(last, block_k)
            m, l, acc = jax.lax.fori_loop(0, num_needed, body, (m, l, acc))
        else:
            m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m, l, acc))
        o_ref[0, h] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash2d_kernel(
    q_ref, k_ref, v_ref, bh_ref, bw_ref, o_ref, m_s, l_s, acc_s,
    *, nkb: int, rows_per_kb: int, width: int, scale: float,
):
    """Flash attention over an (h*w)-token square image grid with SAM-style
    decomposed relative-position bias.

    The k loop is the innermost GRID dimension, ``rows_per_kb`` whole key
    rows per step: the q.k dot runs in the input dtype (bf16) on the MXU with
    f32 accumulation, and the decomposed bias lands on the f32 scores —
    bh[q, row] via a static-size dynamic slice of the (bq, h) row-bias block,
    bw[q, col] tiled over the rows.  Running max/sum/acc live in VMEM scratch
    across the k steps.  (The previous one-row-per-step / onehot-concat
    formulation ran f32 dots over 64-key slivers at ~2% MFU.)"""
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        m_s[...] = jnp.full_like(m_s, NEG_INF)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    q = q_ref[0]  # (bq, d) input dtype
    k = k_ref[0]  # (R*w, d)
    v = v_ref[0]
    bq = q.shape[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (bq, R*w) f32
    # Decomposed bias without any (bq, R, w) reshape (Mosaic rejects lane
    # splits below 128): expand via selector matmuls.  bias_h arrives
    # TRANSPOSED as (h, bq) so the k-step slice runs on the sublane dim
    # (8-aligned starts; lane-dim starts of kb*R are not provably
    # 128-aligned), and dot_general contracts its leading dim directly.
    r, rw = rows_per_kb, rows_per_kb * width
    if nkb == 1:
        bh_blk = bh_ref[0]  # whole block: no sliced load (R may be odd-sized)
    else:
        bh_blk = bh_ref[0, pl.ds(kb * r, r), :]  # (R, bq) f32
    row_of = jax.lax.broadcasted_iota(jnp.int32, (r, rw), 1) // width
    e_rows = (row_of == jax.lax.broadcasted_iota(jnp.int32, (r, rw), 0)).astype(jnp.float32)
    s = s + jax.lax.dot_general(
        bh_blk, e_rows, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # s[q, r*w+c] += bh[q, r]
    col_of = jax.lax.broadcasted_iota(jnp.int32, (width, rw), 1) % width
    e_cols = (col_of == jax.lax.broadcasted_iota(jnp.int32, (width, rw), 0)).astype(jnp.float32)
    s = s + jax.lax.dot_general(
        bw_ref[0], e_cols, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # s[q, r*w+c] += bw[q, c]

    m_prev = m_s[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    m_s[...] = m_new
    l_s[...] = l_s[...] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_s[...] = acc_s[...] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kb == nkb - 1)
    def _emit():
        o_ref[0] = (acc_s[...] / jnp.maximum(l_s[...], 1e-30)).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("grid_hw", "block_q", "rows_per_kb", "interpret"))
def flash_attention_2d(
    q: jnp.ndarray,  # (BH, N, D), N = h*w row-major over the image grid
    k: jnp.ndarray,  # (BH, N, D)
    v: jnp.ndarray,  # (BH, N, D)
    bias_h: jnp.ndarray,  # (BH, N, h) f32: q_n . rel_h[y(n), y'] per key row y'
    bias_w: jnp.ndarray,  # (BH, N, w) f32: q_n . rel_w[x(n), x'] per key col x'
    grid_hw: tuple,  # (h, w)
    block_q: int = 128,
    rows_per_kb: int = 8,  # key rows per k step (auto-clamped to divide h)
    interpret: bool = False,
) -> jnp.ndarray:
    """SAM global-attention flash kernel (reference SamAutomaticMaskGenerator
    backbone layers, image_encoder.py Attention.use_rel_pos): blockwise
    online-softmax with decomposed rel-pos, no (N, N) tensor in HBM.  The q.k
    dots run in the input dtype (bf16 on the MXU, f32 accumulation); the bias
    is applied to the f32 scores inside the kernel.
    Requires h*w % block_q == 0; callers fall back to XLA otherwise."""
    bhn, n, d = q.shape
    h, w = grid_hw
    assert n == h * w, (n, grid_hw)
    assert n % block_q == 0, (n, block_q)
    # rows_per_kb must divide h AND start sublane-aligned slices (multiples
    # of 8), unless it covers the whole height (start 0 only)
    cand = [r for r in range(8, h + 1, 8) if h % r == 0 and r <= rows_per_kb]
    rows_per_kb = max(cand) if cand else h
    nkb = h // rows_per_kb
    scale = d**-0.5
    grid = (bhn, n // block_q, nkb)
    return pl.pallas_call(
        partial(
            _flash2d_kernel, nkb=nkb, rows_per_kb=rows_per_kb, width=w,
            scale=scale,
        ),
        out_shape=jax.ShapeDtypeStruct((bhn, n, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, qi, kb: (b, qi, 0)),
            pl.BlockSpec((1, rows_per_kb * w, d), lambda b, qi, kb: (b, kb, 0)),
            pl.BlockSpec((1, rows_per_kb * w, d), lambda b, qi, kb: (b, kb, 0)),
            pl.BlockSpec((1, h, block_q), lambda b, qi, kb: (b, 0, qi)),
            pl.BlockSpec((1, block_q, w), lambda b, qi, kb: (b, qi, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, qi, kb: (b, qi, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        interpret=interpret,
    )(
        q, k, v,
        jnp.swapaxes(bias_h.astype(jnp.float32), 1, 2),  # (BH, h, N)
        bias_w.astype(jnp.float32),
    )


@partial(jax.jit, static_argnames=("causal", "block_q", "block_k", "interpret"))
def flash_attention(
    q: jnp.ndarray,  # (B, H, T, D)
    k: jnp.ndarray,  # (B, H, T, D)
    v: jnp.ndarray,  # (B, H, T, D)
    causal: bool = False,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    b, h, t, d = q.shape
    # pad T to a block multiple; phantom keys are masked inside the kernel
    # (k_idx < t), phantom q rows are dropped on return
    tp = ((t + block_k - 1) // block_k) * block_k
    if tp != t:
        pad = tp - t
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    scale = d**-0.5  # scale by the true head dim
    # head-chunk size: fold as many heads per grid step as keep the K/V
    # panels within ~8 MB of VMEM (grid-step overhead dominates at encoder
    # shapes, so fewer/fatter steps win — see _flash_kernel docstring)
    lane_d = max(d, 128)  # lane padding: the (·, d) panels occupy >=128 lanes
    kv_bytes_per_head = 2 * tp * lane_d * q.dtype.itemsize
    hb = max(1, min(h, (8 << 20) // max(1, kv_bytes_per_head)))
    while h % hb:
        hb -= 1
    grid = (b, h // hb, tp // block_q)
    out = pl.pallas_call(
        partial(
            _flash_kernel, block_k=block_k, causal=causal, scale=scale,
            t_valid=t,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, tp, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hb, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, hb, tp, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, hb, tp, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hb, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
        interpret=interpret,
    )(q, k, v)
    return out[:, :, :t]
