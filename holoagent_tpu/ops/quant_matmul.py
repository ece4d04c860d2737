"""Fused W8A8 matmul Pallas kernel: in-kernel dynamic activation
quantization, int8 MXU dot, dequant + bias (+ GELU) epilogue.

The XLA int8 path (models/transformer.matmul_int8) materializes the
quantization: read the bf16 activations, write int8 + scales to HBM, read
them back into the matmul, then dequantize in a separate fusion.  For the
mapping pipeline's CLIP crop batch (M ~ 33k rows x K 1024 x N up to 4096,
24 layers x 4 matmuls) that round-trip is ~100 MB of extra HBM traffic per
matmul and measurably caps the tower at ~27% of the v5e int8 peak
(BENCH_r02).  This kernel keeps the row panel in VMEM: quantize -> s8xs8
MXU dot with s32 accumulation -> scale-by (row_scale x col_scale) -> bias ->
optional GELU, one pass over the activations.

Rows (M) tile the grid's outer axis and columns (N) the inner one, so each
row panel's quantization is computed once per N-tile but its HBM fetch
happens once (consecutive grid steps reuse the resident block); weights are
whole-K int8 column panels.  K must fit VMEM alongside the panels (K <= 8192
at the default tiles) — true for every tower in models/ (max K 5120).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, wq_ref, ws_ref, b_ref, o_ref, xq_s, as_s, *, out_dtype):
    bm, k = x_ref.shape
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _quantize():
        # quantize the row panel ONCE per m-tile (the n axis is the inner
        # grid dim, so the int8 panel + scales persist in scratch across the
        # n sweep — re-quantizing per n-tile made the kernel VPU-bound and
        # ~2x slower than the XLA two-pass path, measured on v5e).  Chunked
        # over rows so the f32 working copy stays small.
        rows = 128 if bm % 128 == 0 else bm
        for c in range(bm // rows):
            xf = x_ref[pl.ds(c * rows, rows), :].astype(jnp.float32)
            a_s = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
            a_s = jnp.maximum(a_s, 1e-12)
            xq_s[pl.ds(c * rows, rows), :] = jnp.clip(
                jnp.round(xf / a_s), -127.0, 127.0
            ).astype(jnp.int8)
            as_s[pl.ds(c * rows, rows), :] = a_s

    acc = jax.lax.dot_general(
        xq_s[...], wq_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (BM, BN) s32
    out = acc.astype(jnp.float32) * as_s[...] * ws_ref[:]  # row x col scales
    out = out + b_ref[:].astype(jnp.float32)
    # NOTE: no transcendental epilogue in-kernel — a tanh/erf GELU here
    # scalarizes in Mosaic (measured 13.5 s vs 2.8 ms per dispatch on v5e);
    # quant_matmul applies the activation on the output outside pallas_call,
    # where XLA fuses it into the consumer at one extra HBM pass.
    o_ref[:] = out.astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("act", "block_m", "block_n", "out_dtype", "interpret"),
)
def quant_matmul(
    x: jnp.ndarray,  # (M, K) float (bf16/f32)
    w_q: jnp.ndarray,  # (K, N) int8
    w_s: jnp.ndarray,  # (1, N) or (N,) f32 per-output-channel scales
    bias: jnp.ndarray,  # (N,) float
    act: str = "none",  # "none" | "gelu"
    block_m: int = 512,
    block_n: int = 512,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused dynamic-quant W8A8 matmul; returns (M, N) out_dtype.

    M is padded to block_m internally (zero rows quantize to zeros and are
    sliced off), K and N must be multiples of 128 (true for the towers)."""
    m, k = x.shape
    n = w_q.shape[1]
    assert k % 128 == 0 and n % 128 == 0, (k, n)
    # VMEM budget: the kernel holds the bf16 row panel (double-buffered), its
    # f32 working copy and int8 quantized form — all proportional to bm*k.
    # Cap bm so those fit the 16 MB VMEM alongside the weight panel.
    bm_fit = 1024 if k <= 1536 else (256 if k <= 4096 else 128)
    bm = min(block_m, bm_fit, max(128, m))
    pad_m = (-m) % bm
    if pad_m:
        x = jnp.pad(x, ((0, pad_m), (0, 0)))
    mp = x.shape[0]
    bn = min(block_n, n)
    ws = w_s.reshape(1, n).astype(jnp.float32)
    b = bias.reshape(1, n)
    grid = (mp // bm, n // bn)
    out = pl.pallas_call(
        functools.partial(_kernel, out_dtype=out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, k), jnp.int8),  # quantized row panel
            pltpu.VMEM((bm, 1), jnp.float32),  # per-row scales
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")  # scratch persists
            # across the inner n sweep
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * k * n,
            bytes_accessed=mp * k + k * n + mp * n * 2,
            transcendentals=0,
        ),
    )(x, w_q, ws, b)
    if act == "gelu":
        out = jax.nn.gelu(out.astype(jnp.float32)).astype(out_dtype)
    return out[:m] if pad_m else out


def batched_quant_matmul(x, w_q, w_s, bias, act="none", out_dtype=jnp.bfloat16,
                         interpret=False):
    """(..., T, K) x (K, N): flattens the leading axes into M."""
    lead = x.shape[:-1]
    y = quant_matmul(
        x.reshape(-1, x.shape[-1]), w_q, w_s, bias, act=act,
        out_dtype=out_dtype, interpret=interpret,
    )
    return y.reshape(*lead, -1)
