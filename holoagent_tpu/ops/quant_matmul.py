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


def _kernel(x_ref, wq_ref, ws_ref, b_ref, o_ref, *, act: str, out_dtype):
    xf = x_ref[:].astype(jnp.float32)  # (BM, K)
    a_s = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    a_s = jnp.maximum(a_s, 1e-12)
    xq = jnp.clip(jnp.round(xf / a_s), -127.0, 127.0).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (BM, BN) s32
    out = acc.astype(jnp.float32) * a_s * ws_ref[:]  # row x col scales
    out = out + b_ref[:].astype(jnp.float32)
    if act == "gelu":
        out = jax.nn.gelu(out)
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
    bm = min(block_m, max(128, m))
    pad_m = (-m) % bm
    if pad_m:
        x = jnp.pad(x, ((0, pad_m), (0, 0)))
    mp = x.shape[0]
    bn = min(block_n, n)
    ws = w_s.reshape(1, n).astype(jnp.float32)
    b = bias.reshape(1, n)
    grid = (mp // bm, n // bn)
    out = pl.pallas_call(
        functools.partial(_kernel, act=act, out_dtype=out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * k * n,
            bytes_accessed=mp * k + k * n + mp * n * 2,
            transcendentals=mp * n if act == "gelu" else 0,
        ),
    )(x, w_q, ws, b)
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
