"""Functional pre-LN transformer core shared by the CLIP towers, the SAM
encoder and the VLM.

TPU-first choices:
  * per-layer weights are STACKED on a leading axis and the body is one
    `lax.scan` — an H/14 tower compiles as a single fused block instead of 32
    unrolled layers;
  * compute runs in bfloat16 on the MXU with float32 accumulation
    (`preferred_element_type`), layer norms and softmax in float32;
  * tensor parallelism shards the stacked QKV/MLP weights on their output
    column axis ("model" mesh axis); XLA inserts the collectives.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Init helpers
# ---------------------------------------------------------------------------


def _normal(key, shape, std, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype) * std


def init_block_stack(
    key: jax.Array,
    layers: int,
    width: int,
    mlp_ratio: float = 4.0,
    dtype=jnp.float32,
) -> Params:
    """Stacked parameters for `layers` pre-LN blocks."""
    hidden = int(width * mlp_ratio)
    ks = jax.random.split(key, 4)
    attn_std = width**-0.5
    proj_std = (width**-0.5) * ((2 * layers) ** -0.5)
    fc_std = (2 * width) ** -0.5
    return {
        "ln1_g": jnp.ones((layers, width), dtype),
        "ln1_b": jnp.zeros((layers, width), dtype),
        "wqkv": _normal(ks[0], (layers, width, 3 * width), attn_std, dtype),
        "bqkv": jnp.zeros((layers, 3 * width), dtype),
        "wo": _normal(ks[1], (layers, width, width), proj_std, dtype),
        "bo": jnp.zeros((layers, width), dtype),
        "ln2_g": jnp.ones((layers, width), dtype),
        "ln2_b": jnp.zeros((layers, width), dtype),
        "w1": _normal(ks[2], (layers, width, hidden), fc_std, dtype),
        "b1": jnp.zeros((layers, hidden), dtype),
        "w2": _normal(ks[3], (layers, hidden, width), proj_std, dtype),
        "b2": jnp.zeros((layers, width), dtype),
    }


# ---------------------------------------------------------------------------
# Core ops
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# int8 (W8A8) quantized matmul path — v5e's int8 MXU peak is 2x bf16, and the
# tower matmuls carry ~90% of the encoder FLOPs.  Weights are per-output-
# channel symmetric int8; activations are per-row dynamic symmetric int8.
# ---------------------------------------------------------------------------


def quantize_weight_int8(w: jnp.ndarray):
    """(..., in, out) f32 -> (int8 weights, (out,) f32 per-channel scales)."""
    s = jnp.max(jnp.abs(w), axis=-2, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return q, s.astype(jnp.float32)


def matmul_int8(x: jnp.ndarray, w_q: jnp.ndarray, w_s: jnp.ndarray) -> jnp.ndarray:
    """x (..., T, in) float; w_q (in, out) int8; w_s (1, out).  Returns f32."""
    a_s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True) / 127.0
    a_s = jnp.maximum(a_s, 1e-12)
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / a_s), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, w_q,
        (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * a_s * w_s


def _q8_mm(x, q, s, b, act=None, qmm: str = "xla"):
    """Dispatch one W8A8 matmul (+bias, +optional gelu): the XLA two-pass
    path or the fused Pallas kernel (ops/quant_matmul) when qmm="pallas" and
    the shapes are MXU-aligned (the tiny test towers are not)."""
    k, n = q.shape
    if qmm == "pallas" and k % 128 == 0 and n % 128 == 0:
        from ..ops.quant_matmul import batched_quant_matmul

        return batched_quant_matmul(
            x, q, s, b, act="gelu" if act is not None else "none",
            out_dtype=x.dtype,
        )
    out = matmul_int8(x, q, s) + b.astype(jnp.float32)
    if act is not None:
        out = act(out)
    return out.astype(x.dtype)


def quantize_block_stack(stacked: Params) -> Params:
    """Quantize a stacked block pytree's matmul weights (wqkv/wo/w1/w2) to
    int8 + scales; norms and biases stay float."""
    out = dict(stacked)
    for name in ("wqkv", "wo", "w1", "w2"):
        q, s = quantize_weight_int8(stacked[name])
        out[name + "_q8"] = q
        out[name + "_s"] = s
        del out[name]
    return out


def layer_norm(x: jnp.ndarray, g: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-5):
    """LayerNorm in float32 regardless of compute dtype."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * g.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def attention(
    x: jnp.ndarray,  # (B, T, W)
    wqkv: jnp.ndarray,
    bqkv: jnp.ndarray,
    wo: jnp.ndarray,
    bo: jnp.ndarray,
    num_heads: int,
    mask: Optional[jnp.ndarray] = None,  # (T, T) additive, f32
    impl: str = "xla",  # "xla" | "flash" (flash: mask must be None or causal)
    causal: bool = False,
) -> jnp.ndarray:
    b, t, w = x.shape
    dh = w // num_heads
    qkv = (
        jnp.einsum("btw,wc->btc", x, wqkv, preferred_element_type=jnp.float32)
        + bqkv.astype(jnp.float32)
    ).astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, t, num_heads, dh)
    k = k.reshape(b, t, num_heads, dh)
    v = v.reshape(b, t, num_heads, dh)
    if impl == "flash":
        from ..ops.flash_attention import flash_attention

        # non-128-multiple T (CLIP: 257 tokens) runs as ONE whole block:
        # measured on v5e, whole-block beats 128-blocks ~3x at these shapes
        # (the kernel's grid-step count dominates, see _flash_kernel)
        bq = 128 if t % 128 == 0 else (t if t <= 512 else 128)
        out = flash_attention(
            q.transpose(0, 2, 1, 3),
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            causal=causal,
            block_q=bq,
            block_k=bq,
        ).transpose(0, 2, 1, 3)
        out = out.reshape(b, t, w)
        return (
            jnp.einsum("btw,wc->btc", out, wo, preferred_element_type=jnp.float32)
            + bo.astype(jnp.float32)
        ).astype(x.dtype)
    scores = jnp.einsum(
        "bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32
    ) * (dh**-0.5)
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhts,bshd->bthd", probs, v, preferred_element_type=jnp.float32)
    out = out.astype(x.dtype).reshape(b, t, w)
    out = (
        jnp.einsum("btw,wc->btc", out, wo, preferred_element_type=jnp.float32)
        + bo.astype(jnp.float32)
    ).astype(x.dtype)
    return out


def mlp(x, w1, b1, w2, b2, act=jax.nn.gelu):
    h = (
        jnp.einsum("btw,wc->btc", x, w1, preferred_element_type=jnp.float32)
        + b1.astype(jnp.float32)
    )
    h = act(h).astype(x.dtype)
    return (
        jnp.einsum("btc,cw->btw", h, w2, preferred_element_type=jnp.float32)
        + b2.astype(jnp.float32)
    ).astype(x.dtype)


def attention_q8(
    x: jnp.ndarray,  # (B, T, W)
    p: Params,  # quantized layer params (wqkv_q8/_s, wo_q8/_s, bqkv, bo)
    num_heads: int,
    mask: Optional[jnp.ndarray] = None,
    impl: str = "xla",
    qmm: str = "xla",
) -> jnp.ndarray:
    b, t, w = x.shape
    dh = w // num_heads
    qkv = _q8_mm(x, p["wqkv_q8"], p["wqkv_s"], p["bqkv"], qmm=qmm)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, t, num_heads, dh)
    k = k.reshape(b, t, num_heads, dh)
    v = v.reshape(b, t, num_heads, dh)
    if impl == "flash" and mask is None:
        from ..ops.flash_attention import flash_attention

        bq = 128 if t % 128 == 0 else (t if t <= 512 else 128)
        out = flash_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), block_q=bq, block_k=bq,
        ).transpose(0, 2, 1, 3)
    else:
        scores = jnp.einsum(
            "bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32
        ) * (dh**-0.5)
        if mask is not None:
            scores = scores + mask
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhts,bshd->bthd", probs, v, preferred_element_type=jnp.float32)
    out = out.astype(x.dtype).reshape(b, t, w)
    return _q8_mm(out, p["wo_q8"], p["wo_s"], p["bo"], qmm=qmm)


def block_q8(x, p: Params, num_heads: int, mask=None, act=jax.nn.gelu, impl: str = "xla",
             qmm: str = "xla"):
    """Pre-LN block over int8-quantized matmul weights (attention contractions
    stay bf16: they carry <10% of the FLOPs)."""
    x = x + attention_q8(layer_norm(x, p["ln1_g"], p["ln1_b"]), p, num_heads, mask,
                         impl=impl, qmm=qmm)
    h = layer_norm(x, p["ln2_g"], p["ln2_b"])
    mid = _q8_mm(h, p["w1_q8"], p["w1_s"], p["b1"], act=act, qmm=qmm)
    x = x + _q8_mm(mid, p["w2_q8"], p["w2_s"], p["b2"], qmm=qmm)
    return x


def run_stack_q8(
    x: jnp.ndarray,
    stacked_q8: Params,
    num_heads: int,
    mask: Optional[jnp.ndarray] = None,
    impl: str = "xla",
    qmm: str = "xla",
) -> jnp.ndarray:
    """Scan the int8-quantized stacked blocks (see quantize_block_stack)."""

    def body(h, layer_params):
        return block_q8(h, layer_params, num_heads, mask, impl=impl, qmm=qmm), None

    out, _ = jax.lax.scan(body, x, stacked_q8)
    return out


def block(x, p: Params, num_heads: int, mask=None, impl: str = "xla", causal: bool = False):
    """One pre-LN transformer block with UNstacked per-layer params."""
    x = x + attention(
        layer_norm(x, p["ln1_g"], p["ln1_b"]),
        p["wqkv"], p["bqkv"], p["wo"], p["bo"],
        num_heads, mask, impl=impl, causal=causal,
    )
    x = x + mlp(layer_norm(x, p["ln2_g"], p["ln2_b"]), p["w1"], p["b1"], p["w2"], p["b2"])
    return x


def run_stack(
    x: jnp.ndarray,
    stacked: Params,
    num_heads: int,
    mask: Optional[jnp.ndarray] = None,
    remat: bool = False,
    impl: str = "xla",
    causal: bool = False,
) -> jnp.ndarray:
    """Scan the stacked block parameters over the sequence of layers.

    impl="flash" routes attention through the Pallas kernel (mask must then be
    None or expressed via causal=True)."""

    def body(h, layer_params):
        h = block(h, layer_params, num_heads, mask if impl == "xla" else None,
                  impl=impl, causal=causal)
        return h, None

    if remat:
        body = jax.checkpoint(body)
    out, _ = jax.lax.scan(body, x, stacked)
    return out
