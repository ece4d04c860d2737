"""SAM-style promptable segmentation, TPU-native.

Reimplements the three-stage architecture the reference drives through
`segment_anything` (reference fsr_vln/memory/hmsg/graph/graph.py:186-199:
SamAutomaticMaskGenerator over vit_h with points_per_side=12,
pred_iou_thresh=0.88, stability_score_thresh=0.95, min_mask_region_area=100):

  * ViT image encoder with windowed attention + decomposed relative position
    biases + conv neck (vit_b / vit_l / vit_h dims match the official
    checkpoints; `convert_sam` maps a torch state dict onto the pytree);
  * random-Fourier point prompt encoder;
  * two-way transformer mask decoder (4 mask tokens + IoU head + 4x
    upscaling + per-token hypernetwork MLPs).

Automatic mask generation is re-expressed as a fixed-budget array program
(ops.masks): all points_per_side^2 prompts decode in ONE batched pass sharing
the image embedding, candidates are filtered/NMS'd with masked ops, and the
output is a padded (max_masks, H', W') boolean stack + validity lane — no
data-dependent shapes anywhere.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import transformer as tfm

from ..ops import masks as mask_ops

Params = Dict[str, Any]


@dataclass(frozen=True)
class SAMVariant:
    name: str
    img_size: int = 1024
    patch: int = 16
    width: int = 768
    depth: int = 12
    heads: int = 12
    global_idx: Tuple[int, ...] = (2, 5, 8, 11)
    window: int = 14
    out_chans: int = 256
    decoder_dim: int = 256
    decoder_heads: int = 8
    decoder_depth: int = 2
    decoder_mlp: int = 2048
    num_mask_tokens: int = 4


VARIANTS = {
    "vit_b": SAMVariant("vit_b", width=768, depth=12, heads=12, global_idx=(2, 5, 8, 11)),
    "vit_l": SAMVariant("vit_l", width=1024, depth=24, heads=16, global_idx=(5, 11, 17, 23)),
    "vit_h": SAMVariant("vit_h", width=1280, depth=32, heads=16, global_idx=(7, 15, 23, 31)),
    # hermetic test variant: 64px image, 4x4 token grid
    "test-tiny": SAMVariant(
        "test-tiny", img_size=64, patch=16, width=64, depth=2, heads=2,
        global_idx=(1,), window=2, out_chans=32, decoder_dim=32,
        decoder_heads=2, decoder_mlp=64,
    ),
    # fixture-trainable variant (training.perception): 128px / 16x16 token
    # grid -> 64x64 decoder masks — enough boundary resolution to segment the
    # 15-30 px fixture objects the 4x4 test-tiny grid cannot resolve
    "fixture-tiny": SAMVariant(
        "fixture-tiny", img_size=128, patch=8, width=64, depth=3, heads=2,
        global_idx=(2,), window=4, out_chans=32, decoder_dim=32,
        decoder_heads=2, decoder_mlp=128,
    ),
}


def _ln(x, g, b, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * g + b).astype(x.dtype)


# ---------------------------------------------------------------------------
# Image encoder
# ---------------------------------------------------------------------------


def _init_linear(key, din, dout, dtype):
    std = (din**-0.5)
    return {
        "w": jax.random.normal(key, (din, dout), dtype) * std,
        "b": jnp.zeros((dout,), dtype),
    }


def init_encoder(key: jax.Array, v: SAMVariant, dtype=jnp.float32) -> Params:
    g = v.img_size // v.patch
    keys = jax.random.split(key, v.depth + 4)
    blocks: List[Params] = []
    hd = v.width // v.heads
    for i in range(v.depth):
        kq, kp, k1, k2, kr = jax.random.split(keys[i], 5)
        n = g if i in v.global_idx else v.window
        blocks.append(
            {
                "norm1_g": jnp.ones((v.width,), dtype),
                "norm1_b": jnp.zeros((v.width,), dtype),
                "qkv": _init_linear(kq, v.width, 3 * v.width, dtype),
                "proj": _init_linear(kp, v.width, v.width, dtype),
                "rel_h": jax.random.normal(kr, (2 * n - 1, hd), dtype) * 0.02,
                "rel_w": jax.random.normal(kr, (2 * n - 1, hd), dtype) * 0.02,
                "norm2_g": jnp.ones((v.width,), dtype),
                "norm2_b": jnp.zeros((v.width,), dtype),
                "lin1": _init_linear(k1, v.width, 4 * v.width, dtype),
                "lin2": _init_linear(k2, 4 * v.width, v.width, dtype),
            }
        )
    return {
        "patch_w": jax.random.normal(keys[-4], (v.patch * v.patch * 3, v.width), dtype)
        * (v.width**-0.5),
        "patch_b": jnp.zeros((v.width,), dtype),
        "pos": jax.random.normal(keys[-3], (g, g, v.width), dtype) * 0.02,
        "blocks": blocks,
        "neck_conv1": jax.random.normal(keys[-2], (1, 1, v.width, v.out_chans), dtype)
        * (v.width**-0.5),
        "neck_ln1_g": jnp.ones((v.out_chans,), dtype),
        "neck_ln1_b": jnp.zeros((v.out_chans,), dtype),
        "neck_conv2": jax.random.normal(keys[-1], (3, 3, v.out_chans, v.out_chans), dtype)
        * (9 * v.out_chans) ** -0.5,
        "neck_ln2_g": jnp.ones((v.out_chans,), dtype),
        "neck_ln2_b": jnp.zeros((v.out_chans,), dtype),
    }


def _rel_pos_bias(q_hw: int, rel_table: jnp.ndarray) -> jnp.ndarray:
    """(2n-1, hd) table -> (q, q, hd) relative embeddings for square attn."""
    coords = jnp.arange(q_hw)
    rel = coords[:, None] - coords[None, :] + (q_hw - 1)  # in [0, 2q-2]
    return rel_table[rel]


def _attention_2d(
    x: jnp.ndarray, p: Params, heads: int, impl: str = "xla", interpret: bool = False
) -> jnp.ndarray:
    """Attention over a (B, H, W, C) tile with decomposed rel-pos (SAM-style).

    impl="flash" streams K/V through the Pallas kernel with the decomposed
    bias folded per k-block (ops.flash_attention.flash_attention_2d) — the
    (N, N) score/bias tensors never touch HBM; used for the global layers
    (N = 4096 at 1024 px) where the XLA path materializes ~1 GB/layer."""
    b, h, w, c = x.shape
    hd = c // heads
    if "w_q8" in p["qkv"]:  # quantize_sam W8A8 path
        qkv = (
            tfm.matmul_int8(x, p["qkv"]["w_q8"], p["qkv"]["w_s"])
            + p["qkv"]["b"].astype(jnp.float32)
        ).astype(x.dtype)
    else:
        qkv = (
            jnp.einsum("bhwc,cd->bhwd", x, p["qkv"]["w"], preferred_element_type=jnp.float32)
            + p["qkv"]["b"].astype(jnp.float32)
        ).astype(x.dtype)
    qkv = qkv.reshape(b, h * w, 3, heads, hd).transpose(2, 0, 3, 1, 4)  # (3,B,heads,N,hd)
    q, k, val = qkv[0], qkv[1], qkv[2]
    # decomposed relative position: bias(nq, nk) = q . rel_h + q . rel_w
    rh = _rel_pos_bias(h, p["rel_h"])  # (h, h, hd)
    rw = _rel_pos_bias(w, p["rel_w"])  # (w, w, hd)
    qg = q.reshape(b, heads, h, w, hd)
    bias_h = jnp.einsum("bhywd,ykd->bhywk", qg, rh, preferred_element_type=jnp.float32)
    bias_w = jnp.einsum("bhywd,wkd->bhywk", qg, rw, preferred_element_type=jnp.float32)
    n = h * w
    # block_q must divide N; small grids (windows: N=196) run as one whole
    # q-block, which still wins — bias+softmax stay fused in VMEM
    block_q = 128 if n % 128 == 0 else (64 if n % 64 == 0 else (n if n <= 512 else 0))
    if impl == "flash" and block_q:
        from ..ops.flash_attention import flash_attention_2d

        out = flash_attention_2d(
            q.reshape(b * heads, n, hd),
            k.reshape(b * heads, n, hd),
            val.reshape(b * heads, n, hd),
            bias_h.reshape(b * heads, n, h),
            bias_w.reshape(b * heads, n, w),
            grid_hw=(h, w),
            block_q=block_q,
            interpret=interpret,
        )
        out = out.reshape(b, heads, n, hd)
    else:
        attn = jnp.einsum(
            "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
        ) * (hd**-0.5)
        attn = attn.reshape(b, heads, h, w, h, w)
        attn = attn + bias_h[..., :, None] + bias_w[..., None, :]
        attn = attn.reshape(b, heads, n, n)
        probs = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum(
            "bhnm,bhmd->bhnd", probs, val, preferred_element_type=jnp.float32
        )
    out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(b, h, w, c)
    if "w_q8" in p["proj"]:
        return (
            tfm.matmul_int8(out, p["proj"]["w_q8"], p["proj"]["w_s"])
            + p["proj"]["b"].astype(jnp.float32)
        ).astype(x.dtype)
    return (
        jnp.einsum("bhwc,cd->bhwd", out, p["proj"]["w"], preferred_element_type=jnp.float32)
        + p["proj"]["b"].astype(jnp.float32)
    ).astype(x.dtype)


def _window_partition(x: jnp.ndarray, win: int):
    b, h, w, c = x.shape
    ph = (win - h % win) % win
    pw = (win - w % win) % win
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // win, win, wp // win, win, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, win, win, c), (hp, wp)


def _window_unpartition(x: jnp.ndarray, win: int, padded, orig):
    hp, wp = padded
    h, w = orig
    b = x.shape[0] // ((hp // win) * (wp // win))
    x = x.reshape(b, hp // win, wp // win, win, win, -1).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def encode_image(
    params: Params,
    images: jnp.ndarray,
    v: SAMVariant,
    dtype=jnp.bfloat16,
    impl: str = "xla",
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, S, S, 3) normalized image -> (B, g, g, out_chans) embedding.

    impl="flash" uses the Pallas rel-pos flash kernel on the global-attention
    layers (windowed layers are 196 tokens — XLA is already optimal there);
    interpret=True runs that kernel in Pallas interpret mode (CPU tests)."""
    b, s, _, _ = images.shape
    p = v.patch
    g = s // p
    x = images.reshape(b, g, p, g, p, 3).transpose(0, 1, 3, 2, 4, 5).reshape(b, g, g, -1)
    x = x.astype(dtype)
    x = (
        jnp.einsum(
            "bhwd,dc->bhwc",
            x,
            params["patch_w"].astype(dtype),
            preferred_element_type=jnp.float32,
        )
        + params["patch_b"].astype(jnp.float32)
    ).astype(dtype)
    x = x + params["pos"].astype(dtype)
    for i, blk in enumerate(params["blocks"]):
        # int8 weights and their f32 scales (quantize_sam) must not be cast
        # to the compute dtype; everything else runs in `dtype`
        bp = jax.tree_util.tree_map_with_path(
            lambda path, a: (
                a
                if a.dtype == jnp.int8
                or any(getattr(k, "key", None) == "w_s" for k in path)
                else a.astype(dtype)
            ),
            blk,
        )
        shortcut = x
        xn = _ln(x, blk["norm1_g"].astype(jnp.float32), blk["norm1_b"].astype(jnp.float32))
        if i in v.global_idx:
            att = _attention_2d(xn, bp, v.heads, impl=impl, interpret=interpret)
        else:
            xw, padded = _window_partition(xn, v.window)
            aw = _attention_2d(xw, bp, v.heads, impl=impl, interpret=interpret)
            att = _window_unpartition(aw, v.window, padded, (g, g))
        x = shortcut + att
        xn = _ln(x, blk["norm2_g"].astype(jnp.float32), blk["norm2_b"].astype(jnp.float32))
        if "w_q8" in bp["lin1"]:
            hmid = tfm.matmul_int8(
                xn, bp["lin1"]["w_q8"], bp["lin1"]["w_s"]
            ) + bp["lin1"]["b"].astype(jnp.float32)
            hmid = jax.nn.gelu(hmid).astype(dtype)
            x = x + (
                tfm.matmul_int8(hmid, bp["lin2"]["w_q8"], bp["lin2"]["w_s"])
                + bp["lin2"]["b"].astype(jnp.float32)
            ).astype(dtype)
        else:
            hmid = (
                jnp.einsum(
                    "bhwc,cd->bhwd", xn, bp["lin1"]["w"], preferred_element_type=jnp.float32
                )
                + bp["lin1"]["b"].astype(jnp.float32)
            )
            hmid = jax.nn.gelu(hmid).astype(dtype)
            x = x + (
                jnp.einsum(
                    "bhwd,dc->bhwc", hmid, bp["lin2"]["w"], preferred_element_type=jnp.float32
                )
                + bp["lin2"]["b"].astype(jnp.float32)
            ).astype(dtype)
    # neck: 1x1 conv -> LN -> 3x3 conv -> LN (channel-last)
    x = jnp.einsum(
        "bhwc,ijcd->bhwd",
        x,
        params["neck_conv1"].astype(dtype),
        preferred_element_type=jnp.float32,
    ).astype(dtype)
    x = _ln(x, params["neck_ln1_g"].astype(jnp.float32), params["neck_ln1_b"].astype(jnp.float32))
    x = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        params["neck_conv2"].astype(jnp.float32),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(dtype)
    x = _ln(x, params["neck_ln2_g"].astype(jnp.float32), params["neck_ln2_b"].astype(jnp.float32))
    return x


# ---------------------------------------------------------------------------
# Prompt encoder
# ---------------------------------------------------------------------------


def init_prompt_encoder(key: jax.Array, v: SAMVariant, dtype=jnp.float32) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    d = v.decoder_dim
    return {
        "gauss": jax.random.normal(k1, (2, d // 2), jnp.float32),
        "point_pos": jax.random.normal(k2, (d,), dtype) * 0.02,  # label 1
        "point_neg": jax.random.normal(k3, (d,), dtype) * 0.02,  # label 0
        "not_a_point": jax.random.normal(k4, (d,), dtype) * 0.02,
        "no_mask": jax.random.normal(k4, (d,), dtype) * 0.02,
    }


def _fourier_pe(coords01: jnp.ndarray, gauss: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) in [0,1] -> (..., D) random Fourier features (SAM pe_layer)."""
    c = coords01 * 2.0 - 1.0
    proj = (2 * jnp.pi) * (c @ gauss)
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


def image_pe(params: Params, g: int) -> jnp.ndarray:
    """Dense positional encoding of the (g, g) embedding grid -> (g, g, D)."""
    ys = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
    xs = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
    grid = jnp.stack(jnp.meshgrid(ys, xs, indexing="ij"), axis=-1)[..., ::-1]  # (g,g,2) xy
    return _fourier_pe(grid, params["gauss"])


def encode_points(
    params: Params, points01: jnp.ndarray, labels: jnp.ndarray
) -> jnp.ndarray:
    """points01 (P, K, 2) in [0,1] (xy), labels (P, K) in {-1, 0, 1} ->
    (P, K, D) sparse prompt tokens."""
    pe = _fourier_pe(points01, params["gauss"])
    pe = jnp.where((labels == -1)[..., None], 0.0, pe)
    emb = jnp.where(
        (labels == 1)[..., None],
        params["point_pos"],
        jnp.where((labels == 0)[..., None], params["point_neg"], params["not_a_point"]),
    )
    return pe + emb


# ---------------------------------------------------------------------------
# Mask decoder (two-way transformer)
# ---------------------------------------------------------------------------


def init_decoder(key: jax.Array, v: SAMVariant, dtype=jnp.float32) -> Params:
    d = v.decoder_dim
    di = d // 2  # internal attention dim (downsample rate 2)
    up1 = d // 4
    up2 = d // 8
    keys = jax.random.split(key, 16 + v.decoder_depth * 12)

    def attn_params(koff, dq, dkv, dint):
        return {
            "q": _init_linear(keys[koff], dq, dint, dtype),
            "k": _init_linear(keys[koff + 1], dkv, dint, dtype),
            "v": _init_linear(keys[koff + 2], dkv, dint, dtype),
            "o": _init_linear(keys[koff + 3], dint, dq, dtype),
        }

    layers = []
    for i in range(v.decoder_depth):
        base = 16 + i * 12
        layers.append(
            {
                "self_attn": attn_params(base, d, d, d),
                "norm1_g": jnp.ones((d,), dtype),
                "norm1_b": jnp.zeros((d,), dtype),
                "cross_t2i": attn_params(base + 4, d, d, di),
                "norm2_g": jnp.ones((d,), dtype),
                "norm2_b": jnp.zeros((d,), dtype),
                "mlp1": _init_linear(keys[base + 8], d, v.decoder_mlp, dtype),
                "mlp2": _init_linear(keys[base + 9], v.decoder_mlp, d, dtype),
                "norm3_g": jnp.ones((d,), dtype),
                "norm3_b": jnp.zeros((d,), dtype),
                "cross_i2t": attn_params(base + 10, d, d, di),
                "norm4_g": jnp.ones((d,), dtype),
                "norm4_b": jnp.zeros((d,), dtype),
            }
        )
    nm = v.num_mask_tokens
    return {
        "iou_token": jax.random.normal(keys[0], (d,), dtype) * 0.02,
        "mask_tokens": jax.random.normal(keys[1], (nm, d), dtype) * 0.02,
        "layers": layers,
        "final_t2i": {
            "q": _init_linear(keys[2], d, di, dtype),
            "k": _init_linear(keys[3], d, di, dtype),
            "v": _init_linear(keys[4], d, di, dtype),
            "o": _init_linear(keys[5], di, d, dtype),
        },
        "norm_final_g": jnp.ones((d,), dtype),
        "norm_final_b": jnp.zeros((d,), dtype),
        "up1_w": jax.random.normal(keys[6], (2, 2, d, up1), dtype) * (d**-0.5),
        "up1_b": jnp.zeros((up1,), dtype),
        "up_ln_g": jnp.ones((up1,), dtype),
        "up_ln_b": jnp.zeros((up1,), dtype),
        "up2_w": jax.random.normal(keys[7], (2, 2, up1, up2), dtype) * (up1**-0.5),
        "up2_b": jnp.zeros((up2,), dtype),
        "hyper": [
            {
                "l1": _init_linear(keys[8 + i], d, d, dtype),
                "l2": _init_linear(keys[8 + i], d, d, dtype),
                "l3": _init_linear(keys[8 + i], d, up2, dtype),
            }
            for i in range(nm)
        ],
        "iou_head": {
            "l1": _init_linear(keys[12], d, d, dtype),
            "l2": _init_linear(keys[13], d, d, dtype),
            "l3": _init_linear(keys[14], d, nm, dtype),
        },
    }


def _attn(p: Params, q, k, v, heads: int):
    """Generic multi-head attention over token sequences (B, N, D)."""
    dint = p["q"]["w"].shape[1]
    hd = dint // heads

    def lin(t, pp):
        return (
            jnp.einsum("bnd,dc->bnc", t, pp["w"], preferred_element_type=jnp.float32)
            + pp["b"].astype(jnp.float32)
        ).astype(t.dtype)

    qh = lin(q, p["q"]).reshape(*q.shape[:2], heads, hd)
    kh = lin(k, p["k"]).reshape(*k.shape[:2], heads, hd)
    vh = lin(v, p["v"]).reshape(*v.shape[:2], heads, hd)
    a = jnp.einsum("bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32) * (
        hd**-0.5
    )
    pr = jax.nn.softmax(a, axis=-1).astype(q.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", pr, vh, preferred_element_type=jnp.float32)
    o = o.astype(q.dtype).reshape(*q.shape[:2], dint)
    return lin(o, p["o"])


def _mlp3(p, x, act=jax.nn.relu, final_act=None):
    for name in ("l1", "l2"):
        x = act(
            jnp.einsum("...d,dc->...c", x, p[name]["w"], preferred_element_type=jnp.float32)
            + p[name]["b"].astype(jnp.float32)
        ).astype(x.dtype)
    x = (
        jnp.einsum("...d,dc->...c", x, p["l3"]["w"], preferred_element_type=jnp.float32)
        + p["l3"]["b"].astype(jnp.float32)
    ).astype(x.dtype)
    return final_act(x) if final_act else x


def decode_masks(
    dec: Params,
    image_emb: jnp.ndarray,  # (g, g, D) single image
    img_pe: jnp.ndarray,  # (g, g, D)
    prompt_tokens: jnp.ndarray,  # (P, K, D) sparse prompts
    no_mask_emb: jnp.ndarray,  # (D,) dense prompt (no mask input)
    v: SAMVariant,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched over P prompts sharing one image embedding.
    Returns (mask_logits (P, num_mask_tokens, 4g, 4g), iou_pred (P, nm))."""
    g = image_emb.shape[0]
    d = v.decoder_dim
    pcount = prompt_tokens.shape[0]
    dtype = image_emb.dtype
    nm = v.num_mask_tokens
    out_tokens = jnp.concatenate([dec["iou_token"][None], dec["mask_tokens"]], axis=0)
    tokens = jnp.concatenate(
        [jnp.broadcast_to(out_tokens, (pcount, nm + 1, d)).astype(dtype), prompt_tokens.astype(dtype)],
        axis=1,
    )
    src = (image_emb + no_mask_emb).reshape(1, g * g, d)
    src = jnp.broadcast_to(src, (pcount, g * g, d)).astype(dtype)
    pos = jnp.broadcast_to(img_pe.reshape(1, g * g, d), (pcount, g * g, d)).astype(dtype)
    q = tokens
    heads = v.decoder_heads
    for i, lp in enumerate(dec["layers"]):
        lp = jax.tree.map(lambda a: a.astype(dtype), lp)
        if i == 0:
            q = q + _attn(lp["self_attn"], q, q, q, heads)
        else:
            qp = q + tokens
            q = q + _attn(lp["self_attn"], qp, qp, q, heads)
        q = _ln(q, lp["norm1_g"].astype(jnp.float32), lp["norm1_b"].astype(jnp.float32))
        q = q + _attn(lp["cross_t2i"], q + tokens, src + pos, src, heads)
        q = _ln(q, lp["norm2_g"].astype(jnp.float32), lp["norm2_b"].astype(jnp.float32))
        h = jax.nn.relu(
            jnp.einsum("bnd,dc->bnc", q, lp["mlp1"]["w"], preferred_element_type=jnp.float32)
            + lp["mlp1"]["b"].astype(jnp.float32)
        ).astype(dtype)
        q = q + (
            jnp.einsum("bnc,cd->bnd", h, lp["mlp2"]["w"], preferred_element_type=jnp.float32)
            + lp["mlp2"]["b"].astype(jnp.float32)
        ).astype(dtype)
        q = _ln(q, lp["norm3_g"].astype(jnp.float32), lp["norm3_b"].astype(jnp.float32))
        src = src + _attn(lp["cross_i2t"], src + pos, q + tokens, q, heads)
        src = _ln(src, lp["norm4_g"].astype(jnp.float32), lp["norm4_b"].astype(jnp.float32))
    fp = jax.tree.map(lambda a: a.astype(dtype), dec["final_t2i"])
    q = q + _attn(fp, q + tokens, src + pos, src, heads)
    q = _ln(q, dec["norm_final_g"].astype(jnp.float32), dec["norm_final_b"].astype(jnp.float32))

    iou_out = q[:, 0]
    mask_toks = q[:, 1 : nm + 1]
    # upscale src (P, g, g, D) -> (P, 4g, 4g, D/8) via two stride-2 transposed
    # convs.  Storage stays in the compute dtype: the intermediates are the
    # decoder's HBM hog (at VGA/144 prompts, u2 alone is 144x256x256x32 —
    # 1.2 GB in f32, 0.6 GB in bf16) while the conv matmuls accumulate in f32
    # via preferred_element_type, so bf16 storage costs no accuracy the mask
    # threshold can see (logit sign at |logit| >> 1)
    srcg = src.reshape(pcount, g, g, d).astype(dtype)

    def up(x, w, b):
        # kernel-2 stride-2 VALID transposed conv has NO output overlap:
        # out[2i+di, 2j+dj] = x[i, j] @ w[di, dj], i.e. a per-pixel linear
        # map to 2x2 blocks.  One MXU matmul + reshape instead of XLA's
        # gradient-form conv_transpose (which ran the decoder at ~20 TF/s;
        # the matmul form runs at tower rates — scripts/profile_extract.py)
        n, gh, gw, cin = x.shape
        co = w.shape[-1]
        # conv_transpose applies the kernel spatially FLIPPED (gradient
        # convention): out[2i+di, 2j+dj] = x[i, j] @ w[1-di, 1-dj]
        wm = jnp.transpose(w[::-1, ::-1], (2, 0, 1, 3)).reshape(cin, 4 * co).astype(dtype)
        y = jnp.einsum(
            "nhwc,ck->nhwk", x, wm, preferred_element_type=jnp.float32
        ).astype(dtype)
        y = y.reshape(n, gh, gw, 2, 2, co).transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(n, 2 * gh, 2 * gw, co) + b.astype(dtype)

    u = up(srcg, dec["up1_w"], dec["up1_b"])
    u = _ln(u, dec["up_ln_g"].astype(jnp.float32), dec["up_ln_b"].astype(jnp.float32))
    u = jax.nn.gelu(u)
    u = jax.nn.gelu(up(u, dec["up2_w"], dec["up2_b"]))  # (P, 4g, 4g, up2)
    hyper = jnp.stack(
        [
            _mlp3(jax.tree.map(lambda a: a.astype(dtype), hp), mask_toks[:, i])
            for i, hp in enumerate(dec["hyper"])
        ],
        axis=1,
    )  # (P, nm, up2)
    logits = jnp.einsum(
        "pnc,phwc->pnhw", hyper.astype(dtype), u, preferred_element_type=jnp.float32
    )
    iou_pred = _mlp3(
        jax.tree.map(lambda a: a.astype(dtype), dec["iou_head"]), iou_out
    ).astype(jnp.float32)
    return logits, iou_pred


# ---------------------------------------------------------------------------
# Full model bundle + automatic mask generation
# ---------------------------------------------------------------------------


def init_sam(key: jax.Array, v: SAMVariant, dtype=jnp.float32) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "encoder": init_encoder(k1, v, dtype),
        "prompt": init_prompt_encoder(k2, v, dtype),
        "decoder": init_decoder(k3, v, dtype),
    }


def quantize_sam(params: Params) -> Params:
    """Per-output-channel W8A8 quantization of the image encoder's matmul
    weights (qkv/proj/lin1/lin2 per block — ~99% of the encoder FLOPs; the
    patch embed, rel-pos tables, neck, prompt encoder, and mask decoder stay
    float).  encode_image/_attention_2d dispatch on the presence of "w_q8".
    Companion of clip.quantize_clip for the mapping pipeline's int8
    operating point (the ViT-H encoder is the mask stage's whole cost,
    reference graph.py:98-200 loads SAM ViT-H)."""
    enc = dict(params["encoder"])
    blocks = []
    for blk in enc["blocks"]:
        nb = dict(blk)
        for name in ("qkv", "proj", "lin1", "lin2"):
            q, s = tfm.quantize_weight_int8(blk[name]["w"].astype(jnp.float32))
            nb[name] = {"b": blk[name]["b"], "w_q8": q, "w_s": s.reshape(1, -1)}
        blocks.append(nb)
    enc["blocks"] = blocks
    return {**params, "encoder": enc}


# SAM pixel normalization (ImageNet stats, applied to [0,255])
PIXEL_MEAN = (123.675, 116.28, 103.53)
PIXEL_STD = (58.395, 57.12, 57.375)


def preprocess(images01: jnp.ndarray, img_size: int) -> jnp.ndarray:
    """(B, H, W, 3) in [0,1] -> (B, img_size, img_size, 3) normalized."""
    x = jax.image.resize(
        images01, (images01.shape[0], img_size, img_size, 3), method="linear"
    )
    mean = jnp.asarray(PIXEL_MEAN, x.dtype) / 255.0
    std = jnp.asarray(PIXEL_STD, x.dtype) / 255.0
    return (x - mean) / std


@partial(
    jax.jit,
    static_argnames=("v", "points_per_side", "max_masks", "mask_hw", "dtype", "impl"),
)
def generate_masks(
    params: Params,
    image01: jnp.ndarray,  # (H, W, 3) float in [0,1]
    v: SAMVariant,
    points_per_side: int = 12,
    pred_iou_thresh: float = 0.88,
    stability_thresh: float = 0.95,
    min_area: float = 100.0,
    nms_iou: float = 0.7,
    max_masks: int = 64,
    mask_hw: Tuple[int, int] | None = None,
    dtype=jnp.bfloat16,
    impl: str = "xla",
):
    """Automatic mask generation, fixed budget.

    Returns dict: masks (max_masks, H', W') bool, scores (max_masks,),
    boxes (max_masks, 4) in H'xW' pixels, valid (max_masks,), num scalar.
    H'xW' = `mask_hw` or the input resolution.
    """
    h, w, _ = image01.shape
    mask_hw = mask_hw or (h, w)
    x = preprocess(image01[None], v.img_size)
    emb = encode_image(params["encoder"], x, v, dtype=dtype, impl=impl)[0]  # (g, g, D)
    g = emb.shape[0]
    pe = image_pe(params["prompt"], g).astype(emb.dtype)

    pps = points_per_side
    t = (jnp.arange(pps, dtype=jnp.float32) + 0.5) / pps
    gy, gx = jnp.meshgrid(t, t, indexing="ij")
    pts = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)  # (P, 2) xy in [0,1]
    pcount = pps * pps
    # one foreground point + one padding point per prompt (SAM convention)
    points = jnp.stack([pts, jnp.zeros_like(pts)], axis=1)  # (P, 2, 2)
    labels = jnp.stack(
        [jnp.ones((pcount,), jnp.int32), -jnp.ones((pcount,), jnp.int32)], axis=1
    )
    sparse = encode_points(params["prompt"], points, labels).astype(emb.dtype)
    logits, iou_pred = decode_masks(
        params["decoder"], emb, pe, sparse, params["prompt"]["no_mask"].astype(emb.dtype), v
    )
    # multimask: drop token 0 (single-mask head), keep 1..3
    logits = logits[:, 1:].reshape(-1, logits.shape[-2], logits.shape[-1])
    scores = iou_pred[:, 1:].reshape(-1)
    # filter + NMS + top-k at DECODER resolution, then upsample only the kept
    # budget: stability/area/box passes over all 3*P candidates at full frame
    # res cost ~6x the kept-set work (432 vs 64 masks at VGA, measured ~12 ms
    # on v5e); thresholds scale by the pixel-area ratio
    lh, lw = logits.shape[-2], logits.shape[-1]
    area_scale = (mask_hw[0] * mask_hw[1]) / float(lh * lw)
    stab = mask_ops.stability_scores(logits)
    bin_lo = logits > 0.0
    areas = mask_ops.mask_areas(bin_lo) * area_scale
    ok = (scores > pred_iou_thresh) & (stab > stability_thresh) & (areas > min_area)
    boxes_lo = mask_ops.boxes_from_masks(bin_lo)
    keep = mask_ops.nms(boxes_lo, scores, ok, nms_iou)
    sel_scores = jnp.where(keep, scores, -jnp.inf)
    top_s, top_i = jax.lax.top_k(sel_scores, max_masks)
    out_valid = jnp.isfinite(top_s)
    logits_k = jax.image.resize(
        logits[top_i], (max_masks, mask_hw[0], mask_hw[1]), method="linear"
    )
    binm = logits_k > 0.0
    sx = mask_hw[1] / float(lw)
    sy = mask_hw[0] / float(lh)
    boxes = boxes_lo[top_i] * jnp.asarray([sx, sy, sx, sy], boxes_lo.dtype)
    return {
        "masks": binm & out_valid[:, None, None],
        "logits": logits_k,
        "scores": jnp.where(out_valid, top_s, 0.0),
        "boxes": boxes,
        "valid": out_valid,
        "num": jnp.sum(out_valid.astype(jnp.int32)),
    }


# ---------------------------------------------------------------------------
# Checkpoint conversion (official SAM torch state dict)
# ---------------------------------------------------------------------------


def convert_sam(state: Dict[str, np.ndarray], v: SAMVariant) -> Params:
    """Map an official `sam_vit_*.pth` state dict onto the pytree."""

    def g(name):
        t = state[name]
        if hasattr(t, "detach"):
            t = t.detach().cpu().numpy()
        return np.asarray(t, np.float32)

    def lin(prefix):
        return {"w": g(prefix + ".weight").T, "b": g(prefix + ".bias")}

    def attn4(prefix):
        return {
            "q": lin(prefix + ".q_proj"),
            "k": lin(prefix + ".k_proj"),
            "v": lin(prefix + ".v_proj"),
            "o": lin(prefix + ".out_proj"),
        }

    blocks = []
    for i in range(v.depth):
        pre = f"image_encoder.blocks.{i}"
        blocks.append(
            {
                "norm1_g": g(pre + ".norm1.weight"),
                "norm1_b": g(pre + ".norm1.bias"),
                "qkv": lin(pre + ".attn.qkv"),
                "proj": lin(pre + ".attn.proj"),
                "rel_h": g(pre + ".attn.rel_pos_h"),
                "rel_w": g(pre + ".attn.rel_pos_w"),
                "norm2_g": g(pre + ".norm2.weight"),
                "norm2_b": g(pre + ".norm2.bias"),
                "lin1": lin(pre + ".mlp.lin1"),
                "lin2": lin(pre + ".mlp.lin2"),
            }
        )
    conv = g("image_encoder.patch_embed.proj.weight")  # (W, 3, p, p)
    nm = v.num_mask_tokens
    params = {
        "encoder": {
            "patch_w": conv.transpose(2, 3, 1, 0).reshape(-1, conv.shape[0]),
            "patch_b": g("image_encoder.patch_embed.proj.bias"),
            "pos": g("image_encoder.pos_embed")[0],
            "blocks": blocks,
            "neck_conv1": g("image_encoder.neck.0.weight").transpose(2, 3, 1, 0),
            "neck_ln1_g": g("image_encoder.neck.1.weight"),
            "neck_ln1_b": g("image_encoder.neck.1.bias"),
            "neck_conv2": g("image_encoder.neck.2.weight").transpose(2, 3, 1, 0),
            "neck_ln2_g": g("image_encoder.neck.3.weight"),
            "neck_ln2_b": g("image_encoder.neck.3.bias"),
        },
        "prompt": {
            "gauss": g("prompt_encoder.pe_layer.positional_encoding_gaussian_matrix").T,
            "point_neg": g("prompt_encoder.point_embeddings.0.weight")[0],
            "point_pos": g("prompt_encoder.point_embeddings.1.weight")[0],
            "not_a_point": g("prompt_encoder.not_a_point_embed.weight")[0],
            "no_mask": g("prompt_encoder.no_mask_embed.weight")[0],
        },
        "decoder": {
            "iou_token": g("mask_decoder.iou_token.weight")[0],
            "mask_tokens": g("mask_decoder.mask_tokens.weight"),
            "layers": [
                {
                    "self_attn": attn4(f"mask_decoder.transformer.layers.{i}.self_attn"),
                    "norm1_g": g(f"mask_decoder.transformer.layers.{i}.norm1.weight"),
                    "norm1_b": g(f"mask_decoder.transformer.layers.{i}.norm1.bias"),
                    "cross_t2i": attn4(
                        f"mask_decoder.transformer.layers.{i}.cross_attn_token_to_image"
                    ),
                    "norm2_g": g(f"mask_decoder.transformer.layers.{i}.norm2.weight"),
                    "norm2_b": g(f"mask_decoder.transformer.layers.{i}.norm2.bias"),
                    "mlp1": lin(f"mask_decoder.transformer.layers.{i}.mlp.lin1"),
                    "mlp2": lin(f"mask_decoder.transformer.layers.{i}.mlp.lin2"),
                    "norm3_g": g(f"mask_decoder.transformer.layers.{i}.norm3.weight"),
                    "norm3_b": g(f"mask_decoder.transformer.layers.{i}.norm3.bias"),
                    "cross_i2t": attn4(
                        f"mask_decoder.transformer.layers.{i}.cross_attn_image_to_token"
                    ),
                    "norm4_g": g(f"mask_decoder.transformer.layers.{i}.norm4.weight"),
                    "norm4_b": g(f"mask_decoder.transformer.layers.{i}.norm4.bias"),
                }
                for i in range(v.decoder_depth)
            ],
            "final_t2i": attn4("mask_decoder.transformer.final_attn_token_to_image"),
            "norm_final_g": g("mask_decoder.transformer.norm_final_attn.weight"),
            "norm_final_b": g("mask_decoder.transformer.norm_final_attn.bias"),
            "up1_w": g("mask_decoder.output_upscaling.0.weight").transpose(2, 3, 0, 1),
            "up1_b": g("mask_decoder.output_upscaling.0.bias"),
            "up_ln_g": g("mask_decoder.output_upscaling.1.weight"),
            "up_ln_b": g("mask_decoder.output_upscaling.1.bias"),
            "up2_w": g("mask_decoder.output_upscaling.3.weight").transpose(2, 3, 0, 1),
            "up2_b": g("mask_decoder.output_upscaling.3.bias"),
            "hyper": [
                {
                    "l1": lin(f"mask_decoder.output_hypernetworks_mlps.{i}.layers.0"),
                    "l2": lin(f"mask_decoder.output_hypernetworks_mlps.{i}.layers.1"),
                    "l3": lin(f"mask_decoder.output_hypernetworks_mlps.{i}.layers.2"),
                }
                for i in range(nm)
            ],
            "iou_head": {
                "l1": lin("mask_decoder.iou_prediction_head.layers.0"),
                "l2": lin("mask_decoder.iou_prediction_head.layers.1"),
                "l3": lin("mask_decoder.iou_prediction_head.layers.2"),
            },
        },
    }
    return jax.tree.map(jnp.asarray, params)


def load_checkpoint(path: str, v: SAMVariant) -> Params:
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    return convert_sam(state, v)
