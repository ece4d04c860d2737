"""CLIP image/text towers, TPU-native.

Functional reimplementation of the contrastive towers the reference drives
through open_clip (reference fsr_vln/memory/hmsg/graph/graph.py:98-200 loads
ViT-L/14, ViT-H/14 or ViT-B-32; tower dims per
reference fsr_vln/memory/hmsg/utils/constants.py:3-7).  Parameters are stacked
per-layer pytrees (one `lax.scan` per tower body), compute is bfloat16 on the
MXU, and `convert_open_clip` maps an open_clip/torch state dict onto the
pytree so pretrained weights drop in when a checkpoint file is available.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from . import transformer as tfm

Params = Dict[str, Any]

# open_clip / CLIP normalization constants
IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclass(frozen=True)
class CLIPVariant:
    name: str
    image_size: int
    patch: int
    v_width: int
    v_layers: int
    v_heads: int
    t_width: int
    t_layers: int
    t_heads: int
    embed_dim: int
    vocab: int = 49408
    ctx: int = 77


VARIANTS = {
    "ViT-B-32": CLIPVariant("ViT-B-32", 224, 32, 768, 12, 12, 512, 12, 8, 512),
    "ViT-L-14": CLIPVariant("ViT-L-14", 224, 14, 1024, 24, 16, 768, 12, 12, 768),
    "ViT-H-14": CLIPVariant("ViT-H-14", 224, 14, 1280, 32, 16, 1024, 24, 16, 1024),
}

# tiny variant for hermetic tests
VARIANTS["test-tiny"] = CLIPVariant("test-tiny", 32, 8, 64, 2, 4, 64, 2, 4, 32, vocab=49408, ctx=77)


def clip_dim(name: str) -> int:
    """Embedding dim lookup (reference utils/constants.py:3-7 CLIP_DIM)."""
    return VARIANTS[name].embed_dim


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_clip(key: jax.Array, variant: CLIPVariant, dtype=jnp.float32) -> Params:
    kv, kt, kb1, kb2, kp1, kp2, ke = jax.random.split(key, 7)
    n_patches = (variant.image_size // variant.patch) ** 2
    scale_v = variant.v_width**-0.5
    scale_t = variant.t_width**-0.5
    return {
        "visual": {
            "patch_w": tfm._normal(
                kv, (variant.patch * variant.patch * 3, variant.v_width), scale_v, dtype
            ),
            "cls": tfm._normal(kp1, (variant.v_width,), scale_v, dtype),
            "pos": tfm._normal(kp2, (n_patches + 1, variant.v_width), scale_v, dtype),
            "ln_pre_g": jnp.ones((variant.v_width,), dtype),
            "ln_pre_b": jnp.zeros((variant.v_width,), dtype),
            "blocks": tfm.init_block_stack(kb1, variant.v_layers, variant.v_width, dtype=dtype),
            "ln_post_g": jnp.ones((variant.v_width,), dtype),
            "ln_post_b": jnp.zeros((variant.v_width,), dtype),
            "proj": tfm._normal(ke, (variant.v_width, variant.embed_dim), scale_v, dtype),
        },
        "text": {
            "tok_emb": tfm._normal(kt, (variant.vocab, variant.t_width), 0.02, dtype),
            "pos": tfm._normal(kt, (variant.ctx, variant.t_width), 0.01, dtype),
            "blocks": tfm.init_block_stack(kb2, variant.t_layers, variant.t_width, dtype=dtype),
            "ln_final_g": jnp.ones((variant.t_width,), dtype),
            "ln_final_b": jnp.zeros((variant.t_width,), dtype),
            "proj": tfm._normal(kt, (variant.t_width, variant.embed_dim), scale_t, dtype),
        },
        "logit_scale": jnp.asarray(np.log(1 / 0.07), jnp.float32),
    }


# ---------------------------------------------------------------------------
# Preprocess
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("size",))
def preprocess(images: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """Resize (B, H, W, 3) float [0,1] to (B, size, size, 3) and normalize.

    The reference's torchvision pipeline resizes the short side bicubically and
    center-crops (open_clip default); on-device we resize the center-cropped
    square directly with cubic interpolation.
    """
    b, h, w, _ = images.shape
    s = min(h, w)
    y0 = (h - s) // 2
    x0 = (w - s) // 2
    sq = jax.lax.dynamic_slice(images, (0, y0, x0, 0), (b, s, s, 3))
    out = jax.image.resize(sq, (b, size, size, 3), method="cubic")
    mean = jnp.asarray(IMAGE_MEAN, images.dtype)
    std = jnp.asarray(IMAGE_STD, images.dtype)
    return (out - mean) / std


# jitted entry for eager callers (serving admission): the center-crop/resize/
# normalize chain is ~4 dispatches eager — one compile per (batch, H, W)
# amortizes it to a single dispatch (gallery frames share one shape)
preprocess_jit = jax.jit(preprocess, static_argnames=("size",))


# ---------------------------------------------------------------------------
# Towers
# ---------------------------------------------------------------------------


def encode_image(
    params: Params,
    images: jnp.ndarray,  # (B, S, S, 3) already preprocessed
    variant: CLIPVariant,
    dtype=jnp.bfloat16,
    normalize: bool = True,
    remat: bool = False,
    impl: str = "xla",  # "flash": Pallas blockwise attention (TPU only)
    qmm: str = "xla",  # int8 matmul path: "pallas" = fused quant kernel
) -> jnp.ndarray:
    """Image tower: patchify -> pre-LN ViT -> cls token -> projection.

    impl="flash" streams attention through the Pallas kernel — at the crop
    batch of the mapping pipeline (129 x 16 heads x 257 tokens) the XLA path
    writes/reads ~26 GB of f32 score tensors across the 24 layers."""
    v = params["visual"]
    p = variant.patch
    b, s, _, _ = images.shape
    g = s // p
    # patchify as reshape+matmul (the conv1 of the reference towers is exactly
    # a stride-p pxp conv == per-patch linear)
    x = images.reshape(b, g, p, g, p, 3).transpose(0, 1, 3, 2, 4, 5).reshape(b, g * g, p * p * 3)
    x = x.astype(dtype)
    x = jnp.einsum(
        "bnd,dw->bnw", x, v["patch_w"].astype(dtype), preferred_element_type=jnp.float32
    ).astype(dtype)
    cls = jnp.broadcast_to(v["cls"].astype(dtype), (b, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + v["pos"].astype(dtype)
    x = tfm.layer_norm(x, v["ln_pre_g"], v["ln_pre_b"])
    if "blocks_q8" in v:
        # int8 tower (see quantize_clip): W8A8 matmuls on the MXU at 2x the
        # bf16 peak; attention contractions stay bf16
        x = tfm.run_stack_q8(x, v["blocks_q8"], variant.v_heads, impl=impl, qmm=qmm)
    else:
        blocks = jax.tree.map(lambda a: a.astype(dtype), v["blocks"])
        x = tfm.run_stack(x, blocks, variant.v_heads, remat=remat, impl=impl)
    x = tfm.layer_norm(x[:, 0], v["ln_post_g"], v["ln_post_b"])
    feats = jnp.einsum(
        "bw,wd->bd", x, v["proj"].astype(dtype), preferred_element_type=jnp.float32
    )
    if normalize:
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    return feats


def encode_text(
    params: Params,
    tokens: jnp.ndarray,  # (B, ctx) int32
    variant: CLIPVariant,
    dtype=jnp.bfloat16,
    normalize: bool = True,
) -> jnp.ndarray:
    """Text tower: causal transformer, features read at the <eot> position."""
    t = params["text"]
    x = t["tok_emb"][tokens].astype(dtype) + t["pos"].astype(dtype)
    ctx = tokens.shape[1]
    causal = jnp.triu(jnp.full((ctx, ctx), -jnp.inf, jnp.float32), k=1)
    if "blocks_q8" in t:
        x = tfm.run_stack_q8(x, t["blocks_q8"], variant.t_heads, mask=causal)
    else:
        blocks = jax.tree.map(lambda a: a.astype(dtype), t["blocks"])
        x = tfm.run_stack(x, blocks, variant.t_heads, mask=causal)
    x = tfm.layer_norm(x, t["ln_final_g"], t["ln_final_b"])
    eot = jnp.argmax(tokens, axis=-1)  # <eot> has the largest token id
    x = x[jnp.arange(tokens.shape[0]), eot]
    feats = jnp.einsum(
        "bw,wd->bd", x, t["proj"].astype(dtype), preferred_element_type=jnp.float32
    )
    if normalize:
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    return feats


# ---------------------------------------------------------------------------
# Multi-template text features
# ---------------------------------------------------------------------------

# active template set (reference utils/clip_utils.py:271-335 keeps two)
TEMPLATES = ("{}", "a photo of {} in the scene.")

# extended prompt-ensemble bank (role of the reference's large multi-template
# variant, utils/clip_utils.py:165-254; standard CLIP prompt-engineering set)
EXTENDED_TEMPLATES = (
    "{}",
    "a photo of a {}.",
    "a photo of the {}.",
    "a photo of one {}.",
    "a photo of a {} in the scene.",
    "a photo of the {} in the scene.",
    "a bad photo of a {}.",
    "a bad photo of the {}.",
    "a good photo of a {}.",
    "a good photo of the {}.",
    "a cropped photo of a {}.",
    "a cropped photo of the {}.",
    "a close-up photo of a {}.",
    "a close-up photo of the {}.",
    "a bright photo of a {}.",
    "a bright photo of the {}.",
    "a dark photo of a {}.",
    "a dark photo of the {}.",
    "a blurry photo of a {}.",
    "a blurry photo of the {}.",
    "a photo of a small {}.",
    "a photo of the small {}.",
    "a photo of a large {}.",
    "a photo of the large {}.",
    "a photo of a clean {}.",
    "a photo of the clean {}.",
    "a photo of a dirty {}.",
    "a photo of the dirty {}.",
    "a low resolution photo of a {}.",
    "a low resolution photo of the {}.",
    "a pixelated photo of a {}.",
    "a pixelated photo of the {}.",
    "a jpeg corrupted photo of a {}.",
    "a jpeg corrupted photo of the {}.",
    "a photo of a {} in a room.",
    "a photo of the {} in a room.",
    "a photo of a {} in a house.",
    "a photo of the {} in a house.",
    "there is a {} in the scene.",
    "there is the {} in the scene.",
    "this is a {} in the scene.",
    "this is the {} in the scene.",
    "this is one {} in the scene.",
    "an indoor photo of a {}.",
    "an indoor photo of the {}.",
    "a rendering of a {}.",
    "a rendering of the {}.",
    "a picture of a {}.",
    "a picture of the {}.",
    "an image of a {}.",
    "an image of the {}.",
    "a photo of a {} on a floor.",
    "a photo of the {} on a floor.",
    "a photo of a nice {}.",
    "a photo of the nice {}.",
    "a photo of a weird {}.",
    "a photo of the weird {}.",
    "a photo of my {}.",
    "i took a picture of a {}.",
    "a photograph of a {}.",
    "a photograph of the {}.",
)


def quantize_clip(params: Params, towers=("visual",)) -> Params:
    """Per-output-channel int8 quantization of the tower transformer blocks
    (W8A8, transformer.quantize_block_stack).  Embeddings/projections stay
    float (they are <5% of the FLOPs).  The returned pytree drops the float
    block weights for the quantized towers; encode_image/encode_text dispatch
    on the presence of "blocks_q8"."""
    out = dict(params)
    for t in towers:
        tower = dict(params[t])
        tower["blocks_q8"] = tfm.quantize_block_stack(tower.pop("blocks"))
        out[t] = tower
    return out


_encode_text_jit = jax.jit(encode_text, static_argnames=("variant", "dtype", "normalize"))

# Jitted tower entry points for callers OUTSIDE a jit context (query engine,
# VLM backends, serving).  Eager tower calls dispatch op-by-op — through the
# sandbox's RPC tunnel that is ~30 ms per op across hundreds of ops.
encode_image_jit = jax.jit(
    encode_image,
    static_argnames=("variant", "dtype", "normalize", "remat", "impl", "qmm"),
)
encode_text_jit = _encode_text_jit


def text_features_multi_template(
    params: Params,
    tokenizer,
    labels,
    variant: CLIPVariant,
    templates=TEMPLATES,
    dtype=jnp.bfloat16,
    batch_size: int = 256,
) -> jnp.ndarray:
    """Mean text embedding over prompt templates per label — semantics of
    reference utils/clip_utils.py:257-349 (`get_text_feats_multiple_templates`).
    Returns (len(labels), D) float32, L2-normalized per template then averaged.
    """
    prompts = [t.format(lb) for lb in labels for t in templates]
    tokens = tokenizer(prompts)
    feats = []
    # module-level jit: a fresh jax.jit(partial(...)) per call would retrace
    # and recompile on EVERY query label (measured 3.2 s/label through the
    # remote-compile tunnel vs ~40 ms cached)
    enc = partial(_encode_text_jit, variant=variant, dtype=dtype)
    for i in range(0, len(prompts), batch_size):
        chunk = tokens[i : i + batch_size]
        pad = batch_size - chunk.shape[0]
        if pad:
            chunk = np.pad(chunk, ((0, pad), (0, 0)))
        feats.append(np.asarray(enc(params, jnp.asarray(chunk)), np.float32)[: batch_size - pad if pad else batch_size])
    f = np.concatenate(feats, axis=0)[: len(prompts)]
    f = f.reshape(len(labels), len(templates), -1).mean(axis=1)
    return jnp.asarray(f)


# ---------------------------------------------------------------------------
# Checkpoint conversion (torch/open_clip state dict -> our pytree)
# ---------------------------------------------------------------------------


def convert_open_clip(state: Dict[str, "np.ndarray"], variant: CLIPVariant) -> Params:
    """Map an open_clip CLIP state dict (torch tensor or numpy values) onto the
    stacked pytree.  Torch Linear weights are (out, in) and are transposed."""

    def g(name):
        v = state[name]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, np.float32)

    def stack(prefix, layers, fn):
        return np.stack([fn(f"{prefix}.{i}") for i in range(layers)])

    def blocks(prefix, layers):
        return {
            "ln1_g": stack(prefix, layers, lambda p: g(f"{p}.ln_1.weight")),
            "ln1_b": stack(prefix, layers, lambda p: g(f"{p}.ln_1.bias")),
            "wqkv": stack(prefix, layers, lambda p: g(f"{p}.attn.in_proj_weight").T),
            "bqkv": stack(prefix, layers, lambda p: g(f"{p}.attn.in_proj_bias")),
            "wo": stack(prefix, layers, lambda p: g(f"{p}.attn.out_proj.weight").T),
            "bo": stack(prefix, layers, lambda p: g(f"{p}.attn.out_proj.bias")),
            "ln2_g": stack(prefix, layers, lambda p: g(f"{p}.ln_2.weight")),
            "ln2_b": stack(prefix, layers, lambda p: g(f"{p}.ln_2.bias")),
            "w1": stack(prefix, layers, lambda p: g(f"{p}.mlp.c_fc.weight").T),
            "b1": stack(prefix, layers, lambda p: g(f"{p}.mlp.c_fc.bias")),
            "w2": stack(prefix, layers, lambda p: g(f"{p}.mlp.c_proj.weight").T),
            "b2": stack(prefix, layers, lambda p: g(f"{p}.mlp.c_proj.bias")),
        }

    conv = g("visual.conv1.weight")  # (W, 3, P, P)
    patch_w = conv.transpose(2, 3, 1, 0).reshape(-1, conv.shape[0])  # (P*P*3, W)
    params = {
        "visual": {
            "patch_w": patch_w,
            "cls": g("visual.class_embedding"),
            "pos": g("visual.positional_embedding"),
            "ln_pre_g": g("visual.ln_pre.weight"),
            "ln_pre_b": g("visual.ln_pre.bias"),
            "blocks": blocks("visual.transformer.resblocks", variant.v_layers),
            "ln_post_g": g("visual.ln_post.weight"),
            "ln_post_b": g("visual.ln_post.bias"),
            "proj": g("visual.proj"),
        },
        "text": {
            "tok_emb": g("token_embedding.weight"),
            "pos": g("positional_embedding"),
            "blocks": blocks("transformer.resblocks", variant.t_layers),
            "ln_final_g": g("ln_final.weight"),
            "ln_final_b": g("ln_final.bias"),
            "proj": g("text_projection"),
        },
        "logit_scale": g("logit_scale"),
    }
    return jax.tree.map(jnp.asarray, params)


def load_checkpoint(path: str, variant: CLIPVariant) -> Params:
    """Load an open_clip `.bin`/`.pt` torch checkpoint and convert."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in state:
        state = state["state_dict"]
    state = {k.removeprefix("module."): v for k, v in state.items()}
    return convert_open_clip(state, variant)
