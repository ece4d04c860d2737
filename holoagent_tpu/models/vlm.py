"""On-slice generative VLM for the slow reasoning path.

The reference outsources all three slow-path roles (query parsing,
object-in-image verification, gallery frame choice) to Azure GPT-4V over
HTTPS with images bounced through object storage
(reference fsr_vln/memory/hmsg/graph/graph.py:2292-2482,
utils/llm_utils.py:383-466).  This module is the on-device replacement: a
LLaVA-style decoder-only LM whose prompt embeds per-image token blocks from
the CLIP vision tower through a linear projector.  Multi-image gallery
prompts (24 images x vision tokens, graph.py:2896-2897) are long sequences —
prefill uses the same stacked-scan transformer core; decode runs on a static
KV cache so the serving layer (holoagent_tpu.serving) can continuously batch
requests slot-per-slot.

No public checkpoint is assumed: the architecture is generic
(`convert_hf_llama`-style loaders can be added per checkpoint family), and
the query layer only depends on the `generate` contract.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import clip as clip_mod
from . import transformer as tfm

Params = Dict[str, Any]


@dataclass(frozen=True)
class VLMVariant:
    name: str
    vocab: int = 49408  # shares the CLIP BPE space
    width: int = 512
    layers: int = 8
    heads: int = 8
    max_seq: int = 4096
    image_tokens: int = 16  # pooled vision tokens per image
    clip_variant: str = "ViT-B-32"


VARIANTS = {
    "vlm-base": VLMVariant("vlm-base", width=1024, layers=16, heads=16),
    "vlm-small": VLMVariant("vlm-small", width=512, layers=8, heads=8),
    "test-tiny": VLMVariant(
        "test-tiny", width=64, layers=2, heads=2, max_seq=256, image_tokens=4,
        clip_variant="test-tiny",
    ),
}


def init_vlm(key: jax.Array, v: VLMVariant, dtype=jnp.float32) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    cv = clip_mod.VARIANTS[v.clip_variant]
    return {
        "tok_emb": tfm._normal(k1, (v.vocab, v.width), 0.02, dtype),
        "pos": tfm._normal(k2, (v.max_seq, v.width), 0.01, dtype),
        "blocks": tfm.init_block_stack(k3, v.layers, v.width, dtype=dtype),
        "ln_f_g": jnp.ones((v.width,), dtype),
        "ln_f_b": jnp.zeros((v.width,), dtype),
        # vision projector: CLIP patch embedding dim -> LM width
        "proj_w": tfm._normal(k4, (cv.embed_dim, v.width), cv.embed_dim**-0.5, dtype),
        "proj_b": jnp.zeros((v.width,), dtype),
    }


# ---------------------------------------------------------------------------
# Vision -> token blocks
# ---------------------------------------------------------------------------


def encode_images(
    vlm_params: Params,
    clip_params: Params,
    images: jnp.ndarray,  # (N, S, S, 3) preprocessed
    v: VLMVariant,
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """(N, image_tokens, width) vision token blocks.

    The CLIP tower's final embedding is pooled; we tile it into
    `image_tokens` slots modulated by a learned positional ramp so each image
    contributes a fixed block (static shapes; richer patch-token projectors
    drop in behind the same signature)."""
    feats = clip_mod.encode_image(
        clip_params, images, clip_mod.VARIANTS[v.clip_variant], dtype=dtype, normalize=True
    )  # (N, D)
    proj = (
        jnp.einsum(
            "nd,dw->nw", feats.astype(dtype), vlm_params["proj_w"].astype(dtype),
            preferred_element_type=jnp.float32,
        )
        + vlm_params["proj_b"].astype(jnp.float32)
    ).astype(dtype)  # (N, W)
    ramp = vlm_params["pos"][: v.image_tokens].astype(dtype)  # (T_img, W)
    return proj[:, None, :] + ramp[None, :, :]


# ---------------------------------------------------------------------------
# Prefill / decode with KV cache
# ---------------------------------------------------------------------------


class KVCache(NamedTuple):
    k: jnp.ndarray  # (L, B, Tmax, H, Dh)
    v: jnp.ndarray  # (L, B, Tmax, H, Dh)
    length: jnp.ndarray  # (B,) int32 tokens filled


def init_cache(v: VLMVariant, batch: int, dtype=jnp.bfloat16) -> KVCache:
    dh = v.width // v.heads
    shape = (v.layers, batch, v.max_seq, v.heads, dh)
    return KVCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        length=jnp.zeros((batch,), jnp.int32),
    )


def _block_with_cache(x, layer_params, ki, vi, pos, length, heads):
    """One decode block over cached keys/values. x: (B, 1, W)."""
    b, _, w = x.shape
    dh = w // heads
    p = layer_params
    xn = tfm.layer_norm(x, p["ln1_g"], p["ln1_b"])
    qkv = (
        jnp.einsum("btw,wc->btc", xn, p["wqkv"], preferred_element_type=jnp.float32)
        + p["bqkv"].astype(jnp.float32)
    ).astype(x.dtype)
    q, k_new, v_new = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, heads, dh)
    k_new = k_new.reshape(b, heads, dh)
    v_new = v_new.reshape(b, heads, dh)
    # write new kv at per-slot position
    ki = ki.at[jnp.arange(b), pos].set(k_new)
    vi = vi.at[jnp.arange(b), pos].set(v_new)
    tmax = ki.shape[1]
    mask = jax.lax.broadcasted_iota(jnp.int32, (b, tmax), 1) <= pos[:, None]
    scores = jnp.einsum("bhd,bthd->bht", q, ki, preferred_element_type=jnp.float32) * (
        dh**-0.5
    )
    scores = jnp.where(mask[:, None, :], scores, -jnp.inf)  # (b, h, t)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    att = jnp.einsum("bht,bthd->bhd", probs, vi, preferred_element_type=jnp.float32)
    att = att.astype(x.dtype).reshape(b, 1, w)
    att = (
        jnp.einsum("btw,wc->btc", att, p["wo"], preferred_element_type=jnp.float32)
        + p["bo"].astype(jnp.float32)
    ).astype(x.dtype)
    x = x + att
    xn = tfm.layer_norm(x, p["ln2_g"], p["ln2_b"])
    h = jax.nn.gelu(
        jnp.einsum("btw,wc->btc", xn, p["w1"], preferred_element_type=jnp.float32)
        + p["b1"].astype(jnp.float32)
    ).astype(x.dtype)
    x = x + (
        jnp.einsum("btc,cw->btw", h, p["w2"], preferred_element_type=jnp.float32)
        + p["b2"].astype(jnp.float32)
    ).astype(x.dtype)
    return x, ki, vi


@partial(jax.jit, static_argnames=("v", "dtype", "impl", "interpret"))
def prefill(
    params: Params,
    embeddings: jnp.ndarray,  # (B, T, W) already-embedded prompt (text+vision)
    valid_len: jnp.ndarray,  # (B,) int32
    cache: KVCache,
    v: VLMVariant,
    dtype=jnp.bfloat16,
    impl: str = "xla",  # "flash": Pallas causal attention for long prompts
    interpret: bool = False,  # Pallas interpret mode (CPU tests)
) -> Tuple[jnp.ndarray, KVCache]:
    """Run the prompt through the stacked-scan core, filling the KV cache.
    Returns (logits at the last valid position (B, vocab), cache).

    impl="flash" routes the prefill attention through the Pallas causal
    kernel — the multi-image gallery prompts (24 x vision tokens, SURVEY.md
    §5.7) are long enough that the (T, T) score tensor dominates HBM."""
    b, t, w = embeddings.shape
    x = embeddings.astype(dtype) + params["pos"][:t].astype(dtype)
    causal = jnp.triu(jnp.full((t, t), -jnp.inf, jnp.float32), k=1)
    blocks = jax.tree.map(lambda a: a.astype(dtype), params["blocks"])

    # capture per-layer K/V by scanning with collection
    def body(h, layer_params):
        p = layer_params
        xn = tfm.layer_norm(h, p["ln1_g"], p["ln1_b"])
        qkv = (
            jnp.einsum("btw,wc->btc", xn, p["wqkv"], preferred_element_type=jnp.float32)
            + p["bqkv"].astype(jnp.float32)
        ).astype(h.dtype)
        q, k, val = jnp.split(qkv, 3, axis=-1)
        dh = w // v.heads
        qh = q.reshape(b, t, v.heads, dh)
        kh = k.reshape(b, t, v.heads, dh)
        vh = val.reshape(b, t, v.heads, dh)
        if impl == "flash":
            from ..ops.flash_attention import flash_attention

            att = flash_attention(
                qh.transpose(0, 2, 1, 3),
                kh.transpose(0, 2, 1, 3),
                vh.transpose(0, 2, 1, 3),
                causal=True,
                interpret=interpret,
            ).transpose(0, 2, 1, 3)
        else:
            s = jnp.einsum(
                "bthd,bshd->bhts", qh, kh, preferred_element_type=jnp.float32
            ) * (dh**-0.5) + causal
            pr = jax.nn.softmax(s, axis=-1).astype(h.dtype)
            att = jnp.einsum(
                "bhts,bshd->bthd", pr, vh, preferred_element_type=jnp.float32
            )
        att = att.astype(h.dtype).reshape(b, t, w)
        att = (
            jnp.einsum("btw,wc->btc", att, p["wo"], preferred_element_type=jnp.float32)
            + p["bo"].astype(jnp.float32)
        ).astype(h.dtype)
        h = h + att
        xn = tfm.layer_norm(h, p["ln2_g"], p["ln2_b"])
        mid = jax.nn.gelu(
            jnp.einsum("btw,wc->btc", xn, p["w1"], preferred_element_type=jnp.float32)
            + p["b1"].astype(jnp.float32)
        ).astype(h.dtype)
        h = h + (
            jnp.einsum("btc,cw->btw", mid, p["w2"], preferred_element_type=jnp.float32)
            + p["b2"].astype(jnp.float32)
        ).astype(h.dtype)
        return h, (kh, vh)

    x, (ks, vs) = jax.lax.scan(body, x, blocks)
    # write prompt K/V into the cache
    cache_k = cache.k.at[:, :, :t].set(ks.astype(cache.k.dtype))
    cache_v = cache.v.at[:, :, :t].set(vs.astype(cache.v.dtype))
    x = tfm.layer_norm(x, params["ln_f_g"], params["ln_f_b"])
    last = jnp.take_along_axis(
        x, (valid_len - 1)[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]
    logits = jnp.einsum(
        "bw,vw->bv", last, params["tok_emb"].astype(dtype), preferred_element_type=jnp.float32
    )
    return logits, KVCache(k=cache_k, v=cache_v, length=valid_len.astype(jnp.int32))


@partial(jax.jit, static_argnames=("v", "dtype"))
def decode_step(
    params: Params,
    tokens: jnp.ndarray,  # (B,) int32 current tokens
    cache: KVCache,
    active: jnp.ndarray,  # (B,) bool slots that should advance
    v: VLMVariant,
    dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, KVCache]:
    """One autoregressive step for all active slots. Returns (logits (B, vocab),
    cache). Inactive slots are untouched."""
    b = tokens.shape[0]
    pos = cache.length
    x = params["tok_emb"][tokens].astype(dtype)[:, None, :]
    x = x + params["pos"][jnp.clip(pos, 0, v.max_seq - 1)].astype(dtype)[:, None, :]
    blocks = params["blocks"]
    new_k, new_v = [], []
    for li in range(v.layers):
        lp = jax.tree.map(lambda a: a[li].astype(dtype), blocks)
        x, ki, vi = _block_with_cache(
            x, lp, cache.k[li].astype(dtype), cache.v[li].astype(dtype), pos, cache.length, v.heads
        )
        new_k.append(ki)
        new_v.append(vi)
    x = tfm.layer_norm(x[:, 0], params["ln_f_g"], params["ln_f_b"])
    logits = jnp.einsum(
        "bw,vw->bv", x, params["tok_emb"].astype(dtype), preferred_element_type=jnp.float32
    )
    k_st = jnp.stack(new_k).astype(cache.k.dtype)
    v_st = jnp.stack(new_v).astype(cache.v.dtype)
    keep = active[None, :, None, None, None]
    cache = KVCache(
        k=jnp.where(keep, k_st, cache.k),
        v=jnp.where(keep, v_st, cache.v),
        length=jnp.where(active, cache.length + 1, cache.length),
    )
    return logits, cache


def build_prompt_embeddings(
    vlm_params: Params,
    clip_params: Params,
    token_ids: np.ndarray,  # (T_text,) int32 text tokens
    images: Optional[jnp.ndarray],  # (N, S, S, 3) preprocessed or None
    v: VLMVariant,
    max_len: int,
    dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, int]:
    """[image blocks..., text tokens] -> (max_len, W) padded embeddings +
    valid length."""
    parts = []
    if images is not None and images.shape[0] > 0:
        blocks = encode_images(vlm_params, clip_params, images, v, dtype=dtype)
        parts.append(blocks.reshape(-1, blocks.shape[-1]))
    txt = vlm_params["tok_emb"][jnp.asarray(token_ids)].astype(dtype)
    parts.append(txt)
    emb = jnp.concatenate(parts, axis=0)[:max_len]
    n = emb.shape[0]
    pad = jnp.zeros((max_len - n, emb.shape[-1]), emb.dtype)
    return jnp.concatenate([emb, pad], axis=0), n
