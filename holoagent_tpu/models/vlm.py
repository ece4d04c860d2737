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

Weight loading: `convert_hf_llava` maps a HuggingFace LLaVA-family checkpoint
(LlavaForConditionalGeneration or a bare LlamaForCausalLM state_dict — the
public small-VLM families: LLaVA / TinyLLaVA / TinyLlama backbones) into the
``arch="llama"`` parameter tree below; tests verify logits match
`transformers`' reference implementation exactly on a locally-instantiated
model, so any real checkpoint file drops in.  The random-init ``arch="gpt"``
variants remain for shape/throughput work, and the query layer only depends
on the `generate` contract.
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
    arch: str = "gpt"  # "gpt" (learned pos, LN, gelu) | "llama" (RoPE, RMS, SwiGLU)
    kv_heads: int = 0  # grouped-query attention; 0 -> = heads
    mlp_hidden: int = 0  # 0 -> 4*width (gpt) / llama intermediate size
    rope_theta: float = 10000.0
    norm_eps: float = 1e-5

    @property
    def n_kv(self) -> int:
        return self.kv_heads or self.heads

    @property
    def hidden(self) -> int:
        return self.mlp_hidden or 4 * self.width


VARIANTS = {
    "vlm-base": VLMVariant("vlm-base", width=1024, layers=16, heads=16),
    "vlm-small": VLMVariant("vlm-small", width=512, layers=8, heads=8),
    # TinyLlama-1.1B geometry: the smallest public LLaVA-family backbone
    # (convert_hf_llava loads its checkpoints directly)
    "llava-tinyllama": VLMVariant(
        "llava-tinyllama", vocab=32000, width=2048, layers=22, heads=32,
        kv_heads=4, mlp_hidden=5632, max_seq=2048, arch="llama",
        clip_variant="ViT-L-14",
    ),
    "test-tiny": VLMVariant(
        "test-tiny", width=64, layers=2, heads=2, max_seq=256, image_tokens=4,
        clip_variant="test-tiny",
    ),
    "test-tiny-llama": VLMVariant(
        "test-tiny-llama", vocab=256, width=64, layers=2, heads=4, kv_heads=2,
        mlp_hidden=128, max_seq=128, image_tokens=4, arch="llama",
        clip_variant="test-tiny",
    ),
}


def init_vlm(key: jax.Array, v: VLMVariant, dtype=jnp.float32) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    cv = clip_mod.VARIANTS[v.clip_variant]
    if v.arch == "llama":
        dh = v.width // v.heads
        ks = jax.random.split(k3, 7)
        std = v.width**-0.5
        blocks = {
            "ln1_g": jnp.ones((v.layers, v.width), dtype),
            "wq": tfm._normal(ks[0], (v.layers, v.width, v.heads * dh), std, dtype),
            "wk": tfm._normal(ks[1], (v.layers, v.width, v.n_kv * dh), std, dtype),
            "wv": tfm._normal(ks[5], (v.layers, v.width, v.n_kv * dh), std, dtype),
            "wo": tfm._normal(ks[2], (v.layers, v.heads * dh, v.width), std, dtype),
            "ln2_g": jnp.ones((v.layers, v.width), dtype),
            "w_gate": tfm._normal(ks[3], (v.layers, v.width, v.hidden), std, dtype),
            "w_up": tfm._normal(ks[6], (v.layers, v.width, v.hidden), std, dtype),
            "w_down": tfm._normal(ks[4], (v.layers, v.hidden, v.width), std, dtype),
        }
        return {
            "tok_emb": tfm._normal(k1, (v.vocab, v.width), 0.02, dtype),
            # no learned positions (RoPE); the image-block ramp stays zero so
            # converted checkpoints see exactly their own embedding space
            "pos": jnp.zeros((v.max_seq, v.width), dtype),
            "blocks": blocks,
            "ln_f_g": jnp.ones((v.width,), dtype),
            "lm_head": tfm._normal(k2, (v.vocab, v.width), 0.02, dtype),
            "proj_w": tfm._normal(k4, (cv.embed_dim, v.width), cv.embed_dim**-0.5, dtype),
            "proj_b": jnp.zeros((v.width,), dtype),
        }
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
# Llama-family core (RoPE / RMSNorm / SwiGLU, HF-exact semantics)
# ---------------------------------------------------------------------------


def _rms_norm(x: jnp.ndarray, g: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (y * g.astype(jnp.float32)).astype(x.dtype)


def _rope_cos_sin(pos: jnp.ndarray, dh: int, theta: float):
    """HF llama convention: inv_freq over even dims, emb = cat(freqs, freqs).
    pos: (...,) int32 -> cos/sin (..., dh) f32."""
    inv = 1.0 / (theta ** (jnp.arange(0, dh, 2, dtype=jnp.float32) / dh))
    freqs = pos[..., None].astype(jnp.float32) * inv  # (..., dh/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """x: (..., dh); rotate_half as in HF."""
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return (x.astype(jnp.float32) * cos + rot.astype(jnp.float32) * sin).astype(x.dtype)


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
    )  # (N, W)
    if "proj2_w" in vlm_params:
        # LLaVA-style 2-layer projector: linear_1 -> gelu -> linear_2
        proj = (
            jnp.einsum(
                "nw,wc->nc", jax.nn.gelu(proj).astype(dtype),
                vlm_params["proj2_w"].astype(dtype),
                preferred_element_type=jnp.float32,
            )
            + vlm_params["proj2_b"].astype(jnp.float32)
        )
    proj = proj.astype(dtype)
    ramp = vlm_params["pos"][: v.image_tokens].astype(dtype)  # (T_img, W)
    return proj[:, None, :] + ramp[None, :, :]


# jitted entry for callers outside a jit context (serving admit path): eager
# tower calls dispatch op-by-op, ~30 ms/op through the sandbox's RPC tunnel
encode_images_jit = jax.jit(encode_images, static_argnames=("v", "dtype"))


@partial(jax.jit, static_argnames=("t", "v", "dtype"))
def image_text_prompt_embeddings(
    vlm_params: Params,
    clip_params: Params,
    ids: jnp.ndarray,  # (T_ids,) int32 text tokens, host-padded
    n_text: jnp.ndarray,  # () int32 valid text tokens
    images: jnp.ndarray,  # (N, S, S, 3) preprocessed
    t: int,  # static output length
    v: VLMVariant,
    dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[image blocks..., text tokens] prompt embeddings in ONE device program
    (the eager build_prompt_embeddings issues ~4 dispatches per request —
    tower encode, gather, concat, pad — each a full RPC round trip on a
    tunneled device; multimodal admission waves were paying it per image
    request).  Returns ((t, W) embeddings, () valid length); one compile per
    (gallery size N, bucket t)."""
    blocks = encode_images(vlm_params, clip_params, images, v, dtype=dtype)
    img = blocks.reshape(-1, blocks.shape[-1])  # (N*T_img, W)
    n_img = img.shape[0]
    txt = vlm_params["tok_emb"][ids].astype(dtype)  # (T_ids, W)
    tid = ids.shape[0]
    emb = jnp.zeros((t, img.shape[-1]), dtype)
    emb = jax.lax.dynamic_update_slice(emb, img[: min(n_img, t)], (0, 0))
    # text goes at offset n_img (static); mask positions past n_img + n_text
    if n_img < t:
        emb = jax.lax.dynamic_update_slice(
            emb, txt[: min(tid, t - n_img)], (n_img, 0)
        )
    n = jnp.minimum(n_img + n_text, t).astype(jnp.int32)
    pos_ok = jnp.arange(t) < n
    return jnp.where(pos_ok[:, None], emb, 0), n


# ---------------------------------------------------------------------------
# Prefill / decode with KV cache
# ---------------------------------------------------------------------------


class KVCache(NamedTuple):
    k: jnp.ndarray  # (L, B, Tmax, H, Dh)
    v: jnp.ndarray  # (L, B, Tmax, H, Dh)
    length: jnp.ndarray  # (B,) int32 tokens filled


def init_cache(v: VLMVariant, batch: int, dtype=jnp.bfloat16) -> KVCache:
    dh = v.width // v.heads
    shape = (v.layers, batch, v.max_seq, v.n_kv, dh)
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
    if v.arch == "llama":
        return _prefill_llama(params, embeddings, valid_len, cache, v, dtype)
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


def prefill_sp(
    params: Params,
    embeddings: jnp.ndarray,  # (B, T, W) — T padded to the data-axis multiple
    valid_len: jnp.ndarray,  # (B,)
    v: VLMVariant,
    mesh,
    dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, KVCache]:
    """Sequence-parallel prefill (SURVEY.md §5.7): the prompt's token axis
    shards over the mesh's data axis and every layer's attention runs as ring
    attention (parallel.ring_attention) — K/V blocks rotate on the ICI, the
    (T, T) score matrix never exists on any chip.  This is how the 24-image
    gallery prompts (reference graph.py:2896-2897) scale past one chip's
    attention memory at production vision-token counts.

    Elementwise/matmul layers run GSPMD-sharded on the same T partition (no
    cross-token dependency outside attention).  Returns (last-position logits,
    a REPLICATED KVCache) so the continuous batcher's decode loop proceeds
    unchanged.  Covers both served archs: gpt (vlm-base/small) and llama
    (the LLaVA/TinyLlama family loadable via convert_hf_llava) — the llama
    path adds RoPE/GQA/SwiGLU but shards and rings identically.
    """
    if v.arch == "llama":
        return _prefill_sp_llama(params, embeddings, valid_len, v, mesh, dtype)
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.ring_attention import ring_attention

    nd = mesh.shape["data"]
    b, t, w = embeddings.shape
    pad = (-t) % nd
    if pad:
        embeddings = jnp.pad(embeddings, ((0, 0), (0, pad), (0, 0)))
    tp = t + pad
    x = embeddings.astype(dtype) + params["pos"][:tp].astype(dtype)
    x = jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(None, "data", None)))
    blocks = jax.tree.map(lambda a: a.astype(dtype), params["blocks"])
    dh = w // v.heads

    ks, vs = [], []
    n_layers = v.layers
    bl = [jax.tree.map(lambda a: a[i], blocks) for i in range(n_layers)]
    for p in bl:
        xn = tfm.layer_norm(x, p["ln1_g"], p["ln1_b"])
        qkv = (
            jnp.einsum("btw,wc->btc", xn, p["wqkv"], preferred_element_type=jnp.float32)
            + p["bqkv"].astype(jnp.float32)
        ).astype(x.dtype)
        q, k, val = jnp.split(qkv, 3, axis=-1)
        qh = q.reshape(b, tp, v.heads, dh).transpose(0, 2, 1, 3)
        kh = k.reshape(b, tp, v.heads, dh).transpose(0, 2, 1, 3)
        vh = val.reshape(b, tp, v.heads, dh).transpose(0, 2, 1, 3)
        att = ring_attention(qh, kh, vh, mesh, causal=True)
        ks.append(kh.transpose(0, 2, 1, 3))
        vs.append(vh.transpose(0, 2, 1, 3))
        att = att.transpose(0, 2, 1, 3).reshape(b, tp, w)
        att = (
            jnp.einsum("btw,wc->btc", att, p["wo"], preferred_element_type=jnp.float32)
            + p["bo"].astype(jnp.float32)
        ).astype(x.dtype)
        x = x + att
        xn = tfm.layer_norm(x, p["ln2_g"], p["ln2_b"])
        mid = jax.nn.gelu(
            jnp.einsum("btw,wc->btc", xn, p["w1"], preferred_element_type=jnp.float32)
            + p["b1"].astype(jnp.float32)
        ).astype(x.dtype)
        x = x + (
            jnp.einsum("btc,cw->btw", mid, p["w2"], preferred_element_type=jnp.float32)
            + p["b2"].astype(jnp.float32)
        ).astype(x.dtype)

    x = tfm.layer_norm(x, params["ln_f_g"], params["ln_f_b"])
    last = jnp.take_along_axis(
        x, (valid_len - 1)[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]
    logits = jnp.einsum(
        "bw,vw->bv", last, params["tok_emb"].astype(dtype),
        preferred_element_type=jnp.float32,
    )
    # replicate K/V into a standard cache for the decode loop
    rep = NamedSharding(mesh, P())
    cache_k = jnp.zeros((v.layers, b, v.max_seq, v.heads, dh), dtype)
    cache_v = jnp.zeros((v.layers, b, v.max_seq, v.heads, dh), dtype)
    cache_k = cache_k.at[:, :, :tp].set(
        jax.lax.with_sharding_constraint(jnp.stack(ks).astype(dtype), rep)
    )
    cache_v = cache_v.at[:, :, :tp].set(
        jax.lax.with_sharding_constraint(jnp.stack(vs).astype(dtype), rep)
    )
    return logits, KVCache(
        k=cache_k, v=cache_v, length=valid_len.astype(jnp.int32)
    )


def _prefill_sp_llama(params, embeddings, valid_len, v, mesh, dtype):
    """llama-arch sequence-parallel prefill: the gpt recipe (token axis
    sharded over the data mesh axis, per-layer ring attention) with the
    llama specifics — RMS norm, RoPE at GLOBAL token positions (position
    phases are elementwise along the sharded axis, so they shard with it),
    GQA K/V repeated to the query head count for the ring, SwiGLU MLP.  The
    returned cache stores the PRE-repeat roped K/V at n_kv heads, exactly
    what the decode blocks expect (_llama_block_with_cache)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.ring_attention import ring_attention

    nd = mesh.shape["data"]
    b, t, w = embeddings.shape
    pad = (-t) % nd
    if pad:
        embeddings = jnp.pad(embeddings, ((0, 0), (0, pad), (0, 0)))
    tp = t + pad
    dh = w // v.heads
    groups = v.heads // v.n_kv
    x = embeddings.astype(dtype)
    x = jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(None, "data", None)))
    cos, sin = _rope_cos_sin(jnp.arange(tp), dh, v.rope_theta)  # (tp, dh)
    blocks = jax.tree.map(lambda a: a.astype(dtype), params["blocks"])
    bl = [jax.tree.map(lambda a: a[i], blocks) for i in range(v.layers)]

    ks, vs = [], []
    for p in bl:
        xn = _rms_norm(x, p["ln1_g"], v.norm_eps)
        q = jnp.einsum("btw,wc->btc", xn, p["wq"], preferred_element_type=jnp.float32)
        k = jnp.einsum("btw,wc->btc", xn, p["wk"], preferred_element_type=jnp.float32)
        val = jnp.einsum("btw,wc->btc", xn, p["wv"], preferred_element_type=jnp.float32)
        qh = _apply_rope(q.reshape(b, tp, v.heads, dh),
                         cos[None, :, None, :], sin[None, :, None, :]).astype(x.dtype)
        kh = _apply_rope(k.reshape(b, tp, v.n_kv, dh),
                         cos[None, :, None, :], sin[None, :, None, :]).astype(x.dtype)
        vh = val.reshape(b, tp, v.n_kv, dh).astype(x.dtype)
        kg = jnp.repeat(kh, groups, axis=2)
        vg = jnp.repeat(vh, groups, axis=2)
        att = ring_attention(
            qh.transpose(0, 2, 1, 3), kg.transpose(0, 2, 1, 3),
            vg.transpose(0, 2, 1, 3), mesh, causal=True,
        )
        ks.append(kh)
        vs.append(vh)
        att = att.transpose(0, 2, 1, 3).reshape(b, tp, w)
        att = jnp.einsum(
            "btw,wc->btc", att, p["wo"], preferred_element_type=jnp.float32
        ).astype(x.dtype)
        x = x + att
        xn = _rms_norm(x, p["ln2_g"], v.norm_eps)
        gate = jnp.einsum("btw,wc->btc", xn, p["w_gate"], preferred_element_type=jnp.float32)
        up = jnp.einsum("btw,wc->btc", xn, p["w_up"], preferred_element_type=jnp.float32)
        mid = (jax.nn.silu(gate) * up).astype(x.dtype)
        x = x + jnp.einsum(
            "btc,cw->btw", mid, p["w_down"], preferred_element_type=jnp.float32
        ).astype(x.dtype)

    x = _rms_norm(x, params["ln_f_g"], v.norm_eps)
    last = jnp.take_along_axis(
        x, (valid_len - 1)[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]
    logits = jnp.einsum(
        "bw,vw->bv", last, params["lm_head"].astype(dtype),
        preferred_element_type=jnp.float32,
    )
    rep = NamedSharding(mesh, P())
    cache_k = jnp.zeros((v.layers, b, v.max_seq, v.n_kv, dh), dtype)
    cache_v = jnp.zeros((v.layers, b, v.max_seq, v.n_kv, dh), dtype)
    cache_k = cache_k.at[:, :, :tp].set(
        jax.lax.with_sharding_constraint(jnp.stack(ks).astype(dtype), rep)
    )
    cache_v = cache_v.at[:, :, :tp].set(
        jax.lax.with_sharding_constraint(jnp.stack(vs).astype(dtype), rep)
    )
    return logits, KVCache(k=cache_k, v=cache_v, length=valid_len.astype(jnp.int32))


# jitted: the eager per-layer loop otherwise dispatches hundreds of ops per
# long-prompt admit (seconds through an RPC-tunneled device at ~30 ms/op);
# v/mesh/dtype are hashable statics, so one compile per (variant, mesh)
prefill_sp = jax.jit(prefill_sp, static_argnames=("v", "mesh", "dtype"))


def _prefill_llama(params, embeddings, valid_len, cache, v, dtype):
    b, t, w = embeddings.shape
    dh = w // v.heads
    groups = v.heads // v.n_kv
    x = embeddings.astype(dtype)
    causal = jnp.triu(jnp.full((t, t), -jnp.inf, jnp.float32), k=1)
    cos, sin = _rope_cos_sin(jnp.arange(t), dh, v.rope_theta)  # (t, dh)
    blocks = jax.tree.map(lambda a: a.astype(dtype), params["blocks"])

    def body(h, p):
        xn = _rms_norm(h, p["ln1_g"], v.norm_eps)
        q = jnp.einsum("btw,wc->btc", xn, p["wq"], preferred_element_type=jnp.float32)
        k = jnp.einsum("btw,wc->btc", xn, p["wk"], preferred_element_type=jnp.float32)
        val = jnp.einsum("btw,wc->btc", xn, p["wv"], preferred_element_type=jnp.float32)
        qh = q.reshape(b, t, v.heads, dh)
        kh = k.reshape(b, t, v.n_kv, dh)
        vh = val.reshape(b, t, v.n_kv, dh).astype(h.dtype)
        qh = _apply_rope(qh, cos[None, :, None, :], sin[None, :, None, :])
        kh = _apply_rope(kh, cos[None, :, None, :], sin[None, :, None, :])
        kg = jnp.repeat(kh, groups, axis=2)
        vg = jnp.repeat(vh, groups, axis=2)
        s = jnp.einsum(
            "bthd,bshd->bhts", qh, kg, preferred_element_type=jnp.float32
        ) * (dh**-0.5) + causal
        pr = jax.nn.softmax(s, axis=-1).astype(h.dtype)
        att = jnp.einsum(
            "bhts,bshd->bthd", pr, vg, preferred_element_type=jnp.float32
        ).astype(h.dtype).reshape(b, t, w)
        att = jnp.einsum(
            "btw,wc->btc", att, p["wo"], preferred_element_type=jnp.float32
        ).astype(h.dtype)
        h = h + att
        xn = _rms_norm(h, p["ln2_g"], v.norm_eps)
        gate = jnp.einsum("btw,wc->btc", xn, p["w_gate"], preferred_element_type=jnp.float32)
        up = jnp.einsum("btw,wc->btc", xn, p["w_up"], preferred_element_type=jnp.float32)
        mid = (jax.nn.silu(gate) * up).astype(h.dtype)
        h = h + jnp.einsum(
            "btc,cw->btw", mid, p["w_down"], preferred_element_type=jnp.float32
        ).astype(h.dtype)
        return h, (kh, vh)

    x, (ks, vs) = jax.lax.scan(body, x, blocks)
    cache_k = cache.k.at[:, :, :t].set(ks.astype(cache.k.dtype))
    cache_v = cache.v.at[:, :, :t].set(vs.astype(cache.v.dtype))
    x = _rms_norm(x, params["ln_f_g"], v.norm_eps)
    last = jnp.take_along_axis(
        x, (valid_len - 1)[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]
    logits = jnp.einsum(
        "bw,vw->bv", last, params["lm_head"].astype(dtype),
        preferred_element_type=jnp.float32,
    )
    return logits, KVCache(k=cache_k, v=cache_v, length=valid_len.astype(jnp.int32))


def _llama_block_with_cache(x, p, ki, vi, pos, v):
    """One llama decode block over cached K/V. x: (B, 1, W)."""
    b, _, w = x.shape
    dh = w // v.heads
    groups = v.heads // v.n_kv
    xn = _rms_norm(x, p["ln1_g"], v.norm_eps)
    q = jnp.einsum("btw,wc->btc", xn, p["wq"], preferred_element_type=jnp.float32)
    k_new = jnp.einsum("btw,wc->btc", xn, p["wk"], preferred_element_type=jnp.float32)
    v_new = jnp.einsum("btw,wc->btc", xn, p["wv"], preferred_element_type=jnp.float32)
    qh = q.reshape(b, v.heads, dh)
    kh = k_new.reshape(b, v.n_kv, dh)
    vh = v_new.reshape(b, v.n_kv, dh).astype(x.dtype)
    cos, sin = _rope_cos_sin(pos, dh, v.rope_theta)  # (b, dh)
    qh = _apply_rope(qh, cos[:, None, :], sin[:, None, :])
    kh = _apply_rope(kh, cos[:, None, :], sin[:, None, :])
    ki = ki.at[jnp.arange(b), pos].set(kh)
    vi = vi.at[jnp.arange(b), pos].set(vh)
    tmax = ki.shape[1]
    mask = jax.lax.broadcasted_iota(jnp.int32, (b, tmax), 1) <= pos[:, None]
    kg = jnp.repeat(ki, groups, axis=2)  # (b, tmax, heads, dh)
    vg = jnp.repeat(vi, groups, axis=2)
    scores = jnp.einsum(
        "bhd,bthd->bht", qh, kg, preferred_element_type=jnp.float32
    ) * (dh**-0.5)
    scores = jnp.where(mask[:, None, :], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    att = jnp.einsum(
        "bht,bthd->bhd", probs, vg, preferred_element_type=jnp.float32
    ).astype(x.dtype).reshape(b, 1, w)
    att = jnp.einsum(
        "btw,wc->btc", att, p["wo"], preferred_element_type=jnp.float32
    ).astype(x.dtype)
    x = x + att
    xn = _rms_norm(x, p["ln2_g"], v.norm_eps)
    gate = jnp.einsum("btw,wc->btc", xn, p["w_gate"], preferred_element_type=jnp.float32)
    up = jnp.einsum("btw,wc->btc", xn, p["w_up"], preferred_element_type=jnp.float32)
    mid = (jax.nn.silu(gate) * up).astype(x.dtype)
    x = x + jnp.einsum(
        "btc,cw->btw", mid, p["w_down"], preferred_element_type=jnp.float32
    ).astype(x.dtype)
    return x, ki, vi


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
    if v.arch != "llama":
        x = x + params["pos"][jnp.clip(pos, 0, v.max_seq - 1)].astype(dtype)[:, None, :]
    blocks = params["blocks"]
    new_k, new_v = [], []
    for li in range(v.layers):
        lp = jax.tree.map(lambda a: a[li].astype(dtype), blocks)
        if v.arch == "llama":
            x, ki, vi = _llama_block_with_cache(
                x, lp, cache.k[li].astype(dtype), cache.v[li].astype(dtype), pos, v
            )
        else:
            x, ki, vi = _block_with_cache(
                x, lp, cache.k[li].astype(dtype), cache.v[li].astype(dtype), pos, cache.length, v.heads
            )
        new_k.append(ki)
        new_v.append(vi)
    if v.arch == "llama":
        x = _rms_norm(x[:, 0], params["ln_f_g"], v.norm_eps)
        head = params["lm_head"]
    else:
        x = tfm.layer_norm(x[:, 0], params["ln_f_g"], params["ln_f_b"])
        head = params["tok_emb"]
    logits = jnp.einsum(
        "bw,vw->bv", x, head.astype(dtype), preferred_element_type=jnp.float32
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


@partial(jax.jit, static_argnames=("v", "steps", "dtype"))
def decode_chunk(
    params: Params,
    tokens: jnp.ndarray,  # (B,) int32 current tokens
    cache: KVCache,
    active: jnp.ndarray,  # (B,) bool
    v: VLMVariant,
    steps: int = 8,
    dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray, KVCache]:
    """`steps` greedy autoregressive advances for all active slots in ONE
    device program (`lax.scan` over the KV cache).

    Through an RPC-tunneled device every dispatch pays the host round trip
    (~30 ms here), so one-token-per-dispatch decoding runs at wall ~1/RTT
    tok/s regardless of device speed; chunking K steps into one program makes
    continuous-batching admission granularity K tokens (fine for K << the
    32-token budgets of the slow-path calls, reference graph.py:2292-2482)
    while the wall rate approaches the on-device rate.  Slots that emit EOT
    mid-chunk keep advancing on garbage; the host discards their surplus
    tokens and the slot's cache resets at finish, so results are unchanged
    (token-parity test: tests/test_vlm.py).

    Returns (toks (steps, B) int32, last_tokens (B,), cache)."""

    def body(carry, _):
        cur, c = carry
        logits, c = decode_step(params, cur, c, active, v, dtype=dtype)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (nxt, c), nxt

    (last, cache), toks = jax.lax.scan(body, (tokens, cache), None, length=steps)
    return toks, last, cache


@partial(jax.jit, static_argnames=("v", "steps", "dtype"))
def decode_chunk_tracked(
    params: Params,
    tokens: jnp.ndarray,  # (B,) int32 current tokens
    cache: KVCache,
    active: jnp.ndarray,  # (B,) bool
    remaining: jnp.ndarray,  # (B,) int32 tokens left in each slot's budget
    eot_id: jnp.ndarray,  # () int32
    v: VLMVariant,
    steps: int = 8,
    dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, KVCache, jnp.ndarray, jnp.ndarray]:
    """`decode_chunk` with EOT/budget bookkeeping INSIDE the program.

    The plain chunk loop forces one host round-trip per chunk: the host must
    read the tokens to decide which slots emitted EOT before it can dispatch
    the next chunk.  Through the RPC tunnel that sync costs ~30 ms per chunk
    — the dominant term of the wall/device throughput gap (serving bench:
    447 vs 1245 tok/s, VERDICT r3 weak #3).  Tracking `active`/`remaining`
    on-device makes consecutive chunks dispatchable back-to-back with NO host
    sync between them (serving/batcher.py pipeline_depth): a slot that
    finishes mid-chunk freezes itself for the rest of this chunk and every
    speculatively-dispatched successor.

    Returns (toks (steps, B), act_hist (steps, B) — slot was live ENTERING
    the step, i.e. its token is real (the EOT itself counts), last_tokens,
    cache, active', remaining')."""

    def body(carry, _):
        cur, c, act, rem = carry
        logits, c = decode_step(params, cur, c, act, v, dtype=dtype)
        nxt = jnp.where(act, jnp.argmax(logits, axis=-1).astype(jnp.int32), cur)
        rem = jnp.where(act, rem - 1, rem)
        act_next = act & (nxt != eot_id) & (rem > 0)
        return (nxt, c, act_next, rem), (nxt, act)

    (last, cache, active, remaining), (toks, act_hist) = jax.lax.scan(
        body, (tokens, cache, active, remaining), None, length=steps
    )
    return toks, act_hist, last, cache, active, remaining


@partial(jax.jit, static_argnames=("v", "dtype"))
def text_prompt_embeddings(
    params: Params,
    ids: jnp.ndarray,  # (B, T) int32, padded with any id past ns
    ns: jnp.ndarray,  # (B,) int32 valid lengths
    v: VLMVariant,
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Batched text-only prompt embeddings: ONE gather for a whole admission
    wave (the per-request eager gather/concat/pad of build_prompt_embeddings
    costs ~3 device dispatches per request — a full RPC round trip each when
    the device sits behind a tunnel).  Positions >= ns zero out."""
    emb = params["tok_emb"][ids].astype(dtype)  # (B, T, W)
    t = ids.shape[1]
    pos_ok = jax.lax.broadcasted_iota(jnp.int32, (ids.shape[0], t), 1) < ns[:, None]
    return jnp.where(pos_ok[..., None], emb, 0)


@partial(jax.jit, static_argnames=("v", "dtype"))
def admit_wave(
    params: Params,
    emb: jnp.ndarray,  # (B, T, W) prompt embeddings; zeros on non-admitted rows
    ns: jnp.ndarray,  # (B,) int32 valid lengths (>=1 on admitted rows)
    admit: jnp.ndarray,  # (B,) bool rows being (re)admitted this wave
    cache: KVCache,
    current: jnp.ndarray,  # (B,) int32 current tokens of live slots
    v: VLMVariant,
    dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, KVCache]:
    """One-dispatch admission for the continuous batcher: prefill EVERY
    admitted slot's prompt, write its K/V rows, set its cache length, and
    compute its first greedy token — in a single device program.

    The per-slot alternative (prefill, two full-cache scatters, and a
    blocking argmax fetch per request — ~6 dispatches each) made admission,
    not decode, the wall-clock bottleneck of the serving engine once
    decode_chunk amortized the decode loop (measured: 16 text requests =
    21 s wall with per-slot admits, RPC-tunneled device).  Slots not in
    `admit` keep their cache rows, length, and current token bit-exactly.

    Returns (current' (B,), cache')."""
    logits, pref = prefill(
        params, emb, jnp.maximum(ns, 1).astype(jnp.int32), cache, v, dtype=dtype
    )
    sel = admit[None, :, None, None, None]
    nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return (
        jnp.where(admit, nxt, current),
        KVCache(
            k=jnp.where(sel, pref.k, cache.k),
            v=jnp.where(sel, pref.v, cache.v),
            length=jnp.where(admit, ns.astype(jnp.int32), cache.length),
        ),
    )


def convert_hf_llava(state_dict, v: VLMVariant, dtype=jnp.float32) -> Params:
    """Convert a HuggingFace LLaVA-family checkpoint into ``arch="llama"``
    params.

    Accepts the state_dict of a ``LlavaForConditionalGeneration`` (any
    transformers version: ``language_model.model.layers...`` or the newer
    ``model.language_model.layers...`` key layout) or a bare
    ``LlamaForCausalLM`` (``model.layers...``).  HF ``nn.Linear`` weights are
    (out, in) and are transposed to our (in, out) einsum layout; grouped-query
    K/V and the rotate-half RoPE storage convention carry over unchanged, so
    logits match transformers' reference implementation exactly (see
    tests/test_vlm.py::test_convert_hf_llama_matches_transformers).

    The multi-modal projector (``multi_modal_projector.linear_{1,2}``) loads
    into proj/proj2 when present; its input dim must match the vision features
    fed to `encode_images` (LLaVA uses the CLIP tower's pre-projection patch
    width).  Vision-tower weights are not converted here — use
    models.clip.convert_open_clip for the tower.
    """

    def arr(t):
        if hasattr(t, "detach"):
            t = t.detach().cpu().float().numpy()
        return np.asarray(t, np.float32)

    keys = list(state_dict.keys())

    def find(suffix, required=True, exclude=("vision_tower",)):
        hits = [
            k for k in keys
            if k.endswith(suffix) and not any(e in k for e in exclude)
        ]
        if not hits:
            if required:
                raise KeyError(f"no key ending in {suffix!r}")
            return None
        return arr(state_dict[hits[0]])

    dh = v.width // v.heads
    blocks = {k: [] for k in (
        "ln1_g", "wq", "wk", "wv", "wo", "ln2_g", "w_gate", "w_up", "w_down"
    )}
    for i in range(v.layers):
        p = f"layers.{i}."
        blocks["ln1_g"].append(find(p + "input_layernorm.weight"))
        blocks["wq"].append(find(p + "self_attn.q_proj.weight").T)
        blocks["wk"].append(find(p + "self_attn.k_proj.weight").T)
        blocks["wv"].append(find(p + "self_attn.v_proj.weight").T)
        blocks["wo"].append(find(p + "self_attn.o_proj.weight").T)
        blocks["ln2_g"].append(find(p + "post_attention_layernorm.weight"))
        blocks["w_gate"].append(find(p + "mlp.gate_proj.weight").T)
        blocks["w_up"].append(find(p + "mlp.up_proj.weight").T)
        blocks["w_down"].append(find(p + "mlp.down_proj.weight").T)
    blocks = {k: jnp.asarray(np.stack(vv), dtype) for k, vv in blocks.items()}
    assert blocks["wq"].shape == (v.layers, v.width, v.heads * dh)
    assert blocks["wk"].shape == (v.layers, v.width, v.n_kv * dh)

    emb = find("embed_tokens.weight")
    final_norm = None
    for k in keys:
        if k.endswith("norm.weight") and "layers." not in k and "vision" not in k:
            final_norm = arr(state_dict[k])
            break
    if final_norm is None:
        raise KeyError("final norm weight not found")
    lm_head = find("lm_head.weight", required=False)
    if lm_head is None:
        lm_head = emb  # tied embeddings

    params: Params = {
        "tok_emb": jnp.asarray(emb, dtype),
        "pos": jnp.zeros((v.max_seq, v.width), dtype),
        "blocks": blocks,
        "ln_f_g": jnp.asarray(final_norm, dtype),
        "lm_head": jnp.asarray(lm_head, dtype),
    }
    l1 = find("multi_modal_projector.linear_1.weight", required=False, exclude=())
    if l1 is not None:
        params["proj_w"] = jnp.asarray(l1.T, dtype)
        params["proj_b"] = jnp.asarray(
            find("multi_modal_projector.linear_1.bias", exclude=()), dtype
        )
        l2 = find("multi_modal_projector.linear_2.weight", required=False, exclude=())
        if l2 is not None:
            params["proj2_w"] = jnp.asarray(l2.T, dtype)
            params["proj2_b"] = jnp.asarray(
                find("multi_modal_projector.linear_2.bias", exclude=()), dtype
            )
    else:
        # bare LM checkpoint: text-only until a projector is trained/loaded
        params["proj_w"] = jnp.zeros((1, v.width), dtype)
        params["proj_b"] = jnp.zeros((v.width,), dtype)
    return params


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
        blocks = encode_images_jit(vlm_params, clip_params, images, v, dtype=dtype)
        parts.append(blocks.reshape(-1, blocks.shape[-1]))
    txt = vlm_params["tok_emb"][jnp.asarray(token_ids)].astype(dtype)
    parts.append(txt)
    emb = jnp.concatenate(parts, axis=0)[:max_len]
    n = emb.shape[0]
    pad = jnp.zeros((max_len - n, emb.shape[-1]), emb.dtype)
    return jnp.concatenate([emb, pad], axis=0), n
