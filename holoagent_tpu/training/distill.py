"""VLM distillation: fine-tune the on-slice VLM against oracle supervision.

Completes the slow-path training loop for environments without public
checkpoints (query/oracle.py): the GT-backed oracle emits (prompt, images,
answer) tuples in the batcher's request schema, and this module trains the
generative VLM (gpt or llama arch, including weights loaded through
models.vlm.convert_hf_llava) to reproduce them — cross-entropy on the answer
token following the [image blocks, prompt] prefix, exactly the position the
serving engine decodes first.  The same step fine-tunes a real checkpoint on
robot-specific frames (reference role: the slow path's GPT-4V is frozen; an
on-slice VLM can keep learning from deployment data).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import vlm as vlm_mod


@partial(jax.jit, static_argnames=("v", "lr"))
def distill_step(
    params,
    embs: jnp.ndarray,  # (B, T, W) prompt embeddings (images + text)
    valid_len: jnp.ndarray,  # (B,)
    targets: jnp.ndarray,  # (B,) int32 answer token ids
    v: vlm_mod.VLMVariant,
    lr: float = 1e-2,
):
    """One SGD step on the answer-token cross-entropy. Returns (params, loss).

    Text/output parameters train; the vision projector trains too (it is the
    randomly-initialized piece when the LM comes from a checkpoint)."""

    def loss_fn(p):
        cache = vlm_mod.init_cache(v, embs.shape[0], jnp.float32)
        logits, _ = vlm_mod.prefill.__wrapped__(
            p, embs, valid_len, cache, v, dtype=jnp.float32
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
        return jnp.mean(nll)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    params = jax.tree.map(lambda p, g: p - lr * g.astype(p.dtype), params, grads)
    return params, loss


def distill_vlm(
    vlm_params,
    clip_params,
    v: vlm_mod.VLMVariant,
    pairs: Sequence[Tuple[str, List[int], str]],  # oracle.distill_pairs output
    image_provider: Callable[[int], np.ndarray],
    tokenize: Callable[[str], List[int]],
    answer_id: Callable[[str], int],
    steps: int = 50,
    lr: float = 1e-2,
    max_len: int = 64,
):
    """Fine-tune on oracle pairs. Returns (params, losses).

    tokenize maps prompts to token ids (< v.vocab); answer_id maps the target
    answer string to the single token the engine greedy-decodes first."""
    embs, lens, tgts = [], [], []
    for prompt, img_ids, answer in pairs:
        imgs = jnp.asarray(
            np.stack([np.asarray(image_provider(i), np.float32) for i in img_ids])
        )
        from ..models import clip as clip_mod

        cv = clip_mod.VARIANTS[v.clip_variant]
        pre = clip_mod.preprocess(imgs, size=cv.image_size)
        e, n = vlm_mod.build_prompt_embeddings(
            vlm_params, clip_params, np.asarray(tokenize(prompt), np.int32),
            pre, v, max_len=max_len, dtype=jnp.float32,
        )
        embs.append(e)
        lens.append(n)
        tgts.append(answer_id(answer))
    embs = jnp.stack(embs)
    lens = jnp.asarray(lens, jnp.int32)
    tgts = jnp.asarray(tgts, jnp.int32)
    losses = []
    params = vlm_params
    for _ in range(steps):
        # NOTE: embeddings were built with the INITIAL tok_emb; the answer
        # head + blocks + projector adapt around them (prefix-frozen
        # embedding distillation — rebuild embs per epoch for full FT)
        params, loss = distill_step(params, embs, lens, tgts, v, lr=lr)
        losses.append(float(loss))
    return params, losses
