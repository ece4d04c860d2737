"""Symmetric InfoNCE contrastive training for the CLIP towers.

DP over the batch ("data" axis), TP over the stacked tower weights ("model"
axis); gradients reduce over ICI via the shardings alone — no explicit
collectives in user code.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models import clip as clip_mod
from ..parallel.sharding import clip_param_sharding, data_sharding, replicated


def clip_loss(
    params,
    images: jnp.ndarray,  # (B, S, S, 3) preprocessed
    tokens: jnp.ndarray,  # (B, ctx) int32
    variant: clip_mod.CLIPVariant,
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    img = clip_mod.encode_image(params, images, variant, dtype=dtype, remat=True)
    txt = clip_mod.encode_text(params, tokens, variant, dtype=dtype)
    scale = jnp.exp(jnp.clip(params["logit_scale"], a_max=jnp.log(100.0)))
    logits = scale * jnp.einsum(
        "bd,cd->bc", img, txt, preferred_element_type=jnp.float32
    )
    labels = jnp.arange(logits.shape[0])
    li = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    lt = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels).mean()
    return 0.5 * (li + lt)


def clip_blend_loss(
    params,
    images_plain: jnp.ndarray,  # (B, S, S, 3) preprocessed
    images_masked: jnp.ndarray,  # (B, S, S, 3) background-zeroed rendering
    tokens: jnp.ndarray,  # (B, ctx) int32
    variant: clip_mod.CLIPVariant,
    masked_weight: float = 0.4418,
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """InfoNCE on the BLENDED crop feature the extractor actually computes:
    l2(w * f_masked + (1 - w) * f_plain) at the reference clip_masked_weight
    (perception/extractor.py:(~125), reference sam_clip_feats_extractor.py:
    159-162).  Training plain/masked renderings separately leaves the blend
    itself out-of-distribution — aligning the deployed feature directly is
    what the retrieval path scores against."""
    fp = clip_mod.encode_image(params, images_plain, variant, dtype=dtype, remat=True)
    fm = clip_mod.encode_image(params, images_masked, variant, dtype=dtype, remat=True)
    f = masked_weight * fm + (1.0 - masked_weight) * fp
    img = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-9)
    txt = clip_mod.encode_text(params, tokens, variant, dtype=dtype)
    scale = jnp.exp(jnp.clip(params["logit_scale"], a_max=jnp.log(100.0)))
    logits = scale * jnp.einsum(
        "bd,cd->bc", img, txt, preferred_element_type=jnp.float32
    )
    labels = jnp.arange(logits.shape[0])
    li = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    lt = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels).mean()
    return 0.5 * (li + lt)


def init_train_state(params, lr: float = 1e-4, weight_decay: float = 0.05):
    tx = optax.adamw(lr, weight_decay=weight_decay)
    return tx, tx.init(params)


def make_train_step(variant: clip_mod.CLIPVariant, tx, mesh=None, dtype=jnp.bfloat16):
    """Build the jitted (params, opt_state, images, tokens) -> (params,
    opt_state, loss) step; when `mesh` is given, params/opt state shard per the
    TP rule and the batch per DP."""

    def step(params, opt_state, images, tokens):
        loss, grads = jax.value_and_grad(clip_loss)(params, images, tokens, variant, dtype)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    # Mesh or not, the jitted step is the same program: shardings propagate
    # from the committed input placements (params via shard_params, opt_state
    # via tx.init over sharded params, batch via data_sharding), and XLA
    # inserts the ICI collectives.  `mesh` is accepted for API clarity only.
    del mesh
    return jax.jit(step, donate_argnums=(0, 1))


def make_blend_train_step(
    variant: clip_mod.CLIPVariant, tx, masked_weight: float = 0.4418,
    dtype=jnp.bfloat16,
):
    """Jitted step over (params, opt_state, images_plain, images_masked,
    tokens) using clip_blend_loss."""

    def step(params, opt_state, images_p, images_m, tokens):
        loss, grads = jax.value_and_grad(clip_blend_loss)(
            params, images_p, images_m, tokens, variant, masked_weight, dtype
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))
