"""Fixed-capacity mask-set ops: stability scores, boxes, NMS, containment.

These implement the data-dependent parts of SAM automatic mask generation
(candidate filtering + greedy NMS, the behavior of the reference's
SamAutomaticMaskGenerator at reference fsr_vln/memory/hmsg/graph/graph.py:191-199
and the containment filter of reference utils/sam_utils.py:10-33) as masked
array programs over a fixed candidate budget — no dynamic shapes.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def mask_areas(masks: jnp.ndarray) -> jnp.ndarray:
    """(M, H, W) bool -> (M,) float areas."""
    return jnp.sum(masks.astype(jnp.float32), axis=(1, 2))


def stability_scores(logits: jnp.ndarray, offset: float = 1.0) -> jnp.ndarray:
    """SAM stability: IoU between the mask thresholded at +offset and -offset."""
    hi = jnp.sum((logits > offset).astype(jnp.float32), axis=(1, 2))
    lo = jnp.sum((logits > -offset).astype(jnp.float32), axis=(1, 2))
    return hi / jnp.maximum(lo, 1.0)


def boxes_from_masks(masks: jnp.ndarray) -> jnp.ndarray:
    """(M, H, W) bool -> (M, 4) [y0, x0, y1, x1] pixel boxes (y1/x1 exclusive).
    Empty masks produce zero-area boxes at the origin."""
    m, h, w = masks.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    big = jnp.int32(1 << 30)
    y0 = jnp.min(jnp.where(masks, ys[None], big), axis=(1, 2))
    x0 = jnp.min(jnp.where(masks, xs[None], big), axis=(1, 2))
    y1 = jnp.max(jnp.where(masks, ys[None], -1), axis=(1, 2)) + 1
    x1 = jnp.max(jnp.where(masks, xs[None], -1), axis=(1, 2)) + 1
    empty = y1 <= 0
    z = jnp.zeros_like(y0)
    return jnp.stack(
        [
            jnp.where(empty, z, y0),
            jnp.where(empty, z, x0),
            jnp.where(empty, z, y1),
            jnp.where(empty, z, x1),
        ],
        axis=-1,
    ).astype(jnp.float32)


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(M,4) x (N,4) -> (M,N) IoU."""
    y0 = jnp.maximum(a[:, None, 0], b[None, :, 0])
    x0 = jnp.maximum(a[:, None, 1], b[None, :, 1])
    y1 = jnp.minimum(a[:, None, 2], b[None, :, 2])
    x1 = jnp.minimum(a[:, None, 3], b[None, :, 3])
    inter = jnp.maximum(y1 - y0, 0) * jnp.maximum(x1 - x0, 0)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


@partial(jax.jit, static_argnames=())
def nms(
    boxes: jnp.ndarray,  # (M, 4)
    scores: jnp.ndarray,  # (M,)
    valid: jnp.ndarray,  # (M,)
    iou_thresh: float = 0.7,
) -> jnp.ndarray:
    """Greedy box NMS over a fixed candidate set; returns keep mask (M,).

    O(M^2) matrix formulation: process candidates in score order; a candidate
    is kept iff no higher-scoring KEPT candidate overlaps it above threshold.
    """
    m = boxes.shape[0]
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    b = boxes[order]
    v = valid[order]
    iou = box_iou(b, b)

    def body(i, keep):
        sup = (iou[i] > iou_thresh) & keep & (jnp.arange(m) < i)
        ki = v[i] & ~jnp.any(sup)
        return keep.at[i].set(ki)

    keep_sorted = jax.lax.fori_loop(0, m, body, jnp.zeros((m,), bool))
    keep = jnp.zeros((m,), bool).at[order].set(keep_sorted)
    return keep


def containment_filter(
    masks: jnp.ndarray,  # (M, H, W) bool
    valid: jnp.ndarray,  # (M,)
    thresh: float = 0.9,
) -> jnp.ndarray:
    """Drop masks ~fully contained in another mask
    (reference sam_utils.py:10-33 `filter_masks` semantics: containment ratio
    of the intersection over own area above `thresh` removes the smaller).
    Returns keep mask (M,)."""
    mf = masks.astype(jnp.float32).reshape(masks.shape[0], -1)
    inter = jnp.einsum("mp,np->mn", mf, mf, preferred_element_type=jnp.float32)
    area = jnp.maximum(mf.sum(-1), 1.0)
    contain = inter / area[:, None]  # contain[i, j] = |i ∩ j| / |i|
    bigger = area[None, :] > area[:, None]
    eaten = (contain > thresh) & bigger & valid[None, :]
    eye = jnp.eye(masks.shape[0], dtype=bool)
    return valid & ~jnp.any(eaten & ~eye, axis=1)
