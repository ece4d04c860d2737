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


def subtract_contained(
    masks: jnp.ndarray,  # (M, H, W) bool
    valid: jnp.ndarray,  # (M,)
    thresh: float = 0.9,
) -> jnp.ndarray:
    """Carve contained masks out of their containers (the reference
    sam_utils.py:10-33 `filter_masks` behavior: when mask i contains mask j,
    mask j is SUBTRACTED from mask i, keeping the fine object and turning the
    coarse parent into its complement).

    This is load-bearing for the instance merge fold: the fold's overlap
    ratio is intersection over the SMALLER set (reference
    graph_utils.py:620-664), so an unsubtracted background mask that contains
    an object mask merges with it at ratio ~1, and a chain of such
    containments collapses the whole scene into one instance.  Containment is
    tested at ratio `thresh` rather than exactly (upsampled mask boundaries
    are not pixel-exact).  One-shot over all pairs: a parent subtracts every
    (transitively) contained child at once."""
    m = masks.shape[0]
    mf = masks.reshape(m, -1).astype(jnp.float32)
    inter = jnp.einsum("mp,np->mn", mf, mf, preferred_element_type=jnp.float32)
    area = jnp.maximum(mf.sum(-1), 1.0)
    child = inter / area[None, :]  # child[i, j] = |i ∩ j| / |j|
    smaller = area[None, :] < area[:, None]
    eye = jnp.eye(m, dtype=bool)
    is_child = (
        (child > thresh) & smaller & ~eye & valid[None, :] & valid[:, None]
    )
    carve = (
        jnp.einsum("mn,np->mp", is_child.astype(jnp.float32), mf,
                   preferred_element_type=jnp.float32) > 0.5
    )
    return (masks.reshape(m, -1) & ~carve).reshape(masks.shape)


def to_disjoint(
    masks: jnp.ndarray,  # (M, H, W) bool
    valid: jnp.ndarray,  # (M,)
) -> jnp.ndarray:
    """Make the mask set pixel-disjoint: every covered pixel goes to its
    SMALLEST covering mask (finest structure wins; the parent keeps its
    complement).  Strictly generalizes `subtract_contained` — partial-overlap
    blobs also lose the pixels a finer mask claims, which is what keeps one
    sloppy background blob from bridging two objects in the instance merge
    fold (overlap ratio is intersection over the smaller set, reference
    graph_utils.py:620-664, so a single bridging mask chains instances
    permanently).  The oracle/GT mask sets are disjoint by construction; this
    restores that property for generated masks."""
    m = masks.shape[0]
    flat = masks.reshape(m, -1)
    area = jnp.where(valid, flat.sum(-1).astype(jnp.float32), jnp.inf)
    big = jnp.float32(jnp.inf)
    key = jnp.where(flat & valid[:, None], area[:, None], big)  # (M, P)
    owner = jnp.argmin(key, axis=0)  # (P,)
    owned = jnp.take_along_axis(key, owner[None], axis=0)[0] < big
    lane = jax.lax.broadcasted_iota(jnp.int32, flat.shape, 0)
    out = flat & owned[None, :] & (lane == owner[None, :])
    return out.reshape(masks.shape)


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
