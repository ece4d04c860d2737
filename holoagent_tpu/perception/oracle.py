"""Oracle perception: GT-mask FrameFeatures for the accuracy protocol.

The reference establishes mapping accuracy by running its evaluator over
graphs built with checkpoint-backed SAM+CLIP (reference
fsr_vln/memory/hmsg/eval/hm3dsem_evaluator.py:193-589).  No checkpoints are
reachable in this image, so the protocol isolates what IS measurable without
weights: the geometric/fusion/merge/graph-construction pipeline.  GT instance
masks stand in for SAM and one-hot label embeddings for CLIP; everything
downstream (voxel fusion, instance merging, floor/room segmentation, object
association, evaluation) is the real production code path.  With real
checkpoints (models.clip.checkpoint / models.sam.checkpoint) the same
protocol measures full open-vocabulary accuracy.
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from .extractor import FrameFeatures


def onehot_label_feats(labels: Sequence[str], dim: int) -> np.ndarray:
    """(C, dim) unit one-hot 'text features' for an oracle vocabulary."""
    tf = np.zeros((len(labels), dim), np.float32)
    for i in range(len(labels)):
        tf[i, i % dim] = 1.0
    return tf


def oracle_frame_features(
    instance_img: np.ndarray,  # (H, W) int32 instance ids, -1 background
    label_img: np.ndarray,  # (H, W) int32 label ids into `labels`
    labels: Sequence[str],
    dim: int,
    max_masks: int = 16,
    min_area: int = 20,
) -> FrameFeatures:
    """FrameFeatures from ground truth: one mask per visible instance, feature
    = the instance's one-hot label embedding."""
    h, w = instance_img.shape
    tf = onehot_label_feats(labels, dim)
    masks = np.zeros((max_masks, h, w), bool)
    valid = np.zeros((max_masks,), bool)
    boxes = np.zeros((max_masks, 4), np.float32)
    f_masks = np.zeros((max_masks, dim), np.float32)
    ids = [i for i in np.unique(instance_img) if i >= 0]
    slot = 0
    for iid in ids:
        if slot >= max_masks:
            break
        m = instance_img == iid
        if m.sum() < min_area:
            continue
        ys, xs = np.nonzero(m)
        lab = int(np.bincount(label_img[m].ravel()).argmax())
        masks[slot] = m
        valid[slot] = True
        boxes[slot] = (xs.min(), ys.min(), xs.max() + 1, ys.max() + 1)
        f_masks[slot] = tf[lab % len(labels)]
        slot += 1
    # global feature: mean of visible instance features (unit-normalized)
    f_g = f_masks[valid].mean(axis=0) if valid.any() else np.zeros(dim, np.float32)
    n = np.linalg.norm(f_g)
    f_g = f_g / n if n > 1e-9 else f_g
    return FrameFeatures(
        masks=jnp.asarray(masks),
        valid=jnp.asarray(valid),
        boxes=jnp.asarray(boxes),
        f_masks=jnp.asarray(f_masks),
        f_global=jnp.asarray(f_g, jnp.float32),
    )
