"""Batched crop-and-resize: the on-device replacement for the reference's
host-side PIL/cv2 crop pipeline (reference fsr_vln/memory/hmsg/utils/sam_utils.py:36-80
`crop_all_bounding_boxs` + margin expansion, and the per-crop torchvision
preprocess in clip_utils).

Formulated for the MXU, not the gather unit: bilinear resampling is separable,
so each crop is two small matmuls with per-crop interpolation-weight matrices
(out = Wy @ image @ Wx^T) instead of a 4-point gather per output pixel — an
arbitrary-index gather of (M, S, S, C) samples runs ~300 ms/frame on a v5e
chip, the matmul form is bandwidth-bound on the image read.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _interp_weights(
    start: jnp.ndarray,  # (M,) box start in pixels
    end: jnp.ndarray,  # (M,) box end in pixels (exclusive)
    out_size: int,
    in_size: int,
) -> jnp.ndarray:
    """(M, out_size, in_size) bilinear weight rows: W[m, s] has (1-f), f at the
    two source pixels bracketing output sample s of box m."""
    t = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) / out_size
    pos = start[:, None] + t[None, :] * (end - start)[:, None] - 0.5  # (M, S)
    pos = jnp.clip(pos, 0.0, in_size - 1.0)
    i0 = jnp.floor(pos).astype(jnp.int32)
    f = pos - i0
    i1 = jnp.minimum(i0 + 1, in_size - 1)
    cols = jnp.arange(in_size, dtype=jnp.int32)
    w0 = jnp.where(cols[None, None, :] == i0[:, :, None], (1.0 - f)[:, :, None], 0.0)
    w1 = jnp.where(cols[None, None, :] == i1[:, :, None], f[:, :, None], 0.0)
    return w0 + w1  # i0 == i1 at the clip boundary sums to 1 exactly


@partial(jax.jit, static_argnames=("out_size",))
def crop_and_resize(
    image: jnp.ndarray,  # (H, W, C) float
    boxes: jnp.ndarray,  # (M, 4) [y0, x0, y1, x1] in PIXELS (inclusive-exclusive)
    out_size: int,
    masks: Optional[jnp.ndarray] = None,  # (M, H, W) bool: blank background if given
) -> jnp.ndarray:
    """Bilinearly resample each box to (out_size, out_size). Returns
    (M, out_size, out_size, C)."""
    h, w, c = image.shape
    wy = _interp_weights(boxes[:, 0], boxes[:, 2], out_size, h)  # (M, S, H)
    wx = _interp_weights(boxes[:, 1], boxes[:, 3], out_size, w)  # (M, S, W)
    # rows: (M*S, H) @ (H, W*C) — one large MXU matmul
    tmp = jnp.einsum(
        "msh,hwc->mswc", wy, image, preferred_element_type=jnp.float32
    )
    # cols: batched (S, W) @ (W, S) per crop
    out = jnp.einsum(
        "mtw,mswc->mstc", wx, tmp, preferred_element_type=jnp.float32
    ).astype(image.dtype)
    if masks is not None:
        mk = masks.astype(jnp.float32)
        tmpm = jnp.einsum("msh,mhw->msw", wy, mk, preferred_element_type=jnp.float32)
        mv = jnp.einsum("mtw,msw->mst", wx, tmpm, preferred_element_type=jnp.float32)
        out = out * (mv > 0.5)[..., None].astype(image.dtype)
    return out


def expand_boxes(
    boxes: jnp.ndarray, margin: float, h: int, w: int
) -> jnp.ndarray:
    """Grow boxes by `margin` pixels on every side, clipped to the image
    (reference sam_utils.py:58-80 `increase_bbox_by_margin`)."""
    y0 = jnp.clip(boxes[:, 0] - margin, 0, h)
    x0 = jnp.clip(boxes[:, 1] - margin, 0, w)
    y1 = jnp.clip(boxes[:, 2] + margin, 0, h)
    x1 = jnp.clip(boxes[:, 3] + margin, 0, w)
    return jnp.stack([y0, x0, y1, x1], axis=-1)
