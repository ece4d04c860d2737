"""Batched crop-and-resize: the on-device replacement for the reference's
host-side PIL/cv2 crop pipeline (reference fsr_vln/memory/hmsg/utils/sam_utils.py:36-80
`crop_all_bounding_boxs` + margin expansion, and the per-crop torchvision
preprocess in clip_utils).  One gather-based bilinear kernel resamples every
mask's (margin-expanded) bounding box to the CLIP input resolution, optionally
blanking background pixels — all masks of a frame in one shot, no host copies.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


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
    m = boxes.shape[0]
    y0, x0, y1, x1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    # sample centers: u in [0, 1) across the box
    t = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) / out_size
    ys = y0[:, None] + t[None, :] * (y1 - y0)[:, None] - 0.5  # (M, S)
    xs = x0[:, None] + t[None, :] * (x1 - x0)[:, None] - 0.5
    ys = jnp.clip(ys, 0.0, h - 1.0)
    xs = jnp.clip(xs, 0.0, w - 1.0)
    yi = jnp.floor(ys).astype(jnp.int32)
    xi = jnp.floor(xs).astype(jnp.int32)
    yf = (ys - yi)[:, :, None, None]  # (M, S, 1, 1)
    xf = (xs - xi)[:, None, :, None]  # (M, 1, S, 1)
    yi1 = jnp.minimum(yi + 1, h - 1)
    xi1 = jnp.minimum(xi + 1, w - 1)

    def gather(yy, xx):
        # (M,S) x (M,S) -> (M,S,S,C)
        return image[yy[:, :, None], xx[:, None, :]]

    v00 = gather(yi, xi)
    v01 = gather(yi, xi1)
    v10 = gather(yi1, xi)
    v11 = gather(yi1, xi1)
    out = (
        v00 * (1 - yf) * (1 - xf)
        + v01 * (1 - yf) * xf
        + v10 * yf * (1 - xf)
        + v11 * yf * xf
    )
    if masks is not None:
        mk = masks.astype(image.dtype)

        def gmask(yy, xx):
            return mk[jnp.arange(m)[:, None, None], yy[:, :, None], xx[:, None, :]]

        mv = (
            gmask(yi, xi) * (1 - yf[..., 0]) * (1 - xf[..., 0])
            + gmask(yi, xi1) * (1 - yf[..., 0]) * xf[..., 0]
            + gmask(yi1, xi) * yf[..., 0] * (1 - xf[..., 0])
            + gmask(yi1, xi1) * yf[..., 0] * xf[..., 0]
        )
        out = out * (mv > 0.5)[..., None]
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
