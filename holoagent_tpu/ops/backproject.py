"""Batched RGB-D backprojection.

TPU-native equivalent of the reference's per-frame ``create_pcd``
(reference fsr_vln/memory/hmsg/dataloader/generic.py:74-138): instead of
boolean-filtering valid depths into a ragged point list, we keep the full
(H*W) lattice with a validity mask, so the op jits once and vmaps over frames.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..utils.camera import Pinhole


@partial(jax.jit, static_argnames=())
def backproject(
    depth: jnp.ndarray,  # (H, W) float32, metres (already divided by scale)
    rgb: jnp.ndarray,  # (H, W, 3) float32 in [0, 1]
    cam: Pinhole,
    pose_c2w: jnp.ndarray,  # (4, 4) camera-to-world
    depth_min: jnp.ndarray | float = 1e-3,
    depth_max: jnp.ndarray | float = 10.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Backproject one posed RGB-D frame to world-frame points.

    Returns (points (H*W, 3), colors (H*W, 3), valid (H*W,) bool).
    Invalid points are written as zeros.
    """
    h, w = depth.shape
    v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    z = depth
    valid = (z > depth_min) & (z < depth_max) & jnp.isfinite(z)
    x = (u - cam.cx) * z / cam.fx
    y = (v - cam.cy) * z / cam.fy
    pts_cam = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
    r = pose_c2w[:3, :3]
    t = pose_c2w[:3, 3]
    # full-precision pose application (default matmul precision may be bf16)
    pts_w = jnp.einsum("nj,ij->ni", pts_cam, r, precision=jax.lax.Precision.HIGHEST) + t
    valid = valid.reshape(-1)
    pts_w = jnp.where(valid[:, None], pts_w, 0.0)
    colors = jnp.where(valid[:, None], rgb.reshape(-1, 3), 0.0)
    return pts_w, colors, valid


# vmapped variant for a batch of frames: (B,H,W) depth, (B,H,W,3) rgb, (B,4,4)
backproject_batch = jax.jit(
    jax.vmap(backproject, in_axes=(0, 0, None, 0, None, None))
)


def mean_depth_gate(depth: jnp.ndarray, valid: jnp.ndarray, filter_distance: float) -> jnp.ndarray:
    """Frame rejection gate: mean valid depth beyond ``filter_distance`` drops
    the frame (semantics of reference generic.py:125-127, which returns an
    empty cloud). Returns a scalar bool 'keep'."""
    s = jnp.sum(jnp.where(valid, depth.reshape(-1), 0.0))
    n = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    return (s / n) <= filter_distance
