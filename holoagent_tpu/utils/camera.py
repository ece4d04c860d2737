"""Pinhole camera model as a JAX pytree.

The reference keeps intrinsics as bare 3x3 numpy matrices per dataset
(reference fsr_vln/memory/hmsg/dataloader/generic.py:104-124); here the camera
is a typed pytree so it can ride through jit/vmap/shard_map unchanged.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class Pinhole(NamedTuple):
    """Intrinsics for a pinhole camera. All fields are scalars (f32)."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray

    @staticmethod
    def from_matrix(k: np.ndarray) -> "Pinhole":
        k = np.asarray(k, dtype=np.float32)
        return Pinhole(
            fx=jnp.float32(k[0, 0]),
            fy=jnp.float32(k[1, 1]),
            cx=jnp.float32(k[0, 2]),
            cy=jnp.float32(k[1, 2]),
        )

    @staticmethod
    def make(fx: float, fy: float, cx: float, cy: float) -> "Pinhole":
        return Pinhole(
            fx=jnp.float32(fx), fy=jnp.float32(fy), cx=jnp.float32(cx), cy=jnp.float32(cy)
        )

    def matrix(self) -> jnp.ndarray:
        z = jnp.float32(0.0)
        o = jnp.float32(1.0)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx]),
                jnp.stack([z, self.fy, self.cy]),
                jnp.stack([z, z, o]),
            ]
        )

    def scaled(self, sx: float, sy: float) -> "Pinhole":
        """Intrinsics after resizing the image by (sx, sy)."""
        return Pinhole(self.fx * sx, self.fy * sy, self.cx * sx, self.cy * sy)


def project(points_cam: jnp.ndarray, cam: Pinhole) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Project camera-frame points (N,3) to pixel coords (N,2) and depth (N,).

    Used by best-view selection / object-in-view tests (the TPU analog of
    reference fsr_vln/memory/hmsg/utils/graph_utils.py:95-157).
    """
    z = points_cam[:, 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = points_cam[:, 0] / safe_z * cam.fx + cam.cx
    v = points_cam[:, 1] / safe_z * cam.fy + cam.cy
    return jnp.stack([u, v], axis=-1), z
