"""SE(3)/SO(3) helpers used across mapping and the pose solvers.

Pure jnp; everything is batched and jit-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator, batched: (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues' formula, batched: (..., 3) -> (..., 3, 3) rotation."""
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)[..., None]  # (...,1,1)
    theta = jnp.maximum(theta, 1e-12)
    k = hat(w / theta[..., 0])
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), k.shape)
    s, c = jnp.sin(theta), jnp.cos(theta)
    kk = jnp.einsum('...ij,...jk->...ik', k, k, precision=_HI)
    r = eye + s * k + (1.0 - c) * kk
    # tiny-angle fallback: I + hat(w)
    small = theta < 1e-6
    return jnp.where(small, eye + hat(w), r)


def exp_se3(xi: jnp.ndarray) -> jnp.ndarray:
    """se(3) exp, batched: (..., 6) [rho, w] -> (..., 4, 4)."""
    rho, w = xi[..., :3], xi[..., 3:]
    r = exp_so3(w)
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)[..., None]
    theta = jnp.maximum(theta, 1e-12)
    k = hat(w / theta[..., 0])
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), k.shape)
    s, c = jnp.sin(theta), jnp.cos(theta)
    kk = jnp.einsum('...ij,...jk->...ik', k, k, precision=_HI)
    v = eye + (1.0 - c) / theta * k + (theta - s) / theta * kk
    small = theta < 1e-6
    v = jnp.where(small, eye, v)
    t = jnp.einsum('...ij,...j->...i', v, rho, precision=_HI)
    top = jnp.concatenate([r, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=xi.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def transform_points(pose: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 pose (or batch of poses) to (N, 3) points."""
    r = pose[..., :3, :3]
    t = pose[..., :3, 3]
    return (
        jnp.einsum("...nj,...ij->...ni", points, r, precision=_HI) + t[..., None, :]
    )


def invert_pose(pose: jnp.ndarray) -> jnp.ndarray:
    """Invert 4x4 rigid transform(s)."""
    r = pose[..., :3, :3]
    t = pose[..., :3, 3]
    rt = jnp.swapaxes(r, -1, -2)
    ti = -jnp.einsum('...ij,...j->...i', rt, t, precision=_HI)
    top = jnp.concatenate([rt, ti[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=pose.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)
