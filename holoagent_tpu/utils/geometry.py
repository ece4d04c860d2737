"""SE(3)/SO(3) helpers used across mapping and the pose solvers.

Pure jnp; everything is batched, jit-safe, and — critically — smooth at the
identity, because the Gauss-Newton solvers (ops.solvers) differentiate
exp/log at xi = 0 with forward-mode autodiff.  All small-angle branches use
the double-where pattern so no NaN/Inf leaks through the untaken branch.
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


def _abc(theta2: jnp.ndarray):
    """Series-safe coefficients A=sin t/t, B=(1-cos t)/t^2, C=(t-sin t)/t^3."""
    small = theta2 < 1e-8
    t2s = jnp.where(small, 1.0, theta2)  # keep the untaken branch finite
    t = jnp.sqrt(t2s)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(t) / t)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(t)) / t2s)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (t - jnp.sin(t)) / (t2s * t))
    return a, b, c


def exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """SO(3) exp, batched: (..., 3) -> (..., 3, 3)."""
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    a, b, _ = _abc(theta2)
    k = hat(w)
    kk = jnp.einsum("...ij,...jk->...ik", k, k, precision=_HI)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), k.shape)
    return eye + a * k + b * kk


def exp_se3(xi: jnp.ndarray) -> jnp.ndarray:
    """se(3) exp, batched: (..., 6) [rho, w] -> (..., 4, 4)."""
    rho, w = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    a, b, c = _abc(theta2)
    k = hat(w)
    kk = jnp.einsum("...ij,...jk->...ik", k, k, precision=_HI)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), k.shape)
    r = eye + a * k + b * kk
    v = eye + b * k + c * kk
    t = jnp.einsum("...ij,...j->...i", v, rho, precision=_HI)
    top = jnp.concatenate([r, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=xi.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def log_so3(r: jnp.ndarray) -> jnp.ndarray:
    """SO(3) log, batched: (..., 3, 3) -> (..., 3); atan2 formulation, smooth
    at the identity (valid for rotations away from pi)."""
    w = jnp.stack(
        [
            r[..., 2, 1] - r[..., 1, 2],
            r[..., 0, 2] - r[..., 2, 0],
            r[..., 1, 0] - r[..., 0, 1],
        ],
        axis=-1,
    )
    w2 = jnp.sum(w * w, axis=-1)  # (2 sin theta)^2
    c = (r[..., 0, 0] + r[..., 1, 1] + r[..., 2, 2] - 1.0) / 2.0
    small = w2 < 1e-12
    # sqrt and arctan2 only see safe values; the small branch is a constant
    # series so no NaN reaches either branch's tangents
    s2_safe = 0.5 * jnp.sqrt(jnp.where(small, 1.0, w2))
    theta_big = jnp.arctan2(s2_safe, c)
    scale = jnp.where(small, 0.5 + w2 / 48.0, theta_big / (2.0 * s2_safe))
    return w * scale[..., None]


def log_se3(t: jnp.ndarray) -> jnp.ndarray:
    """SE(3) log, batched: (..., 4, 4) -> (..., 6) [rho, w]."""
    w = log_so3(t[..., :3, :3])
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    _, b, c = _abc(theta2)
    k = hat(w)
    kk = jnp.einsum("...ij,...jk->...ik", k, k, precision=_HI)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=t.dtype), k.shape)
    v = eye + b * k + c * kk
    rho = jnp.linalg.solve(v, t[..., :3, 3][..., None])[..., 0]
    return jnp.concatenate([rho, w], axis=-1)


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
    ti = -jnp.einsum("...ij,...j->...i", rt, t, precision=_HI)
    top = jnp.concatenate([rt, ti[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=pose.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)
