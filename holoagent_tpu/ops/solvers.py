"""Batched nonlinear least-squares localization solvers.

TPU-native stand-ins for the reference's host-side estimation stack
(SURVEY.md §7.6): PnP replaces the per-frame pose recovery the robot runtime
gets from its ESIKF (reference nav_agent/.../voxel_map.h:234-246), pose-graph
Gauss-Newton replaces the gtsam/ISAM2 keyframe graph
(reference LIVMapper.cpp:837-895), and point-to-point ICP replaces the
FRICP registration used by online relocalization
(reference include/FRICP-toolkit/, pose_estimator.cpp:28-120).

Everything is fixed-iteration Levenberg-damped Gauss-Newton in pure jnp:
residual Jacobians come from forward-mode autodiff at the identity
right-perturbation, normal equations are dense (6x6 per camera, 6Mx6M for the
graph) and solved on the MXU, and batches vmap.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..utils.camera import Pinhole, project
from ..utils.geometry import exp_se3, invert_pose, log_se3, transform_points

# Normal equations are numerics-sensitive and the environment's default matmul
# precision is LOW even on CPU — pin every J^T J / J^T r product (repo
# convention, cf. utils/geometry.py).
_HI = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# PnP
# ---------------------------------------------------------------------------


def _reproj_residual(xi, pose_wc, points_w, pixels, cam):
    """Residual of pose_wc . exp(xi) applied to world points, vs pixels."""
    t = jnp.matmul(pose_wc, exp_se3(xi), precision=_HI)
    pc = transform_points(t, points_w)
    uv, z = project(pc, cam)
    return (uv - pixels), z


@partial(jax.jit, static_argnames=("iters",))
def pnp_gauss_newton(
    points_w: jnp.ndarray,  # (N, 3) world landmarks
    pixels: jnp.ndarray,  # (N, 2) observations
    valid: jnp.ndarray,  # (N,)
    cam: Pinhole,
    pose_wc_init: jnp.ndarray,  # (4, 4) world-to-camera initial guess
    iters: int = 10,
    damping: float = 1e-4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Refine a world-to-camera pose by reprojection Gauss-Newton.
    Returns (pose_wc (4,4), rms reprojection error in pixels)."""

    def step(pose, _):
        def res_of(xi):
            r, z = _reproj_residual(xi, pose, points_w, pixels, cam)
            w = (valid & (z > 1e-3)).astype(r.dtype)[:, None]
            return (r * w).reshape(-1)

        xi0 = jnp.zeros((6,), points_w.dtype)
        r = res_of(xi0)
        j = jax.jacfwd(res_of)(xi0)  # (2N, 6)
        h = jnp.matmul(j.T, j, precision=_HI) + damping * jnp.eye(6, dtype=r.dtype)
        g = jnp.matmul(j.T, r, precision=_HI)
        dx = -jnp.linalg.solve(h, g)
        return jnp.matmul(pose, exp_se3(dx), precision=_HI), None

    pose, _ = jax.lax.scan(step, pose_wc_init, None, length=iters)
    r, z = _reproj_residual(jnp.zeros(6, points_w.dtype), pose, points_w, pixels, cam)
    w = (valid & (z > 1e-3)).astype(r.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    rms = jnp.sqrt(jnp.sum((r**2).sum(-1) * w) / n)
    return pose, rms


pnp_batch = jax.jit(
    jax.vmap(pnp_gauss_newton, in_axes=(0, 0, 0, None, 0)), static_argnames=()
)


# ---------------------------------------------------------------------------
# Pose-graph Gauss-Newton
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("iters",))
def pose_graph_gauss_newton(
    poses_init: jnp.ndarray,  # (M, 4, 4) initial absolute poses
    edges: jnp.ndarray,  # (E, 2) int32 (i, j)
    rel: jnp.ndarray,  # (E, 4, 4) measured T_i^-1 T_j
    edge_valid: jnp.ndarray,  # (E,)
    iters: int = 20,
    damping: float = 1e-3,
    anchor_weight: float = 1e4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Optimize absolute poses over relative-pose constraints
    r_e = log(Z_e^-1 X_i^-1 X_j); pose 0 anchored by a strong prior.
    Returns (poses (M,4,4), final residual norm)."""
    m = poses_init.shape[0]

    def residuals(xis, poses):
        x = jnp.einsum("mij,mjk->mik", poses, exp_se3(xis), precision=_HI)
        xi_p = x[edges[:, 0]]
        xj = x[edges[:, 1]]
        pred = jnp.matmul(invert_pose(xi_p), xj, precision=_HI)
        r = log_se3(jnp.matmul(invert_pose(rel), pred, precision=_HI))  # (E, 6)
        r = r * edge_valid[:, None]
        anchor = log_se3(jnp.matmul(invert_pose(poses_init[0:1]), x[0:1], precision=_HI)) * anchor_weight
        return jnp.concatenate([r.reshape(-1), anchor.reshape(-1)])

    def step(poses, _):
        xi0 = jnp.zeros((m, 6), poses.dtype)
        r = residuals(xi0, poses)
        j = jax.jacfwd(lambda xis: residuals(xis, poses))(xi0)
        j = j.reshape(r.shape[0], m * 6)
        h = jnp.matmul(j.T, j, precision=_HI) + damping * jnp.eye(m * 6, dtype=r.dtype)
        g = jnp.matmul(j.T, r, precision=_HI)
        dx = -jnp.linalg.solve(h, g).reshape(m, 6)
        return jnp.einsum("mij,mjk->mik", poses, exp_se3(dx), precision=_HI), None

    poses, _ = jax.lax.scan(step, poses_init, None, length=iters)
    final = residuals(jnp.zeros((m, 6), poses.dtype), poses)
    return poses, jnp.linalg.norm(final)


# ---------------------------------------------------------------------------
# ICP against the voxel scene (relocalization)
# ---------------------------------------------------------------------------


class ICPResult(NamedTuple):
    pose: jnp.ndarray  # (4, 4) refined src->dst
    rms: jnp.ndarray
    inlier_frac: jnp.ndarray


@partial(jax.jit, static_argnames=("iters",))
def icp_point2point(
    src_points: jnp.ndarray,  # (N, 3) e.g. current scan
    src_valid: jnp.ndarray,  # (N,)
    dst_sorted_keys: jnp.ndarray,  # (C,) scene voxel keys (sorted)
    dst_points: jnp.ndarray,  # (C, 3) scene points
    grid,
    pose_init: jnp.ndarray,  # (4, 4) src->dst initial
    iters: int = 15,
    max_corr_dist: float = 0.5,
    damping: float = 1e-4,
) -> ICPResult:
    """Point-to-point ICP with voxel-snap correspondences (the FRICP regMode 0
    equivalent; correspondence search = ops.voxel.snap_to_voxels instead of a
    KD-tree)."""
    from . import voxel

    def step(pose, _):
        p = transform_points(pose, src_points)
        idx, dist = voxel.snap_to_voxels(p, src_valid, dst_sorted_keys, dst_points, grid)
        w = (idx >= 0) & (dist < max_corr_dist) & src_valid
        q = dst_points[jnp.clip(idx, 0)]

        def res_of(xi):
            t = jnp.matmul(pose, exp_se3(xi), precision=_HI)
            r = transform_points(t, src_points) - q
            return (r * w[:, None]).reshape(-1)

        xi0 = jnp.zeros((6,), src_points.dtype)
        r = res_of(xi0)
        j = jax.jacfwd(res_of)(xi0)
        h = jnp.matmul(j.T, j, precision=_HI) + damping * jnp.eye(6, dtype=r.dtype)
        dx = -jnp.linalg.solve(h, jnp.matmul(j.T, r, precision=_HI))
        return jnp.matmul(pose, exp_se3(dx), precision=_HI), None

    pose, _ = jax.lax.scan(step, pose_init, None, length=iters)
    p = transform_points(pose, src_points)
    idx, dist = voxel.snap_to_voxels(p, src_valid, dst_sorted_keys, dst_points, grid)
    w = (idx >= 0) & (dist < max_corr_dist) & src_valid
    nw = jnp.sum(w.astype(jnp.float32))
    rms = jnp.sqrt(jnp.sum(jnp.where(w, dist**2, 0.0)) / jnp.maximum(nw, 1.0))
    frac = nw / jnp.maximum(jnp.sum(src_valid.astype(jnp.float32)), 1.0)
    return ICPResult(pose=pose, rms=rms, inlier_frac=frac)


def icp_multiscale(
    src_points: jnp.ndarray,
    src_valid: jnp.ndarray,
    map_points: jnp.ndarray,  # (C, 3) map points (e.g. SceneState.points())
    map_valid: jnp.ndarray,  # (C,)
    pose_init: jnp.ndarray,
    scales: Tuple[float, ...] = (0.4, 0.15, 0.05),
    iters_per_scale: int = 10,
) -> ICPResult:
    """Coarse-to-fine ICP: correspondences found by voxel snap only reach one
    cell (~1.7x the voxel size), so large initial errors need coarse grids
    first — the role FRICP's robust kernels play in the reference
    relocalizer (reference pose_estimator.cpp regMode selection)."""
    from . import voxel

    pose = pose_init
    result = None
    n = map_points.shape[0]
    for s in scales:
        grid = voxel.GridSpec.centered(s)
        down = voxel.voxel_downsample(
            map_points, jnp.zeros((n, 1), map_points.dtype), map_valid, grid, capacity=n
        )
        result = icp_point2point(
            src_points,
            src_valid,
            down["key"],
            down["points"],
            grid,
            pose,
            iters=iters_per_scale,
            max_corr_dist=3.0 * s,
        )
        pose = result.pose
    return result
