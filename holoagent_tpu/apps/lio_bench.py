"""Native LIO/VIO throughput benchmark.

The reference's LIO main loop spins at a 5 kHz cap and processes at sensor
rate (reference nav_agent/humble_localization_nav2/lio_mapping_loc/src/
LIVMapper.cpp:1889-1909) but never states a sustained throughput; this app
measures what the condensed native pipeline sustains on the host core:

  * LIO: full process_sweep cycles (preprocess -> IMU propagate/undistort ->
    point-to-plane ESIKF update on the voxel plane map -> map insert ->
    keyframe/ScanContext bookkeeping) over pre-generated Livox-rate synthetic
    sweeps (~20k points/sweep = MID-360's 200k pts/s at 10 Hz).
  * VIO: photometric frame updates (patch retrieval -> joint GN over pose +
    affine exposure) on a textured-plane sequence at 160x120.

Scan generation is excluded from timing.  One JSON line to stdout; also
written to results/lio_bench.json when --out is given.

Usage: python -m holoagent_tpu.apps.lio_bench [--sweeps 12] [--out path]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def make_sweep(rng, pos, yaw, n_rays=2500, noise=0.005):
    """Synthetic LiDAR sweep in a 16x12 m room (sensor-frame points) —
    structured walls with height texture so registration is well-posed."""
    ang = np.linspace(0, 2 * np.pi, n_rays, endpoint=False)
    d = np.stack([np.cos(ang), np.sin(ang)], -1)
    t_best = np.full(n_rays, np.inf)
    for axis, lo, hi in ((0, -8.0, 8.0), (1, -6.0, 6.0)):
        da = d[:, axis]
        for bound in (lo, hi):
            with np.errstate(divide="ignore", invalid="ignore"):
                t = (bound - pos[axis]) / da
                q = pos[None, :2] + t[:, None] * d
            ok = (
                (t > 0.1)
                & (q[:, 0] >= -8.01) & (q[:, 0] <= 8.01)
                & (q[:, 1] >= -6.01) & (q[:, 1] <= 6.01)
            )
            t_best = np.where(ok & (t < t_best), t, t_best)
    keep = np.isfinite(t_best)
    ang, r = ang[keep], t_best[keep]
    zmax = np.maximum(1.0 + 0.8 * np.sin(3 * ang + r), 0.3)
    levels = np.arange(0.0, 2.0, 0.25)
    pts = []
    for z in levels:
        m = z < zmax
        pts.append(np.stack(
            [r[m] * np.cos(ang[m] - yaw), r[m] * np.sin(ang[m] - yaw),
             np.full(m.sum(), z)], -1,
        ))
    p = np.concatenate(pts)
    return (p + rng.normal(0, noise, p.shape)).astype(np.float64)


def _render_plane(pose, w=160, h=120, fx=120.0, fy=120.0):
    cx, cy = w / 2 - 0.5, h / 2 - 0.5
    ys, xs = np.mgrid[0:h, 0:w]
    rays_c = np.stack([(xs - cx) / fx, (ys - cy) / fy, np.ones_like(xs, float)], -1)
    R, t = pose[:3, :3], pose[:3, 3]
    rays_w = rays_c @ R.T
    s = -t[2] / rays_w[..., 2]
    pts = t + s[..., None] * rays_w
    u, v = pts[..., 0], pts[..., 1]
    tex = (
        0.5
        + 0.15 * np.sin(3.1 * u) * np.cos(2.7 * v)
        + 0.12 * np.sin(7.3 * u + 1.0)
        + 0.1 * np.cos(5.9 * v + 2.0)
        + 0.08 * np.sin(11.0 * (u + v))
    )
    return tex.astype(np.float32), s.astype(np.float32)


def _down_cam(x, y, z, yaw=0.0):
    c, s = np.cos(yaw), np.sin(yaw)
    pose = np.eye(4)
    pose[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, -1.0]]) @ np.diag(
        [1.0, -1.0, 1.0]
    )
    pose[:3, 3] = (x, y, z)
    return pose


def run(sweeps: int = 12, out_path: str | None = None) -> dict:
    from ..native import LioPipeline, Vio

    rng = np.random.default_rng(0)

    # ---------------- LIO
    lio = LioPipeline(map_voxel=0.4, keyframe_dist=0.5, blind_radius=0.2)
    gyro = rng.normal(0, 1e-4, (100, 3))
    accel = np.tile([0.0, 0.0, 9.81], (100, 1)) + rng.normal(0, 1e-3, (100, 3))
    lio.init_static(gyro, accel)
    scans = [
        make_sweep(rng, np.array([0.1 * k, 0.0, 0.0]), 0.0) for k in range(sweeps)
    ]
    imu_g = [rng.normal(0, 1e-4, (10, 3)) for _ in range(sweeps)]
    imu_a = np.tile([0.0, 0.0, 9.81], (10, 1))
    dts = np.full(10, 0.01)
    # first sweep builds the map (excluded: cold path)
    lio.process_sweep(scans[0], None, imu_g[0], imu_a, dts, sweep_dt=0.1)
    t0 = time.perf_counter()
    used = 0
    for k in range(1, sweeps):
        _, st = lio.process_sweep(scans[k], None, imu_g[k], imu_a, dts, sweep_dt=0.1)
        used += st["points_used"]
    lio_s = time.perf_counter() - t0
    n_timed = sweeps - 1
    pts_per_sweep = float(np.mean([len(s) for s in scans]))

    # ---------------- VIO
    vio = Vio(160, 120, 120.0, 120.0, 79.5, 59.5)
    frames = []
    for k in range(sweeps):
        pose = _down_cam(0.01 * k, 0.005 * k, 2.0)
        img, depth = _render_plane(pose)
        frames.append((img, depth, pose))
    img0, d0, p0 = frames[0]
    vio.process(img0, p0, depth=d0)  # spawn the visual map (cold, excluded)
    t0 = time.perf_counter()
    for img, depth, pose_gt in frames[1:]:
        vio.process(img, pose_gt, depth=depth, max_iters=10)
    vio_s = time.perf_counter() - t0

    res = {
        "lio_sweeps_per_s": round(n_timed / lio_s, 1),
        "lio_points_per_s": round(n_timed * pts_per_sweep / lio_s, 0),
        "points_per_sweep": round(pts_per_sweep, 0),
        "lio_ms_per_sweep": round(lio_s / n_timed * 1e3, 1),
        "vio_frames_per_s": round((sweeps - 1) / vio_s, 1),
        "vio_ms_per_frame": round(vio_s / (sweeps - 1) * 1e3, 1),
        "sensor_rate_margin": round((n_timed / lio_s) / 10.0, 1),
    }
    if out_path:
        from pathlib import Path

        Path(out_path).write_text(json.dumps(res, indent=2))
    print(json.dumps(res))
    return res


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweeps", type=int, default=12)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    run(args.sweeps, args.out)


if __name__ == "__main__":
    main()
