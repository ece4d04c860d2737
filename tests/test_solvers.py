import jax.numpy as jnp
import numpy as np

from holoagent_tpu.ops import solvers, voxel
from holoagent_tpu.utils.camera import Pinhole, project
from holoagent_tpu.utils.geometry import exp_se3, invert_pose, log_se3, transform_points


def test_log_exp_roundtrip(rng):
    xi = rng.normal(0, 0.5, (10, 6)).astype(np.float32)
    t = exp_se3(jnp.asarray(xi))
    back = np.asarray(log_se3(t))
    np.testing.assert_allclose(back, xi, atol=1e-4)


def _cam():
    return Pinhole.make(200.0, 200.0, 64.0, 48.0)


def test_pnp_recovers_pose(rng):
    cam = _cam()
    pts = rng.uniform(-1, 1, (80, 3)).astype(np.float32)
    pts[:, 2] += 4.0  # in front of camera at identity
    true_xi = np.array([0.05, -0.03, 0.08, 0.04, -0.02, 0.03], np.float32)
    pose_true = np.asarray(exp_se3(jnp.asarray(true_xi)))  # world->cam
    uv, _ = project(transform_points(jnp.asarray(pose_true), jnp.asarray(pts)), cam)
    pose_est, rms = solvers.pnp_gauss_newton(
        jnp.asarray(pts), uv, jnp.ones(80, bool), cam, jnp.eye(4), iters=10
    )
    err = np.asarray(log_se3(invert_pose(jnp.asarray(pose_true)) @ pose_est))
    assert np.abs(err).max() < 1e-3
    assert float(rms) < 1e-2


def test_pnp_ignores_invalid(rng):
    cam = _cam()
    pts = rng.uniform(-1, 1, (60, 3)).astype(np.float32)
    pts[:, 2] += 4.0
    uv, _ = project(jnp.asarray(pts), cam)
    uv = np.array(uv)
    uv[:10] += 500.0  # gross outliers
    valid = np.ones(60, bool)
    valid[:10] = False
    pose, rms = solvers.pnp_gauss_newton(
        jnp.asarray(pts), jnp.asarray(uv), jnp.asarray(valid), cam, jnp.eye(4)
    )
    assert float(rms) < 1e-3  # outliers masked out


def test_pose_graph_closes_loop(rng):
    # chain of 6 poses with a loop closure back to the start; noisy odometry
    m = 6
    true = [np.eye(4, dtype=np.float32)]
    for i in range(1, m):
        xi = np.array([0.5, 0, 0, 0, 0, 0.3], np.float32)
        true.append(np.asarray(true[-1] @ np.asarray(exp_se3(jnp.asarray(xi)))))
    true = np.stack(true)
    edges = [(i, i + 1) for i in range(m - 1)] + [(m - 1, 0)]
    rels, init = [], [true[0]]
    noise = rng.normal(0, 0.02, (len(edges), 6)).astype(np.float32)
    for k, (i, j) in enumerate(edges):
        z = np.asarray(invert_pose(jnp.asarray(true[i])) @ true[j])
        z = np.asarray(jnp.asarray(z) @ exp_se3(jnp.asarray(noise[k])))
        rels.append(z)
    # odometry-integrated init (drifts)
    for k in range(m - 1):
        init.append(np.asarray(jnp.asarray(init[-1]) @ jnp.asarray(rels[k])))
    init = np.stack(init)
    poses, rnorm = solvers.pose_graph_gauss_newton(
        jnp.asarray(init),
        jnp.asarray(np.array(edges, np.int32)),
        jnp.asarray(np.stack(rels)),
        jnp.ones(len(edges), bool),
        iters=15,
    )
    # optimized poses closer to truth than the drifted init
    def err(ps):
        e = np.asarray(log_se3(invert_pose(jnp.asarray(true)) @ jnp.asarray(ps)))
        return np.abs(e).mean()

    assert err(poses) < err(init)
    assert err(poses) < 0.05


def test_icp_registers_scan(rng):
    grid = voxel.GridSpec.centered(0.05)
    scene_pts = rng.uniform(-2, 2, (5000, 3)).astype(np.float32)
    down = voxel.voxel_downsample(
        jnp.asarray(scene_pts), jnp.zeros((5000, 1)), jnp.ones(5000, bool), grid, 8192
    )
    # scan = subset of scene, perturbed by a small rigid transform
    scan = scene_pts[:800]
    xi = np.array([0.05, -0.04, 0.03, 0.02, 0.01, -0.02], np.float32)
    t_true = np.asarray(exp_se3(jnp.asarray(xi)))
    scan_t = np.asarray(transform_points(jnp.asarray(np.linalg.inv(t_true)), jnp.asarray(scan)))
    res = solvers.icp_point2point(
        jnp.asarray(scan_t.astype(np.float32)),
        jnp.ones(800, bool),
        down["key"],
        down["points"],
        grid,
        jnp.eye(4),
        iters=20,
    )
    err = np.asarray(log_se3(invert_pose(jnp.asarray(t_true)) @ res.pose))
    assert np.abs(err).max() < 0.03
    assert float(res.inlier_frac) > 0.9


def test_icp_multiscale_large_displacement(rng):
    # plane-heavy scene + displacement larger than one fine voxel: the
    # single-scale snap loses correspondences, multiscale must recover
    from holoagent_tpu.dataloader import SyntheticDataset
    from holoagent_tpu.ops.backproject import backproject
    from holoagent_tpu.utils.camera import Pinhole

    ds = SyntheticDataset(num_frames=4, hw=(48, 64))
    pts_all = []
    for i in range(4):
        f = ds[i]
        p, _, v = backproject(
            jnp.asarray(f.depth), jnp.asarray(f.rgb), Pinhole.from_matrix(f.k),
            jnp.asarray(f.pose), 1e-3, 20.0,
        )
        pts_all.append(np.asarray(p)[np.asarray(v)])
    mappts = np.concatenate(pts_all).astype(np.float32)
    scan = mappts[::7][:1500]
    xi = np.array([0.08, -0.05, 0.02, 0.03, -0.02, 0.05], np.float32)
    t_true = np.asarray(exp_se3(jnp.asarray(xi)))
    scan_p = np.asarray(
        transform_points(jnp.asarray(np.linalg.inv(t_true).astype(np.float32)), jnp.asarray(scan))
    )
    res = solvers.icp_multiscale(
        jnp.asarray(scan_p), jnp.ones(len(scan_p), bool),
        jnp.asarray(mappts), jnp.ones(len(mappts), bool), jnp.eye(4),
        scales=(0.3, 0.1, 0.05, 0.03), iters_per_scale=15,
    )
    err = np.abs(np.asarray(log_se3(invert_pose(jnp.asarray(t_true)) @ res.pose)))
    assert err.max() < 0.05
    # empty-scan probe: inlier fraction must be 0, not 1
    from holoagent_tpu.ops import voxel as vx
    g = vx.GridSpec.centered(0.05)
    d = vx.voxel_downsample(jnp.asarray(mappts), jnp.zeros((len(mappts), 1)),
                            jnp.ones(len(mappts), bool), g, 1 << 15)
    r2 = solvers.icp_point2point(
        jnp.zeros((8, 3)), jnp.zeros(8, bool), d["key"], d["points"], g, jnp.eye(4)
    )
    assert float(r2.inlier_frac) == 0.0
