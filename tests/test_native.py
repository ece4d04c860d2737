"""Native host-runtime components exercised through the ctypes bindings."""

import numpy as np
import pytest

from holoagent_tpu.native import ImuPropagator, ScanContext, VelocityBridge, VoxelPlaneMap


def _ring_scene(rng, profile, rot=0.0, noise=0.0):
    """A LiDAR-like scene: a wall whose radial profile(ang) makes it unique;
    `rot` yaws the whole scene (what ScanContext must be invariant to)."""
    pts = []
    for ang in np.arange(0, 2 * np.pi, 0.05):
        r = profile(ang)
        h_max = 1.0 + (r % 3.0)  # height varies with the wall, adds texture
        for h in np.arange(0, h_max, 0.3):
            a = ang + rot
            pts.append([r * np.cos(a), r * np.sin(a), h])
    p = np.array(pts)
    if noise:
        p = p + rng.normal(0, noise, p.shape)
    return p


def test_scan_context_loop_detection(rng):
    sc = ScanContext(num_ring=20, num_sector=60, max_radius=40.0)
    profiles = [
        lambda a: 10 + 5 * np.sin(3 * a) + 2 * np.cos(7 * a),
        lambda a: 20 + 3 * np.sin(2 * a),
        lambda a: 6 + 4 * (np.abs(np.sin(a)) > 0.5),
    ]
    for prof in profiles:
        sc.add_keyframe(sc.descriptor(_ring_scene(rng, prof)))
    assert len(sc) == 3
    # revisit scene 0 with a yaw offset and noise
    query = sc.descriptor(_ring_scene(rng, profiles[0], rot=0.4, noise=0.02))
    idx, yaw, dist = sc.detect_loop(query, exclude_recent=0, max_dist=0.5)
    assert idx == 0
    # yaw is the aligning column shift; a scene rotated by +0.4 aligns at
    # either +0.4 or 2*pi - 0.4 depending on shift direction convention
    two_pi = 2 * np.pi
    cands = [0.4, -0.4, 0.4 - two_pi, -0.4 + two_pi]
    assert min(abs(yaw - c) for c in cands) < 0.25
    # a totally different scene must not match strongly
    other = np.column_stack([rng.uniform(-30, 30, 2000), rng.uniform(-30, 30, 2000),
                             rng.uniform(0, 2, 2000)])
    idx2, _, dist2 = sc.detect_loop(sc.descriptor(other), exclude_recent=0, max_dist=0.05)
    assert idx2 == -1 or dist2 > dist


def test_voxel_plane_map_fit_and_residual(rng):
    vpm = VoxelPlaneMap(voxel_size=1.0, min_points=10, planarity=0.05)
    # z=0 plane
    pts = np.column_stack([rng.uniform(0, 3, 3000), rng.uniform(0, 3, 3000),
                           np.zeros(3000)])
    vpm.insert(pts)
    assert vpm.num_planes >= 1
    res = vpm.residual([1.5, 1.5, 0.2])
    assert res is not None
    r, n = res
    assert abs(abs(r) - 0.2) < 0.02
    assert abs(abs(n[2]) - 1.0) < 1e-3


def test_voxel_plane_map_registration(rng):
    vpm = VoxelPlaneMap(voxel_size=1.0, min_points=10, planarity=0.05)
    # three orthogonal planes lock all 6 DoF
    n = 4000
    walls = np.concatenate([
        np.column_stack([rng.uniform(0, 5, n), rng.uniform(0, 5, n), np.zeros(n)]),
        np.column_stack([np.zeros(n), rng.uniform(0, 5, n), rng.uniform(0, 2, n)]),
        np.column_stack([rng.uniform(0, 5, n), np.zeros(n), rng.uniform(0, 2, n)]),
    ])
    vpm.insert(walls)
    scan = walls[::5]
    # perturb the scan by a small transform
    ang = 0.03
    rot = np.array([[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    scan_p = (scan - [0.05, 0.08, 0.02]) @ rot
    pose, rms = vpm.register(scan_p, np.eye(4), iters=20)
    # registered scan must land back on the walls
    reg = scan_p @ pose[:3, :3].T + pose[:3, 3]
    err = np.abs(reg - scan).mean()
    assert err < 0.03
    assert rms < 0.05


def test_imu_propagation_gravity_cancellation():
    imu = ImuPropagator()
    n = 100
    gyro = np.zeros((n, 3))
    accel = np.tile([0, 0, 9.81], (n, 1))  # stationary: accel = -gravity
    dts = np.full(n, 0.01)
    poses = imu.propagate(gyro, accel, dts, return_poses=True)
    # stays at the origin
    assert np.abs(poses[-1][:3]).max() < 1e-6
    # constant forward accel integrates to x = a t^2 / 2
    imu2 = ImuPropagator()
    accel2 = np.tile([1.0, 0, 9.81], (n, 1))
    poses2 = imu2.propagate(gyro, accel2, dts, return_poses=True)
    t = n * 0.01
    assert abs(poses2[-1][0] - 0.5 * t**2) < 1e-3


def test_imu_init_static(rng):
    imu = ImuPropagator()
    gyro = rng.normal(0.01, 0.001, (200, 3))
    accel = np.tile([0, 0, 9.81], (200, 1)) + rng.normal(0, 0.01, (200, 3))
    imu.init_static(gyro, accel)
    np.testing.assert_allclose(imu.state[10:13], gyro.mean(0), atol=1e-3)  # bias
    assert imu.state[16] < -9.0  # gravity magnitude preserved


def test_imu_undistort_rotating_sweep():
    """Points captured mid-sweep while the sensor yaws must be rotated into
    the sweep-end frame."""
    imu = ImuPropagator()
    n = 10
    w = 1.0  # rad/s yaw
    gyro = np.tile([0, 0, w], (n, 1))
    accel = np.tile([0, 0, 9.81], (n, 1))
    dts = np.full(n, 0.01)
    # a point at (1, 0, 0) captured at t=0; by sweep end the sensor rotated
    # 0.1 rad, so in the end frame the point sits at yaw -0.1
    pts = np.array([[1.0, 0, 0]])
    out = imu.undistort(pts, np.array([0.0]), gyro, accel, dts, sweep_dt=0.1)
    expected = np.array([np.cos(-0.1), np.sin(-0.1), 0.0])
    np.testing.assert_allclose(out[0], expected, atol=5e-3)


def test_velocity_bridge(tmp_path):
    vb = VelocityBridge(str(tmp_path / "vel_fifo"))
    assert vb.read_shaped() is None  # empty
    vb.write(0.3, 0.0, 1.2)
    out = vb.read_shaped(vmax=0.6, vmin=0.05)
    np.testing.assert_allclose(out, [0.3, 0.0, 0.6], atol=1e-6)  # r clamped
    # dead-band
    vb.write(0.01, 0.0, 0.0)
    out = vb.read_shaped(vmax=0.6, vmin=0.05)
    np.testing.assert_allclose(out, [0.0, 0.0, 0.0])
    # min-speed boost
    vb.write(0.01, 0.0, 0.0)
    out = vb.read_shaped(vmax=0.6, vmin=0.05, boost_small=True)
    np.testing.assert_allclose(out, [0.05, 0.0, 0.0], atol=1e-6)
    # newest-wins drain
    vb.write(0.1, 0, 0)
    vb.write(0.2, 0, 0)
    out = vb.read_shaped()
    np.testing.assert_allclose(out[0], 0.2, atol=1e-6)
    vb.close()
