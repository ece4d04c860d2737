import numpy as np
import pytest

from holoagent_tpu.agent.constraints import (
    OdomState,
    WheelOdometryConstraint,
    apply_zupt,
    estimate_ground_z,
    ground_plane_constraint,
)
from holoagent_tpu.agent.relocalizer import Relocalizer, RelocalizerConfig
from holoagent_tpu.memory.multisession import Session


def _structured_scan(rng, seed_profile=3):
    pts = []
    for ang in np.arange(0, 2 * np.pi, 0.04):
        r = 8 + 3 * np.sin(seed_profile * ang) + np.cos(7 * ang)
        for h in np.arange(0, 2.0, 0.25):
            pts.append([r * np.cos(ang), r * np.sin(ang), h])
    # add floor points so z is locked
    g = rng.uniform(-6, 6, (800, 2))
    pts.extend([[x, y, 0.0] for x, y in g])
    return np.asarray(pts)


@pytest.fixture(scope="module")
def prior():
    rng = np.random.default_rng(0)
    s = Session()
    scan = _structured_scan(rng)
    for i in range(4):
        th = 0.3 * i
        pose = np.eye(4)
        pose[:2, :2] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
        pose[:2, 3] = [0.2 * i, 0.1 * i]
        # scan in sensor frame for that pose
        local = (scan - pose[:3, 3]) @ pose[:3, :3]
        s.add_keyframe(pose, local)
    return s


def test_global_relocalization(prior, rng):
    relo = Relocalizer(prior)
    # a new scan captured at prior keyframe 2's pose + noise
    true_pose = prior.poses[2]
    scan = prior.scans[2] + rng.normal(0, 0.01, prior.scans[2].shape)
    ok = relo.global_relocalize(scan)
    assert ok and relo.localized
    # identity odometry -> corrected pose should be ~true_pose
    corrected, _ = relo.update(scan, np.eye(4))
    err = np.linalg.norm(corrected[:2, 3] - true_pose[:2, 3])
    assert err < 0.3


def test_periodic_refinement(prior, rng):
    relo = Relocalizer(prior, RelocalizerConfig(relo_interval=2))
    relo.set_initial_pose(prior.poses[1])
    scan = prior.scans[1]
    # odometry drifts; every 2nd update re-registers
    drift = np.eye(4)
    refined_any = False
    for i in range(6):
        drift[:2, 3] += [0.01, -0.005]
        _, refined = relo.update(scan, np.eye(4))
        refined_any |= refined
    assert refined_any


def test_wheel_constraint_gating():
    st = OdomState(vel=np.array([0.5, 0.0, 0.0]))
    w = WheelOdometryConstraint()
    # consistent measurement pulls the belief
    ok = w.update(st, np.array([0.4, 0.0, 0.0]))
    assert ok and 0.4 < st.vel[0] < 0.5
    # wildly inconsistent measurement is rejected
    st2 = OdomState(vel=np.array([0.5, 0.0, 0.0]),
                    cov_vel=np.eye(3) * 1e-4)
    ok2 = w.update(st2, np.array([10.0, 0.0, 0.0]))
    assert not ok2 and st2.vel[0] == 0.5


def test_zupt_and_ground(rng):
    st = OdomState(vel=np.array([0.2, 0.1, 0.0]))
    assert not apply_zupt(st, accel_std=0.5, gyro_std=0.5)  # moving
    assert apply_zupt(st, accel_std=0.01, gyro_std=0.001)
    np.testing.assert_allclose(st.vel, 0.0)
    # ground constraint pulls z toward the plane
    st.pos[2] = 0.3
    pts = np.c_[rng.uniform(-2, 2, (500, 2)), np.zeros(500)]
    gz = estimate_ground_z(pts)
    assert abs(gz) < 0.05
    for _ in range(5):
        ground_plane_constraint(st, gz)
    assert abs(st.pos[2]) < 0.1
