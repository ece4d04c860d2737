"""Path smoother server + graceful / rotation-shim controller families
(reference navigation2-humble/nav2_smoother, nav2_graceful_controller,
nav2_rotation_shim_controller — the remaining named controller/smoother
packages adjacent to the g1 bringup, VERDICT r4 missing #4)."""

import numpy as np
import pytest

from holoagent_tpu.nav import (
    Costmap,
    GracefulController,
    RotationShimController,
    SavitzkyGolaySmoother,
    SimpleSmoother,
    SmoothControlLaw,
    SmootherServer,
    make_controller,
)
from holoagent_tpu.nav.costmap import INSCRIBED


@pytest.fixture()
def open_world():
    occ = np.zeros((60, 100), bool)
    occ[0, :] = occ[-1, :] = True
    occ[:, 0] = occ[:, -1] = True
    return Costmap.from_occupancy(occ, np.zeros(2), 0.1, robot_radius=0.15,
                                  inflation_radius=0.5)


def _zigzag():
    xs = np.linspace(1.0, 7.0, 25)
    ys = 2.0 + 0.4 * np.where(np.arange(25) % 2 == 0, 1.0, -1.0)
    return np.stack([xs, ys], axis=1)


def _wiggle(path):
    d2 = np.diff(path[:, :2], n=2, axis=0)
    return float(np.abs(d2).sum())


def test_simple_smoother_relaxes_zigzag(open_world):
    path = _zigzag()
    out = SimpleSmoother().smooth(list(path), open_world)
    np.testing.assert_allclose(out[0], path[0])   # endpoints fixed
    np.testing.assert_allclose(out[-1], path[-1])
    assert _wiggle(out) < 0.25 * _wiggle(path)
    assert (open_world.cost_at_world(out[:, :2]) < INSCRIBED).all()


def test_simple_smoother_collision_guard():
    """Smoothing that would cut a corner into the obstacle band reverts to
    the last feasible sweep (reference simple_smoother.cpp:158-176)."""
    occ = np.zeros((40, 40), bool)
    occ[0, :] = occ[-1, :] = occ[:, 0] = occ[:, -1] = True
    occ[10:26, 10:26] = True  # block the corner the smoother wants to cut
    cm = Costmap.from_occupancy(occ, np.zeros(2), 0.1, robot_radius=0.1,
                                inflation_radius=0.3)
    # right-angle turn hugging the block: x=0.6 column then y=3.0 row
    leg1 = np.stack([np.full(12, 0.6), np.linspace(0.5, 3.0, 12)], axis=1)
    leg2 = np.stack([np.linspace(0.8, 3.4, 12), np.full(12, 3.2)], axis=1)
    path = np.concatenate([leg1, leg2])
    heavy = SimpleSmoother(w_data=0.05, w_smooth=0.45)
    unguarded = heavy.smooth(list(path), None)
    assert (cm.cost_at_world(unguarded[:, :2]) >= INSCRIBED).any()  # would cut
    guarded = heavy.smooth(list(path), cm)
    assert (cm.cost_at_world(guarded[:, :2]) < INSCRIBED).all()


def test_savitzky_golay_smoother(open_world):
    rng = np.random.default_rng(0)
    xs = np.linspace(1.0, 7.0, 40)
    ys = 2.0 + rng.normal(0, 0.08, 40)
    path = np.stack([xs, ys], axis=1)
    out = SavitzkyGolaySmoother().smooth(list(path), open_world)
    np.testing.assert_allclose(out[0], path[0])
    np.testing.assert_allclose(out[-1], path[-1])
    # closer to the underlying straight line on the interior (one SG pass on
    # white noise scales the std by sqrt(sum coef^2) = 0.577; refinement
    # passes add little because the residual noise is then correlated)
    assert np.abs(out[3:-3, 1] - 2.0).mean() < 0.75 * np.abs(path[3:-3, 1] - 2.0).mean()
    assert _wiggle(out) < 0.3 * _wiggle(path)


def test_smoother_server_dispatch(open_world):
    srv = SmootherServer(open_world)
    path = _zigzag()
    for name in ("simple_smoother", "savitzky_golay_smoother"):
        out = srv.smooth_path(list(path), name)
        assert _wiggle(out) < _wiggle(path)
    with pytest.raises(KeyError):
        srv.smooth_path(list(path), "nope")


def test_smooth_control_law_geometry():
    law = SmoothControlLaw()
    # target straight ahead, aligned headings: near-zero curvature, full speed
    v, w = law.command((2.0, 0.0, 0.0), (0.0, 0.0, 0.0))
    assert v == pytest.approx(law.v_linear_max, rel=1e-6)
    assert abs(w) < 1e-6
    # target 90 degrees to the left: turns left (w > 0), slows down
    v2, w2 = law.command((0.0, 2.0, np.pi / 2), (0.0, 0.0, 0.0))
    assert w2 > 0.1
    assert v2 < v


def test_graceful_initial_rotation_then_drive(open_world):
    ctl = make_controller("graceful", open_world)
    path = [np.array([x, 1.0]) for x in np.linspace(2.0, 5.0, 16)]
    goal = np.array([5.0, 1.0])
    # facing away from the path: rotate in place first
    v, w = ctl.compute_velocity((2.0, 1.0, np.pi), (0, 0), path, goal)
    assert v == 0.0 and abs(w) > 0.1
    # closed loop from an aligned start: reaches the goal
    pose = np.array([2.0, 1.0, 0.0])
    for _ in range(400):
        v, w = ctl.compute_velocity(tuple(pose), (v, w), path, goal)
        pose[0] += v * np.cos(pose[2]) * 0.1
        pose[1] += v * np.sin(pose[2]) * 0.1
        pose[2] += w * 0.1
        if np.linalg.norm(pose[:2] - goal) < 0.2:
            break
    assert np.linalg.norm(pose[:2] - goal) < 0.2


class _MarkerPrimary:
    def compute_velocity(self, pose, vel, path, goal_xy):
        return 0.321, 0.0


def test_rotation_shim_rotates_then_delegates(open_world):
    shim = make_controller("rotation_shim", open_world,
                           primary=_MarkerPrimary())
    path = [np.array([x, 1.0]) for x in np.linspace(2.0, 5.0, 16)]
    goal = np.array([5.0, 1.0])
    # 180 degrees off the path heading: pure rotation, toward the shorter arc
    v, w = shim.compute_velocity((2.0, 1.0, np.pi * 0.9), (0, 0), path, goal)
    assert v == 0.0 and w < 0  # rotate clockwise back toward 0
    assert shim.in_rotation
    # aligned: delegates to the primary family
    v, w = shim.compute_velocity((2.0, 1.0, 0.05), (0, 0), path, goal)
    assert v == 0.321 and not shim.in_rotation
