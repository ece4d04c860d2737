"""AMCL-role particle localizer + RPP controller family tests.

Mirrors the probabilistic-localization and second-controller capabilities of
the vendored Nav2 (reference nav2_amcl/, nav2_regulated_pure_pursuit_controller/)
on the hermetic fixture maps."""

import numpy as np
import pytest

from holoagent_tpu.nav import (
    BTNavigator,
    Costmap,
    ParticleLocalizer,
    RPPController,
    Status,
    make_controller,
    simulate_scan,
)

RES = 0.1
ANGLES = np.linspace(-np.pi, np.pi, 36, endpoint=False)


def _l_map():
    """6x6 m room with an internal wall making an L plus asymmetric clutter
    blocks (furniture) — a bare rectangle is 4-fold ambiguous and even the L
    leaves wrong modes a likelihood field scores well; the clutter provides
    the observability real buildings have."""
    occ = np.zeros((60, 60), bool)
    occ[0, :] = occ[-1, :] = occ[:, 0] = occ[:, -1] = True
    occ[0:35, 30] = True  # vertical wall with a gap at the top
    occ[20, 0:20] = True  # horizontal stub
    occ[48:52, 8:12] = True  # table, top-left region
    occ[8:11, 40:48] = True  # sideboard, bottom-right
    occ[42:45, 50:53] = True  # plant, top-right
    occ[28:30, 36:38] = True  # stool, mid-right
    return occ


@pytest.fixture(scope="module")
def lmap():
    occ = _l_map()
    cm = Costmap.from_occupancy(occ, np.zeros(2), RES, robot_radius=0.2,
                                inflation_radius=0.4)
    return occ, cm


def _drive(loc, occ, traj):
    """Feed a trajectory of true poses through the filter (odometry = exact
    increments in the robot frame; scans raycast on the true map)."""
    est = None
    for i in range(1, len(traj)):
        prev, cur = traj[i - 1], traj[i]
        dworld = cur[:2] - prev[:2]
        c, s = np.cos(-prev[2]), np.sin(-prev[2])
        delta = np.array(
            [c * dworld[0] - s * dworld[1], s * dworld[0] + c * dworld[1],
             np.arctan2(np.sin(cur[2] - prev[2]), np.cos(cur[2] - prev[2]))]
        )
        ranges = simulate_scan(occ, np.zeros(2), RES, cur, ANGLES, max_range=8.0)
        est = loc.update(delta, ranges, ANGLES)
    return est


def _square_traj(center, n=30, r=1.0):
    ts = np.linspace(0, 2 * np.pi, n)
    poses = []
    for t in ts:
        x = center[0] + r * np.cos(t)
        y = center[1] + r * np.sin(t)
        poses.append(np.array([x, y, t + np.pi / 2]))
    return poses


def test_localizer_converges_from_global_init(lmap):
    occ, cm = lmap
    loc = ParticleLocalizer(cm, occ, n_particles=600, seed=0)
    traj = _square_traj(np.array([4.2, 4.2]), n=40)
    est = _drive(loc, occ, traj)
    err = np.linalg.norm(est[:2] - traj[-1][:2])
    assert err < 0.35, f"converged to {est} but truth {traj[-1]} (err {err:.2f})"
    assert loc.spread() < 0.6


def test_localizer_kidnapped_robot_recovers(lmap):
    """Teleport the robot after convergence: the w_fast/w_slow recovery must
    re-seed particles and the filter re-converge at the new location
    (the AMCL adaptive recovery; reference nav2_amcl recovery_alpha params)."""
    occ, cm = lmap
    loc = ParticleLocalizer(cm, occ, n_particles=600, seed=1)
    traj = _square_traj(np.array([4.2, 4.2]), n=40)
    _drive(loc, occ, traj)
    err0 = np.linalg.norm(loc.estimate()[:2] - traj[-1][:2])
    assert err0 < 0.35
    # kidnap: robot now at the other room corner; odometry says "no motion"
    new_traj = _square_traj(np.array([1.4, 4.3]), n=60, r=0.8)
    est = _drive(loc, occ, new_traj)
    err = np.linalg.norm(est[:2] - new_traj[-1][:2])
    assert err < 0.45, f"did not relocalize: est {est} truth {new_traj[-1]}"


def test_localizer_set_pose_initialization(lmap):
    """/initialpose-style seeding localizes in one or two updates."""
    occ, cm = lmap
    loc = ParticleLocalizer(cm, occ, n_particles=400, seed=2)
    truth = np.array([4.5, 1.5, 0.4])
    loc.set_pose(truth + [0.1, -0.1, 0.1])
    ranges = simulate_scan(occ, np.zeros(2), RES, truth, ANGLES)
    est = loc.update(np.zeros(3), ranges, ANGLES)
    assert np.linalg.norm(est[:2] - truth[:2]) < 0.25


# ---------------------------------------------------------------------------
# RPP controller family
# ---------------------------------------------------------------------------


class _Sim:
    def __init__(self, x, y, yaw, dt=0.1):
        self.state = np.array([x, y, yaw], np.float64)
        self.dt = dt
        self.cmd = (0.0, 0.0)

    def send_velocity(self, v, _y, w):
        self.cmd = (v, w)

    def step(self):
        v, w = self.cmd
        x, y, yaw = self.state
        self.state = np.array([
            x + v * np.cos(yaw) * self.dt,
            y + v * np.sin(yaw) * self.dt,
            yaw + w * self.dt,
        ])

    def pose(self):
        return tuple(map(float, self.state))


def _open_room():
    occ = np.zeros((60, 60), bool)
    occ[0, :] = occ[-1, :] = occ[:, 0] = occ[:, -1] = True
    return Costmap.from_occupancy(occ, np.zeros(2), RES, robot_radius=0.2,
                                  inflation_radius=0.5)


def test_make_controller_families():
    cm = _open_room()
    from holoagent_tpu.nav import DWAController

    from holoagent_tpu.nav import MPPIController

    assert isinstance(make_controller("dwb", cm), DWAController)
    assert isinstance(make_controller("rpp", cm), RPPController)
    assert isinstance(make_controller("mppi", cm), MPPIController)
    with pytest.raises(KeyError):
        make_controller("teb", cm)


def test_bt_navigator_with_rpp_reaches_goal():
    """Plan parity on the fixture: the RPP family drives the same BTNavigator
    tree to the same goal the DWA family reaches (test_behaviors)."""
    cm = _open_room()
    sim = _Sim(1.0, 1.0, 0.0)
    nav = BTNavigator(cm, sim.send_velocity, sim.pose,
                      controller=RPPController(cm), goal_radius=0.35)
    nav.set_goal(np.array([5.0, 5.0]))
    s = Status.RUNNING
    for _ in range(800):
        s = nav.tick()
        sim.step()
        if s == Status.SUCCESS:
            break
    assert s == Status.SUCCESS
    assert np.linalg.norm(sim.state[:2] - [5.0, 5.0]) < 0.4


def test_rpp_rotates_to_path_then_tracks():
    cm = _open_room()
    ctl = RPPController(cm)
    # path straight behind the robot: must rotate in place first
    path = [np.array([1.0 - 0.1 * i, 3.0]) for i in range(12)]
    v, w = ctl.compute_velocity((3.0, 3.0, 0.0), (0.0, 0.0), path,
                                np.array([0.5, 3.0]))
    assert v == 0.0 and abs(w) > 0.0
    # path straight ahead: forward command, near-zero curvature
    path = [np.array([3.0 + 0.1 * i, 3.0]) for i in range(12)]
    v, w = ctl.compute_velocity((3.0, 3.0, 0.0), (0.0, 0.0), path,
                                np.array([4.2, 3.0]))
    assert v > 0.2 and abs(w) < 0.2


def test_rpp_curvature_regulation_slows_turns():
    cm = _open_room()
    ctl = RPPController(cm)
    # lookahead point hard to the side -> tight curvature -> regulated v
    path = [np.array([3.0 + 0.3 * np.sin(i), 3.0 + 0.3 * (1 - np.cos(i))])
            for i in np.linspace(0, 2.0, 15)]
    v_turn, w_turn = ctl.compute_velocity((3.0, 3.0, 0.0), (0.0, 0.0), path,
                                          np.array([3.3, 3.6]))
    straight = [np.array([3.0 + 0.1 * i, 3.0]) for i in range(12)]
    v_str, _ = ctl.compute_velocity((3.0, 3.0, 0.0), (0.0, 0.0), straight,
                                    np.array([4.2, 3.0]))
    assert v_turn < v_str
