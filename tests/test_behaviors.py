"""Navigation behavior layer (reference nav2_behaviors / velocity_smoother /
collision_monitor / bt_navigator roles, VERDICT round-1 missing #6)."""

import numpy as np
import pytest

from holoagent_tpu.nav import (
    BTNavigator,
    BackupRecovery,
    Costmap,
    CollisionMonitor,
    SpinRecovery,
    Status,
    VelocitySmoother,
    WaitRecovery,
)


def _open_room(blocked_box=None, hw=(60, 60), res=0.1):
    occ = np.zeros(hw, bool)
    occ[0, :] = occ[-1, :] = occ[:, 0] = occ[:, -1] = True
    if blocked_box is not None:
        r0, r1, c0, c1 = blocked_box
        occ[r0:r1, c0:c1] = True
    return Costmap.from_occupancy(
        occ, origin=np.array([0.0, 0.0]), resolution=res,
        robot_radius=0.15, inflation_radius=0.4,
    )


def test_velocity_smoother_limits_accel():
    sm = VelocitySmoother(max_accel_v=1.0, max_decel_v=2.0, dt=0.1, v_max=0.6)
    v, w = sm.smooth(0.6, 0.0)
    assert v == pytest.approx(0.1)  # 1.0 m/s^2 * 0.1 s
    for _ in range(10):
        v, w = sm.smooth(0.6, 0.0)
    assert v == pytest.approx(0.6)
    # decel is allowed to be faster
    v, w = sm.smooth(0.0, 0.0)
    assert v == pytest.approx(0.4)


def test_collision_monitor_stops_before_wall():
    cm = _open_room()
    mon = CollisionMonitor(cm, stop_time=1.0)
    # heading straight at the west wall from 0.5 m away at 0.6 m/s
    v, w = mon.filter((0.5, 3.0, np.pi), 0.6, 0.0)
    assert v == 0.0
    # heading into open space: untouched
    v, w = mon.filter((3.0, 3.0, 0.0), 0.3, 0.0)
    assert v == pytest.approx(0.3)


def test_recovery_command_generators():
    log = []
    send = lambda v, y, w: log.append((v, w))
    spin = SpinRecovery(send, angle=np.pi / 2, w=0.8, dt=0.1)
    n = 0
    while spin.tick() == Status.RUNNING:
        n += 1
    assert n == round((np.pi / 2) / 0.8 / 0.1)
    assert all(w == 0.8 for v, w in log[:-1]) and log[-1] == (0.0, 0.0)

    log.clear()
    back = BackupRecovery(send, dist=0.3, v=0.15, dt=0.1)
    while back.tick() == Status.RUNNING:
        pass
    assert log[0][0] == -0.15 and log[-1] == (0.0, 0.0)

    log.clear()
    wait = WaitRecovery(send, duration=0.3, dt=0.1)
    while wait.tick() == Status.RUNNING:
        pass
    assert all(v == 0 and w == 0 for v, w in log)


class _Sim:
    """Unicycle simulator driven by the navigator's velocity commands."""

    def __init__(self, x, y, yaw, dt=0.1):
        self.state = np.array([x, y, yaw], np.float64)
        self.dt = dt
        self.cmd = (0.0, 0.0)

    def send_velocity(self, v, _y, w):
        self.cmd = (v, w)

    def step(self):
        v, w = self.cmd
        x, y, yaw = self.state
        self.state = np.array(
            [x + v * np.cos(yaw) * self.dt, y + v * np.sin(yaw) * self.dt, yaw + w * self.dt]
        )

    def pose(self):
        return (float(self.state[0]), float(self.state[1]), float(self.state[2]))


def test_bt_navigator_reaches_goal_open_room():
    cm = _open_room()
    sim = _Sim(1.0, 1.0, 0.0)
    nav = BTNavigator(cm, sim.send_velocity, sim.pose, goal_radius=0.3)
    nav.set_goal(np.array([5.0, 5.0]))
    for _ in range(600):
        s = nav.tick()
        sim.step()
        if s == Status.SUCCESS:
            break
    assert s == Status.SUCCESS
    assert np.linalg.norm(sim.state[:2] - [5.0, 5.0]) < 0.35


def test_bt_navigator_recovers_when_stuck():
    """Start the robot facing a wall dead-end so the controller stalls; the
    recovery round (spin/wait/backup) must free it and the goal be reached
    (the reference tree's RecoveryNode retry loop)."""
    # wall segment right in front of the start pose
    cm = _open_room(blocked_box=(8, 30, 14, 17))
    sim = _Sim(1.2, 1.0, np.pi / 2)  # facing +y toward the wall's side
    nav = BTNavigator(cm, sim.send_velocity, sim.pose, goal_radius=0.35,
                      stall_ticks=8)
    nav.set_goal(np.array([4.5, 4.5]))
    outcome = None
    for _ in range(2500):
        s = nav.tick()
        sim.step()
        if s != Status.RUNNING:
            outcome = s
            break
    assert outcome == Status.SUCCESS
    assert np.linalg.norm(sim.state[:2] - [4.5, 4.5]) < 0.4


def test_bt_navigator_fails_unreachable_goal():
    # goal inside a fully sealed box
    cm = _open_room(blocked_box=(30, 45, 30, 45))
    sim = _Sim(1.0, 1.0, 0.0)
    nav = BTNavigator(cm, sim.send_velocity, sim.pose, max_recoveries=1)
    nav.set_goal(np.array([3.7, 3.7]))  # centre of the sealed box
    outcome = Status.RUNNING
    for _ in range(1500):
        outcome = nav.tick()
        sim.step()
        if outcome != Status.RUNNING:
            break
    assert outcome == Status.FAILURE
