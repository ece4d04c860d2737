"""Navigation behavior layer: recovery behaviors, behavior-tree navigator,
velocity smoother, and collision monitor.

The role of the reference's vendored Nav2 behavior stack beyond the happy
path (reference nav_agent/humble_localization_nav2/navigation2-humble/
nav2_behaviors [spin/backup/wait], nav2_velocity_smoother,
nav2_collision_monitor, and nav2_bt_navigator's default
navigate_to_pose_w_replanning_and_recovery tree; wired by
g1_navigation2/param/g1.yaml:50-286).  Rebuilt host-side on this package's
costmap/planner/controller instead of ROS 2 plugins:

  * VelocitySmoother  — accel/decel-limited command filtering
  * CollisionMonitor  — velocity-dependent stop/slowdown band on the costmap
  * Spin/Backup/Wait  — timed recovery command generators
  * Behavior tree     — Sequence/Fallback/Retry over Node.tick()
  * BTNavigator       — navigate-with-replanning + recovery-round fallback
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from .controller import DWAController
from .costmap import Costmap, INSCRIBED, LETHAL
from .planner import astar_plan


# --------------------------------------------------------------------- smooth


@dataclass
class VelocitySmoother:
    """Acceleration/deceleration-limited command smoothing (reference
    nav2_velocity_smoother: max_accel/max_decel per axis, g1.yaml's
    velocity_smoother node role)."""

    max_accel_v: float = 1.0   # m/s^2
    max_decel_v: float = 1.5
    max_accel_w: float = 2.0   # rad/s^2
    max_decel_w: float = 3.0
    v_max: float = 0.6
    w_max: float = 1.0
    dt: float = 0.1
    _v: float = 0.0
    _w: float = 0.0

    def smooth(self, v_cmd: float, w_cmd: float) -> Tuple[float, float]:
        v_cmd = float(np.clip(v_cmd, -self.v_max, self.v_max))
        w_cmd = float(np.clip(w_cmd, -self.w_max, self.w_max))
        dv = v_cmd - self._v
        lim_v = (self.max_decel_v if abs(v_cmd) < abs(self._v) else self.max_accel_v) * self.dt
        self._v += float(np.clip(dv, -lim_v, lim_v))
        dw = w_cmd - self._w
        lim_w = (self.max_decel_w if abs(w_cmd) < abs(self._w) else self.max_accel_w) * self.dt
        self._w += float(np.clip(dw, -lim_w, lim_w))
        return self._v, self._w

    def reset(self) -> None:
        self._v = self._w = 0.0


# -------------------------------------------------------------------- monitor


@dataclass
class CollisionMonitor:
    """Velocity-dependent collision gate (reference nav2_collision_monitor:
    stop and slowdown polygons ahead of the robot).  The lookahead band scales
    with commanded speed (stopping distance + margin); commands that would
    sweep a lethal cell are zeroed, near-lethal cells trigger a slowdown."""

    costmap: Costmap
    stop_time: float = 1.0       # seconds of travel checked at v_cmd
    slowdown_ratio: float = 0.5
    slow_cost: int = 200         # cost above which to slow down
    n_probe: int = 8

    def filter(
        self, pose: Tuple[float, float, float], v: float, w: float
    ) -> Tuple[float, float]:
        if abs(v) < 1e-6:
            return v, w
        x, y, yaw = pose
        ts = np.linspace(0.0, self.stop_time, self.n_probe + 1)[1:]
        # constant-curvature arc prediction
        if abs(w) > 1e-6:
            xs = x + v / w * (np.sin(yaw + w * ts) - np.sin(yaw))
            ys = y - v / w * (np.cos(yaw + w * ts) - np.cos(yaw))
        else:
            xs = x + v * ts * np.cos(yaw)
            ys = y + v * ts * np.sin(yaw)
        costs = self.costmap.cost_at_world(np.stack([xs, ys], -1))
        # poses OUTSIDE the inscribed band stop before entering it (nav2
        # semantics: an inscribed cell means the footprint may already
        # overlap an obstacle when inflation_radius == robot radius); a
        # robot that drifted INSIDE the band keeps the escape-gradient
        # behavior — its escape arc necessarily crosses band cells, so only
        # predicted CONTACT stops it (mirrors BaseObstacleCritic's
        # in-band soft penalty)
        here = float(self.costmap.cost_at_world(np.array([[x, y]]))[0])
        stop_level = LETHAL if here >= INSCRIBED else INSCRIBED
        if costs.max(initial=0) >= stop_level:
            return 0.0, 0.0  # stop zone
        if costs.max(initial=0) >= self.slow_cost:
            return v * self.slowdown_ratio, w
        return v, w


# ------------------------------------------------------------------ behaviors


class Status(Enum):
    RUNNING = 0
    SUCCESS = 1
    FAILURE = 2


class Node:
    """Behavior-tree node contract (reference nav2_behavior_tree)."""

    def tick(self) -> Status:  # pragma: no cover - interface
        raise NotImplementedError

    def reset(self) -> None:
        pass


class Sequence(Node):
    """Succeeds when all children succeed, fails fast."""

    def __init__(self, children: Sequence[Node]):
        self.children = list(children)
        self._i = 0

    def tick(self) -> Status:
        while self._i < len(self.children):
            s = self.children[self._i].tick()
            if s == Status.RUNNING:
                return s
            if s == Status.FAILURE:
                self._i = 0
                return Status.FAILURE
            self._i += 1
        self._i = 0
        return Status.SUCCESS

    def reset(self) -> None:
        self._i = 0
        for c in self.children:
            c.reset()


class Fallback(Node):
    """Succeeds on the first child that succeeds (the BT selector)."""

    def __init__(self, children: Sequence[Node]):
        self.children = list(children)
        self._i = 0

    def tick(self) -> Status:
        while self._i < len(self.children):
            s = self.children[self._i].tick()
            if s == Status.RUNNING:
                return s
            if s == Status.SUCCESS:
                self._i = 0
                return Status.SUCCESS
            self._i += 1
        self._i = 0
        return Status.FAILURE

    def reset(self) -> None:
        self._i = 0
        for c in self.children:
            c.reset()


class Retry(Node):
    """Retries its child up to n times on failure (reference
    RecoveryNode number_of_retries)."""

    def __init__(self, child: Node, retries: int):
        self.child = child
        self.retries = retries
        self._used = 0

    def tick(self) -> Status:
        s = self.child.tick()
        if s == Status.FAILURE and self._used < self.retries:
            self._used += 1
            self.child.reset()
            return Status.RUNNING
        if s != Status.RUNNING:
            self._used = 0
        return s

    def reset(self) -> None:
        self._used = 0
        self.child.reset()


class TimedCommand(Node):
    """Run a fixed velocity command for a duration (Spin/Backup/Wait base;
    reference nav2_behaviors timed command pattern)."""

    def __init__(
        self,
        send_velocity: Callable[[float, float, float], None],
        v: float,
        w: float,
        duration: float,
        dt: float = 0.1,
    ):
        self.send_velocity = send_velocity
        self.v, self.w = v, w
        self.steps = max(1, int(round(duration / dt)))
        self._t = 0

    def tick(self) -> Status:
        if self._t < self.steps:
            self.send_velocity(self.v, 0.0, self.w)
            self._t += 1
            return Status.RUNNING
        self.send_velocity(0.0, 0.0, 0.0)
        self._t = 0
        return Status.SUCCESS

    def reset(self) -> None:
        self._t = 0


def SpinRecovery(send_velocity, angle: float = np.pi / 2, w: float = 0.8, dt=0.1):
    """In-place rotation (reference nav2_behaviors/plugins/spin)."""
    return TimedCommand(send_velocity, 0.0, w, abs(angle) / abs(w), dt)


def BackupRecovery(send_velocity, dist: float = 0.3, v: float = 0.15, dt=0.1):
    """Straight reverse (reference nav2_behaviors/plugins/back_up)."""
    return TimedCommand(send_velocity, -abs(v), 0.0, abs(dist) / abs(v), dt)


def WaitRecovery(send_velocity, duration: float = 2.0, dt=0.1):
    """Hold still (reference nav2_behaviors/plugins/wait)."""
    return TimedCommand(send_velocity, 0.0, 0.0, duration, dt)


# ------------------------------------------------------------------ navigator


class _NavigateLeaf(Node):
    """Navigate-to-pose with replanning: plans on the costmap, follows with
    the DWA controller through smoother + collision monitor; fails when no
    plan exists or progress stalls (the stall is what triggers recovery)."""

    def __init__(self, nav: "BTNavigator"):
        self.nav = nav
        self._last_pos: Optional[np.ndarray] = None
        self._stall = 0

    def tick(self) -> Status:
        nav = self.nav
        pose = nav.get_pose()
        pos = np.array(pose[:2])
        if np.linalg.norm(pos - nav.goal_xy) < nav.goal_radius:
            nav.send_velocity(0.0, 0.0, 0.0)
            return Status.SUCCESS
        # (re)plan every replan_period ticks
        if nav._plan is None or nav._tick % nav.replan_period == 0:
            nav._plan = astar_plan(nav.costmap, pos, nav.goal_xy)
            if nav._plan is None or not len(nav._plan):
                return Status.FAILURE
        nav._tick += 1
        # controllers prune at score time (full plan keeps the DWA
        # path-wavefront cache key stable until the next replan)
        v, w = nav.controller.compute_velocity(pose, nav._vel, nav._plan, nav.goal_xy)
        v, w = nav.monitor.filter(pose, v, w)
        v, w = nav.smoother.smooth(v, w)
        nav._vel = (v, w)
        nav.send_velocity(v, 0.0, w)
        # stall detection (controller returned ~0 or pose not moving)
        if self._last_pos is not None and np.linalg.norm(pos - self._last_pos) < 1e-3:
            self._stall += 1
        else:
            self._stall = 0
        self._last_pos = pos
        if self._stall > nav.stall_ticks:
            nav.send_velocity(0.0, 0.0, 0.0)
            return Status.FAILURE
        return Status.RUNNING

    def reset(self) -> None:
        self._last_pos = None
        self._stall = 0
        self.nav._plan = None
        self.nav.smoother.reset()


class BTNavigator:
    """navigate_to_pose with replanning and recovery (the reference
    bt_navigator's default tree, nav2_bt_navigator/behavior_trees/
    navigate_to_pose_w_replanning_and_recovery.xml): RecoveryNode around
    [NavigateWithReplanning | recovery round = spin -> wait -> backup]."""

    def __init__(
        self,
        costmap: Costmap,
        send_velocity: Callable[[float, float, float], None],
        get_pose: Callable[[], Tuple[float, float, float]],  # x, y, yaw
        controller: Optional[DWAController] = None,
        goal_radius: float = 0.3,
        replan_period: int = 10,
        stall_ticks: int = 15,
        max_recoveries: int = 6,
    ):
        self.costmap = costmap
        self.send_velocity = send_velocity
        self.get_pose = get_pose
        self.controller = controller or DWAController(costmap)
        self.smoother = VelocitySmoother(
            v_max=self.controller.v_max, w_max=self.controller.w_max
        )
        self.monitor = CollisionMonitor(costmap)
        self.goal_radius = goal_radius
        self.replan_period = replan_period
        self.stall_ticks = stall_ticks
        self.goal_xy = np.zeros(2)
        self._vel = (0.0, 0.0)
        self._plan = None
        self._tick = 0

        recovery_round = Sequence(
            [
                SpinRecovery(send_velocity),
                WaitRecovery(send_velocity, duration=0.5),
                BackupRecovery(send_velocity),
            ]
        )
        self._navigate = _NavigateLeaf(self)
        self._tree = Retry(
            Fallback([self._navigate, _AlwaysFail(recovery_round)]),
            retries=max_recoveries,
        )

    def set_goal(self, goal_xy: np.ndarray) -> None:
        self.goal_xy = np.asarray(goal_xy, np.float64)[:2]
        self._plan = None
        self._tick = 0
        self._vel = (0.0, 0.0)
        self._tree.reset()

    def tick(self) -> Status:
        """One control tick; call at the controller rate (reference g1.yaml
        controller_frequency 10 Hz)."""
        return self._tree.tick()


class _AlwaysFail(Node):
    """Run the child to completion, then report FAILURE — recovery rounds
    clear the way but the navigate leaf must re-attempt (matches the
    reference tree's RoundRobin-under-RecoveryNode semantics)."""

    def __init__(self, child: Node):
        self.child = child

    def tick(self) -> Status:
        s = self.child.tick()
        if s == Status.RUNNING:
            return s
        self.child.reset()
        return Status.FAILURE

    def reset(self) -> None:
        self.child.reset()
