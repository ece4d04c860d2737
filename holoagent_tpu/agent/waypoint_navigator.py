"""Waypoint navigator: the pubpose equivalent.

Rebuild of reference nav_agent/.../pubpose/pubpose.py:11-183: consume a goal
(or waypoint tour), walk toward each waypoint, report waypoint_reached, honor
"stop".  There the motion goes through Nav2 goToPose; here velocity commands are
computed by a simple P-controller and pushed through the native FIFO bridge
(the actuator side — Unitree SDK in the reference — reads and shapes them,
pubvel.cpp:41-95).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import numpy as np


class WaypointNavigator:
    def __init__(
        self,
        send_velocity: Callable[[float, float, float], None],
        get_pose: Callable[[], np.ndarray],  # (4, 4) robot pose in map frame
        waypoint_radius: float = 0.3,
        k_lin: float = 0.8,
        k_ang: float = 1.5,
        v_max: float = 0.6,
        w_max: float = 1.0,
        on_waypoint_reached: Optional[Callable[[int], None]] = None,
    ):
        self.send_velocity = send_velocity
        self.get_pose = get_pose
        self.waypoint_radius = waypoint_radius
        self.k_lin, self.k_ang = k_lin, k_ang
        self.v_max, self.w_max = v_max, w_max
        self.on_waypoint_reached = on_waypoint_reached
        self._waypoints: List[np.ndarray] = []
        self._idx = 0
        self._stopped = False

    def set_goal(self, waypoints: Sequence[np.ndarray]) -> None:
        self._waypoints = [np.asarray(w, np.float64) for w in waypoints]
        self._idx = 0
        self._stopped = False

    def stop(self) -> None:
        """Cancel the current task (reference pubpose.py:73-77)."""
        self._stopped = True
        self.send_velocity(0.0, 0.0, 0.0)

    @property
    def done(self) -> bool:
        return self._stopped or self._idx >= len(self._waypoints)

    def step(self) -> bool:
        """One control tick. Returns True while navigating."""
        if self.done:
            self.send_velocity(0.0, 0.0, 0.0)
            return False
        pose = self.get_pose()
        pos = pose[:3, 3]
        yaw = np.arctan2(pose[1, 0], pose[0, 0])
        target = self._waypoints[self._idx]
        delta = target[:2] - pos[:2]
        dist = float(np.linalg.norm(delta))
        if dist < self.waypoint_radius:
            if self.on_waypoint_reached:
                self.on_waypoint_reached(self._idx)
            self._idx += 1
            if self.done:
                self.send_velocity(0.0, 0.0, 0.0)
                return False
            return True
        heading = np.arctan2(delta[1], delta[0])
        err = float(np.arctan2(np.sin(heading - yaw), np.cos(heading - yaw)))
        w = float(np.clip(self.k_ang * err, -self.w_max, self.w_max))
        # slow forward motion while badly misaligned
        v = float(np.clip(self.k_lin * dist * max(np.cos(err), 0.0), 0.0, self.v_max))
        self.send_velocity(v, 0.0, w)
        return True
