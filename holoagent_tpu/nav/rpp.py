"""Regulated Pure Pursuit local controller (the nav2 RPP role).

Second controller family beside the DWB-role DWAController — rebuild of
reference nav_agent/humble_localization_nav2/navigation2-humble/
nav2_regulated_pure_pursuit_controller/src/regulated_pure_pursuit_controller.cpp:

  * velocity-scaled lookahead point on the pruned global plan
    (getLookAheadPoint, lookahead_time · v clamped to [min, max] dist),
  * pure-pursuit curvature kappa = 2·y_l / L^2 toward it,
  * the two REGULATIONS that give the controller its name: slow down for
    high curvature (applyCurvatureRegulation: v <= v_max · r/r_min below the
    regulated radius) and for obstacle proximity (applyProximityRegulation:
    linear scale inside cost_scaling_dist),
  * rotate-to-heading when the goal/lookahead is far outside the heading cone
    (shouldRotateToPath), and arc collision checking that zeroes the command
    so the behavior tree's recovery round triggers (isCollisionImminent).

Exposes the same ``compute_velocity(pose, vel, path, goal_xy)`` protocol as
DWAController, so BTNavigator/_NavigateLeaf takes either family unchanged
(the reference selects controller plugins in g1.yaml:50-55 the same way).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence, Tuple

import numpy as np

from .costmap import Costmap, INSCRIBED


def _lookahead_point(path_xy: np.ndarray, pose_xy: np.ndarray, dist: float):
    """First point on the path at least `dist` from the robot, interpolated
    on the crossing segment (reference getLookAheadPoint's circle-segment
    intersection); falls back to the last point."""
    d = np.linalg.norm(path_xy - pose_xy, axis=1)
    beyond = np.nonzero(d >= dist)[0]
    if not len(beyond):
        return path_xy[-1]
    i = int(beyond[0])
    if i == 0:
        return path_xy[0]
    a, b = path_xy[i - 1], path_xy[i]
    # interpolate to the circle of radius `dist` around the robot
    seg = b - a
    f0 = a - pose_xy
    aa = float(seg @ seg)
    bb = 2.0 * float(f0 @ seg)
    cc = float(f0 @ f0) - dist * dist
    disc = bb * bb - 4 * aa * cc
    if aa < 1e-12 or disc < 0:
        return b
    t = (-bb + np.sqrt(disc)) / (2 * aa)
    return a + np.clip(t, 0.0, 1.0) * seg


@dataclass
class RPPController:
    costmap: Costmap
    v_max: float = 0.5
    v_min: float = 0.05
    w_max: float = 1.0
    lookahead_time: float = 1.5  # s -> lookahead = v * time
    min_lookahead: float = 0.3
    max_lookahead: float = 0.9
    # curvature regulation (reference regulated_linear_scaling_min_radius)
    min_radius: float = 0.9
    # proximity regulation (reference cost_scaling_dist / cost_scaling_gain)
    proximity_cost: float = 128.0  # start slowing above this cell cost
    rotate_to_heading_angle: float = 0.785  # ~45 deg
    w_rotate: float = 0.8
    collision_horizon: float = 1.0  # s of arc checked ahead
    dt: float = 0.1

    def compute_velocity(
        self,
        pose: Tuple[float, float, float],  # x, y, yaw
        vel: Tuple[float, float],  # current (v, w) — unused (RPP is stateless)
        path: Sequence[np.ndarray],  # pruned global plan waypoints
        goal_xy: np.ndarray,
    ) -> Tuple[float, float]:
        pose_xy = np.asarray(pose[:2], np.float64)
        yaw = float(pose[2])
        # shared controller protocol: full plan in, prune at score time
        from .controller import prune_path

        path = prune_path(path, pose_xy)
        pts = (
            np.array([p[:2] for p in path], np.float64)
            if len(path)
            else np.asarray(goal_xy, np.float64)[None, :2]
        )
        v_ref = self.v_max
        ld = float(np.clip(v_ref * self.lookahead_time, self.min_lookahead,
                           self.max_lookahead))
        target = _lookahead_point(pts, pose_xy, ld)
        # robot-frame target
        c, s = np.cos(-yaw), np.sin(-yaw)
        rel = np.array([c, -s, s, c]).reshape(2, 2) @ (target - pose_xy)
        heading = float(np.arctan2(rel[1], rel[0]))
        if abs(heading) > self.rotate_to_heading_angle:
            # rotate in place toward the path (shouldRotateToPath)
            return 0.0, float(np.sign(heading) * self.w_rotate)
        l2 = float(rel @ rel)
        kappa = 2.0 * float(rel[1]) / max(l2, 1e-9)
        # curvature regulation: cap v so the turn radius stays comfortable
        v = self.v_max
        if abs(kappa) > 1e-9:
            radius = 1.0 / abs(kappa)
            if radius < self.min_radius:
                v *= radius / self.min_radius
        # proximity regulation: scale down near obstacles
        cost_here = float(self.costmap.cost_at_world(pose_xy[None])[0])
        if cost_here >= self.proximity_cost:
            v *= max(
                0.0,
                1.0
                - (cost_here - self.proximity_cost)
                / max(INSCRIBED - self.proximity_cost, 1.0),
            )
        v = float(np.clip(v, self.v_min, self.v_max))
        w = float(np.clip(v * kappa, -self.w_max, self.w_max))
        # arc collision check (isCollisionImminent): simulate the commanded
        # arc for collision_horizon seconds
        steps = max(int(self.collision_horizon / self.dt), 1)
        x, y, th = float(pose[0]), float(pose[1]), yaw
        arc = np.zeros((steps, 2))
        for i in range(steps):
            x += v * np.cos(th) * self.dt
            y += v * np.sin(th) * self.dt
            th += w * self.dt
            arc[i] = (x, y)
        if self.costmap.cost_at_world(arc).max(initial=0) >= INSCRIBED:
            return 0.0, 0.0  # let the BT recovery round take over
        return v, w
