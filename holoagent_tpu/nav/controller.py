"""Dynamic-window trajectory-rollout local controller (the DWB role,
reference g1.yaml:50-136 DWBLocalPlanner critics: path align, goal dist,
obstacle cost, oscillation)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .costmap import Costmap, INSCRIBED


def prune_path(path: Sequence[np.ndarray], pose_xy: np.ndarray, lookahead: int = 20):
    """Drop waypoints already passed: keep from the nearest waypoint onward
    (passed points otherwise keep attracting the path-align critic backwards)."""
    if not len(path):
        return []
    pts = np.array([p[:2] for p in path])
    i = int(np.argmin(np.linalg.norm(pts - np.asarray(pose_xy)[:2], axis=1)))
    return list(path[i : i + lookahead])


@dataclass
class DWAController:
    costmap: Costmap
    v_max: float = 0.5
    w_max: float = 1.0
    accel_v: float = 0.5
    accel_w: float = 1.5
    dt: float = 0.1
    horizon: float = 1.5
    n_v: int = 6
    n_w: int = 11
    w_path: float = 1.0
    w_goal: float = 1.5
    w_obstacle: float = 0.02
    w_speed: float = 0.3

    def _rollout(self, pose, v, w):
        """Unicycle rollout: (T, 3) states (x, y, yaw)."""
        steps = int(self.horizon / self.dt)
        x, y, yaw = pose
        out = np.zeros((steps, 3))
        for i in range(steps):
            x += v * np.cos(yaw) * self.dt
            y += v * np.sin(yaw) * self.dt
            yaw += w * self.dt
            out[i] = (x, y, yaw)
        return out

    def compute_velocity(
        self,
        pose: Tuple[float, float, float],  # x, y, yaw
        vel: Tuple[float, float],  # current (v, w)
        path: Sequence[np.ndarray],  # global plan waypoints (world xy[z])
        goal_xy: np.ndarray,
    ) -> Tuple[float, float]:
        """Best (v, w) inside the dynamic window; (0, 0) when every rollout
        collides (the caller should then trigger recovery/replan)."""
        v0, w0 = vel
        vs = np.linspace(
            max(0.0, v0 - self.accel_v), min(self.v_max, v0 + self.accel_v), self.n_v
        )
        ws = np.linspace(
            max(-self.w_max, w0 - self.accel_w),
            min(self.w_max, w0 + self.accel_w),
            self.n_w,
        )
        pts = np.array([p[:2] for p in path]) if len(path) else goal_xy[None, :2]
        best, best_cmd = np.inf, (0.0, 0.0)
        for v in vs:
            for w in ws:
                traj = self._rollout(pose, v, w)
                costs = self.costmap.cost_at_world(traj[:, :2])
                if costs.max(initial=0) >= INSCRIBED:
                    continue  # collision
                d_path = np.min(
                    np.linalg.norm(traj[-1, :2] - pts, axis=1)
                )
                d_goal = float(np.linalg.norm(traj[-1, :2] - goal_xy[:2]))
                score = (
                    self.w_path * d_path
                    + self.w_goal * d_goal
                    + self.w_obstacle * float(costs.mean())
                    + self.w_speed * (self.v_max - v)
                )
                if score < best:
                    best, best_cmd = score, (float(v), float(w))
        return best_cmd
