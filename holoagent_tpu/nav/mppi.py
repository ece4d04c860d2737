"""MPPI sampling local controller (the nav2_mppi_controller role).

Rebuild of reference nav_agent/humble_localization_nav2/navigation2-humble/
nav2_mppi_controller/src/optimizer.cpp — Model Predictive Path Integral
control:

  * keep a persistent mean control sequence U (time_steps, 2), shifted one
    step each cycle (Optimizer::shiftControlSequence),
  * sample ``batch_size`` Gaussian perturbations around U
    (noise_generator.cpp, vx_std / wz_std), clamp to velocity and
    acceleration limits (applyControlSequenceConstraints),
  * roll every sample through the unicycle motion model — vectorized over
    the whole batch (integrateStateVelocities),
  * score each sampled trajectory with critic costs: goal distance, path
    following, obstacle/collision, path angle and twirling penalties
    (src/critics/{goal,path_follow,obstacles,path_angle,twirling}_critic.cpp),
  * softmax-reweight with ``temperature`` λ and fold the weighted noise back
    into U (updateControlSequence: U += Σ softmax(-cost/λ)·ε),
  * command U[0].

Exposes the ``compute_velocity(pose, vel, path, goal_xy)`` protocol shared
with DWAController / RPPController so the behavior tree selects it by
``controller_id`` (bt_xml.XMLNavigator, g1.yaml controller_plugins).
All math is host-side numpy: nav control is the cold path (SURVEY.md §7.5 —
the TPU never blocks on the 10 Hz control loop).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import numpy as np

from .costmap import Costmap, INSCRIBED, LETHAL


@dataclass
class MPPIController:
    costmap: Costmap
    v_max: float = 0.5
    v_min: float = 0.0
    w_max: float = 1.0
    accel_v: float = 1.0
    accel_w: float = 2.0
    dt: float = 0.1          # model_dt
    horizon: float = 1.6     # time_steps * model_dt
    batch_size: int = 256
    temperature: float = 0.3  # optimizer.cpp:73
    gamma: float = 0.015      # control-cost coupling (optimizer.cpp:74)
    vx_std: float = 0.2       # optimizer.cpp:79
    wz_std: float = 0.4       # optimizer.cpp:81
    iters: int = 2            # iteration_count
    w_goal: float = 5.0       # goal_critic (active near the global goal)
    goal_activation: float = 1.0  # threshold_to_consider (goal_critic.cpp)
    w_path: float = 5.0       # path_follow_critic (progress to a point ahead)
    w_align: float = 1.5      # path_align_critic (stay on the corridor)
    w_obstacle: float = 1.0   # obstacles_critic (soft band below veto)
    w_angle: float = 0.6      # path_angle_critic
    w_twirl: float = 0.25     # twirling_critic
    w_inscribed: float = 20.0  # strong soft cost on the inscribed band
    lookahead: float = 1.2    # path_follow offset_from_furthest (arc length, m)
    seed: int = 0
    _U: Optional[np.ndarray] = field(default=None, repr=False)
    _rng: np.random.Generator = field(default=None, repr=False)  # type: ignore

    def __post_init__(self):
        self._rng = np.random.default_rng(self.seed)

    @property
    def steps(self) -> int:
        return max(2, int(round(self.horizon / self.dt)))

    def reset(self) -> None:
        self._U = None

    # -- rollout (vectorized over the sample batch) ---------------------------

    def _rollout(self, pose, U):
        """Integrate (B, T, 2) controls from ``pose``: returns (B, T, 3)
        states, yaw applied before translation like optimizer.cpp's
        integrateStateVelocities (heading from cumulative wz)."""
        x0, y0, yaw0 = pose
        v, w = U[..., 0], U[..., 1]
        yaw = yaw0 + np.cumsum(w * self.dt, axis=-1)
        # velocity acts along the heading at the START of each step
        yaw_prev = np.concatenate(
            [np.full_like(yaw[..., :1], yaw0), yaw[..., :-1]], axis=-1
        )
        x = x0 + np.cumsum(v * np.cos(yaw_prev) * self.dt, axis=-1)
        y = y0 + np.cumsum(v * np.sin(yaw_prev) * self.dt, axis=-1)
        return np.stack([x, y, yaw], axis=-1)

    # -- critics ---------------------------------------------------------------

    def _costs(self, traj, U, path_pts, goal_xy):
        """(B,) total critic cost for a (B, T, 3) trajectory batch."""
        B, T, _ = traj.shape
        flat = traj[..., :2].reshape(-1, 2)
        cell = self.costmap.cost_at_world(flat).reshape(B, T).astype(np.float64)
        # hard veto only on LETHAL contact; the inscribed band stays a strong
        # SOFT cost so a sample that grazes it keeps an escape gradient
        # (vetoing on INSCRIBED deadlocks the robot once it drifts into the
        # band — every sample "collides" and the command freezes at 0)
        collide = (cell >= LETHAL).any(axis=1)
        cost = self.w_obstacle * cell.mean(axis=1) / max(INSCRIBED, 1)
        cost += self.w_inscribed * (cell >= INSCRIBED).mean(axis=1)
        tail = traj[:, T // 2 :, :2]
        # path_follow_critic: PROGRESS — distance of the trajectory tail to a
        # point a fixed arc-length AHEAD on the (already pruned) plan, NOT the
        # plan's endpoint: pulling at the endpoint drags samples through walls
        # on non-convex courses, and standing still on the path must not be
        # free (path_follow_critic.cpp offset_from_furthest)
        seg = np.linalg.norm(np.diff(path_pts, axis=0), axis=-1)
        s = np.concatenate([[0.0], np.cumsum(seg)])
        local_tgt = path_pts[min(int(np.searchsorted(s, self.lookahead)),
                                 len(path_pts) - 1)]
        cost += self.w_path * np.linalg.norm(
            tail - local_tgt[None, None], axis=-1
        ).mean(axis=1)
        # goal_critic: only inside the activation radius of the global goal
        # (goal_critic.cpp threshold_to_consider)
        if np.linalg.norm(np.asarray(self._pose_xy) - goal_xy) < self.goal_activation:
            cost += self.w_goal * np.linalg.norm(
                tail - goal_xy[None, None], axis=-1
            ).mean(axis=1)
        # path_align_critic: stay on the corridor
        d = np.linalg.norm(
            traj[:, :, None, :2] - path_pts[None, None], axis=-1
        ).min(axis=2)
        cost += self.w_align * d.mean(axis=1)
        # path_angle_critic: terminal heading vs direction to the local target
        des = np.arctan2(local_tgt[1] - traj[:, -1, 1],
                         local_tgt[0] - traj[:, -1, 0])
        err = np.abs((traj[:, -1, 2] - des + np.pi) % (2 * np.pi) - np.pi)
        cost += self.w_angle * err
        # twirling_critic: penalize spin magnitude
        cost += self.w_twirl * np.abs(U[..., 1]).mean(axis=1)
        cost[collide] = 1e6 + cost[collide]
        return cost, collide

    # -- control ----------------------------------------------------------------

    def compute_velocity(
        self,
        pose: Tuple[float, float, float],
        vel: Tuple[float, float],
        path: Sequence[np.ndarray],
        goal_xy: np.ndarray,
    ) -> Tuple[float, float]:
        """One MPPI cycle; (0, 0) when every sampled trajectory collides
        (recovery/replan upstream, like DWA's veto outcome)."""
        T = self.steps
        goal_xy = np.asarray(goal_xy[:2], np.float64)
        self._pose_xy = (float(pose[0]), float(pose[1]))
        # controllers receive the FULL plan and prune at score time (shared
        # protocol with DWAController): passed waypoints otherwise attract
        # the path-distance cost backwards
        from .controller import prune_path

        path = prune_path(path, np.asarray(pose[:2], np.float64))
        path_pts = (
            np.array([p[:2] for p in path]) if len(path) else goal_xy[None]
        )
        if self._U is None or len(self._U) != T:
            self._U = np.zeros((T, 2))
        # shiftControlSequence: reuse last cycle's plan, one step advanced
        self._U[:-1] = self._U[1:]
        v0, w0 = float(vel[0]), float(vel[1])
        all_collide = True
        for _ in range(max(1, self.iters)):
            eps = self._rng.normal(
                0.0, [self.vx_std, self.wz_std], size=(self.batch_size, T, 2)
            )
            U = self._U[None] + eps
            # applyControlSequenceConstraints: velocity box + first-step
            # acceleration window around the current command
            U[..., 0] = np.clip(U[..., 0], self.v_min, self.v_max)
            U[..., 1] = np.clip(U[..., 1], -self.w_max, self.w_max)
            U[:, 0, 0] = np.clip(
                U[:, 0, 0], v0 - self.accel_v * self.dt, v0 + self.accel_v * self.dt
            )
            U[:, 0, 1] = np.clip(
                U[:, 0, 1], w0 - self.accel_w * self.dt, w0 + self.accel_w * self.dt
            )
            traj = self._rollout(pose, U)
            cost, collide = self._costs(traj, U, path_pts, goal_xy)
            all_collide = bool(collide.all())
            # gamma control cost (optimizer.cpp updateControlSequence):
            # penalize straying from the running mean, scaled by noise power
            cc = (self._U[None] * eps / np.array(
                [self.vx_std, self.wz_std]) ** 2).sum(axis=(1, 2))
            cost = cost + self.gamma * cc
            wgt = np.exp(-(cost - cost.min()) / max(self.temperature, 1e-6))
            wgt /= wgt.sum()
            self._U = self._U + (wgt[:, None, None] * eps).sum(axis=0)
            self._U[:, 0] = np.clip(self._U[:, 0], self.v_min, self.v_max)
            self._U[:, 1] = np.clip(self._U[:, 1], -self.w_max, self.w_max)
        if all_collide:
            return 0.0, 0.0
        v = float(np.clip(self._U[0, 0], v0 - self.accel_v * self.dt,
                          v0 + self.accel_v * self.dt))
        w = float(np.clip(self._U[0, 1], w0 - self.accel_w * self.dt,
                          w0 + self.accel_w * self.dt))
        return v, w
