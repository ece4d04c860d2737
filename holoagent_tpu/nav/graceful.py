"""Graceful controller + rotation-shim controller (two remaining nav2
controller families).

`GracefulController` rebuilds reference nav_agent/humble_localization_nav2/
navigation2-humble/nav2_graceful_controller: the Park & Kuipers smooth
control law (src/smooth_control_law.cpp:55-122) over egocentric polar
coordinates (include/nav2_graceful_controller/ego_polar_coords.hpp:65-69),
with the parameter defaults of src/parameter_handler.cpp:38-65 (k_phi 3.0,
k_delta 2.0, beta 0.2, lambda 2.0, motion_target_dist 0.6, slowdown_radius
1.5, initial/final rotation).

`RotationShimController` rebuilds nav2_rotation_shim_controller/src/
nav2_rotation_shim_controller.cpp: rotate in place toward the path heading
sampled `forward_sampling_distance` ahead while the angular distance exceeds
the engage threshold (with a hysteresis disengage threshold, :210), then
delegate every subsequent command to the primary controller.

Both expose the `compute_velocity(pose, vel, path, goal_xy)` protocol shared
by DWAController / RPPController / MPPIController, so nav.make_controller and
the BT FollowPath leaf take them unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import numpy as np

from .costmap import Costmap


def _norm_angle(a: float) -> float:
    return float((a + np.pi) % (2.0 * np.pi) - np.pi)


@dataclass
class SmoothControlLaw:
    """Park & Kuipers pose-following law (reference smooth_control_law.cpp).

    Egocentric polar coordinates of the robot about the TARGET pose
    (ego_polar_coords.hpp:65-69): with los = atan2(-dy, dx),
    r = |target - robot|, phi = target_yaw + los, delta = robot_yaw + los.
    Curvature (smooth_control_law.cpp:114-122):

        k = -(1/r) * [ k_delta * (delta - atan(-k_phi * phi))
                       + (1 + k_phi / (1 + (k_phi * phi)^2)) * sin(delta) ]

    then v = v_max / (1 + beta * |k|^lambda), slowdown v <= v_max * r /
    slowdown_radius near the target, clamp to [v_min, v_max]; w = k * v
    bounded to +-w_max with v re-derived from the bounded w so the commanded
    arc keeps the law's curvature (:78-83)."""

    k_phi: float = 3.0
    k_delta: float = 2.0
    beta: float = 0.2
    lambda_: float = 2.0
    slowdown_radius: float = 1.5
    v_linear_min: float = 0.1
    v_linear_max: float = 0.5
    v_angular_max: float = 1.0

    def curvature(self, r: float, phi: float, delta: float) -> float:
        prop = self.k_delta * (delta - np.arctan(-self.k_phi * phi))
        feedback = (1.0 + self.k_phi / (1.0 + (self.k_phi * phi) ** 2)) * np.sin(delta)
        return float(-1.0 / max(r, 1e-9) * (prop + feedback))

    def command(
        self,
        target: Tuple[float, float, float],  # (x, y, yaw) world
        current: Tuple[float, float, float],
    ) -> Tuple[float, float]:
        dx = target[0] - current[0]
        dy = target[1] - current[1]
        r = float(np.hypot(dx, dy))
        los = float(np.arctan2(-dy, dx))
        phi = _norm_angle(target[2] + los)
        delta = _norm_angle(current[2] + los)
        k = self.curvature(r, phi, delta)
        v = self.v_linear_max / (1.0 + self.beta * abs(k) ** self.lambda_)
        v = min(self.v_linear_max * (r / self.slowdown_radius), v)
        v = float(np.clip(v, self.v_linear_min, self.v_linear_max))
        w = float(np.clip(k * v, -self.v_angular_max, self.v_angular_max))
        if k != 0.0:
            v = w / k  # keep the commanded arc on the law's curvature
        return v, w


@dataclass
class GracefulController:
    """Motion-target pose following (reference graceful_controller.cpp):
    pick the first plan pose `motion_target_dist` ahead, orient it along the
    local path tangent, run the smooth control law toward it; rotate in
    place first when the target sits far outside the heading cone
    (initial_rotation, min angle 0.75 rad) and rotate to the goal at the end
    (final_rotation), both at `rotation_scaling_factor * v_angular_max`."""

    costmap: Optional[Costmap] = None
    law: SmoothControlLaw = field(default_factory=SmoothControlLaw)
    motion_target_dist: float = 0.6
    initial_rotation: bool = True
    initial_rotation_min_angle: float = 0.75
    final_rotation: bool = True
    rotation_scaling_factor: float = 0.5
    goal_tolerance: float = 0.15

    def _motion_target(self, path_xy: np.ndarray, pose_xy: np.ndarray):
        d = np.linalg.norm(path_xy - pose_xy, axis=1)
        # search from the closest plan point FORWARD (the reference transforms
        # and prunes the plan to the robot first — without this, once the
        # robot is motion_target_dist past the plan start, the start itself
        # re-qualifies and the controller spins toward a target behind it)
        i0 = int(np.argmin(d))
        beyond = i0 + np.nonzero(d[i0:] >= self.motion_target_dist)[0]
        i = int(beyond[0]) if len(beyond) else len(path_xy) - 1
        tgt = path_xy[i]
        nxt = path_xy[min(i + 1, len(path_xy) - 1)]
        prv = path_xy[max(i - 1, 0)]
        tangent = nxt - prv
        yaw = float(np.arctan2(tangent[1], tangent[0])) if np.linalg.norm(tangent) > 1e-9 else 0.0
        return (float(tgt[0]), float(tgt[1]), yaw)

    def _rotate_command(self, angle_err: float) -> Tuple[float, float]:
        w = self.rotation_scaling_factor * self.law.v_angular_max
        return 0.0, float(np.copysign(w, angle_err))

    def compute_velocity(
        self,
        pose: Tuple[float, float, float],
        vel: Tuple[float, float],
        path: Sequence[np.ndarray],
        goal_xy: np.ndarray,
    ) -> Tuple[float, float]:
        pose_xy = np.asarray(pose[:2], np.float64)
        goal = np.asarray(goal_xy[:2], np.float64)
        if float(np.linalg.norm(goal - pose_xy)) <= self.goal_tolerance:
            return 0.0, 0.0  # position reached (final heading is the BT's
            # rotate-to-goal concern in this stack; reference final_rotation
            # spins toward the goal orientation here)
        path_xy = (
            np.asarray([p[:2] for p in path], np.float64)
            if len(path)
            else goal[None]
        )
        target = self._motion_target(path_xy, pose_xy)
        angle_to_target = _norm_angle(
            float(np.arctan2(target[1] - pose[1], target[0] - pose[0])) - pose[2]
        )
        if self.initial_rotation and abs(angle_to_target) > self.initial_rotation_min_angle:
            return self._rotate_command(angle_to_target)
        return self.law.command(target, pose)


@dataclass
class RotationShimController:
    """Rotate-then-delegate wrapper (reference
    nav2_rotation_shim_controller.cpp): while the angular distance to the
    path heading sampled `forward_sampling_distance` ahead exceeds
    `angular_dist_threshold` (0.785 = 45 deg), command a pure rotation at
    `rotate_to_heading_angular_vel`; hysteresis via
    `angular_disengage_threshold` (:210); once disengaged, every command
    comes from the wrapped primary controller."""

    primary: object  # any compute_velocity(...) controller
    angular_dist_threshold: float = 0.785
    angular_disengage_threshold: float = 0.785
    forward_sampling_distance: float = 0.5
    rotate_to_heading_angular_vel: float = 1.8
    in_rotation: bool = False

    def _sample_heading(self, path_xy: np.ndarray, pose) -> float:
        d = np.linalg.norm(path_xy - np.asarray(pose[:2], np.float64), axis=1)
        i0 = int(np.argmin(d))  # closest point forward (see _motion_target)
        beyond = i0 + np.nonzero(d[i0:] >= self.forward_sampling_distance)[0]
        pt = path_xy[int(beyond[0])] if len(beyond) else path_xy[-1]
        return float(np.arctan2(pt[1] - pose[1], pt[0] - pose[0]))

    def compute_velocity(
        self,
        pose: Tuple[float, float, float],
        vel: Tuple[float, float],
        path: Sequence[np.ndarray],
        goal_xy: np.ndarray,
    ) -> Tuple[float, float]:
        path_xy = (
            np.asarray([p[:2] for p in path], np.float64)
            if len(path)
            else np.asarray(goal_xy[:2], np.float64)[None]
        )
        err = _norm_angle(self._sample_heading(path_xy, pose) - pose[2])
        thresh = (
            self.angular_disengage_threshold
            if self.in_rotation
            else self.angular_dist_threshold
        )
        if abs(err) > thresh:
            self.in_rotation = True
            return 0.0, float(np.copysign(self.rotate_to_heading_angular_vel, err))
        self.in_rotation = False
        return self.primary.compute_velocity(pose, vel, path, goal_xy)
