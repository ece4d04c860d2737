"""Motion-model constraints for the odometry state: wheel-velocity update with
Mahalanobis gating and adaptive measurement scaling, zero-velocity update
(ZUPT), and ground-plane z constraint.

Host-side rebuilds of reference nav_agent/.../include/wheel_odometry.h:38-179
(`WheelOdometryConstraint::update_state_joint`), include/zupt.h:6-19
(`ZUPT::applyZConstraint`), and the ground-constraint role of
include/ground_detection.h — expressed as small EKF-style updates on a
(pos, vel, yaw) state with covariance.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import numpy as np


@dataclass
class OdomState:
    """Minimal planar odometry belief: position, velocity, yaw + covariance."""

    pos: np.ndarray = field(default_factory=lambda: np.zeros(3))
    vel: np.ndarray = field(default_factory=lambda: np.zeros(3))
    yaw: float = 0.0
    cov_vel: np.ndarray = field(default_factory=lambda: np.eye(3) * 0.25)
    cov_z: float = 0.05


class WheelOdometryConstraint:
    """Fuse body-frame wheel velocity into the velocity belief.

    Mahalanobis gate rejects inconsistent measurements outright; measurements
    inside the gate but unusually large inflate R adaptively (slip), matching
    the reference's joint update semantics."""

    def __init__(
        self,
        r_base: float = 0.04,
        gate: float = 9.0,  # chi-square-ish gate on 3 dof
        adaptive_scale: float = 4.0,
    ):
        self.r_base = r_base
        self.gate = gate
        self.adaptive_scale = adaptive_scale
        self.rejected = 0

    def update(self, state: OdomState, wheel_vel_body: np.ndarray) -> bool:
        c, s = np.cos(state.yaw), np.sin(state.yaw)
        r_wb = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
        z = r_wb @ np.asarray(wheel_vel_body, np.float64)  # world-frame measurement
        innov = z - state.vel
        r = np.eye(3) * self.r_base
        s_mat = state.cov_vel + r
        m2 = float(innov @ np.linalg.solve(s_mat, innov))
        if m2 > self.gate * self.adaptive_scale:
            self.rejected += 1
            return False
        if m2 > self.gate:  # soft outlier: inflate R (adaptive scaling)
            r = r * (m2 / self.gate)
            s_mat = state.cov_vel + r
        k = state.cov_vel @ np.linalg.inv(s_mat)
        state.vel = state.vel + k @ innov
        state.cov_vel = (np.eye(3) - k) @ state.cov_vel
        return True


def apply_zupt(state: OdomState, accel_std: float, gyro_std: float,
               accel_thresh: float = 0.08, gyro_thresh: float = 0.02) -> bool:
    """Zero-velocity update when the IMU is quiescent (reference zupt.h:6-19):
    clamp the velocity belief to zero with tight covariance."""
    if accel_std > accel_thresh or gyro_std > gyro_thresh:
        return False
    state.vel = np.zeros(3)
    state.cov_vel = np.eye(3) * 1e-4
    return True


def ground_plane_constraint(
    state: OdomState, ground_z: float, sigma: float = 0.02
) -> None:
    """Pull the height belief onto the detected ground plane (the ERASOR-style
    ground-constraint role, reference ground_detection.h:23-50): scalar EKF
    update on z."""
    s = state.cov_z + sigma**2
    k = state.cov_z / s
    state.pos[2] += k * (ground_z - state.pos[2])
    state.cov_z *= 1 - k


def estimate_ground_z(points: np.ndarray, z_band: float = 0.3) -> Optional[float]:
    """Ground height from a scan: the dominant low-z mode (histogram peak of
    the lowest band), None when no credible ground is visible."""
    if len(points) < 50:
        return None
    z = points[:, 2]
    lo = np.percentile(z, 2)
    band = z[(z >= lo) & (z <= lo + z_band)]
    if len(band) < 30:
        return None
    hist, edges = np.histogram(band, bins=20)
    return float(edges[int(np.argmax(hist))] + (edges[1] - edges[0]) / 2)
