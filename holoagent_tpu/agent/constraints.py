"""Motion-model constraints for the odometry state: wheel-velocity update with
Mahalanobis gating and adaptive measurement scaling, zero-velocity update
(ZUPT), and ground-plane z constraint.

Rebuilds of reference nav_agent/.../include/wheel_odometry.h:38-179
(`WheelOdometryConstraint::update_state_joint`), include/zupt.h:6-19
(`ZUPT::applyZConstraint`), and the ground-constraint role of
include/ground_detection.h — EKF-style updates on a (pos, vel, yaw) belief.
The numerics live in the native C++ runtime (native/src/constraints.cc, like
the reference's); this module is the typed state + ctypes marshalling.
"""

from __future__ import annotations

import ctypes as C
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from .. import native
from ..native import _ptr


@dataclass
class OdomState:
    """Minimal planar odometry belief: position, velocity, yaw + covariance."""

    pos: np.ndarray = field(default_factory=lambda: np.zeros(3))
    vel: np.ndarray = field(default_factory=lambda: np.zeros(3))
    yaw: float = 0.0
    cov_vel: np.ndarray = field(default_factory=lambda: np.eye(3) * 0.25)
    cov_z: float = 0.05

    # native layout: [pos(3), vel(3), yaw, cov_vel(9), cov_z] = 17 doubles
    def _pack(self) -> np.ndarray:
        return np.concatenate(
            [
                np.asarray(self.pos, np.float64),
                np.asarray(self.vel, np.float64),
                [float(self.yaw)],
                np.asarray(self.cov_vel, np.float64).reshape(9),
                [float(self.cov_z)],
            ]
        )

    def _unpack(self, st: np.ndarray) -> None:
        self.pos = st[0:3].copy()
        self.vel = st[3:6].copy()
        self.yaw = float(st[6])
        self.cov_vel = st[7:16].reshape(3, 3).copy()
        self.cov_z = float(st[16])


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
        st = state._pack()
        z = np.ascontiguousarray(wheel_vel_body, np.float64)
        ok = native.lib().wheel_update(
            _ptr(st), _ptr(z), self.r_base, self.gate, self.adaptive_scale
        )
        if not ok:
            self.rejected += 1
            return False
        state._unpack(st)
        return True


def apply_zupt(state: OdomState, accel_std: float, gyro_std: float,
               accel_thresh: float = 0.08, gyro_thresh: float = 0.02) -> bool:
    """Zero-velocity update when the IMU is quiescent (reference zupt.h:6-19):
    clamp the velocity belief to zero with tight covariance."""
    st = state._pack()
    ok = native.lib().zupt_update(
        _ptr(st), accel_std, gyro_std, accel_thresh, gyro_thresh
    )
    if ok:
        state._unpack(st)
    return bool(ok)


def ground_plane_constraint(
    state: OdomState, ground_z: float, sigma: float = 0.02
) -> None:
    """Pull the height belief onto the detected ground plane (the ERASOR-style
    ground-constraint role, reference ground_detection.h:23-50): scalar EKF
    update on z."""
    st = state._pack()
    native.lib().ground_update(_ptr(st), float(ground_z), float(sigma))
    state._unpack(st)


def estimate_ground_z(points: np.ndarray, z_band: float = 0.3) -> Optional[float]:
    """Ground height from a scan: the dominant low-z mode (histogram peak of
    the lowest band), None when no credible ground is visible."""
    pts = np.ascontiguousarray(points, np.float64)
    out = C.c_double()
    ok = native.lib().ground_estimate(_ptr(pts), len(pts), float(z_band), C.byref(out))
    return float(out.value) if ok else None
