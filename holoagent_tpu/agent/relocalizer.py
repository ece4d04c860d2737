"""Online relocalization against a prior session map.

Rebuild of the reference's pose_estimator node
(reference nav_agent/.../include/online-relo/pose_estimator.cpp:28-120 +
pose_estimator.h:152-169: load a prior session with ScanContext descriptors,
global relocalization via SC or an external initial pose, then periodic
registration of the undistorted scan against the prior map every
`relo_interval` frames, publishing the corrected pose).  Composed from the
native runtime: ScanContext for the global hypothesis, the voxel plane map's
point-to-plane registration for refinement.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

from ..memory.multisession import Session
from ..native import ScanContext, VoxelPlaneMap


def _yaw_pose(yaw: float) -> np.ndarray:
    c, s = np.cos(yaw), np.sin(yaw)
    t = np.eye(4)
    t[:2, :2] = [[c, -s], [s, c]]
    return t


@dataclass
class RelocalizerConfig:
    relo_interval: int = 10  # frames between map re-registrations
    sc_max_dist: float = 0.35
    voxel_size: float = 0.5
    min_inlier_rms: float = 0.3


class Relocalizer:
    def __init__(self, prior: Session, cfg: Optional[RelocalizerConfig] = None):
        self.cfg = cfg or RelocalizerConfig()
        self.prior = prior
        self.sc = ScanContext(20, 60, 40.0)
        for scan in prior.scans:
            self.sc.add_keyframe(self.sc.descriptor(scan))
        self.map = VoxelPlaneMap(self.cfg.voxel_size, min_points=6, planarity=0.1)
        self.map.insert(prior.world_points())
        self.t_correction = np.eye(4)  # odom frame -> prior map frame
        self.localized = False
        self._frame = 0

    # -- global relocalization ------------------------------------------------

    def global_relocalize(self, scan: np.ndarray) -> bool:
        """ScanContext global hypothesis + registration refinement
        (reference globalRelo / easyToRelo)."""
        idx, yaw, dist = self.sc.detect_loop(
            self.sc.descriptor(scan), exclude_recent=0, max_dist=self.cfg.sc_max_dist
        )
        if idx < 0:
            return False
        init = self.prior.poses[idx] @ _yaw_pose(-yaw)
        pose, rms = self.map.register(
            scan @ init[:3, :3].T + init[:3, 3], np.eye(4), iters=20
        )
        if rms > self.cfg.min_inlier_rms:
            return False
        self.t_correction = pose @ init  # scan/odom-origin -> map
        self.localized = True
        return True

    def set_initial_pose(self, pose_map: np.ndarray) -> None:
        """Manual /initialpose fallback (reference :70-83)."""
        self.t_correction = np.asarray(pose_map, np.float64)
        self.localized = True

    # -- per-frame update ------------------------------------------------------

    def update(
        self, scan: np.ndarray, odom_pose: np.ndarray
    ) -> Tuple[np.ndarray, bool]:
        """Correct an odometry pose against the prior map.

        Returns (pose in the prior map frame, refined_this_frame).  Every
        `relo_interval` frames the scan re-registers against the map and the
        odom->map correction is updated (reference relocalization() cadence)."""
        odom_pose = np.asarray(odom_pose, np.float64)
        if not self.localized:
            corrected = self.t_correction @ odom_pose
            return corrected, False
        self._frame += 1
        corrected = self.t_correction @ odom_pose
        if self._frame % self.cfg.relo_interval != 0:
            return corrected, False
        world = scan @ corrected[:3, :3].T + corrected[:3, 3]
        delta, rms = self.map.register(world, np.eye(4), iters=10)
        if rms < self.cfg.min_inlier_rms:
            self.t_correction = delta @ self.t_correction
            corrected = self.t_correction @ odom_pose
            return corrected, True
        return corrected, False
