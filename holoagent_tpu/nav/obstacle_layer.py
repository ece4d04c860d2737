"""Live-sensor obstacle layer: scan marking + raycast clearing into a costmap.

The role of the reference robot's obstacle_layer (reference
nav_agent/humble_localization_nav2/g1_navigation2/param/g1.yaml:137-260:
``obstacle_layer`` with ``marking: True`` / ``clearing: True`` over
``raytrace_max_range`` / ``obstacle_max_range``, composed with the static and
inflation layers by nav2_costmap_2d).  The static map alone cannot see a
person or a moved chair; live scans must mark new obstacles and clear cells
the beam passes through (an obstacle that walked away must stop costing).

Design (host-side numpy like the rest of nav/, matching the module boundary
the reference draws — costmaps live beside the controller at 10 Hz, not on
the accelerator):

  * the layer owns a persistent ``live`` occupancy grid over the SAME extent
    as the static map (a rolling window is a view of it; full-grid at these
    sizes is cheap and keeps world coordinates stable);
  * ``update(pose_xy, scan_xy)``: every beam endpoint within
    ``obstacle_max_range`` MARKS its cell; every beam CLEARS the supercover
    ray from the robot cell to the endpoint cell (endpoint exclusive), up to
    ``raytrace_max_range`` — exactly nav2's mark/clear split;
  * the combined (static | live) occupancy re-runs the inflation profile
    (Costmap.from_occupancy's exponential-decay band) and is written into the
    bound Costmap IN PLACE with ``bump_version()``, so every consumer —
    planners, DWA critics (their wavefront-field caches key on the version),
    collision monitor — sees the obstacle on the next cycle.

``simulate_scan_2d`` is the L0 sensor stand-in (SURVEY.md §4's replay/
procedural-fixture strategy): it ray-marches a TRUE-world occupancy grid and
returns world-frame endpoints, standing in for the MID-360's planar slice.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import numpy as np

from .costmap import Costmap, INSCRIBED, LETHAL


def _supercover_cells(r0: int, c0: int, r1: int, c1: int):
    """Grid cells a segment passes through (supercover Bresenham: a diagonal
    advance also yields both orthogonally-adjacent cells, so the cleared
    corridor has no diagonal leaks — same walk as theta_star._los)."""
    dr, dc = abs(r1 - r0), abs(c1 - c0)
    sr = 1 if r1 >= r0 else -1
    sc = 1 if c1 >= c0 else -1
    err = dr - dc
    r, c = r0, c0
    out = [(r, c)]
    while (r, c) != (r1, c1):
        e2 = 2 * err
        step_r = e2 > -dc
        step_c = e2 < dr
        if step_r and step_c:
            out.append((r + sr, c))
            out.append((r, c + sc))
        if step_r:
            err -= dc
            r += sr
        if step_c:
            err += dr
            c += sc
        out.append((r, c))
    return out


@dataclass
class ObstacleLayer:
    """Mark/clear layer bound to a Costmap (g1.yaml obstacle_layer role)."""

    costmap: Costmap
    static_occupied: np.ndarray  # (H, W) bool — the map the costmap was built from
    robot_radius: float = 0.3
    inflation_radius: float = 0.8
    cost_scaling: float = 3.0
    obstacle_max_range: float = 4.0   # marking range (g1.yaml obstacle_max_range)
    raytrace_max_range: float = 5.0   # clearing range (g1.yaml raytrace_max_range)
    live: np.ndarray = field(init=False)

    def __post_init__(self):
        self.live = np.zeros_like(self.static_occupied, bool)

    def _to_cell(self, xy: np.ndarray) -> Tuple[int, int]:
        rc = self.costmap.to_grid(np.asarray(xy, np.float64))
        h, w = self.static_occupied.shape
        return int(np.clip(rc[0], 0, h - 1)), int(np.clip(rc[1], 0, w - 1))

    def update(self, pose_xy: np.ndarray, scan_xy: np.ndarray) -> None:
        """Integrate one scan (world-frame endpoints, (N, 2)) taken from
        ``pose_xy`` and rebuild the bound costmap."""
        pose_xy = np.asarray(pose_xy, np.float64)[:2]
        scan_xy = np.asarray(scan_xy, np.float64).reshape(-1, 2)
        r0, c0 = self._to_cell(pose_xy)
        h, w = self.static_occupied.shape
        for p in scan_xy:
            d = float(np.linalg.norm(p - pose_xy))
            if d > self.raytrace_max_range > 0:
                # truncate the clearing ray at raytrace range, no marking
                p = pose_xy + (p - pose_xy) * (self.raytrace_max_range / d)
            r1, c1 = self._to_cell(p)
            ray = _supercover_cells(r0, c0, r1, c1)
            for r, c in ray[:-1]:
                if 0 <= r < h and 0 <= c < w:
                    self.live[r, c] = False
            # Mark only genuine HITS: a return at (or truncated to) the
            # sensor's max range is a miss, and marking it would paint a
            # phantom-obstacle arc at range around the robot every scan
            # (nav2 keeps obstacle_max_range strictly inside the sensor
            # range for the same reason, g1.yaml obstacle_max_range 2.5 vs
            # raytrace 3.0).  Skip endpoints already occupied in the static
            # map: they are lethal from the static layer, and gating them
            # keeps ``live`` meaning NEW information for consumers/telemetry.
            if d < self.obstacle_max_range * (1.0 - 1e-9) and not (
                self.static_occupied[r1, c1]
            ):
                self.live[r1, c1] = True
        self._rebuild()

    def clear(self) -> None:
        """Drop every live marking (ClearEntireCostmap over this layer)."""
        self.live[:] = False
        self._rebuild()

    def _rebuild(self) -> None:
        combined = Costmap.from_occupancy(
            self.static_occupied | self.live,
            self.costmap.origin,
            self.costmap.resolution,
            robot_radius=self.robot_radius,
            inflation_radius=self.inflation_radius,
            cost_scaling=self.cost_scaling,
        )
        self.costmap.cost[...] = combined.cost
        self.costmap.bump_version()


def simulate_scan_2d(
    occupied: np.ndarray,  # (H, W) bool TRUE-world occupancy
    origin: np.ndarray,
    resolution: float,
    pose_xy: np.ndarray,
    n_beams: int = 72,
    max_range: float = 5.0,
    hit_only: bool = False,
) -> np.ndarray:
    """Planar scan endpoints by ray-marching the true world (the L0 sensor
    stand-in; SURVEY.md §4 procedural-fixture strategy; the vectorized
    marcher is localizer.simulate_scan's).  Returns (N, 2) world endpoints —
    beam hits at the first occupied cell, misses at ``max_range`` (misses
    still matter: they CLEAR).  ``hit_only`` drops the miss endpoints (a
    sensor with no max-range return)."""
    from .localizer import simulate_scan

    pose_xy = np.asarray(pose_xy, np.float64)[:2]
    angles = np.linspace(0.0, 2.0 * np.pi, n_beams, endpoint=False)
    ranges = simulate_scan(
        occupied, np.asarray(origin, np.float64), resolution,
        np.array([pose_xy[0], pose_xy[1], 0.0]), angles, max_range=max_range,
    )
    if hit_only:
        keep = ranges < max_range - 1e-9
        angles, ranges = angles[keep], ranges[keep]
    d = np.stack([np.cos(angles), np.sin(angles)], -1)
    return pose_xy[None] + d * ranges[:, None]
