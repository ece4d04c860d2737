"""2-D costmap with obstacle inflation (nav2_costmap_2d's role:
occupancy + inflation layers, reference g1.yaml costmap plugin config
:137-260)."""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..ops import image2d

LETHAL = 254
INSCRIBED = 253
FREE = 0


@dataclass
class Costmap:
    origin: np.ndarray  # (2,) world xy of cell (0, 0)
    resolution: float
    cost: np.ndarray  # (H, W) uint8
    # monotone mutation counter: every in-place change to ``cost`` must call
    # bump_version() — consumers (DWAController's wavefront-field cache) key
    # on it instead of hashing the whole grid every control cycle
    version: int = 0

    def bump_version(self) -> None:
        self.version += 1

    @staticmethod
    def from_occupancy(
        occupied: np.ndarray,  # (H, W) bool
        origin: np.ndarray,
        resolution: float,
        robot_radius: float = 0.3,
        inflation_radius: float = 0.8,
        cost_scaling: float = 3.0,
    ) -> "Costmap":
        """Lethal at obstacles, inscribed within the robot radius, then an
        exponential decay out to the inflation radius (the nav2 inflation
        layer's cost profile)."""
        dist = np.asarray(image2d.distance_transform(jnp.asarray(occupied))) * resolution
        cost = np.zeros(occupied.shape, np.uint8)
        decay = np.exp(-cost_scaling * (dist - robot_radius))
        band = (INSCRIBED - 1) * np.clip(decay, 0.0, 1.0)
        cost = np.where(dist <= inflation_radius, band, 0).astype(np.uint8)
        cost[dist <= robot_radius] = INSCRIBED
        cost[occupied] = LETHAL
        return Costmap(np.asarray(origin, np.float64), float(resolution), cost)

    def to_grid(self, xy: np.ndarray) -> np.ndarray:
        xy = np.asarray(xy, np.float64)
        return np.stack(
            [
                np.floor((xy[..., 1] - self.origin[1]) / self.resolution),
                np.floor((xy[..., 0] - self.origin[0]) / self.resolution),
            ],
            axis=-1,
        ).astype(np.int64)

    def to_world(self, rc: np.ndarray) -> np.ndarray:
        rc = np.asarray(rc, np.float64)
        return np.stack(
            [
                (rc[..., 1] + 0.5) * self.resolution + self.origin[0],
                (rc[..., 0] + 0.5) * self.resolution + self.origin[1],
            ],
            axis=-1,
        )

    def cost_at_world(self, xy: np.ndarray) -> np.ndarray:
        rc = self.to_grid(xy)
        h, w = self.cost.shape
        r = np.clip(rc[..., 0], 0, h - 1)
        c = np.clip(rc[..., 1], 0, w - 1)
        inb = (rc[..., 0] == r) & (rc[..., 1] == c)
        return np.where(inb, self.cost[r, c], LETHAL)

    def wavefront_distance(self, sources_xy: np.ndarray) -> np.ndarray:
        """Geodesic distance field (meters) from source cells, propagated
        through free space only — the dwb_critics map_grid.cpp wavefront that
        PathDist/GoalDist score against.  Euclidean distance is WRONG for
        these critics on any non-convex course: a detour's first step moves
        away from the goal in straight-line distance, making standing still
        the argmin (measured deadlock, round 4).  Cells at >= INSCRIBED block
        propagation (map_grid.cpp setAsObstacle); unreached cells stay +inf
        (callers apply their own fallback)."""
        h, w = self.cost.shape
        free = self.cost < INSCRIBED
        d = np.full((h, w), np.inf, np.float32)
        rc = self.to_grid(np.atleast_2d(np.asarray(sources_xy)[..., :2]))
        d[np.clip(rc[:, 0], 0, h - 1), np.clip(rc[:, 1], 0, w - 1)] = 0.0
        s2 = np.float32(np.sqrt(2.0))
        for _ in range(2 * (h + w)):
            nd = d.copy()
            nd[1:, :] = np.minimum(nd[1:, :], d[:-1, :] + 1)
            nd[:-1, :] = np.minimum(nd[:-1, :], d[1:, :] + 1)
            nd[:, 1:] = np.minimum(nd[:, 1:], d[:, :-1] + 1)
            nd[:, :-1] = np.minimum(nd[:, :-1], d[:, 1:] + 1)
            nd[1:, 1:] = np.minimum(nd[1:, 1:], d[:-1, :-1] + s2)
            nd[1:, :-1] = np.minimum(nd[1:, :-1], d[:-1, 1:] + s2)
            nd[:-1, 1:] = np.minimum(nd[:-1, 1:], d[1:, :-1] + s2)
            nd[:-1, :-1] = np.minimum(nd[:-1, :-1], d[1:, 1:] + s2)
            nd[~free] = np.inf
            if np.array_equal(nd, d):
                break
            d = nd
        return d * self.resolution

    def field_at_world(self, field: np.ndarray, xy: np.ndarray) -> np.ndarray:
        """Sample a wavefront field at world xy; out-of-bounds -> +inf."""
        rc = self.to_grid(xy)
        h, w = self.cost.shape
        r = np.clip(rc[..., 0], 0, h - 1)
        c = np.clip(rc[..., 1], 0, w - 1)
        inb = (rc[..., 0] == r) & (rc[..., 1] == c)
        return np.where(inb, field[r, c], np.inf)
