"""Smac-role kinematically-feasible planner: hybrid-A* over arc primitives.

The role of the reference's nav2_smac_planner (SmacPlannerHybrid: search over
(x, y, heading) with constant-curvature motion primitives, obstacle-aware
heuristic, turning/reversing penalties — reference
nav_agent/humble_localization_nav2/navigation2-humble/nav2_smac_planner/)
rebuilt host-side on this package's costmap:

  * motion primitives: straight / min-radius left / min-radius right arcs of
    fixed length, optionally in reverse (the Hybrid node expansion);
  * closed set on a (row, col, heading-bin) lattice;
  * heuristic = max(obstacle heuristic, distance): the obstacle heuristic is
    a Dijkstra cost-to-goal field over the 2-D costmap (nav2's
    "obstacle heuristic"), the distance term keeps it admissible for the
    non-holonomic metric;
  * cost penalties for turning, reversing, and direction changes (the
    reference's penalty knobs).

Unlike the grid A* in planner.py (NavFn role), every returned pose sequence
is drivable by a robot with the given minimum turning radius; the path
carries headings.
"""

from __future__ import annotations

import heapq
import math
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from .costmap import Costmap, INSCRIBED


def _dijkstra_to_goal(cm: Costmap, goal_rc: Tuple[int, int]) -> np.ndarray:
    """Cost-to-goal field over traversable cells (the obstacle heuristic)."""
    h, w = cm.cost.shape
    dist = np.full((h, w), np.inf, np.float64)
    gr, gc = goal_rc
    if not (0 <= gr < h and 0 <= gc < w) or cm.cost[gr, gc] >= INSCRIBED:
        return dist
    dist[gr, gc] = 0.0
    pq = [(0.0, gr, gc)]
    moves = [(-1, 0, 1.0), (1, 0, 1.0), (0, -1, 1.0), (0, 1, 1.0),
             (-1, -1, math.sqrt(2)), (-1, 1, math.sqrt(2)),
             (1, -1, math.sqrt(2)), (1, 1, math.sqrt(2))]
    while pq:
        d, r, c = heapq.heappop(pq)
        if d > dist[r, c]:
            continue
        for dr, dc, step in moves:
            nr, nc = r + dr, c + dc
            if not (0 <= nr < h and 0 <= nc < w):
                continue
            cost = cm.cost[nr, nc]
            if cost >= INSCRIBED:
                continue
            nd = d + step * (1.0 + 2.0 * cost / 255.0)
            if nd < dist[nr, nc]:
                dist[nr, nc] = nd
                heapq.heappush(pq, (nd, nr, nc))
    return dist


@dataclass
class SmacHybridPlanner:
    """Hybrid-A* planner over (x, y, theta) with arc motion primitives."""

    costmap: Costmap
    min_radius: float = 0.4          # minimum turning radius (m)
    step: float = 0.15               # primitive arc length (m)
    n_theta: int = 36                # heading bins
    allow_reverse: bool = True
    turn_penalty: float = 1.2        # multiplier on curved primitives
    reverse_penalty: float = 2.0     # multiplier on reverse primitives
    change_penalty: float = 0.3      # added on forward<->reverse switches
    cost_weight: float = 2.0         # costmap cost -> path cost coupling
    goal_xy_tol: float = 0.25        # m
    goal_yaw_tol: float = math.pi / 6
    max_expansions: int = 200000

    def plan(
        self,
        start: Tuple[float, float, float],  # x, y, yaw
        goal: Tuple[float, float, float],
    ) -> Optional[List[np.ndarray]]:
        """Returns a list of (x, y, yaw) waypoints (kinematically drivable:
        consecutive headings differ by at most step/min_radius), or None."""
        cm = self.costmap
        h, w = cm.cost.shape
        res = cm.resolution
        sx, sy, syaw = float(start[0]), float(start[1]), float(start[2])
        gx, gy, gyaw = float(goal[0]), float(goal[1]), float(goal[2])
        grc = cm.to_grid(np.array([gx, gy]))
        heur = _dijkstra_to_goal(cm, (int(grc[0]), int(grc[1])))
        src = cm.to_grid(np.array([sx, sy]))
        if not (0 <= src[0] < h and 0 <= src[1] < w):
            return None
        if not np.isfinite(heur[int(src[0]), int(src[1])]):
            return None  # goal unreachable even holonomically

        dth = self.step / self.min_radius  # heading change of a turning arc
        # primitives: (curvature sign, direction); arc of length `step`
        prims = [(0.0, +1), (+1.0, +1), (-1.0, +1)]
        if self.allow_reverse:
            prims += [(0.0, -1), (+1.0, -1), (-1.0, -1)]

        def theta_bin(t: float) -> int:
            return int((t % (2 * math.pi)) / (2 * math.pi) * self.n_theta) % self.n_theta

        def hval(x: float, y: float) -> float:
            rc = cm.to_grid(np.array([x, y]))
            r, c = int(rc[0]), int(rc[1])
            if not (0 <= r < h and 0 <= c < w):
                return float("inf")
            hd = heur[r, c] * res
            eu = math.hypot(gx - x, gy - y)
            return max(hd if np.isfinite(hd) else float("inf"), eu)

        start_key = (int(src[0]), int(src[1]), theta_bin(syaw), 1)
        # node: (f, g, x, y, yaw, dir, parent_index); parents in a flat list
        nodes: List[Tuple[float, float, float, int, int]] = [
            (sx, sy, syaw, +1, -1)
        ]
        pq = [(hval(sx, sy), 0.0, 0)]
        best_g = {start_key: 0.0}
        expansions = 0
        while pq and expansions < self.max_expansions:
            f, g, ni = heapq.heappop(pq)
            x, y, yaw, dirn, _ = nodes[ni]
            # goal test
            if (math.hypot(gx - x, gy - y) < self.goal_xy_tol
                    and abs((yaw - gyaw + math.pi) % (2 * math.pi) - math.pi)
                    < self.goal_yaw_tol):
                path = []
                i = ni
                while i >= 0:
                    nx, ny, nyaw, _, parent = nodes[i]
                    path.append(np.array([nx, ny, nyaw]))
                    i = parent
                return path[::-1]
            expansions += 1
            for curv, nd in prims:
                L = self.step * nd
                if abs(curv) < 1e-9:
                    nx = x + L * math.cos(yaw)
                    ny = y + L * math.sin(yaw)
                    nyaw = yaw
                else:
                    k = curv / self.min_radius
                    nyaw = yaw + k * L
                    nx = x + (math.sin(nyaw) - math.sin(yaw)) / k
                    ny = y - (math.cos(nyaw) - math.cos(yaw)) / k
                rc = cm.to_grid(np.array([nx, ny]))
                r, c = int(rc[0]), int(rc[1])
                if not (0 <= r < h and 0 <= c < w):
                    continue
                cell = cm.cost[r, c]
                if cell >= INSCRIBED:
                    continue
                # mid-arc collision probe
                mrc = cm.to_grid(np.array([(x + nx) / 2, (y + ny) / 2]))
                if cm.cost[int(mrc[0]), int(mrc[1])] >= INSCRIBED:
                    continue
                step_cost = self.step
                if abs(curv) > 1e-9:
                    step_cost *= self.turn_penalty
                if nd < 0:
                    step_cost *= self.reverse_penalty
                if nd != dirn:
                    step_cost += self.change_penalty
                step_cost += self.cost_weight * (cell / 255.0) * self.step
                ng = g + step_cost
                key = (r, c, theta_bin(nyaw), nd)
                if ng >= best_g.get(key, float("inf")):
                    continue
                best_g[key] = ng
                nodes.append((nx, ny, nyaw, nd, ni))
                hv = hval(nx, ny)
                if not np.isfinite(hv):
                    continue
                heapq.heappush(pq, (ng + hv, ng, len(nodes) - 1))
        return None


def smac_plan(
    cm: Costmap,
    start_xy: np.ndarray,
    goal_xy: np.ndarray,
    start_yaw: float = 0.0,
    goal_yaw: Optional[float] = None,
    **kw,
) -> Optional[List[np.ndarray]]:
    """astar_plan-shaped convenience wrapper: goal heading defaults to the
    bearing from start to goal; relaxes the heading tolerance when no
    heading is requested."""
    if goal_yaw is None:
        d = np.asarray(goal_xy, np.float64) - np.asarray(start_xy, np.float64)
        goal_yaw = math.atan2(d[1], d[0])
        kw.setdefault("goal_yaw_tol", math.pi)
    planner = SmacHybridPlanner(cm, **kw)
    return planner.plan(
        (float(start_xy[0]), float(start_xy[1]), start_yaw),
        (float(goal_xy[0]), float(goal_xy[1]), float(goal_yaw)),
    )
