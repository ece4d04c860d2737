"""Theta* any-angle global planner (the nav2_theta_star_planner role,
reference navigation2-humble/nav2_theta_star_planner/src/theta_star.cpp).

Basic Theta*: grid A* whose expansion tries to rewire each successor straight
to its parent's parent whenever the two have line of sight, so paths hug
obstacle corners with arbitrary headings instead of 45-degree staircase
segments.  The cost model mirrors the reference:

  g(a -> b)  = w_euc_cost * |a - b|  +  LOS-accumulated traversal cost
  traversal  = w_traversal_cost * (cell/LETHAL)^2 summed along the segment
               (theta_star.cpp:198,222)
  h(c)       = w_heuristic_cost * |c - goal|      (theta_star.cpp:242)

Host-side cold-path code like the other global planners (SURVEY.md §7.5):
planning runs once per goal; the hot loop is the controller.
"""

from __future__ import annotations

import heapq
from typing import List, Optional, Tuple

import numpy as np

from .costmap import Costmap, INSCRIBED, LETHAL

_NBRS = [(-1, 0, 1.0), (1, 0, 1.0), (0, -1, 1.0), (0, 1, 1.0),
         (-1, -1, 1.41421356), (-1, 1, 1.41421356),
         (1, -1, 1.41421356), (1, 1, 1.41421356)]


def _los(cost: np.ndarray, a: Tuple[int, int], b: Tuple[int, int],
         lethal_threshold: int, w_traversal: float) -> Tuple[bool, float]:
    """Line-of-sight over grid cells (Bresenham); returns (clear, accumulated
    traversal cost along the ray).  The reference's losCheck walks the same
    supercover and sums per-cell traversal (theta_star.cpp:173-222)."""
    (r0, c0), (r1, c1) = a, b
    dr, dc = abs(r1 - r0), abs(c1 - c0)
    sr = 1 if r1 >= r0 else -1
    sc = 1 if c1 >= c0 else -1
    err = dr - dc
    r, c = r0, c0
    acc = 0.0
    n = dr + dc
    for _ in range(n + 1):
        cell = float(cost[r, c])
        if cell >= lethal_threshold:
            return False, np.inf
        acc += w_traversal * (cell / LETHAL) ** 2
        if r == r1 and c == c1:
            break
        e2 = 2 * err
        step_r = e2 > -dc
        step_c = e2 < dr
        if step_r and step_c:
            # true supercover: a diagonal advance passes between the two
            # orthogonally-adjacent cells — check both, or the ray can thread
            # the gap between two diagonally-touching lethal cells (the
            # reference's losCheck visits them, theta_star.cpp:173-222)
            for rr, cc in ((r + sr, c), (r, c + sc)):
                if float(cost[rr, cc]) >= lethal_threshold:
                    return False, np.inf
        if step_r:
            err -= dc
            r += sr
        if step_c:
            err += dr
            c += sc
    return True, acc


class ThetaStarPlanner:
    """reference nav2_theta_star_planner/theta_star_planner.cpp parameters
    (w_euc_cost 1.0, w_traversal_cost 2.0, w_heuristic_cost 1.0)."""

    def __init__(
        self,
        w_euc_cost: float = 1.0,
        w_traversal_cost: float = 2.0,
        w_heuristic_cost: float = 1.0,
        lethal_threshold: int = INSCRIBED,
        max_expansions: int = 200_000,
    ):
        self.w_euc = w_euc_cost
        self.w_trav = w_traversal_cost
        self.w_h = w_heuristic_cost
        self.lethal = lethal_threshold
        self.max_expansions = max_expansions

    def plan(
        self,
        costmap: Costmap,
        start_xy: np.ndarray,
        goal_xy: np.ndarray,
    ) -> List[np.ndarray]:
        cm = costmap.cost
        h, w = cm.shape
        sr, sc = (int(np.clip(v, 0, m - 1))
                  for v, m in zip(costmap.to_grid(start_xy), (h, w)))
        gr, gc = (int(np.clip(v, 0, m - 1))
                  for v, m in zip(costmap.to_grid(goal_xy), (h, w)))
        if cm[gr, gc] >= self.lethal:
            # snap the goal outward like the A* planner
            snapped = None
            for rad in range(1, 20):
                r0, r1 = max(0, gr - rad), min(h, gr + rad + 1)
                c0, c1 = max(0, gc - rad), min(w, gc + rad + 1)
                ok = np.argwhere(cm[r0:r1, c0:c1] < self.lethal)
                if len(ok):
                    d = np.abs(ok - [gr - r0, gc - c0]).sum(1)
                    snapped = ok[int(np.argmin(d))] + [r0, c0]
                    break
            if snapped is None:
                return []
            gr, gc = int(snapped[0]), int(snapped[1])
        if cm[sr, sc] >= self.lethal:
            return []

        start = (sr, sc)
        goal = (gr, gc)
        gsc = {start: 0.0}
        parent = {start: start}
        hq = [(self.w_h * float(np.hypot(sr - gr, sc - gc)), start)]
        closed = set()
        expansions = 0
        while hq and expansions < self.max_expansions:
            _, cur = heapq.heappop(hq)
            if cur in closed:
                continue
            closed.add(cur)
            expansions += 1
            if cur == goal:
                break
            r, c = cur
            par = parent[cur]
            for dr, dc, dist in _NBRS:
                nr, nc = r + dr, c + dc
                if not (0 <= nr < h and 0 <= nc < w):
                    continue
                cell = float(cm[nr, nc])
                if cell >= self.lethal:
                    continue
                nxt = (nr, nc)
                # path 2 (any-angle): connect straight to cur's parent when
                # visible — theta_star.cpp:87-99 setNeighbors/losCheck
                clear, los_cost = _los(cm, par, nxt, self.lethal, self.w_trav)
                if clear:
                    cand_par = par
                    g2 = (gsc[par]
                          + self.w_euc * float(np.hypot(nr - par[0], nc - par[1]))
                          + los_cost)
                else:
                    cand_par = cur
                    g2 = (gsc[cur] + self.w_euc * dist
                          + self.w_trav * (cell / LETHAL) ** 2)
                if g2 < gsc.get(nxt, np.inf):
                    gsc[nxt] = g2
                    parent[nxt] = cand_par
                    f = g2 + self.w_h * float(np.hypot(nr - gr, nc - gc))
                    heapq.heappush(hq, (f, nxt))
        if goal not in parent:
            return []
        # walk the (sparse, any-angle) vertex chain back to the start
        verts = [goal]
        node = goal
        while node != start:
            node = parent[node]
            verts.append(node)
        verts.reverse()
        return [costmap.to_world(np.asarray(v, np.float64)) for v in verts]


def theta_star_plan(
    costmap: Costmap,
    start_xy: np.ndarray,
    goal_xy: np.ndarray,
    **kw,
) -> List[np.ndarray]:
    return ThetaStarPlanner(**kw).plan(costmap, start_xy, goal_xy)
