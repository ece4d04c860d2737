"""A* global planner over the costmap (the NavFn role, reference
g1.yaml:264-270 GridBased planner)."""

from __future__ import annotations

import heapq
from typing import List, Optional

import numpy as np

from .costmap import Costmap, INSCRIBED

_NBRS = [(-1, 0, 1.0), (1, 0, 1.0), (0, -1, 1.0), (0, 1, 1.0),
         (-1, -1, 1.41421356), (-1, 1, 1.41421356),
         (1, -1, 1.41421356), (1, 1, 1.41421356)]


def astar_plan(
    costmap: Costmap,
    start_xy: np.ndarray,
    goal_xy: np.ndarray,
    lethal_threshold: int = INSCRIBED,
    cost_weight: float = 0.05,
) -> List[np.ndarray]:
    """World-coordinate path from start to goal (empty when unreachable).
    Edge cost = distance + cost_weight * cell cost (prefers low-cost corridors
    like NavFn's potential field)."""
    h, w = costmap.cost.shape
    sr, sc = costmap.to_grid(start_xy)
    gr, gc = costmap.to_grid(goal_xy)
    sr, sc = int(np.clip(sr, 0, h - 1)), int(np.clip(sc, 0, w - 1))
    gr, gc = int(np.clip(gr, 0, h - 1)), int(np.clip(gc, 0, w - 1))
    if costmap.cost[gr, gc] >= lethal_threshold:
        # snap goal to the nearest traversable cell within a small window
        best = None
        for rad in range(1, 20):
            r0, r1 = max(0, gr - rad), min(h, gr + rad + 1)
            c0, c1 = max(0, gc - rad), min(w, gc + rad + 1)
            sub = costmap.cost[r0:r1, c0:c1]
            ok = np.argwhere(sub < lethal_threshold)
            if len(ok):
                d = np.abs(ok - [gr - r0, gc - c0]).sum(1)
                best = ok[int(np.argmin(d))] + [r0, c0]
                break
        if best is None:
            return []
        gr, gc = int(best[0]), int(best[1])

    def hcost(r, c):
        return float(np.hypot(r - gr, c - gc))

    open_q = [(hcost(sr, sc), 0.0, (sr, sc))]
    g_cost = {(sr, sc): 0.0}
    parent = {}
    visited = set()
    while open_q:
        _, g, (r, c) = heapq.heappop(open_q)
        if (r, c) in visited:
            continue
        visited.add((r, c))
        if (r, c) == (gr, gc):
            path = [(r, c)]
            while path[-1] in parent:
                path.append(parent[path[-1]])
            path.reverse()
            return [costmap.to_world(np.array(p)) for p in path]
        for dr, dc, dd in _NBRS:
            nr, nc = r + dr, c + dc
            if not (0 <= nr < h and 0 <= nc < w):
                continue
            cc = costmap.cost[nr, nc]
            if cc >= lethal_threshold:
                continue
            ng = g + dd + cost_weight * float(cc)
            if ng < g_cost.get((nr, nc), np.inf):
                g_cost[(nr, nc)] = ng
                parent[(nr, nc)] = (r, c)
                heapq.heappush(open_q, (ng + hcost(nr, nc), ng, (nr, nc)))
    return []
