"""Path smoother server (the nav2_smoother role).

Rebuild of reference nav_agent/humble_localization_nav2/navigation2-humble/
nav2_smoother: `SimpleSmoother` (src/simple_smoother.cpp — iterative
data-weight / smooth-weight relaxation of the interior waypoints with a
costmap collision guard and bounded refinement passes) and
`SavitzkyGolaySmoother` (src/savitzky_golay_smoother.cpp — the 7-point
quadratic SG filter per coordinate).  `SmootherServer` selects the plugin by
name, the way nav2_smoother's server resolves its `smoother_plugins` map
(src/nav2_smoother.cpp).

Both smoothers keep the endpoints fixed and operate on (N, 2+) world-frame
waypoint arrays (extra columns — z — pass through untouched), matching the
`Sequence[np.ndarray]` plan convention of planner.astar_plan and the
controllers.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np

from .costmap import Costmap, INSCRIBED


def _as_path(path: Sequence[np.ndarray]) -> np.ndarray:
    return np.asarray([np.asarray(p, np.float64) for p in path], np.float64)


@dataclass
class SimpleSmoother:
    """Iterative 3-point relaxation (reference simple_smoother.cpp:100-190):

        y_i += w_data * (x_i - y_i) + w_smooth * (y_{i+1} + y_{i-1} - 2 y_i)

    until the per-sweep total change drops below `tolerance` (or `max_its`),
    with the reference's collision guard — any smoothed interior point whose
    costmap cost reaches the obstacle band reverts the WHOLE pass to the last
    feasible sweep — and up to 4 bounded refinement passes re-seeding the
    data term with the smoothed path (simple_smoother.cpp:184-188).
    Defaults are the reference's declared parameters (tolerance 1e-10 in
    nav2; 1e-6 here — double relaxation converges far below float path
    resolution either way)."""

    tolerance: float = 1e-6
    max_its: int = 1000
    w_data: float = 0.2
    w_smooth: float = 0.3
    do_refinement: bool = True
    max_refinements: int = 4

    def smooth(
        self, path: Sequence[np.ndarray], costmap: Optional[Costmap] = None
    ) -> np.ndarray:
        pts = _as_path(path)
        if len(pts) < 3:
            return pts
        out, data = pts.copy(), pts
        for _ in range(self.max_refinements if self.do_refinement else 1):
            ok, out = self._smooth_once(out, data, costmap)
            if not ok:
                break
            data = out  # refinement re-seeds the data term (reference :184-188)
        return out

    def _smooth_once(self, seed: np.ndarray, data: np.ndarray, costmap):
        new = seed.copy()
        last = seed.copy()
        for _ in range(self.max_its):
            prev = np.concatenate([new[:1], new[:-1]])
            nxt = np.concatenate([new[1:], new[-1:]])
            upd = new[:, :2] + (
                self.w_data * (data[:, :2] - new[:, :2])
                + self.w_smooth * (prev[:, :2] + nxt[:, :2] - 2.0 * new[:, :2])
            )
            change = float(np.abs(upd[1:-1] - new[1:-1, :2]).sum())
            new[1:-1, :2] = upd[1:-1]
            if costmap is not None:
                cost = costmap.cost_at_world(new[1:-1, :2])
                if (cost >= INSCRIBED).any():
                    # infeasible update: return the last collision-free sweep
                    # (reference simple_smoother.cpp:158-176)
                    return False, last
            last = new.copy()
            if change < self.tolerance:
                return True, new
        return False, last  # max_its exceeded (reference :121-129)


@dataclass
class SavitzkyGolaySmoother:
    """7-point quadratic Savitzky-Golay filter per coordinate (reference
    savitzky_golay_smoother.cpp:98-112 coefficients [-2, 3, 6, 7, 6, 3, -2]/21),
    with edge replication so the endpoints stay fixed, and the reference's
    optional refinement passes (`refinement_num`)."""

    do_refinement: bool = True
    refinement_num: int = 2

    _COEF = np.asarray([-2.0, 3.0, 6.0, 7.0, 6.0, 3.0, -2.0]) / 21.0

    def smooth(
        self, path: Sequence[np.ndarray], costmap: Optional[Costmap] = None
    ) -> np.ndarray:
        pts = _as_path(path)
        if len(pts) < 3:
            return pts
        out = pts.copy()
        passes = 1 + (self.refinement_num if self.do_refinement else 0)
        for _ in range(passes):
            padded = np.concatenate([out[:1].repeat(3, 0), out, out[-1:].repeat(3, 0)])
            sm = sum(
                self._COEF[k] * padded[k : k + len(out), :2] for k in range(7)
            )
            nxt = out.copy()
            nxt[1:-1, :2] = sm[1:-1]
            if costmap is not None and (
                costmap.cost_at_world(nxt[1:-1, :2]) >= INSCRIBED
            ).any():
                return out  # keep the last feasible pass
            out = nxt
        return out


class SmootherServer:
    """Named-plugin dispatch (reference nav2_smoother.cpp smoother_plugins
    map; 'simple_smoother' is the bringup default)."""

    def __init__(self, costmap: Optional[Costmap] = None, **plugin_params):
        self.costmap = costmap
        self.plugins = {
            "simple_smoother": SimpleSmoother(
                **{k: v for k, v in plugin_params.items()
                   if k in SimpleSmoother.__dataclass_fields__}
            ),
            "savitzky_golay_smoother": SavitzkyGolaySmoother(
                **{k: v for k, v in plugin_params.items()
                   if k in SavitzkyGolaySmoother.__dataclass_fields__}
            ),
        }

    def smooth_path(
        self, path: Sequence[np.ndarray], smoother_id: str = "simple_smoother"
    ) -> np.ndarray:
        try:
            plugin = self.plugins[smoother_id]
        except KeyError:
            raise KeyError(
                f"unknown smoother {smoother_id!r} "
                f"(available: {sorted(self.plugins)})"
            ) from None
        return plugin.smooth(path, self.costmap)
