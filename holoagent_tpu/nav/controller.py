"""Trajectory-rollout local controller with a named-critic plugin registry
(the DWB role: reference g1_navigation2/param/g1.yaml:76-136 configures
dwb_core::DWBLocalPlanner as a *critic list* —
``critics: ["RotateToGoal", "Oscillation", "BaseObstacle", "GoalAlign",
"PathAlign", "PathDist", "GoalDist"]`` with per-critic ``<Name>.scale``
parameters; each critic is a dwb_critics plugin scoring every candidate
trajectory, and the controller picks the lowest-cost velocity inside the
dynamic window).

Critic semantics follow the reference plugins
(navigation2-humble/nav2_dwb_controller/dwb_critics/src/*.cpp):

  BaseObstacle   costmap cost along the trajectory; lethal/inscribed vetoes
  PathDist       distance from the trajectory end to the global plan
  GoalDist       distance from the trajectory end to the local goal
  PathAlign      PathDist evaluated at a forward point ahead of the heading
                 (``forward_point_distance``) — keeps the nose on the path
  GoalAlign      GoalDist at the same forward point
  RotateToGoal   inside the goal xy-tolerance only rotation is allowed and
                 residual heading error is scored; approaching it, linear
                 speed is damped by ``slowing_factor``
  Oscillation    vetoes sign flips of the angular command until the robot
                 has moved ``oscillation_reset_dist`` (stateful)
  PreferForward  rewards forward progress (dwb_critics/prefer_forward.cpp) —
                 not in the g1 list; available for custom configs

Config round-trip: ``DWAController.from_params(costmap, critics=[...],
params={"PathAlign.scale": 32.0, ...})`` accepts the g1.yaml keys verbatim
(scale / forward_point_distance / slowing_factor / xy_goal_tolerance).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .costmap import Costmap, INSCRIBED, LETHAL

# the g1 operating point (g1.yaml:108-119), names verbatim
G1_CRITICS: Tuple[str, ...] = (
    "RotateToGoal", "Oscillation", "BaseObstacle", "GoalAlign", "PathAlign",
    "PathDist", "GoalDist",
)
G1_CRITIC_PARAMS: Dict[str, float] = {
    "BaseObstacle.scale": 0.02,
    "PathAlign.scale": 32.0,
    "PathAlign.forward_point_distance": 0.1,
    "GoalAlign.scale": 24.0,
    "GoalAlign.forward_point_distance": 0.1,
    "PathDist.scale": 32.0,
    "GoalDist.scale": 24.0,
    "RotateToGoal.scale": 32.0,
    "RotateToGoal.slowing_factor": 5.0,
    "RotateToGoal.lookahead_time": -1.0,
}


def prune_path(path: Sequence[np.ndarray], pose_xy: np.ndarray, lookahead: int = 20):
    """Drop waypoints already passed: keep from the nearest waypoint onward
    (passed points otherwise keep attracting the path-align critic backwards)."""
    if not len(path):
        return []
    pts = np.array([p[:2] for p in path])
    i = int(np.argmin(np.linalg.norm(pts - np.asarray(pose_xy)[:2], axis=1)))
    return list(path[i : i + lookahead])


# ---------------------------------------------------------------------------
# Critic plugins
# ---------------------------------------------------------------------------


class Critic:
    """One trajectory-scoring plugin.  ``prepare`` runs once per control
    cycle with the shared context; ``score`` runs per candidate trajectory
    and returns a cost (np.inf = veto, like dwb's illegal-trajectory
    exceptions)."""

    def __init__(self, scale: float = 1.0, **_params):
        self.scale = float(scale)

    def prepare(self, ctx: dict) -> None:  # pragma: no cover - trivial
        self.ctx = ctx

    def score(self, traj: np.ndarray, v: float, w: float) -> float:
        raise NotImplementedError

    def on_command(self, v: float, w: float) -> None:
        """Called with the chosen command (stateful critics)."""


class BaseObstacleCritic(Critic):
    """Mean costmap cost along the trajectory, inscribed/lethal poses veto
    (dwb_critics/base_obstacle.cpp scorePose; mean instead of per-pose sum so
    the score is horizon-length invariant).  EXCEPT when the robot is already
    inside the inscribed band: then only LETHAL contact vetoes and band cells
    carry a steep soft penalty instead — the reference frees a banded robot
    with the recovery server's BackUp/Spin, but the stock trees here only
    carry costmap-clear + wait recoveries (bt_xml.py), so the critic itself
    must keep an escape gradient (vetoing everything freezes the command at
    zero and deadlocks, measured round 4)."""

    def __init__(self, scale: float = 1.0, inscribed_scale: float = 50.0,
                 **params):
        super().__init__(scale, **params)
        self.inscribed_scale = float(inscribed_scale)

    def prepare(self, ctx):
        self.ctx = ctx
        self.costmap: Costmap = ctx["costmap"]
        pose_xy = np.asarray(ctx["pose"][:2], np.float64)
        self.in_band = bool(
            self.costmap.cost_at_world(pose_xy[None]).max(initial=0) >= INSCRIBED
        )

    def score(self, traj, v, w):
        costs = self.costmap.cost_at_world(traj[:, :2])
        veto = LETHAL if self.in_band else INSCRIBED
        if costs.max(initial=0) >= veto:
            return np.inf
        return self.scale * float(costs.mean()) + self.inscribed_scale * float(
            (costs >= INSCRIBED).mean()
        )


def _finite_max(field: np.ndarray) -> float:
    v = field[np.isfinite(field)]
    return float(v.max()) if len(v) else 0.0


def _grid_score(ctx, field_key: str, sources_key: str, xy: np.ndarray) -> float:
    """Wavefront-field lookup with a smooth fallback for unreached cells:
    finite field max + Euclidean distance to the nearest source — unreached
    endpoints stay strongly disfavored but keep a usable gradient (dwb's
    stop_on_failure=false role)."""
    cm: Costmap = ctx["costmap"]
    v = float(cm.field_at_world(ctx[field_key], xy))
    if np.isfinite(v):
        return v
    fmax = ctx[field_key + "_max"]
    return fmax + float(np.min(np.linalg.norm(xy - ctx[sources_key], axis=-1)))


class PathDistCritic(Critic):
    """Geodesic distance from the trajectory endpoint to the global plan
    (dwb_critics/path_dist.cpp scoring the map_grid wavefront propagated from
    every plan cell through free space)."""

    def score(self, traj, v, w):
        return self.scale * _grid_score(self.ctx, "path_field", "path_pts",
                                        traj[-1, :2])


class GoalDistCritic(Critic):
    """Geodesic distance from the trajectory endpoint to the local goal
    (dwb_critics/goal_dist.cpp over the map_grid wavefront — NOT Euclidean:
    on a detour course the straight-line distance to the goal makes standing
    still the argmin)."""

    def score(self, traj, v, w):
        return self.scale * _grid_score(self.ctx, "goal_field", "goal_pts",
                                        traj[-1, :2])


class _ForwardPointMixin:
    def __init__(self, scale: float = 1.0, forward_point_distance: float = 0.1,
                 **params):
        super().__init__(scale, **params)
        self.forward_point_distance = float(forward_point_distance)

    def _forward_point(self, traj):
        x, y, yaw = traj[-1]
        d = self.forward_point_distance
        return np.array([x + d * np.cos(yaw), y + d * np.sin(yaw)])


class PathAlignCritic(_ForwardPointMixin, Critic):
    """PathDist scored at a point ``forward_point_distance`` ahead of the
    endpoint heading (dwb_critics/path_align.cpp getScale/scorePose) — a
    trajectory whose *nose* points along the plan outranks one that merely
    ends near it."""

    def score(self, traj, v, w):
        return self.scale * _grid_score(self.ctx, "path_field", "path_pts",
                                        self._forward_point(traj))


class GoalAlignCritic(_ForwardPointMixin, Critic):
    """GoalDist at the forward point (dwb_critics/goal_align.cpp)."""

    def score(self, traj, v, w):
        return self.scale * _grid_score(self.ctx, "goal_field", "goal_pts",
                                        self._forward_point(traj))


class RotateToGoalCritic(Critic):
    """Inside the goal xy-tolerance, only in-place rotation is legal and the
    residual heading error toward the final plan direction is scored; in the
    slowing band just outside it, linear speed is capped by
    v_max / slowing_factor (dwb_critics/rotate_to_goal.cpp)."""

    def __init__(self, scale: float = 1.0, slowing_factor: float = 5.0,
                 xy_goal_tolerance: float = 0.25, lookahead_time: float = -1.0,
                 trans_stopped_velocity: float = 0.25, **params):
        super().__init__(scale, **params)
        self.slowing_factor = float(slowing_factor)
        self.xy_goal_tolerance = float(xy_goal_tolerance)
        self.trans_stopped_velocity = float(trans_stopped_velocity)

    def prepare(self, ctx):
        self.ctx = ctx
        pose = np.asarray(ctx["pose"][:2])
        self.dist = float(np.linalg.norm(pose - ctx["goal_xy"]))
        # desired terminal heading: along the last plan segment (the plan
        # carries no yaw; dwb uses the goal pose yaw)
        pts = ctx["path_pts"]
        if len(pts) >= 2:
            seg = pts[-1] - pts[-2]
        else:
            seg = ctx["goal_xy"] - pose
        self.goal_yaw = float(np.arctan2(seg[1], seg[0])) if np.linalg.norm(seg) > 1e-9 else None

    def score(self, traj, v, w):
        if self.dist > 2.0 * self.xy_goal_tolerance:
            return 0.0  # not in play yet
        if self.dist > self.xy_goal_tolerance:
            # slowing band: damp linear speed approaching the goal
            v_cap = self.ctx["v_max"] / self.slowing_factor
            return self.scale * max(0.0, v - v_cap)
        if abs(v) > self.trans_stopped_velocity:
            return np.inf  # must rotate in place at the goal
        if self.goal_yaw is None:
            return 0.0
        err = abs(_ang_diff(traj[-1, 2], self.goal_yaw))
        return self.scale * err


class OscillationCritic(Critic):
    """Vetoes reversing the angular command's sign until the robot has moved
    ``oscillation_reset_dist`` since the sign was set
    (dwb_critics/oscillation.cpp CommandTrend) — kills door-way dithering."""

    def __init__(self, scale: float = 1.0, oscillation_reset_dist: float = 0.05,
                 min_speed: float = 0.05, **params):
        super().__init__(scale, **params)
        self.reset_dist = float(oscillation_reset_dist)
        self.min_speed = float(min_speed)
        self._sign = 0
        self._anchor: Optional[np.ndarray] = None

    def prepare(self, ctx):
        self.ctx = ctx
        pose = np.asarray(ctx["pose"][:2], np.float64)
        if self._anchor is not None and (
            np.linalg.norm(pose - self._anchor) >= self.reset_dist
        ):
            self._sign, self._anchor = 0, None

    def score(self, traj, v, w):
        if self._sign and np.sign(w) == -self._sign and abs(w) > 1e-6:
            return np.inf
        return 0.0

    def on_command(self, v, w):
        if self._sign == 0 and abs(w) > self.min_speed:
            self._sign = int(np.sign(w))
            self._anchor = np.asarray(self.ctx["pose"][:2], np.float64).copy()


class PreferForwardCritic(Critic):
    """Rewards forward speed (dwb_critics/prefer_forward.cpp role): cost
    rises as v falls below v_max."""

    def score(self, traj, v, w):
        return self.scale * (self.ctx["v_max"] - v)


def _ang_diff(a: float, b: float) -> float:
    return (a - b + np.pi) % (2 * np.pi) - np.pi


CRITICS: Dict[str, type] = {
    "BaseObstacle": BaseObstacleCritic,
    "PathDist": PathDistCritic,
    "GoalDist": GoalDistCritic,
    "PathAlign": PathAlignCritic,
    "GoalAlign": GoalAlignCritic,
    "RotateToGoal": RotateToGoalCritic,
    "Oscillation": OscillationCritic,
    "PreferForward": PreferForwardCritic,
}


def build_critics(
    names: Sequence[str], params: Optional[Dict[str, float]] = None
) -> List[Critic]:
    """Instantiate a critic list from g1.yaml-style dotted params
    (``"PathAlign.scale": 32.0``) — unknown critic names raise, mirroring
    pluginlib's load failure."""
    params = params or {}
    out = []
    for name in names:
        if name not in CRITICS:
            raise ValueError(f"unknown critic {name!r} (have {sorted(CRITICS)})")
        kw = {
            key.split(".", 1)[1]: val
            for key, val in params.items()
            if key.startswith(name + ".")
        }
        out.append(CRITICS[name](**kw))
    return out


# ---------------------------------------------------------------------------
# Controller
# ---------------------------------------------------------------------------


@dataclass
class DWAController:
    """Dynamic-window search over (v, w) samples, scored by the critic list
    (reference dwb_core::DWBLocalPlanner::computeVelocityCommands:
    prepare critics -> generate trajectories -> sum critic scores -> argmin)."""

    costmap: Costmap
    v_max: float = 0.5
    w_max: float = 1.0
    accel_v: float = 0.5
    accel_w: float = 1.5
    dt: float = 0.1
    horizon: float = 1.5
    n_v: int = 6
    n_w: int = 11
    critics: Sequence[str] = G1_CRITICS
    critic_params: Dict[str, float] = field(
        default_factory=lambda: dict(G1_CRITIC_PARAMS)
    )

    def __post_init__(self):
        self._critics = build_critics(self.critics, self.critic_params)
        self._field_cache: Dict[str, tuple] = {}

    def _cached_field(self, key: str, sources: np.ndarray) -> np.ndarray:
        """Per-cycle wavefront fields, recomputed only when the sources or
        the costmap change (the goal field is stable across a whole goal;
        the path field until the next replan).

        Keyed on (costmap identity, Costmap.version, sources bytes) — NOT a
        hash of the full cost grid (hashing HxW bytes every 10 Hz cycle costs
        more than it saves, and storing only the hash lets a collision reuse
        a stale O(HW·(H+W)) wavefront silently).  The cache entry keeps a
        reference to the costmap so ``id()`` cannot be recycled."""
        cm = self.costmap
        k = (id(cm), cm.version, sources.tobytes())
        hit = self._field_cache.get(key)
        if hit is not None and hit[0] == k:
            return hit[2]
        field = cm.wavefront_distance(sources)
        self._field_cache[key] = (k, cm, field)
        return field

    @classmethod
    def from_params(cls, costmap: Costmap, critics: Sequence[str],
                    params: Optional[Dict[str, float]] = None, **kw):
        """g1.yaml round-trip constructor: the YAML's ``critics`` list and
        dotted per-critic parameter keys, verbatim."""
        return cls(costmap, critics=tuple(critics),
                   critic_params=dict(params or {}), **kw)

    def critic_names(self) -> List[str]:
        return [type(c).__name__.removesuffix("Critic") for c in self._critics]

    def _rollout(self, pose, v, w):
        """Unicycle rollout: (T, 3) states (x, y, yaw)."""
        steps = int(self.horizon / self.dt)
        x, y, yaw = pose
        out = np.zeros((steps, 3))
        for i in range(steps):
            x += v * np.cos(yaw) * self.dt
            y += v * np.sin(yaw) * self.dt
            yaw += w * self.dt
            out[i] = (x, y, yaw)
        return out

    def compute_velocity(
        self,
        pose: Tuple[float, float, float],  # x, y, yaw
        vel: Tuple[float, float],  # current (v, w)
        path: Sequence[np.ndarray],  # global plan waypoints (world xy[z])
        goal_xy: np.ndarray,
    ) -> Tuple[float, float]:
        """Best (v, w) inside the dynamic window; (0, 0) when every rollout
        is vetoed (the caller should then trigger recovery/replan)."""
        v0, w0 = vel
        vs = np.linspace(
            max(0.0, v0 - self.accel_v), min(self.v_max, v0 + self.accel_v), self.n_v
        )
        ws = np.linspace(
            max(-self.w_max, w0 - self.accel_w),
            min(self.w_max, w0 + self.accel_w),
            self.n_w,
        )
        # the wavefront field is keyed on the FULL plan (stable until the
        # next replan); the critics' alignment points are pruned at score
        # time — pruning before the field would slide the cache key every
        # cycle and recompute the O(HW·(H+W)) wavefront each tick
        pts_all = np.array([p[:2] for p in path]) if len(path) else goal_xy[None, :2]
        pruned = prune_path(path, np.asarray(pose[:2], np.float64))
        pts = np.array([p[:2] for p in pruned]) if len(pruned) else pts_all
        goal_pts = np.asarray(goal_xy[:2], np.float64)[None]
        path_field = self._cached_field("path", pts_all)
        goal_field = self._cached_field("goal", goal_pts)
        ctx = {
            "costmap": self.costmap,
            "pose": pose,
            "vel": vel,
            "path_pts": pts,
            "goal_xy": np.asarray(goal_xy[:2], np.float64),
            "v_max": self.v_max,
            # map_grid wavefront fields (geodesic, meters) + finite maxima
            # for the unreached-cell fallback in _grid_score
            "path_field": path_field,
            "goal_field": goal_field,
            "path_field_max": _finite_max(path_field),
            "goal_field_max": _finite_max(goal_field),
            "goal_pts": goal_pts,
        }
        for c in self._critics:
            c.prepare(ctx)
        best, best_cmd = np.inf, (0.0, 0.0)
        for v in vs:
            for w in ws:
                traj = self._rollout(pose, v, w)
                score = 0.0
                for c in self._critics:
                    score += c.score(traj, v, w)
                    if not np.isfinite(score):
                        break
                if score < best:
                    best, best_cmd = score, (float(v), float(w))
        for c in self._critics:
            c.on_command(*best_cmd)
        return best_cmd
