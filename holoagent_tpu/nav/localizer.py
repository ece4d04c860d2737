"""Adaptive Monte-Carlo particle-filter localizer (the nav2_amcl role).

Rebuild of the probabilistic localization capability the reference vendors in
ROS 2 Nav2 (reference nav_agent/humble_localization_nav2/navigation2-humble/
nav2_amcl/src/amcl_node.cpp and its pf/ library): a particle filter over the
occupancy map with

  * the sampled ODOMETRY motion model (rot1/trans/rot2 with alpha1..4 noise,
    nav2_amcl motion_model/differential_motion_model.cpp),
  * the LIKELIHOOD-FIELD measurement model (z_hit Gaussian around the
    distance-to-nearest-obstacle + z_rand uniform floor,
    nav2_amcl sensors/laser/likelihood_field_model.cpp),
  * low-variance resampling with the w_slow / w_fast ADAPTIVE recovery of
    classic AMCL: when short-term likelihood collapses relative to long-term
    (kidnapped robot), a fraction of particles re-seeds uniformly over free
    space (amcl_node.cpp resampleParticles, recovery_alpha_slow/fast params).

Everything is vectorized numpy over the (N, 3) particle array — this is
host-side robot control (SURVEY.md north star keeps the nav layer off-device);
the only array dependency is the costmap's distance transform, computed once
on-device by ops/image2d like the costmap inflation layer.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import numpy as np

from .costmap import Costmap, LETHAL


def _wrap(a):
    return np.arctan2(np.sin(a), np.cos(a))


def _march_rays(
    occupied: np.ndarray,
    origin: np.ndarray,
    resolution: float,
    starts: np.ndarray,  # (R, 2) world xy
    headings: np.ndarray,  # (R,) world-frame ray angles
    max_range: float,
) -> np.ndarray:
    """Vectorized grid ray-march: (R,) first-hit ranges (max_range if none)."""
    h, w = occupied.shape
    step = resolution * 0.5
    n_steps = int(max_range / step)
    dirs = np.stack([np.cos(headings), np.sin(headings)], axis=-1)
    out = np.full(len(starts), max_range, np.float64)
    alive = np.ones(len(starts), bool)
    for si in range(1, n_steps + 1):
        q = starts + dirs * (si * step)
        c = np.floor((q[:, 0] - origin[0]) / resolution).astype(np.int64)
        r = np.floor((q[:, 1] - origin[1]) / resolution).astype(np.int64)
        inb = (r >= 0) & (r < h) & (c >= 0) & (c < w)
        hit = alive & (
            ~inb | occupied[np.clip(r, 0, h - 1), np.clip(c, 0, w - 1)]
        )
        out[hit] = si * step
        alive &= ~hit
        if not alive.any():
            break
    return out


def simulate_scan(
    occupied: np.ndarray,  # (H, W) bool
    origin: np.ndarray,  # world xy of cell (0, 0)
    resolution: float,
    pose: np.ndarray,  # (3,) x, y, yaw
    angles: np.ndarray,  # (B,) beam angles in the robot frame
    max_range: float = 8.0,
) -> np.ndarray:
    """Grid ray-march range scan (the test fixture's laser; Nav2 gets real
    scans).  Returns (B,) ranges, max_range where no hit."""
    starts = np.broadcast_to(np.asarray(pose[:2], np.float64), (len(angles), 2))
    return _march_rays(
        occupied, origin, resolution, starts, pose[2] + angles, max_range
    )


@dataclass
class ParticleLocalizer:
    costmap: Costmap
    occupied: np.ndarray  # (H, W) bool static map (for the likelihood field)
    n_particles: int = 800
    # odometry noise (nav2_amcl alpha1..alpha4 defaults 0.2)
    alpha1: float = 0.1  # rot -> rot
    alpha2: float = 0.1  # trans -> rot
    alpha3: float = 0.1  # trans -> trans
    alpha4: float = 0.1  # rot -> trans
    # sensor model (nav2_amcl laser_model_type: "beam" | "likelihood_field").
    # "beam" compares measured vs EXPECTED ranges from a precomputed
    # (free-cell x yaw-bin) raycast table — immune to the likelihood field's
    # aliasing (endpoints from a wrong pose landing near unrelated walls
    # score well under the field; their ranges cannot match).
    model: str = "beam"
    n_yaw_bins: int = 90
    sigma_range: float = 0.35  # beam-model range std (absorbs bin quantization)
    # likelihood field (nav2_amcl z_hit 0.5, z_rand 0.5, sigma_hit 0.2).
    # The Gaussian is UNNORMALIZED (p in [z_rand/max_range, ~z_hit]) so the
    # absolute fit_floor below is meaningful at every sigma.
    z_hit: float = 0.7
    z_rand: float = 0.3
    sigma_hit: float = 0.2
    # sensor-resolution annealing: while the filter is in its global phase
    # (particle count above n_particles) the field widens by this factor —
    # a broad basin lets uniformly injected particles near the true pose
    # survive long enough to take over; tracking then sharpens back down
    sigma_global_scale: float = 2.5
    max_range: float = 8.0
    # adaptive recovery (nav2_amcl recovery_alpha_slow/fast)
    alpha_slow: float = 0.05
    alpha_fast: float = 0.5
    # absolute-fit injection: while the geometric-mean per-beam likelihood
    # stays below fit_floor (scan does not match the map anywhere near the
    # particle cloud — wrong mode or kidnapped), keep re-seeding this
    # fraction uniformly.  Augmented MCL's ratio test alone cannot escape a
    # stable wrong mode whose fit is mediocre but CONSTANT (ratio ~ 1).
    fit_floor: float = 0.55
    unfit_inject: float = 0.15
    # min/max particle adaptation (nav2_amcl min_particles/max_particles):
    # global localization runs at n_global until the cloud both converges
    # (small spread) and FITS (w_fast above floor), then tracking shrinks to
    # n_particles; losing the fit grows the set back.
    n_global: int = 4000
    converged_spread: float = 0.7
    seed: int = 0
    particles: np.ndarray = field(init=False)  # (N, 3)
    weights: np.ndarray = field(init=False)  # (N,)

    def __post_init__(self):
        self.rng = np.random.default_rng(self.seed)
        self.w_slow = 0.0
        self.w_fast = 0.0
        # likelihood field: distance to nearest obstacle per cell
        import jax.numpy as jnp

        from ..ops import image2d

        self._dist = (
            np.asarray(image2d.distance_transform(jnp.asarray(self.occupied)))
            * self.costmap.resolution
        )
        free = np.argwhere(~self.occupied & (self.costmap.cost < LETHAL))
        self._free_cells = free
        if self.model == "beam":
            self._build_range_table()
        self.global_init()

    def _build_range_table(self) -> None:
        """Precompute expected ranges from every free cell in n_yaw_bins
        directions (one vectorized march; ~free_cells x bins rays)."""
        h, w = self.occupied.shape
        free = np.argwhere(~self.occupied)
        self._cell_id = np.full((h, w), -1, np.int64)
        self._cell_id[free[:, 0], free[:, 1]] = np.arange(len(free))
        centers = self.costmap.to_world(free)  # (C, 2)
        bins = np.arange(self.n_yaw_bins) * (2 * np.pi / self.n_yaw_bins)
        starts = np.repeat(centers, self.n_yaw_bins, axis=0)
        headings = np.tile(bins, len(free))
        r = _march_rays(
            self.occupied, self.costmap.origin, self.costmap.resolution,
            starts, headings, self.max_range,
        )
        self._range_table = r.reshape(len(free), self.n_yaw_bins)

    # --------------------------------------------------------------- init

    def _uniform_particles(self, n: int) -> np.ndarray:
        idx = self.rng.integers(0, len(self._free_cells), n)
        rc = self._free_cells[idx]
        xy = self.costmap.to_world(rc)
        jitter = self.rng.uniform(-0.5, 0.5, (n, 2)) * self.costmap.resolution
        yaw = self.rng.uniform(-np.pi, np.pi, (n, 1))
        return np.concatenate([xy + jitter, yaw], axis=-1)

    def global_init(self) -> None:
        """Uniform re-seed over free space (kidnapped-robot recovery / the
        reference's global_localization service).  Starts at n_global
        particles; resample() shrinks to n_particles once converged+fit."""
        self.particles = self._uniform_particles(self.n_global)
        self.weights = np.full(self.n_global, 1.0 / self.n_global)
        self.w_slow = self.w_fast = 0.0

    def set_pose(self, pose: np.ndarray, std_xy: float = 0.2, std_yaw: float = 0.2):
        """Initialize around a known pose (the reference's /initialpose)."""
        n = self.n_particles
        self.particles = np.concatenate(
            [
                pose[:2] + self.rng.normal(0, std_xy, (n, 2)),
                _wrap(pose[2] + self.rng.normal(0, std_yaw, (n, 1))),
            ],
            axis=-1,
        )
        self.weights = np.full(n, 1.0 / n)

    # ------------------------------------------------------------- predict

    def motion_update(self, delta: np.ndarray) -> None:
        """Apply an odometry increment (dx, dy, dyaw in the PREVIOUS robot
        frame) with the sampled odometry model."""
        trans = float(np.hypot(delta[0], delta[1]))
        rot1 = float(np.arctan2(delta[1], delta[0])) if trans > 1e-6 else 0.0
        rot2 = _wrap(delta[2] - rot1)
        n = len(self.particles)
        s_rot1 = rot1 + self.rng.normal(
            0, np.sqrt(self.alpha1 * rot1**2 + self.alpha2 * trans**2), n
        )
        s_trans = trans + self.rng.normal(
            0, np.sqrt(self.alpha3 * trans**2 + self.alpha4 * (rot1**2 + rot2**2)), n
        )
        s_rot2 = rot2 + self.rng.normal(
            0, np.sqrt(self.alpha1 * rot2**2 + self.alpha2 * trans**2), n
        )
        yaw = self.particles[:, 2] + s_rot1
        self.particles[:, 0] += s_trans * np.cos(yaw)
        self.particles[:, 1] += s_trans * np.sin(yaw)
        self.particles[:, 2] = _wrap(yaw + s_rot2)

    # -------------------------------------------------------------- update

    def _field_at(self, xy: np.ndarray) -> np.ndarray:
        """Distance-to-obstacle lookup, max_range outside the map."""
        rc = self.costmap.to_grid(xy)
        h, w = self.occupied.shape
        r = np.clip(rc[..., 0], 0, h - 1)
        c = np.clip(rc[..., 1], 0, w - 1)
        inb = (rc[..., 0] == r) & (rc[..., 1] == c)
        return np.where(inb, self._dist[r, c], self.max_range)

    def measurement_update(self, ranges: np.ndarray, angles: np.ndarray) -> None:
        """Sensor update (beam or likelihood-field model); updates weights and
        the w_slow/w_fast recovery estimators."""
        anneal = (
            self.sigma_global_scale
            if len(self.particles) > self.n_particles
            else 1.0
        )
        pyaw = self.particles[:, 2:3]
        if self.model == "beam":
            rc = self.costmap.to_grid(self.particles[:, :2])
            h, w = self.occupied.shape
            rr = np.clip(rc[:, 0], 0, h - 1)
            cc = np.clip(rc[:, 1], 0, w - 1)
            cid = np.where(
                (rc[:, 0] == rr) & (rc[:, 1] == cc), self._cell_id[rr, cc], -1
            )
            binw = 2 * np.pi / self.n_yaw_bins
            yb = np.round((pyaw + angles[None, :]) / binw).astype(np.int64) % self.n_yaw_bins
            r_exp = self._range_table[np.clip(cid, 0, None)[:, None], yb]
            diff = ranges[None, :] - r_exp
            sigma = self.sigma_range * anneal
            p = (
                self.z_hit * np.exp(-0.5 * (diff / sigma) ** 2)
                + self.z_rand / self.max_range
            )
            # particles inside obstacles / off-map cannot explain anything
            p = np.where(cid[:, None] >= 0, p, self.z_rand / self.max_range)
            loglik = np.log(np.maximum(p, 1e-12)).sum(axis=1)
            n_hit = len(angles)
        else:
            hit = ranges < self.max_range * 0.999
            px = self.particles[:, 0:1]
            py = self.particles[:, 1:2]
            ex = px + ranges[None, :] * np.cos(pyaw + angles[None, :])
            ey = py + ranges[None, :] * np.sin(pyaw + angles[None, :])
            d = self._field_at(np.stack([ex, ey], axis=-1))  # (N, B)
            sigma = self.sigma_hit * anneal
            p = (
                self.z_hit * np.exp(-0.5 * (d / sigma) ** 2)
                + self.z_rand / self.max_range
            )
            loglik = np.where(hit[None, :], np.log(np.maximum(p, 1e-12)), 0.0).sum(axis=1)
            n_hit = max(int(hit.sum()), 1)
        shifted = loglik - loglik.max()
        w = self.weights * np.exp(shifted)
        total = w.sum()
        if total <= 0 or not np.isfinite(total):
            self.global_init()
            return
        self.weights = w / total
        # absolute fit of the CURRENT HYPOTHESIS: posterior-weighted mean of
        # the per-beam geometric-mean likelihood.  An unweighted mean would be
        # dragged down by freshly injected uniform particles, locking the
        # unfit-injection trigger on forever; weighting concentrates the
        # estimate on the cluster the filter actually believes.
        w_avg = float(np.sum(self.weights * np.exp(loglik / n_hit)))
        # adaptive recovery bookkeeping (nav2_amcl amcl_node.cpp w_slow/w_fast)
        if self.w_slow == 0.0:
            self.w_slow = w_avg
        else:
            self.w_slow += self.alpha_slow * (w_avg - self.w_slow)
        if self.w_fast == 0.0:
            self.w_fast = w_avg
        else:
            self.w_fast += self.alpha_fast * (w_avg - self.w_fast)

    # ------------------------------------------------------------ resample

    def resample(self) -> None:
        """Low-variance resampling with AMCL's two adaptations: uniform
        injection with probability max(0, 1 - w_fast/w_slow) (plus the
        absolute fit_floor trigger), and min/max particle-count adaptation —
        the set shrinks to n_particles only once the cloud is both
        geometrically converged and scan-consistent, and grows back to
        n_global when the fit is lost (kidnapped)."""
        fit = self.w_fast >= self.fit_floor
        n = self.n_particles if (fit and self.spread() < self.converged_spread) \
            else self.n_global
        p_inject = 0.0
        if self.w_slow > 0:
            p_inject = max(0.0, 1.0 - self.w_fast / self.w_slow)
        if not fit:
            p_inject = max(p_inject, self.unfit_inject)
        n_inject = int(round(p_inject * n))
        n_keep = n - n_inject
        # low-variance (systematic) resampling
        positions = (self.rng.random() + np.arange(n_keep)) / n_keep
        cum = np.cumsum(self.weights)
        cum[-1] = 1.0
        idx = np.searchsorted(cum, positions)
        kept = self.particles[idx]
        if n_inject:
            kept = np.concatenate([kept, self._uniform_particles(n_inject)])
            # reset the estimators so one recovery doesn't cascade
            self.w_slow = self.w_fast = 0.0
        self.particles = kept
        self.weights = np.full(n, 1.0 / n)

    # ----------------------------------------------------------------- API

    def update(self, delta_odom: np.ndarray, ranges: np.ndarray, angles: np.ndarray):
        """One filter cycle: predict, weight, estimate, resample.  The pose
        is read from the POSTERIOR weights (before resampling flattens them
        and injection mixes in uniform recovery particles)."""
        self.motion_update(np.asarray(delta_odom, np.float64))
        self.measurement_update(np.asarray(ranges), np.asarray(angles))
        est = self.estimate()
        self._last_estimate = est
        self.resample()
        return est

    def estimate(self) -> np.ndarray:
        """(3,) weighted mean pose (yaw via circular mean)."""
        w = self.weights
        x = float(np.sum(w * self.particles[:, 0]))
        y = float(np.sum(w * self.particles[:, 1]))
        yaw = float(
            np.arctan2(
                np.sum(w * np.sin(self.particles[:, 2])),
                np.sum(w * np.cos(self.particles[:, 2])),
            )
        )
        return np.array([x, y, yaw])

    def spread(self) -> float:
        """RMS particle distance from the mean — convergence / divergence
        signal (the caller triggers global_init when this explodes)."""
        mu = self.estimate()
        d = self.particles[:, :2] - mu[:2]
        return float(np.sqrt(np.mean(np.sum(d * d, axis=-1))))
