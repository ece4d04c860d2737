"""Jitted 2-D raster ops for room segmentation and nav-graph rasters.

The reference leans on cv2/scipy for this stage (GaussianBlur, morphology,
distanceTransform, watershed, findContours —
reference fsr_vln/memory/hmsg/graph/graph.py:960-1069 and
utils/graph_utils.py:391-487).  Every step is re-expressed as a static-shape
array program: separable convolutions, reduce-window morphology, jump-flood
distance transform, label-propagation connected components, and watershed as
priority-ordered seeded expansion — so the entire room-segmentation raster
pipeline jits as one program and runs on-device.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

# plain float, NOT jnp.float32(...): a module-level device constant would
# initialize the JAX backend at import time (and hang library imports
# whenever the TPU tunnel is down); weak-typed Python floats keep f32 math
BIG = 1e9


def gaussian_kernel1d(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


@partial(jax.jit, static_argnames=("sigma", "radius"))
def gaussian_blur(img: jnp.ndarray, sigma: float = 1.0, radius: int = 2) -> jnp.ndarray:
    """Separable gaussian blur on (H, W) float image."""
    k = gaussian_kernel1d(sigma, radius)
    img = img.astype(jnp.float32)
    pad = radius
    xpad = jnp.pad(img, ((0, 0), (pad, pad)), mode="edge")
    h = jax.vmap(lambda row: jnp.convolve(row, k, mode="valid"))(xpad)
    ypad = jnp.pad(h, ((pad, pad), (0, 0)), mode="edge")
    return jax.vmap(lambda col: jnp.convolve(col, k, mode="valid"), in_axes=1, out_axes=1)(
        ypad
    )


def _window(img, op, size, init):
    return jax.lax.reduce_window(
        img, init, op, (size, size), (1, 1), "SAME"
    )


@partial(jax.jit, static_argnames=("size", "iterations"))
def dilate(mask: jnp.ndarray, size: int = 3, iterations: int = 1) -> jnp.ndarray:
    """Binary dilation with a size x size box (cv2.dilate role,
    reference navigation_graph.py obstacle inflation)."""
    m = mask.astype(jnp.float32)
    for _ in range(iterations):
        m = _window(m, jax.lax.max, size, -1e9)
    return m > 0.5


@partial(jax.jit, static_argnames=("size", "iterations"))
def erode(mask: jnp.ndarray, size: int = 3, iterations: int = 1) -> jnp.ndarray:
    """Binary erosion with a size x size box (cv2.erode role)."""
    m = mask.astype(jnp.float32)
    for _ in range(iterations):
        m = _window(m, jax.lax.min, size, 1e9)
    return m > 0.5


@partial(jax.jit, static_argnames=("size", "iterations"))
def morph_close(mask: jnp.ndarray, size: int = 3, iterations: int = 1) -> jnp.ndarray:
    """Binary closing (dilate then erode) with a size x size box."""
    m = mask.astype(jnp.float32)
    for _ in range(iterations):
        m = _window(m, jax.lax.max, size, -1e9)
    for _ in range(iterations):
        m = _window(m, jax.lax.min, size, 1e9)
    return m > 0.5


@partial(jax.jit, static_argnames=("size", "iterations"))
def morph_open(mask: jnp.ndarray, size: int = 3, iterations: int = 1) -> jnp.ndarray:
    m = mask.astype(jnp.float32)
    for _ in range(iterations):
        m = _window(m, jax.lax.min, size, 1e9)
    for _ in range(iterations):
        m = _window(m, jax.lax.max, size, -1e9)
    return m > 0.5


@jax.jit
def otsu_threshold(img: jnp.ndarray) -> jnp.ndarray:
    """Otsu's threshold over a [0, 255]-scaled float image. Returns scalar t."""
    hist = jnp.histogram(img.reshape(-1), bins=256, range=(0.0, 255.0))[0].astype(
        jnp.float32
    )
    p = hist / jnp.maximum(hist.sum(), 1.0)
    omega = jnp.cumsum(p)
    levels = jnp.arange(256, dtype=jnp.float32)
    mu = jnp.cumsum(p * levels)
    mu_t = mu[-1]
    denom = omega * (1.0 - omega)
    sigma_b = jnp.where(denom > 1e-9, (mu_t * omega - mu) ** 2 / jnp.maximum(denom, 1e-9), 0.0)
    return levels[jnp.argmax(sigma_b)]


@partial(jax.jit, static_argnames=())
def distance_transform(occupied: jnp.ndarray) -> jnp.ndarray:
    """Euclidean distance (in pixels) of each pixel to the nearest occupied
    pixel, via jump flooding. occupied: (H, W) bool."""
    h, w = occupied.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    seed_y = jnp.where(occupied, ys, BIG)
    seed_x = jnp.where(occupied, xs, BIG)

    def better(cy, cx, ny, nx):
        cd = (cy - ys) ** 2 + (cx - xs) ** 2
        nd = (ny - ys) ** 2 + (nx - xs) ** 2
        take = nd < cd
        return jnp.where(take, ny, cy), jnp.where(take, nx, cx)

    n_steps = max(h, w)
    step = 1
    strides = []
    while step < n_steps:
        step *= 2
    while step >= 1:
        strides.append(step)
        step //= 2
    sy, sx = seed_y, seed_x
    for s in strides:
        for dy in (-s, 0, s):
            for dx in (-s, 0, s):
                if dy == 0 and dx == 0:
                    continue
                ny = jnp.roll(sy, (dy, dx), axis=(0, 1))
                nx = jnp.roll(sx, (dy, dx), axis=(0, 1))
                # rolled-over wrap seeds: invalidate by distance growing, ok
                sy, sx = better(sy, sx, ny, nx)
    d2 = (sy - ys) ** 2 + (sx - xs) ** 2
    return jnp.sqrt(jnp.minimum(d2, BIG))


@partial(jax.jit, static_argnames=("iters",))
def connected_components_2d(mask: jnp.ndarray, iters: int = 64) -> jnp.ndarray:
    """4-connected components of a bool mask. Returns int32 labels, -1 off-mask.
    Labels are the min flat index of the component (compact with
    `relabel_compact`)."""
    h, w = mask.shape
    idx = (
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
        + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    )
    big = jnp.int32(h * w)
    lab = jnp.where(mask, idx, big)

    def body(_, lab):
        best = lab
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nb = jnp.roll(lab, (dy, dx), axis=(0, 1))
            # forbid wraparound: mask out rolled-in edges
            if dy == 1:
                nb = nb.at[0, :].set(big)
            if dy == -1:
                nb = nb.at[-1, :].set(big)
            if dx == 1:
                nb = nb.at[:, 0].set(big)
            if dx == -1:
                nb = nb.at[:, -1].set(big)
            best = jnp.minimum(best, jnp.where(mask, nb, big))
        # pointer jumping through the flat label array
        flat = best.reshape(-1)
        flat = jnp.minimum(flat, jnp.concatenate([flat, jnp.array([big])])[jnp.minimum(flat, big - 1)])
        return jnp.where(mask, flat.reshape(h, w), big)

    lab = jax.lax.fori_loop(0, iters, body, lab)
    return jnp.where(mask, lab, -1)


@partial(jax.jit, static_argnames=("max_labels",))
def relabel_compact(labels: jnp.ndarray, max_labels: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Map arbitrary non-negative labels to [0, k). Returns (labels', sizes
    (max_labels,)); labels beyond max_labels become -1."""
    h, w = labels.shape
    flat = labels.reshape(-1)
    valid = flat >= 0
    # roots are pixels whose flat index == label
    idx = jnp.arange(h * w, dtype=jnp.int32)
    is_root = valid & (flat == idx)
    rank = jnp.cumsum(is_root.astype(jnp.int32)) - 1
    root_rank = jnp.where(is_root, rank, -1)
    # compact id of each pixel = rank at its root
    padded = jnp.concatenate([root_rank, jnp.array([-1], jnp.int32)])
    comp = jnp.where(valid, padded[jnp.clip(flat, 0, h * w)], -1)
    comp = jnp.where(comp >= max_labels, -1, comp)
    sizes = jnp.zeros((max_labels + 1,), jnp.int32).at[
        jnp.where(comp >= 0, comp, max_labels)
    ].add(1)
    return comp.reshape(h, w), sizes[:max_labels]


@partial(jax.jit, static_argnames=("iters",))
def watershed_expand(
    seeds: jnp.ndarray,  # (H, W) int32 >=0 seed labels, -1 elsewhere
    free: jnp.ndarray,  # (H, W) bool region to flood (walls excluded)
    priority: jnp.ndarray,  # (H, W) f32: higher floods first (distance map)
    iters: int = 256,
) -> jnp.ndarray:
    """Seeded watershed: free pixels adopt the label of the neighbor whose
    own priority is highest, iterated to closure — equivalent to flooding the
    inverted distance map from the seeds (cv2.watershed usage of the
    reference)."""
    lab = jnp.where(seeds >= 0, seeds, -1)

    def body(_, lab):
        best_lab = lab
        best_pri = jnp.where(lab >= 0, priority, -BIG)
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nl = jnp.roll(lab, (dy, dx), axis=(0, 1))
            np_ = jnp.roll(jnp.where(lab >= 0, priority, -BIG), (dy, dx), axis=(0, 1))
            if dy == 1:
                nl = nl.at[0, :].set(-1)
                np_ = np_.at[0, :].set(-BIG)
            if dy == -1:
                nl = nl.at[-1, :].set(-1)
                np_ = np_.at[-1, :].set(-BIG)
            if dx == 1:
                nl = nl.at[:, 0].set(-1)
                np_ = np_.at[:, 0].set(-BIG)
            if dx == -1:
                nl = nl.at[:, -1].set(-1)
                np_ = np_.at[:, -1].set(-BIG)
            take = (nl >= 0) & (np_ > best_pri) & (lab < 0)
            best_lab = jnp.where(take, nl, best_lab)
            best_pri = jnp.where(take, np_, best_pri)
        return jnp.where(free & (lab < 0), best_lab, lab)

    return jax.lax.fori_loop(0, iters, body, lab)


@jax.jit
def fill_holes(mask: jnp.ndarray) -> jnp.ndarray:
    """Fill interior holes: complement components not touching the border."""
    comp = connected_components_2d(~mask)
    h, w = mask.shape
    border_labels = jnp.concatenate(
        [comp[0, :], comp[-1, :], comp[:, 0], comp[:, -1]]
    )
    # mark labels reachable from border
    marks = jnp.zeros((h * w + 1,), bool).at[
        jnp.where(border_labels >= 0, border_labels, h * w)
    ].set(True)
    outside = (comp >= 0) & marks[jnp.clip(comp, 0, h * w)]
    return mask | (~mask & ~outside)


@partial(jax.jit, static_argnames=("max_peaks",))
def find_peaks_1d(
    y: jnp.ndarray, min_height: jnp.ndarray, min_distance: int, max_peaks: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """1-D peak finding with min height + min distance (greedy by height),
    the scipy.signal.find_peaks subset the floor detector uses
    (reference graph.py:656-662). Returns (indices (max_peaks,) int32 sorted
    ascending with -1 padding, count)."""
    n = y.shape[0]
    left = jnp.concatenate([jnp.array([-jnp.inf]), y[:-1]])
    right = jnp.concatenate([y[1:], jnp.array([-jnp.inf])])
    is_peak = (y > left) & (y >= right) & (y >= min_height)
    # greedy min-distance suppression in height order
    order = jnp.argsort(-jnp.where(is_peak, y, -jnp.inf))
    pos = jnp.arange(n)

    def body(i, keep):
        p = order[i]
        ok = is_peak[p] & ~jnp.any(keep & (jnp.abs(pos - p) < min_distance))
        return keep.at[p].set(ok)

    keep = jax.lax.fori_loop(0, n, body, jnp.zeros((n,), bool))
    kidx = jnp.where(keep, pos, n)
    sorted_idx = jnp.sort(kidx)[:max_peaks]
    count = jnp.minimum(jnp.sum(keep.astype(jnp.int32)), max_peaks)
    return jnp.where(sorted_idx < n, sorted_idx, -1).astype(jnp.int32), count
