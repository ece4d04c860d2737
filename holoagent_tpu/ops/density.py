"""Coarse-grid density filtering.

Replaces open3d ``remove_radius_outlier(nb_points, radius)`` (used on the
fused cloud at reference fsr_vln/memory/hmsg/graph/graph.py:356-358 with
nb_points=1000, radius=1.0): instead of per-point radius queries, points are
counted on a coarse grid of cell size radius/2 and each point's neighborhood
count is the sum over its 5x5x5 coarse-cell block (a superset of the 1-radius
ball, subset of 1.25-radius — equivalent up to the usual voxel quantization).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import voxel


@partial(jax.jit, static_argnames=())
def radius_density_keep(
    points: jnp.ndarray,  # (N, 3)
    valid: jnp.ndarray,  # (N,)
    weights: jnp.ndarray,  # (N,) point multiplicity (voxel hit counts)
    radius: float | jnp.ndarray = 1.0,
    min_neighbors: float | jnp.ndarray = 1000.0,
) -> jnp.ndarray:
    """Keep mask: points whose weighted neighbor count within ~radius is at
    least min_neighbors."""
    cell = jnp.float32(radius) / 2.0
    grid = voxel.GridSpec.centered(cell)
    c = voxel.coords(points, grid)
    key = voxel.pack(c)
    # count per coarse cell (dense scatter into a hashed table would alias;
    # use sort+segment via voxel_downsample on weights)
    n = points.shape[0]
    down = voxel.voxel_downsample(
        points, weights[:, None], valid, grid, capacity=n
    )
    cell_count = down["attrs"][:, 0] * down["count"]  # sum of weights per cell
    keys_sorted = down["key"]
    # 5x5x5 neighborhood sum per point
    offs = jnp.arange(-2, 3, dtype=jnp.int32)
    oz, oy, ox = jnp.meshgrid(offs, offs, offs, indexing="ij")
    nbr = jnp.stack([ox.reshape(-1), oy.reshape(-1), oz.reshape(-1)], axis=-1)  # (125,3)
    hi = jnp.array([voxel.NX - 2, voxel.NY - 2, voxel.NZ - 2], jnp.int32)
    cells = jnp.clip(c[:, None, :] + nbr[None], 0, hi)
    qkeys = voxel.pack(cells).reshape(-1)
    rows = voxel.lookup(keys_sorted, qkeys).reshape(n, -1)
    counts = jnp.where(rows >= 0, cell_count[jnp.clip(rows, 0)], 0.0)
    total = counts.sum(axis=1)
    return valid & (total >= min_neighbors)
