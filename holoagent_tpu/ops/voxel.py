"""Voxel-key engine: the framework's replacement for KD-trees and FAISS.

The reference leans on cKDTree / FAISS / open3d voxel_down_sample in six-plus
places (reference fsr_vln/memory/hmsg/graph/graph.py:364,409,458;
dataloader/generic.py:181; utils/graph_utils.py:173-186,645-655).  None of
those map to a TPU.  Here every spatial query is expressed against a single
primitive: points are binned into a bounded integer grid and the three
coordinates are packed into one int32 **voxel key**; then

  * downsampling  = sort keys + segment-mean          (`voxel_downsample`)
  * NN-snap       = searchsorted into sorted keys     (`snap_to_voxels`)
  * overlap ratio = sorted-key intersection counting  (`ops.merge`)
  * occupancy     = key -> 2-D histogram scatter      (`ops.histogram`)

All shapes are static; invalid lanes carry the sentinel key and sort to the
end.

Grid layout: 11 bits x, 11 bits y, 9 bits z (z = gravity axis), i.e. a
2048 x 2048 x 512 grid centred on ``origin``.  At the reference's 0.05 m voxel
(reference fsr_vln/config/semantic_scene_reconstruction_ic4f.yaml:23) that is
a 102 m x 102 m x 25 m working volume — comfortably above the HM3D / office
scenes the reference maps.  Larger sites raise ``voxel_size`` or re-centre.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BITS_X = 11
BITS_Y = 11
BITS_Z = 9
NX = 1 << BITS_X
NY = 1 << BITS_Y
NZ = 1 << BITS_Z
# int32 sentinel for invalid/padded lanes; valid keys are clipped strictly below.
# numpy scalar, not jnp: module-level device constants initialize the JAX
# backend at import time (hangs library import when the TPU tunnel is down)
SENTINEL = np.int32(2**31 - 1)


class GridSpec(NamedTuple):
    """Voxel grid: cell size + world origin of cell (0,0,0)'s corner."""

    voxel_size: jnp.ndarray  # scalar f32
    origin: jnp.ndarray  # (3,) f32

    @staticmethod
    def make(voxel_size: float, origin=(0.0, 0.0, 0.0)) -> "GridSpec":
        return GridSpec(
            voxel_size=jnp.float32(voxel_size),
            origin=jnp.asarray(origin, dtype=jnp.float32),
        )

    @staticmethod
    def centered(voxel_size: float) -> "GridSpec":
        """Grid centred on the world origin."""
        half = jnp.array([NX // 2, NY // 2, NZ // 2], jnp.float32) * voxel_size
        return GridSpec(voxel_size=jnp.float32(voxel_size), origin=-half)


def coords(points: jnp.ndarray, grid: GridSpec) -> jnp.ndarray:
    """Integer cell coords (N, 3) int32, clipped into the grid."""
    c = jnp.floor((points - grid.origin) / grid.voxel_size).astype(jnp.int32)
    hi = jnp.array([NX - 2, NY - 2, NZ - 2], jnp.int32)
    return jnp.clip(c, 0, hi)


def pack(c: jnp.ndarray) -> jnp.ndarray:
    """Pack int32 cell coords (N, 3) into one int32 key (N,)."""
    return (c[..., 0] << (BITS_Y + BITS_Z)) | (c[..., 1] << BITS_Z) | c[..., 2]


def unpack(key: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `pack`: (N,) -> (N, 3) int32."""
    x = key >> (BITS_Y + BITS_Z)
    y = (key >> BITS_Z) & (NY - 1)
    z = key & (NZ - 1)
    return jnp.stack([x, y, z], axis=-1)


def keys_of(points: jnp.ndarray, valid: jnp.ndarray, grid: GridSpec) -> jnp.ndarray:
    """Voxel keys with SENTINEL on invalid lanes."""
    k = pack(coords(points, grid))
    return jnp.where(valid, k, SENTINEL)


def cell_center(key: jnp.ndarray, grid: GridSpec) -> jnp.ndarray:
    """World-space center of each cell key: (N,) -> (N, 3)."""
    c = unpack(key).astype(jnp.float32)
    return grid.origin + (c + 0.5) * grid.voxel_size


# ---------------------------------------------------------------------------
# Downsample (sort + segment mean)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("capacity", "return_segments"))
def voxel_downsample(
    points: jnp.ndarray,  # (N, 3)
    attrs: jnp.ndarray,  # (N, A) extra per-point channels averaged alongside
    valid: jnp.ndarray,  # (N,) bool
    grid: GridSpec,
    capacity: int,
    return_segments: bool = False,
):
    """Average points (and attrs) per occupied voxel.

    Replaces open3d ``voxel_down_sample`` (same mean-per-voxel semantics,
    cf. its use at reference graph.py:348) with a sort/segment-mean program.

    Returns a dict with:
      points  (capacity, 3) mean position per voxel
      attrs   (capacity, A)
      count   (capacity,)  points per voxel (0 on padding)
      key     (capacity,)  sorted voxel keys, SENTINEL on padding
      valid   (capacity,)  bool
      num     scalar int32 number of occupied voxels (<= capacity)
      segments (N,) int32  per-input voxel index in [0, capacity) or -1
                           (only if return_segments)
    """
    n = points.shape[0]
    key = keys_of(points, valid, grid)
    idx = jnp.arange(n, dtype=jnp.int32)
    key_s, idx_s = jax.lax.sort((key, idx), num_keys=1)
    pts_s = points[idx_s]
    attrs_s = attrs[idx_s]
    valid_s = key_s != SENTINEL

    first = jnp.concatenate(
        [jnp.ones((1,), bool), key_s[1:] != key_s[:-1]]
    ) & valid_s
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1  # -1 until first valid seg
    # route invalid & overflow segments to trash row `capacity`
    seg_c = jnp.where(valid_s & (seg >= 0) & (seg < capacity), seg, capacity)

    sum_pts = jnp.zeros((capacity + 1, 3), points.dtype).at[seg_c].add(pts_s)
    sum_attrs = jnp.zeros((capacity + 1, attrs.shape[1]), attrs.dtype).at[seg_c].add(attrs_s)
    cnt = jnp.zeros((capacity + 1,), jnp.float32).at[seg_c].add(valid_s.astype(jnp.float32))
    out_key = jnp.full((capacity + 1,), SENTINEL, jnp.int32).at[seg_c].min(key_s)

    cnt = cnt[:capacity]
    denom = jnp.maximum(cnt, 1.0)[:, None]
    out = {
        "points": sum_pts[:capacity] / denom,
        "attrs": sum_attrs[:capacity] / denom.astype(attrs.dtype),
        "count": cnt,
        "key": out_key[:capacity],
        "valid": cnt > 0,
        "num": jnp.sum((cnt > 0).astype(jnp.int32)),
    }
    if return_segments:
        # per original input point: which output voxel row it landed in (-1 if none)
        seg_of_input = (
            jnp.full((n,), -1, jnp.int32)
            .at[idx_s]
            .set(jnp.where(seg_c < capacity, seg_c, -1))
        )
        out["segments"] = seg_of_input
    return out


# ---------------------------------------------------------------------------
# Lookup / snap (searchsorted into sorted keys)
# ---------------------------------------------------------------------------


def lookup(sorted_keys: jnp.ndarray, query_keys: jnp.ndarray) -> jnp.ndarray:
    """Find each query key in sorted keys (padding = SENTINEL).

    Returns int32 row index, or -1 when absent."""
    pos = jnp.searchsorted(sorted_keys, query_keys).astype(jnp.int32)
    pos = jnp.clip(pos, 0, sorted_keys.shape[0] - 1)
    hit = sorted_keys[pos] == query_keys
    return jnp.where(hit & (query_keys != SENTINEL), pos, -1)


_NEIGHBOR_OFFSETS = np.array(
    [
        (dx, dy, dz)
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        for dz in (-1, 0, 1)
    ],
    dtype=np.int32,
)  # (27, 3); row 13 is (0,0,0) — numpy: no device work at import


@partial(jax.jit, static_argnames=())
def snap_to_voxels(
    query_points: jnp.ndarray,  # (M, 3)
    query_valid: jnp.ndarray,  # (M,)
    sorted_keys: jnp.ndarray,  # (C,) sorted, SENTINEL padded
    voxel_points: jnp.ndarray,  # (C, 3) representative point per voxel
    grid: GridSpec,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Snap each query point to the nearest occupied voxel's representative,
    probing the 27-cell neighborhood.

    This is the TPU-native equivalent of the reference's KD-tree snap of mask
    points onto the fused cloud (reference dataloader/generic.py:179-187).
    Returns (index (M,) int32 into voxel rows or -1, distance (M,) f32).
    """
    c = coords(query_points, grid)  # (M, 3)
    nbr = c[:, None, :] + _NEIGHBOR_OFFSETS[None, :, :]  # (M, 27, 3)
    hi = jnp.array([NX - 2, NY - 2, NZ - 2], jnp.int32)
    nbr = jnp.clip(nbr, 0, hi)
    nbr_keys = pack(nbr)  # (M, 27)
    rows = lookup(sorted_keys, nbr_keys.reshape(-1)).reshape(nbr_keys.shape)
    cand = voxel_points[jnp.clip(rows, 0)]  # (M, 27, 3)
    d2 = jnp.sum((cand - query_points[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(rows >= 0, d2, jnp.inf)
    best = jnp.argmin(d2, axis=-1)
    take = jnp.take_along_axis(rows, best[:, None], axis=-1)[:, 0]
    bestd = jnp.sqrt(jnp.take_along_axis(d2, best[:, None], axis=-1)[:, 0])
    ok = query_valid & (take >= 0) & jnp.isfinite(bestd)
    return jnp.where(ok, take, -1), jnp.where(ok, bestd, jnp.inf)


# ---------------------------------------------------------------------------
# Set intersection over sorted key arrays (overlap ratios, ops.merge)
# ---------------------------------------------------------------------------


def intersect_count(sorted_a: jnp.ndarray, sorted_b: jnp.ndarray) -> jnp.ndarray:
    """|A ∩ B| for two sorted unique key arrays (SENTINEL padded)."""
    hits = lookup(sorted_b, sorted_a)
    return jnp.sum((hits >= 0).astype(jnp.int32))
