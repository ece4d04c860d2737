"""Sort-based grouping/compaction kernels.

`group_unique` is the workhorse that replaces the reference's per-mask python
loops building point lists (reference fsr_vln/memory/hmsg/dataloader/generic.py:167-189
and the per-component merges of utils/graph_utils.py:989-1038): given (group,
value) pairs it produces, for every group, its sorted unique values compacted
into a fixed-capacity row — one global sort, no per-group work.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

I32_MAX = np.int32(2**31 - 1)  # numpy: no backend init at import


@partial(jax.jit, static_argnames=("num_groups", "capacity"))
def group_unique(
    groups: jnp.ndarray,  # (N,) int32 group ids in [0, num_groups)
    values: jnp.ndarray,  # (N,) int32 values (must be < I32_MAX)
    valid: jnp.ndarray,  # (N,) bool
    num_groups: int,
    capacity: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compact unique values per group.

    Returns (out (num_groups, capacity) int32 sorted unique values per group,
    padded with I32_MAX; counts (num_groups,) int32 clipped to capacity).
    Overflow beyond `capacity` is dropped (highest values first dropped? no —
    the kept set is the `capacity` smallest unique values per group, i.e. a
    deterministic spatially-coherent subset).
    """
    n = groups.shape[0]
    g = jnp.where(valid, groups, num_groups)  # invalid -> trash group
    v = jnp.where(valid, values, I32_MAX)
    # single lexicographic sort by (group, value)
    g_s, v_s = jax.lax.sort((g, v), num_keys=2)
    new_group = jnp.concatenate([jnp.ones((1,), bool), g_s[1:] != g_s[:-1]])
    new_val = jnp.concatenate([jnp.ones((1,), bool), v_s[1:] != v_s[:-1]])
    uniq = (new_group | new_val) & (g_s < num_groups) & (v_s < I32_MAX)
    # rank of each unique entry within its group
    cum = jnp.cumsum(uniq.astype(jnp.int32))
    # cum value at each group start:
    group_start_cum = jnp.where(new_group, cum - uniq.astype(jnp.int32), 0)
    # propagate group start to all members via max-scan (starts are increasing)
    group_base = jax.lax.associative_scan(jnp.maximum, group_start_cum)
    rank = cum - group_base - 1  # 0-based rank within group, valid where uniq
    slot = jnp.where(uniq & (rank < capacity), g_s * capacity + rank, num_groups * capacity)
    out = jnp.full((num_groups * capacity + 1,), I32_MAX, jnp.int32)
    out = out.at[slot].set(jnp.where(uniq, v_s, I32_MAX))
    counts = jnp.zeros((num_groups + 1,), jnp.int32).at[
        jnp.where(uniq, g_s, num_groups)
    ].add(uniq.astype(jnp.int32))
    return (
        out[: num_groups * capacity].reshape(num_groups, capacity),
        jnp.minimum(counts[:num_groups], capacity),
    )


@partial(jax.jit, static_argnames=("capacity",))
def unique_compact(
    values: jnp.ndarray, valid: jnp.ndarray, capacity: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sorted unique values of one set, padded with I32_MAX; plus count."""
    out, cnt = group_unique(
        jnp.zeros_like(values), values, valid, num_groups=1, capacity=capacity
    )
    return out[0], cnt[0]
