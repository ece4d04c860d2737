"""Jitted Lloyd's k-means over masked fixed-shape data.

Replaces sklearn KMeans in room view-embedding clustering
(reference fsr_vln/memory/hmsg/utils/graph_utils.py:330-340)."""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k", "iters"))
def kmeans(
    x: jnp.ndarray,  # (N, D)
    valid: jnp.ndarray,  # (N,)
    k: int,
    iters: int = 100,
    seed: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (centers (k, D), labels (N,) int32; -1 on invalid rows).
    Initialization: k-means++-style greedy farthest selection (deterministic
    given seed)."""
    n, d = x.shape
    key = jax.random.key(seed)
    first = jax.random.randint(key, (), 0, n)
    centers0 = jnp.zeros((k, d), x.dtype).at[0].set(x[first])

    def init_body(i, centers):
        d2all = jnp.sum((x[:, None, :] - centers[None]) ** 2, axis=-1)  # (N, k)
        seeded = jnp.arange(k)[None, :] < i
        d2 = jnp.min(jnp.where(seeded, d2all, jnp.inf), axis=1)
        d2 = jnp.where(valid, d2, -1.0)
        nxt = jnp.argmax(d2)
        return centers.at[i].set(x[nxt])

    centers = jax.lax.fori_loop(1, k, init_body, centers0)

    def step(_, centers):
        d2 = jnp.sum((x[:, None, :] - centers[None]) ** 2, axis=-1)
        lab = jnp.argmin(d2, axis=1)
        lab_s = jnp.where(valid, lab, k)
        sums = jnp.zeros((k + 1, d), x.dtype).at[lab_s].add(x)
        cnts = jnp.zeros((k + 1,), x.dtype).at[lab_s].add(1.0)
        new = sums[:k] / jnp.maximum(cnts[:k, None], 1.0)
        return jnp.where(cnts[:k, None] > 0, new, centers)

    centers = jax.lax.fori_loop(0, iters, step, centers)
    d2 = jnp.sum((x[:, None, :] - centers[None]) ** 2, axis=-1)
    labels = jnp.where(valid, jnp.argmin(d2, axis=1).astype(jnp.int32), -1)
    return centers, labels
