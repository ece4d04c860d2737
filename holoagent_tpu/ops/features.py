"""Feature-space denoising.

Replaces the reference's sklearn cosine-DBSCAN "largest cluster mean"
(reference fsr_vln/memory/hmsg/utils/graph_utils.py:682-728
`feats_denoise_dbscan`, called per instance at graph.py:480): one round of
mode seeking — the member with the most cosine-neighbors within eps anchors
the dominant cluster, and the output is the mean of its neighborhood.  For
tight clusters (which is what per-instance CLIP features form) this equals the
DBSCAN largest-cluster mean; it is one matmul instead of a host clustering.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=())
def dominant_feature(
    feats: jnp.ndarray,  # (K, D) unit-norm member features (zeros on padding)
    valid: jnp.ndarray,  # (K,)
    eps: float | jnp.ndarray = 0.01,  # cosine-distance radius
    min_points: float | jnp.ndarray = 100.0,
) -> jnp.ndarray:
    """(D,) denoised instance feature, unit norm (zeros if no valid member)."""
    sim = jnp.einsum("kd,jd->kj", feats, feats, preferred_element_type=jnp.float32)
    nbr = (sim >= 1.0 - eps) & valid[None, :] & valid[:, None]
    deg = nbr.sum(axis=1)
    # if the densest neighborhood is below min_points, DBSCAN labels all noise
    # and the reference falls back to the mean of everything
    anchor = jnp.argmax(jnp.where(valid, deg, -1))
    use_cluster = deg[anchor] >= min_points
    w_cluster = nbr[anchor].astype(jnp.float32)
    w_all = valid.astype(jnp.float32)
    w = jnp.where(use_cluster, w_cluster, w_all)
    mean = jnp.einsum("k,kd->d", w, feats, preferred_element_type=jnp.float32)
    mean = mean / jnp.maximum(jnp.sum(w), 1e-9)
    n = jnp.linalg.norm(mean)
    return jnp.where(n > 1e-9, mean / jnp.maximum(n, 1e-9), 0.0)
