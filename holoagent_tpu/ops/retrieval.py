"""Fused cosine-similarity retrieval (the VPR / fast-query primitive).

The reference scores text queries against gallery embeddings with numpy/torch
dot products plus argsort (reference fsr_vln/memory/hmsg/utils/clip_utils.py:44-60,
graph.py:3056-3161).  Here scoring+top-k is one jitted matmul+top_k program,
optionally sharded over the gallery axis with a psum-style global top-k merge.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


@partial(jax.jit, static_argnames=("k",))
def topk_cosine(
    gallery: jnp.ndarray,  # (N, D) L2-normalized, padded rows allowed
    gallery_valid: jnp.ndarray,  # (N,) bool
    queries: jnp.ndarray,  # (Q, D) L2-normalized
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Return (scores (Q, k), indices (Q, k)); invalid gallery rows score -inf."""
    scores = jnp.einsum(
        "qd,nd->qn", queries, gallery, preferred_element_type=jnp.float32
    )
    scores = jnp.where(gallery_valid[None, :], scores, -jnp.inf)
    return jax.lax.top_k(scores, k)


def topk_cosine_sharded(
    gallery: jnp.ndarray,
    gallery_valid: jnp.ndarray,
    queries: jnp.ndarray,
    k: int,
    mesh: Mesh,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gallery sharded over the "data" axis; local top-k then all-gather of the
    k candidates per shard and a final merge — the collective rides ICI and
    moves k*Q rows instead of the whole score matrix."""
    n = gallery.shape[0]

    def local(g, v, q, offset):
        s = jnp.einsum("qd,nd->qn", q, g, preferred_element_type=jnp.float32)
        s = jnp.where(v[None, :], s, -jnp.inf)
        ls, li = jax.lax.top_k(s, k)
        li = li + offset[0]
        # gather candidates from all shards
        all_s = jax.lax.all_gather(ls, "data", axis=1, tiled=True)  # (Q, k*D)
        all_i = jax.lax.all_gather(li, "data", axis=1, tiled=True)
        gs, gpos = jax.lax.top_k(all_s, k)
        gi = jnp.take_along_axis(all_i, gpos, axis=1)
        return gs, gi

    nd = mesh.shape["data"]
    offsets = (jnp.arange(nd, dtype=jnp.int32) * (n // nd))[:, None]
    from jax import shard_map

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("data", None), P("data"), P(None, None), P("data", None)),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    return jax.jit(fn, static_argnums=())(gallery, gallery_valid, queries, offsets)


@partial(jax.jit, static_argnames=("k",))
def class_filtered_topk(
    gallery: jnp.ndarray,  # (N, D) instance embeddings
    gallery_valid: jnp.ndarray,  # (N,)
    query_feat: jnp.ndarray,  # (D,) text feature of the queried class
    class_feats: jnp.ndarray,  # (C, D) label-vocabulary text features
    query_class: jnp.ndarray,  # scalar int32: row of `class_feats` equal to the query
    k: int,
):
    """Negative-prompt class-argmax retrieval: an instance only scores if the
    query class wins the argmax over the whole label vocabulary — the
    open-vocab filtering trick of reference graph.py:3081-3161
    (`query_hmsg_object`).  One fused matmul/argmax/top-k."""
    class_scores = jnp.einsum(
        "nd,cd->nc", gallery, class_feats, preferred_element_type=jnp.float32
    )
    best_class = jnp.argmax(class_scores, axis=-1)
    eligible = gallery_valid & (best_class == query_class)
    scores = jnp.einsum(
        "nd,d->n", gallery, query_feat, preferred_element_type=jnp.float32
    )
    scores = jnp.where(eligible, scores, -jnp.inf)
    return jax.lax.top_k(scores, k)


@partial(jax.jit, static_argnames=("k",))
def negative_prompt_topk(
    gallery: jnp.ndarray,  # (N, D) object embeddings (padded rows allowed)
    gallery_valid: jnp.ndarray,  # (N,)
    text_feats: jnp.ndarray,  # (C, D): row `query_id` is the query class
    query_id: jnp.ndarray,  # scalar int32
    k: int,
):
    """The engine's exact fast-path semantics (query.engine.query_object,
    reference graph.py:3081-3161) as one fused device program: compute the
    (C, N) similarity, gate objects whose argmax class is the query, rank the
    eligible by their max class similarity; when nothing is eligible, fall
    back to ranking everything by the query-row similarity.  Returns
    (scores (k,) — the query-row similarity of each pick, indices (k,))."""
    sim = jnp.einsum(
        "cd,nd->cn", text_feats, gallery, preferred_element_type=jnp.float32
    )
    cls = jnp.argmax(sim, axis=0)
    eligible = gallery_valid & (cls == query_id)
    any_eligible = jnp.any(eligible)
    rank_elig = jnp.where(eligible, jnp.max(sim, axis=0), -jnp.inf)
    rank_fallback = jnp.where(gallery_valid, sim[query_id], -jnp.inf)
    rank = jnp.where(any_eligible, rank_elig, rank_fallback)
    top_rank, idx = jax.lax.top_k(rank, k)
    # filler lanes (fewer than k candidates passed the gate) must be
    # detectable: their sim[query_id] gather would otherwise look like a
    # real pick — mark them idx=-1 / score=-inf
    real = jnp.isfinite(top_rank)
    return (
        jnp.where(real, sim[query_id][jnp.clip(idx, 0)], -jnp.inf),
        jnp.where(real, idx, -1),
    )
