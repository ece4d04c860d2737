"""Ring attention: sequence-parallel attention over the ICI mesh.

The slow path feeds the VLM up to 24 gallery images in one prompt
(reference fsr_vln/memory/hmsg/graph/graph.py:2896-2897) — at production
vision-token counts that sequence exceeds one chip's attention memory, the
long-context obligation of SURVEY.md §5.7.  Here the sequence axis is sharded
over the "data" mesh axis: each device holds its Q/K/V shard, K/V blocks
rotate around the ring with jax.lax.ppermute, and softmax is accumulated
online (running max/sum) so the full (T, T) score matrix never exists on any
chip.  Communication is N-1 ppermute steps of the local K/V block — pure ICI
traffic, overlappable with the local attention matmuls by XLA.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def _ring_attention_local(q, k, v, axis_name: str, causal: bool, scale: float):
    """Per-device body under shard_map. q/k/v: (B, H, Tl, D) local shards."""
    n_dev = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    b, h, tl, d = q.shape
    qf = q.astype(jnp.float32) * scale

    m = jnp.full((b, h, tl, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((b, h, tl, 1), jnp.float32)
    acc = jnp.zeros((b, h, tl, d), jnp.float32)

    def step(carry, block_idx):
        m, l, acc, k_blk, v_blk = carry
        # which global shard this K/V block came from
        src = (my + block_idx) % n_dev
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", qf, k_blk.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        if causal:
            q_idx = my * tl + jax.lax.broadcasted_iota(jnp.int32, (tl, tl), 0)
            k_idx = src * tl + jax.lax.broadcasted_iota(jnp.int32, (tl, tl), 1)
            s = jnp.where((q_idx >= k_idx)[None, None], s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_blk.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        # rotate K/V around the ring (receive from the right neighbor)
        perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        return (m_new, l, acc, k_blk, v_blk), None

    (m, l, acc, _, _), _ = jax.lax.scan(
        step, (m, l, acc, k, v), jnp.arange(n_dev)
    )
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)


def ring_attention(
    q: jnp.ndarray,  # (B, H, T, D), T divisible by the mesh's data axis
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    causal: bool = False,
    axis_name: str = "data",
) -> jnp.ndarray:
    """Sequence-parallel attention: shards T over `axis_name`."""
    d = q.shape[-1]
    fn = jax.shard_map(
        partial(
            _ring_attention_local, axis_name=axis_name, causal=causal, scale=d**-0.5
        ),
        mesh=mesh,
        in_specs=(
            P(None, None, axis_name, None),
            P(None, None, axis_name, None),
            P(None, None, axis_name, None),
        ),
        out_specs=P(None, None, axis_name, None),
        check_vma=False,
    )
    return jax.jit(fn)(q, k, v)
