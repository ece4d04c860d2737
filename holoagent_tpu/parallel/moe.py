"""Expert parallelism: top-k gated mixture-of-experts with experts sharded
over a mesh axis and token routing via `all_to_all`.

The reference has no MoE (SURVEY.md §2.4 — no EP anywhere upstream); this is
the last of the parallelism design obligations (DP/TP/PP/SP/EP) built
TPU-native so the framework's serving stack can host MoE VLM variants:

  * expert placement: the expert-parameter pytree's leading axis (E experts)
    shards over the ``expert`` mesh axis — each device owns E/D experts and
    never moves weights;
  * routing: a dense top-k softmax gate picks experts per token; tokens are
    bucketed by owner device with a fixed per-device capacity (fixed shapes —
    the TPU-native answer to dynamic routing), shipped with ONE
    ``all_to_all``, processed by the local experts, and shipped back with the
    reverse ``all_to_all`` (the same exchange pattern the sharded scene
    state uses, memory/sharded_scene.py);
  * overflow beyond the capacity factor is dropped (standard Switch/GShard
    semantics) — the parity test runs under capacity so results match the
    dense reference exactly.

`moe_apply` is the generic combinator; tests/test_moe.py proves parity with
the densely-computed gate on the 8-device CPU mesh.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_moe_mlp(key, n_experts: int, d_model: int, d_hidden: int, scale=0.2):
    """Stacked expert MLPs: (E, ...) parameter pytree."""
    k1, k2 = jax.random.split(key)
    return {
        "w1": jax.random.normal(k1, (n_experts, d_model, d_hidden)) * scale,
        "b1": jnp.zeros((n_experts, d_hidden)),
        "w2": jax.random.normal(k2, (n_experts, d_hidden, d_model)) * scale,
        "b2": jnp.zeros((n_experts, d_model)),
    }


def _expert_mlp(p, x):  # p: per-expert params, x: (n, d)
    return jax.nn.gelu(x @ p["w1"] + p["b1"]) @ p["w2"] + p["b2"]


def moe_dense_reference(params: Any, gate_w: jnp.ndarray, x: jnp.ndarray,
                        top_k: int = 2) -> jnp.ndarray:
    """Unsharded reference: every expert computed for every token, combined
    by the top-k gate (for parity tests and single-device fallback)."""
    t, d = x.shape
    e = gate_w.shape[1]
    logits = x @ gate_w
    topv, topi = jax.lax.top_k(logits, top_k)
    w = jax.nn.softmax(topv, axis=-1)  # (T, K)
    all_out = jax.vmap(lambda i: _expert_mlp(
        jax.tree.map(lambda a: a[i], params), x))(jnp.arange(e))  # (E, T, D)
    picked = all_out[topi, jnp.arange(t)[:, None]]  # (T, K, D)
    return (picked * w[..., None]).sum(axis=1)


def moe_apply(
    params: Any,          # (E, ...) expert params, E divisible by mesh axis
    gate_w: jnp.ndarray,  # (D, E)
    x: jnp.ndarray,       # (T, D) tokens (replicated)
    mesh: Mesh,
    axis: str = "expert",
    top_k: int = 2,
    capacity_factor: float = 2.0,
    expert_fn: Callable = _expert_mlp,
) -> jnp.ndarray:
    """Expert-parallel forward: route tokens to expert owners via all_to_all,
    apply the local experts, return combined outputs (T, D).

    Per-destination capacity C = ceil(T * top_k * capacity_factor / D); slots
    beyond C on any device drop their assignment (their gate weight is
    renormalized away).  With capacity_factor >= D (or small T) nothing drops
    and the result equals moe_dense_reference.
    """
    dnum = mesh.shape[axis]
    e = gate_w.shape[1]
    if e % dnum:
        raise ValueError(f"{e} experts not divisible by {dnum} devices")
    e_loc = e // dnum
    t = x.shape[0]
    cap = int(-(-t * top_k * capacity_factor // dnum))

    def body(p_local, gw, xs):
        # p_local: (e_loc, ...) this device's experts; xs: (T, D) replicated
        logits = xs @ gw
        topv, topi = jax.lax.top_k(logits, top_k)  # (T, K)
        gate = jax.nn.softmax(topv, axis=-1)
        dest = topi // e_loc          # owner device per assignment (T, K)
        flat_dest = dest.reshape(-1)  # (T*K,)
        flat_tok = jnp.repeat(jnp.arange(t), top_k)
        flat_exp = (topi % e_loc).reshape(-1)
        # slot position of each assignment within its destination bucket
        onehot = jax.nn.one_hot(flat_dest, dnum, dtype=jnp.int32)  # (TK, D)
        pos = jnp.cumsum(onehot, axis=0) * onehot - 1  # (TK, D)
        slot = pos.max(axis=1)  # position within the destination's bucket
        keep = slot < cap
        # build send buffers: (D, C+1, d_model) tokens + metadata; the extra
        # column is the TRASH slot for capacity-dropped assignments (they
        # must not overwrite a live slot)
        capp = cap + 1
        send_x = jnp.zeros((dnum, capp, xs.shape[1]), xs.dtype)
        send_meta = jnp.full((dnum, capp, 2), -1, jnp.int32)  # (tok, local_e)
        idx_d = jnp.where(keep, flat_dest, dnum - 1)
        idx_c = jnp.where(keep, slot, cap)
        send_x = send_x.at[idx_d, idx_c].set(
            jnp.where(keep[:, None], xs[flat_tok], 0.0)
        )
        send_meta = send_meta.at[idx_d, idx_c].set(
            jnp.where(
                keep[:, None],
                jnp.stack([flat_tok, flat_exp], axis=-1),
                -1,
            )
        )
        # ship buckets to their owners (split axis 0, concat axis 0)
        recv_x = jax.lax.all_to_all(
            send_x, axis, split_axis=0, concat_axis=0, tiled=True
        )  # (D*C', ...) -> here (dnum*cap/dnum...)  == (dnum, cap) flattened
        recv_meta = jax.lax.all_to_all(
            send_meta, axis, split_axis=0, concat_axis=0, tiled=True
        )
        rx = recv_x.reshape(dnum * capp, xs.shape[1])
        rm = recv_meta.reshape(dnum * capp, 2)
        # apply each LOCAL expert to its assigned rows (masked dense pass
        # over e_loc experts — fixed shapes, no gather scatter churn)
        out_rows = jnp.zeros_like(rx)
        for le in range(e_loc):
            pe = jax.tree.map(lambda a: a[le], p_local)
            sel = rm[:, 1] == le
            y = expert_fn(pe, rx)
            out_rows = jnp.where(sel[:, None], y, out_rows)
        # ship results back (reverse all_to_all restores sender layout)
        back = jax.lax.all_to_all(
            out_rows.reshape(dnum, capp, xs.shape[1]), axis,
            split_axis=0, concat_axis=0, tiled=True,
        ).reshape(dnum, capp, xs.shape[1])
        # combine on the sender: assignment k of token t sits at
        # (idx_d, idx_c) in the returned buffer
        y_flat = back[idx_d, idx_c]  # (TK, d_model)
        w_flat = jnp.where(keep, gate.reshape(-1), 0.0)
        # renormalize gates over surviving assignments per token
        w_tok = w_flat.reshape(t, top_k)
        denom = jnp.maximum(w_tok.sum(axis=1, keepdims=True), 1e-9)
        w_tok = w_tok / denom
        y = (y_flat.reshape(t, top_k, -1) * w_tok[..., None]).sum(axis=1)
        return y

    pspec = jax.tree.map(lambda a: P(axis, *([None] * (a.ndim - 1))), params)
    # every device reconstructs the full combined output (identical routing
    # on replicated inputs + symmetric exchange), which the static
    # replication checker cannot infer through all_to_all — disable it
    try:
        sm = jax.shard_map(
            body, mesh=mesh, in_specs=(pspec, P(), P()), out_specs=P(),
            check_vma=False,
        )
    except TypeError:  # older jax spelling
        sm = jax.shard_map(
            body, mesh=mesh, in_specs=(pspec, P(), P()), out_specs=P(),
            check_rep=False,
        )
    fn = jax.jit(sm)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), pspec)
    return fn(
        jax.device_put(params, shardings),
        jax.device_put(gate_w, NamedSharding(mesh, P())),
        jax.device_put(x, NamedSharding(mesh, P())),
    )
