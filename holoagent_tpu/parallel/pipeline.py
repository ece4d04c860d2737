"""Pipeline parallelism: GPipe-style microbatched stage execution over a mesh
axis via `shard_map` + `ppermute`.

The reference has no pipeline parallelism (no transformer it trains/serves —
SURVEY.md §2.4); this is one of the *new design obligations* for the
TPU-native build: serving a VLM whose layer stack exceeds one chip's HBM
means cutting the stack into S stages, placing stage s on mesh ring position
s, and streaming microbatches through the ring.  On TPU the right primitive
set is:

  * stage placement: the leading axis of a stacked stage-parameter pytree is
    sharded over the `stage` mesh axis (each device holds ONE stage's
    weights — no weight motion ever);
  * activation motion: `jax.lax.ppermute` rotates microbatch activations to
    the next ring position each step — pure ICI-neighbor traffic, the same
    primitive the ring attention uses;
  * schedule: the classic GPipe loop of S + M - 1 steps for M microbatches
    over S stages; each device computes its stage whenever the rotating slot
    holds a live microbatch (masked with `jnp.where`, no data-dependent
    control flow — the schedule is fully static and jit-compatible).

`pipeline_apply` is the generic combinator; `tests/test_pipeline.py` proves
exact parity with the unpipelined stack on the 8-device CPU mesh, and
`__graft_entry__.dryrun_multichip` runs it under the driver.
"""

from __future__ import annotations


from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_stages(stage_params: list) -> Any:
    """Stack a list of per-stage parameter pytrees along a new leading axis
    (the axis that shards over the `stage` mesh dimension)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *stage_params)


def pipeline_apply(
    stage_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    stacked_params: Any,
    x: jnp.ndarray,  # (M, B, ...) microbatches
    mesh: Mesh,
    axis: str = "stage",
) -> jnp.ndarray:
    """Run x's M microbatches through S = mesh.shape[axis] stages.

    stage_fn(params_s, h) -> h applies ONE stage; stage s's params live on
    ring position s (stacked_params' leading axis sharded over `axis`).
    Microbatch activations enter at stage 0, rotate via ppermute, and exit
    after S stage applications.  Returns (M, B, ...) outputs.

    The schedule is the static GPipe loop: T = S + M - 1 ticks; at tick t,
    ring position s computes microbatch (t - s) when 0 <= t - s < M.
    Activation shapes must be stage-invariant (true for transformer stacks).
    """
    S = mesh.shape[axis]
    M = x.shape[0]
    if M < 1:
        raise ValueError("need at least one microbatch")

    def body(params_local, x_local):
        # params_local: (1, ...) this ring position's stage params
        # x_local: (M, B, ...) full microbatch set, replicated
        p = jax.tree.map(lambda a: a[0], params_local)
        s = jax.lax.axis_index(axis)
        # slot: the activation currently resident on this ring position.
        # The carries become device-varying over the stage axis after the
        # first tick, so mark the zero initializers varying up front (the
        # scan carry type must be tick-invariant).
        def _vary(a):
            if hasattr(jax.lax, "pcast"):
                return jax.lax.pcast(a, (axis,), to="varying")
            return jax.lax.pvary(a, (axis,))

        slot = _vary(jnp.zeros_like(x_local[0]))
        outs = _vary(jnp.zeros_like(x_local))
        fwd = [(i, (i + 1) % S) for i in range(S)]

        def tick(carry, t):
            slot, outs = carry
            m_in = t - s  # microbatch index entering this stage at tick t
            # stage 0 injects from the input queue; others use the slot
            h_in = jnp.where(
                s == 0,
                x_local[jnp.clip(m_in, 0, M - 1)],
                slot,
            )
            live = (m_in >= 0) & (m_in < M)
            h_out = stage_fn(p, h_in)
            h_out = jnp.where(live, h_out, jnp.zeros_like(h_out))
            # last stage banks its finished microbatch
            done = live & (s == S - 1)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs,
                jnp.where(done, h_out, outs[jnp.clip(m_in, 0, M - 1)]),
                jnp.clip(m_in, 0, M - 1),
                axis=0,
            )
            # rotate activations to the next ring position
            slot = jax.lax.ppermute(h_out, axis, fwd)
            return (slot, outs), None

        (slot, outs), _ = jax.lax.scan(
            tick, (slot, outs), jnp.arange(S + M - 1)
        )
        # every ring position banked only its own finished microbatches
        # (stage S-1); psum broadcasts the union back to all positions
        return jax.lax.psum(outs, axis)

    pspec = jax.tree.map(
        lambda a: P(axis, *([None] * (a.ndim - 1))), stacked_params
    )
    fn = jax.jit(
        jax.shard_map(body, mesh=mesh, in_specs=(pspec, P()), out_specs=P())
    )
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), pspec)
    return fn(
        jax.device_put(stacked_params, shardings),
        jax.device_put(x, NamedSharding(mesh, P())),
    )
