"""Device-honest benchmark timing.

The sandbox reaches its TPU through an RPC tunnel whose round-trip is ~30 ms
and whose `block_until_ready` does NOT wait for remote completion — so the
only sound measurement is: run K iterations *inside one jitted program* with a
forced serial data dependency, fetch a scalar to host (the fetch is the sync),
and divide.  Used by bench.py and perf tests.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def time_device_fn(
    fn: Callable,
    args: Sequence,
    iters: int = 10,
    warmup: bool = True,
) -> float:
    """Seconds per single `fn(*args)` execution, measured on-device.

    `fn` must return an array (or pytree); a scalar probe of the output is fed
    back into the next iteration as an epsilon perturbation of the first
    argument, making the chain serially dependent so XLA cannot batch or elide
    iterations.
    """

    def probe(out):
        leaves = jax.tree.leaves(out)
        return sum(jnp.sum(l).astype(jnp.float32) * 0.0 for l in leaves)

    first = args[0]

    def chained(eps, _):
        a0 = jax.tree.map(lambda x: x + eps.astype(x.dtype), first)
        out = fn(a0, *args[1:])
        return probe(out), None

    @jax.jit
    def run():
        eps, _ = jax.lax.scan(chained, jnp.float32(0.0), None, length=iters)
        return eps

    if warmup:
        float(run())  # compile + one throwaway (host fetch = true sync)
    t0 = time.perf_counter()
    float(run())
    dt = time.perf_counter() - t0
    return dt / iters
