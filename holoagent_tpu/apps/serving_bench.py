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
        chunk: int = 8) -> dict:
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
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    run(args.variant, args.batch, args.requests, args.new_tokens, args.out,
        chunk=args.chunk)


if __name__ == "__main__":
    main()
