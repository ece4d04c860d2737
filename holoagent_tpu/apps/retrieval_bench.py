"""VPR retrieval throughput benchmark (BASELINE.json target: retrieval QPS at
recall parity).  Measures the full fast-path retrieval program — text features
vs an object gallery with negative-prompt class-argmax filtering and top-k
(reference graph.py:3056-3161 query_hmsg_object semantics) — with the
serial-dependent on-device loop (utils.benchtime), so tunnel RTT does not
pollute the number.

  python -m holoagent_tpu.apps.retrieval_bench [--gallery 4096] [--batch 64]
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--gallery", type=int, default=4096, help="objects in the scene")
    ap.add_argument("--batch", type=int, default=64, help="queries per dispatch")
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--topk", type=int, default=5)
    ap.add_argument("--negatives", type=int, default=20)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..ops.retrieval import class_filtered_topk
    from ..utils.benchtime import time_device_fn

    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    g = jax.random.normal(k1, (args.gallery, args.dim), jnp.float32)
    g = g / jnp.linalg.norm(g, axis=-1, keepdims=True)
    q = jax.random.normal(k2, (args.batch, args.dim), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    neg = jax.random.normal(k3, (args.negatives, args.dim), jnp.float32)
    neg = neg / jnp.linalg.norm(neg, axis=-1, keepdims=True)
    valid = jnp.ones((args.gallery,), bool)

    def retrieve(queries, gallery, negatives, valid):
        # query class = row 0 of [query ++ negatives] per query (the query
        # itself must win the class argmax, reference graph.py:3081-3161)
        def one(qv):
            class_feats = jnp.concatenate([qv[None], negatives], axis=0)
            return class_filtered_topk(
                gallery, valid, qv, class_feats, jnp.int32(0), args.topk
            )[0]

        return jax.vmap(one)(queries)

    sec = time_device_fn(retrieve, (q, g, neg, valid), iters=args.iters)
    qps = args.batch / sec
    print(
        json.dumps(
            {
                "metric": "vpr_retrieval_qps",
                "value": round(qps, 1),
                "unit": f"queries/s ({args.gallery}-object gallery, dim {args.dim}, "
                f"top-{args.topk}, {args.negatives} negative prompts, "
                f"batch {args.batch})",
                "seconds_per_batch": sec,
            }
        )
    )


if __name__ == "__main__":
    main()
