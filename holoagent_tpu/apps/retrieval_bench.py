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

    import numpy as np

    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    g = jax.random.normal(k1, (args.gallery, args.dim), jnp.float32)
    g = g / jnp.linalg.norm(g, axis=-1, keepdims=True)
    q = jax.random.normal(k2, (args.batch, args.dim), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    neg = jax.random.normal(k3, (args.negatives, args.dim), jnp.float32)
    neg = neg / jnp.linalg.norm(neg, axis=-1, keepdims=True)
    # plant one designated nearest neighbor per query at a random gallery row
    # so recall is measurable (row = query + noise, like a real matching view)
    rng = np.random.default_rng(0)
    planted = rng.choice(args.gallery, size=args.batch, replace=False)
    gn = np.array(g)  # host copy (jax arrays are read-only views)
    qn = np.asarray(q)
    noise = rng.standard_normal(qn.shape).astype(np.float32)
    noise /= np.linalg.norm(noise, axis=-1, keepdims=True)  # unit-vector scale
    gn[planted] = qn + 0.3 * noise
    gn[planted] /= np.linalg.norm(gn[planted], axis=-1, keepdims=True)
    g = jnp.asarray(gn)
    valid = jnp.ones((args.gallery,), bool)

    def retrieve(queries, gallery, negatives, valid):
        # query class = row 0 of [query ++ negatives] per query (the query
        # itself must win the class argmax, reference graph.py:3081-3161)
        def one(qv):
            class_feats = jnp.concatenate([qv[None], negatives], axis=0)
            return class_filtered_topk(
                gallery, valid, qv, class_feats, jnp.int32(0), args.topk
            )[1]  # indices (scores ride along in the same fused program)

        return jax.vmap(one)(queries)

    sec = time_device_fn(retrieve, (q, g, neg, valid), iters=args.iters)
    qps = args.batch / sec

    # --- recall parity (BASELINE.json: "QPS at recall parity") -------------
    # 1. parity_at_k: overlap of the fused device top-k with EXACT float64
    #    cosine top-k under the same class-argmax filter (the reference's
    #    numpy/faiss retrieval semantics, graph.py:3081-3161)
    # 2. planted_recall_at_1: the designated true NN ranks first
    device_idx = np.asarray(retrieve(q, g, neg, valid))  # (B, k)
    gh = np.asarray(g, np.float64)
    qh = np.asarray(q, np.float64)
    nh = np.asarray(neg, np.float64)
    parity = []
    hit1 = 0
    for i in range(args.batch):
        cls = np.concatenate([qh[i][None], nh], axis=0) @ gh.T  # (C+1, G)
        eligible = cls.argmax(0) == 0
        sims = np.where(eligible, qh[i] @ gh.T, -np.inf)
        exact = np.argsort(-sims)[: args.topk]
        dev = device_idx[i][device_idx[i] >= 0]
        parity.append(len(set(exact.tolist()) & set(dev.tolist())) / args.topk)
        hit1 += int(len(dev) > 0 and dev[0] == planted[i])
    print(
        json.dumps(
            {
                "metric": "vpr_retrieval_qps",
                "value": round(qps, 1),
                "unit": f"queries/s ({args.gallery}-object gallery, dim {args.dim}, "
                f"top-{args.topk}, {args.negatives} negative prompts, "
                f"batch {args.batch})",
                "seconds_per_batch": sec,
                "parity_at_k": round(float(np.mean(parity)), 4),
                "planted_recall_at_1": round(hit1 / args.batch, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
