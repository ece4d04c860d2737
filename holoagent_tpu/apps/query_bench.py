"""Query benchmark CLI — the reference's visualize_query_graph_icra_* family
(reference fsr_vln/application/visualize_query_graph/
visualize_query_graph_icra_ic4f.py:152-327): load a saved HMSG, run a fixed
instruction list through the FSR engine, dump per-query results and stage
latency averages to all_results.json in the reference's schema.

Usage:
  python -m holoagent_tpu.apps.query_bench --graph <graph_dir> \
      --instructions instructions.json [--config cfg.yaml] [--slow]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import List

import numpy as np

from .. import config as cfgmod
from ..memory.hmsg import HMSGraph
from ..query import ClipVLM, FSRQueryEngine
from .common import load_dataset, load_models, tokenizer

STAGES = (
    "LLM_Parse_Time",
    "FastMatching",
    "ObjectInImageCheck",
    "VLM_Rethinking",
    "Re_Matching",
    "Total_Time",
)


def _make_vlm(kind: str, clip_params, tok, cv, cfg):
    if kind == "clip":
        return ClipVLM(clip_params, tok, cv)
    if kind == "generative":
        import jax
        import jax.numpy as jnp

        from ..models import vlm as vlm_mod
        from ..query.vlm_backend import GenerativeVLM
        from ..serving import ContinuousBatcher

        import dataclasses

        vv = vlm_mod.VARIANTS[getattr(cfg.models.vlm, "type", "") or "vlm-small"]
        # the VLM's vision tower is the app's CLIP tower (params shared)
        vv = dataclasses.replace(vv, clip_variant=cfg.models.clip.type)
        vlm_params = vlm_mod.init_vlm(jax.random.key(2), vv, dtype=jnp.bfloat16)
        batcher = ContinuousBatcher(
            vlm_params, clip_params, vv, tokenizer=tok,
            max_batch=cfg.serving.max_batch,
        )
        return GenerativeVLM(batcher, max_new_tokens=8)
    return None  # NullVLM default inside the engine


def _pad_gallery_with_crops(graph, n: int, dataset, clip_params, cv, seed: int = 7):
    """Widen the object gallery to production scale with distractor objects
    whose embeddings are RENDERED-CROP features from the SAME image tower as
    the real objects: random windows over the scan's frames (wall/floor/
    background and partial furniture), batch-encoded through CLIP.  The
    round-3 design (label-text embeddings + noise) lived in the query's own
    text-embedding space and outranked every real object by construction —
    distractors must compete in image space, like the hundreds of real
    instances a building-scale HMSG carries (reference 8-scene HM3D battery).
    Distractor centers sit far outside the scene so a retrieved distractor
    can never earn GT credit.

    When the dataset carries GT instance masks (synthetic fixtures), windows
    containing OBJECT pixels are rejected: a window showing the queried
    object is not a distractor — it is a duplicate of the answer that steals
    its rank (measured: object windows pinned recall@5 at 0 regardless of
    tower quality, and even quarter-object windows outranked the true
    instance whose ConceptFusion blend dilutes its category signal, round
    4).  Structure/clutter windows stay in; cross-CATEGORY confusion is
    already measured by the scene's real objects in the gallery."""
    import jax
    import jax.numpy as jnp

    from ..memory.nodes import Object as _Obj
    from ..models import clip as clip_mod

    max_object_frac = 0.05
    rng = np.random.default_rng(seed)
    f_ids = sorted(rng.choice(len(dataset), size=min(len(dataset), 16), replace=False))
    frames = [np.asarray(dataset[int(i)].rgb, np.float32) for i in f_ids]
    gts = [dataset.gt(int(i))[0] if hasattr(dataset, "gt") else None
           for i in f_ids]
    h, w = frames[0].shape[:2]
    s_lo, s_hi = max(8, h // 8), max(12, h // 2)
    crops = []
    tries = 0
    while len(crops) < n and tries < 40 * n:
        j = tries % len(frames)
        tries += 1
        f, inst = frames[j], gts[j]
        s = int(rng.integers(s_lo, s_hi))
        y0 = int(rng.integers(0, h - s))
        x0 = int(rng.integers(0, w - s))
        if inst is not None and (
            (np.asarray(inst)[y0 : y0 + s, x0 : x0 + s] >= 0).mean()
            > max_object_frac
        ):
            continue
        crops.append(np.asarray(jax.image.resize(
            jnp.asarray(f[y0 : y0 + s, x0 : x0 + s]),
            (cv.image_size, cv.image_size, 3), "linear",
        )))
    n_req, n = n, len(crops)
    if n < n_req:
        # the object-fraction gate can exhaust the retry budget on dense
        # scenes; a silently shrunk gallery would overstate recall (ADVICE r4)
        print(f"# pad_gallery: {n}/{n_req} distractor windows passed the "
              f"object-fraction gate (<= {max_object_frac}); gallery is smaller")
    if n == 0:
        return
    embs = []
    for i in range(0, n, 64):
        x = clip_mod.preprocess(jnp.asarray(np.stack(crops[i : i + 64])), cv.image_size)
        embs.append(np.asarray(
            clip_mod.encode_image(clip_params, x, cv, dtype=jnp.float32), np.float32
        ))
    embs = np.concatenate(embs)
    base_room = graph.rooms[0].room_id if graph.rooms else "room_0"
    for i in range(n):
        graph.objects.append(_Obj(
            object_id=f"distractor_{i}", room_id=base_room, name="distractor",
            pcd_points=rng.uniform(100.0, 140.0, (4, 3)),
            embedding=embs[i],
        ))


def _apply_oracle_embeddings(graph, gt, dim: int, pad: float = 0.25):
    """Oracle-retrieval mode (VERDICT r4 #3): swap every gallery embedding for
    the one-hot label feature of the GT category whose (pad-inflated) aabb
    contains the object's center, and return a text-feature override mapping
    each query/room/negative text into the same one-hot space.  With oracle
    embeddings, recall measures the PIPELINE alone — parse, room gating,
    negative-prompt argmax, top-k, GT scoring — with the tower's embedding
    quality removed, the retrieval analog of the eval protocol's oracle
    perception row (apps/eval_protocol.py, perception/oracle.py).  Objects
    whose center lies in no GT box (distractors at 100-140 m, unmapped
    structure) take the 'background' vector and are gated out by the
    negative-prompt argmax, exactly how production filters clutter."""
    from ..perception.oracle import onehot_label_feats

    labels = sorted({o.category for o in gt.objects})
    labels += sorted({r.category for r in gt.rooms} - set(labels))
    labels += sorted({r.name for r in graph.rooms if r.name} - set(labels))
    for extra in ("background", "wall", "floor", "distractor"):
        if extra not in labels:
            labels.append(extra)
    feats = onehot_label_feats(labels, dim)
    by_label = {lab: feats[i] for i, lab in enumerate(labels)}
    lo = np.stack([np.asarray(o.center, np.float64) - np.asarray(o.dims) / 2 - pad
                   for o in gt.objects])
    hi = np.stack([np.asarray(o.center, np.float64) + np.asarray(o.dims) / 2 + pad
                   for o in gt.objects])
    cats = [o.category for o in gt.objects]
    for o in graph.objects:
        c = np.asarray(o.center(), np.float64)
        inside = np.nonzero(((c >= lo) & (c <= hi)).all(-1))[0]
        if len(inside):
            # tightest containing box wins (a nightstand inside the bed's
            # inflated box must not inherit 'bed')
            vol = np.prod(hi[inside] - lo[inside], axis=-1)
            o.embedding = by_label[cats[int(inside[np.argmin(vol)])]].copy()
        else:
            o.embedding = by_label["background"].copy()
    return by_label


def _score_against_gt(results, gt, pad: float = 0.25):
    """Retrieval correctness vs the GT graph (the role of the reference's
    hm3dsem evaluator in the benchmark loop, reference
    fsr_vln/memory/hmsg/eval/hm3dsem_evaluator.py:401-589): the queried
    category comes from the engine's own parse of each instruction; credit =
    a predicted object center lying INSIDE the aabb (inflated by ``pad`` per
    side) of ANY GT object of that category.  The reference associates
    predictions to GT by 3-D box IoU / point-overlap — never by a
    center-distance sphere: mapped clouds are OBSERVED SURFACES, so a perfect
    2 m sofa prediction has its centroid up to 1 m from the box center and a
    fixed-radius criterion fails perfect answers on any large object
    (measured round 4: in-box scoring is the box-level analog of the
    reference's iou>0 association gate).  Adds per-query top1_correct /
    recall_at_5 fields and returns the summary."""
    from ..query.parser import RuleParser

    parser = RuleParser()
    by_cat = {}
    for o in gt.objects:
        c = np.asarray(o.center, np.float64)
        h = np.asarray(o.dims, np.float64) / 2.0 + pad
        by_cat.setdefault(o.category, []).append((c - h, c + h))
    n_scored = top1 = rec5 = 0
    for r in results:
        cat = parser(r["instruction"]).object
        r["gt_category"] = cat
        answers = by_cat.get(cat)
        if not answers:
            continue
        pred = np.asarray(r["object_centers"], np.float64).reshape(-1, 3)
        if len(pred):
            lo = np.stack([a[0] for a in answers])  # (G, 3)
            hi = np.stack([a[1] for a in answers])
            inside = (
                (pred[:, None] >= lo[None]) & (pred[:, None] <= hi[None])
            ).all(-1).any(-1)  # (P,)
            ok1, ok5 = bool(inside[0]), bool(inside[:5].any())
        else:
            ok1 = ok5 = False
        r["top1_correct"], r["recall_at_5"] = ok1, ok5
        n_scored += 1
        top1 += ok1
        rec5 += ok5
    return {
        "n_scored": n_scored,
        "top1_acc": top1 / max(n_scored, 1),
        "recall_at_5": rec5 / max(n_scored, 1),
        "match_criterion": f"pred center inside GT aabb + {pad} m pad",
    }


def _device_derived(results, rates_path: str = "results/serving_bench_tpu.json"):
    """Device-derived slow-path latency (VERDICT r3 weak #3): the wall p50
    through the RPC tunnel carries ~30 ms of round-trip per dispatch that a
    locally-attached chip never pays, so the artifact also reports what the
    measured DEVICE rates imply.  Per query:

        t_device = FastMatching + prompt_tokens/128 * prefill_128_ms
                   + ceil(new_tokens/decode_chunk) * decode_step_ms

    with prefill_128_ms / decode_step_ms taken from the serving benchmark
    artifact (apps/serving_bench.py, measured on-device via
    utils.benchtime.time_device_fn).  Returns {} when no VLM work was
    recorded or no rates artifact exists."""
    from pathlib import Path as _P

    recs = [r for r in results if r.get("vlm_work", {}).get("waves")]
    p = _P(rates_path)
    if not recs or not p.exists():
        return {}
    rates = json.loads(p.read_text())
    pre_ms = rates.get("prefill_128_ms")
    dec_ms = rates.get("decode_step_ms")
    chunk = rates.get("decode_chunk", 8)
    if pre_ms is None or dec_ms is None:
        return {}
    per_q = []
    for r in results:
        w = r.get("vlm_work") or {}
        dev = (
            w.get("prompt_tokens", 0) / 128.0 * pre_ms
            + -(-w.get("new_tokens", 0) // chunk) * dec_ms
        ) / 1e3
        per_q.append(r["FastMatching"] + dev)
    return {
        "p50_device_derived": float(np.percentile(per_q, 50)),
        "p95_device_derived": float(np.percentile(per_q, 95)),
        "device_derivation": {
            "prefill_128_ms": pre_ms,
            "decode_step_ms": dec_ms,
            "decode_chunk": chunk,
            "formula": "FastMatching + prompt_tokens/128*prefill_128_ms"
                       " + ceil(new_tokens/chunk)*decode_step_ms",
            "rates_source": str(p),
        },
    }


def run(
    graph_dir: str,
    instructions: List[str],
    cfg: cfgmod.Config,
    use_slow: bool = False,
    out_path: str | None = None,
    dataset=None,
    vlm_kind: str = "clip",
    warmup: bool = True,
    pad_gallery: int = 0,
    gt_path: str | None = None,
    models=None,  # optional preloaded (clip_params, sam_params, cv, sv)
    oracle: bool = False,  # GT one-hot embeddings: pipeline-only retrieval row
):
    graph = HMSGraph.load(graph_dir)
    clip_params, _, cv, _ = models if models is not None else load_models(cfg)
    tok = tokenizer()
    if pad_gallery:
        dataset = dataset if dataset is not None else load_dataset(cfg)
        _pad_gallery_with_crops(graph, pad_gallery, dataset, clip_params, cv)
    text_override = None
    if oracle:
        if not gt_path:
            raise ValueError("--oracle needs --gt (the one-hot label space)")
        from ..eval import GTGraph

        text_override = _apply_oracle_embeddings(
            graph, GTGraph.from_json(gt_path), cv.embed_dim)
    provider = None
    if use_slow:
        import jax
        import jax.numpy as jnp

        dataset = dataset if dataset is not None else load_dataset(cfg)
        # keyframe images stay resident in HBM, as during mapping — the
        # query path never re-uploads them (SURVEY.md §2.4: the reference's
        # OSS image hop is eliminated by design)
        skip = max(1, cfg.pipeline.skip_frames)
        resident = {
            i: jax.device_put(jnp.asarray(dataset[i].rgb))
            for i in range(0, len(dataset), skip)
        }
        provider = lambda img_id: resident.get(  # noqa: E731
            img_id, jnp.asarray(dataset[img_id].rgb)
        )
    engine = FSRQueryEngine(
        graph,
        clip_params,
        tok,
        cv,
        image_provider=provider,
        vlm=_make_vlm(vlm_kind, clip_params, tok, cv, cfg) if use_slow else None,
    )
    if text_override is not None:
        engine._text_cache.update(text_override)
    neg = list(getattr(cfg.pipeline, "negative_labels", ()) or ()) or None
    if warmup and instructions:
        # compile/caches warm-up (text towers, gallery encodes); the reference
        # benchmarks a long-lived warm process the same way
        engine.query_hierarchy(instructions[0], top_k=5, use_slow=use_slow,
                               negative_labels=neg)
    vlm_backend = engine.vlm if use_slow else None
    vlm_stats = getattr(vlm_backend, "stats", None)
    results = []
    for q in instructions:
        before = dict(vlm_stats) if vlm_stats is not None else None
        floor, rooms, objs, res = engine.query_hierarchy(
            q, top_k=5, use_slow=use_slow, negative_labels=neg)
        rec = {
            "instruction": q,
            "floor": floor.floor_id if floor else None,
            "rooms": [r.room_id for r in rooms],
            "objects": [o.object_id for o in objs],
            "object_names": [o.name for o in objs],
            "object_centers": [o.center().tolist() for o in objs],
            **{k: res.get(k, 0.0) for k in STAGES},
            "scores": [float(s) for s in res.get("scores", [])],
        }
        if before is not None:
            rec["vlm_work"] = {k: vlm_stats[k] - before[k] for k in before}
        results.append(rec)
    totals = [r["Total_Time"] for r in results]
    device_derived = _device_derived(results)
    correctness = None
    if gt_path:
        from ..eval import GTGraph

        correctness = _score_against_gt(results, GTGraph.from_json(gt_path))
    summary = {
        "num_queries": len(results),
        **{
            f"average_{k.lower()}": float(np.mean([r[k] for r in results])) if results else 0.0
            for k in STAGES
        },
        # latency distribution (BASELINE.md target: < 1 s p50)
        "p50_total_time": float(np.percentile(totals, 50)) if totals else 0.0,
        "p95_total_time": float(np.percentile(totals, 95)) if totals else 0.0,
        **(device_derived or {}),
        "gallery_size": len(graph.objects),
        **({"oracle_embeddings": True} if oracle else {}),
        **({"top1_acc": correctness["top1_acc"],
            "recall_at_5": correctness["recall_at_5"],
            "correctness": correctness} if correctness is not None else {}),
        "results": results,
    }
    # reference schema alias (visualize_query_graph_icra_ic4f.py:293-325)
    summary["average_total_time"] = summary.pop("average_total_time", 0.0)
    out = Path(out_path or (Path(graph_dir) / "all_results.json"))
    out.write_text(json.dumps(summary, indent=2))
    print(json.dumps({k: v for k, v in summary.items() if k != "results"}, indent=2))
    return summary


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--graph", required=True)
    ap.add_argument("--instructions", required=True, help="json list of strings")
    ap.add_argument("--config", default=None)
    ap.add_argument("--slow", action="store_true")
    ap.add_argument("--vlm", default="clip", choices=("clip", "generative", "null"))
    ap.add_argument("--out", default=None)
    ap.add_argument("--pad-gallery", type=int, default=0)
    ap.add_argument("--gt", default=None,
                    help="scene_info.json GT graph: adds top1/recall@5 fields")
    ap.add_argument("--oracle", action="store_true",
                    help="GT one-hot gallery+text embeddings (pipeline-only "
                         "retrieval row; requires --gt)")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)
    cfg = cfgmod.load(args.config, args.overrides) if args.config else cfgmod.Config()
    instructions = json.loads(Path(args.instructions).read_text())
    run(args.graph, instructions, cfg, use_slow=args.slow, out_path=args.out,
        vlm_kind=args.vlm, pad_gallery=args.pad_gallery, gt_path=args.gt,
        oracle=args.oracle)


if __name__ == "__main__":
    main()
