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
):
    graph = HMSGraph.load(graph_dir)
    clip_params, _, cv, _ = load_models(cfg)
    tok = tokenizer()
    if pad_gallery:
        # widen the object gallery to production scale with distractor
        # objects (label-text embeddings + noise): the fixture graphs hold
        # <10 objects, far below the hundreds of instances a building-scale
        # HMSG carries (reference 8-scene HM3D battery), and retrieval
        # latency/recall must be measured against a realistic gallery
        import numpy as _np

        from ..memory.nodes import Object as _Obj
        from ..utils.labels import get_label_feats as _glf

        lf, classes = _glf(clip_params, tok, cv, "SCANNET20")
        lf = _np.asarray(lf, _np.float32)
        rng = _np.random.default_rng(7)
        base_room = graph.rooms[0].room_id if graph.rooms else "room_0"
        for i in range(pad_gallery):
            e = lf[i % len(lf)] + rng.normal(0, 0.05, lf.shape[1]).astype(_np.float32)
            e /= max(_np.linalg.norm(e), 1e-9)
            graph.objects.append(_Obj(
                object_id=f"distractor_{i}", room_id=base_room,
                name=str(classes[i % len(classes)]),
                pcd_points=rng.uniform(20.0, 60.0, (4, 3)),
                embedding=e,
            ))
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
    if warmup and instructions:
        # compile/caches warm-up (text towers, gallery encodes); the reference
        # benchmarks a long-lived warm process the same way
        engine.query_hierarchy(instructions[0], top_k=5, use_slow=use_slow)
    results = []
    for q in instructions:
        floor, rooms, objs, res = engine.query_hierarchy(q, top_k=5, use_slow=use_slow)
        results.append(
            {
                "instruction": q,
                "floor": floor.floor_id if floor else None,
                "rooms": [r.room_id for r in rooms],
                "objects": [o.object_id for o in objs],
                "object_names": [o.name for o in objs],
                "object_centers": [o.center().tolist() for o in objs],
                **{k: res.get(k, 0.0) for k in STAGES},
                "scores": [float(s) for s in res.get("scores", [])],
            }
        )
    totals = [r["Total_Time"] for r in results]
    summary = {
        "num_queries": len(results),
        **{
            f"average_{k.lower()}": float(np.mean([r[k] for r in results])) if results else 0.0
            for k in STAGES
        },
        # latency distribution (BASELINE.md target: < 1 s p50)
        "p50_total_time": float(np.percentile(totals, 50)) if totals else 0.0,
        "p95_total_time": float(np.percentile(totals, 95)) if totals else 0.0,
        "gallery_size": len(graph.objects),
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
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)
    cfg = cfgmod.load(args.config, args.overrides) if args.config else cfgmod.Config()
    instructions = json.loads(Path(args.instructions).read_text())
    run(args.graph, instructions, cfg, use_slow=args.slow, out_path=args.out,
        vlm_kind=args.vlm, pad_gallery=args.pad_gallery)


if __name__ == "__main__":
    main()
