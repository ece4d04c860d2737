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


def run(
    graph_dir: str,
    instructions: List[str],
    cfg: cfgmod.Config,
    use_slow: bool = False,
    out_path: str | None = None,
    dataset=None,
):
    graph = HMSGraph.load(graph_dir)
    clip_params, _, cv, _ = load_models(cfg)
    tok = tokenizer()
    provider = None
    if use_slow:
        dataset = dataset if dataset is not None else load_dataset(cfg)
        provider = lambda img_id: dataset[img_id].rgb  # noqa: E731
    engine = FSRQueryEngine(
        graph,
        clip_params,
        tok,
        cv,
        image_provider=provider,
        vlm=ClipVLM(clip_params, tok, cv) if use_slow else None,
    )
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
    summary = {
        "num_queries": len(results),
        **{
            f"average_{k.lower()}": float(np.mean([r[k] for r in results])) if results else 0.0
            for k in STAGES
        },
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
    ap.add_argument("--out", default=None)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)
    cfg = cfgmod.load(args.config, args.overrides) if args.config else cfgmod.Config()
    instructions = json.loads(Path(args.instructions).read_text())
    run(args.graph, instructions, cfg, use_slow=args.slow, out_path=args.out)


if __name__ == "__main__":
    main()
