"""Batch map-building benchmark over a scene list — the reference's HM3D
benchmark driver (reference fsr_vln/application/semantic_scene_reconstrucion_offline/
offline_mapping_create_hmsg_hm3d_benchmark.py:44-112: loop over val scenes
with per-scene skip_frames overrides, build + save each HMSG, accumulate
stats).  Optionally evaluates each built graph against a GT scene_info JSON
and emits one summary table.

Usage:
  python -m holoagent_tpu.apps.batch_map --config cfg.yaml \
      --scenes scenes.json [--gt-dir <dir with <scene>.json>]

scenes.json: [{"scene_id": "...", "dataset_path": "...", "skip_frames": 10},
              ...]   (skip_frames optional; falls back to the config value)
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

from .. import config as cfgmod
from . import build_map


def run_batch(cfg, scenes, gt_dir=None) -> dict:
    from .common import load_models

    models = load_models(cfg)  # checkpoints load ONCE across all scenes
    summary = {}
    for entry in scenes:
        scene_cfg = cfgmod.apply_override(cfg, f"main.scene_id={entry['scene_id']}")
        if entry.get("dataset_path"):
            scene_cfg = cfgmod.apply_override(
                scene_cfg, f"main.dataset_path={entry['dataset_path']}"
            )
        if entry.get("skip_frames") is not None:  # per-scene stride (:55-63)
            scene_cfg = cfgmod.apply_override(
                scene_cfg, f"pipeline.skip_frames={entry['skip_frames']}"
            )
        print(f"=== scene {entry['scene_id']} "
              f"(skip_frames={scene_cfg.pipeline.skip_frames}) ===")
        graph_dir = build_map.run(scene_cfg, models=models)
        stats_path = Path(scene_cfg.main.save_path) / entry["scene_id"] / "build_stats.json"
        stats = json.loads(stats_path.read_text()) if stats_path.exists() else {}
        stats["graph_dir"] = str(graph_dir)
        if gt_dir is not None:
            gt_path = Path(gt_dir) / f"{entry['scene_id']}.json"
            if gt_path.exists():
                from ..eval import GTGraph, HMSGEvaluator
                from ..memory.hmsg import HMSGraph

                ev = HMSGEvaluator(GTGraph.from_json(gt_path))
                stats["eval"] = ev.evaluate_all(HMSGraph.load(graph_dir))
        summary[entry["scene_id"]] = stats
    return summary


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--scenes", required=True, help="JSON list of scene entries")
    ap.add_argument("--gt-dir", default=None)
    ap.add_argument("--out", default="batch_results.json")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)
    cfg = cfgmod.load(args.config, args.overrides)
    scenes = json.loads(Path(args.scenes).read_text())
    summary = run_batch(cfg, scenes, args.gt_dir)
    Path(args.out).write_text(json.dumps(summary, indent=2))
    print(json.dumps({k: {kk: vv for kk, vv in v.items() if kk != "eval"}
                      for k, v in summary.items()}, indent=2))


if __name__ == "__main__":
    main()
