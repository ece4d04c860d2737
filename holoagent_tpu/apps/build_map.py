"""Offline map build CLI — the reference's semantic_scene_reconstruction
(reference fsr_vln/application/semantic_scene_reconstrucion_offline/
semantic_scene_reconstruction.py:61-143): dataset -> streaming mapper ->
HMSG build -> timestamped graph_<ts>/ artifact directory.

Usage:
  python -m holoagent_tpu.apps.build_map --config cfg.yaml \
      [main.scene_id=... pipeline.skip_frames=4 ...]
"""

from __future__ import annotations

import argparse
import json
import time
from datetime import datetime
from pathlib import Path

import numpy as np

from .. import config as cfgmod
from ..memory.hmsg import HMSGraph
from ..memory.mapping import Mapper
from ..utils.labels import DEFAULT_ROOM_TYPES, get_label_feats
from ..utils.ply import write_ply
from .common import load_dataset, load_models, tokenizer


def run(cfg: cfgmod.Config, dataset=None, models=None) -> Path:
    """models: optional preloaded (clip_params, sam_params, cv, sv) so batch
    drivers load checkpoints once across scenes."""
    clip_params, sam_params, cv, sv = models if models is not None else load_models(cfg)
    dataset = dataset if dataset is not None else load_dataset(cfg)
    t0 = time.time()
    import jax

    n_dev = len(jax.devices())
    sm = getattr(cfg.pipeline, "sharded_mapping", "auto")
    auto_sharded = (
        cfg.mesh.model == 1 and n_dev > 1 and (cfg.mesh.data < 0 or cfg.mesh.data > 1)
    )
    use_sharded = sm == "on" or (sm == "auto" and auto_sharded)
    if use_sharded:
        # multi-chip path: DP extraction + sharded scene fusion
        from ..memory.sharded_scene import ShardedMapper
        from ..parallel import make_mesh

        mesh = make_mesh(cfg.mesh)
        print(f"mapper: ShardedMapper over mesh {dict(mesh.shape)} "
              f"(pipeline.sharded_mapping={sm}; instance-merge order differs "
              f"from the single-device Mapper — set sharded_mapping: off for "
              f"single-device-reproducible runs)")
        mapper = ShardedMapper(cfg, clip_params, sam_params, mesh,
                               clip_variant=cv, sam_variant=sv)
        frames = [dataset[i] for i in range(0, len(dataset), cfg.pipeline.skip_frames)]
        bsz = mesh.shape["data"]
        for i in range(0, len(frames), bsz):
            mapper.process_batch(frames[i : i + bsz])
        mapped = mapper.finalize()
    else:
        print(f"mapper: single-device Mapper (pipeline.sharded_mapping={sm}, "
              f"{n_dev} device(s) visible)")
        mapper = Mapper(cfg, clip_params, sam_params, clip_variant=cv, sam_variant=sv)
        mapped = mapper.run(dataset)
    map_time = time.time() - t0
    n_frames = len(mapped.keyframes)
    print(f"mapped {n_frames} keyframes in {map_time:.1f}s "
          f"({n_frames / max(map_time, 1e-9):.2f} fps)")

    tok = tokenizer()
    try:
        label_feats, classes = get_label_feats(
            clip_params, tok, cv, cfg.pipeline.obj_labels,
            cache_dir=Path(cfg.main.save_path) / "label_cache",
            labels_dir=Path(cfg.main.dataset_path) / "labels" if cfg.main.dataset_path else None,
        )
    except (KeyError, FileNotFoundError) as e:
        print(f"vocabulary {cfg.pipeline.obj_labels!r} unavailable ({e}); "
              "falling back to SCANNET20")
        label_feats, classes = get_label_feats(
            clip_params, tok, cv, "SCANNET20",
            cache_dir=Path(cfg.main.save_path) / "label_cache",
        )
    graph = HMSGraph.build(mapped, cfg, np.asarray(label_feats), classes)
    room_types = tuple(getattr(cfg.pipeline, "room_types", ()) or DEFAULT_ROOM_TYPES)
    if room_types == DEFAULT_ROOM_TYPES:
        room_feats, _ = get_label_feats(
            clip_params, tok, cv, "ROOM_TYPES",
            cache_dir=Path(cfg.main.save_path) / "label_cache",
        )
    else:  # scene-card room types (pipeline.room_types)
        from ..models.clip import text_features_multi_template

        room_feats = text_features_multi_template(
            clip_params, tok, list(room_types), cv
        )
    graph.generate_room_names(
        np.asarray(room_feats), room_types,
        method=getattr(cfg.pipeline, "room_name_method", "view_embedding"),
    )

    out = Path(cfg.main.save_path) / cfg.main.scene_id
    ts = datetime.now().strftime("%Y%m%d_%H%M%S")
    graph_dir = out / f"graph_{ts}"
    graph.save(graph_dir)
    # full fused cloud + stats (reference save_full_pcd)
    n = int(mapped.scene.num)
    write_ply(
        out / "full_pcd.ply",
        np.asarray(mapped.scene.points())[:n],
        np.asarray(mapped.scene.colors())[:n],
    )
    stats = {
        "frames": n_frames,
        "mapping_seconds": map_time,
        "mapping_fps": n_frames / max(map_time, 1e-9),
        "scene_points": n,
        "instances": int(mapped.instances.num()),
        "floors": len(graph.floors),
        "rooms": len(graph.rooms),
        "objects": len(graph.objects),
        "views": len(graph.views),
    }
    (out / "build_stats.json").write_text(json.dumps(stats, indent=2))
    print(json.dumps(stats, indent=2))
    print(f"graph saved to {graph_dir}")
    return graph_dir


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=False)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)
    cfg = cfgmod.load(args.config, args.overrides) if args.config else cfgmod.Config()
    for ov in args.overrides if not args.config else []:
        cfg = cfgmod.apply_override(cfg, ov)
    run(cfg)


if __name__ == "__main__":
    main()
