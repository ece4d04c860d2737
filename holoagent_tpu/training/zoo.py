"""Fixture-tower zoo: train-once, cache-to-disk perception towers.

The neural accuracy row (apps/eval_protocol.py), the query-correctness suite
(apps/query_bench.py --gt) and several tests all need the SAME fixture-trained
tiny towers (training.perception).  Training them takes minutes on the single
host core, so each consumer used to retrain from scratch — the dominant cost
of the test suite (VERDICT r3 weak #8).  This module trains once per
(recipe-tag, seed) and caches the parameter pytrees as .npz files; every
consumer loads the cached weights in milliseconds.

Cache location: $HOLOAGENT_TOWER_CACHE or /tmp/holoagent_tpu/towers.  The tag
encodes the training recipe version — bump ``RECIPE_TAG`` whenever the recipe
or the fixture scenes change so stale caches never leak across versions.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

# bump on any change to the training recipe, fixture scenes, or tower variants
RECIPE_TAG = "r5a"  # r4c: SAM trained on background STRUCTURE regions too;
# r4d: CLIP trained on the deployed plain/masked BLEND feature;
# r4e: CLIP trained on structure/background windows too ("background" class
# anchors the reference-parity negative-prompt gate); r4f: 240x320 fixtures;
# r4g: color-separated fixture palette (synthetic._TWO_FLOOR_COLORS contract);
# r4h: 3x training trajectories (48/48/72 frames) — more crop views per
# category and ~16 room frames per room type for the naming head;
# r4i: crop margin 16 px = the deployed clip_bbox_margin (train/deploy
# context-window parity);
# r5a: CLIP steps 1200 -> 3000 with room-frame jitter 2 (winner of the
# round-5 A/B/C/D sweep: held-out room-frame acc 0.54 -> 0.63, crop top-1
# 0.41 -> 0.54; longer training alone REGRESSED crops to 0.34 — the
# augmentation is what buys the gain)

# GT room footprints per fixture layout (x0, y0, x1, y1, category[, floor])
ROOM_RECTS = {
    "two_room": [(0.0, 0.0, 4.0, 6.0, "bedroom"), (4.0, 0.0, 8.0, 6.0, "kitchen")],
    "three_room": [(0.0, 0.0, 4.0, 6.0, "bedroom"),
                   (4.0, 0.0, 8.0, 6.0, "living room"),
                   (8.0, 0.0, 12.0, 6.0, "bathroom")],
}

DEFAULT_CACHE = Path(os.environ.get("HOLOAGENT_TOWER_CACHE",
                                    "/tmp/holoagent_tpu/towers"))


# ---------------------------------------------------------------------------
# Param pytree <-> npz
# ---------------------------------------------------------------------------


def save_params(path: Path, params) -> None:
    """Persist a nested-dict param pytree as one .npz (keys = '/'-joined)."""
    import jax

    path = Path(path)
    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        flat[key] = np.asarray(leaf)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(".tmp.npz")
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def load_params(path: Path):
    """Inverse of save_params (nested dicts keyed by '/'-split path).
    Dict levels whose keys are all decimal ints were LISTS before saving
    (tree paths flatten list indices the same way as dict keys) — restore
    them, or consumers that iterate (e.g. sam encoder ``blocks``) walk
    string keys instead of block pytrees."""
    import jax.numpy as jnp

    out: dict = {}
    with np.load(path) as z:
        for key in z.files:
            node = out
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(z[key])

    def _relist(node):
        if not isinstance(node, dict):
            return node
        node = {k: _relist(v) for k, v in node.items()}
        if node and all(k.isdigit() for k in node):
            return [node[str(i)] for i in range(len(node))]
        return node

    return _relist(out)


# ---------------------------------------------------------------------------
# Fixture towers
# ---------------------------------------------------------------------------


def _fixture_datasets(seed_base: int = 100):
    """Held-out training trajectories over all three fixture layouts (the
    eval/benchmark trajectories use seeds < 100)."""
    from ..dataloader.synthetic import SyntheticDataset, SyntheticScene

    return [
        # 240x320: at 120x160 the small fixtures (toilet, lamp) render a few
        # hundred pixels and their crops blur into each other — resolution
        # was the binding constraint on tower quality (measured round 4)
        SyntheticDataset(scene=SyntheticScene.two_room(), num_frames=48,
                         hw=(240, 320), seed=seed_base, gaze_heights=(0.8, 2.2)),
        SyntheticDataset(scene=SyntheticScene.three_room(), num_frames=48,
                         hw=(240, 320), seed=seed_base + 1, gaze_heights=(0.8, 2.2)),
        SyntheticDataset(scene=SyntheticScene.two_floor(), num_frames=72,
                         hw=(240, 320), seed=seed_base + 2, gaze_heights=(0.8, 2.2)),
    ]


def fixture_labels() -> list:
    """The union training vocabulary: two_floor's 18 categories + wall/floor
    (cover the other layouts) + "background" — the trained anchor for the
    engine's reference-parity negative-prompt gate (reference graph.py:3497
    negative_labels=["background"]); supervised by mixed-structure windows
    (training/perception.collect_crops structure=True)."""
    from ..dataloader.synthetic import SyntheticScene

    return SyntheticScene.two_floor().labels() + ["background"]


def fixture_towers(
    steps_clip: int = 3000,
    steps_sam: int = 6000,
    seed: int = 0,
    cache_dir: Optional[Path] = None,
    retrain: bool = False,
    verbose: bool = False,
) -> Tuple[dict, dict]:
    """(clip_params, sam_params) for the fixture world, cached on disk.

    CLIP: test-tiny towers, contrastive on GT crops over the union vocabulary.
    SAM: fixture-tiny, promptable-mask + IoU-head supervision.
    """
    cache = Path(cache_dir) if cache_dir is not None else DEFAULT_CACHE
    key = f"{RECIPE_TAG}_c{steps_clip}_s{steps_sam}_seed{seed}"
    clip_path = cache / f"clip_{key}.npz"
    sam_path = cache / f"sam_{key}.npz"
    meta_path = cache / f"meta_{key}.json"
    if not retrain and clip_path.exists() and sam_path.exists():
        return load_params(clip_path), load_params(sam_path)

    from .perception import train_tiny_clip, train_tiny_sam

    from ..dataloader.synthetic import SyntheticScene

    ds = _fixture_datasets()
    labels = fixture_labels()
    rects_by_ds = [
        ROOM_RECTS["two_room"],
        ROOM_RECTS["three_room"],
        SyntheticScene.two_floor_room_rects(),
    ]
    clip_params, clip_losses = train_tiny_clip(
        ds, labels, steps=steps_clip, seed=seed, room_rects_by_ds=rects_by_ds,
        room_frame_jitter=2,
    )
    if verbose:
        print(f"tiny CLIP trained: loss {clip_losses[0]:.3f} -> "
              f"{np.mean(clip_losses[-50:]):.3f}")
    sam_params, sam_losses = train_tiny_sam(
        ds, steps=steps_sam, seed=seed, variant_name="fixture-tiny", lr=2e-3
    )
    if verbose:
        print(f"tiny SAM trained: loss {sam_losses[0]:.3f} -> "
              f"{np.mean(sam_losses[-50:]):.3f}")
    save_params(clip_path, clip_params)
    save_params(sam_path, sam_params)
    meta_path.write_text(json.dumps({
        "recipe": RECIPE_TAG, "steps_clip": steps_clip, "steps_sam": steps_sam,
        "seed": seed, "labels": labels,
        "clip_final_loss": float(np.mean(clip_losses[-50:])),
        "sam_final_loss": float(np.mean(sam_losses[-50:])),
    }))
    return clip_params, sam_params
