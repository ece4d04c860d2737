"""Shared app plumbing: model/dataset construction from config."""

from __future__ import annotations

from typing import Tuple

import jax

from ..config import Config
from ..models import clip as clip_mod
from ..models import sam as sam_mod
from ..models.tokenizer import SimpleTokenizer


def load_models(cfg: Config):
    """CLIP + SAM params per config: converted checkpoints when paths are
    given (reference checkpoints/ layout), random init otherwise."""
    cv = clip_mod.VARIANTS[cfg.models.clip.type]
    sv = sam_mod.VARIANTS[cfg.models.sam.type]
    if cfg.models.clip.checkpoint:
        clip_params = clip_mod.load_checkpoint(cfg.models.clip.checkpoint, cv)
    else:
        clip_params = clip_mod.init_clip(jax.random.key(cfg.main.seed), cv)
    if cfg.models.clip.quant:
        clip_params = clip_mod.quantize_clip(clip_params)
    if cfg.models.sam.checkpoint:
        sam_params = sam_mod.load_checkpoint(cfg.models.sam.checkpoint, sv)
    else:
        sam_params = sam_mod.init_sam(jax.random.key(cfg.main.seed + 1), sv)
    if cfg.models.sam.quant:
        sam_params = sam_mod.quantize_sam(sam_params)
    return clip_params, sam_params, cv, sv


def load_dataset(cfg: Config):
    name = cfg.main.dataset
    if name == "synthetic":
        from ..dataloader.synthetic import SyntheticDataset, SyntheticScene

        scene = None
        if cfg.main.layout != "two_room":
            scene = getattr(SyntheticScene, cfg.main.layout)(cfg.main.seed)
        return SyntheticDataset(
            scene=scene,
            seed=cfg.main.seed,
            num_frames=cfg.main.num_frames,
            hw=(cfg.main.frame_h, cfg.main.frame_w),
        )
    if name == "horizon":
        from ..dataloader.horizon import HorizonDataset

        return HorizonDataset(cfg.main.dataset_path, cfg.main.scene_id, cfg.main.depth_cut)
    if name == "scannet":
        from ..dataloader.scannet import ScannetDataset

        return ScannetDataset(cfg.main.dataset_path, cfg.main.scene_id, cfg.main.depth_cut)
    if name == "hm3dsem":
        from ..dataloader.hm3dsem import HM3DSemDataset

        return HM3DSemDataset(cfg.main.dataset_path, cfg.main.scene_id, cfg.main.depth_cut)
    if name == "replica":
        from ..dataloader.replica import ReplicaDataset

        return ReplicaDataset(cfg.main.dataset_path, cfg.main.scene_id, cfg.main.depth_cut)
    raise KeyError(f"unknown dataset {name!r}")


def tokenizer() -> SimpleTokenizer:
    return SimpleTokenizer()
