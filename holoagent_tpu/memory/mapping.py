"""Mapping pipeline: posed RGB-D frames -> fused scene + merged instances.

The TPU-native `create_feature_map`
(reference fsr_vln/memory/hmsg/graph/graph.py:262-491).  The reference runs
three host passes (accumulate cloud / per-frame SAM+CLIP+KD-fusion / merge);
here one streaming pass per frame chains five jitted stages — backproject,
scene insert, SAM x CLIP extraction, feature scatter, instance fold-in — and
the scene/instance state never leaves HBM.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..dataloader.generic import RGBDDataset, RGBDFrame
from ..models import clip as clip_mod
from ..models import sam as sam_mod
from ..ops.backproject import backproject
from ..ops.density import radius_density_keep
from ..ops.features import dominant_feature
from ..ops.voxel import GridSpec
from ..perception.extractor import (
    extract_frame_features,
    extract_frame_features_tiered,
)
from ..utils.camera import Pinhole
from . import instances as inst_mod
from . import scene as scene_mod
from .scene import fuse_pixel_features, insert_points
from .instances import InstanceSet
from .scene import SceneState


@dataclass
class MappedScene:
    """Finalized mapping result handed to HMSG construction."""

    scene: SceneState
    instances: InstanceSet
    instance_feats: jnp.ndarray  # (I, D) denoised per-instance features
    keyframes: List[RGBDFrame] = field(default_factory=list)
    keyframe_feats: Optional[jnp.ndarray] = None  # (F, D) global CLIP per frame
    density_keep: Optional[jnp.ndarray] = None  # (C,) survived radius filter


@partial(
    jax.jit,
    static_argnames=(
        "clip_variant",
        "sam_variant",
        "points_per_side",
        "max_masks",
        "mask_k_cap",
        "pixel_stride",
        "frame_voxel_capacity",
        "dtype",
    ),
)
def frame_step(
    scene: SceneState,
    instances: InstanceSet,
    clip_params,
    sam_params,
    rgb: jnp.ndarray,  # (H, W, 3) float [0,1]
    depth: jnp.ndarray,  # (H, W) metres
    cam: "Pinhole",
    pose: jnp.ndarray,  # (4, 4) c2w
    clip_variant,
    sam_variant,
    depth_cut: float,
    pred_iou_thresh: float,
    stability_thresh: float,
    min_area: float,
    masked_weight: float,
    bbox_margin: float,
    overlap_thresh: float,
    iou_thresh: float,
    points_per_side: int = 12,
    max_masks: int = 64,
    mask_k_cap: int = 2048,
    pixel_stride: int = 1,
    frame_voxel_capacity: int = 1 << 15,
    dtype=jnp.bfloat16,
    max_area_frac: float = 1.0,
    max_extent: float = float("inf"),
):
    """ONE fused frame integration program: backproject -> scene insert ->
    SAM x CLIP extraction -> feature scatter -> instance fold-in.

    The whole per-frame hot path is a single XLA executable, so per-frame cost
    is one dispatch (the reference pays dozens of host<->device transitions
    per frame, graph.py:374-441).  Returns (scene, instances, f_global)."""
    from ..ops.backproject import backproject as _bp
    from ..perception.extractor import extract_frame_features as _eff

    pts, cols, valid = _bp(depth, rgb, cam, pose, 1e-3, depth_cut)
    scene, pix_rows = insert_points.__wrapped__(scene, pts, cols, valid, fcap=frame_voxel_capacity)
    ff = _eff.__wrapped__(
        clip_params,
        sam_params,
        rgb,
        clip_variant,
        sam_variant,
        points_per_side=points_per_side,
        pred_iou_thresh=pred_iou_thresh,
        stability_thresh=stability_thresh,
        min_area=min_area,
        max_masks=max_masks,
        masked_weight=masked_weight,
        bbox_margin=bbox_margin,
        dtype=dtype,
    )
    m = ff.masks.shape[0]
    masks_flat = ff.masks.reshape(m, -1)
    scene = fuse_pixel_features.__wrapped__(
        scene, pix_rows, masks_flat, ff.valid, ff.f_masks
    )
    finst = inst_mod.frame_instances.__wrapped__(
        masks_flat, ff.valid, ff.f_masks, pix_rows, pts, min_rows=3,
        k_cap=mask_k_cap, stride=pixel_stride, grid=scene.grid,
        max_area_frac=max_area_frac, max_extent=max_extent,
    )
    out_cap = instances.rows.shape[0]
    instances = inst_mod.merge_round.__wrapped__(
        inst_mod.concat(instances, finst), overlap_thresh, iou_thresh, out_cap,
        bbox_pad=0.5 * scene.grid.voxel_size, coarse_only=True,
        max_extent=max_extent,
    )
    return scene, instances, ff.f_global


class Mapper:
    """Streaming mapper. Host code only sequences jitted stages."""

    def __init__(
        self,
        cfg: Config,
        clip_params: Dict[str, Any],
        sam_params: Dict[str, Any],
        clip_variant: Optional[clip_mod.CLIPVariant] = None,
        sam_variant: Optional[sam_mod.SAMVariant] = None,
        grid: Optional[GridSpec] = None,
    ):
        self.cfg = cfg
        self.clip_params = clip_params
        self.sam_params = sam_params
        self.clip_variant = clip_variant or clip_mod.VARIANTS[cfg.models.clip.type]
        self.sam_variant = sam_variant or sam_mod.VARIANTS[cfg.models.sam.type]
        p = cfg.pipeline
        self.grid = grid or GridSpec.centered(p.voxel_size)
        d = self.clip_variant.embed_dim
        self.scene = scene_mod.init_scene(self.grid, p.point_capacity, d)
        k_cap = p.mask_point_capacity
        self.instances = inst_mod.empty_instances(p.instance_capacity, k_cap, d)
        self.keyframes: List[RGBDFrame] = []
        self._kf_feats: List[np.ndarray] = []
        # hierarchical merge: binary counter of per-height partial merges
        self._hier_slots: Dict[int, inst_mod.InstanceSet] = {}
        # paired merge: frames since the last full all-pairs round
        self._frames_since_full = 0
        self._dtype = jnp.bfloat16 if cfg.models.clip.dtype == "bfloat16" else jnp.float32

    # -- per-frame ----------------------------------------------------------

    def _pixel_stride(self, frame: RGBDFrame) -> int:
        s = self.cfg.pipeline.instance_pixel_stride
        if s > 0:
            return s
        n_pix = frame.rgb.shape[0] * frame.rgb.shape[1]
        return max(1, n_pix // 32768)

    def process_frame(self, frame: RGBDFrame, ff=None) -> None:
        """Integrate one frame (fused single program or staged programs per
        cfg.pipeline.fused_frame_step).

        ff: optional precomputed FrameFeatures (oracle perception for the
        eval protocol, or features extracted elsewhere, e.g. extract_frames_dp
        batches); forces the staged path."""
        p = self.cfg.pipeline
        # the fused single-program step folds instances sequentially inside
        # the program; hierarchical merging needs the staged path
        if ff is None and p.fused_frame_step and p.merge_type not in (
            "hierarchical", "paired",
        ):
            self.scene, self.instances, f_g = frame_step(
                self.scene,
                self.instances,
                self.clip_params,
                self.sam_params,
                jnp.asarray(frame.rgb),
                jnp.asarray(frame.depth),
                Pinhole.from_matrix(frame.k),
                jnp.asarray(frame.pose),
                self.clip_variant,
                self.sam_variant,
                depth_cut=self.cfg.main.depth_cut,
                pred_iou_thresh=self.cfg.models.sam.pred_iou_thresh,
                stability_thresh=self.cfg.models.sam.stability_score_thresh,
                min_area=float(self.cfg.models.sam.min_mask_region_area),
                masked_weight=p.clip_masked_weight,
                bbox_margin=float(p.clip_bbox_margin),
                overlap_thresh=p.init_overlap_thresh,
                iou_thresh=p.iou_thresh,
                points_per_side=self.cfg.models.sam.points_per_side,
                max_masks=self.cfg.models.sam.max_masks,
                mask_k_cap=p.mask_point_capacity,
                pixel_stride=self._pixel_stride(frame),
                frame_voxel_capacity=p.frame_voxel_capacity,
                dtype=self._dtype,
                max_area_frac=p.instance_max_area_frac,
                max_extent=p.instance_max_extent_m,
            )
        else:
            self.scene, self.instances, f_g = self._staged_step(frame, ff)
        self.keyframes.append(frame)
        self._kf_feats.append(np.asarray(f_g, np.float32))

    def _staged_step(self, frame: RGBDFrame, ff=None):
        p = self.cfg.pipeline
        cam = Pinhole.from_matrix(frame.k)
        rgb = jnp.asarray(frame.rgb)
        pts, cols, valid = backproject(
            jnp.asarray(frame.depth), rgb, cam, jnp.asarray(frame.pose),
            1e-3, self.cfg.main.depth_cut,
        )
        scene, pix_rows = scene_mod.insert_points(
            self.scene, pts, cols, valid, fcap=p.frame_voxel_capacity
        )
        if ff is None:
            extract_fn = (
                extract_frame_features_tiered
                if getattr(p, "extract_tiering", False)
                else extract_frame_features
            )
            ff = extract_fn(
                self.clip_params, self.sam_params, rgb,
                self.clip_variant, self.sam_variant,
                points_per_side=self.cfg.models.sam.points_per_side,
                pred_iou_thresh=self.cfg.models.sam.pred_iou_thresh,
                stability_thresh=self.cfg.models.sam.stability_score_thresh,
                min_area=float(self.cfg.models.sam.min_mask_region_area),
                max_masks=self.cfg.models.sam.max_masks,
                masked_weight=p.clip_masked_weight,
                bbox_margin=float(p.clip_bbox_margin),
                dtype=self._dtype,
                impl=p.extract_impl,
                clip_impl=getattr(p, "extract_clip_impl", "xla"),
            )
        masks_flat = ff.masks.reshape(ff.masks.shape[0], -1)
        scene = scene_mod.fuse_pixel_features(
            scene, pix_rows, masks_flat, ff.valid, ff.f_masks
        )
        finst = inst_mod.frame_instances(
            masks_flat, ff.valid, ff.f_masks, pix_rows, pts,
            min_rows=3, k_cap=p.mask_point_capacity,
            stride=self._pixel_stride(frame), grid=self.grid,
            max_area_frac=p.instance_max_area_frac,
            max_extent=p.instance_max_extent_m,
        )
        if p.merge_type == "hierarchical":
            # binary-counter streaming fold (reference graph_utils.py:989-1012
            # hierarchical_merge semantics — pairwise tree merges — but with
            # only O(log F) sets resident in HBM: whenever two sets of the
            # same tree height meet, they merge and carry to the next height)
            self._hier_push(finst, height=0)
            return scene, self.instances, ff.f_global
        if p.merge_type == "paired":
            # sort-free fold: frame->global pairwise unions via merge-path
            # searchsorted (instances.paired_merge_step); a full all-pairs
            # round every N frames (plus finalize's) consolidates the
            # global-global and collision-deferred merges
            instances = inst_mod.paired_merge_step(
                self.instances, finst, p.init_overlap_thresh, p.iou_thresh,
                bbox_pad=0.5 * p.voxel_size, coarse_only=True,
                max_extent=p.instance_max_extent_m,
            )
            self._frames_since_full += 1
            if self._frames_since_full >= p.paired_full_round_every:
                instances = inst_mod.merge_round(
                    instances, p.init_overlap_thresh, p.iou_thresh,
                    out_cap=instances.rows.shape[0],
                    bbox_pad=0.5 * p.voxel_size, coarse_only=True,
                    max_extent=p.instance_max_extent_m,
                )
                self._frames_since_full = 0
            return scene, instances, ff.f_global
        instances = inst_mod.seq_merge_step(
            self.instances, finst, p.init_overlap_thresh, p.iou_thresh,
            bbox_pad=0.5 * p.voxel_size, coarse_only=True,
            max_extent=p.instance_max_extent_m,
        )
        return scene, instances, ff.f_global

    def run(self, dataset: RGBDDataset) -> "MappedScene":
        skip = self.cfg.pipeline.skip_frames
        bsz = max(1, getattr(self.cfg.pipeline, "extract_frames_per_dispatch", 1))
        idxs = list(range(0, len(dataset), skip))
        if bsz == 1:
            for i in idxs:
                self.process_frame(dataset[i])
            return self.finalize()
        # batched extraction: one SAM+CLIP dispatch covers bsz frames (the
        # matmul row counts multiply by bsz — see extractor.
        # extract_frames_batched), then the per-frame fusion/merge stages
        # run in the original frame order (identical results to bsz=1)
        from ..perception.extractor import extract_frames_batched

        p = self.cfg.pipeline
        for s in range(0, len(idxs), bsz):
            frames = [dataset[i] for i in idxs[s : s + bsz]]
            if len(frames) > 1:
                imgs = jnp.stack([jnp.asarray(f.rgb) for f in frames])
                ffb = extract_frames_batched(
                    self.clip_params, self.sam_params, imgs,
                    self.clip_variant, self.sam_variant,
                    points_per_side=self.cfg.models.sam.points_per_side,
                    pred_iou_thresh=self.cfg.models.sam.pred_iou_thresh,
                    stability_thresh=self.cfg.models.sam.stability_score_thresh,
                    min_area=float(self.cfg.models.sam.min_mask_region_area),
                    max_masks=self.cfg.models.sam.max_masks,
                    masked_weight=p.clip_masked_weight,
                    bbox_margin=float(p.clip_bbox_margin),
                    dtype=self._dtype,
                    impl=p.extract_impl,
                    clip_impl=getattr(p, "extract_clip_impl", "xla"),
                )
                for j, frame in enumerate(frames):
                    self.process_frame(
                        frame, ff=jax.tree.map(lambda a: a[j], ffb)
                    )
            else:
                self.process_frame(frames[0])
        return self.finalize()

    # -- finalize ------------------------------------------------------------

    def _hier_th(self, height: int) -> float:
        """Per-height overlap threshold: decays with tree height (the role of
        the reference's per-level decay, graph_utils.py:1002-1003)."""
        p = self.cfg.pipeline
        return p.init_overlap_thresh - p.overlap_thresh_factor * height

    def _hier_push(self, inst: inst_mod.InstanceSet, height: int) -> None:
        """Binary-counter carry: merge equal-height partials upward."""
        p = self.cfg.pipeline
        out_cap = self.instances.rows.shape[0]
        while height in self._hier_slots:
            other = self._hier_slots.pop(height)
            cat = inst_mod.concat(other, inst)
            inst = inst_mod.merge_round(
                cat, self._hier_th(height), p.iou_thresh,
                min(out_cap, cat.rows.shape[0]), bbox_pad=0.5 * p.voxel_size, coarse_only=True,
                max_extent=p.instance_max_extent_m,
            )
            height += 1
        self._hier_slots[height] = inst

    def finalize(self) -> MappedScene:
        p = self.cfg.pipeline
        if self._hier_slots:
            # drain the counter: fold remaining partials lowest-height first
            out_cap = self.instances.rows.shape[0]
            acc = None
            h_max = 0
            for h in sorted(self._hier_slots):
                s = self._hier_slots[h]
                h_max = max(h_max, h)
                if acc is None:
                    acc = s
                else:
                    cat = inst_mod.concat(acc, s)
                    acc = inst_mod.merge_round(
                        cat, self._hier_th(h), p.iou_thresh,
                        min(out_cap, cat.rows.shape[0]), bbox_pad=0.5 * p.voxel_size, coarse_only=True,
                        max_extent=p.instance_max_extent_m,
                    )
            self._hier_slots = {}
            self.instances = inst_mod.seq_merge_step(
                self.instances, acc, self._hier_th(h_max), p.iou_thresh,
                bbox_pad=0.5 * p.voxel_size, coarse_only=True,
                max_extent=p.instance_max_extent_m,
            )
        # final merge pass (reference seq_merge's trailing merge)
        self.instances = inst_mod.merge_round(
            self.instances,
            p.init_overlap_thresh,
            p.iou_thresh,
            out_cap=self.instances.rows.shape[0],
            bbox_pad=0.5 * p.voxel_size, coarse_only=True,
            max_extent=p.instance_max_extent_m,
        )
        # drop tiny instances (reference graph.py:442-446, <10 points)
        keep = self.instances.count >= max(10, 1)
        self.instances = self.instances._replace(valid=self.instances.valid & keep)
        inst_feats = refine_instance_features(
            self.scene, self.instances, eps=p.feature_dbscan_eps
        )
        density = radius_density_keep(
            self.scene.points(),
            self.scene.valid(),
            self.scene.count,
            radius=1.0,
            min_neighbors=1000.0,
        )
        kf = (
            jnp.asarray(np.stack(self._kf_feats))
            if self._kf_feats
            else jnp.zeros((0, self.clip_variant.embed_dim))
        )
        return MappedScene(
            scene=self.scene,
            instances=self.instances,
            instance_feats=inst_feats,
            keyframes=self.keyframes,
            keyframe_feats=kf,
            density_keep=density,
        )


@jax.jit
def _refine_chunk(scene_feats, rows, valid_rows, eps):
    feats = scene_feats[jnp.clip(rows, 0)]  # (B, K, D)
    feats = jnp.where(valid_rows[..., None], feats, 0.0)
    return jax.vmap(lambda f, v: dominant_feature(f, v, eps=eps, min_points=100.0))(
        feats, valid_rows
    )


def refine_instance_features(
    scene: SceneState, inst: InstanceSet, eps: float = 0.01, chunk: int = 32
) -> jnp.ndarray:
    """Per-instance feature = dominant-cluster mean of member scene-point
    features (reference graph.py:452-488: gather full_feats_array at mask
    points, feats_denoise_dbscan).  Falls back to the accumulated mask-feature
    mean for instances whose members carry no fused features."""
    from ..ops.compact import I32_MAX

    sfeats = scene.feats()
    i_cap = inst.rows.shape[0]
    outs = []
    for s in range(0, i_cap, chunk):
        rows = inst.rows[s : s + chunk]
        vr = (rows != I32_MAX) & inst.valid[s : s + chunk, None]
        outs.append(_refine_chunk(sfeats, rows, vr, jnp.float32(eps)))
    refined = jnp.concatenate(outs, axis=0)
    fallback = inst.feats()
    use_ref = jnp.linalg.norm(refined, axis=-1) > 1e-6
    return jnp.where(use_ref[:, None], refined, fallback)
