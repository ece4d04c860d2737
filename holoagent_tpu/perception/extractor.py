"""ConceptFusion-style per-frame feature extraction, fused on-device.

TPU-native rebuild of the reference extractor
(reference fsr_vln/perception/models/sam_clip_feats_extractor.py:82-191):

  reference (host-orchestrated, per-crop python loops):
    SAM.generate -> PIL crops (plain + background-blanked) -> CLIP per batch
    -> blend by maskedd_weight -> softmax(local . global) -> per-pixel fusion
  here (one trace, fixed budgets):
    generate_masks (fixed M) -> batched crop_and_resize (plain + masked)
    -> ONE CLIP encode over the 2M+1 stack (crops + full frame)
    -> the same blend/softmax/fusion math as masked array ops.

Per-pixel features are not materialized by default: downstream voxel fusion
consumes (masks, F_p) directly, so the HxWxD tensor the reference allocates on
every frame (graph.py:380-415) never exists.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models import clip as clip_mod
from ..models import sam as sam_mod
from ..ops import masks as mask_ops
from ..ops.crop_resize import crop_and_resize, expand_boxes


class FrameFeatures(NamedTuple):
    """Fixed-budget per-frame extraction result.

    masks:   (M, H, W) bool
    valid:   (M,) bool
    boxes:   (M, 4) pixel boxes
    f_masks: (M, D) fused per-mask CLIP features (the reference's F_p)
    f_global:(D,) whole-frame CLIP feature (F_g)
    """

    masks: jnp.ndarray
    valid: jnp.ndarray
    boxes: jnp.ndarray
    f_masks: jnp.ndarray
    f_global: jnp.ndarray


def _l2(x, axis=-1, eps=1e-9):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


@partial(
    jax.jit,
    static_argnames=(
        "clip_variant",
        "sam_variant",
        "points_per_side",
        "max_masks",
        "dtype",
        "impl",
        "clip_impl",
        "clip_qmm",
    ),
)
def extract_frame_features(
    clip_params: Dict[str, Any],
    sam_params: Dict[str, Any],
    image01: jnp.ndarray,  # (H, W, 3) float [0,1]
    clip_variant: clip_mod.CLIPVariant,
    sam_variant: sam_mod.SAMVariant,
    points_per_side: int = 12,
    pred_iou_thresh: float = 0.88,
    stability_thresh: float = 0.95,
    min_area: float = 100.0,
    max_masks: int = 64,
    masked_weight: float = 0.4418,  # reference config clip_masked_weight
    bbox_margin: float = 50.0,  # reference config clip_bbox_margin
    dtype=jnp.bfloat16,
    impl: str = "xla",  # "flash" -> Pallas rel-pos flash attn in SAM layers
    clip_impl: str = "xla",  # CLIP tower attention impl ("flash": the
    # head-folded whole-block kernel — fused extract 253 -> 234 ms on v5e
    # since the round-3 kernel rework; default stays "xla" for CPU tests,
    # bench.py passes "flash")
    clip_qmm: str = "xla",  # int8 matmul path ("pallas" = ops/quant_matmul
    # fused dynamic-quant kernel; no-op for bf16 towers)
) -> FrameFeatures:
    h, w, _ = image01.shape
    gen = sam_mod.generate_masks(
        sam_params,
        image01,
        sam_variant,
        points_per_side=points_per_side,
        pred_iou_thresh=pred_iou_thresh,
        stability_thresh=stability_thresh,
        min_area=min_area,
        max_masks=max_masks,
        dtype=dtype,
        impl=impl,
    )
    masks, valid = gen["masks"], gen["valid"]
    # make the mask set pixel-disjoint: smallest covering mask wins each
    # pixel (the reference's filter_masks containment-carving,
    # sam_utils.py:10-33, generalized to partial overlaps) — without this a
    # background mask that covers an object merges with it downstream at
    # overlap ~1 and instance folds collapse (ops/masks.to_disjoint)
    masks = mask_ops.to_disjoint(masks, valid)
    valid = valid & masks.any(axis=(-1, -2))
    # crop at the SURVIVING mask's own tight bbox (the reference crops at
    # mask["bbox"], the bbox OF the segmentation, sam_utils.py:113,143 — its
    # masks are never carved so box == mask bbox there; after the disjoint
    # carve the pre-carve SAM box can span several objects and the crop
    # feature degrades: measured 0.45 -> 0.69 per-mask label top-1 on the
    # trained fixture towers)
    boxes = mask_ops.boxes_from_masks(masks)
    eboxes = expand_boxes(boxes, bbox_margin, h, w)
    size = clip_variant.image_size
    crops_plain = crop_and_resize(image01, eboxes, size)
    crops_masked = crop_and_resize(image01, eboxes, size, masks=masks)
    frame = jax.image.resize(image01[None], (1, size, size, 3), method="cubic")
    stack = jnp.concatenate([crops_plain, crops_masked, frame], axis=0)
    mean = jnp.asarray(clip_mod.IMAGE_MEAN, stack.dtype)
    std = jnp.asarray(clip_mod.IMAGE_STD, stack.dtype)
    stack = (stack - mean) / std
    feats = clip_mod.encode_image(
        clip_params, stack, clip_variant, dtype=dtype, impl=clip_impl, qmm=clip_qmm
    )
    feats = feats.astype(jnp.float32)
    m = max_masks
    f_plain, f_masked, f_g = feats[:m], feats[m : 2 * m], feats[2 * m]
    # blend masked/plain crop features, renormalize (reference :159-162)
    f_l = _l2(masked_weight * f_masked + (1.0 - masked_weight) * f_plain)
    # softmax weighting of local-vs-global (ConceptFusion, reference :167-172)
    phi = jnp.einsum("md,d->m", f_l, f_g, preferred_element_type=jnp.float32)
    w_i = jax.nn.softmax(jnp.where(valid, phi, -jnp.inf))[:, None]
    w_i = jnp.where(valid[:, None], w_i, 0.0)
    f_p = _l2(w_i * f_g[None, :] + (1.0 - w_i) * f_l)
    f_p = jnp.where(valid[:, None], f_p, 0.0)
    return FrameFeatures(
        masks=masks, valid=valid, boxes=boxes, f_masks=f_p, f_global=f_g
    )


# ---------------------------------------------------------------------------
# Tiered extraction: crop capacity sized to the frame's actual mask count
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=(
        "sam_variant", "points_per_side", "max_masks", "dtype", "impl",
    ),
)
def _mask_stage(
    sam_params, image01, sam_variant, points_per_side, pred_iou_thresh,
    stability_thresh, min_area, max_masks, dtype, impl,
):
    gen = sam_mod.generate_masks(
        sam_params, image01, sam_variant,
        points_per_side=points_per_side, pred_iou_thresh=pred_iou_thresh,
        stability_thresh=stability_thresh, min_area=min_area,
        max_masks=max_masks, dtype=dtype, impl=impl,
    )
    masks = mask_ops.to_disjoint(gen["masks"], gen["valid"])
    valid = gen["valid"] & masks.any(axis=(-1, -2))
    # tight post-carve boxes — see extract_frame_features (reference
    # sam_utils.py:113,143 crops at the segmentation's own bbox)
    return masks, valid, mask_ops.boxes_from_masks(masks), valid.sum()


@partial(
    jax.jit,
    static_argnames=("clip_variant", "tier", "dtype", "clip_impl", "clip_qmm"),
)
def _clip_stage(
    clip_params, image01, masks, valid, boxes, clip_variant, tier,
    masked_weight, bbox_margin, dtype, clip_impl, clip_qmm,
):
    h, w, _ = image01.shape
    m = masks.shape[0]
    # stable valid-first permutation: the first `tier` slots hold every valid
    # mask whenever valid_count <= tier (the host guarantees that)
    order = jnp.argsort(~valid)
    sel = order[:tier]
    masks_t, boxes_t, valid_t = masks[sel], boxes[sel], valid[sel]
    eboxes = expand_boxes(boxes_t, bbox_margin, h, w)
    size = clip_variant.image_size
    crops_plain = crop_and_resize(image01, eboxes, size)
    crops_masked = crop_and_resize(image01, eboxes, size, masks=masks_t)
    frame = jax.image.resize(image01[None], (1, size, size, 3), method="cubic")
    stack = jnp.concatenate([crops_plain, crops_masked, frame], axis=0)
    mean = jnp.asarray(clip_mod.IMAGE_MEAN, stack.dtype)
    std = jnp.asarray(clip_mod.IMAGE_STD, stack.dtype)
    stack = (stack - mean) / std
    feats = clip_mod.encode_image(
        clip_params, stack, clip_variant, dtype=dtype, impl=clip_impl,
        qmm=clip_qmm,
    ).astype(jnp.float32)
    f_plain, f_masked, f_g = feats[:tier], feats[tier : 2 * tier], feats[2 * tier]
    f_l = _l2(masked_weight * f_masked + (1.0 - masked_weight) * f_plain)
    phi = jnp.einsum("md,d->m", f_l, f_g, preferred_element_type=jnp.float32)
    w_i = jax.nn.softmax(jnp.where(valid_t, phi, -jnp.inf))[:, None]
    w_i = jnp.where(valid_t[:, None], w_i, 0.0)
    f_p = _l2(w_i * f_g[None, :] + (1.0 - w_i) * f_l)
    f_p = jnp.where(valid_t[:, None], f_p, 0.0)
    f_full = jnp.zeros((m, f_p.shape[-1]), f_p.dtype).at[sel].set(f_p)
    return f_full, f_g


def extract_frame_features_tiered(
    clip_params: Dict[str, Any],
    sam_params: Dict[str, Any],
    image01: jnp.ndarray,
    clip_variant: clip_mod.CLIPVariant,
    sam_variant: sam_mod.SAMVariant,
    points_per_side: int = 12,
    pred_iou_thresh: float = 0.88,
    stability_thresh: float = 0.95,
    min_area: float = 100.0,
    max_masks: int = 64,
    masked_weight: float = 0.4418,
    bbox_margin: float = 50.0,
    dtype=jnp.bfloat16,
    impl: str = "xla",
    clip_impl: str = "xla",
    clip_qmm: str = "xla",
    tiers: Tuple[int, ...] = (16, 32),
) -> FrameFeatures:
    """Two-dispatch extraction with crop capacity sized to the frame.

    The single-program path always encodes 2*max_masks+1 CLIP crops — the
    worst case — but real frames at the reference's filter settings
    (pred_iou 0.88 / stability 0.95, sam_clip_feats_extractor.py:117) carry
    far fewer masks, and the reference itself only encodes the actual mask
    count.  The TPU-native equivalent of that dynamic batch is a small set
    of fixed CAPACITY TIERS: the mask stage runs first, the host fetches the
    valid count (one scalar), and the CLIP+fusion stage dispatches at the
    smallest tier that fits.  Identical results to the single-program path
    (the fusion softmax only ever sees valid rows); the only cost is one
    extra dispatch round-trip, repaid several times over by the smaller crop
    batch (CLIP time scales linearly in the tier).
    """
    masks, valid, boxes, nv = _mask_stage(
        sam_params, image01, sam_variant, points_per_side, pred_iou_thresh,
        stability_thresh, min_area, max_masks, dtype, impl,
    )
    n = int(nv)  # host sync: one scalar through the tunnel
    tier = max_masks
    for t in sorted(tiers):
        if t >= n and t <= max_masks:
            tier = t
            break
    f_masks, f_g = _clip_stage(
        clip_params, image01, masks, valid, boxes, clip_variant, tier,
        masked_weight, bbox_margin, dtype, clip_impl, clip_qmm,
    )
    return FrameFeatures(
        masks=masks, valid=valid, boxes=boxes, f_masks=f_masks, f_global=f_g
    )


def per_pixel_features(ff: FrameFeatures, dtype=jnp.float16) -> jnp.ndarray:
    """Materialize the (H, W, D) per-pixel feature image (the reference's
    `outfeat`, sam_clip_feats_extractor.py:178-190): at each pixel, the
    L2-normalized sum of F_p over masks covering it."""
    m, h, w = ff.masks.shape
    mk = ff.masks.reshape(m, h * w).astype(jnp.float32)
    acc = jnp.einsum("mp,md->pd", mk, ff.f_masks, preferred_element_type=jnp.float32)
    acc = _l2(acc)
    return acc.reshape(h, w, -1).astype(dtype)


# ---------------------------------------------------------------------------
# Data-parallel frame batch (DP over frames, SURVEY.md §2.4)
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=(
        "clip_variant", "sam_variant", "points_per_side", "max_masks",
        "dtype", "impl", "clip_impl", "clip_qmm",
    ),
)
def _extract_batch(
    clip_params, sam_params, images01, clip_variant, sam_variant,
    points_per_side, pred_iou_thresh, stability_thresh, min_area, max_masks,
    masked_weight, bbox_margin, dtype, impl, clip_impl="xla", clip_qmm="xla",
):
    def one(img):
        return extract_frame_features.__wrapped__(
            clip_params, sam_params, img, clip_variant, sam_variant,
            points_per_side=points_per_side, pred_iou_thresh=pred_iou_thresh,
            stability_thresh=stability_thresh, min_area=min_area,
            max_masks=max_masks, masked_weight=masked_weight,
            bbox_margin=bbox_margin, dtype=dtype, impl=impl,
            clip_impl=clip_impl, clip_qmm=clip_qmm,
        )

    return jax.vmap(one)(images01)


def extract_frames_batched(
    clip_params, sam_params, images01, clip_variant, sam_variant,
    points_per_side: int = 12, pred_iou_thresh: float = 0.88,
    stability_thresh: float = 0.95, min_area: float = 100.0,
    max_masks: int = 64, masked_weight: float = 0.4418,
    bbox_margin: float = 50.0, dtype=jnp.bfloat16, impl: str = "xla",
    clip_impl: str = "xla", clip_qmm: str = "xla",
) -> FrameFeatures:
    """Single-device multi-frame extraction: F frames in ONE dispatch.

    The per-frame program's matmuls are MXU-starved at one frame (the CLIP
    crop batch's K=1024 panels reach only ~35-90 TF/s on v5e, measured), and
    each dispatch pays fixed scheduling cost; batching F frames multiplies
    every matmul's row count by F and amortizes the fixed work, which is
    where the mapping pipeline's throughput headroom lives (the reference
    processes frames strictly one at a time on GPU,
    fsr_vln/memory/hmsg/graph/graph.py:380-388).  Returns FrameFeatures with
    a leading frame axis."""
    return _extract_batch(
        clip_params, sam_params, images01, clip_variant, sam_variant,
        points_per_side, pred_iou_thresh, stability_thresh, min_area,
        max_masks, masked_weight, bbox_margin, dtype, impl,
        clip_impl=clip_impl, clip_qmm=clip_qmm,
    )


def extract_frames_dp(
    clip_params,
    sam_params,
    images01: jnp.ndarray,  # (F, H, W, 3), F divisible by the mesh data axis
    clip_variant,
    sam_variant,
    mesh,
    points_per_side: int = 12,
    pred_iou_thresh: float = 0.88,
    stability_thresh: float = 0.95,
    min_area: float = 100.0,
    max_masks: int = 64,
    masked_weight: float = 0.4418,
    bbox_margin: float = 50.0,
    dtype=jnp.bfloat16,
    impl: str = "xla",
) -> FrameFeatures:
    """Data-parallel ConceptFusion extraction: frames shard over the mesh's
    data axis, tower weights replicate, and XLA partitions the per-frame
    program across chips (the DP-over-frames obligation of SURVEY.md §2.4 —
    this is how a v5e-8 slice multiplies the per-chip mapping rate).
    Returns batched FrameFeatures (leading frame axis)."""
    from ..parallel.sharding import data_sharding, replicated

    images01 = jax.device_put(images01, data_sharding(mesh, rank=4))
    cp = jax.device_put(clip_params, replicated(mesh))
    sp = jax.device_put(sam_params, replicated(mesh))
    return _extract_batch(
        cp, sp, images01, clip_variant, sam_variant, points_per_side,
        pred_iou_thresh, stability_thresh, min_area, max_masks,
        masked_weight, bbox_margin, dtype, impl,
    )
