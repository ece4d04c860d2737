"""Fixture-trained tiny perception towers for the NEURAL accuracy row.

No pretrained checkpoints can exist in this sandbox (no egress), so the
published accuracy protocol (apps/eval_protocol.py) was oracle-perception
only: GT masks + one-hot embeddings, which exercises the pipeline but not the
neural extractor.  This module trains the test-tiny towers ON THE SYNTHETIC
FIXTURES so the same protocol can measure the real extractor path —
SAM automatic mask generation, ConceptFusion fusion, CLIP text retrieval —
end to end (the checkpoint-backed eval intent of the reference's harness,
reference fsr_vln/memory/hmsg/eval/hm3dsem_evaluator.py:193-589):

  * `train_tiny_clip`: symmetric InfoNCE (training.contrastive) over GT
    object crops paired with the retrieval prompt templates, so crop
    embeddings align with `text_features_multi_template` queries.
  * `train_tiny_sam`: SAM-style promptable-mask supervision — point prompts
    sampled inside GT instances, min-over-mask-tokens BCE+dice at the
    decoder's 4g x 4g grid, and IoU-head regression to the actual overlap
    (the official SAM training recipe's loss structure, scaled to tiny).

Everything runs in float32 on whatever backend is active (CPU-friendly:
the test-tiny towers are 2-layer / 64-wide).
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import clip as clip_mod
from ..models import sam as sam_mod
from ..models.tokenizer import SimpleTokenizer
from . import contrastive


# ---------------------------------------------------------------------------
# Data: GT object crops from the synthetic fixtures
# ---------------------------------------------------------------------------


def collect_crops(datasets, labels: Sequence[str], size: int, margin: int = 4,
                  masked: bool = False, structure: bool = False,
                  structure_per_frame: int = 3):
    """All GT instance crops across the datasets' frames.

    masked=True additionally returns background-zeroed variants of each crop
    — the extractor encodes BOTH plain and masked crops and blends them at
    clip_masked_weight (reference sam_clip_feats_extractor.py:149-162), so
    the tower must be trained on both renderings or masked inputs are
    out-of-distribution (measured: plain-trained tiny tower drops 0.97 ->
    0.69 top-1 on masked crops).

    structure=True additionally samples random NON-OBJECT windows per frame:
    windows dominated by one structure label (wall/floor) carry that label;
    mixed-structure windows carry "background".  Without these, background
    gallery entries are out-of-distribution and land arbitrarily close to
    furniture text (measured: background windows at sim 0.925 for "bed" vs
    the real bed's 0.921, round 4) — and the engine's reference-parity
    negative-prompt gate (["background"], graph.py:3497) has no trained
    anchor to catch them with.

    Returns (crops (N, size, size, 3) float01, label_ids (N,)) or
    (crops, crops_masked, label_ids)."""
    crops, crops_m, ids = [], [], []
    labels = list(labels)
    for ds in datasets:
        # GT label ids are PER-SCENE (each layout numbers its own label
        # list); map through names into the target `labels` list — mixing
        # layouts by raw id cross-contaminates classes (two_room's 'wall'
        # is id 6, three_room's id 6 is 'bathtub')
        local = list(ds.scene.labels()) if hasattr(ds, "scene") else labels
        for i in range(len(ds)):
            frame = ds[i]
            inst, lab = ds.gt(i)
            for iid in np.unique(inst):
                if iid < 0:
                    continue
                m = inst == iid
                if m.sum() < 30:
                    continue
                raw = lab[m].ravel()
                raw = raw[raw >= 0]
                if not len(raw):
                    continue
                name = local[int(np.bincount(raw).argmax()) % len(local)]
                if name not in labels:
                    continue
                ys, xs = np.nonzero(m)
                y0, y1 = max(ys.min() - margin, 0), min(ys.max() + margin, m.shape[0])
                x0, x1 = max(xs.min() - margin, 0), min(xs.max() + margin, m.shape[1])
                crop = frame.rgb[y0:y1, x0:x1]
                crops.append(np.asarray(
                    jax.image.resize(jnp.asarray(crop), (size, size, 3), "linear")
                ))
                if masked:
                    cm = crop * m[y0:y1, x0:x1, None]
                    crops_m.append(np.asarray(
                        jax.image.resize(jnp.asarray(cm), (size, size, 3), "linear")
                    ))
                ids.append(labels.index(name))
            if structure:
                h, w = inst.shape
                srng = np.random.default_rng(1000 + i)
                picked = 0
                for _ in range(8 * structure_per_frame):
                    if picked >= structure_per_frame:
                        break
                    s = int(srng.integers(max(8, h // 8), max(12, h // 2)))
                    y0 = int(srng.integers(0, h - s))
                    x0 = int(srng.integers(0, w - s))
                    wi = inst[y0:y0 + s, x0:x0 + s]
                    wl = lab[y0:y0 + s, x0:x0 + s]
                    if (wi >= 0).mean() > 0.25:
                        continue  # object-containing: not background
                    struct = wl[(wi < 0) & (wl >= 0)]
                    if len(struct) == 0:
                        continue
                    counts = np.bincount(struct.ravel())
                    if counts.max() > 0.7 * len(struct):
                        name = local[int(counts.argmax()) % len(local)]
                        if name not in labels:
                            name = "background"
                    else:
                        name = "background"
                    if name not in labels:
                        continue
                    crop = frame.rgb[y0:y0 + s, x0:x0 + s]
                    cr = np.asarray(jax.image.resize(
                        jnp.asarray(crop), (size, size, 3), "linear"
                    ))
                    crops.append(cr)
                    if masked:
                        crops_m.append(cr)  # structure windows are their own mask
                    ids.append(labels.index(name))
                    picked += 1
    out_ids = np.asarray(ids, np.int32)
    if masked:
        return (np.stack(crops).astype(np.float32),
                np.stack(crops_m).astype(np.float32), out_ids)
    return np.stack(crops).astype(np.float32), out_ids


# ---------------------------------------------------------------------------
# CLIP
# ---------------------------------------------------------------------------


def collect_room_frames(datasets, room_rects_by_ds, size: int, jitter: int = 0,
                        seed: int = 0):
    """Full-frame images labelled by the room TYPE the camera stands in —
    supervision for room naming: the HMSG names rooms by voting dominant
    keyframe (view) embeddings against room-type text features (reference
    room.py:131-172 `infer_room_type_from_view_embedding`), so the tiny text
    tower must align room-type captions with in-room views or naming is
    random.  room_rects_by_ds[i]: (x0, y0, x1, y1, category[, floor_id])
    tuples for datasets[i] (None = skip that dataset).

    ``jitter`` adds that many random-window variants per frame (70-100%
    scale, random offset): the deployed view embeddings come from arbitrary
    keyframe viewpoints, and whole-frame-only supervision measurably
    under-generalises to them (round 5: 0.70 train vs 0.54 held-out
    room-frame accuracy before augmentation).

    Returns (frames (N, size, size, 3) float01, categories list[str])."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    frames, cats = [], []
    for ds, rects in zip(datasets, room_rects_by_ds):
        if rects is None:
            continue
        level_zs = ds.scene.level_zs() if hasattr(ds.scene, "level_zs") else [0.0]
        for i in range(len(ds)):
            eye = ds.poses[i][:3, 3]
            floor = max(
                (fi for fi, z in enumerate(level_zs) if z <= eye[2] + 1e-6),
                default=0,
            )
            for rect in rects:
                x0, y0, x1, y1, cat = rect[:5]
                fid = int(rect[5]) if len(rect) > 5 else 0
                if fid == floor and x0 <= eye[0] < x1 and y0 <= eye[1] < y1:
                    rgb = np.asarray(ds[i].rgb)
                    frames.append(np.asarray(jax.image.resize(
                        jnp.asarray(rgb), (size, size, 3), "linear"
                    )))
                    cats.append(cat)
                    h, w = rgb.shape[:2]
                    for _ in range(jitter):
                        s = rng.uniform(0.7, 1.0)
                        ch, cw = int(h * s), int(w * s)
                        r0 = rng.integers(0, h - ch + 1)
                        c0 = rng.integers(0, w - cw + 1)
                        frames.append(np.asarray(jax.image.resize(
                            jnp.asarray(rgb[r0:r0 + ch, c0:c0 + cw]),
                            (size, size, 3), "linear",
                        )))
                        cats.append(cat)
                    break
    if not frames:
        return np.zeros((0, size, size, 3), np.float32), []
    return np.stack(frames).astype(np.float32), cats


def train_tiny_clip(
    datasets,
    labels: Sequence[str],
    steps: int = 400,
    seed: int = 0,
    variant_name: str = "test-tiny",
    lr: float = 3e-3,
    room_rects_by_ds=None,  # adds room-type classes (collect_room_frames)
    room_frame_jitter: int = 0,  # random-window variants per room frame
):
    """Contrastive training of the tiny towers on fixture crops.  Batches hold
    one crop per DISTINCT label (duplicate labels would be false negatives in
    the symmetric InfoNCE).  With ``room_rects_by_ds``, room-type categories
    join the label set, supervised by in-room full frames, so the tower can
    drive both object retrieval and room naming."""
    cv = clip_mod.VARIANTS[variant_name]
    tok = SimpleTokenizer()
    rng = np.random.default_rng(seed)
    # margin matches the deployed crop geometry (pipeline.clip_bbox_margin
    # 16 px at 240x320): the extractor encodes expand_boxes(bbox, margin)
    # windows, and a 4 px-trained tower sees 4x less background context at
    # deployment — the blend feature of small objects (chair) then argmaxes
    # to structure classes (measured round 4)
    crops, crops_masked, ids = collect_crops(
        datasets, labels, cv.image_size, margin=16, masked=True, structure=True
    )
    labels = list(labels)
    if room_rects_by_ds is not None:
        rframes, rcats = collect_room_frames(
            datasets, room_rects_by_ds, cv.image_size,
            jitter=room_frame_jitter, seed=seed,
        )
        if len(rframes):
            rids = []
            for c in rcats:
                if c not in labels:
                    labels.append(c)
                rids.append(labels.index(c))
            crops = np.concatenate([crops, rframes])
            crops_masked = np.concatenate([crops_masked, rframes])
            ids = np.concatenate([ids, np.asarray(rids, np.int32)])
    by_label = [np.nonzero(ids == c)[0] for c in range(len(labels))]
    present = [c for c in range(len(labels)) if len(by_label[c])]
    mean = np.asarray(clip_mod.IMAGE_MEAN, np.float32)
    std = np.asarray(clip_mod.IMAGE_STD, np.float32)

    params = clip_mod.init_clip(jax.random.key(seed), cv, dtype=jnp.float32)
    tx, opt_state = contrastive.init_train_state(params, lr=lr)
    # train the DEPLOYED feature: the extractor's plain/masked blend at the
    # reference clip_masked_weight (contrastive.clip_blend_loss) — training
    # the renderings separately leaves the blend out-of-distribution
    step = contrastive.make_blend_train_step(cv, tx, dtype=jnp.float32)

    templates = clip_mod.TEMPLATES
    tokens_by = {
        (c, t): tok([templates[t].format(labels[c])])[0]
        for c in present
        for t in range(len(templates))
    }
    losses = []
    for s in range(steps):
        batch_c = rng.permutation(present)
        pick = [rng.choice(by_label[c]) for c in batch_c]
        imgs_p = np.stack([crops[i] for i in pick])
        imgs_m = np.stack([crops_masked[i] for i in pick])
        ti = rng.integers(0, len(templates))
        toks = np.stack([tokens_by[(c, ti)] for c in batch_c])
        params, opt_state, loss = step(
            params, opt_state,
            jnp.asarray((imgs_p - mean) / std),
            jnp.asarray((imgs_m - mean) / std),
            jnp.asarray(toks),
        )
        losses.append(float(loss))
    return params, losses


# ---------------------------------------------------------------------------
# SAM
# ---------------------------------------------------------------------------


def _sam_loss(params, img, points01, gt16, v: sam_mod.SAMVariant):
    """img (S, S, 3) normalized; points01 (P, 2); gt16 (P, 4g, 4g) float.
    min-over-tokens (BCE + dice) + IoU-head regression (SAM's loss shape)."""
    emb = sam_mod.encode_image(params["encoder"], img[None], v, dtype=jnp.float32)[0]
    g = emb.shape[0]
    pe = sam_mod.image_pe(params["prompt"], g).astype(emb.dtype)
    p = points01.shape[0]
    pts = jnp.stack([points01, jnp.zeros_like(points01)], axis=1)
    labs = jnp.stack(
        [jnp.ones((p,), jnp.int32), -jnp.ones((p,), jnp.int32)], axis=1
    )
    sparse = sam_mod.encode_points(params["prompt"], pts, labs).astype(emb.dtype)
    logits, iou_pred = sam_mod.decode_masks(
        params["decoder"], emb, pe, sparse,
        params["prompt"]["no_mask"].astype(emb.dtype), v,
    )
    logits = logits[:, 1:]  # the multimask tokens generate_masks consumes
    iou_pred = iou_pred[:, 1:]
    tgt = gt16[:, None]  # (P, 1, 4g, 4g)
    bce = optax.sigmoid_binary_cross_entropy(logits, jnp.broadcast_to(tgt, logits.shape))
    bce = bce.mean(axis=(-1, -2))  # (P, nm-1)
    prob = jax.nn.sigmoid(logits)
    inter = (prob * tgt).sum(axis=(-1, -2))
    dice = 1.0 - (2 * inter + 1.0) / (prob.sum(axis=(-1, -2)) + tgt.sum(axis=(-1, -2)) + 1.0)
    tok_loss = bce + dice  # (P, nm-1)
    best = jnp.argmin(tok_loss, axis=1)
    mask_loss = jnp.take_along_axis(tok_loss, best[:, None], axis=1).mean()
    # IoU regression against the achieved overlap of each token's binarization
    binm = logits > 0.0
    bi = (binm * (tgt > 0.5)).sum(axis=(-1, -2))
    bu = (binm | (tgt > 0.5)).sum(axis=(-1, -2))
    iou_t = jax.lax.stop_gradient(bi / jnp.maximum(bu, 1.0))
    iou_loss = ((iou_pred - iou_t) ** 2).mean()
    return mask_loss + iou_loss


def train_tiny_sam(
    datasets,
    steps: int = 400,
    prompts_per_step: int = 8,
    seed: int = 0,
    variant_name: str = "test-tiny",
    lr: float = 1e-3,
):
    """Supervised promptable-mask training on fixture GT instances."""
    v = sam_mod.VARIANTS[variant_name]
    rng = np.random.default_rng(seed)
    params = sam_mod.init_sam(jax.random.key(seed), v, dtype=jnp.float32)
    tx = optax.adamw(lr, weight_decay=0.01)
    opt_state = tx.init(params)
    g4 = 4 * (v.img_size // v.patch)

    @jax.jit
    def step(params, opt_state, img, points01, gt16):
        loss, grads = jax.value_and_grad(_sam_loss)(params, img, points01, gt16, v)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # pre-extract once: preprocessed image + per-instance (pixel coords,
    # 4g-resolution GT mask) — the training loop is then pure indexing.
    # Supervision covers BOTH object instances and background STRUCTURE
    # (per-label wall/floor/ceiling regions where inst < 0): ~90% of the
    # fixture pixels are structure, so an auto-mask grid prompt
    # (sam.generate_masks) lands there most of the time — a model trained
    # only on objects emits arbitrary region blobs for those prompts, which
    # engulf the objects and collapse the instance merge fold (measured:
    # whole 48-frame scenes folding to ONE instance, round 4).  With
    # structure supervision a background prompt yields the full wall/floor
    # mask, which the extractor's disjointness carve + the instance table's
    # area gate handle by design.
    frames = []
    for ds in datasets:
        for i in range(len(ds)):
            frame = ds[i]
            inst, lab = ds.gt(i)
            h, w = inst.shape
            entries = []
            targets = [inst == iid for iid in np.unique(inst) if iid >= 0]
            targets += [
                (lab == li) & (inst < 0)
                for li in np.unique(lab[inst < 0])
                if li >= 0
            ]
            for m in targets:
                if m.sum() < 30:
                    continue
                ys, xs = np.nonzero(m)
                gt16 = np.asarray(jax.image.resize(
                    jnp.asarray(m, jnp.float32), (g4, g4), "linear"
                )) > 0.5
                entries.append((
                    np.stack([xs / w, ys / h], -1).astype(np.float32),
                    gt16.astype(np.float32),
                ))
            if entries:
                x = np.asarray(
                    sam_mod.preprocess(jnp.asarray(frame.rgb)[None], v.img_size)[0]
                )
                frames.append((x, entries))
    losses = []
    for s in range(steps):
        x, entries = frames[rng.integers(0, len(frames))]
        pts, gts = [], []
        for _ in range(prompts_per_step):
            coords, gt16 = entries[rng.integers(0, len(entries))]
            pts.append(coords[rng.integers(0, len(coords))])
            gts.append(gt16)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(x),
            jnp.asarray(np.asarray(pts, np.float32)),
            jnp.asarray(np.asarray(gts, np.float32)),
        )
        losses.append(float(loss))
    return params, losses
