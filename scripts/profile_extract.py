"""Sub-stage profile of the extract pipeline on the real chip.

Decomposes bench.py's `extract` stage (SAM auto-mask + CLIP ConceptFusion,
reference fsr_vln/perception/models/sam_clip_feats_extractor.py:82-191) into
its device sub-stages so optimization effort lands where the time is:

  sam_encode       image encoder (flash attention)
  sam_decode       two-way decoder + upscale chain + hypernet product
  filter_chain     stability + areas + NMS + top-k + resize-to-frame
  disjoint_boxes   to_disjoint carve + tight boxes
  crop_resize      129-crop plain+masked crop_and_resize + normalize
  clip_tower       int8 flash CLIP over the 129-crop stack
  fused_full64     the whole single-program extract (cross-check)

Timing: per-dispatch wall minus measured tunnel RTT (the programs are too big
for the scan-wrapped time_device_fn; device-resident inputs, scalar sync).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_extract.py
"""

import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp


def _sync(x):
    return float(jnp.ravel(jax.tree.leaves(x)[0])[0])


def _mark(msg):
    print(f"# profile: {msg}", file=sys.stderr, flush=True)


def _tdisp(fn, iters=8):
    _sync(fn())  # compile + warm
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn())
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main():
    from holoagent_tpu.dataloader import SyntheticDataset
    from holoagent_tpu.models import clip as clip_mod
    from holoagent_tpu.models import sam as sam_mod
    from holoagent_tpu.ops import masks as mask_ops
    from holoagent_tpu.ops.crop_resize import crop_and_resize, expand_boxes
    from holoagent_tpu.perception.extractor import extract_frame_features

    cv = clip_mod.VARIANTS["ViT-L-14"]
    sv = sam_mod.VARIANTS["vit_b"]
    dtype = jnp.bfloat16
    clip_params = clip_mod.init_clip(jax.random.key(0), cv, dtype=dtype)
    clip_q8 = clip_mod.quantize_clip(clip_params)
    sam_params = sam_mod.init_sam(jax.random.key(1), sv, dtype=dtype)

    ds = SyntheticDataset(num_frames=1, hw=(480, 640))
    rgb = jnp.asarray(ds[0].rgb)
    h, w, _ = rgb.shape

    trivial = jax.jit(lambda x: x + 1.0)
    xs = jnp.zeros((8, 128))
    _sync(trivial(xs))
    rtt = _tdisp(lambda: trivial(xs), iters=8)
    _mark(f"rtt {rtt*1e3:.1f} ms")

    out = {"rtt_ms": round(rtt * 1e3, 1)}
    M = 64
    PPS = 12

    # ---- A: SAM encoder -------------------------------------------------
    @jax.jit
    def sam_encode(p, img):
        x = sam_mod.preprocess(img[None], sv.img_size)
        return sam_mod.encode_image(p["encoder"], x, sv, dtype=dtype, impl="flash")[0]

    _mark("sam_encode")
    out["sam_encode_ms"] = round(
        (_tdisp(lambda: sam_encode(sam_params, rgb)) - rtt) * 1e3, 1)
    _mark(f"sam_encode {out['sam_encode_ms']} ms")
    emb = sam_encode(sam_params, rgb)
    g = emb.shape[0]

    # ---- B: decoder (prompts fixed, as generate_masks builds them) ------
    pe = sam_mod.image_pe(sam_params["prompt"], g).astype(emb.dtype)
    t = (jnp.arange(PPS, dtype=jnp.float32) + 0.5) / PPS
    gy, gx = jnp.meshgrid(t, t, indexing="ij")
    pts = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)
    points = jnp.stack([pts, jnp.zeros_like(pts)], axis=1)
    labels = jnp.stack(
        [jnp.ones((PPS * PPS,), jnp.int32), -jnp.ones((PPS * PPS,), jnp.int32)],
        axis=1,
    )
    sparse = sam_mod.encode_points(sam_params["prompt"], points, labels).astype(
        emb.dtype
    )
    nme = sam_params["prompt"]["no_mask"].astype(emb.dtype)

    @jax.jit
    def sam_decode(p, e):
        logits, iou = sam_mod.decode_masks(p["decoder"], e, pe, sparse, nme, sv)
        return iou, logits

    _mark("sam_decode")
    out["sam_decode_ms"] = round(
        (_tdisp(lambda: sam_decode(sam_params, emb)[0]) - rtt) * 1e3, 1)
    _mark(f"sam_decode {out['sam_decode_ms']} ms")
    iou_pred, logits_full = sam_decode(sam_params, emb)
    logits = logits_full[:, 1:].reshape(-1, logits_full.shape[-2], logits_full.shape[-1])
    scores = iou_pred[:, 1:].reshape(-1)
    logits = jax.device_put(logits)
    scores = jax.device_put(scores)

    # ---- C: filter chain (stability/areas/nms/topk/resize) --------------
    lh, lw = logits.shape[-2], logits.shape[-1]
    area_scale = (h * w) / float(lh * lw)

    @jax.jit
    def filt(lg, sc):
        stab = mask_ops.stability_scores(lg)
        bin_lo = lg > 0.0
        areas = mask_ops.mask_areas(bin_lo) * area_scale
        ok = (sc > -10.0) & (stab > 0.0) & (areas > 100.0)
        boxes_lo = mask_ops.boxes_from_masks(bin_lo)
        keep = mask_ops.nms(boxes_lo, sc, ok, 0.7)
        sel = jnp.where(keep, sc, -jnp.inf)
        top_s, top_i = jax.lax.top_k(sel, M)
        out_valid = jnp.isfinite(top_s)
        lk = jax.image.resize(lg[top_i], (M, h, w), method="linear")
        binm = (lk > 0.0) & out_valid[:, None, None]
        return binm.sum(), binm

    _mark("filter_chain")
    out["filter_chain_ms"] = round(
        (_tdisp(lambda: filt(logits, scores)[0]) - rtt) * 1e3, 1
    )
    _mark(f"filter_chain {out['filter_chain_ms']} ms")
    _, binm = filt(logits, scores)
    binm = jax.device_put(binm)
    valid = jnp.ones((M,), bool)

    # C-split: nms alone on the decoder-res candidates
    @jax.jit
    def nms_only(lg, sc):
        bin_lo = lg > 0.0
        boxes_lo = mask_ops.boxes_from_masks(bin_lo)
        keep = mask_ops.nms(boxes_lo, sc, sc > -10.0, 0.7)
        return keep.sum(), boxes_lo

    _mark("nms_only (incl boxes_from_masks)")
    out["nms_boxes_ms"] = round(
        (_tdisp(lambda: nms_only(logits, scores)[0]) - rtt) * 1e3, 1
    )
    _mark(f"nms_boxes {out['nms_boxes_ms']} ms")

    @jax.jit
    def boxes_only(lg):
        return mask_ops.boxes_from_masks(lg > 0.0).sum()

    _mark("boxes_from_masks (432 @ decoder res)")
    out["boxes_lo_ms"] = round((_tdisp(lambda: boxes_only(logits)) - rtt) * 1e3, 1)
    _mark(f"boxes_lo {out['boxes_lo_ms']} ms")

    # ---- D: disjoint + tight boxes at frame res --------------------------
    @jax.jit
    def disjoint(b):
        mk = mask_ops.to_disjoint(b, valid)
        bx = mask_ops.boxes_from_masks(mk)
        return bx.sum(), mk, bx

    _mark("disjoint_boxes")
    out["disjoint_boxes_ms"] = round(
        (_tdisp(lambda: disjoint(binm)[0]) - rtt) * 1e3, 1
    )
    _mark(f"disjoint_boxes {out['disjoint_boxes_ms']} ms")
    _, masks_d, boxes_d = disjoint(binm)
    masks_d = jax.device_put(masks_d)
    boxes_d = jax.device_put(boxes_d)

    # ---- E: crops (plain + masked) + normalize ---------------------------
    size = cv.image_size

    @jax.jit
    def crops(img, bx, mk):
        eb = expand_boxes(bx, 50.0, h, w)
        cp = crop_and_resize(img, eb, size)
        cm = crop_and_resize(img, eb, size, masks=mk)
        frame = jax.image.resize(img[None], (1, size, size, 3), method="cubic")
        stack = jnp.concatenate([cp, cm, frame], axis=0)
        mean = jnp.asarray(clip_mod.IMAGE_MEAN, stack.dtype)
        std = jnp.asarray(clip_mod.IMAGE_STD, stack.dtype)
        return ((stack - mean) / std).sum(), ((stack - mean) / std)

    _mark("crop_resize")
    out["crop_resize_ms"] = round(
        (_tdisp(lambda: crops(rgb, boxes_d, masks_d)[0]) - rtt) * 1e3, 1
    )
    _mark(f"crop_resize {out['crop_resize_ms']} ms")
    _, stack = crops(rgb, boxes_d, masks_d)
    stack = jax.device_put(stack)

    # ---- F: CLIP tower over the 129-crop stack ---------------------------
    @jax.jit
    def clip_tower(p, s):
        f = clip_mod.encode_image(p, s, cv, dtype=dtype, impl="flash", qmm="xla")
        return f.sum(), f

    _mark(f"clip_tower ({stack.shape[0]} crops int8 flash)")
    out["clip_tower_ms"] = round(
        (_tdisp(lambda: clip_tower(clip_q8, stack)[0]) - rtt) * 1e3, 1
    )
    _mark(f"clip_tower {out['clip_tower_ms']} ms")

    # ---- cross-check: the fused single program ---------------------------
    def fused(img):
        return extract_frame_features(
            clip_q8, sam_params, img, cv, sv, points_per_side=PPS,
            max_masks=M, dtype=dtype, impl="flash", clip_impl="flash",
        ).f_masks.sum()

    _mark("fused_full64")
    out["fused_full64_ms"] = round((_tdisp(lambda: fused(rgb)) - rtt) * 1e3, 1)
    _mark(f"fused_full64 {out['fused_full64_ms']} ms")

    parts = [
        "sam_encode_ms", "sam_decode_ms", "filter_chain_ms",
        "disjoint_boxes_ms", "crop_resize_ms", "clip_tower_ms",
    ]
    out["sum_parts_ms"] = round(sum(out[k] for k in parts), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
