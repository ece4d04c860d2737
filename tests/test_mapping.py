import jax
import jax.numpy as jnp
import numpy as np
import pytest

from holoagent_tpu.config import Config, from_dict
from holoagent_tpu.dataloader import SyntheticDataset
from holoagent_tpu.memory.mapping import Mapper
from holoagent_tpu.models import clip as clip_mod
from holoagent_tpu.models import sam as sam_mod


def _tiny_cfg(**pipeline_overrides):
    """Shared tiny-model operating point for the mapper tests."""
    pipeline = {
        "voxel_size": 0.1,
        "skip_frames": 4,
        "point_capacity": 1 << 15,
        "mask_point_capacity": 512,
        "instance_capacity": 64,
        # random-init accept-all SAM emits frame-scale blobs; the background
        # area gate (production default 0.5) would drop them all — these
        # tests exercise the fold machinery, not mask quality
        "instance_max_area_frac": 1.0,
    }
    pipeline.update(pipeline_overrides)
    return from_dict(
        {
            "main": {"depth_cut": 20.0},
            "models": {
                "clip": {"type": "test-tiny", "dtype": "float32"},
                "sam": {
                    "type": "test-tiny",
                    "points_per_side": 4,
                    "pred_iou_thresh": -10.0,  # random-init SAM: accept all
                    "stability_score_thresh": 0.0,
                    "min_mask_region_area": 20,
                    "max_masks": 8,
                },
            },
            "pipeline": pipeline,
        }
    )


@pytest.fixture(scope="module")
def mapped():
    cfg = _tiny_cfg()
    ds = SyntheticDataset(num_frames=8, hw=(48, 64))
    clip_p = clip_mod.init_clip(jax.random.key(0), clip_mod.VARIANTS["test-tiny"])
    sam_p = sam_mod.init_sam(jax.random.key(1), sam_mod.VARIANTS["test-tiny"])
    mapper = Mapper(cfg, clip_p, sam_p)
    return mapper.run(ds), ds


def test_scene_fused(mapped):
    ms, ds = mapped
    n = int(ms.scene.num)
    assert n > 500  # a real scene fused
    pts = np.asarray(ms.scene.points())[:n]
    w, h = ds.scene.extent
    v = np.asarray(ms.scene.valid())[:n]
    assert v.all()
    assert (pts[:, 0] > -1) .all() and (pts[:, 0] < w + 1).all()
    # features fused on a good fraction of the scene
    fc = np.asarray(ms.scene.feat_count)[:n]
    assert (fc > 0).mean() > 0.2


def test_instances_exist_and_bounded(mapped):
    ms, _ = mapped
    k = int(ms.instances.num())
    assert 1 <= k <= 64
    feats = np.asarray(ms.instance_feats)
    valid = np.asarray(ms.instances.valid)
    norms = np.linalg.norm(feats[valid], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)


def test_keyframes_recorded(mapped):
    ms, ds = mapped
    assert len(ms.keyframes) == 2  # 8 frames, skip 4
    assert ms.keyframe_feats.shape[0] == 2


def test_fused_frame_step_matches_staged(mapped):
    """pipeline.fused_frame_step=True (ONE XLA program per frame) produces the
    same scene/instances as the staged default."""
    ms_staged, ds = mapped
    # pin sequential explicitly: the fused program folds the seq merge
    # in-program, and the comparison must hold against the staged seq fold
    # even if production configs select the paired fold
    cfg = _tiny_cfg(fused_frame_step=True, merge_type="sequential")
    clip_p = clip_mod.init_clip(jax.random.key(0), clip_mod.VARIANTS["test-tiny"])
    sam_p = sam_mod.init_sam(jax.random.key(1), sam_mod.VARIANTS["test-tiny"])
    ms = Mapper(cfg, clip_p, sam_p).run(ds)
    n1, n2 = int(ms_staged.scene.num), int(ms.scene.num)
    assert n1 == n2
    pts1 = np.sort(np.asarray(ms_staged.scene.points())[:n1], axis=0)
    pts2 = np.sort(np.asarray(ms.scene.points())[:n2], axis=0)
    np.testing.assert_allclose(pts1, pts2, atol=1e-4)
    assert int(ms.instances.num()) == int(ms_staged.instances.num())


def test_hierarchical_merge_matches_scene(mapped):
    """merge_type=hierarchical (pairwise tree fold) produces a valid instance
    set over the same scene, with comparable instance counts."""
    ms_seq, ds = mapped
    cfg = _tiny_cfg(merge_type="hierarchical")
    clip_p = clip_mod.init_clip(jax.random.key(0), clip_mod.VARIANTS["test-tiny"])
    sam_p = sam_mod.init_sam(jax.random.key(1), sam_mod.VARIANTS["test-tiny"])
    ms = Mapper(cfg, clip_p, sam_p).run(ds)
    n_seq = int(ms_seq.instances.num())
    n_hier = int(ms.instances.num())
    assert n_hier > 0
    # same scene, same thresholds: counts in the same ballpark
    assert 0.3 * n_seq <= n_hier <= 3 * n_seq + 2, (n_seq, n_hier)
    # scene fusion identical regardless of merge schedule
    assert int(ms.scene.num) == int(ms_seq.scene.num)


def test_batched_extract_matches_per_frame(mapped):
    """pipeline.extract_frames_per_dispatch=2 (one SAM+CLIP dispatch per 2
    frames, vmapped extract) produces the same scene/instances as per-frame
    extraction — batching changes dispatch granularity only."""
    ms_one, ds = mapped
    cfg = _tiny_cfg(extract_frames_per_dispatch=2)
    clip_p = clip_mod.init_clip(jax.random.key(0), clip_mod.VARIANTS["test-tiny"])
    sam_p = sam_mod.init_sam(jax.random.key(1), sam_mod.VARIANTS["test-tiny"])
    ms = Mapper(cfg, clip_p, sam_p).run(ds)
    n1, n2 = int(ms_one.scene.num), int(ms.scene.num)
    assert n1 == n2
    np.testing.assert_allclose(
        np.sort(np.asarray(ms_one.scene.points())[:n1], axis=0),
        np.sort(np.asarray(ms.scene.points())[:n2], axis=0),
        atol=1e-4,
    )
    # feature fusion identical (same extraction math, vmapped)
    fc1 = np.asarray(ms_one.scene.feat_count)[:n1]
    fc2 = np.asarray(ms.scene.feat_count)[:n2]
    assert fc1.sum() == fc2.sum()
    assert int(ms.instances.num()) == int(ms_one.instances.num())
