"""Sharded scene state: 8-device insert/fuse must reproduce the single-device
scene exactly (per-voxel aggregates), SURVEY.md §5.8 sharded-voxel-fusion
obligation."""

import jax
import jax.numpy as jnp
import numpy as np

from holoagent_tpu.config import MeshConfig
from holoagent_tpu.memory import scene as scene_mod
from holoagent_tpu.memory import sharded_scene as ss
from holoagent_tpu.ops.voxel import GridSpec
from holoagent_tpu.parallel import make_mesh

D = 16


def _frames(rng, n_frames=2, p=1024):
    out = []
    for _ in range(n_frames):
        pts = rng.uniform(-2.0, 2.0, (p, 3)).astype(np.float32)
        cols = rng.uniform(0, 1, (p, 3)).astype(np.float32)
        valid = rng.uniform(0, 1, (p,)) > 0.1
        m = 4
        masks = rng.uniform(0, 1, (m, p)) > 0.6
        mvalid = np.array([True, True, True, False])
        fm = rng.normal(0, 1, (m, D)).astype(np.float32)
        fm /= np.linalg.norm(fm, axis=-1, keepdims=True)
        out.append((pts, cols, valid, masks, mvalid, fm))
    return out


def _aggregate(scene):
    """key -> (count, sum_pts, sum_col, sum_feat, feat_count) dict."""
    key = np.asarray(scene.key)
    cnt = np.asarray(scene.count)
    agg = {}
    for i in np.nonzero(cnt > 0)[0]:
        agg[int(key[i])] = (
            cnt[i],
            np.asarray(scene.sum_pts[i]),
            np.asarray(scene.sum_col[i]),
            np.asarray(scene.sum_feat[i]),
            float(scene.feat_count[i]),
        )
    return agg


def test_sharded_insert_fuse_matches_single_device(rng):
    mesh = make_mesh(MeshConfig(data=-1, model=1))
    grid = GridSpec.make(0.25, origin=(-4.0, -4.0, -4.0))
    frames = _frames(rng)

    ref = scene_mod.init_scene(grid, 4096, D)
    for pts, cols, valid, masks, mvalid, fm in frames:
        ref, rows = scene_mod.insert_points(
            ref, jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(valid)
        )
        ref = scene_mod.fuse_pixel_features(
            ref, rows, jnp.asarray(masks), jnp.asarray(mvalid), jnp.asarray(fm)
        )

    shard = ss.init_sharded_scene(grid, 512, D, mesh)
    for pts, cols, valid, masks, mvalid, fm in frames:
        shard, rows = ss.insert_points_sharded(
            shard, jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(valid),
            mesh, fcap=1024, bcap=512,
        )
        # every valid pixel must land in a row whose key is its voxel key
        from holoagent_tpu.ops import voxel as vx

        pix_keys = np.asarray(
            vx.keys_of(jnp.asarray(pts), jnp.asarray(valid), grid)
        )
        rows_np = np.asarray(rows)
        skey = np.asarray(shard.key)
        ok = rows_np >= 0
        assert ok[np.asarray(valid)].all()
        np.testing.assert_array_equal(skey[rows_np[ok]], pix_keys[ok])
        shard = ss.fuse_pixel_features_sharded(
            shard, rows, jnp.asarray(masks), jnp.asarray(mvalid),
            jnp.asarray(fm), mesh, rcap=1024, bcap=512,
        )

    gathered, row_map = ss.to_scene(shard)
    # compaction: exactly the used rows, at the front, none dropped
    n = int(gathered.num)
    assert (np.asarray(gathered.count)[:n] > 0).all()
    assert (np.asarray(gathered.count)[n:] == 0).all()
    assert int((np.asarray(row_map) >= 0).sum()) == n
    got = _aggregate(gathered)
    want = _aggregate(ref)
    assert set(got) == set(want)
    for k in want:
        for a, b, tol in zip(got[k], want[k], (1e-5, 1e-4, 1e-4, 1e-3, 1e-5)):
            np.testing.assert_allclose(a, b, atol=tol, rtol=1e-4)


def test_sharded_rows_stable_across_reinsert(rng):
    mesh = make_mesh(MeshConfig(data=-1, model=1))
    grid = GridSpec.make(0.25, origin=(-4.0, -4.0, -4.0))
    pts, cols, valid, *_ = _frames(rng, 1)[0]
    shard = ss.init_sharded_scene(grid, 512, D, mesh)
    shard, r1 = ss.insert_points_sharded(
        shard, jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(valid),
        mesh, fcap=1024, bcap=512,
    )
    shard, r2 = ss.insert_points_sharded(
        shard, jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(valid),
        mesh, fcap=1024, bcap=512,
    )
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    # counts doubled
    total = float(np.asarray(shard.count).sum())
    assert total == 2 * float(np.asarray(valid).sum())


def test_sharded_mapper_end_to_end(rng):
    """ShardedMapper (DP extraction + sharded scene fusion) must reproduce
    the single-device Mapper's fused scene and feed HMSG construction."""
    import jax as _jax

    from holoagent_tpu.config import from_dict
    from holoagent_tpu.dataloader import SyntheticDataset
    from holoagent_tpu.memory.hmsg import HMSGraph
    from holoagent_tpu.memory.mapping import Mapper
    from holoagent_tpu.models import clip as clip_mod
    from holoagent_tpu.models import sam as sam_mod

    cfg = from_dict(
        {
            "models": {
                "clip": {"type": "test-tiny", "dtype": "float32"},
                "sam": {
                    "type": "test-tiny", "points_per_side": 4,
                    "pred_iou_thresh": -10.0, "stability_score_thresh": 0.0,
                    "min_mask_region_area": 20, "max_masks": 8,
                },
            },
            "pipeline": {
                "voxel_size": 0.08, "grid_resolution": 0.08,
                "point_capacity": 1 << 14, "mask_point_capacity": 512,
                "instance_capacity": 64, "skip_frames": 1,
                # the untrained test-tiny SAM emits frame-scale random masks;
                # the production wall/floor birth gates
                # (instance_max_area_frac/extent, instances.frame_instances)
                # would drop every one of them and leave this parity test
                # vacuous — relax them so the sharded-vs-single instance
                # plumbing is actually exercised
                "instance_max_area_frac": 1.0,
                "instance_max_extent_m": 1e9,
            },
        }
    )
    mesh = make_mesh(MeshConfig(data=-1, model=1))
    nd = mesh.shape["data"]
    ds = SyntheticDataset(num_frames=nd, hw=(48, 64))
    clip_p = clip_mod.init_clip(jax.random.key(0), clip_mod.VARIANTS["test-tiny"])
    sam_p = sam_mod.init_sam(jax.random.key(1), sam_mod.VARIANTS["test-tiny"])

    ref = Mapper(cfg, clip_p, sam_p)
    for i in range(len(ds)):
        ref.process_frame(ds[i])
    ref_mapped = ref.finalize()

    sm = ss.ShardedMapper(cfg, clip_p, sam_p, mesh)
    sm.process_batch([ds[i] for i in range(len(ds))])
    mapped = sm.finalize()

    # instance rows reference the compacted scene: every row id < num
    rows_np = np.asarray(mapped.instances.rows)
    valid_rows = rows_np[np.asarray(mapped.instances.valid)]
    live = valid_rows[valid_rows < 2**31 - 1]
    assert live.size and live.max() < int(mapped.scene.num)

    # per-voxel-key point/color aggregates identical
    def agg(scene):
        key = np.asarray(scene.key)
        cnt = np.asarray(scene.count)
        out = {}
        for i in np.nonzero(cnt > 0)[0]:
            out[int(key[i])] = (cnt[i], np.asarray(scene.sum_pts[i]))
        return out

    a, b = agg(mapped.scene), agg(ref_mapped.scene)
    assert set(a) == set(b)
    for k in b:
        np.testing.assert_allclose(a[k][0], b[k][0], atol=1e-4)
        np.testing.assert_allclose(a[k][1], b[k][1], atol=1e-3, rtol=1e-4)
    # instance counts agree and the graph builds from the sharded result
    n_ref = int(np.asarray(ref_mapped.instances.valid).sum())
    n_sh = int(np.asarray(mapped.instances.valid).sum())
    assert abs(n_ref - n_sh) <= max(2, n_ref // 2), (n_ref, n_sh)
    lf = np.eye(4, clip_mod.VARIANTS["test-tiny"].embed_dim, dtype=np.float32)
    g = HMSGraph.build(mapped, cfg, lf, ["a", "b", "c", "d"])
    assert len(g.floors) >= 1
