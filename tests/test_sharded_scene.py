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

    got = _aggregate(ss.to_scene(shard))
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
