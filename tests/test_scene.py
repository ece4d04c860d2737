import jax.numpy as jnp
import numpy as np

from holoagent_tpu.memory import scene as scene_mod
from holoagent_tpu.ops.voxel import GridSpec, SENTINEL


def _scene(cap=1024, d=8, vs=0.1):
    return scene_mod.init_scene(GridSpec.centered(vs), cap, d)


def test_insert_accumulates_means(rng):
    sc = _scene()
    pts = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (500, 3)).astype(np.float32)
    sc, rows = scene_mod.insert_points(sc, jnp.asarray(pts), jnp.asarray(cols), jnp.ones(500, bool))
    rows = np.asarray(rows)
    assert (rows >= 0).all()
    n1 = int(sc.num)
    assert 0 < n1 <= 500
    # insert the same points again: no new rows, counts double
    sc2, rows2 = scene_mod.insert_points(sc, jnp.asarray(pts), jnp.asarray(cols), jnp.ones(500, bool))
    assert int(sc2.num) == n1
    np.testing.assert_array_equal(np.asarray(rows2), rows)
    np.testing.assert_allclose(np.asarray(sc2.count).sum(), 1000)
    # mean position stays the same
    np.testing.assert_allclose(
        np.asarray(sc.points())[:n1], np.asarray(sc2.points())[:n1], atol=1e-5
    )


def test_insert_incremental_new_rows(rng):
    sc = _scene()
    p1 = rng.uniform(-1, 0, (200, 3)).astype(np.float32)
    p2 = rng.uniform(1, 2, (200, 3)).astype(np.float32)  # disjoint region
    c = np.zeros((200, 3), np.float32)
    sc, _ = scene_mod.insert_points(sc, jnp.asarray(p1), jnp.asarray(c), jnp.ones(200, bool))
    n1 = int(sc.num)
    sc, _ = scene_mod.insert_points(sc, jnp.asarray(p2), jnp.asarray(c), jnp.ones(200, bool))
    assert int(sc.num) > n1
    # sorted index consistent: every used row's key is findable
    skey = np.asarray(sc.sorted_key)
    assert (np.diff(skey.astype(np.int64)) >= 0).all()


def test_fuse_pixel_features(rng):
    sc = _scene(d=4)
    pts = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
    sc, rows = scene_mod.insert_points(
        sc, jnp.asarray(pts), jnp.zeros((100, 3)), jnp.ones(100, bool)
    )
    # two masks: first covers pixels 0..49, second covers 25..74
    masks = np.zeros((2, 100), bool)
    masks[0, :50] = True
    masks[1, 25:75] = True
    f = np.array([[1, 0, 0, 0], [0, 1, 0, 0]], np.float32)
    sc = scene_mod.fuse_pixel_features(
        sc, rows, jnp.asarray(masks), jnp.ones(2, bool), jnp.asarray(f), chunk=32
    )
    feats = np.asarray(sc.feats())
    rows_np = np.asarray(rows)
    # a pixel covered only by mask 0 -> feature ~ [1,0,0,0]
    r = rows_np[0]
    np.testing.assert_allclose(feats[r][:2], [1, 0], atol=1e-5)
    # overlap pixel -> normalized sum direction
    r2 = rows_np[30]
    np.testing.assert_allclose(feats[r2][:2], [2**-0.5, 2**-0.5], atol=1e-2)
    # uncovered pixels contribute nothing
    r3 = rows_np[90]
    assert np.linalg.norm(feats[r3]) < 1e-6


def test_capacity_overflow(rng):
    sc = _scene(cap=16)
    pts = rng.uniform(-2, 2, (500, 3)).astype(np.float32)
    sc, rows = scene_mod.insert_points(
        sc, jnp.asarray(pts), jnp.zeros((500, 3)), jnp.ones(500, bool)
    )
    assert int(sc.num) == 16
    assert (np.asarray(sc.key)[:16] != int(SENTINEL)).all()


def test_sorted_index_matches_full_sort(rng):
    """The merge-based sorted index == a full sort of the stable keys, across
    many overlapping inserts (exercises the searchsorted rank merge)."""
    sc = _scene(cap=2048)
    for k in range(5):
        pts = rng.uniform(-1.5, 1.5, (300, 3)).astype(np.float32)
        if k > 1:  # re-insert some known region for existing-key hits
            pts[:80] = rng.uniform(-0.3, 0.3, (80, 3)).astype(np.float32)
        cols = rng.uniform(0, 1, (300, 3)).astype(np.float32)
        valid = rng.uniform(size=300) > 0.1
        sc, rows = scene_mod.insert_points(
            sc, jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(valid)
        )
        skey = np.asarray(sc.sorted_key)
        srow = np.asarray(sc.sorted_row)
        key = np.asarray(sc.key)
        ref = np.sort(key.astype(np.int64)).astype(np.int32)
        np.testing.assert_array_equal(skey, ref)
        # row mapping consistent on the real (non-padding) range:
        # sorted_key[i] == key[sorted_row[i]] and rows are unique.  (Padding
        # entries keep stale rows — lookup() only dereferences rows on a key
        # hit, so the sentinel region's row values are never read.)
        real = skey != SENTINEL
        np.testing.assert_array_equal(skey[real], key[srow[real]])
        assert len(np.unique(srow[real])) == real.sum()
