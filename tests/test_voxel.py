import jax.numpy as jnp
import numpy as np

from holoagent_tpu.ops import voxel


def _grid(vs=0.05):
    return voxel.GridSpec.centered(vs)


def test_pack_unpack_roundtrip(rng):
    c = np.stack(
        [
            rng.integers(0, voxel.NX - 1, 1000),
            rng.integers(0, voxel.NY - 1, 1000),
            rng.integers(0, voxel.NZ - 1, 1000),
        ],
        axis=-1,
    ).astype(np.int32)
    k = voxel.pack(jnp.asarray(c))
    back = voxel.unpack(k)
    np.testing.assert_array_equal(np.asarray(back), c)
    assert int(jnp.max(k)) < int(voxel.SENTINEL)


def test_downsample_means_match_numpy(rng):
    grid = _grid(0.1)
    pts = rng.uniform(-2.0, 2.0, size=(5000, 3)).astype(np.float32)
    attrs = rng.uniform(0, 1, size=(5000, 4)).astype(np.float32)
    valid = rng.uniform(size=5000) > 0.1
    out = voxel.voxel_downsample(
        jnp.asarray(pts), jnp.asarray(attrs), jnp.asarray(valid), grid, capacity=8192
    )
    # numpy reference: group by integer cell
    cells = np.floor((pts - np.asarray(grid.origin)) / float(grid.voxel_size)).astype(np.int64)
    keymap = {}
    for i in range(len(pts)):
        if not valid[i]:
            continue
        k = tuple(cells[i])
        keymap.setdefault(k, []).append(i)
    assert int(out["num"]) == len(keymap)
    # check means for a sample of cells via key lookup
    got_keys = np.asarray(out["key"])
    got_pts = np.asarray(out["points"])
    for k, members in list(keymap.items())[:50]:
        packed = (k[0] << (voxel.BITS_Y + voxel.BITS_Z)) | (k[1] << voxel.BITS_Z) | k[2]
        row = np.searchsorted(got_keys, packed)
        assert got_keys[row] == packed
        np.testing.assert_allclose(got_pts[row], pts[members].mean(0), rtol=1e-5, atol=1e-5)


def test_downsample_segments_inverse(rng):
    grid = _grid(0.25)
    pts = rng.uniform(-1, 1, size=(300, 3)).astype(np.float32)
    valid = np.ones(300, bool)
    out = voxel.voxel_downsample(
        jnp.asarray(pts),
        jnp.zeros((300, 1), np.float32),
        jnp.asarray(valid),
        grid,
        capacity=512,
        return_segments=True,
    )
    seg = np.asarray(out["segments"])
    keys = np.asarray(out["key"])
    my_key = np.asarray(voxel.keys_of(jnp.asarray(pts), jnp.asarray(valid), grid))
    assert (seg >= 0).all()
    np.testing.assert_array_equal(keys[seg], my_key)


def test_downsample_overflow_goes_to_trash(rng):
    grid = _grid(0.01)
    pts = rng.uniform(-5, 5, size=(1000, 3)).astype(np.float32)
    out = voxel.voxel_downsample(
        jnp.asarray(pts),
        jnp.zeros((1000, 1), np.float32),
        jnp.ones(1000, bool),
        grid,
        capacity=16,
    )
    assert int(out["num"]) == 16  # capacity-limited, no crash
    assert bool(jnp.all(out["valid"]))


def test_lookup_and_snap(rng):
    grid = _grid(0.1)
    pts = rng.uniform(-1, 1, size=(2000, 3)).astype(np.float32)
    out = voxel.voxel_downsample(
        jnp.asarray(pts),
        jnp.zeros((2000, 1), np.float32),
        jnp.ones(2000, bool),
        grid,
        capacity=4096,
    )
    # query: jitter original points slightly; snap must find a voxel within
    # one cell distance
    q = pts[:100] + rng.normal(0, 0.01, size=(100, 3)).astype(np.float32)
    idx, dist = voxel.snap_to_voxels(
        jnp.asarray(q), jnp.ones(100, bool), out["key"], out["points"], grid
    )
    idx = np.asarray(idx)
    assert (idx >= 0).all()
    assert (np.asarray(dist) < 0.2).all()
    # far-away query finds nothing
    far = jnp.asarray(np.full((4, 3), 40.0, np.float32))
    idx2, _ = voxel.snap_to_voxels(far, jnp.ones(4, bool), out["key"], out["points"], grid)
    assert (np.asarray(idx2) == -1).all()


def test_intersect_count():
    a = jnp.asarray(np.array([1, 3, 5, 7, voxel.SENTINEL], np.int32))
    b = jnp.asarray(np.array([3, 4, 5, voxel.SENTINEL, voxel.SENTINEL], np.int32))
    assert int(voxel.intersect_count(a, b)) == 2
