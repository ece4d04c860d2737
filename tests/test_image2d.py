import jax.numpy as jnp
import numpy as np

from holoagent_tpu.ops import image2d
from holoagent_tpu.ops.kmeans import kmeans
from holoagent_tpu.utils.ply import write_ply, read_ply


def test_gaussian_blur_preserves_mass():
    img = np.zeros((16, 16), np.float32)
    img[8, 8] = 1.0
    out = np.asarray(image2d.gaussian_blur(jnp.asarray(img), 1.0, 3))
    np.testing.assert_allclose(out.sum(), 1.0, rtol=1e-4)
    assert out[8, 8] > out[8, 9] > out[8, 10]


def test_morphology():
    m = np.zeros((12, 12), bool)
    m[4:8, 4:8] = True
    m[6, 6] = False  # hole closed by closing
    closed = np.asarray(image2d.morph_close(jnp.asarray(m), 3))
    assert closed[6, 6]
    m2 = np.zeros((12, 12), bool)
    m2[2, 2] = True  # speck removed by opening
    m2[6:10, 6:10] = True
    opened = np.asarray(image2d.morph_open(jnp.asarray(m2), 3))
    assert not opened[2, 2] and opened[7, 7]


def test_distance_transform():
    occ = np.zeros((20, 20), bool)
    occ[0, :] = True  # wall at row 0
    d = np.asarray(image2d.distance_transform(jnp.asarray(occ)))
    np.testing.assert_allclose(d[5, 10], 5.0, atol=0.01)
    np.testing.assert_allclose(d[0, :], 0.0)


def test_connected_components_and_relabel():
    m = np.zeros((16, 16), bool)
    m[2:5, 2:5] = True
    m[10:14, 10:14] = True
    lab = np.asarray(image2d.connected_components_2d(jnp.asarray(m)))
    assert lab[3, 3] != lab[11, 11] and lab[3, 3] >= 0
    comp, sizes = image2d.relabel_compact(jnp.asarray(lab), 8)
    comp, sizes = np.asarray(comp), np.asarray(sizes)
    assert set(np.unique(comp)) == {-1, 0, 1}
    assert sorted(sizes[sizes > 0].tolist()) == [9, 16]


def test_watershed_two_rooms():
    # two rooms split by a wall with a gap (door)
    h, w = 32, 48
    wall = np.zeros((h, w), bool)
    wall[:, 24] = True
    wall[14:18, 24] = False  # door
    free = ~wall
    dist = image2d.distance_transform(jnp.asarray(wall))
    seeds = np.full((h, w), -1, np.int32)
    seeds[16, 8] = 0
    seeds[16, 40] = 1
    lab = np.asarray(
        image2d.watershed_expand(jnp.asarray(seeds), jnp.asarray(free), dist, iters=128)
    )
    assert lab[5, 5] == 0 and lab[5, 43] == 1
    # most free pixels labeled
    assert (lab[free] >= 0).mean() > 0.95
    # rooms roughly split at the wall
    assert (lab[:, :20] == 0).mean() > 0.9
    assert (lab[:, 28:] == 1).mean() > 0.9


def test_fill_holes():
    m = np.zeros((16, 16), bool)
    m[3:12, 3:12] = True
    m[6:9, 6:9] = False
    out = np.asarray(image2d.fill_holes(jnp.asarray(m)))
    assert out[7, 7] and not out[0, 0]


def test_find_peaks():
    y = np.zeros(100, np.float32)
    y[20] = 5.0
    y[24] = 4.0  # suppressed (within distance 10 of a higher peak)
    y[60] = 3.0
    idx, cnt = image2d.find_peaks_1d(jnp.asarray(y), jnp.float32(1.0), 10, 8)
    idx = np.asarray(idx)
    assert int(cnt) == 2
    assert idx[0] == 20 and idx[1] == 60


def test_otsu():
    img = np.concatenate([np.full(500, 40.0), np.full(500, 200.0)]).astype(np.float32)
    img = img.reshape(25, 40)
    t = float(image2d.otsu_threshold(jnp.asarray(img)))
    # `img > t` must separate the two populations
    assert 40 <= t < 200
    sep = img > t
    assert not sep[img == 40].any() and sep[img == 200].all()


def test_kmeans_separates_clusters(rng):
    a = rng.normal(0, 0.1, (30, 4)) + np.array([5, 0, 0, 0])
    b = rng.normal(0, 0.1, (30, 4)) + np.array([0, 5, 0, 0])
    x = np.concatenate([a, b]).astype(np.float32)
    centers, labels = kmeans(jnp.asarray(x), jnp.ones(60, bool), 2, iters=20)
    labels = np.asarray(labels)
    assert len(set(labels[:30])) == 1 and len(set(labels[30:])) == 1
    assert labels[0] != labels[30]


def test_ply_roundtrip(tmp_path, rng):
    pts = rng.uniform(-1, 1, (100, 3))
    cols = rng.uniform(0, 1, (100, 3)).astype(np.float32)
    p = tmp_path / "x.ply"
    write_ply(p, pts, cols)
    pts2, cols2 = read_ply(p)
    np.testing.assert_allclose(pts2, pts, atol=1e-9)
    np.testing.assert_allclose(cols2, cols, atol=1 / 255.0)
