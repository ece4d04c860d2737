import numpy as np

from holoagent_tpu.dataloader import SyntheticDataset, SyntheticScene
from holoagent_tpu.ops.backproject import backproject
from holoagent_tpu.utils.camera import Pinhole
import jax.numpy as jnp


def test_render_basic():
    ds = SyntheticDataset(num_frames=4, hw=(60, 80))
    assert len(ds) == 4
    f = ds[0]
    assert f.rgb.shape == (60, 80, 3) and f.depth.shape == (60, 80)
    assert (f.depth > 0).mean() > 0.9  # mostly hits (indoor scene)
    assert f.depth[f.depth > 0].max() < 12.0
    inst, lab = ds.gt(0)
    assert inst.shape == (60, 80)


def test_backprojected_points_land_in_scene():
    ds = SyntheticDataset(num_frames=4, hw=(60, 80))
    sc = ds.scene
    f = ds[1]
    cam = Pinhole.from_matrix(f.k)
    pts, cols, valid = backproject(
        jnp.asarray(f.depth), jnp.asarray(f.rgb), cam, jnp.asarray(f.pose), 1e-3, 20.0
    )
    p = np.asarray(pts)[np.asarray(valid)]
    w, h = sc.extent
    assert (p[:, 0] > -0.5).all() and (p[:, 0] < w + 0.5).all()
    assert (p[:, 1] > -0.5).all() and (p[:, 1] < h + 0.5).all()
    assert (p[:, 2] > -0.2).all() and (p[:, 2] < sc.wall_height + 0.2).all()


def test_gt_instances_visible_across_frames():
    ds = SyntheticDataset(num_frames=8, hw=(60, 80))
    seen = set()
    for i in range(len(ds)):
        inst, _ = ds.gt(i)
        seen.update(np.unique(inst).tolist())
    seen.discard(-1)
    assert len(seen) >= 4  # most furniture instances observed over the orbit


def test_pose_replay_roundtrip(tmp_path):
    from holoagent_tpu.dataloader.synthetic import SyntheticDataset

    ds = SyntheticDataset(num_frames=6, hw=(30, 40))
    ds.save_poses(tmp_path / "poses.txt")
    ds2 = SyntheticDataset.from_pose_file(tmp_path / "poses.txt", hw=(30, 40))
    assert len(ds2) == 6
    np.testing.assert_allclose(ds2[3].rgb, ds[3].rgb, atol=1e-6)
    np.testing.assert_allclose(ds2[3].depth, ds[3].depth, atol=1e-6)


def test_two_floor_scene_and_long_queries():
    """two_floor: 2 storeys, 6 rooms, 54 boxes, >= 50 unique long queries
    (the >= 2-floor long-query benchmark scene, VERDICT r3 item 1c)."""
    import itertools

    from holoagent_tpu.dataloader.synthetic import SyntheticScene
    from holoagent_tpu.eval import gt_from_synthetic
    from holoagent_tpu.eval.long_query import generate_long_queries

    sc = SyntheticScene.two_floor()
    assert len(sc.level_zs()) == 2
    assert len(sc.boxes) == 54
    # non-overlapping furniture by construction (greedy placer)
    for a, b in itertools.combinations(sc.boxes, 2):
        lo = np.maximum(a.lo, b.lo)
        hi = np.minimum(a.hi, b.hi)
        assert not np.all(hi - lo > 1e-9), (a.label, b.label)
    gt = gt_from_synthetic(sc, room_rects=SyntheticScene.two_floor_room_rects())
    assert len(gt.floors) == 2 and len(gt.rooms) == 6
    # every object lands in a room on its own storey
    for o in gt.objects:
        assert gt.rooms[o.region_id].floor_id == o.floor_id
    qs = generate_long_queries(gt)
    assert len(qs) >= 50
    # floor number in the text is 1-indexed (engine parse contract)
    assert all(("floor 1" in q.text) or ("floor 2" in q.text) for q in qs)


def test_two_floor_renders_both_storeys():
    from holoagent_tpu.dataloader.synthetic import SyntheticDataset, SyntheticScene

    sc = SyntheticScene.two_floor()
    ds = SyntheticDataset(scene=sc, num_frames=12, hw=(40, 52))
    assert len(ds) == 12
    seen = set()
    for i in range(len(ds)):
        inst, _ = ds.gt(i)
        seen.update(np.unique(inst).tolist())
    seen.discard(-1)
    # instances from both storeys observed (storey 1 ids start at 27)
    assert any(i < 27 for i in seen) and any(i >= 27 for i in seen)


def test_palette_separation_contract():
    """Every fixture category color is >= 0.26 RGB distance from every other
    AND from the wall/floor colors — the fixture towers separate categories
    by color, and the round-3 palette's white cluster (refrigerator/toilet/
    bathtub/mirror/sink within 0.11-0.19 of each other and the walls) capped
    zero-shot top-1 at ~0.65 (synthetic.py _TWO_FLOOR_COLORS)."""
    import numpy as np

    from holoagent_tpu.dataloader.synthetic import SyntheticScene

    pal = dict(SyntheticScene._TWO_FLOOR_COLORS)
    pal["wall"] = (0.85, 0.82, 0.78)
    pal["floor"] = (0.55, 0.50, 0.45)
    ks = list(pal)
    for i in range(len(ks)):
        for j in range(i + 1, len(ks)):
            d = float(np.linalg.norm(np.subtract(pal[ks[i]], pal[ks[j]])))
            assert d >= 0.26, (ks[i], ks[j], d)
