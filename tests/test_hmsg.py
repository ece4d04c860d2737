import jax
import jax.numpy as jnp
import numpy as np
import pytest

from holoagent_tpu.config import from_dict
from holoagent_tpu.dataloader import SyntheticDataset
from holoagent_tpu.memory.hmsg import HMSGraph, detect_floor_boundaries, check_object_in_view
from holoagent_tpu.memory.mapping import Mapper
from holoagent_tpu.models import clip as clip_mod
from holoagent_tpu.models import sam as sam_mod
from holoagent_tpu.models.tokenizer import SimpleTokenizer
from holoagent_tpu.utils.labels import get_label_feats, DEFAULT_ROOM_TYPES


@pytest.fixture(scope="module")
def built():
    cfg = from_dict(
        {
            "models": {
                "clip": {"type": "test-tiny", "dtype": "float32"},
                "sam": {
                    "type": "test-tiny",
                    "points_per_side": 4,
                    "pred_iou_thresh": -10.0,
                    "stability_score_thresh": 0.0,
                    "min_mask_region_area": 20,
                    "max_masks": 8,
                },
            },
            "pipeline": {
                "voxel_size": 0.08,
                "skip_frames": 2,
                "grid_resolution": 0.08,
                "point_capacity": 1 << 15,
                "mask_point_capacity": 512,
                "instance_capacity": 64,
            },
        }
    )
    ds = SyntheticDataset(num_frames=12, hw=(48, 64))
    clip_p = clip_mod.init_clip(jax.random.key(0), clip_mod.VARIANTS["test-tiny"])
    sam_p = sam_mod.init_sam(jax.random.key(1), sam_mod.VARIANTS["test-tiny"])
    mapper = Mapper(cfg, clip_p, sam_p)
    mapped = mapper.run(ds)
    tok = SimpleTokenizer()
    variant = clip_mod.VARIANTS["test-tiny"]
    lf, classes = get_label_feats(clip_p, tok, variant, "SCANNET20")
    graph = HMSGraph.build(mapped, cfg, lf, classes)
    rt, _ = get_label_feats(clip_p, tok, variant, "ROOM_TYPES")
    graph.generate_room_names(rt, DEFAULT_ROOM_TYPES)
    return graph, ds, mapped


def test_floor_boundaries_single_story(rng):
    z = np.concatenate([np.zeros(4000), rng.uniform(0, 2.5, 2000), np.full(800, 2.5)])
    z += rng.normal(0, 0.01, len(z))
    floors = detect_floor_boundaries(z)
    assert 1 <= len(floors) <= 2
    assert floors[0][0] < 0.2


def test_floor_boundaries_two_story(rng):
    # two slabs at z=0 and z=3 with ceilings
    def story(z0):
        return np.concatenate(
            [np.full(4000, z0), rng.uniform(z0, z0 + 2.4, 1500)]
        )
    z = np.concatenate([story(0.0), story(3.0)]) + rng.normal(0, 0.01, 11000)
    floors = detect_floor_boundaries(z)
    assert len(floors) >= 2
    # some boundary near z=3 separates the stories
    assert any(2.0 < b[0] < 3.2 for b in floors[1:])


def test_floor_boundaries_two_story_voxel_snapped(rng):
    """Regression (round 5): voxel-snapped scenes put the ground slab at
    EXACTLY z=0 — the first histogram bin.  The old peak-height lookup
    (searchsorted-1) wrapped that peak's height to the last bin, the ground
    peak lost the tallest-per-cluster vote, and both storeys collapsed into
    one floor (the long-query battery's floor_acc 0.5 signature)."""
    z = np.concatenate([
        np.zeros(26000),                      # ground slab, exact 0.0
        rng.uniform(0.35, 1.15, 9000),        # storey-0 furniture/walls
        np.full(26000, 2.98),                 # storey-1 slab, exact value
        rng.uniform(3.3, 4.1, 9000),
    ])
    floors = detect_floor_boundaries(z)
    assert len(floors) == 2, floors
    assert floors[0][0] < 0.2, floors
    assert 2.5 < floors[0][1] <= 2.99, floors


def test_hmsg_structure(built):
    g, ds, mapped = built
    assert len(g.floors) >= 1
    assert len(g.rooms) >= 1
    assert len(g.views) >= 1
    # the two-room synthetic scene should yield >= 2 rooms on floor 0
    assert len(g.floors[0].rooms) >= 2
    for room in g.rooms:
        assert room.pcd_points is not None and len(room.pcd_points) > 0
        assert room.name is not None
    for obj in g.objects:
        assert obj.room_id in {r.room_id for r in g.rooms}
        np.testing.assert_allclose(np.linalg.norm(obj.embedding), 1.0, atol=1e-3)
    # graph topology: root 0 connects floors
    assert g.graph.has_node(0)


def test_hmsg_save_load_roundtrip(built, tmp_path):
    g, _, _ = built
    g.save(tmp_path)
    g2 = HMSGraph.load(tmp_path)
    assert len(g2.floors) == len(g.floors)
    assert len(g2.rooms) == len(g.rooms)
    assert len(g2.objects) == len(g.objects)
    assert len(g2.views) == len(g.views)
    r1 = sorted(g.rooms, key=lambda r: r.room_id)[0]
    r2 = sorted(g2.rooms, key=lambda r: r.room_id)[0]
    assert r1.name == r2.name
    np.testing.assert_allclose(r1.pcd_points, r2.pcd_points, atol=1e-9)
    if g.objects:
        o1 = sorted(g.objects, key=lambda o: o.object_id)[0]
        o2 = sorted(g2.objects, key=lambda o: o.object_id)[0]
        np.testing.assert_allclose(o1.embedding, o2.embedding, atol=1e-6)
        assert o1.view_ids == o2.view_ids


def test_check_object_in_view():
    k = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    pts = np.array([[0.0, 0.0, 2.0], [0.1, 0.1, 2.0]])
    vis, d = check_object_in_view(64, 48, k, np.eye(4), pts)
    assert vis and abs(d - 2.0) < 1e-6
    behind = np.array([[0.0, 0.0, -2.0]])
    vis2, _ = check_object_in_view(64, 48, k, np.eye(4), behind)
    assert not vis2


def test_room_names_from_objects(built):
    g, _, _ = built
    import jax as _jax
    from holoagent_tpu.models.tokenizer import SimpleTokenizer as _Tok
    from holoagent_tpu.utils.labels import get_label_feats as _glf, DEFAULT_ROOM_TYPES as _RT
    clip_p = clip_mod.init_clip(_jax.random.key(0), clip_mod.VARIANTS["test-tiny"])
    rt, _ = _glf(clip_p, _Tok(), clip_mod.VARIANTS["test-tiny"], "ROOM_TYPES")
    g.generate_room_names(np.asarray(rt), _RT, method="objects")
    assert all(r.name for r in g.rooms)


def test_room_naming_is_majority_vote_over_views():
    """View-embedding naming = per-view argmax MAJORITY (reference
    room.py:159-169), not a dominant-feature reduction: three weak 'bathroom'
    views must beat one strong 'library' view (the reduction picked the tight
    off-majority cluster and misnamed the fixture bathroom, round 5)."""
    from holoagent_tpu.memory.hmsg import HMSGraph
    from holoagent_tpu.memory.nodes import Room

    types = ("bathroom", "library")
    tf = np.eye(2, 8, dtype=np.float32)  # type features: e0, e1
    r = Room("0_0", "0")
    weak = np.zeros(8, np.float32); weak[0] = 0.2; weak[2] = 0.98
    strong = np.zeros(8, np.float32); strong[1] = 1.0
    r.embeddings = [weak.copy(), weak.copy(), weak.copy(), strong]
    g = HMSGraph(); g.rooms.append(r)
    g.generate_room_names(tf, types)
    assert r.name == "bathroom"

    # structure objects never vote in the objects mode (reference
    # room.py:273-285 filter)
    from holoagent_tpu.memory.nodes import Object as _O
    r2 = Room("0_1", "0")
    for name, vec_i in (("floor", 1), ("wall", 1), ("toilet", 0)):
        o = _O(f"0_1_{name}", "0_1", name=name)
        e = np.zeros(8, np.float32); e[vec_i] = 1.0
        o.embedding = e
        r2.objects.append(o)
    g2 = HMSGraph(); g2.rooms.append(r2)
    g2.generate_room_names(tf, types, method="objects")
    assert r2.name == "bathroom"  # only the toilet votes


def test_visualizer_writes_pngs(built, tmp_path):
    from holoagent_tpu.apps.visualize_graph import render_hierarchy, render_top_down

    g, _, _ = built
    render_top_down(g, tmp_path / "map.png")
    render_hierarchy(g, tmp_path / "h.png")
    assert (tmp_path / "map.png").stat().st_size > 1000
    assert (tmp_path / "h.png").stat().st_size > 1000


def test_generate_room_names_llm_with_fallback(built_graph_fixtureless=None):
    """LLM method: names from the LLM reply when it matches a known type;
    rooms with unusable replies fall back to the object vote."""
    import numpy as np
    from holoagent_tpu.memory.hmsg import HMSGraph
    from holoagent_tpu.memory.nodes import Floor, Object, Room

    g = HMSGraph()
    fl = Floor("0")
    fl.floor_zero_level, fl.floor_height = 0.0, 2.5
    g.floors.append(fl)
    d = 8
    types = ["kitchen", "bedroom"]
    tfeats = np.eye(2, d, dtype=np.float32)  # kitchen=e0, bedroom=e1
    for ri, objs in enumerate([["stove", "fridge"], ["bed", "pillow"]]):
        r = Room(f"0_{ri}", "0")
        r.room_zero_level, r.room_height = 0.0, 2.5
        for oi, name in enumerate(objs):
            o = Object(f"0_{ri}_{oi}", r.room_id, name=name)
            emb = np.zeros(d, np.float32)
            emb[ri] = 1.0  # votes for types[ri]
            o.embedding = emb
            r.add_object(o)
        fl.add_room(r)
        g.rooms.append(r)

    calls = []

    def llm(system, prompt):
        calls.append(prompt)
        if "stove" in prompt:
            return "This is clearly a KITCHEN."
        return "no idea"  # -> fallback vote picks bedroom via embeddings

    g.generate_room_names(tfeats, types, method="llm", llm=llm)
    assert g.rooms[0].name == "kitchen"
    assert g.rooms[1].name == "bedroom"
    assert len(calls) == 2


def test_save_intermediate_results_artifacts(tmp_path):
    """pipeline.save_intermediate_results writes the debug artifact set
    (floor z-histogram + bounds, per-floor room rasters)."""
    import json as _json

    from holoagent_tpu import config as cfgmod
    from holoagent_tpu.apps import build_map

    cfg = cfgmod.load(
        "config/synthetic.yaml",
        [f"main.save_path={tmp_path}", "pipeline.save_intermediate_results=true"],
    )
    build_map.run(cfg)
    dbg = tmp_path / cfg.main.scene_id / "debug"
    assert (dbg / "floor_z_histogram.npy").exists()
    bounds = _json.loads((dbg / "floor_bounds.json").read_text())
    assert len(bounds) >= 1 and bounds[0][0] < bounds[0][1]
    rasters = list(dbg.glob("room_labels_floor*.npy"))
    assert rasters, "no room raster artifacts"
    lab = np.load(rasters[0])
    assert lab.ndim == 2


def _story_points(rng, z0, extent=(6.0, 4.0), wall_h=2.5, divide_x=None):
    """Sampled slab + perimeter walls for one story; optional dividing wall
    with a 1 m door gap."""
    w, h = extent
    xs = np.linspace(0, w, 150)
    ys = np.linspace(0, h, 110)
    gx, gy = np.meshgrid(xs, ys)
    slab = np.stack([gx.ravel(), gy.ravel(), np.full(gx.size, z0)], -1)
    t = np.linspace(0, 1, 130)
    zz = np.linspace(z0, z0 + wall_h, 60)
    tt, hh = np.meshgrid(t, zz)
    walls = np.concatenate([
        np.stack([tt.ravel() * w, np.zeros(tt.size), hh.ravel()], -1),
        np.stack([tt.ravel() * w, np.full(tt.size, h), hh.ravel()], -1),
        np.stack([np.zeros(tt.size), tt.ravel() * h, hh.ravel()], -1),
        np.stack([np.full(tt.size, w), tt.ravel() * h, hh.ravel()], -1),
    ])
    parts = [slab, walls]
    if divide_x is not None:
        # dividing wall with a door gap at y in [1.5, 2.5]
        yy = np.concatenate([np.linspace(0, 1.5, 60), np.linspace(2.5, h, 60)])
        dy, dz = np.meshgrid(yy, zz)
        parts.append(np.stack([np.full(dy.size, divide_x), dy.ravel(), dz.ravel()], -1))
    pts = np.concatenate(parts).astype(np.float32)
    return pts + rng.normal(0, 0.004, pts.shape).astype(np.float32)


def test_two_story_graph_golden(rng, tmp_path):
    """Golden multi-floor fixture (VERDICT weak #8): a two-story building with
    two rooms downstairs and one upstairs must segment into exactly that."""
    from holoagent_tpu.memory import instances as inst_mod
    from holoagent_tpu.memory import scene as scene_mod
    from holoagent_tpu.memory.mapping import MappedScene
    from holoagent_tpu.ops.voxel import GridSpec

    story0 = _story_points(rng, 0.0, divide_x=3.0)
    story1 = _story_points(rng, 2.8)
    pts = np.concatenate([story0, story1])

    grid = GridSpec.centered(0.05)
    scene = scene_mod.init_scene(grid, 1 << 17, 8)
    scene, _ = scene_mod.insert_points(
        scene, jnp.asarray(pts), jnp.full((len(pts), 3), 0.5), jnp.ones(len(pts), bool)
    )
    mapped = MappedScene(
        scene=scene,
        instances=inst_mod.empty_instances(8, 64, 8),
        instance_feats=jnp.zeros((8, 8)),
        keyframes=[],
        keyframe_feats=jnp.zeros((0, 8)),
    )
    cfg = from_dict(
        {
            "main": {"save_path": str(tmp_path), "scene_id": "twostory"},
            "pipeline": {"voxel_size": 0.05, "grid_resolution": 0.08,
                         "point_capacity": 1 << 17},
        }
    )
    g = HMSGraph.build(mapped, cfg, np.eye(4, 8, dtype=np.float32), ["a", "b", "c", "d"])
    assert len(g.floors) == 2, [f.floor_zero_level for f in g.floors]
    z0 = sorted(f.floor_zero_level for f in g.floors)
    assert abs(z0[0] - 0.0) < 0.3 and abs(z0[1] - 2.8) < 0.4
    n_rooms = [len(f.rooms) for f in sorted(g.floors, key=lambda f: f.floor_zero_level)]
    # downstairs divides at the wall (door gap tolerated); upstairs is one room
    assert n_rooms[0] == 2, n_rooms
    assert n_rooms[1] == 1, n_rooms
