"""Density filter consumed by HMSGraph.build: a scene polluted with sparse
far-away outlier blobs must segment into the same floors/rooms as the clean
scene (reference graph.py:348-358 prunes the fused cloud with
remove_radius_outlier(1000, 1.0) before floor/room segmentation)."""

import jax.numpy as jnp
import numpy as np

from holoagent_tpu.config import from_dict
from holoagent_tpu.memory import instances as inst_mod
from holoagent_tpu.memory import scene as scene_mod
from holoagent_tpu.memory.hmsg import HMSGraph
from holoagent_tpu.memory.mapping import MappedScene
from holoagent_tpu.ops.density import radius_density_keep
from holoagent_tpu.ops.voxel import GridSpec


def _cfg(tmp_path):
    return from_dict(
        {
            "main": {"save_path": str(tmp_path), "scene_id": "density"},
            "pipeline": {
                "voxel_size": 0.05,
                "grid_resolution": 0.08,
                "point_capacity": 1 << 16,
            },
        }
    )


def _room_points(rng):
    """A dense 4x4 m single-room slab with walls (z-up)."""
    xs = np.linspace(0.0, 4.0, 180)
    ys = np.linspace(0.0, 4.0, 180)
    gx, gy = np.meshgrid(xs, ys)
    floor = np.stack([gx.ravel(), gy.ravel(), np.zeros(gx.size)], axis=-1)
    t = np.linspace(0, 4, 160)
    h = np.linspace(0, 2.2, 70)
    tt, hh = np.meshgrid(t, h)
    walls = np.concatenate(
        [
            np.stack([tt.ravel(), np.zeros(tt.size), hh.ravel()], -1),
            np.stack([tt.ravel(), np.full(tt.size, 4.0), hh.ravel()], -1),
            np.stack([np.zeros(tt.size), tt.ravel(), hh.ravel()], -1),
            np.stack([np.full(tt.size, 4.0), tt.ravel(), hh.ravel()], -1),
        ]
    )
    pts = np.concatenate([floor, walls]).astype(np.float32)
    pts += rng.normal(0, 0.004, pts.shape).astype(np.float32)
    return pts


def _mapped(pts, with_density):
    grid = GridSpec.centered(0.05)
    scene = scene_mod.init_scene(grid, 1 << 16, 8)
    p = jnp.asarray(pts)
    cols = jnp.full_like(p, 0.5)
    scene, _ = scene_mod.insert_points(scene, p, cols, jnp.ones(len(pts), bool))
    density = None
    if with_density:
        density = radius_density_keep(
            scene.points(), scene.valid(), scene.count,
            radius=1.0, min_neighbors=1000.0,
        )
    inst = inst_mod.empty_instances(8, 64, 8)
    return MappedScene(
        scene=scene,
        instances=inst,
        instance_feats=jnp.zeros((8, 8)),
        keyframes=[],
        keyframe_feats=jnp.zeros((0, 8)),
        density_keep=density,
    )


def test_outlier_blobs_do_not_change_rooms(rng, tmp_path):
    cfg = _cfg(tmp_path)
    lf = np.eye(4, 8, dtype=np.float32)
    classes = ["a", "b", "c", "d"]

    clean = _room_points(rng)
    g_clean = HMSGraph.build(_mapped(clean, with_density=True), cfg, lf, classes)

    # sparse blobs far outside the room, inside the same z band
    blob1 = rng.normal(0, 0.2, (40, 3)).astype(np.float32) + [15.0, 15.0, 0.8]
    blob2 = rng.normal(0, 0.2, (30, 3)).astype(np.float32) + [-12.0, 3.0, 0.3]
    dirty = np.concatenate([clean, blob1, blob2])
    g_dirty = HMSGraph.build(_mapped(dirty, with_density=True), cfg, lf, classes)

    assert len(g_clean.floors) == len(g_dirty.floors) == 1
    assert len(g_clean.rooms) == len(g_dirty.rooms)
    # and the filtered floor extent ignores the blobs
    ext = g_dirty.floors[0].pcd_points
    assert ext[:, 0].max() < 5.0 and ext[:, 1].max() < 5.0


def test_unfiltered_outliers_would_inflate_extent(rng, tmp_path):
    """Control: without the density filter the blob leaks into the floor
    slab (this is the failure mode the filter exists to prevent)."""
    cfg = _cfg(tmp_path)
    lf = np.eye(4, 8, dtype=np.float32)
    classes = ["a", "b", "c", "d"]
    clean = _room_points(rng)
    blob = rng.normal(0, 0.2, (40, 3)).astype(np.float32) + [15.0, 15.0, 0.8]
    dirty = np.concatenate([clean, blob])
    g = HMSGraph.build(_mapped(dirty, with_density=False), cfg, lf, classes)
    assert g.floors[0].pcd_points[:, 0].max() > 5.0
