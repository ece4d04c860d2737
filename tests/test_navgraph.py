import networkx as nx
import numpy as np
import pytest

from holoagent_tpu.dataloader import SyntheticDataset
from holoagent_tpu.memory import navgraph
from holoagent_tpu.ops.backproject import backproject
from holoagent_tpu.utils.camera import Pinhole
import jax.numpy as jnp


@pytest.fixture(scope="module")
def floor_points():
    """Dense fused points of the synthetic two-room floor."""
    ds = SyntheticDataset(num_frames=12, hw=(60, 80))
    pts = []
    for i in range(0, 12, 2):
        f = ds[i]
        p, _, v = backproject(
            jnp.asarray(f.depth), jnp.asarray(f.rgb), Pinhole.from_matrix(f.k),
            jnp.asarray(f.pose), 1e-3, 20.0,
        )
        pts.append(np.asarray(p)[np.asarray(v)])
    return np.concatenate(pts).astype(np.float64), ds


def test_raster_and_voronoi(floor_points):
    pts, ds = floor_points
    raster = navgraph.build_floor_raster(pts, zero_level=0.0, cell_size=0.1)
    assert raster.free.any() and raster.occupied.any()
    # free space should not include wall cells
    g = navgraph.voronoi_graph(raster, floor_id=0)
    assert g.number_of_nodes() > 10
    assert nx.is_connected(g)
    # all node positions inside the scene bounds
    pos = np.array([g.nodes[n]["pos"] for n in g.nodes])
    w, h = ds.scene.extent
    assert (pos[:, 0] > -1).all() and (pos[:, 0] < w + 1).all()


def test_sparsify_reduces_nodes(floor_points):
    pts, _ = floor_points
    raster = navgraph.build_floor_raster(pts, 0.0, cell_size=0.1)
    g = navgraph.voronoi_graph(raster, 0)
    sg = navgraph.sparsify_graph(g, resampling_dist=0.5)
    assert 0 < sg.number_of_nodes() < g.number_of_nodes()
    assert nx.is_connected(sg)


def test_plan_path_between_rooms(floor_points):
    pts, ds = floor_points
    raster = navgraph.build_floor_raster(pts, 0.0, cell_size=0.1)
    g = navgraph.sparsify_graph(navgraph.voronoi_graph(raster, 0), 0.4)
    w, h = ds.scene.extent
    start = np.array([w * 0.25, h * 0.5, 0.0])
    goal = np.array([w * 0.75, h * 0.5, 0.0])
    path = navgraph.plan_path(g, start, goal)
    assert len(path) >= 2
    # the path must pass through the door region (y in [2.4, 3.6] at x~w/2)
    xs = np.array([p[0] for p in path])
    crossing = np.where((xs[:-1] - w / 2) * (xs[1:] - w / 2) < 0)[0]
    assert len(crossing) >= 1
    for c in crossing:
        y = (path[c][1] + path[c + 1][1]) / 2
        assert 2.0 < y < 4.0  # through the door, not through the wall


def test_save_load_roundtrip(floor_points, tmp_path):
    pts, _ = floor_points
    raster = navgraph.build_floor_raster(pts, 0.0, cell_size=0.1)
    g = navgraph.sparsify_graph(navgraph.voronoi_graph(raster, 0), 0.5)
    navgraph.save_graph(g, tmp_path / "nav.json")
    g2 = navgraph.load_graph(tmp_path / "nav.json")
    assert g2.number_of_nodes() == g.number_of_nodes()
    assert g2.number_of_edges() == g.number_of_edges()


def test_stairs_and_connect():
    poses = []
    for i in range(10):
        p = np.eye(4)
        p[:3, 3] = [0.1 * i, 0.0, 0.3 * i]
        poses.append(p)
    sg = navgraph.stairs_graph(poses, 0.5, 2.5, 0)
    assert sg.number_of_nodes() >= 2
    g2 = nx.Graph()
    g2.add_node((0.0, 0.0, 1), pos=(0.0, 0.0, 3.0), floor_id=1)
    g2.add_node((1.0, 0.0, 1), pos=(1.0, 0.0, 3.0), floor_id=1)
    g2.add_edge((0.0, 0.0, 1), (1.0, 0.0, 1), dist=1.0)
    merged = navgraph.connect_graphs(sg, g2)
    assert nx.is_connected(merged)
