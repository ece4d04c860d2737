"""Per-floor free-space navigation graphs (Voronoi skeleton + stairs).

Rebuild of the reference NavigationGraph
(reference fsr_vln/memory/hmsg/graph/navigation_graph.py): per-floor occupancy
and free-space rasters, a Voronoi skeleton of the free space (:486-607),
degree-2 chain sparsification (:609-736), a stairs chain from traversal poses
(:823-951), cross-floor connection through the closest node pair (:1256-1314),
and node-link JSON persistence (:1346-1359).

This is a cold, graph-shaped stage (runs once per scene), so orchestration is
host python over scipy/networkx per the design stance (SURVEY.md §7.5); the
rasters reuse the jitted image kernels and the SDF replaces skfmm with the
jump-flood distance transform.  World is z-up; the plan plane is xy.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import networkx as nx
import numpy as np
from scipy.spatial import Voronoi

from ..ops import image2d


@dataclass
class FloorRaster:
    origin: np.ndarray  # (2,) world xy of cell (0, 0)
    cell_size: float
    free: np.ndarray  # (H, W) bool free space
    occupied: np.ndarray  # (H, W) bool obstacles
    height: np.ndarray  # (H, W) float walkable height (floor zero by default)
    sdf: np.ndarray  # (H, W) float distance-to-obstacle in metres

    def to_world(self, rc: np.ndarray) -> np.ndarray:
        """(row, col) -> world xy."""
        rc = np.asarray(rc, np.float64)
        return np.stack(
            [rc[..., 1] * self.cell_size + self.origin[0],
             rc[..., 0] * self.cell_size + self.origin[1]],
            axis=-1,
        )

    def to_grid(self, xy: np.ndarray) -> np.ndarray:
        xy = np.asarray(xy, np.float64)
        return np.stack(
            [np.floor((xy[..., 1] - self.origin[1]) / self.cell_size),
             np.floor((xy[..., 0] - self.origin[0]) / self.cell_size)],
            axis=-1,
        ).astype(np.int64)


def build_floor_raster(
    floor_points: np.ndarray,  # (N, 3) z-up
    zero_level: float,
    cell_size: float = 0.05,
    obstacle_band: Tuple[float, float] = (0.2, 1.5),
    dilation: int = 5,
) -> FloorRaster:
    """Occupancy/free-space rasters (reference :142-320: obstacle slab between
    ankle and head height, dilated; free = floor region minus obstacles)."""
    xy_min = floor_points[:, :2].min(axis=0) - 2 * cell_size
    xy_max = floor_points[:, :2].max(axis=0) + 2 * cell_size
    w = int(np.ceil((xy_max[0] - xy_min[0]) / cell_size)) + 1
    h = int(np.ceil((xy_max[1] - xy_min[1]) / cell_size)) + 1

    def raster(pts2d) -> np.ndarray:
        img = np.zeros((h, w), np.uint8)
        if len(pts2d):
            c = np.floor((pts2d - xy_min) / cell_size).astype(np.int64)
            img[np.clip(c[:, 1], 0, h - 1), np.clip(c[:, 0], 0, w - 1)] = 1
        return img

    z = floor_points[:, 2]
    obstacles = raster(
        floor_points[(z > zero_level + obstacle_band[0]) & (z < zero_level + obstacle_band[1])][:, :2]
    )
    region = raster(floor_points[z < zero_level + obstacle_band[1]][:, :2])
    if dilation > 0:
        obstacles = np.asarray(
            image2d.morph_close(jnp.asarray(obstacles > 0), dilation, 1)
        ) | (obstacles > 0)
        # dilate obstacles by `dilation` cells
        obstacles = np.asarray(image2d.dilate(jnp.asarray(obstacles), dilation, 1))
    region = np.asarray(image2d.fill_holes(jnp.asarray(region > 0)))
    free = region & ~obstacles
    sdf = np.asarray(image2d.distance_transform(jnp.asarray(obstacles))) * cell_size
    height = np.full((h, w), zero_level, np.float32)
    return FloorRaster(
        origin=xy_min.astype(np.float64),
        cell_size=cell_size,
        free=free,
        occupied=obstacles.astype(bool),
        height=height,
        sdf=sdf,
    )


def voronoi_graph(raster: FloorRaster, floor_id: int, min_clearance: float = 0.1) -> nx.Graph:
    """Voronoi skeleton of the free space (reference :486-607): seed the
    Voronoi diagram with free-space boundary cells, keep ridges fully inside
    free space."""
    free = raster.free
    eroded = np.asarray(image2d.morph_open(jnp.asarray(free), 3, 1)) & free
    boundary = free & ~np.asarray(image2d.erode(jnp.asarray(free), 3, 1))
    pts = np.argwhere(boundary)
    g = nx.Graph()
    if len(pts) < 4:
        return g
    vor = Voronoi(pts)
    h, w = free.shape
    for simplex in vor.ridge_vertices:
        s = np.asarray(simplex)
        if np.any(s < 0):
            continue
        src, tar = vor.vertices[s]
        if not (0 <= src[0] < h and 0 <= src[1] < w and 0 <= tar[0] < h and 0 <= tar[1] < w):
            continue
        if not (free[int(src[0]), int(src[1])] and free[int(tar[0]), int(tar[1])]):
            continue
        if (
            raster.sdf[int(src[0]), int(src[1])] < min_clearance
            or raster.sdf[int(tar[0]), int(tar[1])] < min_clearance
        ):
            continue
        for p in (src, tar):
            key = (float(p[0]), float(p[1]), floor_id)
            if key not in g:
                xy = raster.to_world(p)
                zh = raster.height[int(p[0]), int(p[1])]
                g.add_node(key, pos=(float(xy[0]), float(xy[1]), float(zh)), floor_id=floor_id)
        g.add_edge(
            (float(src[0]), float(src[1]), floor_id),
            (float(tar[0]), float(tar[1]), floor_id),
            dist=float(np.linalg.norm(src - tar) * raster.cell_size),
        )
    if g.number_of_nodes():
        # keep the largest connected component (the main skeleton)
        comp = max(nx.connected_components(g), key=len)
        g = g.subgraph(comp).copy()
    return g


def sparsify_graph(g: nx.Graph, resampling_dist: float = 0.4) -> nx.Graph:
    """Contract degree-2 chains, then resample long chains every
    `resampling_dist` metres (reference :609-736)."""
    if g.number_of_nodes() == 0:
        return g
    out = nx.Graph()
    junctions = [n for n in g.nodes if g.degree(n) != 2]
    if not junctions:  # a pure cycle: keep one node as junction
        junctions = [next(iter(g.nodes))]
    visited_edges = set()
    for j in junctions:
        for nbr in g.neighbors(j):
            if (j, nbr) in visited_edges:
                continue
            # walk the chain until the next junction
            chain = [j, nbr]
            prev, cur = j, nbr
            while g.degree(cur) == 2 and cur not in junctions:
                nxt = next(n for n in g.neighbors(cur) if n != prev)
                prev, cur = cur, nxt
                chain.append(cur)
            for a, b in zip(chain[:-1], chain[1:]):
                visited_edges.add((a, b))
                visited_edges.add((b, a))
            # resample chain positions by accumulated distance
            pos = np.array([g.nodes[n]["pos"] for n in chain])
            seg = np.linalg.norm(np.diff(pos, axis=0), axis=1)
            cum = np.concatenate([[0.0], np.cumsum(seg)])
            keep_idx = [0]
            next_d = resampling_dist
            for i in range(1, len(chain) - 1):
                if cum[i] >= next_d:
                    keep_idx.append(i)
                    next_d = cum[i] + resampling_dist
            keep_idx.append(len(chain) - 1)
            kept = [chain[i] for i in keep_idx]
            for n in kept:
                out.add_node(n, **g.nodes[n])
            for a, b in zip(kept[:-1], kept[1:]):
                d = float(
                    np.linalg.norm(
                        np.array(g.nodes[a]["pos"]) - np.array(g.nodes[b]["pos"])
                    )
                )
                out.add_edge(a, b, dist=d)
    return out


def stairs_graph(
    poses: Sequence[np.ndarray], z_lo: float, z_hi: float, floor_id: int
) -> nx.Graph:
    """Chain graph through traversal poses whose camera height crosses between
    floors (reference :823-951 get_stairs_graph_with_poses_v2 semantics:
    the recorded walk itself is the stairs path)."""
    g = nx.Graph()
    pts = [p[:3, 3] for p in poses if z_lo <= p[2, 3] <= z_hi]
    if len(pts) < 2:
        return g
    pts = np.array(sorted(pts, key=lambda p: p[2]))
    keys = []
    for i, p in enumerate(pts):
        key = (float(i), 0.0, -1000 - floor_id)  # stairs namespace
        g.add_node(key, pos=(float(p[0]), float(p[1]), float(p[2])), floor_id=floor_id)
        keys.append(key)
    for a, b in zip(keys[:-1], keys[1:]):
        g.add_edge(a, b, dist=float(np.linalg.norm(
            np.array(g.nodes[a]["pos"]) - np.array(g.nodes[b]["pos"]))))
    return g


def connect_graphs(src: nx.Graph, tar: nx.Graph) -> nx.Graph:
    """Compose two graphs, bridging the closest node pair (reference :1256-1314)."""
    if src.number_of_nodes() == 0:
        return tar
    if tar.number_of_nodes() == 0:
        return src
    src_nodes = list(src.nodes)
    tar_nodes = [n for n in tar.nodes if tar.degree(n) > 1] or list(tar.nodes)
    sp = np.array([src.nodes[n]["pos"] for n in src_nodes])
    tp = np.array([tar.nodes[n]["pos"] for n in tar_nodes])
    d = np.linalg.norm(sp[:, None] - tp[None], axis=-1)
    i, j = np.unravel_index(np.argmin(d), d.shape)
    out = nx.compose(tar, src)
    out.add_edge(src_nodes[i], tar_nodes[j], dist=float(d[i, j]))
    return out


def save_graph(g: nx.Graph, path: str | Path) -> None:
    """Node-link JSON (reference :1346-1359 layout)."""
    data = nx.node_link_data(g, edges="links")
    # tuple keys are not JSON-serializable: stringify
    for n in data["nodes"]:
        n["id"] = list(n["id"]) if isinstance(n["id"], tuple) else n["id"]
    for e in data["links"]:
        for k in ("source", "target"):
            e[k] = list(e[k]) if isinstance(e[k], tuple) else e[k]
    Path(path).write_text(json.dumps(data, indent=2))


def load_graph(path: str | Path) -> nx.Graph:
    data = json.loads(Path(path).read_text())
    for n in data["nodes"]:
        if isinstance(n["id"], list):
            n["id"] = tuple(n["id"])
        if isinstance(n.get("pos"), list):
            n["pos"] = tuple(n["pos"])
    for e in data["links"]:
        for k in ("source", "target"):
            if isinstance(e[k], list):
                e[k] = tuple(e[k])
    return nx.node_link_graph(data, edges="links")


def plan_path(g: nx.Graph, start_xyz: np.ndarray, goal_xyz: np.ndarray) -> List[np.ndarray]:
    """Shortest path between the graph nodes nearest to start/goal (the
    waypoint chain handed to the host navigation stack)."""
    if g.number_of_nodes() == 0:
        return []
    nodes = list(g.nodes)
    pos = np.array([g.nodes[n]["pos"] for n in nodes])
    s = nodes[int(np.argmin(np.linalg.norm(pos - np.asarray(start_xyz), axis=1)))]
    t = nodes[int(np.argmin(np.linalg.norm(pos - np.asarray(goal_xyz), axis=1)))]
    try:
        path = nx.shortest_path(g, s, t, weight="dist")
    except nx.NetworkXNoPath:
        return []
    return [np.asarray(g.nodes[n]["pos"]) for n in path]


def build_nav_graph(
    hmsg,
    keyframe_poses: Sequence[np.ndarray] = (),
    cell_size: float = 0.05,
) -> nx.Graph:
    """Full multi-floor navigation graph (reference create_nav_graph,
    graph.py:2078-2127): per-floor Voronoi + sparsify, stairs chains between
    adjacent floors, all connected into one graph."""
    full = nx.Graph()
    floor_graphs = []
    for fi, floor in enumerate(hmsg.floors):
        raster = build_floor_raster(
            np.asarray(floor.pcd_points), floor.floor_zero_level, cell_size
        )
        g = voronoi_graph(raster, fi)
        g = sparsify_graph(g, resampling_dist=0.4)
        floor_graphs.append(g)
    for fi, g in enumerate(floor_graphs):
        full = connect_graphs(g, full) if full.number_of_nodes() else g.copy()
        if fi + 1 < len(floor_graphs) and keyframe_poses:
            lo = hmsg.floors[fi].floor_zero_level + 0.5
            hi = hmsg.floors[fi + 1].floor_zero_level + 1.5
            sg = stairs_graph(keyframe_poses, lo, hi, fi)
            if sg.number_of_nodes():
                full = connect_graphs(sg, full)
    return full
