"""Multi-session incremental mapping: merge mapping sessions through
inter-session loop closures.

Functional rebuild of the reference's anchor-based multi-session pipeline
(reference nav_agent/.../include/multi-session/Incremental_mapping.hpp:12-237:
load per-session keyframes + ScanContext descriptors, detect inter-session SC
loops, refine with registration, optimize an anchored pose graph, update the
central map) from this framework's own parts: the native ScanContext for loop
candidates, multiscale voxel-snap ICP for refinement, and the batched
Gauss-Newton pose-graph solver on device.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..native import ScanContext
from ..ops import solvers
from ..utils.geometry import invert_pose
from ..utils.ply import read_ply, write_ply


@dataclass
class Session:
    """One mapping session: keyframe scans (sensor frame) + world poses."""

    poses: List[np.ndarray] = field(default_factory=list)  # (4,4) c2w
    scans: List[np.ndarray] = field(default_factory=list)  # (N,3) sensor frame

    def add_keyframe(self, pose: np.ndarray, scan: np.ndarray) -> None:
        self.poses.append(np.asarray(pose, np.float64))
        self.scans.append(np.asarray(scan, np.float64))

    def world_points(self, stride: int = 1) -> np.ndarray:
        out = []
        for pose, scan in zip(self.poses[::stride], self.scans[::stride]):
            out.append(scan @ pose[:3, :3].T + pose[:3, 3])
        return np.concatenate(out) if out else np.zeros((0, 3))

    # -- persistence (keyframe dir layout, reference Session::loadSessionGraph)

    def save(self, path: str | Path) -> None:
        path = Path(path)
        (path / "keyframes").mkdir(parents=True, exist_ok=True)
        rows = []
        for i, (pose, scan) in enumerate(zip(self.poses, self.scans)):
            write_ply(path / "keyframes" / f"{i:06d}.ply", scan)
            rows.append(pose.reshape(-1).tolist())
        (path / "poses.json").write_text(json.dumps(rows))

    @staticmethod
    def load(path: str | Path) -> "Session":
        path = Path(path)
        s = Session()
        rows = json.loads((path / "poses.json").read_text())
        for i, row in enumerate(rows):
            pts, _ = read_ply(path / "keyframes" / f"{i:06d}.ply")
            s.add_keyframe(np.asarray(row).reshape(4, 4), pts)
        return s


def _yaw_pose(yaw: float) -> np.ndarray:
    c, s = np.cos(yaw), np.sin(yaw)
    t = np.eye(4)
    t[:2, :2] = [[c, -s], [s, c]]
    return t


def detect_inter_session_loops(
    a: Session, b: Session, max_dist: float = 0.3, sc: Optional[ScanContext] = None
) -> List[Tuple[int, int, float]]:
    """(idx_a, idx_b, yaw) candidate pairs via ScanContext
    (reference detectInterSessionSCloops)."""
    sc = sc or ScanContext(20, 60, 40.0)
    for scan in a.scans:
        sc.add_keyframe(sc.descriptor(scan))
    loops = []
    for j, scan in enumerate(b.scans):
        idx, yaw, dist = sc.detect_loop(sc.descriptor(scan), exclude_recent=0, max_dist=max_dist)
        if idx >= 0:
            loops.append((idx, j, yaw))
    return loops


def merge_sessions(
    a: Session,
    b: Session,
    loops: Optional[List[Tuple[int, int, float]]] = None,
    icp_scales: Tuple[float, ...] = (0.4, 0.15, 0.05),
) -> Tuple[Session, np.ndarray]:
    """Align session B onto session A.

    Returns (merged session with B's poses re-anchored, T_ab: the transform
    mapping B's world frame into A's).  Pipeline: SC loops -> ICP refinement
    of each loop's relative pose -> anchored pose graph over all keyframes
    with intra-session odometry edges + inter-session loop edges."""
    if loops is None:
        loops = detect_inter_session_loops(a, b)
    if not loops:
        raise ValueError("no inter-session loop closures found")

    # refine each loop: register B's scan against A's local neighborhood
    refined: List[Tuple[int, int, np.ndarray]] = []
    for ia, ib, yaw in loops[:5]:
        local = np.concatenate(
            [
                a.scans[k] @ a.poses[k][:3, :3].T + a.poses[k][:3, 3]
                for k in range(max(0, ia - 2), min(len(a.scans), ia + 3))
            ]
        )
        # initial guess: A keyframe pose composed with the SC yaw
        init = a.poses[ia] @ _yaw_pose(-yaw)
        scan_b = b.scans[ib]
        res = solvers.icp_multiscale(
            jnp.asarray((scan_b @ init[:3, :3].T + init[:3, 3]).astype(np.float32)),
            jnp.ones(len(scan_b), bool),
            jnp.asarray(local.astype(np.float32)),
            jnp.ones(len(local), bool),
            jnp.eye(4),
            scales=icp_scales,
        )
        t_world_b = np.asarray(res.pose, np.float64) @ init  # B scan -> A world
        if float(res.inlier_frac) > 0.2:
            refined.append((ia, ib, t_world_b))
    if not refined:
        raise ValueError("no loop survived ICP refinement")

    # consensus gating: every true loop implies the SAME session alignment
    # T_ab; spurious place-recognition matches (look-alike rooms) imply
    # outlier alignments that would poison the non-robust pose graph.  Keep
    # the largest mutually-consistent cluster.
    cands = [t @ np.linalg.inv(b.poses[ib]) for ia, ib, t in refined]

    def agree(x, y):
        d = x @ np.linalg.inv(y)
        ang = abs(np.arctan2(d[1, 0], d[0, 0]))
        return np.linalg.norm(d[:3, 3]) < 0.3 and ang < 0.15

    votes = [[j for j in range(len(cands)) if agree(cands[i], cands[j])] for i in range(len(cands))]
    best_cluster = max(votes, key=len)
    refined = [refined[j] for j in best_cluster]

    # pose graph: nodes = A keyframes then B keyframes; anchor = A's first.
    na, nb = len(a.poses), len(b.poses)
    # initial estimate for B nodes: align via the first refined loop
    ia0, ib0, t0 = refined[0]
    t_ab = t0 @ np.linalg.inv(b.poses[ib0])  # B world -> A world
    init_poses = [p.copy() for p in a.poses] + [t_ab @ p for p in b.poses]
    edges, rels = [], []
    for s_ofs, sess in ((0, a), (na, b)):
        for i in range(len(sess.poses) - 1):
            edges.append((s_ofs + i, s_ofs + i + 1))
            rels.append(np.linalg.inv(sess.poses[i]) @ sess.poses[i + 1])
    for ia, ib, t_world_b in refined:
        edges.append((ia, na + ib))
        rels.append(np.linalg.inv(a.poses[ia]) @ t_world_b)
    poses_opt, _ = solvers.pose_graph_gauss_newton(
        jnp.asarray(np.stack(init_poses), jnp.float32),
        jnp.asarray(np.array(edges, np.int32)),
        jnp.asarray(np.stack(rels), jnp.float32),
        jnp.ones(len(edges), bool),
        iters=15,
    )
    poses_opt = np.asarray(poses_opt, np.float64)
    merged = Session()
    for i in range(na):
        merged.add_keyframe(poses_opt[i], a.scans[i])
    for j in range(nb):
        merged.add_keyframe(poses_opt[na + j], b.scans[j])
    return merged, t_ab
