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
    a: Session,
    b: Session,
    max_dist: float = 0.3,
    sc: Optional[ScanContext] = None,
    with_missed: bool = False,
):
    """(idx_a, idx_b, yaw) candidate pairs via ScanContext
    (reference detectInterSessionSCloops, Incremental_mapping.cpp:691-733).

    With ``with_missed=True`` also returns the B keyframe indices where SC
    found NO loop — the reference seeds its RS (radius-search) candidate list
    with exactly these (`RSLoopIdxPairs_` gets (-1, source_idx) pairs,
    Incremental_mapping.cpp:717-723)."""
    sc = sc or ScanContext(20, 60, 40.0)
    for scan in a.scans:
        sc.add_keyframe(sc.descriptor(scan))
    loops, missed = [], []
    for j, scan in enumerate(b.scans):
        idx, yaw, dist = sc.detect_loop(sc.descriptor(scan), exclude_recent=0, max_dist=max_dist)
        if idx >= 0:
            loops.append((idx, j, yaw))
        else:
            missed.append(j)
    if with_missed:
        return loops, missed
    return loops


def detect_inter_session_rs_loops(
    a: Session,
    b: Session,
    t_ab: np.ndarray,
    missed: List[int],
    radius: float = 10.0,
) -> List[Tuple[int, int]]:
    """RS (radius-search) inter-session candidates: for each SC-missed B
    keyframe, transform its pose into A's frame with the current alignment
    estimate and pick the nearest A keyframe within ``radius``
    (reference findNearestRSLoopsTargetNodeIdx, Incremental_mapping.cpp:
    862-924 — the 10 m ball at :888; nearest-node selection stands in for
    the reference's information-gain argmax, which needs the gtsam
    covariance machinery).  Returns (idx_a, idx_b) pairs."""
    if not len(a.poses):
        return []
    pos_a = np.stack([p[:3, 3] for p in a.poses])
    out = []
    for ib in missed:
        q = (t_ab @ b.poses[ib])[:3, 3]
        d = np.linalg.norm(pos_a - q[None], axis=1)
        ia = int(np.argmin(d))
        if d[ia] <= radius:
            out.append((ia, ib))
    return out


def _icp_to_neighborhood(a: Session, ia: int, scan_b: np.ndarray,
                         init: np.ndarray, icp_scales: Tuple[float, ...]):
    """Register a B scan (with initial world pose ``init``) against A's local
    neighborhood around keyframe ``ia`` (the reference's doICPVirtualRelative
    window of +-2 keyframes).  Returns (t_world_b, inlier_frac)."""
    local = np.concatenate(
        [
            a.scans[k] @ a.poses[k][:3, :3].T + a.poses[k][:3, 3]
            for k in range(max(0, ia - 2), min(len(a.scans), ia + 3))
        ]
    )
    res = solvers.icp_multiscale(
        jnp.asarray((scan_b @ init[:3, :3].T + init[:3, 3]).astype(np.float32)),
        jnp.ones(len(scan_b), bool),
        jnp.asarray(local.astype(np.float32)),
        jnp.ones(len(local), bool),
        jnp.eye(4),
        scales=icp_scales,
    )
    return np.asarray(res.pose, np.float64) @ init, float(res.inlier_frac)


def merge_sessions(
    a: Session,
    b: Session,
    loops: Optional[List[Tuple[int, int, float]]] = None,
    icp_scales: Tuple[float, ...] = (0.4, 0.15, 0.05),
    use_rs: bool = True,
    rs_radius: float = 10.0,
    stats: Optional[dict] = None,
) -> Tuple[Session, np.ndarray]:
    """Align session B onto session A.

    Returns (merged session with B's poses re-anchored, T_ab: the transform
    mapping B's world frame into A's).  Two-stage pipeline mirroring the
    reference's run() (Incremental_mapping.cpp:406-425): SC loops -> ICP
    refinement -> anchored pose-graph optimize, THEN RS radius-search loops
    seeded from the SC-missed keyframes using the optimized rough alignment
    (addRSloops, :928-1005) -> second optimize."""
    missed: List[int] = []
    if loops is None:
        loops, missed = detect_inter_session_loops(a, b, with_missed=True)
    else:
        hit = {ib for _, ib, _ in loops}
        missed = [j for j in range(len(b.scans)) if j not in hit]
    if not loops:
        raise ValueError("no inter-session loop closures found")

    # refine each loop: register B's scan against A's local neighborhood
    refined: List[Tuple[int, int, np.ndarray]] = []
    for ia, ib, yaw in loops[:5]:
        # initial guess: A keyframe pose composed with the SC yaw
        init = a.poses[ia] @ _yaw_pose(-yaw)
        t_world_b, inlier = _icp_to_neighborhood(a, ia, b.scans[ib], init,
                                                 icp_scales)
        if inlier > 0.2:
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

    def _optimize(loop_edges):
        init_poses = [p.copy() for p in a.poses] + [t_ab @ p for p in b.poses]
        edges, rels = [], []
        for s_ofs, sess in ((0, a), (na, b)):
            for i in range(len(sess.poses) - 1):
                edges.append((s_ofs + i, s_ofs + i + 1))
                rels.append(np.linalg.inv(sess.poses[i]) @ sess.poses[i + 1])
        for ia, ib, t_world_b in loop_edges:
            edges.append((ia, na + ib))
            rels.append(np.linalg.inv(a.poses[ia]) @ t_world_b)
        poses_opt, _ = solvers.pose_graph_gauss_newton(
            jnp.asarray(np.stack(init_poses), jnp.float32),
            jnp.asarray(np.array(edges, np.int32)),
            jnp.asarray(np.stack(rels), jnp.float32),
            jnp.ones(len(edges), bool),
            iters=15,
        )
        return np.asarray(poses_opt, np.float64)

    poses_opt = _optimize(refined)

    # second stage: RS radius-search loops seeded from the SC-missed B
    # keyframes, using the now-optimized rough alignment (reference
    # addRSloops, Incremental_mapping.cpp:928-1005) -> re-optimize
    if use_rs and missed:
        t_ab_r = poses_opt[na] @ np.linalg.inv(b.poses[0])
        rs_pairs = detect_inter_session_rs_loops(a, b, t_ab_r, missed,
                                                 radius=rs_radius)
        added = 0
        for ia, ib in rs_pairs[:5]:
            init = t_ab_r @ b.poses[ib]
            t_world_b, inlier = _icp_to_neighborhood(a, ia, b.scans[ib], init,
                                                     icp_scales)
            # gate: the implied alignment must agree with the SC consensus
            if inlier > 0.3 and agree(t_world_b @ np.linalg.inv(b.poses[ib]),
                                      t_ab_r):
                refined.append((ia, ib, t_world_b))
                added += 1
        if added:
            poses_opt = _optimize(refined)
        if stats is not None:
            stats["rs_loops"] = added
    if stats is not None:
        stats["sc_loops"] = len(loops)
        stats.setdefault("rs_loops", 0)

    merged = Session()
    for i in range(na):
        merged.add_keyframe(poses_opt[i], a.scans[i])
    for j in range(nb):
        merged.add_keyframe(poses_opt[na + j], b.scans[j])
    return merged, t_ab
