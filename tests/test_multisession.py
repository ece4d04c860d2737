import numpy as np
import pytest

from holoagent_tpu.dataloader import SyntheticDataset
from holoagent_tpu.memory.multisession import Session, detect_inter_session_loops, merge_sessions
from holoagent_tpu.ops.backproject import backproject
from holoagent_tpu.utils.camera import Pinhole
import jax.numpy as jnp


def _session_from_frames(ds, idxs, world_offset=np.eye(4)):
    """Build a session whose world frame is offset from the true world by
    `world_offset` (simulating per-session odometry drift)."""
    s = Session()
    inv = np.linalg.inv(world_offset)
    for i in idxs:
        f = ds[i]
        pts, _, valid = backproject(
            jnp.asarray(f.depth), jnp.asarray(f.rgb), Pinhole.from_matrix(f.k),
            jnp.asarray(f.pose), 1e-3, 20.0,
        )
        p = np.asarray(pts)[np.asarray(valid)][::7]
        # scan in sensor frame
        scan = (p - f.pose[:3, 3]) @ f.pose[:3, :3]
        s.add_keyframe(inv @ f.pose.astype(np.float64), scan.astype(np.float64))
    return s


@pytest.fixture(scope="module")
def sessions():
    ds = SyntheticDataset(num_frames=16, hw=(48, 64))
    # session A: first room loop; session B: overlapping frames, its world
    # frame offset by a small SE(2) drift
    drift = np.eye(4)
    th = 0.1
    drift[:2, :2] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
    drift[:2, 3] = [0.4, -0.3]
    a = _session_from_frames(ds, range(0, 8))
    b = _session_from_frames(ds, range(4, 12), world_offset=drift)
    return a, b, drift


def test_session_save_load(tmp_path, sessions):
    a, _, _ = sessions
    a.save(tmp_path / "sess")
    a2 = Session.load(tmp_path / "sess")
    assert len(a2.poses) == len(a.poses)
    np.testing.assert_allclose(a2.poses[3], a.poses[3])
    np.testing.assert_allclose(a2.scans[0], a.scans[0], atol=1e-9)


def test_detect_loops(sessions):
    a, b, _ = sessions
    loops = detect_inter_session_loops(a, b, max_dist=0.6)
    assert len(loops) >= 1
    # frames 4..7 are shared; most matches should pair overlapping indices
    ia, ib, _ = loops[0]
    assert 0 <= ia < 8 and 0 <= ib < 8


def test_merge_recovers_offset(sessions):
    a, b, drift = sessions
    merged, t_ab = merge_sessions(a, b)
    assert len(merged.poses) == len(a.poses) + len(b.poses)
    # t_ab should map B world -> A world = the drift transform
    err = t_ab @ np.linalg.inv(drift)
    ang_err = abs(np.arctan2(err[1, 0], err[0, 0]))
    trans_err = np.linalg.norm(err[:2, 3])
    assert ang_err < 0.08
    assert trans_err < 0.35
    # overlapping keyframes end up at consistent world positions
    pa = merged.poses[4][:3, 3]  # A's frame 4
    pb = merged.poses[len(a.poses)][:3, 3]  # B's frame 0 = same dataset frame 4
    assert np.linalg.norm(pa - pb) < 0.4
