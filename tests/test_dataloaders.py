"""Loaders tested against synthetic on-disk fixtures in each dataset's layout."""

import json

import numpy as np
import pytest
from PIL import Image

from holoagent_tpu.dataloader.formats import load_tum_poses, quat_to_matrix
from holoagent_tpu.dataloader.horizon import HorizonDataset
from holoagent_tpu.dataloader.hm3dsem import HM3DSemDataset
from holoagent_tpu.dataloader.replica import ReplicaDataset
from holoagent_tpu.dataloader.scannet import ScannetDataset


def _write_frame(img_path, depth_path, h=12, w=16, depth_mm=2000):
    Image.fromarray(np.full((h, w, 3), 128, np.uint8)).save(img_path)
    Image.fromarray(np.full((h, w), depth_mm, np.uint16)).save(depth_path)


def test_quat_matrix_matches_scipy(rng):
    from scipy.spatial.transform import Rotation

    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    m1 = quat_to_matrix(*q)
    m2 = Rotation.from_quat(q).as_matrix()
    np.testing.assert_allclose(m1, m2, atol=1e-12)


def test_horizon_layout(tmp_path):
    (tmp_path / "images").mkdir()
    (tmp_path / "depth").mkdir()
    (tmp_path / "d435i.yaml").write_text(
        "Camera1.fx: 380.0\nCamera1.fy: 380.0\nCamera1.cx: 320.0\nCamera1.cy: 240.0\n"
        "Camera.width: 640\nCamera.height: 480\n"
    )
    rows = []
    for i, ts in enumerate([1.5000, 2.5000]):
        _write_frame(tmp_path / "images" / f"{ts:.4f}.png", tmp_path / "depth" / f"{ts:.4f}.png")
        rows.append(f"{ts} {i} 0 0 0 0 0 1")
    (tmp_path / "poses.txt").write_text("\n".join(rows))
    ds = HorizonDataset(str(tmp_path), depth_cut=10.0)
    assert len(ds) == 2
    f = ds[0]
    assert f.rgb.shape == (12, 16, 3) and f.depth.shape == (12, 16)
    np.testing.assert_allclose(f.depth, 2.0)
    # poses.txt is w2c: translation +x inverts to -x
    np.testing.assert_allclose(ds[1].pose[:3, 3], [-1, 0, 0], atol=1e-6)
    assert f.k[0, 0] == 380.0


def test_horizon_depth_cut(tmp_path):
    (tmp_path / "images").mkdir()
    (tmp_path / "depth").mkdir()
    (tmp_path / "d435i.yaml").write_text(
        "Camera1.fx: 1.0\nCamera1.fy: 1.0\nCamera1.cx: 0.0\nCamera1.cy: 0.0\n"
        "Camera.width: 16\nCamera.height: 12\n"
    )
    _write_frame(tmp_path / "images" / "1.5000.png", tmp_path / "depth" / "1.5000.png",
                 depth_mm=9000)
    (tmp_path / "poses.txt").write_text("1.5 0 0 0 0 0 0 1")
    ds = HorizonDataset(str(tmp_path), depth_cut=5.0)
    np.testing.assert_allclose(ds[0].depth, 0.0)  # beyond cut -> invalid


def test_scannet_layout(tmp_path):
    for d in ("color", "depth", "pose", "intrinsic"):
        (tmp_path / d).mkdir()
    np.savetxt(tmp_path / "intrinsic" / "intrinsic_depth.txt", np.eye(4) * 500 + 1)
    for i in range(3):
        _write_frame(tmp_path / "color" / f"{i}.jpg", tmp_path / "depth" / f"{i}.png")
        np.savetxt(tmp_path / "pose" / f"{i}.txt", np.eye(4))
    ds = ScannetDataset(str(tmp_path))
    assert len(ds) == 3
    assert ds[1].pose.shape == (4, 4)


def test_hm3dsem_layout_yup_conversion(tmp_path):
    for d in ("rgb", "depth", "pose"):
        (tmp_path / d).mkdir()
    _write_frame(tmp_path / "rgb" / "0.png", tmp_path / "depth" / "0.png")
    pose = np.eye(4)
    pose[:3, 3] = [1.0, 2.0, 3.0]  # habitat y-up: y=2 is height
    np.savetxt(tmp_path / "pose" / "0.txt", pose)
    ds = HM3DSemDataset(str(tmp_path))
    f = ds[0]
    # y-up -> z-up: height lands on z
    np.testing.assert_allclose(f.pose[:3, 3], [1.0, -3.0, 2.0], atol=1e-9)
    assert f.k[0, 0] == 8.0  # 90-degree fov at width 16


def test_replica_layout(tmp_path):
    res = tmp_path / "results"
    res.mkdir()
    for i in range(2):
        _write_frame(res / f"frame{i:06d}.jpg", res / f"depth{i:06d}.png", depth_mm=6554)
    np.savetxt(tmp_path / "traj.txt", np.tile(np.eye(4).reshape(-1), (2, 1)))
    (tmp_path / "cam_params.json").write_text(
        json.dumps({"camera": {"fx": 600, "fy": 600, "cx": 8, "cy": 6, "scale": 6553.5}})
    )
    ds = ReplicaDataset(str(tmp_path))
    assert len(ds) == 2
    np.testing.assert_allclose(ds[0].depth, 6554 / 6553.5, rtol=1e-5)


def test_tum_loader_sorting(tmp_path):
    p = tmp_path / "t.txt"
    p.write_text("2.0 1 0 0 0 0 0 1\n1.0 0 0 0 0 0 0 1\n")
    poses, ts = load_tum_poses(p)
    assert ts == [1.0, 2.0]
    np.testing.assert_allclose(poses[1][:3, 3], [1, 0, 0])
