"""Horizon robot dataset: FAST-LIVO2 keyframes recorded by the real robot.

Layout (reference fsr_vln/memory/hmsg/dataloader/horizon.py:21-268):
  <root>/<scene>/
    d435i.yaml                camera intrinsics (Camera1.fx/fy/cx/cy)
    poses.txt                 TUM rows, world-to-camera (inverted on load)
      (or CameraTrajectory.txt with wxyz quaternions, already cam-to-world)
    images/<ts>.png | color/<id>.png     RGB
    depth/<ts>.png                       depth in millimetres

The reference rotates poses into a y-up graph frame (horizon.py:238-242);
the FAST-LIVO world is already z-up, which is this framework's convention,
so poses pass through unchanged.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import yaml

from .formats import load_depth_m, load_image01, load_tum_poses
from .generic import RGBDFrame


class HorizonDataset:
    def __init__(self, root_dir: str, scene_id: str = "", depth_cut: float = 10.0):
        root = Path(root_dir)
        if scene_id and (root / scene_id).exists():
            root = root / scene_id
        self.root = root
        self.depth_cut = depth_cut
        self.scale = 1000.0
        self.k = self._load_intrinsics(root / "d435i.yaml")
        if (root / "poses.txt").exists():
            poses, ts = load_tum_poses(root / "poses.txt", "xyzw", invert=True)
        elif (root / "CameraTrajectory.txt").exists():
            poses, ts = load_tum_poses(root / "CameraTrajectory.txt", "wxyz")
        else:
            raise FileNotFoundError(f"no pose file under {root}")
        self.poses = poses.astype(np.float32)
        if ts and float(int(ts[0])) != ts[0]:
            names = [f"{t:.4f}.png" for t in ts]
            img_dir, dep_dir = root / "images", root / "depth"
        else:
            names = [f"{int(t):05d}.png" for t in ts]
            img_dir, dep_dir = root / "color", root / "depth"
        self.image_paths = [img_dir / n for n in names]
        self.depth_paths = [dep_dir / n for n in names]
        self.frameId2imgPath = [str(p) for p in self.image_paths]

    @staticmethod
    def _load_intrinsics(path: Path) -> np.ndarray:
        cfg = yaml.safe_load(path.read_text())
        k = np.eye(3, dtype=np.float32)
        pre = "Camera1" if "Camera1.fx" in cfg else "Camera"
        k[0, 0] = float(cfg[f"{pre}.fx"])
        k[1, 1] = float(cfg[f"{pre}.fy"])
        k[0, 2] = float(cfg[f"{pre}.cx"])
        k[1, 2] = float(cfg[f"{pre}.cy"])
        return k

    def __len__(self) -> int:
        return len(self.poses)

    def __getitem__(self, idx: int) -> RGBDFrame:
        return RGBDFrame(
            rgb=load_image01(self.image_paths[idx]),
            depth=load_depth_m(self.depth_paths[idx], self.scale, self.depth_cut),
            pose=self.poses[idx],
            k=self.k,
        )
