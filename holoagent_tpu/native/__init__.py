"""ctypes bindings for the native host runtime (native/ C++ library).

The robot-side components the reference implements in C++ (SURVEY.md §2.2)
stay native here too: ScanContext place recognition, the voxel plane map with
point-to-plane registration (the VoxelMapManager/FRICP roles), IMU propagation
and sweep undistortion (ImuProcess role), and the FIFO velocity bridge
(g1_move role).  The library auto-builds from native/ with `make` on first
import when the .so is missing.
"""

from __future__ import annotations

import ctypes as C
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "build" / "libholoagent_host.so"


def _load() -> C.CDLL:
    if not _LIB_PATH.exists():
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True, capture_output=True)
    lib = C.CDLL(str(_LIB_PATH))
    # ScanContext
    lib.sc_create.restype = C.c_void_p
    lib.sc_create.argtypes = [C.c_int, C.c_int, C.c_double]
    lib.sc_destroy.argtypes = [C.c_void_p]
    lib.sc_make_descriptor.argtypes = [C.c_void_p, C.c_void_p, C.c_size_t, C.c_void_p]
    lib.sc_add_keyframe.argtypes = [C.c_void_p, C.c_void_p]
    lib.sc_size.restype = C.c_size_t
    lib.sc_size.argtypes = [C.c_void_p]
    lib.sc_detect_loop.restype = C.c_int
    lib.sc_detect_loop.argtypes = [
        C.c_void_p, C.c_void_p, C.POINTER(C.c_double), C.POINTER(C.c_double),
        C.c_int, C.c_double,
    ]
    # VoxelPlaneMap
    lib.vpm_create.restype = C.c_void_p
    lib.vpm_create.argtypes = [C.c_double, C.c_int, C.c_double]
    lib.vpm_destroy.argtypes = [C.c_void_p]
    lib.vpm_insert.argtypes = [C.c_void_p, C.c_void_p, C.c_size_t]
    lib.vpm_size.restype = C.c_size_t
    lib.vpm_size.argtypes = [C.c_void_p]
    lib.vpm_num_planes.restype = C.c_size_t
    lib.vpm_num_planes.argtypes = [C.c_void_p]
    lib.vpm_residual.restype = C.c_int
    lib.vpm_residual.argtypes = [
        C.c_void_p, C.c_double, C.c_double, C.c_double,
        C.POINTER(C.c_double), C.c_void_p,
    ]
    lib.vpm_register.restype = C.c_double
    lib.vpm_register.argtypes = [
        C.c_void_p, C.c_void_p, C.c_size_t, C.c_void_p, C.c_int, C.c_double,
    ]
    # IMU
    lib.imu_init_static.argtypes = [C.c_void_p, C.c_void_p, C.c_size_t, C.c_void_p]
    lib.imu_propagate_c.argtypes = [
        C.c_void_p, C.c_void_p, C.c_void_p, C.c_void_p, C.c_size_t, C.c_void_p,
    ]
    lib.imu_undistort_c.argtypes = [
        C.c_void_p, C.c_void_p, C.c_void_p, C.c_void_p, C.c_size_t,
        C.c_void_p, C.c_void_p, C.c_size_t, C.c_double,
    ]
    # velocity bridge
    lib.velbridge_create.restype = C.c_int
    lib.velbridge_create.argtypes = [C.c_char_p]
    lib.velbridge_open_writer.restype = C.c_int
    lib.velbridge_open_writer.argtypes = [C.c_char_p]
    lib.velbridge_open_reader.restype = C.c_int
    lib.velbridge_open_reader.argtypes = [C.c_char_p]
    lib.velbridge_write.restype = C.c_int
    lib.velbridge_write.argtypes = [C.c_int, C.c_float, C.c_float, C.c_float]
    lib.velbridge_read_shaped.restype = C.c_int
    lib.velbridge_read_shaped.argtypes = [
        C.c_int, C.c_float, C.c_float, C.c_int, C.c_void_p,
    ]
    lib.velbridge_close.argtypes = [C.c_int]
    # registration (FRICP role)
    lib.reg_index_create.restype = C.c_void_p
    lib.reg_index_create.argtypes = [C.c_void_p, C.c_size_t, C.c_double]
    lib.reg_index_destroy.argtypes = [C.c_void_p]
    lib.reg_register.restype = C.c_double
    lib.reg_register.argtypes = [
        C.c_void_p, C.c_void_p, C.c_size_t, C.c_int, C.c_int, C.c_double,
        C.c_int, C.c_void_p, C.POINTER(C.c_double),
    ]
    lib.reg_register_refmode.restype = C.c_double
    lib.reg_register_refmode.argtypes = [
        C.c_void_p, C.c_void_p, C.c_size_t, C.c_int, C.c_int, C.c_double,
        C.c_void_p, C.POINTER(C.c_double),
    ]
    # preprocess
    lib.pp_sweep.restype = C.c_size_t
    lib.pp_sweep.argtypes = [
        C.c_void_p, C.c_void_p, C.c_void_p, C.c_size_t, C.c_double, C.c_double,
        C.c_int, C.c_int, C.c_double, C.c_double,
        C.c_void_p, C.c_void_p, C.c_void_p, C.c_void_p,
    ]
    # odometry constraints
    lib.wheel_update.restype = C.c_int
    lib.wheel_update.argtypes = [
        C.c_void_p, C.c_void_p, C.c_double, C.c_double, C.c_double,
    ]
    lib.zupt_update.restype = C.c_int
    lib.zupt_update.argtypes = [
        C.c_void_p, C.c_double, C.c_double, C.c_double, C.c_double,
    ]
    lib.ground_update.argtypes = [C.c_void_p, C.c_double, C.c_double]
    lib.ground_estimate.restype = C.c_int
    lib.ground_estimate.argtypes = [
        C.c_void_p, C.c_size_t, C.c_double, C.POINTER(C.c_double),
    ]
    # vio
    lib.vio_create.restype = C.c_void_p
    lib.vio_create.argtypes = [
        C.c_int, C.c_int, C.c_double, C.c_double, C.c_double, C.c_double,
        C.c_double, C.c_int, C.c_int,
    ]
    lib.vio_destroy.argtypes = [C.c_void_p]
    lib.vio_num_points.restype = C.c_size_t
    lib.vio_num_points.argtypes = [C.c_void_p]
    lib.vio_export_colmap.restype = C.c_int
    lib.vio_export_colmap.argtypes = [C.c_void_p, C.c_char_p]
    lib.vio_process.argtypes = [
        C.c_void_p, C.c_void_p, C.c_void_p, C.c_void_p, C.c_int, C.c_void_p,
    ]
    # lio pipeline
    lib.lio_create.restype = C.c_void_p
    lib.lio_create.argtypes = [
        C.c_double, C.c_int, C.c_double, C.c_double, C.c_double, C.c_double,
        C.c_int, C.c_double, C.c_int,
    ]
    lib.lio_destroy.argtypes = [C.c_void_p]
    lib.lio_init_static.argtypes = [C.c_void_p, C.c_void_p, C.c_void_p, C.c_size_t]
    lib.lio_process.argtypes = [
        C.c_void_p, C.c_void_p, C.c_void_p, C.c_size_t,
        C.c_void_p, C.c_void_p, C.c_void_p, C.c_size_t, C.c_double, C.c_void_p,
    ]
    lib.lio_enable_vio.argtypes = [
        C.c_void_p, C.c_int, C.c_int, C.c_double, C.c_double, C.c_double,
        C.c_double, C.c_void_p, C.c_void_p, C.c_double, C.c_int, C.c_int,
    ]
    lib.lio_process_image.argtypes = [
        C.c_void_p, C.c_void_p, C.c_void_p, C.c_size_t,
        C.c_void_p, C.c_void_p, C.c_void_p, C.c_size_t, C.c_double,
        C.c_void_p, C.c_void_p, C.c_void_p, C.c_void_p,
    ]
    lib.lio_num_keyframes.restype = C.c_size_t
    lib.lio_num_keyframes.argtypes = [C.c_void_p]
    lib.lio_keyframe_pose.argtypes = [C.c_void_p, C.c_int, C.c_void_p]
    # pose graph
    lib.pg_create.restype = C.c_void_p
    lib.pg_destroy.argtypes = [C.c_void_p]
    lib.pg_add_node.restype = C.c_int
    lib.pg_add_node.argtypes = [C.c_void_p, C.c_void_p]
    lib.pg_add_prior.argtypes = [
        C.c_void_p, C.c_int, C.c_void_p, C.c_double, C.c_double,
    ]
    lib.pg_add_between.argtypes = [
        C.c_void_p, C.c_int, C.c_int, C.c_void_p, C.c_double, C.c_double, C.c_int,
    ]
    lib.pg_optimize.restype = C.c_double
    lib.pg_optimize.argtypes = [C.c_void_p, C.c_int]
    lib.pg_get_pose.argtypes = [C.c_void_p, C.c_int, C.c_void_p]
    lib.pg_num_nodes.restype = C.c_size_t
    lib.pg_num_nodes.argtypes = [C.c_void_p]
    lib.lio_filter_state.argtypes = [C.c_void_p, C.c_void_p, C.c_void_p]
    # esikf
    lib.esikf_create.restype = C.c_void_p
    lib.esikf_create.argtypes = [
        C.c_double, C.c_double, C.c_double, C.c_double, C.c_double, C.c_double,
        C.c_double, C.c_int,
    ]
    lib.esikf_destroy.argtypes = [C.c_void_p]
    lib.esikf_reset.argtypes = [C.c_void_p, C.c_void_p]
    lib.esikf_propagate.argtypes = [C.c_void_p, C.c_void_p, C.c_void_p, C.c_double]
    lib.esikf_update_lidar.argtypes = [
        C.c_void_p, C.c_void_p, C.c_void_p, C.c_size_t, C.c_void_p,
    ]
    lib.esikf_update_pose.restype = C.c_int
    lib.esikf_update_pose.argtypes = [
        C.c_void_p, C.c_void_p, C.c_void_p, C.c_double, C.c_double,
    ]
    lib.esikf_get_state.argtypes = [C.c_void_p, C.c_void_p, C.c_void_p]
    # measurement sync
    lib.msync_create.restype = C.c_void_p
    lib.msync_create.argtypes = [C.c_size_t]
    lib.msync_destroy.argtypes = [C.c_void_p]
    lib.msync_push_imu.argtypes = [C.c_void_p, C.c_double, C.c_void_p, C.c_void_p]
    lib.msync_push_sweep.argtypes = [
        C.c_void_p, C.c_double, C.c_double, C.c_void_p, C.c_void_p, C.c_size_t,
    ]
    lib.msync_push_image.argtypes = [C.c_void_p, C.c_double, C.c_int64]
    lib.msync_pop.restype = C.c_size_t
    lib.msync_pop.argtypes = [
        C.c_void_p, C.c_void_p, C.c_void_p, C.c_void_p, C.c_void_p,
    ]
    lib.msync_bundle_points.argtypes = [C.c_void_p, C.c_void_p, C.c_void_p]
    lib.msync_bundle_imu.argtypes = [C.c_void_p, C.c_void_p, C.c_void_p, C.c_void_p]
    lib.msync_bundle_images.argtypes = [C.c_void_p, C.c_void_p, C.c_void_p]
    lib.msync_dropped.restype = C.c_size_t
    lib.msync_dropped.argtypes = [C.c_void_p]
    # lidar decoding
    lib.decode_livox_packet.restype = C.c_size_t
    lib.decode_livox_packet.argtypes = [
        C.c_void_p, C.c_size_t, C.c_double, C.c_double, C.c_int, C.c_int,
        C.c_void_p, C.c_void_p, C.c_void_p, C.c_void_p,
    ]
    lib.decode_spinning_sweep.restype = C.c_size_t
    lib.decode_spinning_sweep.argtypes = [
        C.c_void_p, C.c_void_p, C.c_void_p, C.c_void_p, C.c_size_t,
        C.c_double, C.c_double, C.c_int, C.c_int, C.c_double,
        C.c_void_p, C.c_void_p, C.c_void_p, C.c_void_p,
    ]
    lib.classify_line_features.argtypes = [
        C.c_void_p, C.c_void_p, C.c_void_p, C.c_size_t, C.c_int, C.c_int,
        C.c_double, C.c_double, C.c_void_p,
    ]
    return lib


_lib: Optional[C.CDLL] = None


def lib() -> C.CDLL:
    global _lib
    if _lib is None:
        _lib = _load()
    return _lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(C.c_void_p)


class ScanContext:
    """Rotation-invariant LiDAR place recognition (native)."""

    def __init__(self, num_ring: int = 20, num_sector: int = 60, max_radius: float = 80.0):
        self._l = lib()
        self._h = self._l.sc_create(num_ring, num_sector, max_radius)
        self.shape = (num_ring, num_sector)

    def __del__(self):
        if getattr(self, "_h", None):
            self._l.sc_destroy(self._h)

    def descriptor(self, points: np.ndarray) -> np.ndarray:
        pts = np.ascontiguousarray(points, np.float64)
        out = np.zeros(self.shape, np.float64)
        self._l.sc_make_descriptor(self._h, _ptr(pts), len(pts), _ptr(out))
        return out

    def add_keyframe(self, desc: np.ndarray) -> None:
        self._l.sc_add_keyframe(self._h, _ptr(np.ascontiguousarray(desc, np.float64)))

    def __len__(self) -> int:
        return int(self._l.sc_size(self._h))

    def detect_loop(
        self, desc: np.ndarray, exclude_recent: int = 30, max_dist: float = 0.35
    ) -> Tuple[int, float, float]:
        """(matched keyframe id or -1, yaw offset rad, descriptor distance)."""
        yaw = C.c_double()
        dist = C.c_double()
        idx = self._l.sc_detect_loop(
            self._h, _ptr(np.ascontiguousarray(desc, np.float64)),
            C.byref(yaw), C.byref(dist), exclude_recent, max_dist,
        )
        return idx, yaw.value, dist.value


class VoxelPlaneMap:
    """Voxel plane map + point-to-plane registration (native)."""

    def __init__(self, voxel_size: float = 0.5, min_points: int = 6, planarity: float = 0.1):
        self._l = lib()
        self._h = self._l.vpm_create(voxel_size, min_points, planarity)

    def __del__(self):
        if getattr(self, "_h", None):
            self._l.vpm_destroy(self._h)

    def insert(self, points: np.ndarray) -> None:
        pts = np.ascontiguousarray(points, np.float64)
        self._l.vpm_insert(self._h, _ptr(pts), len(pts))

    def __len__(self) -> int:
        return int(self._l.vpm_size(self._h))

    @property
    def num_planes(self) -> int:
        return int(self._l.vpm_num_planes(self._h))

    def residual(self, p) -> Optional[Tuple[float, np.ndarray]]:
        r = C.c_double()
        n = np.zeros(3, np.float64)
        ok = self._l.vpm_residual(self._h, p[0], p[1], p[2], C.byref(r), _ptr(n))
        return (r.value, n) if ok else None

    def register(
        self, points: np.ndarray, pose_init: np.ndarray, iters: int = 12,
        max_residual: float = 1.0,
    ) -> Tuple[np.ndarray, float]:
        pts = np.ascontiguousarray(points, np.float64)
        pose = np.ascontiguousarray(pose_init, np.float64).reshape(16).copy()
        rms = self._l.vpm_register(self._h, _ptr(pts), len(pts), _ptr(pose), iters, max_residual)
        return pose.reshape(4, 4), float(rms)


class ImuPropagator:
    """IMU propagation / sweep undistortion (native).

    State layout: pos(3) vel(3) quat wxyz(4) bg(3) ba(3) gravity_z(1)."""

    def __init__(self):
        self._l = lib()
        self.state = np.zeros(17, np.float64)
        self.state[6] = 1.0
        self.state[16] = -9.81

    def init_static(self, gyro: np.ndarray, accel: np.ndarray) -> None:
        g = np.ascontiguousarray(gyro, np.float64)
        a = np.ascontiguousarray(accel, np.float64)
        self._l.imu_init_static(_ptr(g), _ptr(a), len(g), _ptr(self.state))

    def propagate(self, gyro, accel, dts, return_poses: bool = False):
        g = np.ascontiguousarray(gyro, np.float64)
        a = np.ascontiguousarray(accel, np.float64)
        d = np.ascontiguousarray(dts, np.float64)
        poses = np.zeros((len(g), 7), np.float64) if return_poses else None
        self._l.imu_propagate_c(
            _ptr(self.state), _ptr(g), _ptr(a), _ptr(d), len(g),
            _ptr(poses) if return_poses else None,
        )
        return poses

    def undistort(self, points, t_points, gyro, accel, dts, sweep_dt) -> np.ndarray:
        pts = np.ascontiguousarray(points, np.float64).copy()
        tp = np.ascontiguousarray(t_points, np.float64)
        g = np.ascontiguousarray(gyro, np.float64)
        a = np.ascontiguousarray(accel, np.float64)
        d = np.ascontiguousarray(dts, np.float64)
        self._l.imu_undistort_c(
            _ptr(self.state), _ptr(g), _ptr(a), _ptr(d), len(g),
            _ptr(pts), _ptr(tp), len(pts), sweep_dt,
        )
        return pts


class Registration:
    """Fast & Robust ICP family on a voxel-hash NN index (native).

    The FRICP-toolkit role (reference nav_agent/.../include/FRICP-toolkit/
    FRICP.h, ICP.h, AndersonAcceleration.h and the regMode selector in
    online-relo/pose_estimator.cpp:28-39): modes 0 point-to-point,
    1 point-to-plane, 2 robust (Welsch) point-to-point, 3 robust
    point-to-plane, 4 sparse (Lp IRLS) point-to-point, 5 sparse
    point-to-plane; optional Anderson acceleration (AA-ICP).
    register_refmode takes the reference 0-8 Method indices directly
    (ICP, AA_ICP, FICP, RICP, FR_ICP, PPL, RPPL, SparseICP, SICPPPL)."""

    P2P, P2PLANE, ROBUST_P2P, ROBUST_P2PLANE, SPARSE_P2P, SPARSE_P2PLANE = (
        0, 1, 2, 3, 4, 5)

    def __init__(self, target: np.ndarray, cell: float = 0.5):
        self._l = lib()
        tgt = np.ascontiguousarray(target, np.float64)
        self._tgt = tgt  # keep alive
        self._h = self._l.reg_index_create(_ptr(tgt), len(tgt), cell)

    def __del__(self):
        if getattr(self, "_h", None):
            self._l.reg_index_destroy(self._h)

    def register(
        self,
        source: np.ndarray,
        pose_init: Optional[np.ndarray] = None,
        mode: int = ROBUST_P2P,
        max_iters: int = 30,
        max_corr: float = 1.0,
        anderson: bool = True,
    ) -> Tuple[np.ndarray, float, float]:
        """Returns (pose 4x4 mapping source->target, inlier RMSE, inlier frac)."""
        src = np.ascontiguousarray(source, np.float64)
        pose = (
            np.eye(4) if pose_init is None else np.asarray(pose_init, np.float64)
        ).reshape(16).copy()
        frac = C.c_double()
        rmse = self._l.reg_register(
            self._h, _ptr(src), len(src), mode, max_iters, max_corr,
            int(anderson), _ptr(pose), C.byref(frac),
        )
        return pose.reshape(4, 4), float(rmse), float(frac.value)

    def register_refmode(
        self,
        source: np.ndarray,
        ref_mode: int = 4,
        pose_init: Optional[np.ndarray] = None,
        max_iters: int = 30,
        max_corr: float = 1.0,
    ) -> Tuple[np.ndarray, float, float]:
        """Register with the reference regMode 0-8 selector (reference
        config/mid360_online_reloc.yaml:12 defaults to 4 = FR_ICP)."""
        src = np.ascontiguousarray(source, np.float64)
        pose = (
            np.eye(4) if pose_init is None else np.asarray(pose_init, np.float64)
        ).reshape(16).copy()
        frac = C.c_double()
        rmse = self._l.reg_register_refmode(
            self._h, _ptr(src), len(src), ref_mode, max_iters, max_corr,
            _ptr(pose), C.byref(frac),
        )
        return pose.reshape(4, 4), float(rmse), float(frac.value)


def preprocess_sweep(
    xyz: np.ndarray,
    intensity: Optional[np.ndarray] = None,
    t_offset: Optional[np.ndarray] = None,
    blind_radius: float = 0.5,
    max_radius: float = 100.0,
    point_stride: int = 1,
    feature_window: int = 4,
    edge_thresh: float = 0.12,
    surf_thresh: float = 0.02,
):
    """LiDAR sweep preprocessing (native): validity/range gate, stride,
    time ordering, LOAM-style surface/edge tags (reference
    lio_mapping_loc/src/preprocess.cpp role).

    Returns (xyz, intensity, t, tag) arrays of the kept points; tag is
    0 untagged / 1 surface / 2 edge."""
    l = lib()
    pts = np.ascontiguousarray(xyz, np.float32)
    n = len(pts)
    inten = (
        np.ascontiguousarray(intensity, np.float32) if intensity is not None else None
    )
    toff = np.ascontiguousarray(t_offset, np.float32) if t_offset is not None else None
    out_xyz = np.zeros((n, 3), np.float32)
    out_i = np.zeros(n, np.float32)
    out_t = np.zeros(n, np.float32)
    out_tag = np.zeros(n, np.uint8)
    m = l.pp_sweep(
        _ptr(pts), _ptr(inten) if inten is not None else None,
        _ptr(toff) if toff is not None else None, n,
        blind_radius, max_radius, point_stride, feature_window,
        edge_thresh, surf_thresh,
        _ptr(out_xyz), _ptr(out_i), _ptr(out_t), _ptr(out_tag),
    )
    m = int(m)
    return out_xyz[:m], out_i[:m], out_t[:m], out_tag[:m]


class Vio:
    """Sparse-patch photometric visual odometry (native).

    The VIOManager role (reference nav_agent/.../lio_mapping_loc/src/vio.cpp,
    include/vio.h:82-210): voxel-hashed visual point map with grayscale
    reference patches, per-cell retrieval, joint Gauss-Newton over se(3) pose
    + affine brightness (exposure estimation role), gradient-based new-point
    spawning with per-voxel LRU eviction."""

    def __init__(
        self, width: int, height: int, fx: float, fy: float, cx: float, cy: float,
        map_cell: float = 0.5, max_per_cell: int = 8, grid_px: int = 32,
    ):
        self._l = lib()
        self._h = self._l.vio_create(
            width, height, fx, fy, cx, cy, map_cell, max_per_cell, grid_px
        )
        self.shape = (height, width)

    def __del__(self):
        if getattr(self, "_h", None):
            self._l.vio_destroy(self._h)

    def __len__(self) -> int:
        return int(self._l.vio_num_points(self._h))

    def process(
        self,
        image: np.ndarray,                 # (H, W) float gray [0,1]
        pose_guess: np.ndarray,            # (4, 4) camera-to-world
        depth: Optional[np.ndarray] = None,  # (H, W) meters; enables spawning
        max_iters: int = 12,
    ):
        """Returns (pose 4x4, stats dict)."""
        img = np.ascontiguousarray(image, np.float32)
        assert img.shape == self.shape, (img.shape, self.shape)
        d = None
        if depth is not None:
            d = np.ascontiguousarray(depth, np.float32)
            assert d.shape == self.shape, (d.shape, self.shape)
        pose = np.ascontiguousarray(pose_guess, np.float64).reshape(16).copy()
        stats = np.zeros(8, np.float64)
        self._l.vio_process(
            self._h, _ptr(img), _ptr(d) if d is not None else None,
            _ptr(pose), max_iters, _ptr(stats),
        )
        return pose.reshape(4, 4), {
            "rmse": stats[0], "affine_a": stats[1], "affine_b": stats[2],
            "n_tracked": int(stats[3]), "n_spawned": int(stats[4]),
            "iters": int(stats[5]), "exposure": stats[6],
            "n_warped": int(stats[7]),
        }

    def export_colmap(self, out_dir) -> int:
        """Write the frame history + visual map as a COLMAP text model
        (cameras.txt / images.txt / points3D.txt / poses.txt — the
        reference's colmap_output_en dump, vio.cpp:127-135).  Returns the
        number of frames written."""
        import os

        os.makedirs(out_dir, exist_ok=True)
        n = self._l.vio_export_colmap(self._h, str(out_dir).encode())
        if n < 0:
            raise IOError(f"colmap export to {out_dir} failed")
        return n


class LioPipeline:
    """LiDAR-inertial odometry pipeline driver (native).

    The LIVMapper orchestration role (reference lio_mapping_loc/src/
    LIVMapper.cpp:1889-1909 run loop; keyframe/loop factors :837-895):
    preprocess -> IMU undistort+propagate -> point-to-plane registration
    against the voxel plane map -> map insert -> distance-gated keyframes
    with ScanContext loop detection -> pose-graph optimization on loops."""

    def __init__(
        self, map_voxel: float = 0.5, map_min_points: int = 6,
        planarity: float = 0.1, keyframe_dist: float = 1.0,
        blind_radius: float = 0.3, max_radius: float = 100.0,
        point_stride: int = 1, sc_max_dist: float = 0.25,
        sc_exclude_recent: int = 10,
    ):
        self._l = lib()
        self._h = self._l.lio_create(
            map_voxel, map_min_points, planarity, keyframe_dist,
            blind_radius, max_radius, point_stride, sc_max_dist,
            sc_exclude_recent,
        )

    def __del__(self):
        if getattr(self, "_h", None):
            self._l.lio_destroy(self._h)

    def init_static(self, gyro: np.ndarray, accel: np.ndarray) -> None:
        g = np.ascontiguousarray(gyro, np.float64)
        a = np.ascontiguousarray(accel, np.float64)
        self._l.lio_init_static(self._h, _ptr(g), _ptr(a), len(g))

    def process_sweep(
        self,
        xyz: np.ndarray,                      # (N, 3) sensor-frame points
        t_offset: Optional[np.ndarray] = None,  # (N,) seconds within sweep
        gyro: Optional[np.ndarray] = None,    # (K, 3)
        accel: Optional[np.ndarray] = None,   # (K, 3)
        dts: Optional[np.ndarray] = None,     # (K,)
        sweep_dt: float = 0.1,
    ):
        """Returns (pose 4x4 body-to-world, stats dict)."""
        pts = np.ascontiguousarray(xyz, np.float32)
        toff = (
            np.ascontiguousarray(t_offset, np.float32)
            if t_offset is not None else np.zeros(len(pts), np.float32)
        )
        have = (gyro is not None, accel is not None, dts is not None)
        if any(have) and not all(have):
            raise ValueError("gyro, accel, and dts must be provided together")
        n_imu = 0 if gyro is None else len(gyro)
        g = np.ascontiguousarray(gyro, np.float64) if gyro is not None else None
        a = np.ascontiguousarray(accel, np.float64) if accel is not None else None
        d = np.ascontiguousarray(dts, np.float64) if dts is not None else None
        if n_imu and (len(a) != n_imu or len(d) != n_imu):
            raise ValueError("gyro/accel/dts length mismatch")
        out = np.zeros(24, np.float64)
        self._l.lio_process(
            self._h, _ptr(pts), _ptr(toff), len(pts),
            _ptr(g) if g is not None else None,
            _ptr(a) if a is not None else None,
            _ptr(d) if d is not None else None,
            n_imu, sweep_dt, _ptr(out),
        )
        return out[:16].reshape(4, 4), {
            "reg_rms": out[16], "keyframe": bool(out[17]),
            "loop_with": int(out[18]), "map_voxels": int(out[19]),
            "points_used": int(out[20]),
        }

    def enable_vio(
        self, width: int, height: int, fx: float, fy: float, cx: float,
        cy: float, r_cb: Optional[np.ndarray] = None,
        t_cb: Optional[np.ndarray] = None, map_cell: float = 0.5,
        max_per_cell: int = 8, grid_px: int = 32,
    ) -> None:
        """Attach a camera: process_sweep_with_image runs the VIO photometric
        branch after each LIO update and fuses the refined pose back into the
        ESIKF (reference handleVIO dispatch, LIVMapper.cpp:640-658)."""
        r = np.ascontiguousarray(
            r_cb if r_cb is not None else np.eye(3), np.float64
        )
        t = np.ascontiguousarray(
            t_cb if t_cb is not None else np.zeros(3), np.float64
        )
        self._img_shape = (height, width)
        self._l.lio_enable_vio(
            self._h, width, height, fx, fy, cx, cy, _ptr(r), _ptr(t),
            map_cell, max_per_cell, grid_px,
        )

    def process_sweep_with_image(
        self, xyz, image, t_offset=None, gyro=None, accel=None, dts=None,
        sweep_dt: float = 0.1, depth: Optional[np.ndarray] = None,
    ):
        """LIVO step: process_sweep + VIO refinement on `image` (H, W) float
        gray [0,1].  Returns (pose 4x4, stats dict incl. vio_* fields)."""
        pts = np.ascontiguousarray(xyz, np.float32)
        toff = (
            np.ascontiguousarray(t_offset, np.float32)
            if t_offset is not None else np.zeros(len(pts), np.float32)
        )
        img = np.ascontiguousarray(image, np.float32)
        assert img.shape == self._img_shape, (img.shape, self._img_shape)
        d = np.ascontiguousarray(depth, np.float32) if depth is not None else None
        n_imu = 0 if gyro is None else len(gyro)
        g = np.ascontiguousarray(gyro, np.float64) if gyro is not None else None
        a = np.ascontiguousarray(accel, np.float64) if accel is not None else None
        dt = np.ascontiguousarray(dts, np.float64) if dts is not None else None
        out = np.zeros(24, np.float64)
        vst = np.zeros(8, np.float64)
        self._l.lio_process_image(
            self._h, _ptr(pts), _ptr(toff), len(pts),
            _ptr(g) if g is not None else None,
            _ptr(a) if a is not None else None,
            _ptr(dt) if dt is not None else None,
            n_imu, sweep_dt, _ptr(img),
            _ptr(d) if d is not None else None, _ptr(out), _ptr(vst),
        )
        return out[:16].reshape(4, 4), {
            "reg_rms": out[16], "keyframe": bool(out[17]),
            "loop_with": int(out[18]), "map_voxels": int(out[19]),
            "points_used": int(out[20]),
            "vio_rmse": vst[0], "vio_a": vst[1], "vio_b": vst[2],
            "vio_tracked": int(vst[3]), "vio_spawned": int(vst[4]),
            "vio_exposure": vst[6], "vio_warped": int(vst[7]),
        }

    @property
    def num_keyframes(self) -> int:
        return int(self._l.lio_num_keyframes(self._h))

    def keyframe_pose(self, i: int) -> np.ndarray:
        if not 0 <= i < self.num_keyframes:
            raise IndexError(f"keyframe {i} of {self.num_keyframes}")
        out = np.zeros(16, np.float64)
        self._l.lio_keyframe_pose(self._h, i, _ptr(out))
        return out.reshape(4, 4)


class PoseGraph:
    """Batch SE(3) pose-graph optimizer (native).

    The gtsam role in the reference (LIVMapper.cpp:837-895 prior/odom/loop
    factors; multi-session anchor merging Incremental_mapping.hpp:65-237):
    prior + between factors with diagonal information, optional Huber
    robustness on loop factors, Gauss-Newton with dense Cholesky."""

    def __init__(self):
        self._l = lib()
        self._h = self._l.pg_create()

    def __del__(self):
        if getattr(self, "_h", None):
            self._l.pg_destroy(self._h)

    def add_node(self, pose: np.ndarray) -> int:
        p = np.ascontiguousarray(pose, np.float64).reshape(16)
        return int(self._l.pg_add_node(self._h, _ptr(p)))

    def add_prior(self, i: int, pose: np.ndarray, rot_w: float = 1e4, trans_w: float = 1e4):
        p = np.ascontiguousarray(pose, np.float64).reshape(16)
        self._l.pg_add_prior(self._h, i, _ptr(p), rot_w, trans_w)

    def add_between(
        self, i: int, j: int, rel: np.ndarray, rot_w: float = 100.0,
        trans_w: float = 100.0, robust: bool = False,
    ):
        p = np.ascontiguousarray(rel, np.float64).reshape(16)
        self._l.pg_add_between(self._h, i, j, _ptr(p), rot_w, trans_w, int(robust))

    def optimize(self, max_iters: int = 20) -> float:
        return float(self._l.pg_optimize(self._h, max_iters))

    def pose(self, i: int) -> np.ndarray:
        out = np.zeros(16, np.float64)
        self._l.pg_get_pose(self._h, i, _ptr(out))
        return out.reshape(4, 4)

    def __len__(self) -> int:
        return int(self._l.pg_num_nodes(self._h))


class VelocityBridge:
    """FIFO velocity bridge (controller side writes, actuator side reads)."""

    def __init__(self, path: str = "/tmp/vel_fifo"):
        self._l = lib()
        self.path = path.encode()
        if self._l.velbridge_create(self.path) != 0:
            raise OSError(f"cannot create fifo {path}")
        self._rfd = self._l.velbridge_open_reader(self.path)
        self._wfd = self._l.velbridge_open_writer(self.path)

    def write(self, x: float, y: float, r: float) -> bool:
        return self._l.velbridge_write(self._wfd, x, y, r) == 0

    def read_shaped(
        self, vmax: float = 0.6, vmin: float = 0.05, boost_small: bool = False
    ) -> Optional[np.ndarray]:
        out = np.zeros(3, np.float32)
        got = self._l.velbridge_read_shaped(
            self._rfd, vmax, vmin, int(boost_small), _ptr(out)
        )
        return out if got == 1 else None

    def close(self):
        self._l.velbridge_close(self._rfd)
        self._l.velbridge_close(self._wfd)


class Esikf:
    """Error-state iterated Kalman filter over the plane-covariance voxel map
    (native).  The reference's VoxelMapManager::StateEstimation + ImuProcess
    core (reference nav_agent/.../include/voxel_map.h:234-246,
    include/IMU_Processing.h:27-71, common_lib.h:180-260 StatesGroup):
    18-dim error state {dtheta, dp, dv, dbg, dba, dg} with full covariance,
    IMU propagation, and an iterated MAP point-to-plane update with per-point
    (range/bearing) and per-plane parameter covariances."""

    def __init__(
        self, gyr_noise: float = 0.01, acc_noise: float = 0.5,
        gyr_bias_rw: float = 1e-5, acc_bias_rw: float = 1e-4,
        range_noise: float = 0.02, bearing_noise: float = 0.0008,
        sigma_gate: float = 3.0, max_iterations: int = 4,
    ):
        # defaults mirror the C++ EsikfParams (esikf.h): deliberately loose
        # accel noise keeps the velocity covariance from collapsing
        self._l = lib()
        self._h = self._l.esikf_create(
            gyr_noise, acc_noise, gyr_bias_rw, acc_bias_rw,
            range_noise, bearing_noise, sigma_gate, max_iterations,
        )

    def __del__(self):
        if getattr(self, "_h", None):
            self._l.esikf_destroy(self._h)

    def reset(
        self, pos=(0, 0, 0), vel=(0, 0, 0), quat_wxyz=(1, 0, 0, 0),
        bg=(0, 0, 0), ba=(0, 0, 0), gravity=(0, 0, -9.81),
    ) -> None:
        s = np.concatenate([
            np.asarray(pos, np.float64), np.asarray(vel, np.float64),
            np.asarray(quat_wxyz, np.float64), np.asarray(bg, np.float64),
            np.asarray(ba, np.float64), np.asarray(gravity, np.float64),
        ])
        self._l.esikf_reset(self._h, _ptr(s))

    def propagate(self, gyro, accel, dt: float) -> None:
        g = np.ascontiguousarray(gyro, np.float64)
        a = np.ascontiguousarray(accel, np.float64)
        self._l.esikf_propagate(self._h, _ptr(g), _ptr(a), dt)

    def update_lidar(self, plane_map: "VoxelPlaneMap", pts_body: np.ndarray):
        """Iterated update; pts_body (N, 3) in the body frame at sweep end.
        Returns dict(used, iterations, rms, ok)."""
        p = np.ascontiguousarray(pts_body, np.float64)
        out = np.zeros(4, np.float64)
        self._l.esikf_update_lidar(self._h, plane_map._h, _ptr(p), len(p), _ptr(out))
        return {
            "used": int(out[0]), "iterations": int(out[1]),
            "rms": float(out[2]), "ok": bool(out[3]),
        }

    def update_pose(self, rot: np.ndarray, pos, att_var: float = 1e-3,
                    pos_var: float = 1e-3) -> bool:
        """6-DoF pose measurement update (the VIO fusion hook; reference
        handleVIO EKF update role)."""
        r = np.ascontiguousarray(rot, np.float64).reshape(9)
        t = np.ascontiguousarray(pos, np.float64)
        return bool(self._l.esikf_update_pose(self._h, _ptr(r), _ptr(t),
                                              att_var, pos_var))

    @property
    def state(self):
        """dict with pos, vel, quat_wxyz, bg, ba, gravity, cov (18x18)."""
        s = np.zeros(19, np.float64)
        cov = np.zeros((18, 18), np.float64)
        self._l.esikf_get_state(self._h, _ptr(s), _ptr(cov))
        return {
            "pos": s[0:3], "vel": s[3:6], "quat_wxyz": s[6:10],
            "bg": s[10:13], "ba": s[13:16], "gravity": s[16:19], "cov": cov,
        }


class MeasurementSync:
    """Interleaved LiDAR/IMU/image packet alignment (native) — the
    sync_packages role (reference nav_agent/.../src/LIVMapper.cpp:1889-1909):
    a sweep is released only once IMU coverage extends past its end, with the
    spanning IMU samples and in-window camera frames attached."""

    def __init__(self, max_queue: int = 2000):
        self._l = lib()
        self._h = self._l.msync_create(max_queue)

    def __del__(self):
        if getattr(self, "_h", None):
            self._l.msync_destroy(self._h)

    def push_imu(self, t: float, gyro, accel) -> None:
        g = np.ascontiguousarray(gyro, np.float64)
        a = np.ascontiguousarray(accel, np.float64)
        self._l.msync_push_imu(self._h, t, _ptr(g), _ptr(a))

    def push_sweep(self, t_begin: float, duration: float, xyz, t_offset=None):
        p = np.ascontiguousarray(xyz, np.float32)
        to = (
            np.ascontiguousarray(t_offset, np.float32)
            if t_offset is not None else None
        )
        self._l.msync_push_sweep(
            self._h, t_begin, duration, _ptr(p),
            _ptr(to) if to is not None else None, len(p),
        )

    def push_image(self, t: float, image_id: int) -> None:
        self._l.msync_push_image(self._h, t, image_id)

    def pop(self):
        """Next complete bundle or None: dict(t_begin, duration, xyz, t_offset,
        imu_t, gyro, accel, image_t, image_ids)."""
        import ctypes as C

        tb = C.c_double()
        du = C.c_double()
        ni = C.c_size_t()
        nim = C.c_size_t()
        n = self._l.msync_pop(
            self._h, C.byref(tb), C.byref(du), C.byref(ni), C.byref(nim)
        )
        if n == 0:
            return None
        xyz = np.zeros((n, 3), np.float32)
        toff = np.zeros(n, np.float32)
        self._l.msync_bundle_points(self._h, _ptr(xyz), _ptr(toff))
        it = np.zeros(ni.value, np.float64)
        g = np.zeros((ni.value, 3), np.float64)
        a = np.zeros((ni.value, 3), np.float64)
        self._l.msync_bundle_imu(self._h, _ptr(it), _ptr(g), _ptr(a))
        imt = np.zeros(nim.value, np.float64)
        ids = np.zeros(nim.value, np.int64)
        self._l.msync_bundle_images(self._h, _ptr(imt), _ptr(ids))
        return {
            "t_begin": tb.value, "duration": du.value,
            "xyz": xyz, "t_offset": toff,
            "imu_t": it, "gyro": g, "accel": a,
            "image_t": imt, "image_ids": ids,
        }

    @property
    def dropped(self) -> int:
        return int(self._l.msync_dropped(self._h))


# Livox CustomMsg point wire layout (livox_ros_driver2 CustomPoint): packed
# [offset_time u32 ns, x f32, y f32, z f32, reflectivity u8, tag u8, line u8].
LIVOX_POINT_DTYPE = np.dtype(
    [
        ("offset_time", "<u4"), ("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
        ("reflectivity", "u1"), ("tag", "u1"), ("line", "u1"),
    ],
    align=False,
)


def decode_livox(raw: np.ndarray, blind_radius: float = 0.5,
                 max_radius: float = 100.0, point_stride: int = 1,
                 n_scans: int = 6):
    """Decode a Livox CustomMsg point block (reference src/preprocess.cpp
    avia_handler: keep (tag & 0x30) == 0x10 returns on lines < n_scans, drop
    blind/far/duplicate points).  `raw` is a structured array with
    LIVOX_POINT_DTYPE (or raw bytes of it).  Returns (xyz, intensity,
    t_offset_s, line)."""
    if raw.dtype != LIVOX_POINT_DTYPE:
        raw = np.frombuffer(np.ascontiguousarray(raw).tobytes(), LIVOX_POINT_DTYPE)
    raw = np.ascontiguousarray(raw)
    n = len(raw)
    xyz = np.zeros((n, 3), np.float32)
    inten = np.zeros(n, np.float32)
    t = np.zeros(n, np.float32)
    line = np.zeros(n, np.uint8)
    m = lib().decode_livox_packet(
        _ptr(raw), n, blind_radius, max_radius, point_stride, n_scans,
        _ptr(xyz), _ptr(inten), _ptr(t), _ptr(line),
    )
    return xyz[:m], inten[:m], t[:m], line[:m]


def decode_spinning(xyz: np.ndarray, intensity=None, ring=None, t=None,
                    blind_radius: float = 0.5, max_radius: float = 100.0,
                    point_stride: int = 1, n_scans: int = 64,
                    spin_hz: float = 10.0):
    """Decode a spinning-LiDAR sweep (reference velodyne/ouster handlers):
    ring filter + per-point time; when `t` is None the offset is recovered
    from azimuth under a constant spin rate.  Returns (xyz, intensity,
    t_offset_s, line)."""
    p = np.ascontiguousarray(xyz, np.float32)
    n = len(p)
    inten = np.ascontiguousarray(intensity, np.float32) if intensity is not None else None
    rg = np.ascontiguousarray(ring, np.uint16) if ring is not None else None
    tt = np.ascontiguousarray(t, np.float32) if t is not None else None
    oxyz = np.zeros((n, 3), np.float32)
    oi = np.zeros(n, np.float32)
    ot = np.zeros(n, np.float32)
    ol = np.zeros(n, np.uint8)
    m = lib().decode_spinning_sweep(
        _ptr(p), _ptr(inten) if inten is not None else None,
        _ptr(rg) if rg is not None else None,
        _ptr(tt) if tt is not None else None, n,
        blind_radius, max_radius, point_stride, n_scans, spin_hz,
        _ptr(oxyz), _ptr(oi), _ptr(ot), _ptr(ol),
    )
    return oxyz[:m], oi[:m], ot[:m], ol[:m]


def classify_line_features(xyz: np.ndarray, t: np.ndarray, line: np.ndarray,
                           n_scans: int = 6, feature_window: int = 4,
                           edge_thresh: float = 0.12, surf_thresh: float = 0.02):
    """Per-line LOAM feature tags (reference give_feature): 0 none,
    1 surface, 2 edge."""
    p = np.ascontiguousarray(xyz, np.float32)
    tt = np.ascontiguousarray(t, np.float32)
    ln = np.ascontiguousarray(line, np.uint8)
    tag = np.zeros(len(p), np.uint8)
    lib().classify_line_features(
        _ptr(p), _ptr(tt), _ptr(ln), len(p), n_scans, feature_window,
        edge_thresh, surf_thresh, _ptr(tag),
    )
    return tag
