// Host-side LiDAR-inertial odometry pipeline driver.
//
// The orchestration role of the reference's LIVMapper main loop
// (nav_agent/.../lio_mapping_loc/src/LIVMapper.cpp:1889-1909 run():
// sync_packages -> processImu -> stateEstimationAndMapping, keyframe +
// loop-closure factors :837-895) composed from this runtime's own modules:
// sweep preprocessing, ESIKF IMU propagation + undistortion, iterated
// point-to-plane ESIKF update against the plane-covariance voxel map
// (reference voxel_map.h:234-246 StateEstimation), map insertion, distance-gated
// keyframes with ScanContext loop detection, and pose-graph optimization on
// loop closure.  (The reference's VIO branch lives in VioManager; fusing it
// here is the caller's choice.)
#pragma once

#include <cstddef>
#include <memory>
#include <vector>

#include "holoagent/esikf.h"
#include "holoagent/imu.h"
#include "holoagent/linalg.h"
#include "holoagent/pose_graph.h"
#include "holoagent/preprocess.h"
#include "holoagent/vio.h"
#include "holoagent/scan_context.h"
#include "holoagent/voxel_plane_map.h"

namespace holoagent {

struct LioParams {
  PreprocessParams preprocess;
  EsikfParams esikf;
  double map_voxel = 0.5;
  int map_min_points = 6;
  double map_planarity = 0.1;
  double keyframe_dist = 1.0;     // meters between keyframes
  int reg_iters = 12;
  double reg_max_residual = 1.0;
  int sc_exclude_recent = 10;     // keyframes excluded from loop search
  double sc_max_dist = 0.25;
  double gravity_z = -9.81;
};

struct LioStepResult {
  Mat3 rot;              // body-to-world at sweep end
  Vec3 pos;
  double reg_rms = -1.0;
  bool keyframe = false;
  int loop_with = -1;    // keyframe id of a detected loop (-1 none)
  size_t map_voxels = 0;
  size_t points_used = 0;
};

class LioPipeline {
 public:
  explicit LioPipeline(const LioParams& p);

  // Static initialization window (robot at rest): gravity + gyro bias.
  void init_static(const double* gyro, const double* accel, size_t n);

  // One synchronized packet: a LiDAR sweep (xyz float, per-point time offset)
  // + the IMU samples spanning it (gyro/accel (n_imu,3), per-sample dt).
  LioStepResult process_sweep(const float* xyz, const float* t_offset,
                              size_t n_pts, const double* gyro,
                              const double* accel, const double* dts,
                              size_t n_imu, double sweep_dt);

  // Attach a camera: subsequent process_sweep_with_image calls run the VIO
  // photometric branch after the LIO update and fuse the refined pose back
  // into the filter (the reference's handleVIO dispatch,
  // LIVMapper.cpp:640-658).  r_cb/t_cb: camera-in-body extrinsics.
  void enable_vio(const PinholeCam& cam, const Mat3& r_cb, const Vec3& t_cb,
                  double map_cell = 0.5, int max_per_cell = 8,
                  int grid_px = 32);

  // process_sweep followed by a VIO refinement on the attached camera frame
  // (grayscale float [0,1], optional depth for point spawning).  vio_stats8
  // (optional): [rmse, a, b, n_tracked, n_spawned, iters, exposure, n_warped].
  LioStepResult process_sweep_with_image(
      const float* xyz, const float* t_offset, size_t n_pts,
      const double* gyro, const double* accel, const double* dts, size_t n_imu,
      double sweep_dt, const float* img, const float* depth,
      double* vio_stats8);

  size_t num_keyframes() const { return kf_poses_.size(); }
  void keyframe_pose(int i, double* pose16_out) const;
  const ImuState& state() const { return esikf_.state(); }
  const Esikf& filter() const { return esikf_; }

 private:
  LioParams p_;
  Esikf esikf_;
  VoxelPlaneMap map_;
  ScanContext sc_;
  PoseGraph pg_;
  std::vector<int> pg_ids_;          // pose-graph node per keyframe
  std::vector<Pose> kf_poses_;       // optimized keyframe poses
  Vec3 last_kf_pos_;
  bool have_kf_ = false;
  bool initialized_ = false;
  // optional VIO branch
  std::unique_ptr<VioManager> vio_;
  Mat3 r_cb_ = Mat3::identity();
  Vec3 t_cb_{0, 0, 0};
};

}  // namespace holoagent
