// Sparse-patch photometric visual odometry for the host runtime.
//
// Role of the reference's VIOManager (nav_agent/.../lio_mapping_loc/src/
// vio.cpp, include/vio.h:82-210 — visual point voxel map with patch warping,
// projection Jacobians, EKF photometric update, exposure estimation) rebuilt
// self-contained and trimmed to its computational core:
//  - a voxel-hashed map of 3D points carrying fixed-size grayscale reference
//    patches + the camera pose they were captured from (LRU-capped per cell);
//  - per-frame retrieval of visible points with grid bucketing (one point per
//    image cell, like retrieveFromVisualSparseMap);
//  - joint Gauss-Newton over se(3) pose + affine brightness (a, b) on the
//    patch photometric error with Huber weighting (the EKF photometric update
//    + exposure estimation role);
//  - new-point spawning at strong-gradient pixels with free image cells
//    (generateVisualMapPoints role).
//
// Note on the reference's raycast retrieval (vio.cpp raycast_en): it refills
// image cells the frustum-voxel-list walk missed.  This implementation
// projects EVERY map point directly (the map is LRU-bounded), so no visible
// point can be missed by construction and a raycast pass would be redundant.
#pragma once

#include <cstdint>
#include <unordered_map>
#include <vector>

#include "holoagent/linalg.h"

namespace holoagent {

struct PinholeCam {
  int width = 0, height = 0;
  double fx = 0, fy = 0, cx = 0, cy = 0;
};

constexpr int kPatch = 8;     // 8x8 patches, kPatch^2 residuals per point
constexpr int kPatchSrc = 16; // source patch with border for affine warping

struct VisualPoint {
  Vec3 pos;                       // world
  float patch[kPatch * kPatch];   // reference grayscale patch (unwarped)
  float src[kPatchSrc * kPatchSrc];  // wider capture patch (warp source)
  Mat3 r_ref;                     // camera->world rotation at capture
  Vec3 t_ref;                     // camera center at capture
  float u_ref = 0, v_ref = 0;     // pixel coords at capture
  float depth_ref = 0;            // depth in the reference view
  // inverse-depth state along the reference ray with variance (the
  // per-point covariance bookkeeping of the reference's visual points,
  // reference include/vio.h:82-210): refined by Bayesian fusion on every
  // re-observation carrying depth (refine_depth in vio.cc)
  float inv_z = 0, inv_z_var = 0;
  int n_obs = 0;                  // depth observations fused
  int last_seen = 0;
};

struct VioResult {
  Mat3 rot;       // world<-camera (camera-to-world rotation)
  Vec3 trans;     // camera center in world
  double affine_a = 1.0, affine_b = 0.0;  // brightness model I_cur ~ a*I_ref+b
  double rmse = -1.0;
  double exposure = 1.0;  // running relative exposure-time estimate
  int n_tracked = 0;
  int n_spawned = 0;
  int n_warped = 0;  // tracked points using an affine-warped reference patch
  int iters = 0;
};

class VioManager {
 public:
  VioManager(const PinholeCam& cam, double map_cell = 0.5, int max_per_cell = 8,
             int grid_cell_px = 32);

  // img: row-major grayscale float [0,1], size cam.height * cam.width.
  // rot/trans: camera-to-world pose guess (e.g. from IMU propagation).
  // depth: optional row-major depth map (meters, <=0 invalid) used to spawn
  // new map points; pass nullptr to track only.
  VioResult process_frame(const float* img, const float* depth, const Mat3& rot,
                          const Vec3& trans, int max_iters);

  size_t num_points() const { return points_.size(); }

  // COLMAP text-model export (reference vio.cpp colmap_output_en,
  // vio.cpp:127-135 header + per-keyframe image records): writes
  // cameras.txt / images.txt / points3D.txt / poses.txt (TUM) under `dir`
  // from the recorded frame history.  Returns frames written, -1 on IO
  // error.
  int export_colmap(const char* dir) const;

  void set_record_history(bool on) { record_history_ = on; }

 private:
  struct FrameRec {
    Mat3 rot;    // camera-to-world
    Vec3 trans;  // camera center (world)
    std::vector<float> obs;  // triples (u, v, point_id) of tracked points
  };

  int64_t cell_key(const Vec3& p) const;
  void spawn_points(const float* img, const float* depth, const Mat3& rot,
                    const Vec3& trans, const std::vector<bool>& cell_used,
                    VioResult* res);
  void refine_depth(const float* depth, const Mat3& rot, const Vec3& trans,
                    const std::vector<int32_t>& tracked);

  PinholeCam cam_;
  double map_cell_;
  int max_per_cell_;
  int grid_px_;
  int frame_id_ = 0;
  double exposure_ = 1.0;
  // off by default: the LIO pipeline's embedded VIO must not grow an
  // unbounded frame history; the standalone Vio binding (capi vio_create)
  // enables it for the COLMAP export role
  bool record_history_ = false;
  std::vector<VisualPoint> points_;
  std::unordered_map<int64_t, std::vector<int32_t>> cells_;
  std::vector<FrameRec> history_;
};

}  // namespace holoagent
