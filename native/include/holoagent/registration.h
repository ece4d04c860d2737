// Scan-to-scan / scan-to-map registration toolkit for the host runtime.
//
// Role of the reference's FRICP-toolkit (nav_agent/.../include/FRICP-toolkit/
// FRICP.h, ICP.h, AndersonAcceleration.h — Fast & Robust ICP family with a
// regMode selector, pose_estimator.cpp:28-39) rebuilt self-contained:
//  - correspondence search on a voxel-hash grid (27-cell probe), no kd-tree
//    (repo convention: spatial queries via packed voxel keys);
//  - point-to-point and point-to-plane Gauss-Newton on se(3);
//  - robust Welsch weighting with annealed bandwidth (the "R" in FRICP);
//  - Anderson acceleration of the se(3) fixed-point iteration (AA-ICP).
// Target normals for point-to-plane come from per-cell covariance eigen
// analysis (same construction as VoxelPlaneMap).
#pragma once

#include <cstdint>
#include <unordered_map>
#include <vector>

#include "holoagent/linalg.h"

namespace holoagent {

enum class RegMode : int {
  kPointToPoint = 0,
  kPointToPlane = 1,
  kRobustPointToPoint = 2,  // Welsch-weighted
  kRobustPointToPlane = 3,
  kSparsePointToPoint = 4,  // Lp-norm IRLS (p = 0.4), the SparseICP role
  kSparsePointToPlane = 5,  // the SICPPPL role
};

// Map the reference's 9-way regMode selector (reference FRICP-toolkit/
// registeration.h Method{ICP, AA_ICP, FICP, RICP, FR_ICP, PPL, RPPL,
// SparseICP, SICPPPL}; configured via config/mid360_online_reloc.yaml:12)
// onto (RegMode, use_anderson).
inline void reg_mode_from_reference(int ref_mode, RegMode* mode,
                                    bool* use_anderson) {
  switch (ref_mode) {
    case 0: *mode = RegMode::kPointToPoint; *use_anderson = false; break;
    case 1: *mode = RegMode::kPointToPoint; *use_anderson = true; break;   // AA_ICP
    case 2: *mode = RegMode::kRobustPointToPoint; *use_anderson = true; break;  // FICP
    case 3: *mode = RegMode::kRobustPointToPoint; *use_anderson = false; break; // RICP
    case 4: *mode = RegMode::kRobustPointToPoint; *use_anderson = true; break;  // FR_ICP
    case 5: *mode = RegMode::kPointToPlane; *use_anderson = false; break;  // PPL
    case 6: *mode = RegMode::kRobustPointToPlane; *use_anderson = false; break; // RPPL
    case 7: *mode = RegMode::kSparsePointToPoint; *use_anderson = false; break;
    case 8: *mode = RegMode::kSparsePointToPlane; *use_anderson = false; break;
    default: *mode = RegMode::kRobustPointToPoint; *use_anderson = true; break;
  }
}

struct RegResult {
  Mat3 rot = Mat3::identity();
  Vec3 trans;
  double rmse = -1.0;       // robust-inlier RMSE at convergence
  double inlier_frac = 0.0; // fraction of source points with a correspondence
  int iters = 0;
};

// Voxel-hash nearest-neighbor index over a fixed target cloud.
class GridIndex {
 public:
  GridIndex(const double* pts, size_t n, double cell);
  // Nearest target point within sqrt(max_d2) of q; returns index or -1.
  int nearest(const Vec3& q, double max_d2, double* d2_out) const;
  // Plane fit (centroid + unit normal) of the cell containing q merged with
  // its 26 neighbors; false if too few points or not planar enough.
  bool local_plane(const Vec3& q, int min_pts, Vec3* centroid, Vec3* normal) const;
  const std::vector<Vec3>& points() const { return pts_; }

 private:
  int64_t key_of(int ix, int iy, int iz) const;
  double cell_;
  std::vector<Vec3> pts_;
  std::unordered_map<int64_t, std::vector<int32_t>> cells_;
};

// Anderson acceleration over se(3)-parameterized iterates (window m).
class Anderson {
 public:
  explicit Anderson(int m = 5) : m_(m) {}
  // Given previous iterate x_prev and fixed-point image g = G(x_prev)
  // (both 6-vectors), return the accelerated next iterate.
  void step(const double* x_prev, const double* g, double* x_next);
  void reset();

 private:
  int m_;
  std::vector<std::array<double, 6>> g_hist_, f_hist_;  // G(x_k), residuals
};

// Register source onto target: returns T s.t. T * src ~ tgt.
// nu: Welsch bandwidth as a multiple of the current median residual
// (annealed from 3x down to 1x over the iterations); ignored by the
// non-robust modes.  max_corr: correspondence gate distance (meters).
RegResult register_clouds(const double* src, size_t n_src, const GridIndex& index,
                          RegMode mode, int max_iters, double max_corr,
                          bool use_anderson, const Mat3& rot0, const Vec3& t0);

}  // namespace holoagent
