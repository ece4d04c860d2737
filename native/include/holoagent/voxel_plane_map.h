// Probabilistic voxel plane map: per-voxel incremental covariance with plane
// fitting, point-to-plane residuals, and a Gauss-Newton point-to-plane ICP —
// the host-side core of the reference's VoxelMapManager / FRICP roles
// (reference nav_agent/.../include/voxel_map.h:131-261 VoxelOctoTree plane
// init/update + BuildResidualListOMP; include/FRICP-toolkit registration).
#pragma once

#include <cstddef>
#include <cstdint>
#include <unordered_map>
#include <vector>

#include "holoagent/linalg.h"

namespace holoagent {

struct VoxelStats {
  double n = 0;
  Vec3 sum{};
  Mat3 sq{};  // sum of outer products
  // fitted plane (valid when is_plane)
  Vec3 normal{};
  Vec3 centroid{};
  bool is_plane = false;

  void add(const Vec3& p);
  void fit(double planarity_thresh);
};

class VoxelPlaneMap {
 public:
  explicit VoxelPlaneMap(double voxel_size = 0.5, int min_points = 6,
                         double planarity = 0.1)
      : voxel_size_(voxel_size), min_points_(min_points), planarity_(planarity) {}

  void insert(const double* points, size_t n);
  size_t size() const { return map_.size(); }
  size_t num_planes() const;

  // Point-to-plane residual for one point; returns false when the containing
  // voxel has no valid plane.
  bool residual(const Vec3& p, double* r, Vec3* normal) const;

  // Gauss-Newton point-to-plane registration of a scan against the map.
  // pose: row-major 4x4 (in: initial guess, out: refined). Returns RMS.
  double register_scan(const double* points, size_t n, double pose[16],
                       int iters = 12, double max_residual = 1.0) const;

 private:
  int64_t key_of(const Vec3& p) const;

  double voxel_size_;
  int min_points_;
  double planarity_;
  std::unordered_map<int64_t, VoxelStats> map_;
};

}  // namespace holoagent
