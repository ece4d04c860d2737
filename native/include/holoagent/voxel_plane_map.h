// Probabilistic voxel plane map: octree voxel cells with per-plane parameter
// covariance, point-to-plane residuals with full noise propagation, LRU
// capacity eviction and distance-based map sliding, and a Gauss-Newton
// point-to-plane ICP — the host-side core of the reference's VoxelMapManager
// (reference nav_agent/.../include/voxel_map.h:131-261 VoxelOctoTree
// init_plane/cut_octo_tree/UpdateOctoTree, VoxelMapManager
// StateEstimation/BuildResidualListOMP/mapSliding + LRU variants, and
// include/FRICP-toolkit registration).  Original formulation: plane-parameter
// uncertainty comes from first-order eigenvector perturbation of the sample
// covariance instead of the reference's per-point Jacobian accumulation.
#pragma once

#include <cstddef>
#include <cstdint>
#include <memory>
#include <unordered_map>
#include <vector>

#include "holoagent/linalg.h"

namespace holoagent {

struct PlaneParams {
  Vec3 normal{};
  Vec3 centroid{};
  Mat3 cov_normal{};    // first-order eigenvector perturbation covariance
  Mat3 cov_centroid{};  // sample covariance / n
  double min_eigval = 0;
  bool valid = false;
};

// One point-to-plane correspondence with its full measurement variance
// (the reference's PointToPlane list entry, voxel_map.h:56-67).
struct PlaneResidual {
  double r = 0;         // signed distance to plane
  Vec3 normal{};
  Vec3 centroid{};
  double sigma2 = 0;    // Var[r] from plane covariance (+ caller's point cov)
  bool valid = false;
};

struct VoxelMapParams {
  double voxel_size = 0.5;
  int min_points = 6;          // points before first plane fit
  double planarity = 0.1;      // lambda_min < planarity * lambda_mid
  int max_layer = 2;           // octree depth below the root voxel
  int subdivide_min = 24;      // non-planar cells with >= this many pts split
  int max_points = 200;        // per-cell stored points before freeze
  size_t max_voxels = 200000;  // LRU capacity (reference MAX_VOXEL_NUM role)
};

// Octree cell: stores raw points until its plane initializes (the reference's
// temp_points_), then keeps incremental moments and refits periodically.
struct VoxelCell {
  // moments
  double n = 0;
  Vec3 sum{};
  Mat3 sq{};  // sum of outer products
  std::vector<Vec3> pts;           // retained until init (and for subdivision)
  PlaneParams plane;
  bool tried_fit = false;
  int new_since_fit = 0;
  uint64_t last_touch = 0;         // LRU tick
  int layer = 0;
  Vec3 center{};                   // cell center (for subdivision)
  double half = 0;                 // half edge length
  std::unique_ptr<VoxelCell> children[8];
  bool subdivided = false;

  void add_point(const Vec3& p, const VoxelMapParams& prm);
  void fit(const VoxelMapParams& prm);
  const VoxelCell* descend(const Vec3& p) const;
};

class VoxelPlaneMap {
 public:
  explicit VoxelPlaneMap(double voxel_size = 0.5, int min_points = 6,
                         double planarity = 0.1) {
    prm_.voxel_size = voxel_size;
    prm_.min_points = min_points;
    prm_.planarity = planarity;
  }
  explicit VoxelPlaneMap(const VoxelMapParams& prm) : prm_(prm) {}

  void insert(const double* points, size_t n);
  size_t size() const { return map_.size(); }
  size_t num_planes() const;
  // O(1)-ish existence check for the hot odometry loop (early exit on the
  // first plane; num_planes walks the whole map)
  bool has_planes() const;

  // Point-to-plane residual for one point; returns false when no plane is
  // found in the containing voxel (descending the octree) or face neighbors.
  bool residual(const Vec3& p, double* r, Vec3* normal) const;

  // Full residual with plane-parameter variance (ESIKF measurement model).
  PlaneResidual residual_with_var(const Vec3& p) const;

  // Gauss-Newton point-to-plane registration of a scan against the map.
  // pose: row-major 4x4 (in: initial guess, out: refined). Returns RMS.
  double register_scan(const double* points, size_t n, double pose[16],
                       int iters = 12, double max_residual = 1.0) const;

  // Drop cells whose center is beyond `half_extent` from `center` (reference
  // VoxelMapManager::mapSliding/clearMemOutOfMap).
  void slide(const Vec3& center, double half_extent);

  const VoxelMapParams& params() const { return prm_; }

 private:
  int64_t key_of(const Vec3& p) const;
  void evict_lru();

  VoxelMapParams prm_;
  uint64_t tick_ = 0;
  std::unordered_map<int64_t, std::unique_ptr<VoxelCell>> map_;
};

}  // namespace holoagent
