// Host-side pose-graph optimization.
//
// Role of the reference's gtsam usage (nav_agent/.../src/LIVMapper.cpp:837-895
// prior/odometry/loop factors + ISAM2, and multi-session/
// Incremental_mapping.hpp:65-237 anchor-node session merging with
// BetweenFactorWithAnchoring.h) rebuilt self-contained: SE(3) nodes,
// prior/between factors with diagonal information, robust Huber weighting on
// loop factors, batch Gauss-Newton with numeric Jacobians and a dense
// Cholesky solve.  Anchor-based multi-session merge is expressed with the
// same machinery: one anchor node per session + between factors through the
// anchors (see holoagent_tpu.memory.multisession for the Python orchestration).
#pragma once

#include <cstddef>
#include <vector>

#include "holoagent/linalg.h"

namespace holoagent {

struct Pose {
  Mat3 rot = Mat3::identity();
  Vec3 trans;
};

class PoseGraph {
 public:
  // pose16: row-major 4x4 homogeneous transform.
  int add_node(const double* pose16);
  void add_prior(int id, const double* pose16, double rot_w, double trans_w);
  void add_between(int i, int j, const double* rel_pose16, double rot_w,
                   double trans_w, bool robust = false);
  // Returns final weighted cost; poses are updated in place.
  double optimize(int max_iters);
  void get_pose(int id, double* pose16_out) const;
  size_t num_nodes() const { return nodes_.size(); }
  size_t num_factors() const { return priors_.size() + betweens_.size(); }

 private:
  struct Prior {
    int id;
    Pose target;
    double rw, tw;
  };
  struct Between {
    int i, j;
    Pose rel;  // measured T_i^-1 * T_j
    double rw, tw;
    bool robust;
  };
  std::vector<Pose> nodes_;
  std::vector<Prior> priors_;
  std::vector<Between> betweens_;
};

}  // namespace holoagent
