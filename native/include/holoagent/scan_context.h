// ScanContext place recognition: rotation-invariant polar-grid LiDAR
// descriptor with ring-key candidate search (the role of the reference's
// sc-relo module, reference nav_agent/.../include/sc-relo/Scancontext.{h,cpp}:
// makeAndSaveScancontextAndKeys / detectLoopClosureID), reimplemented
// self-contained (no nanoflann: ring-key search is a linear scan over an
// L1-normalized key table, exact and fast at session scale).
#pragma once

#include <cstddef>
#include <vector>

namespace holoagent {

class ScanContext {
 public:
  ScanContext(int num_ring = 20, int num_sector = 60, double max_radius = 80.0)
      : num_ring_(num_ring), num_sector_(num_sector), max_radius_(max_radius) {}

  // points: n x 3 (x, y, z) in the sensor frame; descriptor = max z per cell.
  std::vector<double> make_descriptor(const double* points, size_t n) const;

  // ring key: per-ring mean occupancy (rotation invariant).
  std::vector<double> ring_key(const std::vector<double>& desc) const;

  void add_keyframe(const std::vector<double>& desc);
  size_t size() const { return descriptors_.size(); }

  // Returns best-matching keyframe id (or -1), with the aligned column shift
  // (yaw = shift * 2*pi / num_sector) and the cosine distance.
  int detect_loop(const std::vector<double>& query, double* yaw, double* dist,
                  int exclude_recent = 30, double max_dist = 0.35,
                  int num_candidates = 10) const;

  int num_ring() const { return num_ring_; }
  int num_sector() const { return num_sector_; }

 private:
  double column_cosine_distance(const std::vector<double>& a,
                                const std::vector<double>& b, int shift) const;

  int num_ring_, num_sector_;
  double max_radius_;
  std::vector<std::vector<double>> descriptors_;
  std::vector<std::vector<double>> ring_keys_;
};

}  // namespace holoagent
