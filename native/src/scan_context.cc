#include "holoagent/scan_context.h"

#include <algorithm>
#include <cmath>
#include <limits>

namespace holoagent {

std::vector<double> ScanContext::make_descriptor(const double* points,
                                                 size_t n) const {
  std::vector<double> desc(num_ring_ * num_sector_, 0.0);
  for (size_t i = 0; i < n; ++i) {
    double x = points[i * 3], y = points[i * 3 + 1], z = points[i * 3 + 2];
    double r = std::sqrt(x * x + y * y);
    if (r >= max_radius_ || r < 1e-6) continue;
    double theta = std::atan2(y, x);  // [-pi, pi)
    int ring = std::min<int>(num_ring_ - 1, int(r / max_radius_ * num_ring_));
    int sector = int((theta + M_PI) / (2 * M_PI) * num_sector_);
    sector = std::min(std::max(sector, 0), num_sector_ - 1);
    double& cell = desc[ring * num_sector_ + sector];
    cell = std::max(cell, z + 2.0);  // sensor-height offset keeps cells > 0
  }
  return desc;
}

std::vector<double> ScanContext::ring_key(const std::vector<double>& desc) const {
  std::vector<double> key(num_ring_, 0.0);
  for (int r = 0; r < num_ring_; ++r) {
    double s = 0;
    for (int c = 0; c < num_sector_; ++c) s += desc[r * num_sector_ + c] > 0;
    key[r] = s / num_sector_;
  }
  return key;
}

void ScanContext::add_keyframe(const std::vector<double>& desc) {
  descriptors_.push_back(desc);
  ring_keys_.push_back(ring_key(desc));
}

double ScanContext::column_cosine_distance(const std::vector<double>& a,
                                           const std::vector<double>& b,
                                           int shift) const {
  // mean (1 - cosine) over aligned sector columns (ScanContext metric)
  double sum = 0;
  int cnt = 0;
  for (int c = 0; c < num_sector_; ++c) {
    int cb = (c + shift) % num_sector_;
    double dot = 0, na = 0, nb = 0;
    for (int r = 0; r < num_ring_; ++r) {
      double va = a[r * num_sector_ + c], vb = b[r * num_sector_ + cb];
      dot += va * vb;
      na += va * va;
      nb += vb * vb;
    }
    if (na < 1e-12 || nb < 1e-12) continue;
    sum += dot / std::sqrt(na * nb);
    ++cnt;
  }
  if (cnt == 0) return 1.0;
  return 1.0 - sum / cnt;
}

int ScanContext::detect_loop(const std::vector<double>& query, double* yaw,
                             double* dist, int exclude_recent, double max_dist,
                             int num_candidates) const {
  *yaw = 0.0;
  *dist = std::numeric_limits<double>::infinity();
  int n = int(descriptors_.size()) - exclude_recent;
  if (n <= 0) return -1;
  std::vector<double> qkey = ring_key(query);
  // candidate search: closest ring keys by L1 distance
  std::vector<std::pair<double, int>> cands;
  cands.reserve(n);
  for (int i = 0; i < n; ++i) {
    double d = 0;
    for (int r = 0; r < num_ring_; ++r) d += std::abs(qkey[r] - ring_keys_[i][r]);
    cands.push_back({d, i});
  }
  int k = std::min<int>(num_candidates, cands.size());
  std::partial_sort(cands.begin(), cands.begin() + k, cands.end());
  int best = -1;
  for (int ci = 0; ci < k; ++ci) {
    int idx = cands[ci].second;
    for (int shift = 0; shift < num_sector_; ++shift) {
      double d = column_cosine_distance(query, descriptors_[idx], shift);
      if (d < *dist) {
        *dist = d;
        *yaw = shift * 2.0 * M_PI / num_sector_;
        best = idx;
      }
    }
  }
  return (*dist <= max_dist) ? best : -1;
}

}  // namespace holoagent
