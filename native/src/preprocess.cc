#include "holoagent/preprocess.h"

#include <algorithm>
#include <cmath>
#include <numeric>
#include <vector>

namespace holoagent {

size_t preprocess_sweep(const float* xyz, const float* intensity,
                        const float* t_offset, size_t n,
                        const PreprocessParams& p, float* out_xyz,
                        float* out_intensity, float* out_t, uint8_t* out_tag) {
  // pass 1: validity + range gate + stride
  std::vector<int32_t> keep;
  keep.reserve(n);
  const double b2 = p.blind_radius * p.blind_radius;
  const double m2 = p.max_radius * p.max_radius;
  int stride_ctr = 0;
  for (size_t i = 0; i < n; ++i) {
    float x = xyz[3 * i], y = xyz[3 * i + 1], z = xyz[3 * i + 2];
    if (!std::isfinite(x) || !std::isfinite(y) || !std::isfinite(z)) continue;
    double r2 = (double)x * x + (double)y * y + (double)z * z;
    if (r2 < b2 || r2 > m2) continue;
    if (p.point_stride > 1 && (stride_ctr++ % p.point_stride) != 0) continue;
    keep.push_back((int32_t)i);
  }
  // pass 2: time order (Livox packets can interleave lines)
  if (t_offset) {
    std::stable_sort(keep.begin(), keep.end(), [&](int32_t a, int32_t b) {
      return t_offset[a] < t_offset[b];
    });
  }
  size_t m = keep.size();
  for (size_t k = 0; k < m; ++k) {
    int32_t i = keep[k];
    out_xyz[3 * k] = xyz[3 * i];
    out_xyz[3 * k + 1] = xyz[3 * i + 1];
    out_xyz[3 * k + 2] = xyz[3 * i + 2];
    out_intensity[k] = intensity ? intensity[i] : 0.0f;
    out_t[k] = t_offset ? t_offset[i] : 0.0f;
    out_tag[k] = 0;
  }
  // pass 3: curvature tag over the time-ordered sequence (LOAM-style:
  // relative deviation of the point from the mean of its neighbors)
  int w = p.feature_window;
  if (w > 0 && (int)m > 2 * w + 1) {
    for (int k = w; k < (int)m - w; ++k) {
      double sx = 0, sy = 0, sz = 0;
      for (int j = k - w; j <= k + w; ++j) {
        if (j == k) continue;
        sx += out_xyz[3 * j];
        sy += out_xyz[3 * j + 1];
        sz += out_xyz[3 * j + 2];
      }
      double inv = 1.0 / (2 * w);
      double dx = out_xyz[3 * k] - sx * inv;
      double dy = out_xyz[3 * k + 1] - sy * inv;
      double dz = out_xyz[3 * k + 2] - sz * inv;
      double px = out_xyz[3 * k], py = out_xyz[3 * k + 1], pz = out_xyz[3 * k + 2];
      double r = std::sqrt(px * px + py * py + pz * pz);
      double c = std::sqrt(dx * dx + dy * dy + dz * dz) / std::max(r, 1e-6);
      if (c < p.surf_thresh)
        out_tag[k] = 1;
      else if (c > p.edge_thresh)
        out_tag[k] = 2;
    }
  }
  return m;
}

}  // namespace holoagent
