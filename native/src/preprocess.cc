#include "holoagent/preprocess.h"

#include <algorithm>
#include <cmath>
#include <numeric>
#include <vector>

namespace holoagent {

size_t decode_livox(const LivoxRawPoint* pts, size_t n,
                    const PreprocessParams& p, float* out_xyz,
                    float* out_intensity, float* out_t, uint8_t* out_line) {
  const double b2 = p.blind_radius * p.blind_radius;
  const double m2 = p.max_radius * p.max_radius;
  size_t m = 0;
  int stride_ctr = 0;
  float prev_x = 1e9f, prev_y = 1e9f, prev_z = 1e9f;
  for (size_t i = 0; i < n; ++i) {
    const LivoxRawPoint& q = pts[i];
    if (q.line >= p.n_scans) continue;
    if ((q.tag & 0x30) != 0x10) continue;  // keep single good returns
    if (!std::isfinite(q.x) || !std::isfinite(q.y) || !std::isfinite(q.z))
      continue;
    const double r2 = (double)q.x * q.x + (double)q.y * q.y + (double)q.z * q.z;
    if (r2 < b2 || r2 > m2) continue;
    // drop exact repeats (the driver pads frames with duplicated returns)
    if (q.x == prev_x && q.y == prev_y && q.z == prev_z) continue;
    prev_x = q.x; prev_y = q.y; prev_z = q.z;
    if (p.point_stride > 1 && (stride_ctr++ % p.point_stride) != 0) continue;
    out_xyz[3 * m] = q.x;
    out_xyz[3 * m + 1] = q.y;
    out_xyz[3 * m + 2] = q.z;
    out_intensity[m] = q.reflectivity / 255.0f;
    out_t[m] = q.offset_time * 1e-9f;
    out_line[m] = q.line;
    ++m;
  }
  return m;
}

size_t decode_spinning(const float* xyz, const float* intensity,
                       const uint16_t* ring, const float* t, size_t n,
                       const PreprocessParams& p, float* out_xyz,
                       float* out_intensity, float* out_t, uint8_t* out_line) {
  const double b2 = p.blind_radius * p.blind_radius;
  const double m2 = p.max_radius * p.max_radius;
  // azimuth-offset recovery when no per-point time is given: constant spin
  // from the first point's azimuth, unwrapping once past the wrap
  // (reference velodyne_handler omega model).
  const double omega = 2.0 * M_PI * p.spin_hz;  // rad/s
  double az0 = 0.0;
  bool have_az0 = false;
  size_t m = 0;
  int stride_ctr = 0;
  for (size_t i = 0; i < n; ++i) {
    const float x = xyz[3 * i], y = xyz[3 * i + 1], z = xyz[3 * i + 2];
    if (!std::isfinite(x) || !std::isfinite(y) || !std::isfinite(z)) continue;
    if (ring && ring[i] >= p.n_scans) continue;
    const double r2 = (double)x * x + (double)y * y + (double)z * z;
    if (r2 < b2 || r2 > m2) continue;
    if (p.point_stride > 1 && (stride_ctr++ % p.point_stride) != 0) continue;
    float toff;
    if (t) {
      toff = t[i];
    } else {
      double az = std::atan2((double)y, (double)x);
      if (!have_az0) {
        az0 = az;
        have_az0 = true;
      }
      double d = az0 - az;  // spin is clockwise in sensor frame
      if (d < 0) d += 2.0 * M_PI;
      toff = (float)(d / omega);
    }
    out_xyz[3 * m] = x;
    out_xyz[3 * m + 1] = y;
    out_xyz[3 * m + 2] = z;
    out_intensity[m] = intensity ? intensity[i] : 0.0f;
    out_t[m] = toff;
    out_line[m] = ring ? (uint8_t)ring[i] : 0;
    ++m;
  }
  return m;
}

void classify_features_per_line(const float* xyz, const float* t,
                                const uint8_t* line, size_t n,
                                const PreprocessParams& p, uint8_t* out_tag) {
  // per line: order by time, LOAM curvature tagging within the line
  const int w = p.feature_window;
  for (size_t i = 0; i < n; ++i) out_tag[i] = 0;
  for (int ln = 0; ln < p.n_scans; ++ln) {
    std::vector<int32_t> idx;
    for (size_t i = 0; i < n; ++i)
      if (line[i] == ln) idx.push_back((int32_t)i);
    if ((int)idx.size() <= 2 * w + 1) continue;
    std::stable_sort(idx.begin(), idx.end(),
                     [&](int32_t a, int32_t b) { return t[a] < t[b]; });
    for (int k = w; k < (int)idx.size() - w; ++k) {
      double sx = 0, sy = 0, sz = 0;
      for (int j = k - w; j <= k + w; ++j) {
        if (j == k) continue;
        const int32_t q = idx[j];
        sx += xyz[3 * q];
        sy += xyz[3 * q + 1];
        sz += xyz[3 * q + 2];
      }
      const double inv = 1.0 / (2 * w);
      const int32_t c0 = idx[k];
      const double dx = xyz[3 * c0] - sx * inv;
      const double dy = xyz[3 * c0 + 1] - sy * inv;
      const double dz = xyz[3 * c0 + 2] - sz * inv;
      const double px = xyz[3 * c0], py = xyz[3 * c0 + 1], pz = xyz[3 * c0 + 2];
      const double r = std::sqrt(px * px + py * py + pz * pz);
      const double c = std::sqrt(dx * dx + dy * dy + dz * dz) / std::max(r, 1e-6);
      if (c < p.surf_thresh)
        out_tag[c0] = 1;
      else if (c > p.edge_thresh)
        out_tag[c0] = 2;
    }
  }
}

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
