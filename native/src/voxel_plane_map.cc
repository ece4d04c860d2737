#include "holoagent/voxel_plane_map.h"

#include <cmath>

namespace holoagent {

void VoxelStats::add(const Vec3& p) {
  n += 1;
  sum = sum + p;
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      const double pi = (i == 0 ? p.x : i == 1 ? p.y : p.z);
      const double pj = (j == 0 ? p.x : j == 1 ? p.y : p.z);
      sq(i, j) += pi * pj;
    }
}

void VoxelStats::fit(double planarity_thresh) {
  is_plane = false;
  if (n < 3) return;
  centroid = sum * (1.0 / n);
  Mat3 cov;
  const double c[3] = {centroid.x, centroid.y, centroid.z};
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) cov(i, j) = sq(i, j) / n - c[i] * c[j];
  double ev[3];
  Mat3 vecs;
  sym_eigen3(cov, ev, vecs);
  // planar when the smallest eigenvalue is much smaller than the middle one
  if (ev[0] < planarity_thresh * std::max(ev[1], 1e-12)) {
    normal = Vec3(vecs(0, 0), vecs(1, 0), vecs(2, 0)).normalized();
    is_plane = true;
  }
}

int64_t VoxelPlaneMap::key_of(const Vec3& p) const {
  auto q = [&](double v) { return (int64_t)std::floor(v / voxel_size_) + (1 << 20); };
  return (q(p.x) << 42) | (q(p.y) << 21) | q(p.z);
}

void VoxelPlaneMap::insert(const double* points, size_t n) {
  for (size_t i = 0; i < n; ++i) {
    Vec3 p(points[i * 3], points[i * 3 + 1], points[i * 3 + 2]);
    map_[key_of(p)].add(p);
  }
  for (auto& kv : map_) {
    if (kv.second.n >= min_points_) kv.second.fit(planarity_);
  }
}

size_t VoxelPlaneMap::num_planes() const {
  size_t c = 0;
  for (const auto& kv : map_) c += kv.second.is_plane;
  return c;
}

bool VoxelPlaneMap::residual(const Vec3& p, double* r, Vec3* normal) const {
  // probe the containing voxel first, then the 6 face neighbors (points near
  // voxel boundaries otherwise lose their plane — the reference's residual
  // search descends the octree neighborhood for the same reason)
  const double s = voxel_size_;
  const Vec3 offsets[7] = {{0, 0, 0}, {s, 0, 0}, {-s, 0, 0}, {0, s, 0},
                           {0, -s, 0}, {0, 0, s}, {0, 0, -s}};
  const VoxelStats* best = nullptr;
  double best_d = 1e30;
  for (const Vec3& o : offsets) {
    auto it = map_.find(key_of(p + o));
    if (it == map_.end() || !it->second.is_plane) continue;
    double d = (p - it->second.centroid).norm();
    if (d < best_d) {
      best_d = d;
      best = &it->second;
    }
  }
  if (!best) return false;
  *r = best->normal.dot(p - best->centroid);
  *normal = best->normal;
  return true;
}

double VoxelPlaneMap::register_scan(const double* points, size_t n,
                                    double pose[16], int iters,
                                    double max_residual) const {
  Mat3 rot;
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) rot(i, j) = pose[i * 4 + j];
  Vec3 t(pose[3], pose[7], pose[11]);
  double rms = 0;
  for (int it = 0; it < iters; ++it) {
    double h[36] = {0}, g[6] = {0};
    double sq_sum = 0;
    int used = 0;
    for (size_t i = 0; i < n; ++i) {
      Vec3 p(points[i * 3], points[i * 3 + 1], points[i * 3 + 2]);
      Vec3 pw = rot * p + t;
      double r;
      Vec3 nrm;
      if (!residual(pw, &r, &nrm)) continue;
      if (std::abs(r) > max_residual) continue;
      // jacobian of r wrt [t, w] (right perturbation): dr/dt = n,
      // dr/dw = n . (-[pw]x) = (pw x n)
      Vec3 jw = (rot * p).cross(nrm);
      double j[6] = {nrm.x, nrm.y, nrm.z, jw.x, jw.y, jw.z};
      for (int a = 0; a < 6; ++a) {
        g[a] += j[a] * r;
        for (int b = 0; b < 6; ++b) h[a * 6 + b] += j[a] * j[b];
      }
      sq_sum += r * r;
      ++used;
    }
    if (used < 6) break;
    for (int a = 0; a < 6; ++a) h[a * 6 + a] += 1e-6 * (h[a * 6 + a] + 1.0);
    double dx[6];
    if (!solve_spd6(h, g, dx)) break;
    for (int a = 0; a < 6; ++a) dx[a] = -dx[a];
    Vec3 dw(dx[3], dx[4], dx[5]);
    Mat3 dr = Quat::from_axis_angle(dw).to_matrix();
    rot = dr * rot;
    t = dr * t + Vec3(dx[0], dx[1], dx[2]);
    rms = std::sqrt(sq_sum / used);
  }
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) pose[i * 4 + j] = rot(i, j);
  pose[3] = t.x; pose[7] = t.y; pose[11] = t.z;
  pose[12] = pose[13] = pose[14] = 0; pose[15] = 1;
  return rms;
}

}  // namespace holoagent
