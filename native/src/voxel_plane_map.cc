#include "holoagent/voxel_plane_map.h"

#include <algorithm>
#include <cmath>

namespace holoagent {

namespace {

// First-order perturbation covariance of the smallest eigenvector of a
// sample covariance matrix built from n points:
//   Cov(v0) = sum_{k!=0} (lam_k * lam_0) / (n (lam_k - lam_0)^2) v_k v_k^T
// (standard PCA eigenvector perturbation result; plays the role of the
// reference's init_plane per-point Jacobian accumulation,
// voxel_map.cpp init_plane).
Mat3 eigvec_cov(const double ev[3], const Mat3& vecs, double n) {
  Mat3 c{};
  for (int k = 1; k < 3; ++k) {
    const double denom = (ev[k] - ev[0]);
    if (denom <= 1e-12) continue;
    const double w = (ev[k] * std::max(ev[0], 1e-12)) / (n * denom * denom);
    Vec3 vk(vecs(0, k), vecs(1, k), vecs(2, k));
    for (int i = 0; i < 3; ++i)
      for (int j = 0; j < 3; ++j) {
        const double vi = (i == 0 ? vk.x : i == 1 ? vk.y : vk.z);
        const double vj = (j == 0 ? vk.x : j == 1 ? vk.y : vk.z);
        c(i, j) += w * vi * vj;
      }
  }
  return c;
}

int child_index(const Vec3& p, const Vec3& center) {
  return (p.x >= center.x ? 1 : 0) | (p.y >= center.y ? 2 : 0) |
         (p.z >= center.z ? 4 : 0);
}

}  // namespace

void VoxelCell::fit(const VoxelMapParams& prm) {
  tried_fit = true;
  new_since_fit = 0;
  plane.valid = false;
  if (n < 3) return;
  const Vec3 c = sum * (1.0 / n);
  Mat3 cov;
  const double cc[3] = {c.x, c.y, c.z};
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) cov(i, j) = sq(i, j) / n - cc[i] * cc[j];
  double ev[3];
  Mat3 vecs;
  sym_eigen3(cov, ev, vecs);
  if (ev[0] < prm.planarity * std::max(ev[1], 1e-12)) {
    plane.normal = Vec3(vecs(0, 0), vecs(1, 0), vecs(2, 0)).normalized();
    plane.centroid = c;
    plane.cov_normal = eigvec_cov(ev, vecs, n);
    Mat3 cc3 = cov;
    for (int i = 0; i < 3; ++i)
      for (int j = 0; j < 3; ++j) cc3(i, j) /= std::max(n, 1.0);
    plane.cov_centroid = cc3;
    plane.min_eigval = ev[0];
    plane.valid = true;
  }
}

void VoxelCell::add_point(const Vec3& p, const VoxelMapParams& prm) {
  n += 1;
  sum = sum + p;
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      const double pi = (i == 0 ? p.x : i == 1 ? p.y : p.z);
      const double pj = (j == 0 ? p.x : j == 1 ? p.y : p.z);
      sq(i, j) += pi * pj;
    }
  if ((int)pts.size() < prm.max_points) pts.push_back(p);
  ++new_since_fit;

  // (re)fit: first at min_points, then every 5 new points while updatable
  // (the reference's update_size_threshold_ = 5, voxel_map.h:159).
  if ((!tried_fit && n >= prm.min_points) ||
      (tried_fit && new_since_fit >= 5 && n <= prm.max_points)) {
    fit(prm);
  }

  // non-planar cells with enough points split one level (the reference's
  // cut_octo_tree): redistribute the retained points into children.
  if (!plane.valid && tried_fit && !subdivided && layer < prm.max_layer &&
      (int)pts.size() >= prm.subdivide_min) {
    subdivided = true;
    for (const Vec3& q : pts) {
      const int ci = child_index(q, center);
      if (!children[ci]) {
        children[ci] = std::make_unique<VoxelCell>();
        VoxelCell& ch = *children[ci];
        ch.layer = layer + 1;
        ch.half = half * 0.5;
        ch.center = center + Vec3((ci & 1 ? 1 : -1) * ch.half,
                                  (ci & 2 ? 1 : -1) * ch.half,
                                  (ci & 4 ? 1 : -1) * ch.half);
      }
      children[ci]->add_point(q, prm);
    }
  } else if (subdivided) {
    const int ci = child_index(p, center);
    if (!children[ci]) {
      children[ci] = std::make_unique<VoxelCell>();
      VoxelCell& ch = *children[ci];
      ch.layer = layer + 1;
      ch.half = half * 0.5;
      ch.center = center + Vec3((ci & 1 ? 1 : -1) * ch.half,
                                (ci & 2 ? 1 : -1) * ch.half,
                                (ci & 4 ? 1 : -1) * ch.half);
    }
    children[ci]->add_point(p, prm);
  }
}

const VoxelCell* VoxelCell::descend(const Vec3& p) const {
  if (plane.valid || !subdivided) return this;
  const VoxelCell* ch = children[child_index(p, center)].get();
  if (!ch) return this;
  const VoxelCell* leaf = ch->descend(p);
  return leaf ? leaf : this;
}

int64_t VoxelPlaneMap::key_of(const Vec3& p) const {
  auto q = [&](double v) {
    return (int64_t)std::floor(v / prm_.voxel_size) + (1 << 20);
  };
  return (q(p.x) << 42) | (q(p.y) << 21) | q(p.z);
}

void VoxelPlaneMap::insert(const double* points, size_t n) {
  ++tick_;
  for (size_t i = 0; i < n; ++i) {
    Vec3 p(points[i * 3], points[i * 3 + 1], points[i * 3 + 2]);
    const int64_t k = key_of(p);
    auto& cell = map_[k];
    if (!cell) {
      cell = std::make_unique<VoxelCell>();
      const double s = prm_.voxel_size;
      cell->half = s * 0.5;
      cell->center = Vec3((std::floor(p.x / s) + 0.5) * s,
                          (std::floor(p.y / s) + 0.5) * s,
                          (std::floor(p.z / s) + 0.5) * s);
    }
    cell->last_touch = tick_;
    cell->add_point(p, prm_);
  }
  if (map_.size() > prm_.max_voxels) evict_lru();
}

void VoxelPlaneMap::evict_lru() {
  // drop the least-recently-touched ~10% (reference LRU voxel_map_cache_).
  // The eviction COUNT is bounded, not just the touch cutoff: when many
  // cells share the cutoff tick (a single bulk insert can stamp the whole
  // map), a threshold-only sweep would erase far more than 10% — up to
  // everything the filter needs for its next update.
  std::vector<uint64_t> touches;
  touches.reserve(map_.size());
  for (const auto& kv : map_) touches.push_back(kv.second->last_touch);
  const size_t k = touches.size() / 10 + 1;
  std::nth_element(touches.begin(), touches.begin() + k, touches.end());
  const uint64_t cutoff = touches[k];
  size_t evicted = 0;
  for (auto it = map_.begin(); it != map_.end() && evicted < k;) {
    if (it->second->last_touch <= cutoff) {
      it = map_.erase(it);
      ++evicted;
    } else {
      ++it;
    }
  }
}

void VoxelPlaneMap::slide(const Vec3& center, double half_extent) {
  for (auto it = map_.begin(); it != map_.end();) {
    const Vec3 c = it->second->center;
    if (std::abs(c.x - center.x) > half_extent ||
        std::abs(c.y - center.y) > half_extent ||
        std::abs(c.z - center.z) > half_extent)
      it = map_.erase(it);
    else
      ++it;
  }
}

bool VoxelPlaneMap::has_planes() const {
  for (const auto& kv : map_) {
    const VoxelCell* cell = kv.second.get();
    if (cell->plane.valid) return true;
    for (const auto& ch : cell->children)
      if (ch && ch->plane.valid) return true;
  }
  return false;
}

size_t VoxelPlaneMap::num_planes() const {
  size_t c = 0;
  for (const auto& kv : map_) {
    // count planar leaves (root plane or any planar child)
    const VoxelCell* cell = kv.second.get();
    if (cell->plane.valid) {
      ++c;
      continue;
    }
    for (const auto& ch : cell->children)
      if (ch && ch->plane.valid) {
        ++c;
        break;
      }
  }
  return c;
}

PlaneResidual VoxelPlaneMap::residual_with_var(const Vec3& p) const {
  // probe the containing voxel first, then the 6 face neighbors (points near
  // voxel boundaries otherwise lose their plane — the reference's residual
  // search descends the octree neighborhood for the same reason)
  const double s = prm_.voxel_size;
  const Vec3 offsets[7] = {{0, 0, 0}, {s, 0, 0}, {-s, 0, 0}, {0, s, 0},
                           {0, -s, 0}, {0, 0, s}, {0, 0, -s}};
  PlaneResidual best;
  double best_d = 1e30;
  for (const Vec3& o : offsets) {
    auto it = map_.find(key_of(p + o));
    if (it == map_.end()) continue;
    const VoxelCell* leaf = it->second->descend(p);
    if (!leaf || !leaf->plane.valid) continue;
    const PlaneParams& pl = leaf->plane;
    const double d = (p - pl.centroid).norm();
    if (d < best_d) {
      best_d = d;
      const Vec3 dp = p - pl.centroid;
      best.r = pl.normal.dot(dp);
      best.normal = pl.normal;
      best.centroid = pl.centroid;
      // Var[r] = dp^T Cov(n) dp + n^T Cov(c) n  (first order in plane params)
      Vec3 cn = pl.cov_normal * dp;
      Vec3 cc = pl.cov_centroid * pl.normal;
      best.sigma2 = dp.dot(cn) + pl.normal.dot(cc);
      best.valid = true;
    }
  }
  return best;
}

bool VoxelPlaneMap::residual(const Vec3& p, double* r, Vec3* normal) const {
  PlaneResidual pr = residual_with_var(p);
  if (!pr.valid) return false;
  *r = pr.r;
  *normal = pr.normal;
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
