#include "holoagent/registration.h"

#include <algorithm>
#include <cmath>

namespace holoagent {

namespace {

// se(3) exp: [rx ry rz tx ty tz] -> (R, t) with first-order coupling
// (rotation via axis-angle quaternion; translation applied directly —
// adequate for the small per-iteration updates GN produces).
void se3_apply_update(const double* xi, Mat3* rot, Vec3* trans) {
  Quat dq = Quat::from_axis_angle({xi[0], xi[1], xi[2]});
  dq.normalize();
  Mat3 dr = dq.to_matrix();
  *rot = dr * (*rot);
  *trans = dr * (*trans) + Vec3{xi[3], xi[4], xi[5]};
}

// log of rotation (axis-angle); used to express iterates as 6-vectors for
// Anderson mixing.
Vec3 rot_log(const Mat3& r) {
  double tr = r(0, 0) + r(1, 1) + r(2, 2);
  double c = std::min(1.0, std::max(-1.0, (tr - 1.0) / 2.0));
  double theta = std::acos(c);
  if (theta < 1e-9) return {0, 0, 0};
  double s = 2.0 * std::sin(theta);
  return Vec3{(r(2, 1) - r(1, 2)) / s, (r(0, 2) - r(2, 0)) / s,
              (r(1, 0) - r(0, 1)) / s} *
         theta;
}

void pose_to_vec6(const Mat3& r, const Vec3& t, double* out) {
  Vec3 w = rot_log(r);
  out[0] = w.x; out[1] = w.y; out[2] = w.z;
  out[3] = t.x; out[4] = t.y; out[5] = t.z;
}

void vec6_to_pose(const double* v, Mat3* r, Vec3* t) {
  Quat q = Quat::from_axis_angle({v[0], v[1], v[2]});
  q.normalize();
  *r = q.to_matrix();
  *t = {v[3], v[4], v[5]};
}

double median_of(std::vector<double>* v) {
  if (v->empty()) return 0.0;
  size_t mid = v->size() / 2;
  std::nth_element(v->begin(), v->begin() + mid, v->end());
  return (*v)[mid];
}

}  // namespace

GridIndex::GridIndex(const double* pts, size_t n, double cell) : cell_(cell) {
  pts_.reserve(n);
  for (size_t i = 0; i < n; ++i) {
    Vec3 p{pts[3 * i], pts[3 * i + 1], pts[3 * i + 2]};
    pts_.push_back(p);
    int ix = (int)std::floor(p.x / cell_);
    int iy = (int)std::floor(p.y / cell_);
    int iz = (int)std::floor(p.z / cell_);
    cells_[key_of(ix, iy, iz)].push_back((int32_t)i);
  }
}

int64_t GridIndex::key_of(int ix, int iy, int iz) const {
  // pack 21 bits per axis (offset to keep non-negative)
  const int64_t off = 1 << 20;
  return (((int64_t)(ix + off)) << 42) | (((int64_t)(iy + off)) << 21) |
         (int64_t)(iz + off);
}

int GridIndex::nearest(const Vec3& q, double max_d2, double* d2_out) const {
  int ix = (int)std::floor(q.x / cell_);
  int iy = (int)std::floor(q.y / cell_);
  int iz = (int)std::floor(q.z / cell_);
  int best = -1;
  double best_d2 = max_d2;
  for (int dx = -1; dx <= 1; ++dx)
    for (int dy = -1; dy <= 1; ++dy)
      for (int dz = -1; dz <= 1; ++dz) {
        auto it = cells_.find(key_of(ix + dx, iy + dy, iz + dz));
        if (it == cells_.end()) continue;
        for (int32_t idx : it->second) {
          Vec3 d = pts_[idx] - q;
          double d2 = d.dot(d);
          if (d2 < best_d2) { best_d2 = d2; best = idx; }
        }
      }
  if (d2_out) *d2_out = best_d2;
  return best;
}

bool GridIndex::local_plane(const Vec3& q, int min_pts, Vec3* centroid,
                            Vec3* normal) const {
  int ix = (int)std::floor(q.x / cell_);
  int iy = (int)std::floor(q.y / cell_);
  int iz = (int)std::floor(q.z / cell_);
  Vec3 sum{0, 0, 0};
  double sxx = 0, sxy = 0, sxz = 0, syy = 0, syz = 0, szz = 0;
  int n = 0;
  for (int dx = -1; dx <= 1; ++dx)
    for (int dy = -1; dy <= 1; ++dy)
      for (int dz = -1; dz <= 1; ++dz) {
        auto it = cells_.find(key_of(ix + dx, iy + dy, iz + dz));
        if (it == cells_.end()) continue;
        for (int32_t idx : it->second) {
          const Vec3& p = pts_[idx];
          sum = sum + p;
          sxx += p.x * p.x; sxy += p.x * p.y; sxz += p.x * p.z;
          syy += p.y * p.y; syz += p.y * p.z; szz += p.z * p.z;
          ++n;
        }
      }
  if (n < min_pts) return false;
  Vec3 mu = sum * (1.0 / n);
  Mat3 cov;
  cov(0, 0) = sxx / n - mu.x * mu.x;
  cov(0, 1) = cov(1, 0) = sxy / n - mu.x * mu.y;
  cov(0, 2) = cov(2, 0) = sxz / n - mu.x * mu.z;
  cov(1, 1) = syy / n - mu.y * mu.y;
  cov(1, 2) = cov(2, 1) = syz / n - mu.y * mu.z;
  cov(2, 2) = szz / n - mu.z * mu.z;
  double ev[3];
  Mat3 vecs;
  sym_eigen3(cov, ev, vecs);
  // planarity gate: reject neighborhoods that are not plane-like (corner
  // cells mixing two surfaces, isotropic clutter) — their "normal" would
  // bias the point-to-plane update (same role as the reference voxel map's
  // plane threshold, voxel_map.h init_plane).
  if (ev[0] > 0.02 * std::max(ev[2], 1e-12) + 1e-8) return false;
  *centroid = mu;
  *normal = Vec3{vecs(0, 0), vecs(1, 0), vecs(2, 0)}.normalized();
  return true;
}

void Anderson::reset() {
  g_hist_.clear();
  f_hist_.clear();
}

void Anderson::step(const double* x_prev, const double* g, double* x_next) {
  std::array<double, 6> gk, fk;
  for (int i = 0; i < 6; ++i) {
    gk[i] = g[i];
    fk[i] = g[i] - x_prev[i];  // residual of the fixed-point map
  }
  g_hist_.push_back(gk);
  f_hist_.push_back(fk);
  if ((int)g_hist_.size() > m_ + 1) {
    g_hist_.erase(g_hist_.begin());
    f_hist_.erase(f_hist_.begin());
  }
  int k = (int)g_hist_.size();
  if (k == 1) {
    for (int i = 0; i < 6; ++i) x_next[i] = g[i];
    return;
  }
  // minimize || sum_j a_j f_j || s.t. sum a_j = 1  (normal equations on
  // differences df_j = f_j - f_last, j < k-1)
  int mm = k - 1;
  std::vector<std::array<double, 6>> df(mm), dg(mm);
  for (int j = 0; j < mm; ++j)
    for (int i = 0; i < 6; ++i) {
      df[j][i] = f_hist_[j][i] - f_hist_[mm][i];
      dg[j][i] = g_hist_[j][i] - g_hist_[mm][i];
    }
  // solve (df^T df + eps I) c = -df^T f_last
  std::vector<double> a(mm * mm, 0.0), b(mm, 0.0), c(mm, 0.0);
  for (int p = 0; p < mm; ++p) {
    for (int q = 0; q < mm; ++q) {
      double s = 0;
      for (int i = 0; i < 6; ++i) s += df[p][i] * df[q][i];
      a[p * mm + q] = s + (p == q ? 1e-10 : 0.0);
    }
    double s = 0;
    for (int i = 0; i < 6; ++i) s += df[p][i] * f_hist_[mm][i];
    b[p] = -s;
  }
  // gaussian elimination (mm <= m_, tiny)
  for (int col = 0; col < mm; ++col) {
    int piv = col;
    for (int r = col + 1; r < mm; ++r)
      if (std::abs(a[r * mm + col]) > std::abs(a[piv * mm + col])) piv = r;
    if (std::abs(a[piv * mm + col]) < 1e-14) { reset(); for (int i = 0; i < 6; ++i) x_next[i] = g[i]; return; }
    for (int cc = 0; cc < mm; ++cc) std::swap(a[col * mm + cc], a[piv * mm + cc]);
    std::swap(b[col], b[piv]);
    for (int r = col + 1; r < mm; ++r) {
      double f = a[r * mm + col] / a[col * mm + col];
      for (int cc = col; cc < mm; ++cc) a[r * mm + cc] -= f * a[col * mm + cc];
      b[r] -= f * b[col];
    }
  }
  for (int r = mm - 1; r >= 0; --r) {
    double s = b[r];
    for (int cc = r + 1; cc < mm; ++cc) s -= a[r * mm + cc] * c[cc];
    c[r] = s / a[r * mm + r];
  }
  // accelerated iterate: g_last + sum_j c_j (g_j - g_last)
  for (int i = 0; i < 6; ++i) {
    double s = g_hist_[mm][i];
    for (int j = 0; j < mm; ++j) s += c[j] * dg[j][i];
    x_next[i] = s;
  }
}

RegResult register_clouds(const double* src, size_t n_src, const GridIndex& index,
                          RegMode mode, int max_iters, double max_corr,
                          bool use_anderson, const Mat3& rot0, const Vec3& t0) {
  RegResult res;
  res.rot = rot0;
  res.trans = t0;
  const bool robust =
      mode == RegMode::kRobustPointToPoint || mode == RegMode::kRobustPointToPlane;
  const bool sparse =
      mode == RegMode::kSparsePointToPoint || mode == RegMode::kSparsePointToPlane;
  const bool p2plane =
      mode == RegMode::kPointToPlane || mode == RegMode::kRobustPointToPlane ||
      mode == RegMode::kSparsePointToPlane;
  const double max_d2 = max_corr * max_corr;
  Anderson aa(5);
  double prev_cost = 1e300;
  // best-iterate tracking: Anderson extrapolation on non-robust objectives
  // can oscillate; revert to the best pose seen when the cost regresses
  // (the FRICP safeguarded-AA contract).
  Mat3 best_rot = rot0;
  Vec3 best_t = t0;
  double best_cost = 1e300;

  for (int it = 0; it < max_iters; ++it) {
    double h[36] = {0}, g[6] = {0};
    double cost = 0;
    int n_corr = 0;
    std::vector<double> r2s;
    // first pass: residuals for the Welsch bandwidth
    std::vector<Vec3> tp(n_src);
    std::vector<int> nn_cache(n_src, -1);
    for (size_t i = 0; i < n_src; ++i) {
      Vec3 p{src[3 * i], src[3 * i + 1], src[3 * i + 2]};
      tp[i] = res.rot * p + res.trans;
      double d2;
      int j = index.nearest(tp[i], max_d2, &d2);
      nn_cache[i] = j;
      if (j >= 0) r2s.push_back(d2);
    }
    if (r2s.empty()) { res.iters = it; return res; }
    double med = std::max(median_of(&r2s), 1e-12);
    // annealed Welsch bandwidth: 3x median -> 1x median
    double anneal = robust ? std::max(1.0, 3.0 - 2.0 * it / std::max(1, max_iters - 1)) : 1.0;
    double nu2 = med * anneal * anneal;

    for (size_t i = 0; i < n_src; ++i) {
      int j = nn_cache[i];
      if (j < 0) continue;
      const Vec3& q = index.points()[j];
      const Vec3& x = tp[i];
      double w = 1.0;
      Vec3 err3 = x - q;
      double r2 = err3.dot(err3);
      if (robust) w = std::exp(-r2 / (2.0 * nu2));
      if (sparse) {
        // Lp-norm IRLS weight (p = 0.4): w = p/2 * (r2 + eps)^(p/2 - 1),
        // normalized by the median so the scale matches the unit weights
        // (the SparseICP objective of the reference's FRICP toolkit)
        const double pnorm = 0.4;
        w = std::pow((r2 + 1e-8) / med, pnorm / 2.0 - 1.0);
        w = std::min(w, 1e3);
      }
      ++n_corr;
      Vec3 c, n;
      bool have_plane = p2plane && index.local_plane(x, 6, &c, &n);
      if (have_plane) {
        double r = (x - c).dot(n);
        // J = [ (x × n)^T, n^T ] for residual n^T (R p + t - c)
        Vec3 xn = x.cross(n);
        double jrow[6] = {xn.x, xn.y, xn.z, n.x, n.y, n.z};
        for (int a = 0; a < 6; ++a) {
          for (int b = 0; b < 6; ++b) h[a * 6 + b] += w * jrow[a] * jrow[b];
          g[a] += w * jrow[a] * r;
        }
        cost += w * r * r;
      } else {
        // residual x - q, J_rot = -[x]_x, J_t = I
        double jr[3][6] = {
            {0, x.z, -x.y, 1, 0, 0},
            {-x.z, 0, x.x, 0, 1, 0},
            {x.y, -x.x, 0, 0, 0, 1},
        };
        double e[3] = {err3.x, err3.y, err3.z};
        for (int row = 0; row < 3; ++row) {
          for (int a = 0; a < 6; ++a) {
            for (int b = 0; b < 6; ++b)
              h[a * 6 + b] += w * jr[row][a] * jr[row][b];
            g[a] += w * jr[row][a] * e[row];
          }
        }
        cost += w * r2;
      }
    }
    res.inlier_frac = n_src ? (double)n_corr / (double)n_src : 0.0;
    if (n_corr < 3) { res.iters = it; return res; }
    const double mean_cost = cost / std::max(1, n_corr);
    if (use_anderson && mean_cost > best_cost * 1.001 && best_cost < 1e299) {
      // regression: restart mixing from the best iterate
      res.rot = best_rot;
      res.trans = best_t;
      aa.reset();
      prev_cost = 1e300;
      continue;
    }
    if (mean_cost < best_cost) {
      best_cost = mean_cost;
      best_rot = res.rot;
      best_t = res.trans;
    }
    for (int a = 0; a < 6; ++a) h[a * 6 + a] += 1e-6;  // LM floor
    double xi[6];
    if (!solve_spd6(h, g, xi)) { res.iters = it; return res; }
    for (int a = 0; a < 6; ++a) xi[a] = -xi[a];

    if (use_anderson) {
      double x_prev[6], g_img[6], x_next[6];
      pose_to_vec6(res.rot, res.trans, x_prev);
      Mat3 r_gn = res.rot;
      Vec3 t_gn = res.trans;
      se3_apply_update(xi, &r_gn, &t_gn);
      pose_to_vec6(r_gn, t_gn, g_img);
      aa.step(x_prev, g_img, x_next);
      Mat3 r_aa; Vec3 t_aa;
      vec6_to_pose(x_next, &r_aa, &t_aa);
      // safeguard: keep the accelerated iterate only while the cost sequence
      // is non-increasing; otherwise restart the mixing from plain GN
      if (cost <= prev_cost * 1.01) {
        res.rot = r_aa; res.trans = t_aa;
      } else {
        aa.reset();
        res.rot = r_gn; res.trans = t_gn;
      }
    } else {
      se3_apply_update(xi, &res.rot, &res.trans);
    }
    prev_cost = cost;
    res.rmse = std::sqrt(cost / std::max(1, n_corr));
    res.iters = it + 1;
    double step2 = 0;
    for (int a = 0; a < 6; ++a) step2 += xi[a] * xi[a];
    if (step2 < 1e-14) break;
  }
  return res;
}

}  // namespace holoagent
