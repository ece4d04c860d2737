#include "holoagent/pose_graph.h"

#include <algorithm>
#include <cmath>
#include <cstring>

namespace holoagent {

namespace {

Pose from16(const double* m) {
  Pose p;
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 3; ++c) p.rot(r, c) = m[r * 4 + c];
  p.trans = {m[3], m[7], m[11]};
  return p;
}

void to16(const Pose& p, double* m) {
  std::memset(m, 0, 16 * sizeof(double));
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 3; ++c) m[r * 4 + c] = p.rot(r, c);
  m[3] = p.trans.x; m[7] = p.trans.y; m[11] = p.trans.z;
  m[15] = 1.0;
}

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

Pose compose_inv_a_b(const Pose& a, const Pose& b) {
  // a^-1 * b
  Pose r;
  Mat3 at = a.rot.transpose();
  r.rot = at * b.rot;
  r.trans = at * (b.trans - a.trans);
  return r;
}

// residual of a between factor: 6-vec [log(R_meas^T R_rel); t_rel - t_meas]
// with R_rel/t_rel the current relative pose i->j.
void between_residual(const Pose& xi, const Pose& xj, const Pose& meas,
                      double* r6) {
  Pose rel = compose_inv_a_b(xi, xj);
  Vec3 dr = rot_log(meas.rot.transpose() * rel.rot);
  Vec3 dt = rel.trans - meas.trans;
  r6[0] = dr.x; r6[1] = dr.y; r6[2] = dr.z;
  r6[3] = dt.x; r6[4] = dt.y; r6[5] = dt.z;
}

void perturb(const Pose& x, int dim, double eps, Pose* out) {
  *out = x;
  if (dim < 3) {
    Vec3 w{0, 0, 0};
    (&w.x)[dim] = eps;
    Quat dq = Quat::from_axis_angle(w);
    dq.normalize();
    out->rot = x.rot * dq.to_matrix();  // right perturbation
  } else {
    (&out->trans.x)[dim - 3] += eps;
  }
}

// dense SPD solve (Cholesky), n x n
bool solve_spd(std::vector<double>& h, std::vector<double>& g, int n,
               std::vector<double>* out) {
  std::vector<double> l(n * n, 0.0);
  for (int i = 0; i < n; ++i) {
    for (int j = 0; j <= i; ++j) {
      double s = h[i * n + j];
      for (int k = 0; k < j; ++k) s -= l[i * n + k] * l[j * n + k];
      if (i == j) {
        if (s <= 0) return false;
        l[i * n + i] = std::sqrt(s);
      } else {
        l[i * n + j] = s / l[j * n + j];
      }
    }
  }
  std::vector<double> y(n);
  for (int i = 0; i < n; ++i) {
    double s = g[i];
    for (int k = 0; k < i; ++k) s -= l[i * n + k] * y[k];
    y[i] = s / l[i * n + i];
  }
  out->assign(n, 0.0);
  for (int i = n - 1; i >= 0; --i) {
    double s = y[i];
    for (int k = i + 1; k < n; ++k) s -= l[k * n + i] * (*out)[k];
    (*out)[i] = s / l[i * n + i];
  }
  return true;
}

void apply_update(Pose* x, const double* xi) {
  Quat dq = Quat::from_axis_angle({xi[0], xi[1], xi[2]});
  dq.normalize();
  x->rot = x->rot * dq.to_matrix();
  x->trans = x->trans + Vec3{xi[3], xi[4], xi[5]};
}

}  // namespace

int PoseGraph::add_node(const double* pose16) {
  nodes_.push_back(from16(pose16));
  return (int)nodes_.size() - 1;
}

void PoseGraph::add_prior(int id, const double* pose16, double rot_w,
                          double trans_w) {
  priors_.push_back({id, from16(pose16), rot_w, trans_w});
}

void PoseGraph::add_between(int i, int j, const double* rel_pose16,
                            double rot_w, double trans_w, bool robust) {
  betweens_.push_back({i, j, from16(rel_pose16), rot_w, trans_w, robust});
}

void PoseGraph::get_pose(int id, double* pose16_out) const {
  to16(nodes_[id], pose16_out);
}

double PoseGraph::optimize(int max_iters) {
  const int n = (int)nodes_.size();
  const int dim = 6 * n;
  const double eps = 1e-6;
  double cost = 0;
  if (n == 0) return 0.0;
  for (int it = 0; it < max_iters; ++it) {
    std::vector<double> h(dim * dim, 0.0), g(dim, 0.0);
    cost = 0;

    auto accumulate = [&](const double* r6, const double* jac, const int* cols,
                          int ncols, const double* wts) {
      // jac: 6 x (6*ncols) row-major; cols: node ids
      for (int row = 0; row < 6; ++row) {
        double w = wts[row];
        for (int a = 0; a < 6 * ncols; ++a) {
          int ga = 6 * cols[a / 6] + (a % 6);
          g[ga] += w * jac[row * 6 * ncols + a] * r6[row];
          for (int b = 0; b < 6 * ncols; ++b) {
            int gb = 6 * cols[b / 6] + (b % 6);
            h[ga * dim + gb] +=
                w * jac[row * 6 * ncols + a] * jac[row * 6 * ncols + b];
          }
        }
        cost += w * r6[row] * r6[row];
      }
    };

    for (const auto& pr : priors_) {
      double r6[6];
      between_residual(pr.target, nodes_[pr.id], Pose{}, r6);
      double jac[6 * 6];
      for (int d = 0; d < 6; ++d) {
        Pose xp;
        perturb(nodes_[pr.id], d, eps, &xp);
        double rp[6];
        between_residual(pr.target, xp, Pose{}, rp);
        for (int row = 0; row < 6; ++row) jac[row * 6 + d] = (rp[row] - r6[row]) / eps;
      }
      int cols[1] = {pr.id};
      double wts[6] = {pr.rw, pr.rw, pr.rw, pr.tw, pr.tw, pr.tw};
      accumulate(r6, jac, cols, 1, wts);
    }

    for (const auto& bt : betweens_) {
      double r6[6];
      between_residual(nodes_[bt.i], nodes_[bt.j], bt.rel, r6);
      double wts[6] = {bt.rw, bt.rw, bt.rw, bt.tw, bt.tw, bt.tw};
      if (bt.robust) {
        // Huber on the weighted norm, delta = 1
        double s = 0;
        for (int row = 0; row < 6; ++row) s += wts[row] * r6[row] * r6[row];
        double nrm = std::sqrt(std::max(s, 1e-18));
        double scale = nrm <= 1.0 ? 1.0 : 1.0 / nrm;
        for (int row = 0; row < 6; ++row) wts[row] *= scale;
      }
      double jac[6 * 12];
      for (int side = 0; side < 2; ++side) {
        int id = side == 0 ? bt.i : bt.j;
        for (int d = 0; d < 6; ++d) {
          Pose xp;
          perturb(nodes_[id], d, eps, &xp);
          double rp[6];
          if (side == 0)
            between_residual(xp, nodes_[bt.j], bt.rel, rp);
          else
            between_residual(nodes_[bt.i], xp, bt.rel, rp);
          for (int row = 0; row < 6; ++row)
            jac[row * 12 + side * 6 + d] = (rp[row] - r6[row]) / eps;
        }
      }
      int cols[2] = {bt.i, bt.j};
      accumulate(r6, jac, cols, 2, wts);
    }

    for (int d = 0; d < dim; ++d) h[d * dim + d] += 1e-8 + 1e-4 * h[d * dim + d];
    std::vector<double> xi;
    if (!solve_spd(h, g, dim, &xi)) break;
    double step2 = 0;
    for (int d = 0; d < dim; ++d) {
      xi[d] = -xi[d];
      step2 += xi[d] * xi[d];
    }
    for (int k = 0; k < n; ++k) apply_update(&nodes_[k], &xi[6 * k]);
    if (step2 < 1e-16) break;
  }
  return cost;
}

}  // namespace holoagent
