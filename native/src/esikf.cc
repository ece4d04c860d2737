#include "holoagent/esikf.h"

#include <algorithm>
#include <cmath>
#include <cstring>
#include <vector>

namespace holoagent {

namespace {

inline Mat3 skew(const Vec3& v) {
  Mat3 m;
  m.m = {0, -v.z, v.y, v.z, 0, -v.x, -v.y, v.x, 0};
  return m;
}

// P <- F P F^T + Q for block-sparse F = I + A*dt; done densely (18x18 is
// tiny on the host core).
void sandwich(double* P, const double* F, int n, const double* Qdiag) {
  std::vector<double> tmp(n * n, 0.0), out(n * n, 0.0);
  for (int i = 0; i < n; ++i)
    for (int k = 0; k < n; ++k) {
      const double f = F[i * n + k];
      if (f == 0) continue;
      for (int j = 0; j < n; ++j) tmp[i * n + j] += f * P[k * n + j];
    }
  for (int i = 0; i < n; ++i)
    for (int k = 0; k < n; ++k) {
      const double t = tmp[i * n + k];
      if (t == 0) continue;
      for (int j = 0; j < n; ++j) out[i * n + j] += t * F[j * n + k];
    }
  for (int i = 0; i < n; ++i) out[i * n + i] += Qdiag[i];
  std::memcpy(P, out.data(), sizeof(double) * n * n);
}

}  // namespace

Esikf::Esikf(const EsikfParams& prm) : prm_(prm) { reset(ImuState{}); }

void Esikf::reset(const ImuState& s) {
  nominal_ = s;
  std::memset(P_, 0, sizeof(P_));
  const double d[6] = {prm_.init_att_var, prm_.init_pos_var, prm_.init_vel_var,
                       prm_.init_bg_var, prm_.init_ba_var, prm_.init_grav_var};
  for (int b = 0; b < 6; ++b)
    for (int i = 0; i < 3; ++i)
      P_[(b * 3 + i) * kEsikfDim + (b * 3 + i)] = d[b];
}

void Esikf::propagate(const Vec3& gyro, const Vec3& accel, double dt) {
  const Vec3 w = gyro - nominal_.bg;
  const Vec3 a = accel - nominal_.ba;
  const Mat3 R = nominal_.rot.to_matrix();

  // error-state transition F = I + A dt:
  //   dtheta' = -[w]x dtheta - dbg
  //   dp'     = dv
  //   dv'     = -R [a]x dtheta - R dba + dg
  double F[kEsikfDim * kEsikfDim] = {0};
  for (int i = 0; i < kEsikfDim; ++i) F[i * kEsikfDim + i] = 1.0;
  const Mat3 wx = skew(w);
  const Mat3 ax = skew(a);
  const Mat3 Rax = R * ax;
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      F[(0 + i) * kEsikfDim + (0 + j)] -= wx(i, j) * dt;       // dtheta<-dtheta
      F[(0 + i) * kEsikfDim + (9 + j)] -= (i == j) * dt;       // dtheta<-dbg
      F[(3 + i) * kEsikfDim + (6 + j)] += (i == j) * dt;       // dp<-dv
      F[(6 + i) * kEsikfDim + (0 + j)] -= Rax(i, j) * dt;      // dv<-dtheta
      F[(6 + i) * kEsikfDim + (12 + j)] -= R(i, j) * dt;       // dv<-dba
      F[(6 + i) * kEsikfDim + (15 + j)] += (i == j) * dt;      // dv<-dg
    }
  double Q[kEsikfDim] = {0};
  for (int i = 0; i < 3; ++i) {
    Q[0 + i] = prm_.gyr_noise * prm_.gyr_noise * dt;
    Q[6 + i] = prm_.acc_noise * prm_.acc_noise * dt;
    Q[9 + i] = prm_.gyr_bias_rw * prm_.gyr_bias_rw * dt;
    Q[12 + i] = prm_.acc_bias_rw * prm_.acc_bias_rw * dt;
  }
  sandwich(P_, F, kEsikfDim, Q);
  imu_step(nominal_, gyro, accel, dt);
}

Mat3 Esikf::body_point_cov(const Vec3& p_body) const {
  const double r = std::max(p_body.norm(), 1e-3);
  const Vec3 d = p_body * (1.0 / r);
  // sigma_r^2 along the beam + (r sigma_theta)^2 across it
  const double sr2 = prm_.range_noise * prm_.range_noise;
  const double st2 = (r * prm_.bearing_noise) * (r * prm_.bearing_noise);
  Mat3 c;
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      const double di = (i == 0 ? d.x : i == 1 ? d.y : d.z);
      const double dj = (j == 0 ? d.x : j == 1 ? d.y : d.z);
      c(i, j) = sr2 * di * dj + st2 * ((i == j) - di * dj);
    }
  return c;
}

void Esikf::apply_delta(const double dx[kEsikfDim]) {
  nominal_.rot = nominal_.rot * Quat::from_axis_angle({dx[0], dx[1], dx[2]});
  nominal_.rot.normalize();
  nominal_.pos = nominal_.pos + Vec3(dx[3], dx[4], dx[5]);
  nominal_.vel = nominal_.vel + Vec3(dx[6], dx[7], dx[8]);
  nominal_.bg = nominal_.bg + Vec3(dx[9], dx[10], dx[11]);
  nominal_.ba = nominal_.ba + Vec3(dx[12], dx[13], dx[14]);
  nominal_.gravity = nominal_.gravity + Vec3(dx[15], dx[16], dx[17]);
}

bool Esikf::update_pose(const Mat3& r_meas, const Vec3& p_meas,
                        double att_var, double pos_var) {
  // residual z = [Log(R^T R_meas), p_meas - p]; H = [I_3 0 ...; 0 I_3 0 ...]
  const int D = kEsikfDim;
  const Mat3 R = nominal_.rot.to_matrix();
  const Mat3 dR = R.transpose() * r_meas;
  const double tr = dR(0, 0) + dR(1, 1) + dR(2, 2);
  const double c = std::min(1.0, std::max(-1.0, (tr - 1.0) * 0.5));
  const double ang = std::acos(c);
  Vec3 axis(dR(2, 1) - dR(1, 2), dR(0, 2) - dR(2, 0), dR(1, 0) - dR(0, 1));
  if (ang > 1e-9) axis = axis * (ang / (2.0 * std::sin(ang)));
  else axis = axis * 0.5;
  double z[6] = {axis.x, axis.y, axis.z,
                 p_meas.x - nominal_.pos.x, p_meas.y - nominal_.pos.y,
                 p_meas.z - nominal_.pos.z};
  // S = H P H^T + R  (top-left 6x6 of P plus measurement variances)
  double S[36];
  for (int i = 0; i < 6; ++i)
    for (int j = 0; j < 6; ++j) S[i * 6 + j] = P_[i * D + j];
  for (int i = 0; i < 3; ++i) S[i * 6 + i] += att_var;
  for (int i = 3; i < 6; ++i) S[i * 6 + i] += pos_var;
  double Sc[36];
  std::memcpy(Sc, S, sizeof(S));
  if (!cholesky_n(Sc, 6)) return false;
  // K = P H^T S^-1  (18x6); compute S^-1 z and S^-1 (H P) columns
  double Sinv_z[6];
  cholesky_solve(Sc, z, Sinv_z, 6);
  double dx[kEsikfDim];
  for (int i = 0; i < D; ++i) {
    double s = 0;
    for (int j = 0; j < 6; ++j) s += P_[i * D + j] * Sinv_z[j];
    dx[i] = s;
  }
  apply_delta(dx);
  // P <- (I - K H) P : K = P[:, :6] Sinv; (KH P) = K (P[:6, :])
  double Sinv_HP[6 * kEsikfDim];  // S^-1 (H P) = S^-1 P[:6, :]
  for (int col = 0; col < D; ++col) {
    double rhs[6], sol[6];
    for (int j = 0; j < 6; ++j) rhs[j] = P_[j * D + col];
    cholesky_solve(Sc, rhs, sol, 6);
    for (int j = 0; j < 6; ++j) Sinv_HP[j * D + col] = sol[j];
  }
  double Pn[kEsikfDim * kEsikfDim];
  for (int i = 0; i < D; ++i)
    for (int col = 0; col < D; ++col) {
      double s = 0;
      for (int j = 0; j < 6; ++j) s += P_[i * D + j] * Sinv_HP[j * D + col];
      Pn[i * D + col] = P_[i * D + col] - s;
    }
  // symmetrize
  for (int i = 0; i < D; ++i)
    for (int col = 0; col < D; ++col)
      P_[i * D + col] = 0.5 * (Pn[i * D + col] + Pn[col * D + i]);
  return true;
}

EsikfUpdateStats Esikf::update_lidar(const VoxelPlaneMap& map,
                                     const double* pts_body, size_t n) {
  EsikfUpdateStats stats;
  const int D = kEsikfDim;
  const ImuState prop = nominal_;  // prior (propagated) state

  // prior information = P^-1 (Cholesky inverse); if P is degenerate fall
  // back to a strong diagonal prior.
  double Pc[D * D];
  std::memcpy(Pc, P_, sizeof(Pc));
  double Pinv[D * D];
  if (!invert_spd_n(Pc, Pinv, D)) {
    std::memset(Pinv, 0, sizeof(Pinv));
    for (int i = 0; i < D; ++i) Pinv[i * D + i] = 1e6;
  }

  // prior 6x6 pose block for the innovation gate (Mahalanobis over
  // H P H^T + R rather than R alone, so a poor velocity prior cannot
  // blanket-reject a valid scan)
  double P6[36];
  for (int i = 0; i < 6; ++i)
    for (int j = 0; j < 6; ++j) P6[i * 6 + j] = P_[i * D + j];

  std::vector<double> H(6);  // per-residual sparse row: dtheta(3) + dp(3)
  for (int it = 0; it < prm_.max_iterations; ++it) {
    const Mat3 R = nominal_.rot.to_matrix();
    double A[D * D];
    std::memcpy(A, Pinv, sizeof(A));
    double b[D] = {0};

    // prior residual: x (-) x_prop (only blocks that update_lidar touches
    // move, but form the full 18-vector for correctness)
    double dx_prior[D] = {0};
    {
      // rotation: Log(R_prop^T R)
      const Mat3 Rp = prop.rot.to_matrix();
      const Mat3 dR = Rp.transpose() * R;
      const double tr = dR(0, 0) + dR(1, 1) + dR(2, 2);
      const double c = std::min(1.0, std::max(-1.0, (tr - 1.0) * 0.5));
      const double ang = std::acos(c);
      Vec3 axis(dR(2, 1) - dR(1, 2), dR(0, 2) - dR(2, 0), dR(1, 0) - dR(0, 1));
      if (ang > 1e-9) axis = axis * (ang / (2.0 * std::sin(ang)));
      else axis = axis * 0.5;
      dx_prior[0] = axis.x; dx_prior[1] = axis.y; dx_prior[2] = axis.z;
      const Vec3 dp = nominal_.pos - prop.pos;
      const Vec3 dv = nominal_.vel - prop.vel;
      const Vec3 dbg = nominal_.bg - prop.bg;
      const Vec3 dba = nominal_.ba - prop.ba;
      const Vec3 dg = nominal_.gravity - prop.gravity;
      dx_prior[3] = dp.x; dx_prior[4] = dp.y; dx_prior[5] = dp.z;
      dx_prior[6] = dv.x; dx_prior[7] = dv.y; dx_prior[8] = dv.z;
      dx_prior[9] = dbg.x; dx_prior[10] = dbg.y; dx_prior[11] = dbg.z;
      dx_prior[12] = dba.x; dx_prior[13] = dba.y; dx_prior[14] = dba.z;
      dx_prior[15] = dg.x; dx_prior[16] = dg.y; dx_prior[17] = dg.z;
    }
    for (int i = 0; i < D; ++i) {
      double s = 0;
      for (int j = 0; j < D; ++j) s += Pinv[i * D + j] * dx_prior[j];
      b[i] -= s;  // gradient of the prior term, negated (we solve A dx = b)
    }

    int used = 0;
    double sq = 0;
    for (size_t k = 0; k < n; ++k) {
      const Vec3 pb(pts_body[k * 3], pts_body[k * 3 + 1], pts_body[k * 3 + 2]);
      const Vec3 pw = R * pb + nominal_.pos;
      PlaneResidual pr = map.residual_with_var(pw);
      if (!pr.valid) continue;
      // total residual variance: plane-parameter + rotated point noise
      const Mat3 cov_w = R * body_point_cov(pb) * R.transpose();
      const double s_pt = pr.normal.dot(cov_w * pr.normal);
      const double sigma2 = std::max(pr.sigma2 + s_pt, 1e-8);
      // H: dr/dtheta = n^T (-R [pb]x)  (right perturbation), dr/dp = n^T
      const Vec3 Rn = (R.transpose() * pr.normal);  // n in body frame
      const Vec3 jth = pb.cross(Rn);  // dr/dtheta = -n^T R [pb]x = (pb x n_b)^T
      H[0] = jth.x; H[1] = jth.y; H[2] = jth.z;
      H[3] = pr.normal.x; H[4] = pr.normal.y; H[5] = pr.normal.z;
      // innovation variance: H P H^T + sigma2
      double hph = 0;
      for (int a2 = 0; a2 < 6; ++a2) {
        double s2 = 0;
        for (int b2 = 0; b2 < 6; ++b2) s2 += P6[a2 * 6 + b2] * H[b2];
        hph += H[a2] * s2;
      }
      if (pr.r * pr.r >
          prm_.sigma_gate * prm_.sigma_gate * (sigma2 + hph))
        continue;
      const double w = 1.0 / sigma2;
      for (int a2 = 0; a2 < 6; ++a2) {
        b[a2] -= w * H[a2] * pr.r;
        for (int b2 = 0; b2 < 6; ++b2) A[a2 * D + b2] += w * H[a2] * H[b2];
      }
      sq += pr.r * pr.r;
      ++used;
    }
    stats.used = used;
    stats.iterations = it + 1;
    stats.rms = used ? std::sqrt(sq / used) : 0.0;
    if (used < 10) break;

    double Ac[D * D];
    std::memcpy(Ac, A, sizeof(Ac));
    if (!cholesky_n(Ac, D)) break;
    double dx[D];
    cholesky_solve(Ac, b, dx, D);
    apply_delta(dx);
    stats.ok = true;

    double step = 0;
    for (int i = 0; i < D; ++i) step += dx[i] * dx[i];
    if (step < 1e-12) break;
  }

  if (stats.ok) {
    // posterior covariance: (P^-1 + H^T W H)^-1 evaluated at the converged
    // state — recompute the information matrix once more and invert.
    const Mat3 R = nominal_.rot.to_matrix();
    double A[D * D];
    std::memcpy(A, Pinv, sizeof(A));
    for (size_t k = 0; k < n; ++k) {
      const Vec3 pb(pts_body[k * 3], pts_body[k * 3 + 1], pts_body[k * 3 + 2]);
      const Vec3 pw = R * pb + nominal_.pos;
      PlaneResidual pr = map.residual_with_var(pw);
      if (!pr.valid) continue;
      const Mat3 cov_w = R * body_point_cov(pb) * R.transpose();
      const double sigma2 =
          std::max(pr.sigma2 + pr.normal.dot(cov_w * pr.normal), 1e-8);
      const Vec3 Rn = (R.transpose() * pr.normal);
      const Vec3 jth = pb.cross(Rn);
      const double Hrow[6] = {jth.x, jth.y, jth.z,
                              pr.normal.x, pr.normal.y, pr.normal.z};
      double hph = 0;
      for (int a2 = 0; a2 < 6; ++a2) {
        double s2 = 0;
        for (int b2 = 0; b2 < 6; ++b2) s2 += P6[a2 * 6 + b2] * Hrow[b2];
        hph += Hrow[a2] * s2;
      }
      if (pr.r * pr.r >
          prm_.sigma_gate * prm_.sigma_gate * (sigma2 + hph))
        continue;
      const double w = 1.0 / sigma2;
      for (int a2 = 0; a2 < 6; ++a2)
        for (int b2 = 0; b2 < 6; ++b2)
          A[a2 * D + b2] += w * Hrow[a2] * Hrow[b2];
    }
    double Pnew[D * D];
    if (invert_spd_n(A, Pnew, D)) std::memcpy(P_, Pnew, sizeof(P_));
  }
  return stats;
}

}  // namespace holoagent
