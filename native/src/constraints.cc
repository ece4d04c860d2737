// Odometry motion-model constraints (native).
//
// Role of the reference's wheel/ZUPT/ground constraint headers
// (nav_agent/.../lio_mapping_loc/include/wheel_odometry.h:38-179
// Mahalanobis-gated wheel-velocity update with adaptive R scaling,
// include/zupt.h:6-19 zero-velocity z clamp, include/ground_detection.h:23-50
// ERASOR-style ground extraction + constraint), operating on a compact planar
// odometry belief: pos(3), vel(3), yaw, cov_vel(3x3 row-major), cov_z.
// The Python layer (holoagent_tpu.agent.constraints) delegates here.
#include <algorithm>
#include <cmath>
#include <cstddef>
#include <vector>

#include "holoagent/linalg.h"

using holoagent::Mat3;
using holoagent::Vec3;

namespace {

// state layout (doubles): [pos(3), vel(3), yaw, cov_vel(9), cov_z] = 17
struct Belief {
  double* pos;
  double* vel;
  double* yaw;
  double* cov_vel;  // row-major 3x3
  double* cov_z;
};

Belief view(double* st) {
  return Belief{st, st + 3, st + 6, st + 7, st + 16};
}

bool solve3(const double a_in[9], const double b[3], double out[3]) {
  double a[9];
  std::copy(a_in, a_in + 9, a);
  double x[3] = {b[0], b[1], b[2]};
  int piv[3] = {0, 1, 2};
  for (int c = 0; c < 3; ++c) {
    int p = c;
    for (int r = c + 1; r < 3; ++r)
      if (std::abs(a[piv[r] * 3 + c]) > std::abs(a[piv[p] * 3 + c])) p = r;
    std::swap(piv[c], piv[p]);
    double d = a[piv[c] * 3 + c];
    if (std::abs(d) < 1e-14) return false;
    for (int r = c + 1; r < 3; ++r) {
      double f = a[piv[r] * 3 + c] / d;
      for (int k = c; k < 3; ++k) a[piv[r] * 3 + k] -= f * a[piv[c] * 3 + k];
      x[piv[r]] -= f * x[piv[c]];
    }
  }
  for (int c = 2; c >= 0; --c) {
    double s = x[piv[c]];
    for (int k = c + 1; k < 3; ++k) s -= a[piv[c] * 3 + k] * out[k];
    out[c] = s / a[piv[c] * 3 + c];
  }
  return true;
}

bool inv3(const double a[9], double out[9]) {
  double e0[3] = {1, 0, 0}, e1[3] = {0, 1, 0}, e2[3] = {0, 0, 1};
  double c0[3], c1[3], c2[3];
  if (!solve3(a, e0, c0) || !solve3(a, e1, c1) || !solve3(a, e2, c2))
    return false;
  for (int r = 0; r < 3; ++r) {
    out[r * 3 + 0] = c0[r];
    out[r * 3 + 1] = c1[r];
    out[r * 3 + 2] = c2[r];
  }
  return true;
}

}  // namespace

extern "C" {

// Wheel-velocity EKF update.  Returns 1 applied, 0 gated out.
int wheel_update(double* state17, const double* wheel_vel_body, double r_base,
                 double gate, double adaptive_scale) {
  Belief st = view(state17);
  double c = std::cos(*st.yaw), s = std::sin(*st.yaw);
  double z[3] = {
      c * wheel_vel_body[0] - s * wheel_vel_body[1],
      s * wheel_vel_body[0] + c * wheel_vel_body[1],
      wheel_vel_body[2],
  };
  double innov[3] = {z[0] - st.vel[0], z[1] - st.vel[1], z[2] - st.vel[2]};
  double r = r_base;
  double smat[9];
  for (int i = 0; i < 9; ++i) smat[i] = st.cov_vel[i];
  smat[0] += r; smat[4] += r; smat[8] += r;
  double sol[3];
  if (!solve3(smat, innov, sol)) return 0;
  double m2 = innov[0] * sol[0] + innov[1] * sol[1] + innov[2] * sol[2];
  if (m2 > gate * adaptive_scale) return 0;
  if (m2 > gate) {  // soft outlier: inflate R (adaptive scaling)
    r = r_base * (m2 / gate);
    for (int i = 0; i < 9; ++i) smat[i] = st.cov_vel[i];
    smat[0] += r; smat[4] += r; smat[8] += r;
  }
  double sinv[9];
  if (!inv3(smat, sinv)) return 0;
  double k[9];
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double acc = 0;
      for (int t = 0; t < 3; ++t) acc += st.cov_vel[i * 3 + t] * sinv[t * 3 + j];
      k[i * 3 + j] = acc;
    }
  for (int i = 0; i < 3; ++i) {
    double acc = 0;
    for (int t = 0; t < 3; ++t) acc += k[i * 3 + t] * innov[t];
    st.vel[i] += acc;
  }
  double newcov[9];  // (I - K) P
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      newcov[i * 3 + j] = 0;
      for (int t = 0; t < 3; ++t) {
        double ikt = (i == t ? 1.0 : 0.0) - k[i * 3 + t];
        newcov[i * 3 + j] += ikt * st.cov_vel[t * 3 + j];
      }
    }
  std::copy(newcov, newcov + 9, st.cov_vel);
  return 1;
}

// ZUPT: clamp velocity when the IMU is quiescent.  Returns 1 if applied.
int zupt_update(double* state17, double accel_std, double gyro_std,
                double accel_thresh, double gyro_thresh) {
  if (accel_std > accel_thresh || gyro_std > gyro_thresh) return 0;
  Belief st = view(state17);
  st.vel[0] = st.vel[1] = st.vel[2] = 0.0;
  for (int i = 0; i < 9; ++i) st.cov_vel[i] = 0.0;
  st.cov_vel[0] = st.cov_vel[4] = st.cov_vel[8] = 1e-4;
  return 1;
}

// Scalar EKF z-update toward the detected ground height.
void ground_update(double* state17, double ground_z, double sigma) {
  Belief st = view(state17);
  double s = *st.cov_z + sigma * sigma;
  double k = *st.cov_z / s;
  st.pos[2] += k * (ground_z - st.pos[2]);
  *st.cov_z *= 1.0 - k;
}

// Ground height from a scan: dominant low-z histogram mode (ERASOR-style
// lowest-band extraction).  Returns 1 with *ground_z set, 0 if no credible
// ground is visible.
int ground_estimate(const double* points, size_t n, double z_band,
                    double* ground_z) {
  if (n < 50) return 0;
  std::vector<double> z(n);
  for (size_t i = 0; i < n; ++i) z[i] = points[3 * i + 2];
  // 2nd percentile as the low anchor
  size_t k2 = (size_t)(0.02 * (n - 1));
  std::nth_element(z.begin(), z.begin() + k2, z.end());
  double lo = z[k2];
  std::vector<double> band;
  for (size_t i = 0; i < n; ++i) {
    double v = points[3 * i + 2];
    if (v >= lo && v <= lo + z_band) band.push_back(v);
  }
  if (band.size() < 30) return 0;
  const int bins = 20;
  double bmin = *std::min_element(band.begin(), band.end());
  double bmax = *std::max_element(band.begin(), band.end());
  double w = (bmax - bmin) / bins;
  if (w <= 0) { *ground_z = bmin; return 1; }
  int hist[bins] = {0};
  for (double v : band) {
    int b = std::min((int)((v - bmin) / w), bins - 1);
    ++hist[b];
  }
  int best = 0;
  for (int b = 1; b < bins; ++b)
    if (hist[b] > hist[best]) best = b;
  *ground_z = bmin + (best + 0.5) * w;
  return 1;
}

}  // extern "C"
