// Error-state iterated Kalman filter for LiDAR-inertial odometry.
//
// The state-estimation core of the reference's VoxelMapManager::
// StateEstimation + ImuProcess (reference nav_agent/.../include/
// voxel_map.h:234-246, include/IMU_Processing.h:27-71, include/
// common_lib.h:180-260 StatesGroup): nominal state {R, p, v, bg, ba, g} with
// an 18-dim error state and full covariance, IMU propagation with
// process-noise injection, and an iterated MAP update over point-to-plane
// residuals whose variances combine the per-point LiDAR noise model
// (calcBodyCov role) with the map's per-plane parameter covariance.
//
// Original formulation: the iterated update is written as damped Gauss-Newton
// on the MAP cost  |x (-) x_prop|^2_{P^-1} + sum r_i^2 / sigma_i^2  (the IEKF
// fixed point), solved by an 18x18 Cholesky each iteration.
#pragma once

#include <cstddef>

#include "holoagent/imu.h"
#include "holoagent/linalg.h"
#include "holoagent/voxel_plane_map.h"

namespace holoagent {

struct EsikfParams {
  // continuous-time IMU noise densities.  Defaults are deliberately loose:
  // they fold in unmodeled platform dynamics (commanded accelerations the
  // IMU model doesn't capture), keeping the velocity covariance from
  // collapsing so later scans can still correct a wrong velocity estimate.
  double gyr_noise = 0.01;
  double acc_noise = 0.5;
  double gyr_bias_rw = 1e-5;
  double acc_bias_rw = 1e-4;
  // LiDAR per-point noise model (reference calcBodyCov: range + bearing)
  double range_noise = 0.02;        // metres (1 sigma)
  double bearing_noise = 0.0008;    // radians (1 sigma), ~0.05 deg
  double sigma_gate = 3.0;          // chi gate on normalized residuals
  int max_iterations = 4;           // iterated-update rounds
  double init_att_var = 1e-4;
  double init_pos_var = 1e-8;
  double init_vel_var = 1.0;  // robot velocity is unknown at reset
  double init_bg_var = 1e-4;
  double init_ba_var = 1e-2;
  double init_grav_var = 1e-4;
};

// Error-state layout: [dtheta(0:3), dp(3:6), dv(6:9), dbg(9:12), dba(12:15),
// dg(15:18)]; attitude error is a right (body-frame) perturbation
// R <- R Exp(dtheta).
inline constexpr int kEsikfDim = 18;

struct EsikfUpdateStats {
  int used = 0;          // residuals that passed the gate
  int iterations = 0;
  double rms = 0;        // final point-to-plane RMS over used residuals
  bool ok = false;
};

class Esikf {
 public:
  explicit Esikf(const EsikfParams& prm = {});

  // Reset nominal + covariance (after static init).
  void reset(const ImuState& s);

  // One IMU mechanization step: nominal via imu_step, covariance via the
  // discretized error-state transition (reference IMU_Processing Process2).
  void propagate(const Vec3& gyro, const Vec3& accel, double dt);

  // Iterated point-to-plane MAP update against the plane map.
  // pts_body: (n, 3) doubles in the (undistorted) body frame at sweep end.
  EsikfUpdateStats update_lidar(const VoxelPlaneMap& map,
                                const double* pts_body, size_t n);

  // 6-DoF pose measurement update (the VIO photometric branch fused
  // loosely: the refined camera pose, mapped to the body frame, corrects
  // [dtheta, dp] with the given measurement variances — the reference's
  // handleVIO EKF update role, LIVMapper.cpp:640-658).
  bool update_pose(const Mat3& r_meas, const Vec3& p_meas, double att_var,
                   double pos_var);

  const ImuState& state() const { return nominal_; }
  ImuState& mutable_state() { return nominal_; }
  const double* covariance() const { return P_; }  // (18, 18) row-major
  const EsikfParams& params() const { return prm_; }

  // Per-point body-frame covariance from the range/bearing noise model
  // (reference voxel_map.cpp calcBodyCov).
  Mat3 body_point_cov(const Vec3& p_body) const;

 private:
  void apply_delta(const double dx[kEsikfDim]);

  EsikfParams prm_;
  ImuState nominal_;
  double P_[kEsikfDim * kEsikfDim];
};

}  // namespace holoagent
