// IMU state propagation + LiDAR motion undistortion: the core math of the
// reference's ImuProcess (reference nav_agent/.../include/IMU_Processing.h:
// 27-71 Process2/UndistortPcl/IMU_init), self-contained.
#pragma once

#include <cstddef>

#include "holoagent/linalg.h"

namespace holoagent {

struct ImuState {
  Vec3 pos{};
  Vec3 vel{};
  Quat rot{};   // body-to-world
  Vec3 bg{};    // gyro bias
  Vec3 ba{};    // accel bias
  Vec3 gravity{0, 0, -9.81};
};

// One IMU integration step (midpoint rotation, first-order velocity/position).
inline void imu_step(ImuState& s, const Vec3& gyro, const Vec3& accel, double dt) {
  Vec3 w = gyro - s.bg;
  Quat dq = Quat::from_axis_angle(w * dt);
  Quat rot_mid = s.rot * Quat::from_axis_angle(w * (dt * 0.5));
  rot_mid.normalize();
  Vec3 a_world = rot_mid.to_matrix() * (accel - s.ba) + s.gravity;
  s.pos = s.pos + s.vel * dt + a_world * (0.5 * dt * dt);
  s.vel = s.vel + a_world * dt;
  s.rot = s.rot * dq;
  s.rot.normalize();
}

// Initialize gravity/bias from a static window of IMU samples
// (the reference's IMU_init): gravity = -mean accel direction * 9.81,
// gyro bias = mean gyro.
void imu_init(const double* gyro, const double* accel, size_t n, ImuState* out);

// Propagate through n samples with per-sample dt; optionally record the pose
// at each step into poses (n x 7: pos xyz + quat wxyz).
void imu_propagate(ImuState& s, const double* gyro, const double* accel,
                   const double* dts, size_t n, double* poses_out /*or null*/);

// Motion-undistort a sweep: each point has a timestamp in [0, sweep_dt];
// poses sampled from the IMU chain transform points into the sweep-end frame.
void undistort_sweep(const ImuState& start, const double* gyro,
                     const double* accel, const double* dts, size_t n_imu,
                     double* points, const double* t_points, size_t n_points,
                     double sweep_dt);

}  // namespace holoagent
