#include "holoagent/imu.h"

#include <algorithm>
#include <cmath>
#include <vector>

namespace holoagent {

void imu_init(const double* gyro, const double* accel, size_t n, ImuState* out) {
  Vec3 mg{}, ma{};
  for (size_t i = 0; i < n; ++i) {
    mg = mg + Vec3(gyro[i * 3], gyro[i * 3 + 1], gyro[i * 3 + 2]);
    ma = ma + Vec3(accel[i * 3], accel[i * 3 + 1], accel[i * 3 + 2]);
  }
  double inv = n ? 1.0 / n : 0.0;
  out->bg = mg * inv;
  Vec3 a_mean = ma * inv;
  out->gravity = a_mean.normalized() * (-9.81);
  out->ba = Vec3{};  // accel bias folded into gravity direction at init
  out->vel = Vec3{};
}

void imu_propagate(ImuState& s, const double* gyro, const double* accel,
                   const double* dts, size_t n, double* poses_out) {
  for (size_t i = 0; i < n; ++i) {
    imu_step(s, Vec3(gyro[i * 3], gyro[i * 3 + 1], gyro[i * 3 + 2]),
             Vec3(accel[i * 3], accel[i * 3 + 1], accel[i * 3 + 2]), dts[i]);
    if (poses_out) {
      poses_out[i * 7 + 0] = s.pos.x;
      poses_out[i * 7 + 1] = s.pos.y;
      poses_out[i * 7 + 2] = s.pos.z;
      poses_out[i * 7 + 3] = s.rot.w;
      poses_out[i * 7 + 4] = s.rot.x;
      poses_out[i * 7 + 5] = s.rot.y;
      poses_out[i * 7 + 6] = s.rot.z;
    }
  }
}

void undistort_sweep(const ImuState& start, const double* gyro,
                     const double* accel, const double* dts, size_t n_imu,
                     double* points, const double* t_points, size_t n_points,
                     double sweep_dt) {
  // integrate the chain, recording cumulative time + pose
  std::vector<double> times(n_imu + 1, 0.0);
  std::vector<ImuState> states(n_imu + 1);
  states[0] = start;
  ImuState s = start;
  for (size_t i = 0; i < n_imu; ++i) {
    imu_step(s, Vec3(gyro[i * 3], gyro[i * 3 + 1], gyro[i * 3 + 2]),
             Vec3(accel[i * 3], accel[i * 3 + 1], accel[i * 3 + 2]), dts[i]);
    times[i + 1] = times[i] + dts[i];
    states[i + 1] = s;
  }
  const ImuState& end = states[n_imu];
  Mat3 r_end_t = end.rot.to_matrix().transpose();
  for (size_t i = 0; i < n_points; ++i) {
    double t = std::min(std::max(t_points[i], 0.0), sweep_dt);
    // nearest IMU state at the point's capture time
    size_t k = 0;
    while (k + 1 <= n_imu && times[k + 1] <= t) ++k;
    const ImuState& st = states[k];
    Vec3 p(points[i * 3], points[i * 3 + 1], points[i * 3 + 2]);
    // body(t) -> world -> body(end)
    Vec3 pw = st.rot.to_matrix() * p + st.pos;
    Vec3 pe = r_end_t * (pw - end.pos);
    points[i * 3] = pe.x;
    points[i * 3 + 1] = pe.y;
    points[i * 3 + 2] = pe.z;
  }
}

}  // namespace holoagent
