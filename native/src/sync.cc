#include "holoagent/sync.h"

#include <algorithm>

namespace holoagent {

void MeasurementSync::push_imu(double t, const Vec3& gyro, const Vec3& accel) {
  // insert keeping the queue time-sorted (packets may arrive out of order)
  ImuSample s{t, gyro, accel};
  auto it = std::upper_bound(
      imu_.begin(), imu_.end(), t,
      [](double tt, const ImuSample& a) { return tt < a.t; });
  imu_.insert(it, s);
  while (imu_.size() > max_queue_) {
    imu_.pop_front();
    ++dropped_;
  }
}

void MeasurementSync::push_sweep(LidarSweep&& sweep) {
  auto it = std::upper_bound(
      sweeps_.begin(), sweeps_.end(), sweep.t_begin,
      [](double tt, const LidarSweep& s) { return tt < s.t_begin; });
  sweeps_.insert(it, std::move(sweep));
  while (sweeps_.size() > 8) {  // a stalled consumer should not hoard sweeps
    sweeps_.pop_front();
    ++dropped_;
  }
}

void MeasurementSync::push_image(double t, int64_t id) {
  ImageFrame f{t, id};
  auto it = std::upper_bound(
      images_.begin(), images_.end(), t,
      [](double tt, const ImageFrame& a) { return tt < a.t; });
  images_.insert(it, f);
  while (images_.size() > max_queue_) {
    images_.pop_front();
    ++dropped_;
  }
}

MeasureBundle MeasurementSync::pop() {
  MeasureBundle out;
  if (sweeps_.empty() || imu_.empty()) return out;
  LidarSweep& sw = sweeps_.front();
  const double t_end = sw.t_begin + sw.duration;
  // release only when IMU coverage extends past the sweep end (the
  // reference blocks in sync_packages until imu_buffer covers lidar_end_time)
  if (imu_.back().t < t_end) return out;

  out.sweep = std::move(sw);
  sweeps_.pop_front();

  // IMU spanning [t_begin, t_end]; include one sample before the window so
  // the caller can integrate from the sweep start.
  const double t0 = out.sweep.t_begin;
  size_t first = 0;
  for (size_t i = 0; i < imu_.size(); ++i) {
    if (imu_[i].t <= t0) first = i;
    else break;
  }
  for (size_t i = first; i < imu_.size() && imu_[i].t <= t_end; ++i)
    out.imu.push_back(imu_[i]);
  // retire consumed IMU history (keep one sample at/before t_end as the next
  // window's lead-in)
  while (imu_.size() > 1 && imu_[1].t <= t_end) imu_.pop_front();

  // images inside the sweep window
  while (!images_.empty() && images_.front().t < t0) {
    images_.pop_front();  // stale frame before the window
    ++dropped_;
  }
  while (!images_.empty() && images_.front().t <= t_end) {
    out.images.push_back(images_.front());
    images_.pop_front();
  }
  out.valid = true;
  return out;
}

}  // namespace holoagent
