// Measurement synchronization: align interleaved, out-of-order LiDAR / IMU /
// image packet streams into time-consistent bundles.
//
// The role of the reference's LIVMapper::sync_packages (reference
// nav_agent/.../src/LIVMapper.cpp:1889-1909, include/LIVMapper.h:89 and the
// LidarMeasureGroup of common_lib.h): a sweep is released only once the IMU
// queue covers past its end time, IMU samples spanning [sweep_begin,
// sweep_end] travel with it, and camera frames landing inside the sweep
// window are attached so the caller can interleave VIO updates.
#pragma once

#include <cstddef>
#include <cstdint>
#include <deque>
#include <vector>

#include "holoagent/linalg.h"

namespace holoagent {

struct ImuSample {
  double t = 0;
  Vec3 gyro{};
  Vec3 accel{};
};

struct LidarSweep {
  double t_begin = 0;       // sweep start time (seconds, shared clock)
  double duration = 0.1;    // sweep span
  std::vector<float> xyz;       // (n, 3) body frame
  std::vector<float> t_offset;  // (n,) per-point offset in [0, duration]
};

struct ImageFrame {
  double t = 0;
  int64_t id = -1;  // caller-side handle (the image itself stays host-side)
};

// One synchronized measurement bundle (LidarMeasureGroup role).
struct MeasureBundle {
  LidarSweep sweep;
  std::vector<ImuSample> imu;      // samples covering [t_begin, t_end]
  std::vector<ImageFrame> images;  // frames inside the sweep window
  bool valid = false;
};

class MeasurementSync {
 public:
  // max_queue bounds memory when a stream stalls (old packets are dropped).
  explicit MeasurementSync(size_t max_queue = 2000) : max_queue_(max_queue) {}

  void push_imu(double t, const Vec3& gyro, const Vec3& accel);
  void push_sweep(LidarSweep&& sweep);
  void push_image(double t, int64_t id);

  // Pop the next complete bundle: the oldest queued sweep whose end time is
  // covered by IMU data. Returns an invalid bundle when none is ready.
  MeasureBundle pop();

  size_t pending_sweeps() const { return sweeps_.size(); }
  size_t pending_imu() const { return imu_.size(); }
  size_t dropped() const { return dropped_; }

 private:
  size_t max_queue_;
  size_t dropped_ = 0;
  std::deque<ImuSample> imu_;
  std::deque<LidarSweep> sweeps_;
  std::deque<ImageFrame> images_;
};

}  // namespace holoagent
