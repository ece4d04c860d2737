#include "holoagent/lio_pipeline.h"

#include <cmath>
#include <cstring>
#include <vector>

namespace holoagent {

namespace {

void pose_to16(const Mat3& r, const Vec3& t, double* m) {
  std::memset(m, 0, 16 * sizeof(double));
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) m[i * 4 + j] = r(i, j);
  m[3] = t.x; m[7] = t.y; m[11] = t.z;
  m[15] = 1.0;
}

void pose_from16(const double* m, Mat3* r, Vec3* t) {
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) (*r)(i, j) = m[i * 4 + j];
  *t = {m[3], m[7], m[11]};
}

// rotation matrix -> quaternion via the largest-component method
Quat mat_to_quat(const Mat3& r) {
  Quat q;
  double tr = r(0, 0) + r(1, 1) + r(2, 2);
  if (tr > 0) {
    double s = std::sqrt(tr + 1.0) * 2;
    q = Quat(0.25 * s, (r(2, 1) - r(1, 2)) / s, (r(0, 2) - r(2, 0)) / s,
             (r(1, 0) - r(0, 1)) / s);
  } else if (r(0, 0) > r(1, 1) && r(0, 0) > r(2, 2)) {
    double s = std::sqrt(1.0 + r(0, 0) - r(1, 1) - r(2, 2)) * 2;
    q = Quat((r(2, 1) - r(1, 2)) / s, 0.25 * s, (r(0, 1) + r(1, 0)) / s,
             (r(0, 2) + r(2, 0)) / s);
  } else if (r(1, 1) > r(2, 2)) {
    double s = std::sqrt(1.0 + r(1, 1) - r(0, 0) - r(2, 2)) * 2;
    q = Quat((r(0, 2) - r(2, 0)) / s, (r(0, 1) + r(1, 0)) / s, 0.25 * s,
             (r(1, 2) + r(2, 1)) / s);
  } else {
    double s = std::sqrt(1.0 + r(2, 2) - r(0, 0) - r(1, 1)) * 2;
    q = Quat((r(1, 0) - r(0, 1)) / s, (r(0, 2) + r(2, 0)) / s,
             (r(1, 2) + r(2, 1)) / s, 0.25 * s);
  }
  q.normalize();
  return q;
}

}  // namespace

LioPipeline::LioPipeline(const LioParams& p)
    : p_(p),
      esikf_(p.esikf),
      map_(p.map_voxel, p.map_min_points, p.map_planarity),
      sc_(20, 60, 80.0) {
  ImuState s;
  s.gravity = {0, 0, p.gravity_z};
  esikf_.reset(s);
}

void LioPipeline::init_static(const double* gyro, const double* accel, size_t n) {
  ImuState s;
  imu_init(gyro, accel, n, &s);
  s.gravity = {0, 0, p_.gravity_z};
  esikf_.reset(s);
  initialized_ = true;
}

LioStepResult LioPipeline::process_sweep(const float* xyz, const float* t_offset,
                                         size_t n_pts, const double* gyro,
                                         const double* accel, const double* dts,
                                         size_t n_imu, double sweep_dt) {
  LioStepResult res;
  // 1. preprocess: gate/stride/time-order
  std::vector<float> fx(3 * n_pts), fi(n_pts), ft(n_pts);
  std::vector<uint8_t> tag(n_pts);
  size_t m = preprocess_sweep(xyz, nullptr, t_offset, n_pts, p_.preprocess,
                              fx.data(), fi.data(), ft.data(), tag.data());
  res.points_used = m;

  // 2. IMU: undistort the sweep into its end frame from the pre-propagation
  // state, then ESIKF-propagate nominal state + covariance across the sweep
  ImuState start = esikf_.state();
  std::vector<double> pts(3 * m);
  std::vector<double> tp(m);
  for (size_t i = 0; i < m; ++i) {
    pts[3 * i] = fx[3 * i];
    pts[3 * i + 1] = fx[3 * i + 1];
    pts[3 * i + 2] = fx[3 * i + 2];
    tp[i] = ft[i];
  }
  if (n_imu > 0) {
    undistort_sweep(start, gyro, accel, dts, n_imu, pts.data(), tp.data(), m,
                    sweep_dt);
    for (size_t i = 0; i < n_imu; ++i)
      esikf_.propagate(Vec3(gyro[3 * i], gyro[3 * i + 1], gyro[3 * i + 2]),
                       Vec3(accel[3 * i], accel[3 * i + 1], accel[3 * i + 2]),
                       dts[i]);
  }

  // 3. iterated ESIKF point-to-plane update against the plane map
  // (the reference's VoxelMapManager::StateEstimation role)
  bool filt_ok = false;
  const bool map_ready = map_.has_planes();
  if (map_ready && m >= 20) {
    auto st = esikf_.update_lidar(map_, pts.data(), m);
    res.reg_rms = st.ok ? st.rms : -1.0;
    filt_ok = st.ok && st.used >= (int)(0.2 * (double)m);
  }
  Mat3 rot_pred = esikf_.state().rot.to_matrix();
  Vec3 pos_pred = esikf_.state().pos;
  std::vector<double> world(3 * m);
  for (size_t i = 0; i < m; ++i) {
    Vec3 p{pts[3 * i], pts[3 * i + 1], pts[3 * i + 2]};
    Vec3 w = rot_pred * p + pos_pred;
    world[3 * i] = w.x; world[3 * i + 1] = w.y; world[3 * i + 2] = w.z;
  }
  if (map_ready && m >= 20 && !filt_ok) {
    // filter update rejected the scan (innovation gate) — recover with the
    // robust GN re-registration, the same role the reference's online
    // relocalizer plays when the ESIKF loses track (pose_estimator.cpp).
    double corr[16];
    pose_to16(Mat3::identity(), Vec3{0, 0, 0}, corr);
    res.reg_rms = map_.register_scan(world.data(), m, corr, p_.reg_iters,
                                     p_.reg_max_residual);
    Mat3 dr; Vec3 dt;
    pose_from16(corr, &dr, &dt);
    rot_pred = dr * rot_pred;
    pos_pred = dr * pos_pred + dt;
    for (size_t i = 0; i < m; ++i) {
      Vec3 p{pts[3 * i], pts[3 * i + 1], pts[3 * i + 2]};
      Vec3 w = rot_pred * p + pos_pred;
      world[3 * i] = w.x; world[3 * i + 1] = w.y; world[3 * i + 2] = w.z;
    }
    ImuState& st = esikf_.mutable_state();
    st.rot = mat_to_quat(rot_pred);
    st.pos = pos_pred;
    st.vel = dr * st.vel;
  }
  map_.insert(world.data(), m);
  res.rot = rot_pred;
  res.pos = pos_pred;
  res.map_voxels = map_.size();

  // 4. keyframe + loop closure
  Vec3 delta = pos_pred - last_kf_pos_;
  if (!have_kf_ || delta.norm() >= p_.keyframe_dist) {
    res.keyframe = true;
    // descriptor in the BODY frame (rotation invariance handles yaw)
    std::vector<double> body(3 * m);
    Mat3 rt = rot_pred.transpose();
    for (size_t i = 0; i < m; ++i) {
      Vec3 w{world[3 * i], world[3 * i + 1], world[3 * i + 2]};
      Vec3 b = rt * (w - pos_pred);
      body[3 * i] = b.x; body[3 * i + 1] = b.y; body[3 * i + 2] = b.z;
    }
    auto desc = sc_.make_descriptor(body.data(), m);
    double pose16[16];
    pose_to16(rot_pred, pos_pred, pose16);
    int node = pg_.add_node(pose16);
    if (pg_ids_.empty()) {
      pg_.add_prior(node, pose16, 1e4, 1e4);
    } else {
      // odometry between factor from the previous keyframe
      double prev[16];
      pg_.get_pose(pg_ids_.back(), prev);
      Mat3 rp; Vec3 tp2;
      pose_from16(prev, &rp, &tp2);
      Mat3 rel_r = rp.transpose() * rot_pred;
      Vec3 rel_t = rp.transpose() * (pos_pred - tp2);
      double rel[16];
      pose_to16(rel_r, rel_t, rel);
      pg_.add_between(pg_ids_.back(), node, rel, 100.0, 100.0, false);
    }
    double yaw, dist;
    int hit = sc_.detect_loop(desc, &yaw, &dist, p_.sc_exclude_recent,
                              p_.sc_max_dist);
    if (hit >= 0 && hit < (int)pg_ids_.size()) {
      res.loop_with = hit;
      // loop factor: relative pose between the matched keyframe and here,
      // seeded by the SC yaw estimate around the matched pose
      double kf16[16];
      pg_.get_pose(pg_ids_[hit], kf16);
      Mat3 rk; Vec3 tk;
      pose_from16(kf16, &rk, &tk);
      double c = std::cos(yaw), s = std::sin(yaw);
      Mat3 ryaw;
      ryaw.m = {c, -s, 0, s, c, 0, 0, 0, 1};
      Mat3 rel_r = ryaw;           // revisit: same place, yaw offset
      Vec3 rel_t{0, 0, 0};
      double rel[16];
      pose_to16(rel_r, rel_t, rel);
      pg_.add_between(pg_ids_[hit], node, rel, 30.0, 30.0, true);
      pg_.optimize(15);
      // adopt the optimized pose for the filter state — position AND
      // rotation, and rotate the velocity by the correction so the whole
      // belief moves to the optimized frame consistently
      double opt[16];
      pg_.get_pose(node, opt);
      Mat3 ro; Vec3 to;
      pose_from16(opt, &ro, &to);
      Mat3 dr = ro * rot_pred.transpose();
      ImuState& st = esikf_.mutable_state();
      st.pos = to;
      st.vel = dr * st.vel;
      st.rot = mat_to_quat(ro);
      res.pos = to;
      res.rot = ro;
      rot_pred = ro;
      pos_pred = to;
    }
    sc_.add_keyframe(desc);
    pg_ids_.push_back(node);
    kf_poses_.push_back({res.rot, res.pos});
    last_kf_pos_ = res.pos;
    have_kf_ = true;
  }
  return res;
}

void LioPipeline::keyframe_pose(int i, double* pose16_out) const {
  if (i < 0 || i >= (int)pg_ids_.size()) {  // defensive: reachable from ctypes
    std::memset(pose16_out, 0, 16 * sizeof(double));
    pose16_out[0] = pose16_out[5] = pose16_out[10] = pose16_out[15] = 1.0;
    return;
  }
  pg_.get_pose(pg_ids_[i], pose16_out);
}


void LioPipeline::enable_vio(const PinholeCam& cam, const Mat3& r_cb,
                             const Vec3& t_cb, double map_cell,
                             int max_per_cell, int grid_px) {
  vio_ = std::make_unique<VioManager>(cam, map_cell, max_per_cell, grid_px);
  r_cb_ = r_cb;
  t_cb_ = t_cb;
}

LioStepResult LioPipeline::process_sweep_with_image(
    const float* xyz, const float* t_offset, size_t n_pts, const double* gyro,
    const double* accel, const double* dts, size_t n_imu, double sweep_dt,
    const float* img, const float* depth, double* vio_stats8) {
  LioStepResult res = process_sweep(xyz, t_offset, n_pts, gyro, accel, dts,
                                    n_imu, sweep_dt);
  if (!vio_ || !img) return res;
  // camera pose prior from the LIO-updated body state
  const Mat3 r_wb = esikf_.state().rot.to_matrix();
  const Vec3 p_wb = esikf_.state().pos;
  const Mat3 r_wc = r_wb * r_cb_;
  const Vec3 p_wc = r_wb * t_cb_ + p_wb;
  VioResult vr = vio_->process_frame(img, depth, r_wc, p_wc, 10);
  if (vio_stats8) {
    vio_stats8[0] = vr.rmse; vio_stats8[1] = vr.affine_a;
    vio_stats8[2] = vr.affine_b; vio_stats8[3] = vr.n_tracked;
    vio_stats8[4] = vr.n_spawned; vio_stats8[5] = vr.iters;
    vio_stats8[6] = vr.exposure; vio_stats8[7] = vr.n_warped;
  }
  // fuse the refined camera pose back as a body-pose measurement; variance
  // scales with the photometric residual (weak when texture is poor)
  if (vr.n_tracked >= 12 && vr.rmse >= 0) {
    const Mat3 r_meas = vr.rot * r_cb_.transpose();
    const Vec3 p_meas = vr.trans - r_meas * t_cb_;
    const double q = std::max(vr.rmse, 0.01);
    esikf_.update_pose(r_meas, p_meas, 4e-4 * q * 100.0, 1e-3 * q * 100.0);
    res.rot = esikf_.state().rot.to_matrix();
    res.pos = esikf_.state().pos;
  }
  return res;
}

}  // namespace holoagent
