// C ABI for the host runtime (consumed from Python via ctypes — this image
// ships no pybind11).
#include <cstring>
#include <vector>

#include "holoagent/esikf.h"
#include "holoagent/imu.h"
#include "holoagent/lio_pipeline.h"
#include "holoagent/sync.h"
#include "holoagent/pose_graph.h"
#include "holoagent/preprocess.h"
#include "holoagent/registration.h"
#include "holoagent/scan_context.h"
#include "holoagent/vio.h"
#include "holoagent/voxel_plane_map.h"

using holoagent::GridIndex;
using holoagent::ImuState;
using holoagent::Mat3;
using holoagent::PoseGraph;
using holoagent::PreprocessParams;
using holoagent::RegMode;
using holoagent::ScanContext;
using holoagent::Vec3;
using holoagent::VoxelPlaneMap;

extern "C" {

// ---------------------------------------------------------------- ScanContext

void* sc_create(int num_ring, int num_sector, double max_radius) {
  return new ScanContext(num_ring, num_sector, max_radius);
}
void sc_destroy(void* h) { delete static_cast<ScanContext*>(h); }

void sc_make_descriptor(void* h, const double* points, size_t n, double* out) {
  auto* sc = static_cast<ScanContext*>(h);
  auto d = sc->make_descriptor(points, n);
  std::memcpy(out, d.data(), d.size() * sizeof(double));
}

void sc_add_keyframe(void* h, const double* desc) {
  auto* sc = static_cast<ScanContext*>(h);
  std::vector<double> d(desc, desc + sc->num_ring() * sc->num_sector());
  sc->add_keyframe(d);
}

size_t sc_size(void* h) { return static_cast<ScanContext*>(h)->size(); }

int sc_detect_loop(void* h, const double* desc, double* yaw, double* dist,
                   int exclude_recent, double max_dist) {
  auto* sc = static_cast<ScanContext*>(h);
  std::vector<double> d(desc, desc + sc->num_ring() * sc->num_sector());
  return sc->detect_loop(d, yaw, dist, exclude_recent, max_dist);
}

// -------------------------------------------------------------- VoxelPlaneMap

void* vpm_create(double voxel_size, int min_points, double planarity) {
  return new VoxelPlaneMap(voxel_size, min_points, planarity);
}
void vpm_destroy(void* h) { delete static_cast<VoxelPlaneMap*>(h); }

void vpm_insert(void* h, const double* points, size_t n) {
  static_cast<VoxelPlaneMap*>(h)->insert(points, n);
}

size_t vpm_size(void* h) { return static_cast<VoxelPlaneMap*>(h)->size(); }
size_t vpm_num_planes(void* h) {
  return static_cast<VoxelPlaneMap*>(h)->num_planes();
}

int vpm_residual(void* h, double x, double y, double z, double* r,
                 double* normal_out) {
  Vec3 n;
  bool ok = static_cast<VoxelPlaneMap*>(h)->residual(Vec3(x, y, z), r, &n);
  if (ok && normal_out) {
    normal_out[0] = n.x;
    normal_out[1] = n.y;
    normal_out[2] = n.z;
  }
  return ok ? 1 : 0;
}

double vpm_register(void* h, const double* points, size_t n, double* pose16,
                    int iters, double max_residual) {
  return static_cast<VoxelPlaneMap*>(h)->register_scan(points, n, pose16, iters,
                                                       max_residual);
}

// ------------------------------------------------------------------------ IMU

void imu_init_static(const double* gyro, const double* accel, size_t n,
                     double* state17) {
  ImuState s;
  holoagent::imu_init(gyro, accel, n, &s);
  double out[17] = {s.pos.x, s.pos.y, s.pos.z, s.vel.x, s.vel.y, s.vel.z,
                    s.rot.w, s.rot.x, s.rot.y, s.rot.z, s.bg.x, s.bg.y,
                    s.bg.z,  s.ba.x,  s.ba.y,  s.ba.z,  s.gravity.z};
  std::memcpy(state17, out, sizeof(out));
}

static ImuState unpack(const double* st) {
  ImuState s;
  s.pos = Vec3(st[0], st[1], st[2]);
  s.vel = Vec3(st[3], st[4], st[5]);
  s.rot = holoagent::Quat(st[6], st[7], st[8], st[9]);
  s.bg = Vec3(st[10], st[11], st[12]);
  s.ba = Vec3(st[13], st[14], st[15]);
  s.gravity = Vec3(0, 0, st[16]);
  return s;
}

static void pack(const ImuState& s, double* st) {
  double out[17] = {s.pos.x, s.pos.y, s.pos.z, s.vel.x, s.vel.y, s.vel.z,
                    s.rot.w, s.rot.x, s.rot.y, s.rot.z, s.bg.x, s.bg.y,
                    s.bg.z,  s.ba.x,  s.ba.y,  s.ba.z,  s.gravity.z};
  std::memcpy(st, out, sizeof(out));
}

void imu_propagate_c(double* state17, const double* gyro, const double* accel,
                     const double* dts, size_t n, double* poses_out) {
  ImuState s = unpack(state17);
  holoagent::imu_propagate(s, gyro, accel, dts, n, poses_out);
  pack(s, state17);
}

void imu_undistort_c(const double* state17, const double* gyro,
                     const double* accel, const double* dts, size_t n_imu,
                     double* points, const double* t_points, size_t n_points,
                     double sweep_dt) {
  holoagent::undistort_sweep(unpack(state17), gyro, accel, dts, n_imu, points,
                             t_points, n_points, sweep_dt);
}

// --------------------------------------------------------- Registration (FRICP)

void* reg_index_create(const double* pts, size_t n, double cell) {
  return new GridIndex(pts, n, cell);
}

void reg_index_destroy(void* h) { delete static_cast<GridIndex*>(h); }

// pose16 (row-major 4x4) is the initial guess in and the result out.
// Returns inlier RMSE (or -1 if registration failed to find correspondences).
double reg_register(void* index_h, const double* src, size_t n_src, int mode,
                    int max_iters, double max_corr, int use_anderson,
                    double* pose16, double* inlier_frac_out) {
  const GridIndex& index = *static_cast<GridIndex*>(index_h);
  Mat3 r0;
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 3; ++c) r0(r, c) = pose16[r * 4 + c];
  Vec3 t0{pose16[3], pose16[7], pose16[11]};
  auto res = holoagent::register_clouds(src, n_src, index, (RegMode)mode,
                                        max_iters, max_corr, use_anderson != 0,
                                        r0, t0);
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 3; ++c) pose16[r * 4 + c] = res.rot(r, c);
  pose16[3] = res.trans.x; pose16[7] = res.trans.y; pose16[11] = res.trans.z;
  pose16[12] = pose16[13] = pose16[14] = 0.0; pose16[15] = 1.0;
  if (inlier_frac_out) *inlier_frac_out = res.inlier_frac;
  return res.rmse;
}

// Register with the reference's 0-8 regMode indices (reference
// registeration.h Method enum; mid360_online_reloc.yaml:12 defaults to 4).
double reg_register_refmode(void* index_h, const double* src, size_t n_src,
                            int ref_mode, int max_iters, double max_corr,
                            double* pose16, double* inlier_frac_out) {
  RegMode mode;
  bool aa;
  holoagent::reg_mode_from_reference(ref_mode, &mode, &aa);
  return reg_register(index_h, src, n_src, (int)mode, max_iters, max_corr,
                      aa ? 1 : 0, pose16, inlier_frac_out);
}

// ------------------------------------------------------------------ Preprocess

size_t pp_sweep(const float* xyz, const float* intensity, const float* t_offset,
                size_t n, double blind, double max_r, int stride, int feat_win,
                double edge_thresh, double surf_thresh, float* out_xyz,
                float* out_intensity, float* out_t, uint8_t* out_tag) {
  PreprocessParams p;
  p.blind_radius = blind;
  p.max_radius = max_r;
  p.point_stride = stride;
  p.feature_window = feat_win;
  p.edge_thresh = edge_thresh;
  p.surf_thresh = surf_thresh;
  return holoagent::preprocess_sweep(xyz, intensity, t_offset, n, p, out_xyz,
                                     out_intensity, out_t, out_tag);
}

// ------------------------------------------------------------------------ VIO

void* vio_create(int w, int h, double fx, double fy, double cx, double cy,
                 double map_cell, int max_per_cell, int grid_px) {
  holoagent::PinholeCam cam;
  cam.width = w; cam.height = h;
  cam.fx = fx; cam.fy = fy; cam.cx = cx; cam.cy = cy;
  auto* vm = new holoagent::VioManager(cam, map_cell, max_per_cell, grid_px);
  vm->set_record_history(true);  // standalone binding: COLMAP export enabled
  return vm;
}

void vio_destroy(void* h) { delete static_cast<holoagent::VioManager*>(h); }

size_t vio_num_points(void* h) {
  return static_cast<holoagent::VioManager*>(h)->num_points();
}

// pose16: camera-to-world, in (guess) / out (refined).  stats8 out:
// [rmse, affine_a, affine_b, n_tracked, n_spawned, iters, exposure, n_warped]
void vio_process(void* h, const float* img, const float* depth, double* pose16,
                 int max_iters, double* stats6) {
  auto* vm = static_cast<holoagent::VioManager*>(h);
  Mat3 r;
  for (int rr = 0; rr < 3; ++rr)
    for (int c = 0; c < 3; ++c) r(rr, c) = pose16[rr * 4 + c];
  Vec3 t{pose16[3], pose16[7], pose16[11]};
  auto res = vm->process_frame(img, depth, r, t, max_iters);
  for (int rr = 0; rr < 3; ++rr)
    for (int c = 0; c < 3; ++c) pose16[rr * 4 + c] = res.rot(rr, c);
  pose16[3] = res.trans.x; pose16[7] = res.trans.y; pose16[11] = res.trans.z;
  pose16[12] = pose16[13] = pose16[14] = 0.0; pose16[15] = 1.0;
  stats6[0] = res.rmse;
  stats6[1] = res.affine_a;
  stats6[2] = res.affine_b;
  stats6[3] = res.n_tracked;
  stats6[4] = res.n_spawned;
  stats6[5] = res.iters;
  stats6[6] = res.exposure;
  stats6[7] = res.n_warped;
}

// COLMAP text-model export of the frame history + visual map (reference
// vio.cpp colmap_output_en).  Returns frames written, -1 on IO error.
int vio_export_colmap(void* h, const char* dir) {
  return static_cast<holoagent::VioManager*>(h)->export_colmap(dir);
}

// ------------------------------------------------------------------ Pose graph

void* pg_create() { return new PoseGraph(); }
void pg_destroy(void* h) { delete static_cast<PoseGraph*>(h); }

int pg_add_node(void* h, const double* pose16) {
  return static_cast<PoseGraph*>(h)->add_node(pose16);
}

void pg_add_prior(void* h, int id, const double* pose16, double rot_w,
                  double trans_w) {
  static_cast<PoseGraph*>(h)->add_prior(id, pose16, rot_w, trans_w);
}

void pg_add_between(void* h, int i, int j, const double* rel16, double rot_w,
                    double trans_w, int robust) {
  static_cast<PoseGraph*>(h)->add_between(i, j, rel16, rot_w, trans_w,
                                          robust != 0);
}

double pg_optimize(void* h, int max_iters) {
  return static_cast<PoseGraph*>(h)->optimize(max_iters);
}

void pg_get_pose(void* h, int id, double* pose16_out) {
  static_cast<PoseGraph*>(h)->get_pose(id, pose16_out);
}

size_t pg_num_nodes(void* h) { return static_cast<PoseGraph*>(h)->num_nodes(); }

// ---------------------------------------------------------------- LIO pipeline

void* lio_create(double map_voxel, int map_min_points, double planarity,
                 double keyframe_dist, double blind_radius, double max_radius,
                 int point_stride, double sc_max_dist, int sc_exclude_recent) {
  holoagent::LioParams p;
  p.map_voxel = map_voxel;
  p.map_min_points = map_min_points;
  p.map_planarity = planarity;
  p.keyframe_dist = keyframe_dist;
  p.preprocess.blind_radius = blind_radius;
  p.preprocess.max_radius = max_radius;
  p.preprocess.point_stride = point_stride;
  p.sc_max_dist = sc_max_dist;
  p.sc_exclude_recent = sc_exclude_recent;
  return new holoagent::LioPipeline(p);
}

void lio_destroy(void* h) { delete static_cast<holoagent::LioPipeline*>(h); }

void lio_init_static(void* h, const double* gyro, const double* accel, size_t n) {
  static_cast<holoagent::LioPipeline*>(h)->init_static(gyro, accel, n);
}

// out24: pose16, reg_rms, keyframe, loop_with, map_voxels, points_used, pad
void lio_process(void* h, const float* xyz, const float* t_offset, size_t n_pts,
                 const double* gyro, const double* accel, const double* dts,
                 size_t n_imu, double sweep_dt, double* out24) {
  auto res = static_cast<holoagent::LioPipeline*>(h)->process_sweep(
      xyz, t_offset, n_pts, gyro, accel, dts, n_imu, sweep_dt);
  std::memset(out24, 0, 24 * sizeof(double));
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 3; ++c) out24[r * 4 + c] = res.rot(r, c);
  out24[3] = res.pos.x; out24[7] = res.pos.y; out24[11] = res.pos.z;
  out24[15] = 1.0;
  out24[16] = res.reg_rms;
  out24[17] = res.keyframe ? 1.0 : 0.0;
  out24[18] = res.loop_with;
  out24[19] = (double)res.map_voxels;
  out24[20] = (double)res.points_used;
}

// Attach a camera to the pipeline (extrinsics r_cb (row-major 9), t_cb (3)).
void lio_enable_vio(void* h, int w, int hh, double fx, double fy, double cx,
                    double cy, const double* r_cb9, const double* t_cb3,
                    double map_cell, int max_per_cell, int grid_px) {
  holoagent::PinholeCam cam;
  cam.width = w; cam.height = hh;
  cam.fx = fx; cam.fy = fy; cam.cx = cx; cam.cy = cy;
  Mat3 r;
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) r(i, j) = r_cb9[i * 3 + j];
  static_cast<holoagent::LioPipeline*>(h)->enable_vio(
      cam, r, Vec3{t_cb3[0], t_cb3[1], t_cb3[2]}, map_cell, max_per_cell,
      grid_px);
}

// process_sweep + VIO branch (img/depth may be null -> plain LIO step).
void lio_process_image(void* h, const float* xyz, const float* t_offset,
                       size_t n_pts, const double* gyro, const double* accel,
                       const double* dts, size_t n_imu, double sweep_dt,
                       const float* img, const float* depth, double* out24,
                       double* vio_stats8) {
  auto res = static_cast<holoagent::LioPipeline*>(h)->process_sweep_with_image(
      xyz, t_offset, n_pts, gyro, accel, dts, n_imu, sweep_dt, img, depth,
      vio_stats8);
  std::memset(out24, 0, 24 * sizeof(double));
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 3; ++c) out24[r * 4 + c] = res.rot(r, c);
  out24[3] = res.pos.x; out24[7] = res.pos.y; out24[11] = res.pos.z;
  out24[15] = 1.0;
  out24[16] = res.reg_rms;
  out24[17] = res.keyframe ? 1.0 : 0.0;
  out24[18] = res.loop_with;
  out24[19] = (double)res.map_voxels;
  out24[20] = (double)res.points_used;
}

size_t lio_num_keyframes(void* h) {
  return static_cast<holoagent::LioPipeline*>(h)->num_keyframes();
}

void lio_keyframe_pose(void* h, int i, double* pose16_out) {
  static_cast<holoagent::LioPipeline*>(h)->keyframe_pose(i, pose16_out);
}

// expose the filter covariance (18x18) + nominal state (pos3 vel3 quat4 bg3
// ba3 g3 = 19 doubles) for introspection/tests
void lio_filter_state(void* h, double* state19, double* cov324) {
  const auto& f = static_cast<holoagent::LioPipeline*>(h)->filter();
  const ImuState& s = f.state();
  state19[0] = s.pos.x; state19[1] = s.pos.y; state19[2] = s.pos.z;
  state19[3] = s.vel.x; state19[4] = s.vel.y; state19[5] = s.vel.z;
  state19[6] = s.rot.w; state19[7] = s.rot.x; state19[8] = s.rot.y;
  state19[9] = s.rot.z;
  state19[10] = s.bg.x; state19[11] = s.bg.y; state19[12] = s.bg.z;
  state19[13] = s.ba.x; state19[14] = s.ba.y; state19[15] = s.ba.z;
  state19[16] = s.gravity.x; state19[17] = s.gravity.y; state19[18] = s.gravity.z;
  std::memcpy(cov324, f.covariance(), 18 * 18 * sizeof(double));
}

// ---------------------------------------------------------------------- ESIKF

void* esikf_create(double gyr_noise, double acc_noise, double gyr_bias_rw,
                   double acc_bias_rw, double range_noise, double bearing_noise,
                   double sigma_gate, int max_iterations) {
  holoagent::EsikfParams p;
  p.gyr_noise = gyr_noise;
  p.acc_noise = acc_noise;
  p.gyr_bias_rw = gyr_bias_rw;
  p.acc_bias_rw = acc_bias_rw;
  p.range_noise = range_noise;
  p.bearing_noise = bearing_noise;
  p.sigma_gate = sigma_gate;
  p.max_iterations = max_iterations;
  return new holoagent::Esikf(p);
}
void esikf_destroy(void* h) { delete static_cast<holoagent::Esikf*>(h); }

void esikf_reset(void* h, const double* state19) {
  ImuState s;
  s.pos = {state19[0], state19[1], state19[2]};
  s.vel = {state19[3], state19[4], state19[5]};
  s.rot = {state19[6], state19[7], state19[8], state19[9]};
  s.bg = {state19[10], state19[11], state19[12]};
  s.ba = {state19[13], state19[14], state19[15]};
  s.gravity = {state19[16], state19[17], state19[18]};
  static_cast<holoagent::Esikf*>(h)->reset(s);
}

void esikf_propagate(void* h, const double* gyro, const double* accel,
                     double dt) {
  static_cast<holoagent::Esikf*>(h)->propagate(
      {gyro[0], gyro[1], gyro[2]}, {accel[0], accel[1], accel[2]}, dt);
}

// out4: used, iterations, rms, ok
void esikf_update_lidar(void* h, void* map_h, const double* pts_body, size_t n,
                        double* out4) {
  auto st = static_cast<holoagent::Esikf*>(h)->update_lidar(
      *static_cast<VoxelPlaneMap*>(map_h), pts_body, n);
  out4[0] = st.used;
  out4[1] = st.iterations;
  out4[2] = st.rms;
  out4[3] = st.ok ? 1.0 : 0.0;
}

// 6-DoF pose measurement update (r9 row-major rotation, p3 position).
int esikf_update_pose(void* h, const double* r9, const double* p3,
                      double att_var, double pos_var) {
  Mat3 r;
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) r(i, j) = r9[i * 3 + j];
  return static_cast<holoagent::Esikf*>(h)->update_pose(
             r, Vec3{p3[0], p3[1], p3[2]}, att_var, pos_var)
             ? 1 : 0;
}

void esikf_get_state(void* h, double* state19, double* cov324) {
  const auto* f = static_cast<holoagent::Esikf*>(h);
  const ImuState& s = f->state();
  state19[0] = s.pos.x; state19[1] = s.pos.y; state19[2] = s.pos.z;
  state19[3] = s.vel.x; state19[4] = s.vel.y; state19[5] = s.vel.z;
  state19[6] = s.rot.w; state19[7] = s.rot.x; state19[8] = s.rot.y;
  state19[9] = s.rot.z;
  state19[10] = s.bg.x; state19[11] = s.bg.y; state19[12] = s.bg.z;
  state19[13] = s.ba.x; state19[14] = s.ba.y; state19[15] = s.ba.z;
  state19[16] = s.gravity.x; state19[17] = s.gravity.y; state19[18] = s.gravity.z;
  if (cov324) std::memcpy(cov324, f->covariance(), 18 * 18 * sizeof(double));
}

// ------------------------------------------------------------ measurement sync

void* msync_create(size_t max_queue) {
  return new holoagent::MeasurementSync(max_queue);
}
void msync_destroy(void* h) { delete static_cast<holoagent::MeasurementSync*>(h); }

void msync_push_imu(void* h, double t, const double* gyro, const double* accel) {
  static_cast<holoagent::MeasurementSync*>(h)->push_imu(
      t, {gyro[0], gyro[1], gyro[2]}, {accel[0], accel[1], accel[2]});
}

void msync_push_sweep(void* h, double t_begin, double duration,
                      const float* xyz, const float* t_offset, size_t n) {
  holoagent::LidarSweep sw;
  sw.t_begin = t_begin;
  sw.duration = duration;
  sw.xyz.assign(xyz, xyz + 3 * n);
  if (t_offset) sw.t_offset.assign(t_offset, t_offset + n);
  else sw.t_offset.assign(n, 0.0f);
  static_cast<holoagent::MeasurementSync*>(h)->push_sweep(std::move(sw));
}

void msync_push_image(void* h, double t, int64_t id) {
  static_cast<holoagent::MeasurementSync*>(h)->push_image(t, id);
}

// Query-only pop: returns n_points (0 = nothing ready). Caller then fetches
// the staged bundle pieces with the msync_bundle_* calls.
static thread_local holoagent::MeasureBundle g_bundle;

size_t msync_pop(void* h, double* t_begin, double* duration, size_t* n_imu,
                 size_t* n_images) {
  g_bundle = static_cast<holoagent::MeasurementSync*>(h)->pop();
  if (!g_bundle.valid) return 0;
  *t_begin = g_bundle.sweep.t_begin;
  *duration = g_bundle.sweep.duration;
  *n_imu = g_bundle.imu.size();
  *n_images = g_bundle.images.size();
  return g_bundle.sweep.xyz.size() / 3;
}

void msync_bundle_points(void* h, float* xyz, float* t_offset) {
  (void)h;
  std::memcpy(xyz, g_bundle.sweep.xyz.data(),
              g_bundle.sweep.xyz.size() * sizeof(float));
  std::memcpy(t_offset, g_bundle.sweep.t_offset.data(),
              g_bundle.sweep.t_offset.size() * sizeof(float));
}

void msync_bundle_imu(void* h, double* t, double* gyro, double* accel) {
  (void)h;
  for (size_t i = 0; i < g_bundle.imu.size(); ++i) {
    t[i] = g_bundle.imu[i].t;
    gyro[3 * i] = g_bundle.imu[i].gyro.x;
    gyro[3 * i + 1] = g_bundle.imu[i].gyro.y;
    gyro[3 * i + 2] = g_bundle.imu[i].gyro.z;
    accel[3 * i] = g_bundle.imu[i].accel.x;
    accel[3 * i + 1] = g_bundle.imu[i].accel.y;
    accel[3 * i + 2] = g_bundle.imu[i].accel.z;
  }
}

void msync_bundle_images(void* h, double* t, int64_t* ids) {
  (void)h;
  for (size_t i = 0; i < g_bundle.images.size(); ++i) {
    t[i] = g_bundle.images[i].t;
    ids[i] = g_bundle.images[i].id;
  }
}

size_t msync_dropped(void* h) {
  return static_cast<holoagent::MeasurementSync*>(h)->dropped();
}

// -------------------------------------------------------------- LiDAR decoding

size_t decode_livox_packet(const uint8_t* raw, size_t n_points,
                           double blind_radius, double max_radius,
                           int point_stride, int n_scans, float* out_xyz,
                           float* out_intensity, float* out_t,
                           uint8_t* out_line) {
  PreprocessParams p;
  p.blind_radius = blind_radius;
  p.max_radius = max_radius;
  p.point_stride = point_stride;
  p.n_scans = n_scans;
  return holoagent::decode_livox(
      reinterpret_cast<const holoagent::LivoxRawPoint*>(raw), n_points, p,
      out_xyz, out_intensity, out_t, out_line);
}

size_t decode_spinning_sweep(const float* xyz, const float* intensity,
                             const uint16_t* ring, const float* t, size_t n,
                             double blind_radius, double max_radius,
                             int point_stride, int n_scans, double spin_hz,
                             float* out_xyz, float* out_intensity, float* out_t,
                             uint8_t* out_line) {
  PreprocessParams p;
  p.blind_radius = blind_radius;
  p.max_radius = max_radius;
  p.point_stride = point_stride;
  p.n_scans = n_scans;
  p.spin_hz = spin_hz;
  return holoagent::decode_spinning(xyz, intensity, ring, t, n, p, out_xyz,
                                    out_intensity, out_t, out_line);
}

void classify_line_features(const float* xyz, const float* t,
                            const uint8_t* line, size_t n, int n_scans,
                            int feature_window, double edge_thresh,
                            double surf_thresh, uint8_t* out_tag) {
  PreprocessParams p;
  p.n_scans = n_scans;
  p.feature_window = feature_window;
  p.edge_thresh = edge_thresh;
  p.surf_thresh = surf_thresh;
  holoagent::classify_features_per_line(xyz, t, line, n, p, out_tag);
}

}  // extern "C"
