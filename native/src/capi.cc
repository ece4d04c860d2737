// C ABI for the host runtime (consumed from Python via ctypes — this image
// ships no pybind11).
#include <cstring>
#include <vector>

#include "holoagent/imu.h"
#include "holoagent/scan_context.h"
#include "holoagent/voxel_plane_map.h"

using holoagent::ImuState;
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

}  // extern "C"
