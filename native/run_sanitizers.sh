#!/bin/bash
# Exercise the native runtime under AddressSanitizer (role of the reference's
# navigation2-humble/tools/run_sanitizers CI step).  Builds the instrumented
# library and drives every C-API family through a small C++ harness (the
# Python test suite can't host ASan without LD_PRELOAD games on this image).
set -euo pipefail
cd "$(dirname "$0")"
make asan >/dev/null

cat > build-asan/sanity_main.cc <<'EOF'
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <vector>
extern "C" {
void* sc_create(int, int, double);
void sc_destroy(void*);
void sc_make_descriptor(void*, const double*, size_t, double*);
void sc_add_keyframe(void*, const double*);
int sc_detect_loop(void*, const double*, double*, double*, int, double);
void* reg_index_create(const double*, size_t, double);
void reg_index_destroy(void*);
double reg_register(void*, const double*, size_t, int, int, double, int, double*, double*);
size_t pp_sweep(const float*, const float*, const float*, size_t, double, double,
                int, int, double, double, float*, float*, float*, unsigned char*);
void* pg_create();
void pg_destroy(void*);
int pg_add_node(void*, const double*);
void pg_add_prior(void*, int, const double*, double, double);
void pg_add_between(void*, int, int, const double*, double, double, int);
double pg_optimize(void*, int);
void pg_get_pose(void*, int, double*);
void* vio_create(int, int, double, double, double, double, double, int, int);
void vio_destroy(void*);
void vio_process(void*, const float*, const float*, double*, int, double*);
int vio_export_colmap(void*, const char*);
void imu_init_static(const double*, const double*, size_t, double*);
void imu_propagate_c(double*, const double*, const double*, const double*, size_t, double*);
void* lio_create(double, int, double, double, double, double, int, double, int);
void lio_destroy(void*);
void lio_init_static(void*, const double*, const double*, size_t);
void lio_process(void*, const float*, const float*, size_t, const double*,
                 const double*, const double*, size_t, double, double*);
void lio_enable_vio(void*, int, int, double, double, double, double,
                    const double*, const double*, double, int, int);
void lio_process_image(void*, const float*, const float*, size_t,
                       const double*, const double*, const double*, size_t,
                       double, const float*, const float*, double*, double*);
size_t lio_num_keyframes(void*);
void lio_keyframe_pose(void*, int, double*);
int wheel_update(double*, const double*, double, double, double);
int zupt_update(double*, double, double, double, double);
void ground_update(double*, double, double);
int ground_estimate(const double*, size_t, double, double*);
}

int main() {
  // scan context
  std::vector<double> pts(3 * 500);
  for (int i = 0; i < 500; ++i) {
    double a = i * 0.0126;
    pts[3 * i] = 10 * std::cos(a); pts[3 * i + 1] = 10 * std::sin(a);
    pts[3 * i + 2] = (i % 7) * 0.3;
  }
  void* sc = sc_create(20, 60, 40.0);
  std::vector<double> d(20 * 60);
  sc_make_descriptor(sc, pts.data(), 500, d.data());
  sc_add_keyframe(sc, d.data());
  double yaw, dist;
  sc_detect_loop(sc, d.data(), &yaw, &dist, 0, 0.5);
  sc_destroy(sc);
  // registration
  void* idx = reg_index_create(pts.data(), 500, 0.8);
  double pose[16] = {1,0,0,0, 0,1,0,0, 0,0,1,0, 0,0,0,1};
  double frac;
  reg_register(idx, pts.data(), 500, 2, 10, 1.0, 1, pose, &frac);
  reg_index_destroy(idx);
  // preprocess
  std::vector<float> xyz(3 * 400), inten(400), toff(400), oxyz(3 * 400), oi(400), ot(400);
  std::vector<unsigned char> tag(400);
  for (int i = 0; i < 400; ++i) {
    xyz[3 * i] = 5 + 0.01f * i; xyz[3 * i + 1] = 1; xyz[3 * i + 2] = 0;
    inten[i] = i; toff[i] = 0.001f * (400 - i);
  }
  pp_sweep(xyz.data(), inten.data(), toff.data(), 400, 0.5, 100.0, 2, 4,
           0.12, 0.02, oxyz.data(), oi.data(), ot.data(), tag.data());
  // pose graph
  void* pg = pg_create();
  double p0[16] = {1,0,0,0, 0,1,0,0, 0,0,1,0, 0,0,0,1};
  double p1[16] = {1,0,0,1, 0,1,0,0, 0,0,1,0, 0,0,0,1};
  int a = pg_add_node(pg, p0), b = pg_add_node(pg, p1);
  pg_add_prior(pg, a, p0, 1e4, 1e4);
  pg_add_between(pg, a, b, p1, 100, 100, 1);
  pg_optimize(pg, 10);
  double out[16];
  pg_get_pose(pg, b, out);
  pg_destroy(pg);
  // vio
  void* vio = vio_create(64, 48, 50, 50, 31.5, 23.5, 0.5, 8, 16);
  std::vector<float> img(64 * 48), dep(64 * 48, 2.0f);
  for (int i = 0; i < 64 * 48; ++i) img[i] = 0.5f + 0.3f * std::sin(i * 0.37f);
  double vp[16] = {1,0,0,0, 0,1,0,0, 0,0,1,2, 0,0,0,1};
  double stats[8];
  vio_process(vio, img.data(), dep.data(), vp, 8, stats);
  vio_process(vio, img.data(), nullptr, vp, 8, stats);
  vio_process(vio, img.data(), dep.data(), vp, 8, stats);  // depth refinement
  if (vio_export_colmap(vio, "/tmp/asan_colmap") < 0) { std::printf("colmap export failed\n"); return 1; }
  vio_destroy(vio);
  // imu
  {
    std::vector<double> g2(30, 1e-4), a2(30);
    for (int i = 0; i < 10; ++i) { a2[3*i] = 0; a2[3*i+1] = 0; a2[3*i+2] = 9.81; }
    double st17[17];
    imu_init_static(g2.data(), a2.data(), 10, st17);
    std::vector<double> dt2(10, 0.01), poses(10 * 7);
    imu_propagate_c(st17, g2.data(), a2.data(), dt2.data(), 10, poses.data());
  }
  // lio pipeline (incl. out-of-range keyframe_pose defensive path)
  {
    void* lio = lio_create(0.5, 6, 0.1, 0.5, 0.2, 100.0, 1, 0.25, 3);
    std::vector<double> g2(30, 1e-4), a2(30, 0.0), dt2(10, 0.01);
    for (int i = 0; i < 10; ++i) a2[3*i+2] = 9.81;
    lio_init_static(lio, g2.data(), a2.data(), 10);
    std::vector<float> scan(3 * 600), st2(600, 0.0f);
    for (int i = 0; i < 600; ++i) {
      double ang2 = i * 0.0105;
      scan[3*i] = (float)(6 * std::cos(ang2));
      scan[3*i+1] = (float)(6 * std::sin(ang2));
      scan[3*i+2] = (float)((i % 5) * 0.3);
    }
    double out24[24];
    lio_process(lio, scan.data(), st2.data(), 600, g2.data(), a2.data(),
                dt2.data(), 10, 0.1, out24);
    lio_process(lio, scan.data(), st2.data(), 600, nullptr, nullptr, nullptr,
                0, 0.1, out24);
    double kf16[16];
    lio_keyframe_pose(lio, 99, kf16);  // out-of-range -> identity, no UB
    if (lio_num_keyframes(lio) > 0) lio_keyframe_pose(lio, 0, kf16);
    // LIVO branch: attach a camera, run the fused step (pose update + warp)
    double rcb[9] = {1,0,0, 0,-1,0, 0,0,-1}, tcb[3] = {0,0,0};
    lio_enable_vio(lio, 64, 48, 50, 50, 31.5, 23.5, rcb, tcb, 0.5, 8, 16);
    std::vector<float> img2(64 * 48), dep2(64 * 48, 2.0f);
    for (int i = 0; i < 64 * 48; ++i) img2[i] = 0.5f + 0.3f * std::sin(i * 0.53f);
    double vst8[8];
    lio_process_image(lio, scan.data(), st2.data(), 600, g2.data(), a2.data(),
                      dt2.data(), 10, 0.1, img2.data(), dep2.data(), out24, vst8);
    lio_process_image(lio, scan.data(), st2.data(), 600, nullptr, nullptr,
                      nullptr, 0, 0.1, img2.data(), nullptr, out24, vst8);
    lio_destroy(lio);
  }
  // constraints
  double st[17] = {0,0,0, 0.1,0,0, 0, 0.25,0,0, 0,0.25,0, 0,0,0.25, 0.05};
  double wv[3] = {0.1, 0.0, 0.0};
  wheel_update(st, wv, 0.04, 9.0, 4.0);
  zupt_update(st, 0.01, 0.001, 0.08, 0.02);
  ground_update(st, 0.0, 0.02);
  double gz;
  ground_estimate(pts.data(), 500, 0.3, &gz);
  std::puts("sanitizer harness ok");
  return 0;
}
EOF
g++ -O1 -g -std=c++17 -fsanitize=address -fno-omit-frame-pointer -Iinclude \
    build-asan/sanity_main.cc \
    src/*.cc \
    -o build-asan/sanity
./build-asan/sanity
echo "ASan: clean"
