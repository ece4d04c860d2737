#include "holoagent/vio.h"

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <string>

namespace holoagent {

namespace {

inline float sample_bilinear(const float* img, int w, int h, double u, double v) {
  int x0 = (int)std::floor(u), y0 = (int)std::floor(v);
  if (x0 < 0 || y0 < 0 || x0 + 1 >= w || y0 + 1 >= h) return -1.0f;
  double ax = u - x0, ay = v - y0;
  const float* r0 = img + y0 * w + x0;
  const float* r1 = r0 + w;
  return (float)((1 - ax) * (1 - ay) * r0[0] + ax * (1 - ay) * r0[1] +
                 (1 - ax) * ay * r1[0] + ax * ay * r1[1]);
}

// Affine warp of the reference source patch into the current view
// (reference vio.cpp getWarpMatrixAffine + warpAffine): the 2x2 Jacobian
// A_cur_ref = d(px_cur)/d(px_ref) is estimated by projecting the reference
// pixel and two axis offsets (at the stored reference depth) into the
// current frame; the 8x8 working patch is then sampled from the 16x16
// source patch through A^{-1}.  Returns false (caller falls back to the
// unwarped patch) when the warp is degenerate or leaves the source patch.
bool warp_patch(const PinholeCam& cam, const VisualPoint& vp, const Mat3& r_cur,
                const Vec3& t_cur, float* out /* kPatch*kPatch */) {
  const double d = 3.0;  // offset in reference pixels for the Jacobian probe
  Mat3 rt_cur = r_cur.transpose();
  auto ref_to_cur = [&](double du, double dv, double* u, double* v) -> bool {
    // backproject (u_ref+du, v_ref+dv) at the reference depth, then project
    Vec3 pc{(vp.u_ref + du - cam.cx) / cam.fx * vp.depth_ref,
            (vp.v_ref + dv - cam.cy) / cam.fy * vp.depth_ref, vp.depth_ref};
    Vec3 pw = vp.r_ref * pc + vp.t_ref;
    Vec3 cc = rt_cur * (pw - t_cur);
    if (cc.z < 0.05) return false;
    *u = cam.fx * cc.x / cc.z + cam.cx;
    *v = cam.fy * cc.y / cc.z + cam.cy;
    return true;
  };
  double u0, v0, ux, vx, uy, vy;
  if (!ref_to_cur(0, 0, &u0, &v0) || !ref_to_cur(d, 0, &ux, &vx) ||
      !ref_to_cur(0, d, &uy, &vy))
    return false;
  // A maps ref-pixel offsets to cur-pixel offsets
  double a00 = (ux - u0) / d, a10 = (vx - v0) / d;
  double a01 = (uy - u0) / d, a11 = (vy - v0) / d;
  double det = a00 * a11 - a01 * a10;
  if (!(std::abs(det) > 0.25 && std::abs(det) < 4.0)) return false;
  // inverse: cur offset -> ref offset
  double i00 = a11 / det, i01 = -a01 / det, i10 = -a10 / det, i11 = a00 / det;
  const double ch = kPatch / 2.0 - 0.5;
  const double sh = kPatchSrc / 2.0 - 0.5;
  for (int py = 0; py < kPatch; ++py)
    for (int px = 0; px < kPatch; ++px) {
      double ox = px - ch, oy = py - ch;
      double su = i00 * ox + i01 * oy + sh;
      double sv = i10 * ox + i11 * oy + sh;
      float val = sample_bilinear(vp.src, kPatchSrc, kPatchSrc, su, sv);
      if (val < 0) return false;
      out[py * kPatch + px] = val;
    }
  return true;
}

// solve SPD n x n via Cholesky; returns false if not PD
bool solve_spd_n(double* h, const double* g, int n, double* out) {
  std::vector<double> l(n * n, 0.0);
  for (int i = 0; i < n; ++i) {
    for (int j = 0; j <= i; ++j) {
      double s = h[i * n + j];
      for (int k = 0; k < j; ++k) s -= l[i * n + k] * l[j * n + k];
      if (i == j) {
        if (s <= 0) return false;
        l[i * n + i] = std::sqrt(s);
      } else {
        l[i * n + j] = s / l[j * n + j];
      }
    }
  }
  std::vector<double> y(n);
  for (int i = 0; i < n; ++i) {
    double s = g[i];
    for (int k = 0; k < i; ++k) s -= l[i * n + k] * y[k];
    y[i] = s / l[i * n + i];
  }
  for (int i = n - 1; i >= 0; --i) {
    double s = y[i];
    for (int k = i + 1; k < n; ++k) s -= l[k * n + i] * out[k];
    out[i] = s / l[i * n + i];
  }
  return true;
}

}  // namespace

VioManager::VioManager(const PinholeCam& cam, double map_cell, int max_per_cell,
                       int grid_cell_px)
    : cam_(cam),
      map_cell_(map_cell),
      max_per_cell_(max_per_cell),
      grid_px_(grid_cell_px) {}

int64_t VioManager::cell_key(const Vec3& p) const {
  const int64_t off = 1 << 20;
  int ix = (int)std::floor(p.x / map_cell_);
  int iy = (int)std::floor(p.y / map_cell_);
  int iz = (int)std::floor(p.z / map_cell_);
  return (((int64_t)(ix + off)) << 42) | (((int64_t)(iy + off)) << 21) |
         (int64_t)(iz + off);
}

VioResult VioManager::process_frame(const float* img, const float* depth,
                                    const Mat3& rot, const Vec3& trans,
                                    int max_iters) {
  ++frame_id_;
  VioResult res;
  res.rot = rot;
  res.trans = trans;

  const int w = cam_.width, h = cam_.height;
  const int gw = (w + grid_px_ - 1) / grid_px_;
  const int gh = (h + grid_px_ - 1) / grid_px_;
  const double half = kPatch / 2.0 - 0.5;

  // ---------------------------------------------------------------- retrieve
  // one visible point per image grid cell (closest wins), like
  // retrieveFromVisualSparseMap's per-cell selection.
  std::vector<int32_t> cell_pick(gw * gh, -1);
  std::vector<double> cell_depth(gw * gh, 1e18);
  {
    Mat3 rt = res.rot.transpose();
    for (size_t i = 0; i < points_.size(); ++i) {
      Vec3 pc = rt * (points_[i].pos - res.trans);
      if (pc.z < 0.1) continue;
      double u = cam_.fx * pc.x / pc.z + cam_.cx;
      double v = cam_.fy * pc.y / pc.z + cam_.cy;
      if (u < kPatch || v < kPatch || u >= w - kPatch || v >= h - kPatch) continue;
      int gc = (int)(v / grid_px_) * gw + (int)(u / grid_px_);
      if (pc.z < cell_depth[gc]) {
        cell_depth[gc] = pc.z;
        cell_pick[gc] = (int32_t)i;
      }
    }
  }
  std::vector<int32_t> tracked;
  for (int gc = 0; gc < gw * gh; ++gc)
    if (cell_pick[gc] >= 0) tracked.push_back(cell_pick[gc]);
  res.n_tracked = (int)tracked.size();

  // ------------------------------------------------- joint GN: pose + (a, b)
  // state: [w(3), dt(3), a, b]; residual per patch pixel:
  //   r = I_cur(proj(p) + offset) - (a * patch_ref + b)
  double a = 1.0, b = 0.0;
  // warp the reference patches into the current view ONCE per frame using
  // the pose prior (reference warps before its EKF iterations too)
  std::vector<float> warped(tracked.size() * kPatch * kPatch);
  std::vector<uint8_t> use_warp(tracked.size(), 0);
  for (size_t ti = 0; ti < tracked.size(); ++ti) {
    if (warp_patch(cam_, points_[tracked[ti]], res.rot, res.trans,
                   warped.data() + ti * kPatch * kPatch)) {
      use_warp[ti] = 1;
      ++res.n_warped;
    }
  }
  if (!tracked.empty()) {
    for (int it = 0; it < max_iters; ++it) {
      double H[64] = {0}, g8[8] = {0};
      double cost = 0;
      int n_res = 0;
      Mat3 rt = res.rot.transpose();
      for (size_t ti = 0; ti < tracked.size(); ++ti) {
        int32_t pi = tracked[ti];
        VisualPoint& vp = points_[pi];
        const float* ref_patch =
            use_warp[ti] ? warped.data() + ti * kPatch * kPatch : vp.patch;
        Vec3 pc = rt * (vp.pos - res.trans);
        if (pc.z < 0.1) continue;
        double iz = 1.0 / pc.z;
        double u = cam_.fx * pc.x * iz + cam_.cx;
        double v = cam_.fy * pc.y * iz + cam_.cy;
        if (u < kPatch || v < kPatch || u >= w - kPatch || v >= h - kPatch)
          continue;
        // du/dpc (2x3), dpc/dw = [pc]_x, dpc/ddt = -I
        double jp[2][3] = {
            {cam_.fx * iz, 0, -cam_.fx * pc.x * iz * iz},
            {0, cam_.fy * iz, -cam_.fy * pc.y * iz * iz},
        };
        double jw[2][3], jt[2][3];
        for (int r2 = 0; r2 < 2; ++r2) {
          // [pc]_x columns: d(pc)/dw_k = e_k x ... using  dpc = [pc]_x w
          jw[r2][0] = jp[r2][1] * pc.z - jp[r2][2] * pc.y;
          jw[r2][1] = jp[r2][2] * pc.x - jp[r2][0] * pc.z;
          jw[r2][2] = jp[r2][0] * pc.y - jp[r2][1] * pc.x;
          for (int c = 0; c < 3; ++c) jt[r2][c] = -jp[r2][c];
        }
        vp.last_seen = frame_id_;
        for (int py = 0; py < kPatch; ++py)
          for (int px = 0; px < kPatch; ++px) {
            double su = u + px - half, sv = v + py - half;
            float cur = sample_bilinear(img, w, h, su, sv);
            if (cur < 0) continue;
            float ref = ref_patch[py * kPatch + px];
            double r = (double)cur - (a * ref + b);
            // image gradient at the sample (central differences)
            float gx1 = sample_bilinear(img, w, h, su + 1, sv);
            float gx0 = sample_bilinear(img, w, h, su - 1, sv);
            float gy1 = sample_bilinear(img, w, h, su, sv + 1);
            float gy0 = sample_bilinear(img, w, h, su, sv - 1);
            if (gx1 < 0 || gx0 < 0 || gy1 < 0 || gy0 < 0) continue;
            double gx = 0.5 * (gx1 - gx0), gy = 0.5 * (gy1 - gy0);
            double jrow[8];
            for (int c = 0; c < 3; ++c) {
              jrow[c] = gx * jw[0][c] + gy * jw[1][c];
              jrow[3 + c] = gx * jt[0][c] + gy * jt[1][c];
            }
            jrow[6] = -(double)ref;  // d r / d a
            jrow[7] = -1.0;          // d r / d b
            // Huber weight
            double wgt = std::abs(r) < 0.1 ? 1.0 : 0.1 / std::abs(r);
            for (int p = 0; p < 8; ++p) {
              g8[p] += wgt * jrow[p] * r;
              for (int q = 0; q < 8; ++q) H[p * 8 + q] += wgt * jrow[p] * jrow[q];
            }
            cost += wgt * r * r;
            ++n_res;
          }
      }
      if (n_res < 32) break;
      // weak prior keeping the brightness model near identity (conditioning
      // only — must stay far below the photometric terms, which are O(n_res))
      H[6 * 8 + 6] += 1.0; g8[6] += 1.0 * (a - 1.0);
      H[7 * 8 + 7] += 1.0; g8[7] += 1.0 * b;
      for (int p = 0; p < 8; ++p) H[p * 8 + p] += 1e-6;
      double xi[8];
      if (!solve_spd_n(H, g8, 8, xi)) break;
      for (int p = 0; p < 8; ++p) xi[p] = -xi[p];
      Quat dq = Quat::from_axis_angle({xi[0], xi[1], xi[2]});
      dq.normalize();
      res.rot = res.rot * dq.to_matrix();
      res.trans = res.trans + res.rot * Vec3{xi[3], xi[4], xi[5]};
      a += xi[6];
      b += xi[7];
      res.rmse = std::sqrt(cost / n_res);
      res.iters = it + 1;
      double s2 = 0;
      for (int p = 0; p < 8; ++p) s2 += xi[p] * xi[p];
      if (s2 < 1e-14) break;
    }
  }
  res.affine_a = a;
  res.affine_b = b;
  // exposure-time chain (reference exposure_estimate_en / inv_expo state):
  // the per-frame gain multiplies into a running relative exposure estimate
  if (res.n_tracked > 0 && a > 0.2 && a < 5.0) exposure_ *= a;
  res.exposure = exposure_;

  // inverse-depth refinement of re-observed points (per-point covariance
  // bookkeeping role of the reference's visual map, include/vio.h:82-210)
  if (depth && !tracked.empty()) refine_depth(depth, res.rot, res.trans, tracked);

  // keyframe history for the COLMAP export (reference colmap_output_en)
  if (record_history_) {
    FrameRec rec;
    rec.rot = res.rot;
    rec.trans = res.trans;
    Mat3 rt = res.rot.transpose();
    for (int32_t pi : tracked) {
      Vec3 pc = rt * (points_[pi].pos - res.trans);
      if (pc.z < 0.1) continue;
      rec.obs.push_back((float)(cam_.fx * pc.x / pc.z + cam_.cx));
      rec.obs.push_back((float)(cam_.fy * pc.y / pc.z + cam_.cy));
      rec.obs.push_back((float)pi);
    }
    history_.push_back(std::move(rec));
  }

  // -------------------------------------------------------------- spawn new
  if (depth) {
    std::vector<bool> cell_used(gw * gh, false);
    {
      Mat3 rt = res.rot.transpose();
      for (int32_t pi : tracked) {
        Vec3 pc = rt * (points_[pi].pos - res.trans);
        if (pc.z < 0.1) continue;
        double u = cam_.fx * pc.x / pc.z + cam_.cx;
        double v = cam_.fy * pc.y / pc.z + cam_.cy;
        if (u < 0 || v < 0 || u >= w || v >= h) continue;
        cell_used[(int)(v / grid_px_) * gw + (int)(u / grid_px_)] = true;
      }
    }
    spawn_points(img, depth, res.rot, res.trans, cell_used, &res);
  }
  return res;
}

void VioManager::spawn_points(const float* img, const float* depth,
                              const Mat3& rot, const Vec3& trans,
                              const std::vector<bool>& cell_used,
                              VioResult* res) {
  const int w = cam_.width, h = cam_.height;
  const int gw = (w + grid_px_ - 1) / grid_px_;
  const int gh = (h + grid_px_ - 1) / grid_px_;
  const double half = kPatch / 2.0 - 0.5;
  for (int gy = 0; gy < gh; ++gy)
    for (int gx = 0; gx < gw; ++gx) {
      if (cell_used[gy * gw + gx]) continue;
      // strongest-gradient pixel in the cell
      int best_x = -1, best_y = -1;
      double best_g = 1e-4;  // squared-gradient floor: skip textureless cells
      int x0 = std::max(gx * grid_px_, kPatch);
      int y0 = std::max(gy * grid_px_, kPatch);
      int x1 = std::min((gx + 1) * grid_px_, w - kPatch);
      int y1 = std::min((gy + 1) * grid_px_, h - kPatch);
      for (int y = y0; y < y1; ++y)
        for (int x = x0; x < x1; ++x) {
          double dx = 0.5 * (img[y * w + x + 1] - img[y * w + x - 1]);
          double dy = 0.5 * (img[(y + 1) * w + x] - img[(y - 1) * w + x]);
          double g = dx * dx + dy * dy;
          if (g > best_g) { best_g = g; best_x = x; best_y = y; }
        }
      if (best_x < 0) continue;
      float z = depth[best_y * w + best_x];
      if (z <= 0.05f || !std::isfinite(z)) continue;
      Vec3 pc{(best_x - cam_.cx) / cam_.fx * z, (best_y - cam_.cy) / cam_.fy * z,
              z};
      VisualPoint vp;
      vp.pos = rot * pc + trans;
      vp.r_ref = rot;
      vp.t_ref = trans;
      vp.u_ref = (float)best_x;
      vp.v_ref = (float)best_y;
      vp.depth_ref = z;
      // inverse-depth prior from the RGB-D noise model (refined on every
      // re-observation by refine_depth)
      {
        double sz = 0.01 + 0.02 * (double)z * z;
        vp.inv_z = 1.0f / z;
        vp.inv_z_var = (float)((sz * sz) / ((double)z * z * z * z));
      }
      vp.last_seen = frame_id_;
      for (int py = 0; py < kPatch; ++py)
        for (int px = 0; px < kPatch; ++px)
          vp.patch[py * kPatch + px] = sample_bilinear(
              img, w, h, best_x + px - half, best_y + py - half);
      const double shalf = kPatchSrc / 2.0 - 0.5;
      for (int py = 0; py < kPatchSrc; ++py)
        for (int px = 0; px < kPatchSrc; ++px) {
          float sv = sample_bilinear(img, w, h, best_x + px - shalf,
                                     best_y + py - shalf);
          vp.src[py * kPatchSrc + px] = sv < 0 ? vp.patch[0] : sv;
        }
      int64_t key = cell_key(vp.pos);
      auto& bucket = cells_[key];
      if ((int)bucket.size() >= max_per_cell_) {
        // LRU: overwrite the stalest point in this voxel in place (LRU map
        // variant, reference generateVisualMapPointsLRU); bucket membership
        // is stable — only the point record changes
        int32_t stalest = bucket[0];
        for (size_t k = 1; k < bucket.size(); ++k)
          if (points_[bucket[k]].last_seen < points_[stalest].last_seen)
            stalest = bucket[k];
        points_[stalest] = vp;
      } else {
        bucket.push_back((int32_t)points_.size());
        points_.push_back(vp);
      }
      ++res->n_spawned;
    }
}

void VioManager::refine_depth(const float* depth, const Mat3& rot,
                              const Vec3& trans,
                              const std::vector<int32_t>& tracked) {
  // Bayesian fusion of inverse depth along each point's REFERENCE ray (the
  // depth-filter role of the reference's per-point covariance): a depth
  // sample at the tracked pixel in the CURRENT view is transformed into the
  // reference camera and fused as a Gaussian in inverse depth; the point's
  // world position moves along the stored reference ray.
  const int w = cam_.width, h = cam_.height;
  Mat3 rt = rot.transpose();
  for (int32_t pi : tracked) {
    VisualPoint& vp = points_[pi];
    Vec3 pc = rt * (vp.pos - trans);
    if (pc.z < 0.1) continue;
    int u = (int)std::lround(cam_.fx * pc.x / pc.z + cam_.cx);
    int v = (int)std::lround(cam_.fy * pc.y / pc.z + cam_.cy);
    if (u < 0 || v < 0 || u >= w || v >= h) continue;
    float zc = depth[v * w + u];
    if (zc <= 0.05f || !std::isfinite(zc)) continue;
    // gate: measured depth must be near the predicted one (else occlusion)
    if (std::abs(zc - pc.z) > 0.25 * pc.z + 0.2) continue;
    // measured world point -> depth along the reference ray
    Vec3 pw = rot * Vec3{(u - cam_.cx) / cam_.fx * zc,
                         (v - cam_.cy) / cam_.fy * zc, (double)zc} +
              trans;
    Vec3 pr = vp.r_ref.transpose() * (pw - vp.t_ref);
    if (pr.z < 0.05) continue;
    // RGB-D noise model sigma_z ~ 0.01 + 0.02 z^2; var(1/z) = sigma_z^2/z^4
    double sz = 0.01 + 0.02 * zc * zc;
    double var_m = (sz * sz) / (pr.z * pr.z * pr.z * pr.z);
    double rho_m = 1.0 / pr.z;
    if (vp.inv_z_var <= 0) {  // first fusion for pre-upgrade points
      vp.inv_z = (float)rho_m;
      vp.inv_z_var = (float)var_m;
    } else {
      double k = vp.inv_z_var / (vp.inv_z_var + var_m);
      vp.inv_z = (float)(vp.inv_z + k * (rho_m - vp.inv_z));
      vp.inv_z_var = (float)((1.0 - k) * vp.inv_z_var);
    }
    ++vp.n_obs;
    // move the point along its reference ray to the fused depth
    double z_ref = 1.0 / vp.inv_z;
    Vec3 ray{(vp.u_ref - cam_.cx) / cam_.fx, (vp.v_ref - cam_.cy) / cam_.fy,
             1.0};
    vp.pos = vp.r_ref * Vec3{ray.x * z_ref, ray.y * z_ref, z_ref} + vp.t_ref;
    vp.depth_ref = (float)z_ref;
  }
}

int VioManager::export_colmap(const char* dir) const {
  // COLMAP text model (reference vio.cpp:127-135 file layout + per-frame
  // image records at :2590-2602): cameras.txt (one PINHOLE camera),
  // images.txt (world-to-camera quaternion per frame + POINTS2D triples),
  // points3D.txt (map points with observation track), poses.txt (TUM).
  std::string base(dir);
  FILE* fc = std::fopen((base + "/cameras.txt").c_str(), "w");
  FILE* fi = std::fopen((base + "/images.txt").c_str(), "w");
  FILE* fp = std::fopen((base + "/points3D.txt").c_str(), "w");
  FILE* ft = std::fopen((base + "/poses.txt").c_str(), "w");
  if (!fc || !fi || !fp || !ft) {
    if (fc) std::fclose(fc);
    if (fi) std::fclose(fi);
    if (fp) std::fclose(fp);
    if (ft) std::fclose(ft);
    return -1;
  }
  std::fprintf(fc, "# Camera list with one line of data per camera:\n");
  std::fprintf(fc, "#   CAMERA_ID, MODEL, WIDTH, HEIGHT, PARAMS[]\n");
  std::fprintf(fc, "1 PINHOLE %d %d %.6f %.6f %.6f %.6f\n", cam_.width,
               cam_.height, cam_.fx, cam_.fy, cam_.cx, cam_.cy);
  std::fprintf(fi, "# Image list with two lines of data per image:\n");
  std::fprintf(fi, "#   IMAGE_ID, QW, QX, QY, QZ, TX, TY, TZ, CAMERA_ID, NAME\n");
  std::fprintf(fi, "#   POINTS2D[] as (X, Y, POINT3D_ID)\n");
  // observation tracks per point for points3D.txt
  std::unordered_map<int32_t, std::vector<int>> tracks;
  for (size_t f = 0; f < history_.size(); ++f) {
    const FrameRec& rec = history_[f];
    // COLMAP stores world->camera: R_wc = R^T, t_wc = -R^T t
    Mat3 rwc = rec.rot.transpose();
    Vec3 twc = rwc * rec.trans;
    twc = Vec3{-twc.x, -twc.y, -twc.z};
    Quat q = Quat::from_matrix(rwc);
    std::fprintf(fi, "%zu %.6f %.6f %.6f %.6f %.6f %.6f %.6f 1 frame_%05zu.png\n",
                 f + 1, q.w, q.x, q.y, q.z, twc.x, twc.y, twc.z, f);
    for (size_t k = 0; k + 2 < rec.obs.size(); k += 3) {
      int32_t pid = (int32_t)rec.obs[k + 2];
      std::fprintf(fi, "%s%.2f %.2f %d", k ? " " : "", rec.obs[k],
                   rec.obs[k + 1], pid + 1);
      tracks[pid].push_back((int)f + 1);
    }
    std::fprintf(fi, "%s\n", rec.obs.empty() ? "0.0 0.0 -1" : "");
    // TUM: tx ty tz qx qy qz qw of camera-to-world (reference poses.txt)
    Quat qc = Quat::from_matrix(rec.rot);
    std::fprintf(ft, "%zu %.6f %.6f %.6f %.6f %.6f %.6f %.6f\n", f,
                 rec.trans.x, rec.trans.y, rec.trans.z, qc.x, qc.y, qc.z, qc.w);
  }
  std::fprintf(fp, "# 3D point list with one line of data per point:\n");
  std::fprintf(fp,
               "#   POINT3D_ID, X, Y, Z, R, G, B, ERROR, TRACK[] as "
               "(IMAGE_ID, POINT2D_IDX)\n");
  for (const auto& kv : tracks) {
    const VisualPoint& vp = points_[kv.first];
    double err = vp.inv_z_var > 0 ? std::sqrt((double)vp.inv_z_var) : 0.0;
    std::fprintf(fp, "%d %.6f %.6f %.6f 128 128 128 %.6f", kv.first + 1,
                 vp.pos.x, vp.pos.y, vp.pos.z, err);
    for (int im : kv.second) std::fprintf(fp, " %d 0", im);
    std::fprintf(fp, "\n");
  }
  int n = (int)history_.size();
  std::fclose(fc);
  std::fclose(fi);
  std::fclose(fp);
  std::fclose(ft);
  return n;
}

}  // namespace holoagent
