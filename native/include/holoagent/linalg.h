// Minimal self-contained linear algebra for the host runtime (this image
// ships no Eigen/PCL; SURVEY.md §2.2 components are rebuilt on this header).
#pragma once

#include <array>
#include <cmath>
#include <cstddef>

namespace holoagent {

struct Vec3 {
  double x = 0, y = 0, z = 0;
  Vec3() = default;
  Vec3(double x_, double y_, double z_) : x(x_), y(y_), z(z_) {}
  Vec3 operator+(const Vec3& o) const { return {x + o.x, y + o.y, z + o.z}; }
  Vec3 operator-(const Vec3& o) const { return {x - o.x, y - o.y, z - o.z}; }
  Vec3 operator*(double s) const { return {x * s, y * s, z * s}; }
  double dot(const Vec3& o) const { return x * o.x + y * o.y + z * o.z; }
  Vec3 cross(const Vec3& o) const {
    return {y * o.z - z * o.y, z * o.x - x * o.z, x * o.y - y * o.x};
  }
  double norm() const { return std::sqrt(dot(*this)); }
  Vec3 normalized() const {
    double n = norm();
    return n > 1e-12 ? (*this) * (1.0 / n) : Vec3{0, 0, 0};
  }
};

struct Mat3 {
  // row-major
  std::array<double, 9> m{};
  static Mat3 identity() {
    Mat3 r;
    r.m = {1, 0, 0, 0, 1, 0, 0, 0, 1};
    return r;
  }
  double& operator()(int r, int c) { return m[r * 3 + c]; }
  double operator()(int r, int c) const { return m[r * 3 + c]; }
  Vec3 operator*(const Vec3& v) const {
    return {m[0] * v.x + m[1] * v.y + m[2] * v.z,
            m[3] * v.x + m[4] * v.y + m[5] * v.z,
            m[6] * v.x + m[7] * v.y + m[8] * v.z};
  }
  Mat3 operator*(const Mat3& o) const {
    Mat3 r;
    for (int i = 0; i < 3; ++i)
      for (int j = 0; j < 3; ++j) {
        double s = 0;
        for (int k = 0; k < 3; ++k) s += (*this)(i, k) * o(k, j);
        r(i, j) = s;
      }
    return r;
  }
  Mat3 transpose() const {
    Mat3 r;
    for (int i = 0; i < 3; ++i)
      for (int j = 0; j < 3; ++j) r(i, j) = (*this)(j, i);
    return r;
  }
};

struct Quat {  // w, x, y, z
  double w = 1, x = 0, y = 0, z = 0;
  Quat() = default;
  Quat(double w_, double x_, double y_, double z_) : w(w_), x(x_), y(y_), z(z_) {}
  Quat operator*(const Quat& o) const {
    return {w * o.w - x * o.x - y * o.y - z * o.z,
            w * o.x + x * o.w + y * o.z - z * o.y,
            w * o.y - x * o.z + y * o.w + z * o.x,
            w * o.z + x * o.y - y * o.x + z * o.w};
  }
  void normalize() {
    double n = std::sqrt(w * w + x * x + y * y + z * z);
    if (n > 1e-12) { w /= n; x /= n; y /= n; z /= n; }
  }
  Mat3 to_matrix() const {
    Mat3 r;
    r.m = {1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w),
           2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w),
           2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)};
    return r;
  }
  static Quat from_axis_angle(const Vec3& w_vec) {
    double theta = w_vec.norm();
    if (theta < 1e-12) return {1, w_vec.x / 2, w_vec.y / 2, w_vec.z / 2};
    double s = std::sin(theta / 2) / theta;
    return {std::cos(theta / 2), w_vec.x * s, w_vec.y * s, w_vec.z * s};
  }
  static Quat from_matrix(const Mat3& r) {
    // Shepperd's method: pick the largest diagonal combination
    double tr = r(0, 0) + r(1, 1) + r(2, 2);
    Quat q;
    if (tr > 0) {
      double s = std::sqrt(tr + 1.0) * 2;
      q = {0.25 * s, (r(2, 1) - r(1, 2)) / s, (r(0, 2) - r(2, 0)) / s,
           (r(1, 0) - r(0, 1)) / s};
    } else if (r(0, 0) > r(1, 1) && r(0, 0) > r(2, 2)) {
      double s = std::sqrt(1.0 + r(0, 0) - r(1, 1) - r(2, 2)) * 2;
      q = {(r(2, 1) - r(1, 2)) / s, 0.25 * s, (r(0, 1) + r(1, 0)) / s,
           (r(0, 2) + r(2, 0)) / s};
    } else if (r(1, 1) > r(2, 2)) {
      double s = std::sqrt(1.0 + r(1, 1) - r(0, 0) - r(2, 2)) * 2;
      q = {(r(0, 2) - r(2, 0)) / s, (r(0, 1) + r(1, 0)) / s, 0.25 * s,
           (r(1, 2) + r(2, 1)) / s};
    } else {
      double s = std::sqrt(1.0 + r(2, 2) - r(0, 0) - r(1, 1)) * 2;
      q = {(r(1, 0) - r(0, 1)) / s, (r(0, 2) + r(2, 0)) / s,
           (r(1, 2) + r(2, 1)) / s, 0.25 * s};
    }
    q.normalize();
    return q;
  }
};

// Cyclic Jacobi eigen-decomposition of a symmetric 3x3 matrix.
// Outputs eigenvalues ascending + matching eigenvectors (columns of V).
inline void sym_eigen3(const Mat3& a_in, double eigvals[3], Mat3& eigvecs) {
  Mat3 a = a_in;
  Mat3 v = Mat3::identity();
  for (int sweep = 0; sweep < 24; ++sweep) {
    double off = std::abs(a(0, 1)) + std::abs(a(0, 2)) + std::abs(a(1, 2));
    if (off < 1e-14) break;
    for (int p = 0; p < 2; ++p)
      for (int q = p + 1; q < 3; ++q) {
        if (std::abs(a(p, q)) < 1e-18) continue;
        double theta = (a(q, q) - a(p, p)) / (2 * a(p, q));
        double t = (theta >= 0 ? 1.0 : -1.0) /
                   (std::abs(theta) + std::sqrt(theta * theta + 1));
        double c = 1.0 / std::sqrt(t * t + 1), s = t * c;
        Mat3 r = Mat3::identity();
        r(p, p) = c; r(q, q) = c; r(p, q) = s; r(q, p) = -s;
        a = r.transpose() * a * r;
        v = v * r;
      }
  }
  int order[3] = {0, 1, 2};
  double d[3] = {a(0, 0), a(1, 1), a(2, 2)};
  for (int i = 0; i < 3; ++i)
    for (int j = i + 1; j < 3; ++j)
      if (d[order[j]] < d[order[i]]) std::swap(order[i], order[j]);
  Mat3 vs;
  for (int i = 0; i < 3; ++i) {
    eigvals[i] = d[order[i]];
    for (int r = 0; r < 3; ++r) vs(r, i) = v(r, order[i]);
  }
  eigvecs = vs;
}

// Solve a symmetric positive-definite 6x6 system in-place (Cholesky).
inline bool solve_spd6(double h[36], const double g[6], double out[6]) {
  double l[36] = {0};
  for (int i = 0; i < 6; ++i) {
    for (int j = 0; j <= i; ++j) {
      double s = h[i * 6 + j];
      for (int k = 0; k < j; ++k) s -= l[i * 6 + k] * l[j * 6 + k];
      if (i == j) {
        if (s <= 0) return false;
        l[i * 6 + i] = std::sqrt(s);
      } else {
        l[i * 6 + j] = s / l[j * 6 + j];
      }
    }
  }
  double y[6];
  for (int i = 0; i < 6; ++i) {
    double s = g[i];
    for (int k = 0; k < i; ++k) s -= l[i * 6 + k] * y[k];
    y[i] = s / l[i * 6 + i];
  }
  for (int i = 5; i >= 0; --i) {
    double s = y[i];
    for (int k = i + 1; k < 6; ++k) s -= l[k * 6 + i] * out[k];
    out[i] = s / l[i * 6 + i];
  }
  return true;
}

// In-place Cholesky lower factor of a symmetric positive-definite n x n
// matrix (row-major). Returns false when not SPD.
inline bool cholesky_n(double* a, int n) {
  for (int i = 0; i < n; ++i) {
    for (int j = 0; j <= i; ++j) {
      double s = a[i * n + j];
      for (int k = 0; k < j; ++k) s -= a[i * n + k] * a[j * n + k];
      if (i == j) {
        if (s <= 0) return false;
        a[i * n + i] = std::sqrt(s);
      } else {
        a[i * n + j] = s / a[j * n + j];
      }
    }
    for (int j = i + 1; j < n; ++j) a[i * n + j] = 0;
  }
  return true;
}

// Solve L L^T x = b given the Cholesky lower factor L (from cholesky_n).
inline void cholesky_solve(const double* l, const double* b, double* x, int n) {
  for (int i = 0; i < n; ++i) {
    double s = b[i];
    for (int k = 0; k < i; ++k) s -= l[i * n + k] * x[k];
    x[i] = s / l[i * n + i];
  }
  for (int i = n - 1; i >= 0; --i) {
    double s = x[i];
    for (int k = i + 1; k < n; ++k) s -= l[k * n + i] * x[k];
    x[i] = s / l[i * n + i];
  }
}

// Invert a symmetric positive-definite n x n matrix via Cholesky; `a` is
// destroyed (becomes the factor). Returns false when not SPD.
inline bool invert_spd_n(double* a, double* inv, int n) {
  if (!cholesky_n(a, n)) return false;
  for (int c = 0; c < n; ++c) {
    double e[64] = {0};  // n <= 64 in this runtime
    e[c] = 1.0;
    double col[64];
    cholesky_solve(a, e, col, n);
    for (int r = 0; r < n; ++r) inv[r * n + c] = col[r];
  }
  return true;
}

}  // namespace holoagent
