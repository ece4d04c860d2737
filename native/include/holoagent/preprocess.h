// LiDAR scan preprocessing for the host runtime.
//
// Role of the reference's Preprocess (nav_agent/.../lio_mapping_loc/
// src/preprocess.cpp, include/preprocess.h — Livox Avia/MID360 decoding,
// blind-zone removal, point-stride downsampling, per-point feature
// classification) rebuilt self-contained on plain arrays: the driver-format
// decode stays at the ROS boundary; this layer takes (xyz, intensity,
// t_offset) and produces the filtered, strided, time-ordered sweep the
// odometry consumes, with an optional LOAM-style surface/edge tag from local
// straightness along the scan sequence.
#pragma once

#include <cstddef>
#include <cstdint>

namespace holoagent {

struct PreprocessParams {
  double blind_radius = 0.5;   // drop points closer than this (m)
  double max_radius = 100.0;   // drop points farther than this (m)
  int point_stride = 1;        // keep every k-th surviving point
  int feature_window = 4;      // half-window for the curvature estimate
  double edge_thresh = 0.12;   // curvature above -> edge point (tag 2)
  double surf_thresh = 0.02;   // curvature below -> surface point (tag 1)
};

// Filters in place into the out arrays (caller-allocated, size >= n).
// Returns the number of points kept.  out_tag: 0 none, 1 surface, 2 edge.
size_t preprocess_sweep(const float* xyz, const float* intensity,
                        const float* t_offset, size_t n,
                        const PreprocessParams& p, float* out_xyz,
                        float* out_intensity, float* out_t, uint8_t* out_tag);

}  // namespace holoagent
