// LiDAR scan preprocessing for the host runtime.
//
// Role of the reference's Preprocess (nav_agent/.../lio_mapping_loc/
// src/preprocess.cpp, include/preprocess.h — Livox Avia/MID360 CustomMsg
// decoding with tag/line filtering, spinning-LiDAR (Velodyne/Ouster-style)
// ring+time decoding with azimuth-based offset recovery, blind-zone removal,
// point-stride downsampling, per-line LOAM feature classification) rebuilt
// self-contained on plain arrays and a packed wire struct.
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
  int n_scans = 6;             // lines/rings kept (reference N_SCANS)
  double spin_hz = 10.0;       // rotation rate for azimuth-offset recovery
};

// Livox CustomMsg point wire layout (livox_ros_driver2 CustomPoint: the
// format the reference's avia_handler consumes).  Packed: 19 bytes.
#pragma pack(push, 1)
struct LivoxRawPoint {
  uint32_t offset_time;  // ns from sweep begin
  float x, y, z;         // metres, sensor frame
  uint8_t reflectivity;
  uint8_t tag;           // bits 4-5: return quality (0b01 = good)
  uint8_t line;          // laser line id
};
#pragma pack(pop)

// Decode a Livox CustomMsg point block: keep good-return points
// ((tag & 0x30) == 0x10, reference preprocess.cpp avia_handler) on lines
// < n_scans, drop zero/blind/far returns, apply the stride, convert
// offset_time to seconds.  Outputs are caller-allocated with size >= n.
// Returns points kept.
size_t decode_livox(const LivoxRawPoint* pts, size_t n,
                    const PreprocessParams& p, float* out_xyz,
                    float* out_intensity, float* out_t, uint8_t* out_line);

// Decode a spinning-LiDAR sweep given per-point ring ids and (optionally)
// per-point relative times.  When t == nullptr the per-point offset is
// recovered from azimuth under a constant spin (reference velodyne_handler's
// omega model).  Returns points kept.
size_t decode_spinning(const float* xyz, const float* intensity,
                       const uint16_t* ring, const float* t, size_t n,
                       const PreprocessParams& p, float* out_xyz,
                       float* out_intensity, float* out_t, uint8_t* out_line);

// Filters in place into the out arrays (caller-allocated, size >= n).
// Returns the number of points kept.  out_tag: 0 none, 1 surface, 2 edge.
size_t preprocess_sweep(const float* xyz, const float* intensity,
                        const float* t_offset, size_t n,
                        const PreprocessParams& p, float* out_xyz,
                        float* out_intensity, float* out_t, uint8_t* out_tag);

// Per-line LOAM-style feature classification (reference give_feature):
// within each line, time-ordered curvature -> surface/edge tags.
void classify_features_per_line(const float* xyz, const float* t,
                                const uint8_t* line, size_t n,
                                const PreprocessParams& p, uint8_t* out_tag);

}  // namespace holoagent
