// Native point-cloud preparation core.
//
// The reference delegates this to per-op CUDA/torch kernels plus python
// loops in the dataset pipeline (mmdet3d/datasets/pipelines/*).  Here the
// whole host-side sample preparation is one fused C++ pass per sweep:
//
//   sensor->lidar rigid transform  (LoadPointsFromMultiSweeps)
//   remove_close ego-return filter
//   global rotate/scale/translate  (GlobalRotScaleTrans, order R->S->T)
//   BEV flips                      (RandomFlip3D)
//   range filter                   (PointsRangeFilter)
//   write into the fixed-capacity output buffer
//
// Compiled as a plain shared object; Python binds via ctypes (calls release
// the GIL, so the prefetch loader's worker threads overlap real work).
//
// All buffers are float32, points are rows of `dims` floats, xyz first,
// channel 4 (if present) receives the time lag.

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Returns the number of points written (<= cap - written_before).
// out is the big [cap, dims] buffer; writing starts at *cursor rows.
int64_t prep_sweep(
    const float* pts, int64_t n, int32_t dims,
    const float* R,            // 3x3 row-major sensor->lidar, or null
    const float* t,            // 3 translation, or null
    float time_lag,            // written to channel 4 when dims >= 5
    float remove_close_radius, // <= 0 disables
    float rot_cos, float rot_sin,  // global z-rotation (points @ Rz)
    float scale,
    int32_t flip_y, int32_t flip_x,
    const float* pc_range,     // [6] xmin ymin zmin xmax ymax zmax; null = off
    float* out, int64_t cap, int64_t* cursor) {
  int64_t written = 0;
  int64_t base = *cursor;
  for (int64_t i = 0; i < n; ++i) {
    if (base + written >= cap) break;
    const float* p = pts + i * dims;
    float x = p[0], y = p[1], z = p[2];
    if (R != nullptr) {
      float nx = R[0] * x + R[1] * y + R[2] * z;
      float ny = R[3] * x + R[4] * y + R[5] * z;
      float nz = R[6] * x + R[7] * y + R[8] * z;
      x = nx + t[0];
      y = ny + t[1];
      z = nz + t[2];
    }
    if (remove_close_radius > 0 &&
        std::fabs(p[0]) < remove_close_radius &&
        std::fabs(p[1]) < remove_close_radius) {
      continue;  // test is on the *sensor-frame* coords like the reference
    }
    // global augmentation: rotate about +z (points @ Rz with
    // Rz = [[c, s], [-s, c]] like mmdet3d), scale, then flips
    float rx = rot_cos * x - rot_sin * y;
    float ry = rot_sin * x + rot_cos * y;
    x = rx * scale;
    y = ry * scale;
    z = z * scale;
    if (flip_y) y = -y;
    if (flip_x) x = -x;
    if (pc_range != nullptr) {
      if (x < pc_range[0] || x >= pc_range[3] || y < pc_range[1] ||
          y >= pc_range[4] || z < pc_range[2] || z >= pc_range[5]) {
        continue;
      }
    }
    float* o = out + (base + written) * dims;
    o[0] = x;
    o[1] = y;
    o[2] = z;
    for (int32_t c = 3; c < dims; ++c) o[c] = p[c];
    if (dims >= 5) o[4] = time_lag;
    ++written;
  }
  *cursor = base + written;
  return written;
}

// Fisher-Yates shuffle of [n, dims] float rows with xorshift64 PRNG.
void shuffle_rows(float* pts, int64_t n, int32_t dims, uint64_t seed) {
  uint64_t s = seed ? seed : 0x9e3779b97f4a7c15ull;
  float tmp[16];
  for (int64_t i = n - 1; i > 0; --i) {
    s ^= s << 13;
    s ^= s >> 7;
    s ^= s << 17;
    int64_t j = (int64_t)(s % (uint64_t)(i + 1));
    if (j == i) continue;
    std::memcpy(tmp, pts + i * dims, sizeof(float) * dims);
    std::memcpy(pts + i * dims, pts + j * dims, sizeof(float) * dims);
    std::memcpy(pts + j * dims, tmp, sizeof(float) * dims);
  }
}

}  // extern "C"
