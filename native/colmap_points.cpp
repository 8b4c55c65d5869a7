// Fast COLMAP points3D.bin reader (the hot part of scene loading).
//
// Layout per point (little-endian, reconstruction_io.cc):
//   uint64 point3D_id; double xyz[3]; uint8 rgb[3]; double error;
//   uint64 track_len;  { int32 image_id; int32 point2D_idx } * track_len
//
// The record is variable-length (track_len), so numpy can't frombuffer it
// and the pure-Python loop costs minutes at the multi-million points of a
// real MipNeRF-360 reconstruction. This reader memory-maps nothing fancy —
// one sequential pass over a caller-provided buffer, filling caller-provided
// xyz (float32, N x 3) and rgb (float32 in [0,1], N x 3) arrays.
//
// Protocol (ctypes):
//   n = gs_colmap_points_count(buf, len)          // -1 on malformed input
//   ok = gs_colmap_points_read(buf, len, n, xyz, rgb)  // 0 on success

#include <cstdint>
#include <cstring>

namespace {

inline uint64_t rd_u64(const unsigned char* p) {
  uint64_t v;
  std::memcpy(&v, p, 8);
  return v;
}

inline double rd_f64(const unsigned char* p) {
  double v;
  std::memcpy(&v, p, 8);
  return v;
}

// Walk the records; returns the number of complete points, or -1 if the
// buffer is truncated / inconsistent. out_* may be null (count-only pass).
int64_t walk(const unsigned char* buf, int64_t len, int64_t limit,
             float* out_xyz, float* out_rgb) {
  if (len < 8) return -1;
  const uint64_t num = rd_u64(buf);
  int64_t off = 8;
  const int64_t n = (limit >= 0 && (uint64_t)limit < num)
                        ? limit
                        : (int64_t)num;
  for (int64_t i = 0; i < n; ++i) {
    // fixed part: 8 (id) + 24 (xyz) + 3 (rgb) + 8 (error) + 8 (track_len)
    if (off + 51 > len) return -1;
    const unsigned char* p = buf + off;
    if (out_xyz) {
      out_xyz[i * 3 + 0] = (float)rd_f64(p + 8);
      out_xyz[i * 3 + 1] = (float)rd_f64(p + 16);
      out_xyz[i * 3 + 2] = (float)rd_f64(p + 24);
      // divide (not multiply by the reciprocal): bit-identical to the
      // Python fallback's float32 / 255.0
      out_rgb[i * 3 + 0] = (float)p[32] / 255.0f;
      out_rgb[i * 3 + 1] = (float)p[33] / 255.0f;
      out_rgb[i * 3 + 2] = (float)p[34] / 255.0f;
    }
    const uint64_t track_len = rd_u64(p + 43);
    off += 51 + (int64_t)track_len * 8;
    if (off > len) return -1;
  }
  return n;
}

}  // namespace

extern "C" {

int64_t gs_colmap_points_count(const unsigned char* buf, int64_t len) {
  return walk(buf, len, -1, nullptr, nullptr);
}

int gs_colmap_points_read(const unsigned char* buf, int64_t len, int64_t n,
                          float* xyz, float* rgb) {
  return walk(buf, len, n, xyz, rgb) == n ? 0 : 1;
}

}  // extern "C"
