// Native COLMAP binary parsers — the host-side IO hot path.
//
// The reference links CUDA/C++ for its compute; on TPU the compute lives
// in Pallas/XLA and the native need shifts to the *data plane*: COLMAP
// points3D.bin files for large scenes hold millions of variable-length
// records, and a Python struct loop takes tens of seconds where this
// single-pass C++ parser takes tens of milliseconds.  Exposed with a
// plain C ABI for ctypes (no pybind11 in this environment).
//
// Format (https://colmap.github.io/format.html#points3d-bin):
//   uint64 num_points
//   per point: uint64 id; double xyz[3]; uint8 rgb[3]; double error;
//              uint64 track_len; { uint32 image_id; uint32 point2d_idx; }*
//
// images.bin:
//   uint64 num_images
//   per image: int32 id; double qvec[4]; double tvec[3]; int32 camera_id;
//              char name[] (NUL-terminated);
//              uint64 num_points2d; { double x, y; uint64 point3d_id; }*

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct File {
  FILE* f;
  explicit File(const char* path) { f = std::fopen(path, "rb"); }
  ~File() { if (f) std::fclose(f); }
  bool ok() const { return f != nullptr; }
  bool read(void* dst, size_t n) { return std::fread(dst, 1, n, f) == n; }
  bool skip(long n) { return std::fseek(f, n, SEEK_CUR) == 0; }
};

}  // namespace

extern "C" {

// Returns the number of points, or -1 on error.
long long colmap_count_points3d(const char* path) {
  File file(path);
  if (!file.ok()) return -1;
  uint64_t n = 0;
  if (!file.read(&n, 8)) return -1;
  return static_cast<long long>(n);
}

// Fills xyz (n*3 f32), rgb (n*3 u8), err (n f64).  Returns number of
// points read, or -1 on error.
long long colmap_read_points3d(const char* path, float* xyz, uint8_t* rgb,
                               double* err) {
  File file(path);
  if (!file.ok()) return -1;
  uint64_t n = 0;
  if (!file.read(&n, 8)) return -1;

  // Buffered sequential parse: read the fixed 51-byte head of each
  // record in one go, then skip the variable-length track.
  struct __attribute__((packed)) Head {
    uint64_t id;
    double xyz[3];
    uint8_t rgb[3];
    double error;
    uint64_t track_len;
  };
  static_assert(sizeof(Head) == 51, "packed COLMAP point3D head");

  for (uint64_t i = 0; i < n; ++i) {
    Head h;
    if (!file.read(&h, sizeof(h))) return -1;
    xyz[i * 3 + 0] = static_cast<float>(h.xyz[0]);
    xyz[i * 3 + 1] = static_cast<float>(h.xyz[1]);
    xyz[i * 3 + 2] = static_cast<float>(h.xyz[2]);
    std::memcpy(rgb + i * 3, h.rgb, 3);
    err[i] = h.error;
    if (!file.skip(static_cast<long>(h.track_len) * 8)) return -1;
  }
  return static_cast<long long>(n);
}

// Counts images, or -1 on error.
long long colmap_count_images(const char* path) {
  File file(path);
  if (!file.ok()) return -1;
  uint64_t n = 0;
  if (!file.read(&n, 8)) return -1;
  return static_cast<long long>(n);
}

// Fills ids (n i32), qvec (n*4 f64), tvec (n*3 f64), camera_ids (n i32)
// and names (n * name_cap bytes, NUL-padded).  Returns images read or -1.
long long colmap_read_images(const char* path, int32_t* ids, double* qvec,
                             double* tvec, int32_t* camera_ids, char* names,
                             long long name_cap) {
  File file(path);
  if (!file.ok()) return -1;
  uint64_t n = 0;
  if (!file.read(&n, 8)) return -1;
  for (uint64_t i = 0; i < n; ++i) {
    if (!file.read(&ids[i], 4)) return -1;
    if (!file.read(qvec + i * 4, 32)) return -1;
    if (!file.read(tvec + i * 3, 24)) return -1;
    if (!file.read(&camera_ids[i], 4)) return -1;
    char* dst = names + i * name_cap;
    long long j = 0;
    for (;;) {
      char c;
      if (!file.read(&c, 1)) return -1;
      if (j < name_cap - 1) dst[j++] = c;
      if (c == '\0') break;
    }
    dst[name_cap - 1] = '\0';
    uint64_t npts = 0;
    if (!file.read(&npts, 8)) return -1;
    if (!file.skip(static_cast<long>(npts) * 24)) return -1;
  }
  return static_cast<long long>(n);
}

}  // extern "C"
