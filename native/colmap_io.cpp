// Fast COLMAP binary serialization (C, exposed via ctypes).
//
// The reference depends on pycolmap's C++ Reconstruction for model IO; our
// framework's own reader/writer (vggsfm_tpu/io/colmap.py) is pure Python,
// which loops per image/point and becomes the bottleneck when exporting the
// video pipeline's 100k+-point maps. This native module serializes the
// hot sections (images.bin observation blocks, points3D.bin track blocks)
// from packed numpy buffers in one pass.
//
// Format reference: the public COLMAP sparse-model spec (same layout the
// Python writer documents in vggsfm_tpu/io/colmap.py).
//
// Build: see native/build.sh (plain g++ -shared; loaded with ctypes).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// Serialize the observation block of one image:
//   u64 n, then n * (f64 x, f64 y, i64 point3D_id)
// xy: (n, 2) float64, ids: (n,) int64. Returns bytes written.
int64_t colmap_pack_observations(const double* xy, const int64_t* ids,
                                 int64_t n, uint8_t* out) {
    uint8_t* p = out;
    std::memcpy(p, &n, 8);
    p += 8;
    for (int64_t i = 0; i < n; ++i) {
        std::memcpy(p, xy + 2 * i, 16);
        p += 16;
        std::memcpy(p, ids + i, 8);
        p += 8;
    }
    return p - out;
}

// Serialize one points3D.bin record:
//   u64 id, f64 xyz[3], u8 rgb[3], f64 error, u64 track_len,
//   track_len * (i32 image_id, i32 point2D_idx)
int64_t colmap_pack_point3d(uint64_t id, const double* xyz,
                            const uint8_t* rgb, double error,
                            const int32_t* image_ids,
                            const int32_t* point2d_idxs, int64_t track_len,
                            uint8_t* out) {
    uint8_t* p = out;
    std::memcpy(p, &id, 8);
    p += 8;
    std::memcpy(p, xyz, 24);
    p += 24;
    std::memcpy(p, rgb, 3);
    p += 3;
    std::memcpy(p, &error, 8);
    p += 8;
    uint64_t n = static_cast<uint64_t>(track_len);
    std::memcpy(p, &n, 8);
    p += 8;
    for (int64_t i = 0; i < track_len; ++i) {
        std::memcpy(p, image_ids + i, 4);
        p += 4;
        std::memcpy(p, point2d_idxs + i, 4);
        p += 4;
    }
    return p - out;
}

// Batch-serialize all points3D records. Inputs are flat arrays with
// per-point track offsets (CSR-style):
//   ids (P,), xyz (P,3), rgb (P,3) u8, errors (P,),
//   track_offsets (P+1,), track_image_ids / track_p2d_idxs (total_obs,).
// Returns bytes written to out (caller sizes it as
// P * 51 + total_obs * 8 + 8 for the header written by the caller).
int64_t colmap_pack_points3d_batch(const uint64_t* ids, const double* xyz,
                                   const uint8_t* rgb, const double* errors,
                                   const int64_t* track_offsets,
                                   const int32_t* track_image_ids,
                                   const int32_t* track_p2d_idxs,
                                   int64_t num_points, uint8_t* out) {
    uint8_t* p = out;
    for (int64_t j = 0; j < num_points; ++j) {
        int64_t lo = track_offsets[j];
        int64_t hi = track_offsets[j + 1];
        p += colmap_pack_point3d(ids[j], xyz + 3 * j, rgb + 3 * j,
                                 errors[j], track_image_ids + lo,
                                 track_p2d_idxs + lo, hi - lo, p);
    }
    return p - out;
}

// Parse the observation block of one image (inverse of pack):
// returns number of observations read; fills xy (n,2) and ids (n,)
// capped at cap.
int64_t colmap_unpack_observations(const uint8_t* buf, double* xy,
                                   int64_t* ids, int64_t cap) {
    const uint8_t* p = buf;
    uint64_t n;
    std::memcpy(&n, p, 8);
    p += 8;
    int64_t m = static_cast<int64_t>(n) < cap ? static_cast<int64_t>(n)
                                              : cap;
    for (int64_t i = 0; i < m; ++i) {
        std::memcpy(xy + 2 * i, p, 16);
        p += 16;
        std::memcpy(ids + i, p, 8);
        p += 8;
    }
    return m;
}

}  // extern "C"
