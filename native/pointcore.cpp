// pointcore: native host-side core for the data-loading hot path.
//
// The TPU-native counterpart of the reference's host C++ layer
// (third_party/csrc host code + the per-sample python/numpy pipeline the
// reference runs in its dataset workers). The jitted XLA program owns all
// device compute; this library owns the per-sample host work that feeds it:
//
//   * dedup_first      — first-occurrence voxel dedup (torchsparse
//                        sparse_quantize semantics) via open-addressing
//                        hashing: O(N) vs numpy's O(N log N) sort-unique.
//   * transform_points — 4x4 homogeneous pose-chain application (multisweep
//                        aggregation, camera chains).
//   * remap_labels     — LUT label remapping.
//   * box_occupancy    — AABB occupancy counting split into thing/other
//                        classes (instance-aug rejection tests).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

inline uint64_t splitmix64(uint64_t x) {
  x += 0x9e3779b97f4a7c15ULL;
  x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ULL;
  x = (x ^ (x >> 27)) * 0x94d049bb133111ebULL;
  return x ^ (x >> 31);
}

inline uint64_t pack_coord(const int32_t* c) {
  // exact packing: 21 bits per axis, bias 2^20 (same contract as the JAX
  // side: coords must fit in +-2^20)
  const uint64_t bias = 1u << 20;
  uint64_t x = (uint64_t)(int64_t)(c[0] + (int64_t)bias) & 0x1FFFFF;
  uint64_t y = (uint64_t)(int64_t)(c[1] + (int64_t)bias) & 0x1FFFFF;
  uint64_t z = (uint64_t)(int64_t)(c[2] + (int64_t)bias) & 0x1FFFFF;
  return (x << 42) | (y << 21) | z;
}

}  // namespace

extern "C" {

// First-occurrence dedup of [n, 3] int32 voxel coords.
// inds_out: caller-allocated [n] int32 — first-occurrence row per unique
// voxel in scan order (only the first `return value` entries are valid).
// inverse_out: caller-allocated [n] int32 — for every row, the position of
// its representative within inds_out.
// Returns the number of unique voxels.
int64_t dedup_first(const int32_t* voxel, int64_t n, int32_t* inds_out,
                    int32_t* inverse_out) {
  if (n <= 0) return 0;
  // open addressing, capacity = next pow2 >= 2n
  uint64_t cap = 1;
  while (cap < (uint64_t)(2 * n)) cap <<= 1;
  const uint64_t mask = cap - 1;
  std::vector<uint64_t> keys(cap, ~0ULL);
  std::vector<int32_t> slot_uid(cap, -1);
  int64_t n_unique = 0;
  for (int64_t i = 0; i < n; ++i) {
    const uint64_t key = pack_coord(voxel + 3 * i);
    uint64_t h = splitmix64(key) & mask;
    for (;;) {
      if (keys[h] == ~0ULL) {
        keys[h] = key;
        slot_uid[h] = (int32_t)n_unique;
        inds_out[n_unique] = (int32_t)i;
        inverse_out[i] = (int32_t)n_unique;
        ++n_unique;
        break;
      }
      if (keys[h] == key) {
        inverse_out[i] = slot_uid[h];
        break;
      }
      h = (h + 1) & mask;
    }
  }
  return n_unique;
}

// Apply a row-major 4x4 homogeneous transform to [n, 3] float32 points.
void transform_points(const double* tm, const float* xyz_in, int64_t n,
                      float* xyz_out) {
  for (int64_t i = 0; i < n; ++i) {
    const double x = xyz_in[3 * i], y = xyz_in[3 * i + 1], z = xyz_in[3 * i + 2];
    xyz_out[3 * i + 0] = (float)(tm[0] * x + tm[1] * y + tm[2] * z + tm[3]);
    xyz_out[3 * i + 1] = (float)(tm[4] * x + tm[5] * y + tm[6] * z + tm[7]);
    xyz_out[3 * i + 2] = (float)(tm[8] * x + tm[9] * y + tm[10] * z + tm[11]);
  }
}

// LUT remap of uint8 raw labels to int32 training labels.
void remap_labels(const uint8_t* raw, int64_t n, const int32_t* lut,
                  int32_t lut_len, int32_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t r = raw[i];
    out[i] = (r < lut_len) ? lut[r] : 0;
  }
}

// Count points inside an axis-aligned box, split by a boolean class mask
// (thing vs other) — the inner loop of the instance-aug rejection test
// (reference core/datasets/utils.py:376-388).
void box_occupancy(const float* xyz, const int32_t* labels,
                   const uint8_t* thing_mask, int64_t n, const float* mn,
                   const float* mx, int64_t* n_thing, int64_t* n_other) {
  int64_t th = 0, ot = 0;
  for (int64_t i = 0; i < n; ++i) {
    const float x = xyz[3 * i], y = xyz[3 * i + 1], z = xyz[3 * i + 2];
    if (x > mn[0] && x < mx[0] && y > mn[1] && y < mx[1] && z > mn[2] &&
        z < mx[2]) {
      if (thing_mask[labels[i]]) ++th; else ++ot;
    }
  }
  *n_thing = th;
  *n_other = ot;
}

}  // extern "C"
