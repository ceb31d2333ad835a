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

// ---------------------------------------------------------------------------
// Host-side U-Net plumbing builder.
//
// On-device rulebook construction (vectorized binary searches) is
// latency-bound on TPU (~70ms for one 27-offset rulebook at V=4k vs ~3ms of
// actual conv compute). This builds everything on the host in O(N): level
// tables, conv rulebooks, transposed-conv maps, point->voxel rows and
// trilinear devoxelize queries — the arrays the jitted step then consumes
// directly. Python glue: u2mkd_tpu/data/plumbing_host.py.
// ---------------------------------------------------------------------------

#include <cmath>
#include <vector>

namespace {

// Open-addressing coord->row map (linear probing, splitmix64). The plumbing
// builder performs ~100 lookups per voxel (27-neighborhood rulebooks + 8-way
// point queries per level); std::unordered_map's pointer-chasing made those
// lookups ~60% of the whole build at 131k points.
struct CoordMap {
  // one 16-byte slot per entry: a probe touches ONE cache line instead of
  // two (split key/val arrays cost ~2 misses per random probe; the plumbing
  // builder issues ~14M probes at 131k points, all latency-bound)
  struct Slot {
    uint64_t k;
    int64_t v;
  };
  static constexpr uint64_t EMPTY = ~0ULL;
  std::vector<Slot> slots;
  uint64_t mask = 0;
  size_t size = 0;

  void reserve(size_t n) {
    uint64_t cap = 16;
    while (cap < 2 * n + 1) cap <<= 1;
    slots.assign(cap, Slot{EMPTY, -1});
    mask = cap - 1;
    size = 0;
  }
  void grow() {
    std::vector<Slot> old = std::move(slots);
    slots.assign(old.size() * 2, Slot{EMPTY, -1});
    mask = slots.size() - 1;
    for (const Slot& s : old) {
      if (s.k == EMPTY) continue;
      uint64_t h = splitmix64(s.k) & mask;
      while (slots[h].k != EMPTY) h = (h + 1) & mask;
      slots[h] = s;
    }
  }
  // insert if absent; returns the row now stored for key
  int32_t emplace(uint64_t key, int32_t row) {
    if (mask == 0) reserve(16);
    uint64_t h = splitmix64(key) & mask;
    for (;;) {
      if (slots[h].k == EMPTY) {
        if (2 * (size + 1) > slots.size()) {
          grow();
          return emplace(key, row);
        }
        slots[h].k = key;
        slots[h].v = row;
        ++size;
        return row;
      }
      if (slots[h].k == key) return (int32_t)slots[h].v;
      h = (h + 1) & mask;
    }
  }
  int32_t find(uint64_t key) const {
    if (mask == 0) return -1;
    uint64_t h = splitmix64(key) & mask;
    for (;;) {
      const Slot& s = slots[h];
      if (s.k == key) return (int32_t)s.v;
      if (s.k == EMPTY) return -1;
      h = (h + 1) & mask;
    }
  }
  // hint the slot line into cache ahead of a find() — the hot loops batch
  // their 8/27 independent probes as prefetch-all-then-probe so the misses
  // overlap instead of serializing
  void prefetch(uint64_t key) const {
    if (mask) __builtin_prefetch(&slots[splitmix64(key) & mask], 0, 1);
  }
  int32_t lookup(const int32_t* c) const { return find(pack_coord(c)); }
  int32_t lookup3(int32_t x, int32_t y, int32_t z) const {
    int32_t c[3] = {x, y, z};
    return lookup(c);
  }
};

inline uint64_t pack3(int32_t x, int32_t y, int32_t z) {
  int32_t c[3] = {x, y, z};
  return pack_coord(c);
}

}  // namespace

extern "C" {

// Build all levels. Arguments:
//  pcoords [P,3] float (voxel units, stride-1 scale), pmask [P] uint8.
//  n_levels level capacities caps[L].
// Per-level output buffers (caller-allocated, sized by caps[L]):
//  coords[L]: int32 [capL*3]; vmask[L]: uint8 [capL]; nums[L]: int32[1]
//  nbr27[L]: int32 [27*capL]  (kernel offsets in z-fastest order with
//            (0,0,0) first — must match spconv.kernel_offsets(3))
//  down8[L]: int32 [8*capL]   (L>=1; offsets match kernel_offsets(2))
//  parent[L], koff[L]: int32 [capL] (L<n_levels-1)
//  voxxyz[L]: float [capL*3] (mean metric xyz per voxel, from level0 means)
//  p2v[L]: int32 [P]; dvi[L]: int32 [P*8]; dvw[L]: float [P*8]
// pxyz [P,3] float: metric xyz per point (for voxxyz means).
void build_plumbing_host(
    const float* pcoords, const float* pxyz, const uint8_t* pmask, int64_t P,
    const int64_t* caps, int n_levels,
    int32_t** coords, uint8_t** vmask, int32_t** nums,
    int32_t** nbr27, int32_t** down8, int32_t** parent, int32_t** koff,
    float** voxxyz, int32_t** p2v, int32_t** dvi, float** dvw) {
  // kernel offsets matching the JAX side: sorted with (0,0,0) first, then
  // z-fastest enumeration order preserved by the stable sort in
  // spconv.kernel_offsets
  static int off3[27][3];
  static int off2[8][3];
  {
    int n = 0;
    int rng[3] = {-1, 0, 1};
    int tmp[27][3];
    for (int dz : rng)
      for (int dy : rng)
        for (int dx : rng) {
          tmp[n][0] = dx; tmp[n][1] = dy; tmp[n][2] = dz; ++n;
        }
    // stable partition: (0,0,0) first
    int w = 0;
    for (int i = 0; i < 27; ++i)
      if (tmp[i][0] == 0 && tmp[i][1] == 0 && tmp[i][2] == 0) {
        off3[w][0] = 0; off3[w][1] = 0; off3[w][2] = 0; ++w;
      }
    for (int i = 0; i < 27; ++i)
      if (!(tmp[i][0] == 0 && tmp[i][1] == 0 && tmp[i][2] == 0)) {
        off3[w][0] = tmp[i][0]; off3[w][1] = tmp[i][1]; off3[w][2] = tmp[i][2];
        ++w;
      }
    n = 0;
    int rng2[2] = {0, 1};
    for (int dz : rng2)
      for (int dy : rng2)
        for (int dx : rng2) {
          off2[n][0] = dx; off2[n][1] = dy; off2[n][2] = dz; ++n;
        }
  }

  std::vector<CoordMap> maps(n_levels);
  for (int L = 0; L < n_levels; ++L) maps[L].reserve((size_t)caps[L]);
  std::vector<int64_t> nuniq(n_levels, 0);
  std::vector<std::vector<int64_t>> v0_rows(n_levels);  // voxel -> any l0 row? need mean
  // accumulate mean xyz per voxel (level 0 first, coarser from level0 rows)
  std::vector<std::vector<double>> xyz_sum(n_levels);
  std::vector<std::vector<int64_t>> xyz_cnt(n_levels);

  // ---- level 0: floor(pcoords) dedup, mean xyz, p2v ----
  const int64_t cap0 = caps[0];
  for (int L = 0; L < n_levels; ++L) {
    xyz_sum[L].assign((size_t)caps[L] * 3, 0.0);
    xyz_cnt[L].assign((size_t)caps[L], 0);
    std::memset(coords[L], 0, sizeof(int32_t) * (size_t)caps[L] * 3);
    std::memset(vmask[L], 0, (size_t)caps[L]);
  }
  // precompute packed keys once so the dedup loop can prefetch ahead of
  // itself (each find() is otherwise a serialized cache-miss chain)
  std::vector<uint64_t> pkeys((size_t)P, CoordMap::EMPTY);
  for (int64_t i = 0; i < P; ++i) {
    if (!pmask[i]) continue;
    pkeys[i] = pack3((int32_t)std::floor(pcoords[3 * i]),
                     (int32_t)std::floor(pcoords[3 * i + 1]),
                     (int32_t)std::floor(pcoords[3 * i + 2]));
  }
  constexpr int64_t PF = 8;  // prefetch distance
  for (int64_t i = 0; i < P; ++i) {
    if (i + PF < P && pkeys[i + PF] != CoordMap::EMPTY)
      maps[0].prefetch(pkeys[i + PF]);
    p2v[0][i] = -1;
    if (!pmask[i]) continue;
    int32_t c[3] = {(int32_t)std::floor(pcoords[3 * i]),
                    (int32_t)std::floor(pcoords[3 * i + 1]),
                    (int32_t)std::floor(pcoords[3 * i + 2])};
    uint64_t key = pkeys[i];
    int32_t row = maps[0].find(key);
    if (row < 0) {
      if (nuniq[0] >= cap0) continue;  // overflow -> drop
      row = (int32_t)nuniq[0]++;
      maps[0].emplace(key, row);
      coords[0][3 * row] = c[0];
      coords[0][3 * row + 1] = c[1];
      coords[0][3 * row + 2] = c[2];
      vmask[0][row] = 1;
    }
    p2v[0][i] = row;
    xyz_sum[0][3 * row] += pxyz[3 * i];
    xyz_sum[0][3 * row + 1] += pxyz[3 * i + 1];
    xyz_sum[0][3 * row + 2] += pxyz[3 * i + 2];
    xyz_cnt[0][row] += 1;
  }
  nums[0][0] = (int32_t)nuniq[0];

  // ---- coarser levels: dedup of floor(c/2s)*2s over finer level ----
  for (int L = 1; L < n_levels; ++L) {
    const int s2 = 1 << L;  // stride of level L in finest units
    for (int64_t v = 0; v < nuniq[L - 1]; ++v) {
      const int32_t* fc = &coords[L - 1][3 * v];
      int32_t pc[3];
      for (int a = 0; a < 3; ++a) {
        int32_t q = fc[a] >= 0 ? fc[a] / s2 : -((-fc[a] + s2 - 1) / s2);
        pc[a] = q * s2;
      }
      uint64_t key = pack_coord(pc);
      int32_t row = maps[L].find(key);
      if (row < 0) {
        if (nuniq[L] >= caps[L]) { parent[L - 1][v] = -1; koff[L - 1][v] = 0; continue; }
        row = (int32_t)nuniq[L]++;
        maps[L].emplace(key, row);
        coords[L][3 * row] = pc[0];
        coords[L][3 * row + 1] = pc[1];
        coords[L][3 * row + 2] = pc[2];
        vmask[L][row] = 1;
      }
      parent[L - 1][v] = row;
      // koff: index of delta within off2 ordering (stride of finer level)
      const int sf = 1 << (L - 1);
      int dx = (fc[0] - pc[0]) / sf, dy = (fc[1] - pc[1]) / sf,
          dz = (fc[2] - pc[2]) / sf;
      int kk = 0;
      for (int k = 0; k < 8; ++k)
        if (off2[k][0] == dx && off2[k][1] == dy && off2[k][2] == dz) kk = k;
      koff[L - 1][v] = kk;
      // accumulate coarse xyz mean from fine means (flat mean over level-0
      // voxels: weight by fine count)
      // (we instead accumulate level0 rows below for exact flat means)
    }
    // pad rest of parent/koff
    for (int64_t v = nuniq[L - 1]; v < caps[L - 1]; ++v) {
      parent[L - 1][v] = -1;
      koff[L - 1][v] = 0;
    }
    nums[L][0] = (int32_t)nuniq[L];
  }

  // ---- flat mean metric xyz per level from level-0 voxels ----
  for (int64_t v0 = 0; v0 < nuniq[0]; ++v0) {
    double mx = xyz_sum[0][3 * v0] / std::max<int64_t>(xyz_cnt[0][v0], 1);
    double my = xyz_sum[0][3 * v0 + 1] / std::max<int64_t>(xyz_cnt[0][v0], 1);
    double mz = xyz_sum[0][3 * v0 + 2] / std::max<int64_t>(xyz_cnt[0][v0], 1);
    voxxyz[0][3 * v0] = (float)mx;
    voxxyz[0][3 * v0 + 1] = (float)my;
    voxxyz[0][3 * v0 + 2] = (float)mz;
    const int32_t* c0 = &coords[0][3 * v0];
    for (int L = 1; L < n_levels; ++L) {
      const int s2 = 1 << L;
      int32_t pc[3];
      for (int a = 0; a < 3; ++a) {
        int32_t q = c0[a] >= 0 ? c0[a] / s2 : -((-c0[a] + s2 - 1) / s2);
        pc[a] = q * s2;
      }
      int32_t row = maps[L].lookup(pc);
      if (row < 0) continue;
      xyz_sum[L][3 * row] += mx;
      xyz_sum[L][3 * row + 1] += my;
      xyz_sum[L][3 * row + 2] += mz;
      xyz_cnt[L][row] += 1;
    }
  }
  for (int L = 1; L < n_levels; ++L) {
    for (int64_t v = 0; v < caps[L]; ++v) {
      int64_t c = std::max<int64_t>(xyz_cnt[L][v], 1);
      voxxyz[L][3 * v] = (float)(xyz_sum[L][3 * v] / c);
      voxxyz[L][3 * v + 1] = (float)(xyz_sum[L][3 * v + 1] / c);
      voxxyz[L][3 * v + 2] = (float)(xyz_sum[L][3 * v + 2] / c);
    }
  }

  // ---- conv rulebooks (prefetch all 27/8 independent probes, then find,
  //      so the random-access misses overlap instead of serializing) ----
  for (int L = 0; L < n_levels; ++L) {
    const int s = 1 << L;
    const int sf = 1 << (L > 0 ? L - 1 : 0);
    uint64_t k27[27], k8[8];
    for (int64_t v = 0; v < caps[L]; ++v) {
      const bool ok = v < nuniq[L];
      if (!ok) {
        for (int k = 0; k < 27; ++k) nbr27[L][(size_t)k * caps[L] + v] = -1;
        if (L >= 1)
          for (int k = 0; k < 8; ++k) down8[L][(size_t)k * caps[L] + v] = -1;
        continue;
      }
      const int32_t* c = &coords[L][3 * v];
      for (int k = 0; k < 27; ++k) {
        k27[k] = pack3(c[0] + off3[k][0] * s, c[1] + off3[k][1] * s,
                       c[2] + off3[k][2] * s);
        maps[L].prefetch(k27[k]);
      }
      if (L >= 1) {
        for (int k = 0; k < 8; ++k) {
          k8[k] = pack3(c[0] + off2[k][0] * sf, c[1] + off2[k][1] * sf,
                        c[2] + off2[k][2] * sf);
          maps[L - 1].prefetch(k8[k]);
        }
      }
      for (int k = 0; k < 27; ++k)
        nbr27[L][(size_t)k * caps[L] + v] = maps[L].find(k27[k]);
      if (L >= 1)
        for (int k = 0; k < 8; ++k)
          down8[L][(size_t)k * caps[L] + v] = maps[L - 1].find(k8[k]);
    }
  }

  // ---- point queries per level: p2v + trilinear devox ----
  for (int L = 0; L < n_levels; ++L) {
    const int s = 1 << L;
    for (int64_t i = 0; i < P; ++i) {
      if (!pmask[i]) {
        if (L > 0) p2v[L][i] = -1;
        for (int k = 0; k < 8; ++k) {
          dvi[L][8 * i + k] = -1;
          dvw[L][8 * i + k] = 0.f;
        }
        continue;
      }
      const float px = pcoords[3 * i], py = pcoords[3 * i + 1],
                  pz = pcoords[3 * i + 2];
      int32_t base[3] = {(int32_t)std::floor(px / s) * s,
                         (int32_t)std::floor(py / s) * s,
                         (int32_t)std::floor(pz / s) * s};
      float fx = px / s - std::floor(px / s);
      float fy = py / s - std::floor(py / s);
      float fz = pz / s - std::floor(pz / s);
      uint64_t kq[8];
      for (int k = 0; k < 8; ++k) {
        kq[k] = pack3(base[0] + off2[k][0] * s, base[1] + off2[k][1] * s,
                      base[2] + off2[k][2] * s);
        maps[L].prefetch(kq[k]);
      }
      float wsum = 0.f;
      for (int k = 0; k < 8; ++k) {
        int32_t row = maps[L].find(kq[k]);
        float w = (off2[k][0] ? fx : 1 - fx) * (off2[k][1] ? fy : 1 - fy) *
                  (off2[k][2] ? fz : 1 - fz);
        dvi[L][8 * i + k] = row;
        float wv = row >= 0 ? w : 0.f;
        dvw[L][8 * i + k] = wv;
        wsum += wv;
      }
      // off2[0] == (0,0,0): the k=0 probe IS the p2v row — no extra lookup
      if (L > 0) p2v[L][i] = dvi[L][8 * i];
      const float inv = 1.f / (wsum + 1e-8f);
      for (int k = 0; k < 8; ++k) dvw[L][8 * i + k] *= inv;
    }
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Host-side flash-attention window geometry (one branch of one level).
//
// Native counterpart of u2mkd_tpu/data/wgeom_host._branch_geometry — the
// remaining numpy hot path of the loader once the conv plumbing above is
// native. Semantics are bit-matched to the numpy implementation (which stays
// as the tested oracle): float32 cell/quant arithmetic, np.lexsort's stable
// (primary, key) order via an LSD radix sort, identical run/rank/tile-range
// scans. The reference's analog is sptr's cached get_indices
// (spherical_transformer.py:185-219) computed on GPU per indice_key; here it
// is loader-side work overlapped with device compute.
// ---------------------------------------------------------------------------

#include <algorithm>

namespace {

// numpy npy_remainderf: fmod with the divisor's sign (ws > 0 here).
// fmodf via libm is ~85ns/call; the double-precision trunc-quotient formula
// below is bit-exact for float32 inputs (the double quotient of two 24-bit
// mantissas has < 2^-24 error, so trunc() recovers the true integer
// quotient; q*w and a - q*w are then exact in 53 bits) and ~5x faster.
inline float np_modf(float a, float w) {
  const double ad = a, wd = w;
  const double q = std::trunc(ad / wd);
  float m = (float)(ad - q * wd);
  if (m != 0.f && m < 0.f) m += w;
  return m;
}

// Stable sort of [0, n) by (primary asc, key SIGNED asc): LSD radix —
// 8x8-bit passes over the sign-bit-biased key (the packed window key
// overflows int64 by construction, exactly as numpy's does, so order must
// follow the wrapped signed values), then one stable counting pass over
// primary (values in [0, n_primary]).
void lexsort_primary_key(const int64_t* key, const int64_t* primary,
                         int64_t n, int64_t n_primary, int32_t* order) {
  if (n == 0) return;
  // carry (key, index) pairs through the passes: each pass streams the
  // permuted keys sequentially instead of gathering key[a[i]] at random
  struct KV { uint64_t k; int32_t i; };
  std::vector<KV> a(n), b(n);
  uint64_t varying = 0;
  {
    const uint64_t k0 = (uint64_t)key[0] ^ (1ULL << 63);
    for (int64_t i = 0; i < n; ++i) {
      const uint64_t uk = (uint64_t)key[i] ^ (1ULL << 63);
      varying |= uk ^ k0;
      a[i].k = uk;
      a[i].i = (int32_t)i;
    }
  }
  KV* pa = a.data();
  KV* pb = b.data();
  size_t hist[256];
  for (int pass = 0; pass < 8; ++pass) {
    const int shift = pass * 8;
    if ((varying >> shift & 0xFF) == 0) continue;  // constant byte
    std::memset(hist, 0, sizeof(hist));
    for (int64_t i = 0; i < n; ++i) ++hist[pa[i].k >> shift & 0xFF];
    size_t run = 0;
    for (int j = 0; j < 256; ++j) {
      size_t c = hist[j];
      hist[j] = run;
      run += c;
    }
    for (int64_t i = 0; i < n; ++i) pb[hist[pa[i].k >> shift & 0xFF]++] = pa[i];
    std::swap(pa, pb);
  }
  std::vector<size_t> ph((size_t)n_primary + 2, 0);
  for (int64_t i = 0; i < n; ++i) ++ph[(size_t)primary[i] + 1];
  for (size_t j = 1; j < ph.size(); ++j) ph[j] += ph[j - 1];
  bool multi = false;
  for (int64_t i = 1; i < n; ++i)
    if (primary[i] != primary[0]) { multi = true; break; }
  if (multi) {
    for (int64_t i = 0; i < n; ++i)
      pb[ph[(size_t)primary[pa[i].i]]++] = pa[i];
    std::swap(pa, pb);
  }
  for (int64_t i = 0; i < n; ++i) order[i] = pa[i].i;
}

}  // namespace

extern "C" {

// Window geometry for one attention branch over a [B, V] voxel batch.
//   coords [B*V, 3] float32 branch coordinates (metric xyz or sphere),
//   valid  [B*V]    uint8,
//   ws/qs  [3]      float32 window / quantization sizes,
//   tile            query-tile size (pad_to = ceil(B*V / tile) * tile).
// Outputs (caller-allocated):
//   order [pad_to] i32, inv [B*V] i32, rank [pad_to] f32,
//   quant [pad_to,3] i32, kmin/kmax [pad_to/tile] i32, occ [1] i32,
//   r_out [pad_to] f32 (radial range column; pass NULL for cubic).
void build_wgeom_branch(
    const float* coords, const uint8_t* valid, int64_t B, int64_t V,
    const float* ws, const float* qs, int64_t tile,
    int32_t* order, int32_t* inv, float* rank_out, int32_t* quant_out,
    int32_t* kmin, int32_t* kmax, int32_t* occ, float* r_out) {
  const int64_t n = B * V;
  const int64_t pad_to = (n + tile - 1) / tile * tile;
  const int64_t bias = (int64_t)1 << 21;

  std::vector<int64_t> key(n);
  std::vector<int64_t> primary(n);
  std::vector<int32_t> quant(n * 3);
  for (int64_t s = 0; s < B; ++s) {
    // per-sample valid-min of each axis (0 when the sample is empty)
    float mn[3];
    bool any = false;
    for (int a = 0; a < 3; ++a) mn[a] = 0.f;
    for (int64_t v = 0; v < V; ++v) {
      if (!valid[s * V + v]) continue;
      const float* c = coords + 3 * (s * V + v);
      if (!any) {
        mn[0] = c[0]; mn[1] = c[1]; mn[2] = c[2];
        any = true;
      } else {
        for (int a = 0; a < 3; ++a) mn[a] = std::min(mn[a], c[a]);
      }
    }
    for (int64_t v = 0; v < V; ++v) {
      const int64_t i = s * V + v;
      const float* c = coords + 3 * i;
      int64_t cell[3];
      for (int a = 0; a < 3; ++a) {
        const float rel = c[a] - mn[a];
        cell[a] = (int64_t)std::floor(rel / ws[a]);
        quant[3 * i + a] = (int32_t)std::floor(np_modf(rel, ws[a]) / qs[a]);
      }
      key[i] = ((cell[0] + bias) << 42) | (((cell[1] + bias) & 0x1FFFFF) << 21)
               | ((cell[2] + bias) & 0x1FFFFF);
      primary[i] = valid[i] ? s : B;  // dead rows sort last within the batch
    }
  }

  std::vector<int32_t> ord(n);
  lexsort_primary_key(key.data(), primary.data(), n, B + 1, ord.data());

  for (int64_t i = 0; i < n; ++i) inv[ord[i]] = (int32_t)i;
  for (int64_t i = 0; i < n; ++i) order[i] = ord[i];
  for (int64_t i = n; i < pad_to; ++i) order[i] = 0;

  // run detection over the sorted sequence (pad rows: each its own window)
  int64_t rank = -1, run_start = 0, run_len = 0, max_occ = 0;
  int64_t prev_key = 0, prev_prim = -1;
  bool prev_live = false;
  for (int64_t i = 0; i < pad_to; ++i) {
    const bool live = i < n && valid[ord[i]];
    const int64_t k = i < n ? key[ord[i]] : 0;
    const int64_t p = i < n ? primary[ord[i]] : B + 1;
    const bool same = live && prev_live && k == prev_key && p == prev_prim;
    if (!same) {
      if (prev_live && run_len > max_occ) max_occ = run_len;
      ++rank;
      run_start = i;
      run_len = 0;
    }
    if (live) ++run_len;
    rank_out[i] = (float)rank;
    if (i % tile == 0) kmin[i / tile] = (int32_t)run_start;
    if (i < n) {
      const int32_t* q = quant.data() + 3 * ord[i];
      quant_out[3 * i] = q[0];
      quant_out[3 * i + 1] = q[1];
      quant_out[3 * i + 2] = q[2];
      if (r_out) r_out[i] = coords[3 * ord[i] + 2];
    } else {
      quant_out[3 * i] = quant_out[3 * i + 1] = quant_out[3 * i + 2] = 0;
      if (r_out) r_out[i] = 0.f;
    }
    prev_key = k;
    prev_prim = p;
    prev_live = live;
  }
  if (prev_live && run_len > max_occ) max_occ = run_len;
  occ[0] = (int32_t)max_occ;

  // backward sweep: end of the run containing each tile's last row
  int64_t run_end = pad_to;
  int64_t t = pad_to / tile - 1;
  for (int64_t i = pad_to - 1; i >= 0; --i) {
    const bool last = i + 1 == pad_to || rank_out[i + 1] != rank_out[i];
    if (last) run_end = i + 1;
    if (i % tile == tile - 1) {
      kmax[t] = (int32_t)std::max(run_end, (int64_t)kmin[t] + 1);
      --t;
    }
  }
}

}  // extern "C"
