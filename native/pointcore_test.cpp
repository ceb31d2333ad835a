// Standalone parity + timing harness for pointcore (the same role the
// reference's csrc/*_test.cpp mains play: compare the native kernel against
// a straightforward reference implementation on random inputs and time it).
//
// Build & run: make -C native test

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <map>
#include <tuple>
#include <vector>

extern "C" {
int64_t dedup_first(const int32_t*, int64_t, int32_t*, int32_t*);
void transform_points(const double*, const float*, int64_t, float*);
void remap_labels(const uint8_t*, int64_t, const int32_t*, int32_t, int32_t*);
}

static double now_ms() {
  using namespace std::chrono;
  return duration<double, std::milli>(steady_clock::now().time_since_epoch())
      .count();
}

int main() {
  const int64_t n = 300000;
  std::srand(7);
  std::vector<int32_t> voxel(3 * n);
  for (auto& v : voxel) v = std::rand() % 2048;

  // reference dedup via std::map
  std::map<std::tuple<int, int, int>, int> seen;
  std::vector<int32_t> ref_inverse(n);
  std::vector<int32_t> ref_inds;
  double t0 = now_ms();
  for (int64_t i = 0; i < n; ++i) {
    auto key = std::make_tuple(voxel[3 * i], voxel[3 * i + 1], voxel[3 * i + 2]);
    auto it = seen.find(key);
    if (it == seen.end()) {
      int uid = (int)ref_inds.size();
      seen.emplace(key, uid);
      ref_inds.push_back((int32_t)i);
      ref_inverse[i] = uid;
    } else {
      ref_inverse[i] = it->second;
    }
  }
  double t_ref = now_ms() - t0;

  std::vector<int32_t> inds(n), inverse(n);
  t0 = now_ms();
  int64_t n_unique = dedup_first(voxel.data(), n, inds.data(), inverse.data());
  double t_fast = now_ms() - t0;

  bool ok = (n_unique == (int64_t)ref_inds.size());
  for (int64_t i = 0; ok && i < n; ++i) ok = (inverse[i] == ref_inverse[i]);
  for (int64_t i = 0; ok && i < n_unique; ++i) ok = (inds[i] == ref_inds[i]);
  std::printf("dedup_first: %s  unique=%lld  native=%.1fms ref(map)=%.1fms\n",
              ok ? "OK" : "MISMATCH", (long long)n_unique, t_fast, t_ref);

  // transform parity
  double tm[16] = {0, -1, 0, 2, 1, 0, 0, -3, 0, 0, 1, 0.5, 0, 0, 0, 1};
  std::vector<float> xyz(3 * n), out(3 * n);
  for (auto& v : xyz) v = (float)std::rand() / RAND_MAX * 100 - 50;
  t0 = now_ms();
  transform_points(tm, xyz.data(), n, out.data());
  double t_tr = now_ms() - t0;
  bool tr_ok = true;
  for (int64_t i = 0; i < 1000; ++i) {
    float ex = -xyz[3 * i + 1] + 2.f;
    float ey = xyz[3 * i] - 3.f;
    float ez = xyz[3 * i + 2] + 0.5f;
    tr_ok = tr_ok && std::abs(out[3 * i] - ex) < 1e-4 &&
            std::abs(out[3 * i + 1] - ey) < 1e-4 &&
            std::abs(out[3 * i + 2] - ez) < 1e-4;
  }
  std::printf("transform_points: %s  %.1fms\n", tr_ok ? "OK" : "MISMATCH", t_tr);
  return (ok && tr_ok) ? 0 : 1;
}
