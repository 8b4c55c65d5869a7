// Native k-nearest-neighbor mean squared distance for splat scale init.
//
// TPU-native framework's equivalent of the reference's CUDA `simple-knn`
// (`distCUDA2`, reference N3) and its scipy KDTree stand-in
// (gs_lightning/utils/math.py:9-14): for every point, the mean of the
// squared distances to its k nearest neighbors.
//
// Design: uniform spatial hash grid with ~1 point per cell, expanding ring
// search with early termination once the current k-th best distance is
// closer than the next ring. O(N) build, ~O(N) query on natural scenes,
// multithreaded. Exposed via a C ABI for ctypes (no pybind11 in this image).
//
// Build: `make -C native` (produces libgsknn.so).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <limits>
#include <thread>
#include <vector>

namespace {

struct Grid {
  float mins[3];
  float cell;      // cell edge length
  int dims[3];     // number of cells per axis
  std::vector<int32_t> cell_start;  // CSR offsets, size nx*ny*nz+1
  std::vector<int32_t> order;       // point indices sorted by cell

  inline int64_t cell_of(const float* p) const {
    int64_t c[3];
    for (int a = 0; a < 3; ++a) {
      int64_t v = (int64_t)((p[a] - mins[a]) / cell);
      c[a] = std::min<int64_t>(std::max<int64_t>(v, 0), dims[a] - 1);
    }
    return (c[2] * dims[1] + c[1]) * dims[0] + c[0];
  }
};

void build_grid(const float* pts, int64_t n, Grid& g) {
  float maxs[3];
  for (int a = 0; a < 3; ++a) {
    g.mins[a] = std::numeric_limits<float>::infinity();
    maxs[a] = -std::numeric_limits<float>::infinity();
  }
  for (int64_t i = 0; i < n; ++i) {
    for (int a = 0; a < 3; ++a) {
      g.mins[a] = std::min(g.mins[a], pts[3 * i + a]);
      maxs[a] = std::max(maxs[a], pts[3 * i + a]);
    }
  }
  float ext[3], vol = 1.0f;
  for (int a = 0; a < 3; ++a) {
    ext[a] = std::max(maxs[a] - g.mins[a], 1e-6f);
    vol *= ext[a];
  }
  // target ~1 point per cell
  g.cell = std::max(std::cbrt(vol / std::max<int64_t>(n, 1)), 1e-6f);
  int64_t total = 1;
  for (int a = 0; a < 3; ++a) {
    g.dims[a] = std::max<int>(1, std::min<int>(1024, (int)(ext[a] / g.cell) + 1));
    total *= g.dims[a];
  }
  g.cell_start.assign(total + 1, 0);
  std::vector<int32_t> counts(total, 0);
  std::vector<int64_t> cells(n);
  for (int64_t i = 0; i < n; ++i) {
    cells[i] = g.cell_of(pts + 3 * i);
    counts[cells[i]]++;
  }
  for (int64_t c = 0; c < total; ++c) g.cell_start[c + 1] = g.cell_start[c] + counts[c];
  g.order.resize(n);
  std::vector<int32_t> cursor(g.cell_start.begin(), g.cell_start.end() - 1);
  for (int64_t i = 0; i < n; ++i) g.order[cursor[cells[i]]++] = (int32_t)i;
}

// insert squared distance into a small max-heap-ish sorted array of size k
inline void insert_best(float* best, int k, float d2) {
  if (d2 >= best[k - 1]) return;
  int j = k - 1;
  while (j > 0 && best[j - 1] > d2) {
    best[j] = best[j - 1];
    --j;
  }
  best[j] = d2;
}

void query_range(const float* pts, int64_t n, const Grid& g, int k,
                 float* out, int64_t lo, int64_t hi) {
  std::vector<float> best(k);
  for (int64_t i = lo; i < hi; ++i) {
    const float* p = pts + 3 * i;
    std::fill(best.begin(), best.end(), std::numeric_limits<float>::infinity());
    int ci[3];
    for (int a = 0; a < 3; ++a) {
      int v = (int)((p[a] - g.mins[a]) / g.cell);
      ci[a] = std::min(std::max(v, 0), g.dims[a] - 1);
    }
    int max_ring = 0;
    for (int a = 0; a < 3; ++a)
      max_ring = std::max(max_ring, std::max(ci[a], g.dims[a] - 1 - ci[a]));
    for (int ring = 0; ring <= max_ring; ++ring) {
      // early exit: all k found and the nearest possible point in this ring
      // is farther than the current k-th best
      if (std::isfinite(best[k - 1]) && ring > 0) {
        float ring_min = (ring - 1) * g.cell;
        if (ring_min * ring_min > best[k - 1]) break;
      }
      int x0 = std::max(ci[0] - ring, 0), x1 = std::min(ci[0] + ring, g.dims[0] - 1);
      int y0 = std::max(ci[1] - ring, 0), y1 = std::min(ci[1] + ring, g.dims[1] - 1);
      int z0 = std::max(ci[2] - ring, 0), z1 = std::min(ci[2] + ring, g.dims[2] - 1);
      for (int z = z0; z <= z1; ++z)
        for (int y = y0; y <= y1; ++y)
          for (int x = x0; x <= x1; ++x) {
            // only the shell of the ring (interior already visited)
            if (ring > 0 && x != x0 && x != x1 && y != y0 && y != y1 &&
                z != z0 && z != z1)
              continue;
            if (std::max({std::abs(x - ci[0]), std::abs(y - ci[1]),
                          std::abs(z - ci[2])}) != ring)
              continue;
            int64_t c = ((int64_t)z * g.dims[1] + y) * g.dims[0] + x;
            for (int32_t s = g.cell_start[c]; s < g.cell_start[c + 1]; ++s) {
              int32_t j = g.order[s];
              if (j == (int32_t)i) continue;
              const float* q = pts + 3 * j;
              float dx = p[0] - q[0], dy = p[1] - q[1], dz = p[2] - q[2];
              insert_best(best.data(), k, dx * dx + dy * dy + dz * dz);
            }
          }
    }
    float acc = 0.0f;
    int found = 0;
    for (int j = 0; j < k; ++j)
      if (std::isfinite(best[j])) {
        acc += best[j];
        ++found;
      }
    out[i] = found ? acc / found : 0.0f;
  }
}

}  // namespace

extern "C" {

// points: (n, 3) float32 row-major; out: (n,) float32 mean of k nearest
// squared distances. Returns 0 on success.
int gs_knn_mean_sq_dist(const float* points, int64_t n, int k, float* out) {
  if (n <= 0 || k <= 0) return 1;
  if (n == 1) {
    out[0] = 0.0f;
    return 0;
  }
  Grid g;
  build_grid(points, n, g);
  unsigned hw = std::max(1u, std::thread::hardware_concurrency());
  int64_t n_threads = std::min<int64_t>(hw, (n + 1023) / 1024);
  if (n_threads <= 1) {
    query_range(points, n, g, k, out, 0, n);
    return 0;
  }
  std::vector<std::thread> threads;
  int64_t per = (n + n_threads - 1) / n_threads;
  for (int64_t t = 0; t < n_threads; ++t) {
    int64_t lo = t * per, hi = std::min(n, lo + per);
    if (lo >= hi) break;
    threads.emplace_back(query_range, points, n, std::cref(g), k, out, lo, hi);
  }
  for (auto& th : threads) th.join();
  return 0;
}
}
