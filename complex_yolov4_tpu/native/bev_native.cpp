// Native host-side BEV rasterizer + velodyne loader.
//
// The per-frame host hot path of the input pipeline (SURVEY.md §3.4:
// reference src/data_process/kitti_bev_utils.py:18-76 — boundary crop,
// z-shift, 609x609 grid scatter of max-height / top-intensity / log-density,
// crop to 608) fused into a single pass over the points, with a thread pool
// for batch assembly. Exposed through a tiny C ABI consumed via ctypes
// (complex_yolov4_tpu/native/__init__.py); results are bit-identical to the
// numpy implementation in data/bev.py (same float32 math, same max-z /
// max-intensity-on-tie semantics).
//
// Build: make (g++ -O3 -shared; see Makefile in this directory).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kBev = 608;
constexpr int kGrid = kBev + 1;        // raster grid before the final crop
constexpr float kMinX = 0.0f, kMaxX = 50.0f;
constexpr float kMinY = -25.0f, kMaxY = 25.0f;
constexpr float kMinZ = -2.73f, kMaxZ = 1.27f;
constexpr float kDisc = (kMaxX - kMinX) / kBev;
constexpr float kMaxHeight = kMaxZ - kMinZ;  // 4.0 m

struct Cell {
  float height = -1.0f;   // max z (post-shift z >= 0, so -1 = empty)
  float intensity = 0.0f; // intensity of the top point (max on z ties)
  int32_t count = 0;
};

// One fused pass: crop + z-shift + scatter. out is HWC (608, 608, 3) with
// channels [top intensity, max height / 4 m, log64 density].
void rasterize(const float* points, int64_t n, float* out) {
  std::vector<Cell> cells(static_cast<size_t>(kGrid) * kGrid);
  // Density math in double for bit parity with the numpy float64 path.
  const double log64 = std::log(64.0);

  for (int64_t p = 0; p < n; ++p) {
    const float x = points[p * 4 + 0];
    const float y = points[p * 4 + 1];
    const float z0 = points[p * 4 + 2];
    const float r = points[p * 4 + 3];
    if (x < kMinX || x > kMaxX || y < kMinY || y > kMaxY || z0 < kMinZ ||
        z0 > kMaxZ) {
      continue;
    }
    const float z = z0 - kMinZ;
    // int(floor(y/d) + 609/2) truncates the .5 -> floor + 304 (python parity,
    // reference kitti_bev_utils.py:44).
    const int ix = static_cast<int>(std::floor(x / kDisc));
    const int iy = static_cast<int>(std::floor(y / kDisc) + kGrid / 2.0f);
    if (ix < 0 || ix >= kGrid || iy < 0 || iy >= kGrid) continue;
    Cell& c = cells[static_cast<size_t>(ix) * kGrid + iy];
    c.count += 1;
    if (z > c.height) {
      c.height = z;
      c.intensity = r;
    } else if (z == c.height) {
      c.intensity = std::max(c.intensity, r);
    }
  }

  for (int ix = 0; ix < kBev; ++ix) {
    for (int iy = 0; iy < kBev; ++iy) {
      const Cell& c = cells[static_cast<size_t>(ix) * kGrid + iy];
      float* px = out + (static_cast<size_t>(ix) * kBev + iy) * 3;
      if (c.count > 0) {
        px[0] = c.intensity;
        px[1] = c.height / kMaxHeight;
        px[2] = static_cast<float>(
            std::min(1.0, std::log(c.count + 1.0) / log64));
      } else {
        px[0] = px[1] = px[2] = 0.0f;
      }
    }
  }
}

}  // namespace

extern "C" {

// Rasterize an in-memory (n, 4) float32 point array into out (608*608*3).
void cyv4_rasterize_points(const float* points, int64_t n, float* out) {
  rasterize(points, n, out);
}

// Read a KITTI velodyne .bin and rasterize. Returns the number of points
// read, or -1 when the file cannot be read.
int64_t cyv4_rasterize_file(const char* path, float* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  const long bytes = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  const int64_t n = bytes / (4 * sizeof(float));
  std::vector<float> buf(static_cast<size_t>(n) * 4);
  const size_t got = std::fread(buf.data(), sizeof(float), buf.size(), f);
  std::fclose(f);
  if (got != buf.size()) return -1;
  rasterize(buf.data(), n, out);
  return n;
}

// Batch rasterization with a thread pool: `paths` is an array of `b` file
// paths; out is (b, 608, 608, 3). Returns the number of failed frames.
int32_t cyv4_rasterize_batch(const char** paths, int32_t b, float* out,
                             int32_t num_threads) {
  if (num_threads <= 0) {
    num_threads = static_cast<int32_t>(std::thread::hardware_concurrency());
    if (num_threads <= 0) num_threads = 4;
  }
  num_threads = std::min(num_threads, b);
  std::atomic<int32_t> next{0};
  std::atomic<int32_t> failures{0};
  const size_t frame = static_cast<size_t>(kBev) * kBev * 3;

  auto worker = [&]() {
    for (;;) {
      const int32_t i = next.fetch_add(1);
      if (i >= b) return;
      if (cyv4_rasterize_file(paths[i], out + frame * i) < 0) {
        failures.fetch_add(1);
      }
    }
  };
  std::vector<std::thread> pool;
  pool.reserve(num_threads);
  for (int32_t t = 0; t < num_threads; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return failures.load();
}

int32_t cyv4_bev_size() { return kBev; }

}  // extern "C"
