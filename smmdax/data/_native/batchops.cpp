// Host-side batch assembly ops (C++, multithreaded).
//
// The reference's input pipeline ran on TF 1.x's native queue runners
// (C++ threads doing decode/shuffle/batch — SURVEY.md component #9).
// This is the smmdax equivalent for the TPU host: fused gather +
// uint8->[-1,1] float32 normalize (+ optional horizontal flip), the
// exact preprocessing applied per batch on in-memory datasets
// (CIFAR-10 / ImageNet64 / MNIST), parallelized across host cores so
// the host never stalls the device feed.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).

#include <cstdint>
#include <thread>
#include <vector>

namespace {

inline void normalize_one(const uint8_t* src, float* dst, int64_t elems) {
  // (x - 127.5) / 127.5 with exact endpoints
  constexpr float kInv = 1.0f / 127.5f;
  for (int64_t e = 0; e < elems; ++e) {
    dst[e] = (static_cast<float>(src[e]) - 127.5f) * kInv;
  }
}

inline void normalize_flip_one(const uint8_t* src, float* dst, int64_t h,
                               int64_t w, int64_t c) {
  constexpr float kInv = 1.0f / 127.5f;
  for (int64_t y = 0; y < h; ++y) {
    const uint8_t* row = src + y * w * c;
    float* drow = dst + y * w * c;
    for (int64_t x = 0; x < w; ++x) {
      const uint8_t* px = row + (w - 1 - x) * c;
      float* dpx = drow + x * c;
      for (int64_t ch = 0; ch < c; ++ch) {
        dpx[ch] = (static_cast<float>(px[ch]) - 127.5f) * kInv;
      }
    }
  }
}

void worker(const uint8_t* data, const int64_t* idx, const uint8_t* flips,
            float* out, int64_t elems, int64_t h, int64_t w, int64_t c,
            int64_t lo, int64_t hi) {
  for (int64_t i = lo; i < hi; ++i) {
    const uint8_t* src = data + idx[i] * elems;
    float* dst = out + i * elems;
    if (flips != nullptr && flips[i]) {
      normalize_flip_one(src, dst, h, w, c);
    } else {
      normalize_one(src, dst, elems);
    }
  }
}

}  // namespace

extern "C" {

// data: (N, elems) uint8 flattened samples; idx: (n,) sample indices;
// flips: (n,) 0/1 flags or nullptr; out: (n, elems) float32.
// h, w, c describe the sample layout (only used when flips != nullptr).
void gather_normalize(const uint8_t* data, const int64_t* idx,
                      const uint8_t* flips, int64_t n, int64_t elems,
                      int64_t h, int64_t w, int64_t c, float* out,
                      int32_t nthreads) {
  if (nthreads <= 1 || n < 64) {
    worker(data, idx, flips, out, elems, h, w, c, 0, n);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + nthreads - 1) / nthreads;
  for (int32_t t = 0; t < nthreads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = lo + chunk < n ? lo + chunk : n;
    if (lo >= hi) break;
    threads.emplace_back(worker, data, idx, flips, out, elems, h, w, c,
                         lo, hi);
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
