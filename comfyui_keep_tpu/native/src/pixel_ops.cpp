// Native host-side pixel runtime for the comfyui_keep_tpu data path.
//
// The reference ships C++/CUDA for its native tier (wm_basicsr/ops/*); on TPU
// the device kernels are Pallas/XLA, and the native tier instead owns the
// HOST hot loops that sit on the feed path between cv2/numpy and the HBM
// transfer: uint8 BGR <-> float RGB [-1,1] conversion for whole clips, and
// feathered tile-blend accumulation for tiled SR stitching. Multi-threaded
// with std::thread; exposed via a C ABI for ctypes.
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

template <typename F>
void parallel_for(int64_t n, F f) {
  unsigned hw = std::thread::hardware_concurrency();
  int64_t nt = std::max<int64_t>(1, std::min<int64_t>(hw ? hw : 4, n / 65536));
  if (nt <= 1) {
    f(0, n);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + nt - 1) / nt;
  for (int64_t t = 0; t < nt; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back([=] { f(lo, hi); });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// uint8 BGR HWC -> float32 RGB [-1, 1]; n = number of pixels.
void bgr_u8_to_rgb_pm1(const uint8_t* src, float* dst, int64_t n) {
  constexpr float kScale = 2.0f / 255.0f;
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      const uint8_t* p = src + 3 * i;
      float* q = dst + 3 * i;
      q[0] = p[2] * kScale - 1.0f;
      q[1] = p[1] * kScale - 1.0f;
      q[2] = p[0] * kScale - 1.0f;
    }
  });
}

// float32 RGB [-1, 1] -> uint8 BGR with clamp + round (tensor2img semantics).
void rgb_pm1_to_bgr_u8(const float* src, uint8_t* dst, int64_t n) {
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      const float* p = src + 3 * i;
      uint8_t* q = dst + 3 * i;
      for (int c = 0; c < 3; ++c) {
        float v = p[2 - c];
        v = v < -1.0f ? -1.0f : (v > 1.0f ? 1.0f : v);
        q[c] = (uint8_t)std::lround((v + 1.0f) * 0.5f * 255.0f);
      }
    }
  });
}

// Accumulate one SR tile into the (out, div) framebuffers with a feather
// mask: out[y0+r, x0+c] += tile[r, c] * mask[r, c]; div likewise.
void blend_tile(float* out, float* div, const float* tile, const float* mask,
                int64_t out_h, int64_t out_w, int64_t channels, int64_t tile_h,
                int64_t tile_w, int64_t y0, int64_t x0) {
  (void)out_h;
  parallel_for(tile_h, [&](int64_t lo, int64_t hi) {
    for (int64_t r = lo; r < hi; ++r) {
      float* orow = out + ((y0 + r) * out_w + x0) * channels;
      float* drow = div + ((y0 + r) * out_w + x0);
      const float* trow = tile + r * tile_w * channels;
      const float* mrow = mask + r * tile_w;
      for (int64_t c = 0; c < tile_w; ++c) {
        float m = mrow[c];
        for (int64_t k = 0; k < channels; ++k)
          orow[c * channels + k] += trow[c * channels + k] * m;
        drow[c] += m;
      }
    }
  });
}

// comfy image (float RGB [0,1]) -> uint8 BGR, batched.
void rgb01_to_bgr_u8(const float* src, uint8_t* dst, int64_t n) {
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      const float* p = src + 3 * i;
      uint8_t* q = dst + 3 * i;
      for (int c = 0; c < 3; ++c) {
        float v = p[2 - c];
        v = v < 0.0f ? 0.0f : (v > 1.0f ? 1.0f : v);
        q[c] = (uint8_t)std::lround(v * 255.0f);
      }
    }
  });
}

}  // extern "C"
