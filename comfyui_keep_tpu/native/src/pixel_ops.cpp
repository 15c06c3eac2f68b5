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

extern "C" {

// Inverse-map affine warp with bilinear sampling (cv2.warpAffine semantics,
// float path — no cv2 fixed-point quantization). `minv` is the 2x3 matrix
// mapping DST pixel coords -> SRC coords (the caller inverts the forward
// matrix). border_mode: 0 = constant (border_value per channel),
// 1 = replicate, 2 = reflect101. Works for any channel count / dtype=float.
void warp_affine_bilinear_f32(const float* src, int64_t sh, int64_t sw,
                              int64_t c, const double* minv, float* dst,
                              int64_t dh, int64_t dw, int border_mode,
                              const float* border_value) {
  const double a = minv[0], b = minv[1], tx = minv[2];
  const double d = minv[3], e = minv[4], ty = minv[5];
  auto reflect = [](int64_t p, int64_t n) {
    if (n == 1) return (int64_t)0;
    int64_t period = 2 * (n - 1);
    p = ((p % period) + period) % period;
    return p < n ? p : period - p;
  };
  parallel_for(dh, [&](int64_t lo, int64_t hi) {
    for (int64_t y = lo; y < hi; ++y) {
      float* orow = dst + y * dw * c;
      for (int64_t x = 0; x < dw; ++x) {
        double fx = a * x + b * y + tx;
        double fy = d * x + e * y + ty;
        int64_t x0 = (int64_t)std::floor(fx);
        int64_t y0 = (int64_t)std::floor(fy);
        float wx = (float)(fx - x0);
        float wy = (float)(fy - y0);
        float* out = orow + x * c;
        for (int64_t k = 0; k < c; ++k) out[k] = 0.0f;
        for (int dy = 0; dy < 2; ++dy) {
          for (int dx = 0; dx < 2; ++dx) {
            int64_t sx = x0 + dx, sy = y0 + dy;
            float w = (dx ? wx : 1.0f - wx) * (dy ? wy : 1.0f - wy);
            if (w == 0.0f) continue;
            const float* pix;
            float cval[16];
            if (sx < 0 || sx >= sw || sy < 0 || sy >= sh) {
              if (border_mode == 0) {
                for (int64_t k = 0; k < c && k < 16; ++k)
                  cval[k] = border_value ? border_value[k] : 0.0f;
                pix = cval;
              } else if (border_mode == 1) {
                sx = std::min(std::max(sx, (int64_t)0), sw - 1);
                sy = std::min(std::max(sy, (int64_t)0), sh - 1);
                pix = src + (sy * sw + sx) * c;
              } else {
                sx = reflect(sx, sw);
                sy = reflect(sy, sh);
                pix = src + (sy * sw + sx) * c;
              }
            } else {
              pix = src + (sy * sw + sx) * c;
            }
            for (int64_t k = 0; k < c; ++k) out[k] += w * pix[k];
          }
        }
      }
    }
  });
}

}  // extern "C"
