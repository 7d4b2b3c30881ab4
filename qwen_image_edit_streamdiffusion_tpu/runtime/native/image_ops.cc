// Native host-side image ops for the realtime stream loop.
//
// The reference's host path runs PIL resize/blend per frame
// (server.py:132/201-205, qwen_realtime.py:239-244); at stream rates the
// Python/PIL overhead becomes a measurable slice of the frame budget.
// This library provides the same semantics (separable Lanczos-3 resample,
// alpha blend, [-1,1] float conversion) in C++, bound via ctypes
// (runtime/native_ops.py) with a PIL fallback when not built.
//
// Build: make -C qwen_image_edit_streamdiffusion_tpu/runtime/native

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

inline double sinc(double x) {
  if (x == 0.0) return 1.0;
  const double px = kPi * x;
  return std::sin(px) / px;
}

inline double lanczos3(double x) {
  x = std::fabs(x);
  if (x >= 3.0) return 0.0;
  return sinc(x) * sinc(x / 3.0);
}

// Precomputed sampling weights for one output axis.
struct AxisWeights {
  std::vector<int> start;      // first source index per output index
  std::vector<int> count;      // taps per output index
  std::vector<double> weights; // flattened [out][tap]
  int max_taps = 0;
};

AxisWeights build_weights(int src, int dst) {
  AxisWeights aw;
  const double scale = static_cast<double>(src) / dst;
  const double filter_scale = std::max(scale, 1.0);
  const double support = 3.0 * filter_scale;
  aw.max_taps = static_cast<int>(std::ceil(support)) * 2 + 1;
  aw.start.resize(dst);
  aw.count.resize(dst);
  aw.weights.assign(static_cast<size_t>(dst) * aw.max_taps, 0.0);
  for (int o = 0; o < dst; ++o) {
    const double center = (o + 0.5) * scale - 0.5;
    int lo = static_cast<int>(std::floor(center - support + 0.5));
    int hi = static_cast<int>(std::floor(center + support + 0.5));
    lo = std::max(lo, 0);
    hi = std::min(hi, src - 1);
    double total = 0.0;
    const int n = hi - lo + 1;
    for (int i = 0; i < n; ++i) {
      const double w = lanczos3((lo + i - center) / filter_scale);
      aw.weights[static_cast<size_t>(o) * aw.max_taps + i] = w;
      total += w;
    }
    if (total != 0.0) {
      for (int i = 0; i < n; ++i)
        aw.weights[static_cast<size_t>(o) * aw.max_taps + i] /= total;
    }
    aw.start[o] = lo;
    aw.count[o] = n;
  }
  return aw;
}

}  // namespace

extern "C" {

// Separable Lanczos-3 resize, HWC uint8.
void qie_resize_lanczos(const uint8_t* src, int sh, int sw, uint8_t* dst,
                        int dh, int dw, int ch) {
  const AxisWeights wx = build_weights(sw, dw);
  const AxisWeights wy = build_weights(sh, dh);

  // horizontal pass into an intermediate float buffer (sh, dw, ch)
  std::vector<float> tmp(static_cast<size_t>(sh) * dw * ch);
  for (int y = 0; y < sh; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * sw * ch;
    float* trow = tmp.data() + static_cast<size_t>(y) * dw * ch;
    for (int x = 0; x < dw; ++x) {
      const int s = wx.start[x];
      const int n = wx.count[x];
      const double* w = wx.weights.data() + static_cast<size_t>(x) * wx.max_taps;
      for (int c = 0; c < ch; ++c) {
        double acc = 0.0;
        for (int i = 0; i < n; ++i)
          acc += w[i] * row[static_cast<size_t>(s + i) * ch + c];
        trow[static_cast<size_t>(x) * ch + c] = static_cast<float>(acc);
      }
    }
  }
  // vertical pass
  for (int y = 0; y < dh; ++y) {
    const int s = wy.start[y];
    const int n = wy.count[y];
    const double* w = wy.weights.data() + static_cast<size_t>(y) * wy.max_taps;
    uint8_t* orow = dst + static_cast<size_t>(y) * dw * ch;
    for (int x = 0; x < dw; ++x) {
      for (int c = 0; c < ch; ++c) {
        double acc = 0.0;
        for (int i = 0; i < n; ++i)
          acc += w[i] * tmp[(static_cast<size_t>(s + i) * dw + x) * ch + c];
        const int v = static_cast<int>(std::lround(acc));
        orow[static_cast<size_t>(x) * ch + c] =
            static_cast<uint8_t>(std::clamp(v, 0, 255));
      }
    }
  }
}

// out = a*(1-ratio) + b*ratio, elementwise over n bytes (PIL.Image.blend).
void qie_blend(const uint8_t* a, const uint8_t* b, uint8_t* out, long n,
               float ratio) {
  const float inv = 1.0f - ratio;
  for (long i = 0; i < n; ++i) {
    const float v = inv * a[i] + ratio * b[i];
    out[i] = static_cast<uint8_t>(std::clamp(
        static_cast<int>(std::lround(v)), 0, 255));
  }
}

// uint8 [0,255] → float32 [-1,1] (VAE input convention).
void qie_u8_to_f32_norm(const uint8_t* src, float* dst, long n) {
  constexpr float s = 2.0f / 255.0f;
  for (long i = 0; i < n; ++i) dst[i] = src[i] * s - 1.0f;
}

// float32 [-1,1] → uint8 [0,255] (decode output conversion).
void qie_f32_to_u8(const float* src, uint8_t* dst, long n) {
  for (long i = 0; i < n; ++i) {
    const float v = (src[i] * 0.5f + 0.5f) * 255.0f;
    dst[i] = static_cast<uint8_t>(std::clamp(
        static_cast<int>(std::lround(v)), 0, 255));
  }
}

}  // extern "C"
