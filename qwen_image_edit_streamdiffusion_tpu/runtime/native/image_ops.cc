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

// --------------------------------------------------------------------------
// YCbCr 4:2:0 transfer-format pack/unpack (ops/colorspace.py layout:
// (h/2, w/2, 6) = 2x2 luma block row-major + box-averaged Cb, Cr).
// These run once per stream frame on the host thread; the PIL+numpy
// fallback costs ~13 ms + ~12 ms per 512^2 frame on one core — a
// meaningful slice of the pipelined frame budget. Fixed-point BT.601
// full-range (libjpeg constants), matching the device kernels within
// rounding.
// --------------------------------------------------------------------------

// RGB uint8 (h, w, 3), h/w even → packed (h/2, w/2, 6).
void qie_yuv420_pack(const uint8_t* rgb, int h, int w, uint8_t* out) {
  const int h2 = h / 2, w2 = w / 2;
  for (int by = 0; by < h2; ++by) {
    uint8_t* orow = out + static_cast<size_t>(by) * w2 * 6;
    const uint8_t* r0 = rgb + static_cast<size_t>(2 * by) * w * 3;
    const uint8_t* r1 = r0 + static_cast<size_t>(w) * 3;
    for (int bx = 0; bx < w2; ++bx) {
      const uint8_t* p[4] = {r0 + 2 * bx * 3, r0 + (2 * bx + 1) * 3,
                             r1 + 2 * bx * 3, r1 + (2 * bx + 1) * 3};
      int cb_sum = 0, cr_sum = 0;
      uint8_t* o = orow + bx * 6;
      for (int i = 0; i < 4; ++i) {
        const int r = p[i][0], g = p[i][1], b = p[i][2];
        const int y = (19595 * r + 38470 * g + 7471 * b + 32768) >> 16;
        const int cb =
            ((-11056 * r - 21712 * g + 32768 * b + 32768) >> 16) + 128;
        const int cr =
            ((32768 * r - 27440 * g - 5328 * b + 32768) >> 16) + 128;
        o[i] = static_cast<uint8_t>(std::clamp(y, 0, 255));
        cb_sum += std::clamp(cb, 0, 255);
        cr_sum += std::clamp(cr, 0, 255);
      }
      o[4] = static_cast<uint8_t>((cb_sum + 2) >> 2);
      o[5] = static_cast<uint8_t>((cr_sum + 2) >> 2);
    }
  }
}

// packed (h2, w2, 6) → RGB uint8 (2*h2, 2*w2, 3), nearest chroma upsample.
void qie_yuv420_unpack(const uint8_t* packed, int h2, int w2, uint8_t* rgb) {
  const int w = 2 * w2;
  for (int by = 0; by < h2; ++by) {
    const uint8_t* prow = packed + static_cast<size_t>(by) * w2 * 6;
    uint8_t* r0 = rgb + static_cast<size_t>(2 * by) * w * 3;
    uint8_t* r1 = r0 + static_cast<size_t>(w) * 3;
    for (int bx = 0; bx < w2; ++bx) {
      const uint8_t* o = prow + bx * 6;
      const int cb = o[4] - 128, cr = o[5] - 128;
      const int dr = (91881 * cr + 32768) >> 16;
      const int dg = (22554 * cb + 46802 * cr + 32768) >> 16;
      const int db = (116130 * cb + 32768) >> 16;
      uint8_t* q[4] = {r0 + 2 * bx * 3, r0 + (2 * bx + 1) * 3,
                       r1 + 2 * bx * 3, r1 + (2 * bx + 1) * 3};
      for (int i = 0; i < 4; ++i) {
        const int y = o[i];
        q[i][0] = static_cast<uint8_t>(std::clamp(y + dr, 0, 255));
        q[i][1] = static_cast<uint8_t>(std::clamp(y - dg, 0, 255));
        q[i][2] = static_cast<uint8_t>(std::clamp(y + db, 0, 255));
      }
    }
  }
}

}  // extern "C"
