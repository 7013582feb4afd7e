// semseg_tpu native host-preprocessing library.
//
// The reference framework's host data path is PIL decode + PIL resize +
// numpy normalize + tensor pad, run in 16 forked worker processes
// (/root/reference/mit_semseg/dataset.py:53-58,172-194, train.py:170-177).
// This library fuses the post-decode stages into single C++ passes that
// release the GIL, so a small thread pool keeps TPU chips fed:
//
//   * ssg_resize_bilinear_u8 — separable triangle-filter resampling with
//     Pillow's fixed-point arithmetic (adaptive kernel support, so
//     downscales are antialiased exactly like Image.resize(BILINEAR));
//   * ssg_resize_nearest_u8  — Pillow NEAREST (affine center sampling);
//   * ssg_normalize_pad      — uint8 -> float32 (x/255 - mean)/std with
//     zero padding to a bucketed canvas;
//   * ssg_preprocess         — resize + normalize + pad in one call.
//
// Exposed as a plain C ABI for ctypes binding (no pybind11 dependency).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// Pillow-compatible fixed-point precision (8-bit data path).
constexpr int kPrecisionBits = 32 - 8 - 2;

struct Filter {
  // For each output index: contribution window [bounds_min, bounds_min+size)
  // and quantized triangle weights.
  std::vector<int> bounds_min;
  std::vector<int> bounds_size;
  std::vector<std::vector<int>> coeffs;
};

inline double triangle(double x) {
  x = std::fabs(x);
  return x < 1.0 ? 1.0 - x : 0.0;
}

// Precompute the separable resampling filter for one axis, mirroring
// Pillow's adaptive-support algorithm: support scales with the reduction
// factor, weights are normalized in double then quantized to fixed point.
Filter build_filter(int in_size, int out_size) {
  Filter f;
  f.bounds_min.resize(out_size);
  f.bounds_size.resize(out_size);
  f.coeffs.resize(out_size);

  const double scale = static_cast<double>(in_size) / out_size;
  const double filterscale = std::max(scale, 1.0);
  const double support = 1.0 * filterscale;  // bilinear support = 1

  for (int xx = 0; xx < out_size; ++xx) {
    const double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;

    std::vector<double> w(xmax - xmin);
    double wsum = 0.0;
    for (int x = xmin; x < xmax; ++x) {
      w[x - xmin] = triangle((x - center + 0.5) / filterscale);
      wsum += w[x - xmin];
    }
    std::vector<int> k(w.size());
    for (size_t i = 0; i < w.size(); ++i) {
      const double v = (wsum != 0.0 ? w[i] / wsum : 0.0) * (1 << kPrecisionBits);
      k[i] = static_cast<int>(v < 0 ? v - 0.5 : v + 0.5);
    }
    f.bounds_min[xx] = xmin;
    f.bounds_size[xx] = static_cast<int>(w.size());
    f.coeffs[xx] = std::move(k);
  }
  return f;
}

inline uint8_t clip8(int64_t v) {
  v >>= kPrecisionBits;
  if (v < 0) return 0;
  if (v > 255) return 255;
  return static_cast<uint8_t>(v);
}

}  // namespace

extern "C" {

// Bilinear (Pillow-parity) resize of an interleaved uint8 image.
// src: (sh, sw, ch) row-major; dst: (th, tw, ch).
void ssg_resize_bilinear_u8(const uint8_t* src, int sh, int sw, int ch,
                            uint8_t* dst, int th, int tw) {
  const Filter fh = build_filter(sw, tw);  // horizontal
  const Filter fv = build_filter(sh, th);  // vertical

  // Pass 1: horizontal -> intermediate (sh, tw, ch).
  std::vector<uint8_t> mid(static_cast<size_t>(sh) * tw * ch);
  for (int y = 0; y < sh; ++y) {
    const uint8_t* srow = src + static_cast<size_t>(y) * sw * ch;
    uint8_t* drow = mid.data() + static_cast<size_t>(y) * tw * ch;
    for (int x = 0; x < tw; ++x) {
      const int xmin = fh.bounds_min[x];
      const int n = fh.bounds_size[x];
      const int* k = fh.coeffs[x].data();
      for (int c = 0; c < ch; ++c) {
        int64_t ss = 1 << (kPrecisionBits - 1);
        for (int i = 0; i < n; ++i) {
          ss += static_cast<int64_t>(srow[(xmin + i) * ch + c]) * k[i];
        }
        drow[x * ch + c] = clip8(ss);
      }
    }
  }

  // Pass 2: vertical -> dst (th, tw, ch).
  for (int y = 0; y < th; ++y) {
    const int ymin = fv.bounds_min[y];
    const int n = fv.bounds_size[y];
    const int* k = fv.coeffs[y].data();
    uint8_t* drow = dst + static_cast<size_t>(y) * tw * ch;
    for (int x = 0; x < tw; ++x) {
      for (int c = 0; c < ch; ++c) {
        int64_t ss = 1 << (kPrecisionBits - 1);
        for (int i = 0; i < n; ++i) {
          ss += static_cast<int64_t>(
                    mid[(static_cast<size_t>(ymin + i) * tw + x) * ch + c]) *
                k[i];
        }
        drow[x * ch + c] = clip8(ss);
      }
    }
  }
}

// Nearest-neighbor resize (Pillow NEAREST affine sampling).
void ssg_resize_nearest_u8(const uint8_t* src, int sh, int sw, int ch,
                           uint8_t* dst, int th, int tw) {
  const double ys = static_cast<double>(sh) / th;
  const double xs = static_cast<double>(sw) / tw;
  for (int y = 0; y < th; ++y) {
    int sy = static_cast<int>((y + 0.5) * ys);
    if (sy >= sh) sy = sh - 1;
    const uint8_t* srow = src + static_cast<size_t>(sy) * sw * ch;
    uint8_t* drow = dst + static_cast<size_t>(y) * tw * ch;
    for (int x = 0; x < tw; ++x) {
      int sx = static_cast<int>((x + 0.5) * xs);
      if (sx >= sw) sx = sw - 1;
      std::memcpy(drow + x * ch, srow + sx * ch, ch);
    }
  }
}

// uint8 (h, w, 3) -> float32 (ph, pw, 3): (x/255 - mean)/std, zero-padded.
void ssg_normalize_pad(const uint8_t* src, int h, int w, float* dst, int ph,
                       int pw, const float* mean, const float* stdv) {
  const float inv255 = 1.0f / 255.0f;
  float scale[3], shift[3];
  for (int c = 0; c < 3; ++c) {
    scale[c] = inv255 / stdv[c];
    shift[c] = -mean[c] / stdv[c];
  }
  std::memset(dst, 0, sizeof(float) * static_cast<size_t>(ph) * pw * 3);
  for (int y = 0; y < h; ++y) {
    const uint8_t* srow = src + static_cast<size_t>(y) * w * 3;
    float* drow = dst + static_cast<size_t>(y) * pw * 3;
    for (int x = 0; x < w; ++x) {
      for (int c = 0; c < 3; ++c) {
        drow[x * 3 + c] = srow[x * 3 + c] * scale[c] + shift[c];
      }
    }
  }
}

// Fused: bilinear resize (sh, sw, 3) -> (th, tw, 3), then normalize into a
// zero-padded float32 canvas (ph, pw, 3).
void ssg_preprocess(const uint8_t* src, int sh, int sw, int th, int tw,
                    int ph, int pw, const float* mean, const float* stdv,
                    float* dst) {
  std::vector<uint8_t> resized(static_cast<size_t>(th) * tw * 3);
  ssg_resize_bilinear_u8(src, sh, sw, 3, resized.data(), th, tw);
  ssg_normalize_pad(resized.data(), th, tw, dst, ph, pw, mean, stdv);
}

}  // extern "C"
