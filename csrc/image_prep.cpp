// Native image preprocessing for the LaViDa data pipeline.
//
// The reference's host-side pipeline is PIL (resize/pad/crop per anyres
// view, mm_utils.py:244-297) — single-threaded C inside Python glue.  At
// serving rates the 5-view anyres prep is a real cost, so this extension
// implements the hot path natively:
//
//   prep_view: uint8 HWC -> resample (separable convolution, PIL-style
//   scaled-support kernels: bilinear / Catmull-Rom bicubic / Lanczos3) ->
//   normalize ((x*scale - mean)/std) -> float32 CHW,
//   multithreaded across output rows.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in the image).
// Build: make -C csrc   (produces libimage_prep.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

// --- filter kernels (PIL semantics: support scaled by max(1, in/out)) ---

struct Filter {
  double support;
  double (*fn)(double);
};

double bilinear_k(double x) {
  x = std::abs(x);
  return x < 1.0 ? 1.0 - x : 0.0;
}

double bicubic_k(double x) {  // Catmull-Rom a = -0.5 (PIL BICUBIC)
  constexpr double a = -0.5;
  x = std::abs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

double lanczos_k(double x) {
  x = std::abs(x);
  if (x >= 3.0) return 0.0;
  if (x < 1e-12) return 1.0;
  const double pix = M_PI * x;
  return 3.0 * std::sin(pix) * std::sin(pix / 3.0) / (pix * pix);
}

Filter get_filter(int id) {
  switch (id) {
    case 0: return {1.0, bilinear_k};
    case 1: return {2.0, bicubic_k};
    default: return {3.0, lanczos_k};
  }
}

// precomputed sampling weights for one axis (PIL's precompute_coeffs)
struct AxisWeights {
  std::vector<int> starts;
  std::vector<int> sizes;
  std::vector<double> weights;  // [out, ksize] flattened
  int ksize;
};

AxisWeights compute_weights(int in_size, int out_size, const Filter& f) {
  AxisWeights aw;
  double scale = static_cast<double>(in_size) / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = f.support * filterscale;
  int ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  aw.ksize = ksize;
  aw.starts.resize(out_size);
  aw.sizes.resize(out_size);
  aw.weights.assign(static_cast<size_t>(out_size) * ksize, 0.0);
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int xmin = std::max(0, static_cast<int>(center - support + 0.5));
    int xmax = std::min(in_size, static_cast<int>(center + support + 0.5));
    double total = 0.0;
    for (int x = xmin; x < xmax; ++x) {
      double w = f.fn((x - center + 0.5) / filterscale);
      aw.weights[static_cast<size_t>(xx) * ksize + (x - xmin)] = w;
      total += w;
    }
    if (total != 0.0) {
      for (int x = 0; x < xmax - xmin; ++x)
        aw.weights[static_cast<size_t>(xx) * ksize + x] /= total;
    }
    aw.starts[xx] = xmin;
    aw.sizes[xx] = xmax - xmin;
  }
  return aw;
}

void parallel_rows(int rows, const std::function<void(int, int)>& body) {
  unsigned n = std::min(std::max(std::thread::hardware_concurrency(), 1u),
                        static_cast<unsigned>(rows));
  if (n <= 1) {
    body(0, rows);
    return;
  }
  std::vector<std::thread> ts;
  int chunk = (rows + n - 1) / n;
  for (unsigned t = 0; t < n; ++t) {
    int lo = t * chunk;
    int hi = std::min(rows, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back(body, lo, hi);
  }
  for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

// src: uint8 [H, W, C]; dst: float32 [C, out_h, out_w]
// filter_id: 0 bilinear, 1 bicubic, 2 lanczos3
// mean/std/scale applied as (v * scale - mean[c]) / std[c]
int prep_view(const uint8_t* src, int h, int w, int c,
              float* dst, int out_h, int out_w,
              int filter_id, double scale,
              const double* mean, const double* stddev) {
  if (c <= 0 || c > 4) return -1;
  Filter f = get_filter(filter_id);
  AxisWeights wx = compute_weights(w, out_w, f);
  AxisWeights wy = compute_weights(h, out_h, f);

  // horizontal pass: [h, out_w, c] doubles
  std::vector<double> tmp(static_cast<size_t>(h) * out_w * c);
  parallel_rows(h, [&](int lo, int hi) {
    for (int y = lo; y < hi; ++y) {
      const uint8_t* srow = src + static_cast<size_t>(y) * w * c;
      double* trow = tmp.data() + static_cast<size_t>(y) * out_w * c;
      for (int xx = 0; xx < out_w; ++xx) {
        const double* ws = wx.weights.data() +
                           static_cast<size_t>(xx) * wx.ksize;
        int start = wx.starts[xx], size = wx.sizes[xx];
        for (int ch = 0; ch < c; ++ch) {
          double acc = 0.0;
          for (int k = 0; k < size; ++k)
            acc += ws[k] * srow[(start + k) * c + ch];
          // PIL quantizes the horizontal pass back to uint8
          trow[xx * c + ch] =
              std::min(std::max(std::round(acc), 0.0), 255.0);
        }
      }
    }
  });

  // vertical pass + normalize -> CHW float32
  const size_t plane = static_cast<size_t>(out_h) * out_w;
  parallel_rows(out_h, [&](int lo, int hi) {
    for (int yy = lo; yy < hi; ++yy) {
      const double* wsrow = wy.weights.data() +
                            static_cast<size_t>(yy) * wy.ksize;
      int start = wy.starts[yy], size = wy.sizes[yy];
      for (int xx = 0; xx < out_w; ++xx) {
        for (int ch = 0; ch < c; ++ch) {
          double acc = 0.0;
          for (int k = 0; k < size; ++k)
            acc += wsrow[k] *
                   tmp[(static_cast<size_t>(start + k) * out_w + xx) * c + ch];
          // PIL rounds + clips the final resampled value to uint8 before
          // the numpy normalize sees it
          acc = std::min(std::max(std::round(acc), 0.0), 255.0);
          double v = (acc * scale - mean[ch]) / stddev[ch];
          dst[ch * plane + static_cast<size_t>(yy) * out_w + xx] =
              static_cast<float>(v);
        }
      }
    }
  });
  return 0;
}

// resize-and-center-pad (anyres geometry, mm_utils.py:152-188), output CHW
// normalized; pad pixels are (0*scale - mean)/std (black canvas).
int prep_pad_view(const uint8_t* src, int h, int w, int c,
                  float* dst, int target_h, int target_w,
                  int new_h, int new_w, int paste_y, int paste_x,
                  int filter_id, double scale,
                  const double* mean, const double* stddev) {
  std::vector<float> inner(static_cast<size_t>(c) * new_h * new_w);
  int rc = prep_view(src, h, w, c, inner.data(), new_h, new_w, filter_id,
                     scale, mean, stddev);
  if (rc != 0) return rc;
  const size_t plane = static_cast<size_t>(target_h) * target_w;
  for (int ch = 0; ch < c; ++ch) {
    float pad = static_cast<float>((0.0 - mean[ch]) / stddev[ch]);
    float* dplane = dst + ch * plane;
    std::fill(dplane, dplane + plane, pad);
    for (int y = 0; y < new_h; ++y) {
      std::memcpy(
          dplane + static_cast<size_t>(paste_y + y) * target_w + paste_x,
          inner.data() + (static_cast<size_t>(ch) * new_h + y) * new_w,
          sizeof(float) * new_w);
    }
  }
  return 0;
}

}  // extern "C"
