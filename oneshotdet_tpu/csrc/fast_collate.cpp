// Native host-side preprocessing for the data pipeline.
//
// The reference relies on torch's C++ DataLoader machinery + PIL for its
// host path (SURVEY §2.3); this is the TPU framework's native equivalent:
// one fused pass that resamples a decoded uint8 RGB image with the SAME
// triangle (bilinear) filter PIL uses (support widened by the inverse scale
// on downsampling, so results are antialiased and parity-exact with the
// reference's torchvision/PIL resize), converts RGB->BGR255, subtracts the
// pixel mean, divides by std, and writes straight into the zero-padded
// bucket slot of the batch tensor — no intermediate images, no extra copies.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).
// Build: g++ -O3 -shared -fPIC (oneshotdet_tpu/csrc/build.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Coeffs {
  // for each output index: taps in [bounds[2i], bounds[2i]+bounds[2i+1])
  std::vector<int> bounds;      // (out, 2): start, count
  std::vector<double> weights;  // (out, ksize)
  int ksize = 0;
};

// PIL's precompute_coeffs for the triangle (BILINEAR) filter.
Coeffs precompute(int in_size, int out_size) {
  Coeffs c;
  double scale = static_cast<double>(in_size) / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = 1.0 * filterscale;  // triangle filter support = 1
  int ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  c.ksize = ksize;
  c.bounds.resize(out_size * 2);
  c.weights.assign(static_cast<size_t>(out_size) * ksize, 0.0);

  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    double ww = 0.0;
    double ss = 1.0 / filterscale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    double* k = &c.weights[static_cast<size_t>(xx) * ksize];
    int x = 0;
    for (; x < xmax; ++x) {
      double arg = (x + xmin - center + 0.5) * ss;
      double w = arg < 0 ? arg + 1.0 : 1.0 - arg;  // triangle
      if (w < 0) w = 0;
      k[x] = w;
      ww += w;
    }
    if (ww != 0.0) {
      for (int i = 0; i < xmax; ++i) k[i] /= ww;
    }
    c.bounds[xx * 2] = xmin;
    c.bounds[xx * 2 + 1] = xmax;
  }
  return c;
}

}  // namespace

extern "C" {

// Resample (h0, w0, 3) uint8 RGB -> normalized float32 written into the
// (pad_h, pad_w, 3) destination at offset (0, 0); the rest of dst must be
// pre-zeroed by the caller (it is part of a batch buffer).
// to_bgr255: swap channels and scale to 0..255 before mean/std (the
// reference's Normalize with TO_BGR255, data/transforms/transforms.py:79-90).
void resize_normalize_pad(const uint8_t* src, int h0, int w0,
                          float* dst, int out_h, int out_w,
                          int pad_h, int pad_w,
                          const float* mean, const float* stddev,
                          int to_bgr255) {
  Coeffs cx = precompute(w0, out_w);
  Coeffs cy = precompute(h0, out_h);

  // pass 1: horizontal resample to (h0, out_w, 3) float
  std::vector<float> tmp(static_cast<size_t>(h0) * out_w * 3);
  for (int y = 0; y < h0; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * w0 * 3;
    float* trow = tmp.data() + static_cast<size_t>(y) * out_w * 3;
    for (int x = 0; x < out_w; ++x) {
      int xmin = cx.bounds[x * 2];
      int xcount = cx.bounds[x * 2 + 1];
      const double* k = &cx.weights[static_cast<size_t>(x) * cx.ksize];
      double acc0 = 0, acc1 = 0, acc2 = 0;
      for (int i = 0; i < xcount; ++i) {
        const uint8_t* p = row + static_cast<size_t>(xmin + i) * 3;
        acc0 += k[i] * p[0];
        acc1 += k[i] * p[1];
        acc2 += k[i] * p[2];
      }
      trow[x * 3 + 0] = static_cast<float>(acc0);
      trow[x * 3 + 1] = static_cast<float>(acc1);
      trow[x * 3 + 2] = static_cast<float>(acc2);
    }
  }

  // pass 2: vertical resample + normalize + write into padded destination
  const float inv255 = 1.0f / 255.0f;
  for (int y = 0; y < out_h; ++y) {
    int ymin = cy.bounds[y * 2];
    int ycount = cy.bounds[y * 2 + 1];
    const double* k = &cy.weights[static_cast<size_t>(y) * cy.ksize];
    float* drow = dst + static_cast<size_t>(y) * pad_w * 3;
    for (int x = 0; x < out_w; ++x) {
      double acc0 = 0, acc1 = 0, acc2 = 0;
      for (int i = 0; i < ycount; ++i) {
        const float* p =
            tmp.data() + (static_cast<size_t>(ymin + i) * out_w + x) * 3;
        acc0 += k[i] * p[0];
        acc1 += k[i] * p[1];
        acc2 += k[i] * p[2];
      }
      // PIL rounds to uint8 between resize and normalize; reproduce that
      float r = std::min(std::max(std::round(acc0), 0.0), 255.0);
      float g = std::min(std::max(std::round(acc1), 0.0), 255.0);
      float b = std::min(std::max(std::round(acc2), 0.0), 255.0);
      float c0, c1, c2;
      if (to_bgr255) {
        c0 = b; c1 = g; c2 = r;  // BGR, already 0..255
      } else {
        c0 = r * inv255; c1 = g * inv255; c2 = b * inv255;
      }
      drow[x * 3 + 0] = (c0 - mean[0]) / stddev[0];
      drow[x * 3 + 1] = (c1 - mean[1]) / stddev[1];
      drow[x * 3 + 2] = (c2 - mean[2]) / stddev[2];
    }
  }
}

// Zero-pad copy of an already-normalized (h, w, 3) float image into a
// (pad_h, pad_w, 3) batch slot (the plain collator hot loop).
void pad_copy(const float* src, int h, int w, float* dst, int pad_h, int pad_w) {
  for (int y = 0; y < h; ++y) {
    std::memcpy(dst + static_cast<size_t>(y) * pad_w * 3,
                src + static_cast<size_t>(y) * w * 3,
                static_cast<size_t>(w) * 3 * sizeof(float));
  }
}

// 2x2 space-to-depth: (h, w, c) -> (h/2, w/2, 4c), channel order
// (row-parity, col-parity, c) — the layout the backbone stem's blocked
// fast path consumes (data/transforms.py::space_to_depth). The numpy
// reshape/transpose costs ~10 ms per 832x1216 image; this is a straight
// strided copy (~3x faster) that workers run in parallel.
void space_to_depth2(const float* src, int h, int w, int c, float* dst) {
  const int h2 = h / 2, w2 = w / 2;
  const size_t row = static_cast<size_t>(w) * c;
  const size_t orow = static_cast<size_t>(w2) * 4 * c;
  for (int y = 0; y < h2; ++y) {
    for (int py = 0; py < 2; ++py) {
      const float* srow = src + (static_cast<size_t>(2 * y) + py) * row;
      float* drow = dst + static_cast<size_t>(y) * orow +
                    static_cast<size_t>(py) * 2 * c;
      for (int x = 0; x < w2; ++x) {
        // both column parities of one output pixel are contiguous in src
        std::memcpy(drow + static_cast<size_t>(x) * 4 * c,
                    srow + static_cast<size_t>(2 * x) * c,
                    2 * c * sizeof(float));
      }
    }
  }
}

}  // extern "C"
