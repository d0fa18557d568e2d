// trackformer_tpu native host library.
//
// The reference's native layer is its CUDA MSDeformAttn op; on TPU that role
// is played by the fused XLA gather path (ops/msda.py). What remains hot on
// the HOST is the per-frame input pipeline and MOTS RLE codec — implemented
// here as a small C++ library bound via ctypes (pybind11 is not available in
// this image).
//
// Exposed (extern "C"):
//   tf_resize_normalize_pad: fused uint8 HWC -> bilinear resize ->
//       (x/255 - mean)/std -> zero-pad to bucket, single pass over the
//       output, OpenMP-parallel over rows.
//   tf_rle_encode / tf_rle_decode: COCO compressed RLE (column-major runs,
//       LEB128-style zigzag varints).
//
// Build: make -C native   (or python setup.py build_native)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Triangle-filter (PIL BILINEAR) weight table: for output index i, source
// taps [bounds[i], bounds[i] + ksize) with weights w[i * ksize ...].
static int64_t build_weights(int64_t in_size, int64_t out_size,
                             float** weights_out, int64_t** bounds_out) {
  const double scale = static_cast<double>(in_size) / out_size;
  const double support = (scale >= 1.0 ? scale : 1.0);  // filter radius
  const int64_t ksize = static_cast<int64_t>(std::ceil(support)) * 2 + 1;
  float* weights = new float[out_size * ksize]();
  int64_t* bounds = new int64_t[out_size * 2];
  const double inv_scale = 1.0 / (scale >= 1.0 ? scale : 1.0);
  for (int64_t i = 0; i < out_size; ++i) {
    const double center = (i + 0.5) * scale;
    int64_t xmin = static_cast<int64_t>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int64_t xmax = static_cast<int64_t>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    const int64_t n = xmax - xmin;
    double total = 0.0;
    for (int64_t k = 0; k < n; ++k) {
      const double d = std::fabs((xmin + k + 0.5 - center) * inv_scale);
      const double wgt = d < 1.0 ? 1.0 - d : 0.0;
      weights[i * ksize + k] = static_cast<float>(wgt);
      total += wgt;
    }
    if (total > 0.0) {
      for (int64_t k = 0; k < n; ++k)
        weights[i * ksize + k] = static_cast<float>(
            weights[i * ksize + k] / total);
    }
    bounds[i * 2] = xmin;
    bounds[i * 2 + 1] = n;
  }
  *weights_out = weights;
  *bounds_out = bounds;
  return ksize;
}

// src: (h, w, 3) uint8 row-major. dst: (pad_h, pad_w, 3) float32, fully
// overwritten (padding zeroed). Separable triangle resampling matching PIL
// Image.BILINEAR, fused with (x/255 - mean)/std normalization.
void tf_resize_normalize_pad(const uint8_t* src, int64_t src_h, int64_t src_w,
                             float* dst, int64_t out_h, int64_t out_w,
                             int64_t pad_h, int64_t pad_w,
                             const float* mean, const float* stddev) {
  float* wx;
  int64_t* bx;
  const int64_t kx = build_weights(src_w, out_w, &wx, &bx);
  float* wy;
  int64_t* by;
  const int64_t ky = build_weights(src_h, out_h, &wy, &by);

  // pass 1: horizontal, uint8 -> float tmp (src_h, out_w, 3)
  float* tmp = new float[src_h * out_w * 3];
#pragma omp parallel for schedule(static)
  for (int64_t y = 0; y < src_h; ++y) {
    const uint8_t* srow = src + y * src_w * 3;
    float* trow = tmp + y * out_w * 3;
    for (int64_t ox = 0; ox < out_w; ++ox) {
      const int64_t x0 = bx[ox * 2], n = bx[ox * 2 + 1];
      const float* w = wx + ox * kx;
      float acc0 = 0, acc1 = 0, acc2 = 0;
      for (int64_t k = 0; k < n; ++k) {
        const uint8_t* px = srow + (x0 + k) * 3;
        acc0 += w[k] * px[0];
        acc1 += w[k] * px[1];
        acc2 += w[k] * px[2];
      }
      trow[ox * 3] = acc0;
      trow[ox * 3 + 1] = acc1;
      trow[ox * 3 + 2] = acc2;
    }
  }

  const float inv255 = 1.0f / 255.0f;
  float scale_c[3], shift_c[3];
  for (int c = 0; c < 3; ++c) {
    scale_c[c] = inv255 / stddev[c];
    shift_c[c] = mean[c] / stddev[c];
  }

  // pass 2: vertical + normalize + pad
#pragma omp parallel for schedule(static)
  for (int64_t oy = 0; oy < pad_h; ++oy) {
    float* row = dst + oy * pad_w * 3;
    if (oy >= out_h) {
      std::memset(row, 0, sizeof(float) * pad_w * 3);
      continue;
    }
    const int64_t y0 = by[oy * 2], n = by[oy * 2 + 1];
    const float* w = wy + oy * ky;
    for (int64_t ox = 0; ox < out_w; ++ox) {
      float acc[3] = {0, 0, 0};
      for (int64_t k = 0; k < n; ++k) {
        const float* px = tmp + ((y0 + k) * out_w + ox) * 3;
        acc[0] += w[k] * px[0];
        acc[1] += w[k] * px[1];
        acc[2] += w[k] * px[2];
      }
      for (int c = 0; c < 3; ++c)
        row[ox * 3 + c] = acc[c] * scale_c[c] - shift_c[c];
    }
    std::memset(row + out_w * 3, 0, sizeof(float) * (pad_w - out_w) * 3);
  }

  delete[] tmp;
  delete[] wx;
  delete[] bx;
  delete[] wy;
  delete[] by;
}

// mask: (h, w) uint8 row-major; runs are counted column-major (Fortran).
// out: chars; returns encoded length, or -1 if out_cap too small.
int64_t tf_rle_encode(const uint8_t* mask, int64_t h, int64_t w,
                      char* out, int64_t out_cap) {
  // column-major run lengths
  int64_t n_counts = 0;
  // worst case: h*w runs
  int64_t* counts = new int64_t[h * w + 1];
  int64_t run = 0;
  uint8_t val = 0;
  for (int64_t x = 0; x < w; ++x) {
    for (int64_t y = 0; y < h; ++y) {
      const uint8_t m = mask[y * w + x] ? 1 : 0;
      if (m == val) {
        ++run;
      } else {
        counts[n_counts++] = run;
        run = 1;
        val = m;
      }
    }
  }
  counts[n_counts++] = run;

  int64_t pos = 0;
  for (int64_t i = 0; i < n_counts; ++i) {
    int64_t x = counts[i];
    if (i > 2) x -= counts[i - 2];
    bool more = true;
    while (more) {
      int64_t c = x & 0x1f;
      x >>= 5;
      more = !((x == 0 && !(c & 0x10)) || (x == -1 && (c & 0x10)));
      if (more) c |= 0x20;
      if (pos >= out_cap) {
        delete[] counts;
        return -1;
      }
      out[pos++] = static_cast<char>(c + 48);
    }
  }
  delete[] counts;
  return pos;
}

// s: encoded string of length n; out: (h, w) uint8 row-major, zero-filled
// by caller not required (fully overwritten). Returns 0 on success.
int tf_rle_decode(const char* s, int64_t n, int64_t h, int64_t w,
                  uint8_t* out) {
  int64_t* counts = new int64_t[h * w + 2];
  int64_t n_counts = 0;
  int64_t i = 0;
  while (i < n) {
    int64_t x = 0;
    int k = 0;
    bool more = true;
    while (more) {
      if (i >= n) {
        delete[] counts;
        return 1;
      }
      const int64_t c = s[i] - 48;
      x |= (c & 0x1f) << (5 * k);
      more = (c & 0x20) != 0;
      ++i;
      if (!more && (c & 0x10)) x |= int64_t(-1) << (5 * k + 5);
      ++k;
    }
    if (n_counts > 2) x += counts[n_counts - 2];
    counts[n_counts++] = x;
  }
  // expand column-major runs
  int64_t pos = 0;
  uint8_t val = 0;
  const int64_t total = h * w;
  for (int64_t ci = 0; ci < n_counts; ++ci) {
    for (int64_t r = 0; r < counts[ci] && pos < total; ++r, ++pos) {
      const int64_t y = pos % h;
      const int64_t x = pos / h;
      out[y * w + x] = val;
    }
    val ^= 1;
  }
  delete[] counts;
  return pos == total ? 0 : 2;
}

}  // extern "C"
