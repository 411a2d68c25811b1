// Native host-side data kernels for sdn3d_tpu.
//
// TPU-native counterpart of the reference's C/FFI layer: where the
// reference ships C+CUDA NMS / ROIAlign (geometric/maskrcnn/*/src) and a
// forked multi-process torch DataLoader (semantic/lib/utils/data), the TPU
// rebuild moves NMS/ROIAlign onto the chip (XLA/Pallas) and keeps the
// host-side image preparation native:
//
//   * scenegt_decode       — RGB -> class/instance ids via a sorted LUT
//                            (datasets/vkitti_utils.py get_tables consumer)
//   * resize_bilinear_f32  — PIL-convention bilinear resize
//   * crop_square_resize   — the per-ROI square-crop + resize + normalize
//                            pipeline (derender3d Transforms.crop_square,
//                            geometric/scripts/main.py:365-373)
//   * nms_cpu              — greedy suppression, parity with
//                            maskrcnn/nms/src/nms.c (pixel-inclusive areas)
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// keys: sorted uint32 (r<<16|g<<8|b), n_keys entries; vals parallel array.
// img: [h*w*3] uint8. out: [h*w] int32 (-1 when missing).
void scenegt_decode(const uint8_t* img, int h, int w,
                    const uint32_t* keys, const int32_t* vals, int n_keys,
                    int32_t* out) {
  const int n = h * w;
  for (int i = 0; i < n; ++i) {
    const uint32_t code = (uint32_t(img[3 * i]) << 16) |
                          (uint32_t(img[3 * i + 1]) << 8) |
                          uint32_t(img[3 * i + 2]);
    const uint32_t* it = std::lower_bound(keys, keys + n_keys, code);
    out[i] = (it != keys + n_keys && *it == code) ? vals[it - keys] : -1;
  }
}

// PIL BILINEAR convolution resampling (triangle filter whose support
// scales with the reduction factor — NOT point-sampled bilinear; this is
// what Image.resize(..., BILINEAR) computes and what the reference's PIL /
// torchvision transforms produce).
namespace {

struct FilterTaps {
  std::vector<int> lo;        // first source index per output pixel
  std::vector<int> count;     // taps per output pixel
  std::vector<float> w;       // weights, `max_taps` stride
  int max_taps = 0;
};

FilterTaps build_taps(int in_size, int out_size) {
  FilterTaps t;
  const double scale = double(in_size) / out_size;
  const double fscale = std::max(scale, 1.0);
  const double support = 1.0 * fscale;       // triangle filter support
  t.max_taps = int(std::ceil(support)) * 2 + 1;
  t.lo.resize(out_size);
  t.count.resize(out_size);
  t.w.assign(size_t(out_size) * t.max_taps, 0.0f);
  for (int x = 0; x < out_size; ++x) {
    const double center = (x + 0.5) * scale;
    int lo = int(center - support + 0.5);
    int hi = int(center + support + 0.5);
    lo = std::max(lo, 0);
    hi = std::min(hi, in_size);
    double total = 0.0;
    for (int i = lo; i < hi; ++i) {
      const double d = (i + 0.5 - center) / fscale;
      const double weight = (d < -1.0 || d > 1.0)
                                ? 0.0
                                : 1.0 - std::abs(d);  // triangle
      t.w[size_t(x) * t.max_taps + (i - lo)] = float(weight);
      total += weight;
    }
    if (total > 0)
      for (int i = 0; i < hi - lo; ++i)
        t.w[size_t(x) * t.max_taps + i] /= float(total);
    t.lo[x] = lo;
    t.count[x] = hi - lo;
  }
  return t;
}

}  // namespace

void resize_bilinear_f32(const float* src, int sh, int sw, int c,
                         float* dst, int dh, int dw) {
  const FilterTaps tx = build_taps(sw, dw);
  const FilterTaps ty = build_taps(sh, dh);

  // horizontal pass: [sh, dw, c]
  std::vector<float> tmp(size_t(sh) * dw * c, 0.0f);
  for (int y = 0; y < sh; ++y)
    for (int x = 0; x < dw; ++x) {
      const int lo = tx.lo[x], n = tx.count[x];
      const float* wrow = &tx.w[size_t(x) * tx.max_taps];
      for (int i = 0; i < n; ++i) {
        const float weight = wrow[i];
        const float* s = &src[(size_t(y) * sw + lo + i) * c];
        float* d = &tmp[(size_t(y) * dw + x) * c];
        for (int k = 0; k < c; ++k) d[k] += weight * s[k];
      }
    }
  // vertical pass: [dh, dw, c]
  std::memset(dst, 0, sizeof(float) * size_t(dh) * dw * c);
  for (int y = 0; y < dh; ++y) {
    const int lo = ty.lo[y], n = ty.count[y];
    const float* wcol = &ty.w[size_t(y) * ty.max_taps];
    for (int i = 0; i < n; ++i) {
      const float weight = wcol[i];
      const float* s = &tmp[size_t(lo + i) * dw * c];
      float* d = &dst[size_t(y) * dw * c];
      for (int j = 0; j < dw * c; ++j) d[j] += weight * s[j];
    }
  }
}

// Square crop around roi (y1,x1,y2,x2) with `fill` padding, resize to
// (size,size), then (v - mean)/std per channel.  img: [h*w*c] float32.
void crop_square_resize(const float* img, int h, int w, int c,
                        const int* roi, float fill, int size,
                        const float* mean, const float* stddev, float* out) {
  const int ry1 = roi[0], rx1 = roi[1], ry2 = roi[2], rx2 = roi[3];
  const int rh = ry2 - ry1, rw = rx2 - rx1;
  const int s = std::max(rh, rw);
  const int dh = (s - rh) / 2, dw = (s - rw) / 2;
  const int top = ry1 - dh, left = rx1 - dw;

  std::vector<float> crop(size_t(s) * s * c, fill);
  const int sy1 = std::max(0, top), sx1 = std::max(0, left);
  const int sy2 = std::min(h, top + s), sx2 = std::min(w, left + s);
  // An ROI fully outside the image leaves sx2 <= sx1 (or sy2 <= sy1):
  // skip the copy entirely — a negative memcpy length would wrap to a
  // huge size_t (the numpy fallback guards the same way, vkitti.py).
  if (sx2 > sx1) {
    for (int y = sy1; y < sy2; ++y) {
      std::memcpy(&crop[((y - top) * size_t(s) + (sx1 - left)) * c],
                  &img[(y * size_t(w) + sx1) * c],
                  sizeof(float) * c * (sx2 - sx1));
    }
  }
  std::vector<float> resized(size_t(size) * size * c);
  resize_bilinear_f32(crop.data(), s, s, c, resized.data(), size, size);
  for (int i = 0; i < size * size; ++i)
    for (int k = 0; k < c; ++k)
      out[i * c + k] = (resized[i * c + k] - mean[k]) / stddev[k];
}

// Greedy NMS over score-sorted boxes [n,4] (y1,x1,y2,x2); keep: [n] u8.
// Pixel-inclusive areas, parity with maskrcnn/nms/src/nms.c:4-68.
void nms_cpu(const float* boxes, int n, float threshold, uint8_t* keep) {
  std::vector<float> areas(n);
  for (int i = 0; i < n; ++i)
    areas[i] = (boxes[4 * i + 2] - boxes[4 * i] + 1) *
               (boxes[4 * i + 3] - boxes[4 * i + 1] + 1);
  std::fill(keep, keep + n, 1);
  for (int i = 0; i < n; ++i) {
    if (!keep[i]) continue;
    for (int j = i + 1; j < n; ++j) {
      if (!keep[j]) continue;
      const float yy1 = std::max(boxes[4 * i], boxes[4 * j]);
      const float xx1 = std::max(boxes[4 * i + 1], boxes[4 * j + 1]);
      const float yy2 = std::min(boxes[4 * i + 2], boxes[4 * j + 2]);
      const float xx2 = std::min(boxes[4 * i + 3], boxes[4 * j + 3]);
      const float iw = std::max(0.0f, yy2 - yy1 + 1);
      const float ih = std::max(0.0f, xx2 - xx1 + 1);
      const float inter = iw * ih;
      const float iou = inter / (areas[i] + areas[j] - inter);
      if (iou > threshold) keep[j] = 0;
    }
  }
}

}  // extern "C"
