// Native host-side data-pipeline kernels for accunet_tpu.
//
// TPU-native counterpart of the reference's C++/CUDA data-path ambitions:
// the reference's hot host loop is cv2.resize + per-image standardization
// (/root/reference/Experiments/Load_Dataset.py:461-487). These kernels
// implement the same half-pixel-center bilinear / nearest resizes and the
// (x - mean) / (std + 1e-8) standardization in portable C++ so the 1-core
// input pipeline keeps TPU steps fed. Exposed via ctypes (no pybind11 in
// this image); built on demand by accunet_tpu/data/native_loader.py.

#include <cmath>
#include <cstdint>
#include <algorithm>

extern "C" {

// Bilinear resize, half-pixel centers (cv2.INTER_LINEAR convention).
// src: (h, w) float32 row-major; dst: (oh, ow).
void resize_bilinear_f32(const float* src, int h, int w,
                         float* dst, int oh, int ow) {
  const float sy = static_cast<float>(h) / oh;
  const float sx = static_cast<float>(w) / ow;
  for (int y = 0; y < oh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    if (fy < 0) fy = 0;
    int y0 = static_cast<int>(fy);
    if (y0 > h - 1) y0 = h - 1;
    int y1 = std::min(y0 + 1, h - 1);
    float wy = fy - y0;
    for (int x = 0; x < ow; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      if (fx < 0) fx = 0;
      int x0 = static_cast<int>(fx);
      if (x0 > w - 1) x0 = w - 1;
      int x1 = std::min(x0 + 1, w - 1);
      float wx = fx - x0;
      float top = src[y0 * w + x0] * (1 - wx) + src[y0 * w + x1] * wx;
      float bot = src[y1 * w + x0] * (1 - wx) + src[y1 * w + x1] * wx;
      dst[y * ow + x] = top * (1 - wy) + bot * wy;
    }
  }
}

// Nearest resize (cv2.INTER_NEAREST convention: round-half-down via floor of
// scaled index).
void resize_nearest_f32(const float* src, int h, int w,
                        float* dst, int oh, int ow) {
  const float sy = static_cast<float>(h) / oh;
  const float sx = static_cast<float>(w) / ow;
  for (int y = 0; y < oh; ++y) {
    int yi = std::min(static_cast<int>(y * sy), h - 1);
    for (int x = 0; x < ow; ++x) {
      int xi = std::min(static_cast<int>(x * sx), w - 1);
      dst[y * ow + x] = src[yi * w + xi];
    }
  }
}

// In-place (x - mean) / (std + 1e-8) over n elements
// (Load_Dataset.py:474-476; std is the biased torch .std()? torch .std() is
// unbiased (n-1); reproduced here).
void standardize_f32(float* x, long n) {
  double mean = 0.0;
  for (long i = 0; i < n; ++i) mean += x[i];
  mean /= n;
  double var = 0.0;
  for (long i = 0; i < n; ++i) {
    double d = x[i] - mean;
    var += d * d;
  }
  var /= (n > 1 ? (n - 1) : 1);
  const float std_eps = static_cast<float>(std::sqrt(var)) + 1e-8f;
  const float m = static_cast<float>(mean);
  for (long i = 0; i < n; ++i) x[i] = (x[i] - m) / std_eps;
}

// Binarize mask in place: x = (x > 0)
void binarize_f32(float* x, long n) {
  for (long i = 0; i < n; ++i) x[i] = x[i] > 0.0f ? 1.0f : 0.0f;
}

}  // extern "C"
