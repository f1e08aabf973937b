// hiast_tpu native host ops — the data-loader hot path in C++.
//
// The reference consumes native image ops through albumentations/OpenCV
// inside DataLoader worker processes (reference: code/sseg/datasets/
// augmentations.py, preprocessor.py:50-51).  This library provides the
// equivalent fused primitives for our single-process host pipeline:
// each call does ONE pass over the pixels, releases the GIL (called via
// ctypes), and fuses steps the numpy path would do in 2-4 temporaries.
//
// Exposed C ABI (all buffers caller-allocated, uint8 unless noted):
//   remap_u8            : 256-entry LUT label remap
//   nearest_resize_u8   : nearest-neighbor resize, C channels
//   bilinear_resize_u8  : separable bilinear resize (half-pixel centers)
//   paste_hard_classes  : fused HPA copy-paste (img+lbl+cp_mask in one pass)
//   crop_flip_resize_u8 : fused crop + optional hflip + bilinear resize
//
// Build: make -C native   (g++ -O3 -march=native -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <cmath>
#include <vector>

extern "C" {

void remap_u8(const uint8_t* src, const uint8_t* lut, uint8_t* dst, int64_t n) {
  for (int64_t i = 0; i < n; ++i) dst[i] = lut[src[i]];
}

void nearest_resize_u8(const uint8_t* src, int h, int w, int c,
                       uint8_t* dst, int oh, int ow) {
  std::vector<int> col(ow);
  for (int x = 0; x < ow; ++x)
    col[x] = std::min(static_cast<int>(x * (static_cast<double>(w) / ow)), w - 1);
  for (int y = 0; y < oh; ++y) {
    int sy = std::min(static_cast<int>(y * (static_cast<double>(h) / oh)), h - 1);
    const uint8_t* srow = src + static_cast<int64_t>(sy) * w * c;
    uint8_t* drow = dst + static_cast<int64_t>(y) * ow * c;
    if (c == 1) {
      for (int x = 0; x < ow; ++x) drow[x] = srow[col[x]];
    } else {
      for (int x = 0; x < ow; ++x)
        std::memcpy(drow + x * c, srow + col[x] * c, c);
    }
  }
}

// Separable bilinear with OpenCV's half-pixel source mapping.
void bilinear_resize_u8(const uint8_t* src, int h, int w, int c,
                        uint8_t* dst, int oh, int ow) {
  std::vector<int> x0(ow), x1(ow);
  std::vector<float> xf(ow);
  for (int x = 0; x < ow; ++x) {
    float sx = (x + 0.5f) * w / ow - 0.5f;
    sx = std::max(0.0f, std::min(sx, static_cast<float>(w - 1)));
    x0[x] = static_cast<int>(sx);
    x1[x] = std::min(x0[x] + 1, w - 1);
    xf[x] = sx - x0[x];
  }
  std::vector<float> row(static_cast<size_t>(ow) * c);
  for (int y = 0; y < oh; ++y) {
    float sy = (y + 0.5f) * h / oh - 0.5f;
    sy = std::max(0.0f, std::min(sy, static_cast<float>(h - 1)));
    int y0 = static_cast<int>(sy);
    int y1 = std::min(y0 + 1, h - 1);
    float yf = sy - y0;
    const uint8_t* r0 = src + static_cast<int64_t>(y0) * w * c;
    const uint8_t* r1 = src + static_cast<int64_t>(y1) * w * c;
    uint8_t* drow = dst + static_cast<int64_t>(y) * ow * c;
    for (int x = 0; x < ow; ++x) {
      for (int k = 0; k < c; ++k) {
        float a0 = r0[x0[x] * c + k] * (1 - xf[x]) + r0[x1[x] * c + k] * xf[x];
        float a1 = r1[x0[x] * c + k] * (1 - xf[x]) + r1[x1[x] * c + k] * xf[x];
        float v = a0 * (1 - yf) + a1 * yf;
        drow[x * c + k] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

// Fused HPA paste: for every pixel whose donor label is a hard class
// (hard_lut[donor_lbl] != 0), copy donor pixel+label into img/lbl and record
// the class in cp_mask.  One pass, three outputs (reference
// preprocessor.py:100-115 does this with four numpy temporaries).
void paste_hard_classes(uint8_t* img, uint8_t* lbl, uint8_t* cp_mask,
                        const uint8_t* donor_img, const uint8_t* donor_lbl,
                        const uint8_t* hard_lut, int64_t n_pixels, int c) {
  for (int64_t i = 0; i < n_pixels; ++i) {
    uint8_t dl = donor_lbl[i];
    if (hard_lut[dl]) {
      std::memcpy(img + i * c, donor_img + i * c, c);
      lbl[i] = dl;
      cp_mask[i] = dl;
    }
  }
}

// Fused crop + optional horizontal flip + bilinear resize (image) — avoids
// materializing the cropped intermediate.
void crop_flip_resize_u8(const uint8_t* src, int h, int w, int c,
                         int y0, int x0, int ch, int cw, int flip,
                         uint8_t* dst, int oh, int ow) {
  std::vector<int> sx0(ow), sx1(ow);
  std::vector<float> xf(ow);
  for (int x = 0; x < ow; ++x) {
    float fx = (x + 0.5f) * cw / ow - 0.5f;
    fx = std::max(0.0f, std::min(fx, static_cast<float>(cw - 1)));
    int a = static_cast<int>(fx);
    int b = std::min(a + 1, cw - 1);
    if (flip) {  // flip within the crop window
      a = cw - 1 - a;
      b = cw - 1 - b;
    }
    sx0[x] = x0 + a;
    sx1[x] = x0 + b;
    xf[x] = fx - static_cast<int>(fx);
  }
  for (int y = 0; y < oh; ++y) {
    float fy = (y + 0.5f) * ch / oh - 0.5f;
    fy = std::max(0.0f, std::min(fy, static_cast<float>(ch - 1)));
    int sy0 = y0 + static_cast<int>(fy);
    int sy1 = y0 + std::min(static_cast<int>(fy) + 1, ch - 1);
    float yf = fy - static_cast<int>(fy);
    const uint8_t* r0 = src + static_cast<int64_t>(sy0) * w * c;
    const uint8_t* r1 = src + static_cast<int64_t>(sy1) * w * c;
    uint8_t* drow = dst + static_cast<int64_t>(y) * ow * c;
    for (int x = 0; x < ow; ++x) {
      for (int k = 0; k < c; ++k) {
        float a0 = r0[sx0[x] * c + k] * (1 - xf[x]) + r0[sx1[x] * c + k] * xf[x];
        float a1 = r1[sx0[x] * c + k] * (1 - xf[x]) + r1[sx1[x] * c + k] * xf[x];
        drow[x * c + k] = static_cast<uint8_t>(a0 * (1 - yf) + a1 * yf + 0.5f);
      }
    }
  }
}

// Nearest variant for labels of crop+flip+resize.
void crop_flip_resize_nearest_u8(const uint8_t* src, int h, int w,
                                 int y0, int x0, int ch, int cw, int flip,
                                 uint8_t* dst, int oh, int ow) {
  std::vector<int> col(ow);
  for (int x = 0; x < ow; ++x) {
    int a = std::min(static_cast<int>(x * (static_cast<double>(cw) / ow)), cw - 1);
    if (flip) a = cw - 1 - a;
    col[x] = x0 + a;
  }
  for (int y = 0; y < oh; ++y) {
    int sy = y0 + std::min(static_cast<int>(y * (static_cast<double>(ch) / oh)), ch - 1);
    const uint8_t* srow = src + static_cast<int64_t>(sy) * w;
    uint8_t* drow = dst + static_cast<int64_t>(y) * ow;
    for (int x = 0; x < ow; ++x) drow[x] = srow[col[x]];
  }
}

}  // extern "C"
