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
//   encode_gray_png     : 8-bit grayscale PNG encode (zlib; pseudo-label maps)
//   png_header          : parse IHDR -> {h, w, channels, bit_depth}
//   decode_png          : 8-bit gray/RGB/(+alpha) non-interlaced PNG decode
//
// Build: make -C native   (g++ -O3 -march=native -shared -fPIC -lz)

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <cmath>
#include <vector>

#include <zlib.h>

// libdeflate: ~2-3x faster whole-buffer inflate/deflate than zlib; PNG IDAT
// streams are zlib-wrapped deflate with a known output size, the ideal case.
// HIAST_USE_LIBDEFLATE comes from the Makefile's runtime-library probe —
// headers alone (dev package without the runtime lib) must NOT enable it.
#if defined(HIAST_USE_LIBDEFLATE) && defined(__has_include)
#if __has_include(<libdeflate.h>)
#include <libdeflate.h>
#define HIAST_HAVE_LIBDEFLATE 1
#endif
#endif

namespace {

// one-shot zlib-stream decompress into a caller-sized buffer; returns true
// when exactly `out_len` bytes were produced
inline bool zstream_decompress(const uint8_t* in, size_t in_len,
                               uint8_t* out, size_t out_len) {
#ifdef HIAST_HAVE_LIBDEFLATE
  libdeflate_decompressor* d = libdeflate_alloc_decompressor();
  if (d != nullptr) {
    size_t actual = 0;
    int r = libdeflate_zlib_decompress(d, in, in_len, out, out_len, &actual);
    libdeflate_free_decompressor(d);
    if (r == LIBDEFLATE_SUCCESS && actual == out_len) return true;
    return false;
  }
#endif
  uLongf len = out_len;
  return uncompress(out, &len, in, in_len) == Z_OK && len == out_len;
}

// one-shot zlib-stream compress; returns compressed size or 0 on failure
inline size_t zstream_compress(const uint8_t* in, size_t in_len, int level,
                               std::vector<uint8_t>& out) {
#ifdef HIAST_HAVE_LIBDEFLATE
  libdeflate_compressor* c = libdeflate_alloc_compressor(level);
  if (c != nullptr) {
    out.resize(libdeflate_zlib_compress_bound(c, in_len));
    size_t n = libdeflate_zlib_compress(c, in, in_len, out.data(), out.size());
    libdeflate_free_compressor(c);
    if (n > 0) return n;
  }
#endif
  uLongf cap = compressBound(in_len);
  out.resize(cap);
  if (compress2(out.data(), &cap, in, in_len, level) != Z_OK) return 0;
  return cap;
}

}  // namespace

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

namespace {

// Append one PNG chunk (length + type + payload + CRC) to out.
inline uint8_t* put_chunk(uint8_t* out, const char type[4],
                          const uint8_t* payload, uint32_t len) {
  out[0] = len >> 24; out[1] = len >> 16; out[2] = len >> 8; out[3] = len;
  std::memcpy(out + 4, type, 4);
  if (len) std::memcpy(out + 8, payload, len);
  uint32_t crc = crc32(0L, out + 4, len + 4);
  uint8_t* p = out + 8 + len;
  p[0] = crc >> 24; p[1] = crc >> 16; p[2] = crc >> 8; p[3] = crc;
  return p + 4;
}

}  // namespace

// 8-bit grayscale PNG encode for the pseudo-label maps (the reference writes
// one gray PNG per target image each round via cv2.imwrite,
// pseudo_label_generator.py:96).  Per-row Up filter: consecutive label-map
// rows repeat, so the filtered stream is mostly zeros — smaller files AND
// faster deflate than PIL's default pipeline.  Returns bytes written into
// `out`, or -1 (out_cap too small / zlib error).  `level` is the zlib level
// (1 = fastest; label maps compress well even at 1).
int64_t encode_gray_png(const uint8_t* data, int h, int w, int level,
                        uint8_t* out, int64_t out_cap) {
  const int64_t stride = static_cast<int64_t>(w) + 1;
  std::vector<uint8_t> raw(static_cast<size_t>(stride) * h);
  for (int y = 0; y < h; ++y) {
    uint8_t* row = raw.data() + y * stride;
    const uint8_t* src = data + static_cast<int64_t>(y) * w;
    if (y == 0) {
      row[0] = 0;  // filter: None
      std::memcpy(row + 1, src, w);
    } else {
      row[0] = 2;  // filter: Up
      const uint8_t* prev = src - w;
      for (int x = 0; x < w; ++x) row[1 + x] = static_cast<uint8_t>(src[x] - prev[x]);
    }
  }

  std::vector<uint8_t> comp;
  size_t comp_cap = zstream_compress(raw.data(), raw.size(), level, comp);
  if (comp_cap == 0) return -1;

  const int64_t total = 8 + (12 + 13) + (12 + static_cast<int64_t>(comp_cap)) + 12;
  if (total > out_cap) return -1;

  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  std::memcpy(out, sig, 8);
  uint8_t* p = out + 8;

  uint8_t ihdr[13];
  ihdr[0] = w >> 24; ihdr[1] = w >> 16; ihdr[2] = w >> 8; ihdr[3] = w;
  ihdr[4] = h >> 24; ihdr[5] = h >> 16; ihdr[6] = h >> 8; ihdr[7] = h;
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 0;   // color type: grayscale
  ihdr[10] = 0; ihdr[11] = 0; ihdr[12] = 0;  // compression/filter/interlace
  p = put_chunk(p, "IHDR", ihdr, 13);
  p = put_chunk(p, "IDAT", comp.data(), static_cast<uint32_t>(comp_cap));
  p = put_chunk(p, "IEND", nullptr, 0);
  return p - out;
}

namespace {

inline uint32_t be32(const uint8_t* p) {
  return (static_cast<uint32_t>(p[0]) << 24) | (p[1] << 16) | (p[2] << 8) | p[3];
}

// channels for PNG color types 0 (gray), 2 (RGB), 4 (gray+A), 6 (RGBA);
// 0 = unsupported (palette / invalid).
inline int channels_for(int color_type) {
  switch (color_type) {
    case 0: return 1;
    case 2: return 3;
    case 4: return 2;
    case 6: return 4;
    default: return 0;
  }
}

inline int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  return pb <= pc ? b : c;
}

}  // namespace

// Parse the IHDR of a PNG byte buffer.  info[0..3] = {height, width,
// channels, bit_depth}.  Returns 0 when this decoder supports the file
// (8- or 16-bit, color type 0/2/4/6, non-interlaced), -1 otherwise.
int64_t png_header(const uint8_t* buf, int64_t n, int* info) {
  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (n < 33 || std::memcmp(buf, sig, 8) != 0) return -1;
  if (be32(buf + 8) != 13 || std::memcmp(buf + 12, "IHDR", 4) != 0) return -1;
  const uint8_t* ihdr = buf + 16;
  uint32_t w = be32(ihdr), h = be32(ihdr + 4);
  int depth = ihdr[8], color = ihdr[9], interlace = ihdr[12];
  int c = channels_for(color);
  info[0] = static_cast<int>(h);
  info[1] = static_cast<int>(w);
  info[2] = c;
  info[3] = depth;
  if ((depth != 8 && depth != 16) || c == 0 || interlace != 0 || w == 0 || h == 0)
    return -1;
  return 0;
}

// Decode an 8/16-bit gray/RGB/(+alpha) non-interlaced PNG into `out`
// (h*w*channels*(depth/8) bytes, caller-allocated via png_header).  Handles
// all five row filters; 16-bit samples stay big-endian per the PNG spec
// (the Python wrapper reinterprets as >u2).  Returns bytes written or -1.
// This is the read-side twin of encode_gray_png: the host pipeline re-reads
// one pseudo-label PNG per target sample every epoch (reference
// base_dataset.py:158-178), and decode is the single largest per-sample
// host cost at production resolution (scripts/profile_host_pipeline.py);
// 16-bit covers SYNTHIA's label PNGs.
int64_t decode_png(const uint8_t* buf, int64_t n, uint8_t* out, int64_t out_cap) {
  int info[4];
  if (png_header(buf, n, info) != 0) return -1;
  const int64_t h = info[0], w = info[1];
  const int64_t c = static_cast<int64_t>(info[2]) * (info[3] / 8);  // bytes/pixel
  if (out_cap < h * w * c) return -1;

  // concatenate IDAT payloads
  std::vector<uint8_t> idat;
  int64_t pos = 8;
  while (pos + 12 <= n) {
    uint32_t len = be32(buf + pos);
    const uint8_t* type = buf + pos + 4;
    if (pos + 12 + static_cast<int64_t>(len) > n) return -1;
    if (std::memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), buf + pos + 8, buf + pos + 8 + len);
    } else if (std::memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + len;
  }
  if (idat.empty()) return -1;

  const int64_t stride = w * c;
  std::vector<uint8_t> raw(static_cast<size_t>((stride + 1) * h));
  if (!zstream_decompress(idat.data(), idat.size(), raw.data(), raw.size()))
    return -1;

  // unfilter rows in place into `out`
  const int bpp = static_cast<int>(c);
  for (int64_t y = 0; y < h; ++y) {
    const uint8_t* src = raw.data() + y * (stride + 1);
    const int filter = src[0];
    ++src;
    uint8_t* row = out + y * stride;
    const uint8_t* prev = y > 0 ? row - stride : nullptr;
    switch (filter) {
      case 0:  // None
        std::memcpy(row, src, stride);
        break;
      case 1:  // Sub
        std::memcpy(row, src, bpp);
        for (int64_t x = bpp; x < stride; ++x) row[x] = src[x] + row[x - bpp];
        break;
      case 2:  // Up
        if (prev) {
          for (int64_t x = 0; x < stride; ++x) row[x] = src[x] + prev[x];
        } else {
          std::memcpy(row, src, stride);
        }
        break;
      case 3:  // Average
        for (int64_t x = 0; x < stride; ++x) {
          int a = x >= bpp ? row[x - bpp] : 0;
          int b = prev ? prev[x] : 0;
          row[x] = static_cast<uint8_t>(src[x] + ((a + b) >> 1));
        }
        break;
      case 4:  // Paeth
        for (int64_t x = 0; x < stride; ++x) {
          int a = x >= bpp ? row[x - bpp] : 0;
          int b = prev ? prev[x] : 0;
          int d = (prev && x >= bpp) ? prev[x - bpp] : 0;
          row[x] = static_cast<uint8_t>(src[x] + paeth(a, b, d));
        }
        break;
      default:
        return -1;
    }
  }
  return h * stride;
}

}  // extern "C"
