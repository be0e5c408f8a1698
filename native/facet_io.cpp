// facet_io: native host-side image IO for facet_tpu.
//
// The one genuinely hot host-side loop in the engine is JPEG decode feeding
// the device pipeline (SURVEY: ~6 GB/s of JPEG at full target throughput).
// This library decodes batches of JPEG files in parallel with libjpeg,
// applies EXIF orientation, and optionally uses libjpeg's fractional DCT
// scaling (1/2, 1/4, 1/8) to decode directly at a bounded resolution —
// decode-time downscale is ~8x cheaper than decode-then-resize.
//
// C ABI only (ctypes-friendly): no exceptions across the boundary, caller
// owns all buffers via facet_free().
//
// Build: make -C native   (produces libfacet_io.so)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <thread>
#include <vector>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// ---------------------------------------------------------------- EXIF

// Minimal EXIF orientation scan over the APP1 payload (big/little endian
// TIFF header, IFD0, tag 0x0112).
int parse_exif_orientation(const uint8_t* data, size_t size) {
  if (size < 14 || memcmp(data, "Exif\0\0", 6) != 0) return 1;
  const uint8_t* tiff = data + 6;
  size_t tiff_size = size - 6;
  bool little;
  if (tiff[0] == 'I' && tiff[1] == 'I') little = true;
  else if (tiff[0] == 'M' && tiff[1] == 'M') little = false;
  else return 1;

  auto u16 = [&](size_t off) -> uint32_t {
    if (off + 2 > tiff_size) return 0;
    return little ? tiff[off] | (tiff[off + 1] << 8)
                  : (tiff[off] << 8) | tiff[off + 1];
  };
  auto u32 = [&](size_t off) -> uint32_t {
    if (off + 4 > tiff_size) return 0;
    return little ? tiff[off] | (tiff[off + 1] << 8) | (tiff[off + 2] << 16) |
                        (uint32_t(tiff[off + 3]) << 24)
                  : (uint32_t(tiff[off]) << 24) | (tiff[off + 1] << 16) |
                        (tiff[off + 2] << 8) | tiff[off + 3];
  };

  uint32_t ifd = u32(4);
  uint32_t count = u16(ifd);
  for (uint32_t i = 0; i < count; ++i) {
    size_t entry = ifd + 2 + i * 12;
    if (u16(entry) == 0x0112) {
      int orient = static_cast<int>(u16(entry + 8));
      return (orient >= 1 && orient <= 8) ? orient : 1;
    }
  }
  return 1;
}

// Apply EXIF orientation 1-8 in place (allocates for the rotated copy).
uint8_t* apply_orientation(uint8_t* rgb, int* w, int* h, int orient) {
  if (orient <= 1) return rgb;
  int W = *w, H = *h;
  int outW = W, outH = H;
  if (orient >= 5) { outW = H; outH = W; }
  uint8_t* out = static_cast<uint8_t*>(malloc(size_t(outW) * outH * 3));
  if (!out) return rgb;

  for (int y = 0; y < H; ++y) {
    for (int x = 0; x < W; ++x) {
      int nx = x, ny = y;
      switch (orient) {
        case 2: nx = W - 1 - x; ny = y; break;                 // mirror H
        case 3: nx = W - 1 - x; ny = H - 1 - y; break;         // 180
        case 4: nx = x; ny = H - 1 - y; break;                 // mirror V
        case 5: nx = y; ny = x; break;                         // transpose
        case 6: nx = H - 1 - y; ny = x; break;                 // rotate 90 CW
        case 7: nx = H - 1 - y; ny = W - 1 - x; break;         // transverse
        case 8: nx = y; ny = W - 1 - x; break;                 // rotate 270 CW
      }
      const uint8_t* src = rgb + (size_t(y) * W + x) * 3;
      uint8_t* dst = out + (size_t(ny) * outW + nx) * 3;
      dst[0] = src[0]; dst[1] = src[1]; dst[2] = src[2];
    }
  }
  free(rgb);
  *w = outW;
  *h = outH;
  return out;
}

// --------------------------------------------------------------- decode

struct DecodeResult {
  uint8_t* rgb = nullptr;  // malloc'd, H*W*3
  int width = 0;
  int height = 0;
  int ok = 0;
};

DecodeResult decode_one(const char* path, int max_long_edge) {
  DecodeResult res;
  FILE* fh = fopen(path, "rb");
  if (!fh) return res;

  jpeg_decompress_struct cinfo;
  ErrorMgr err;
  cinfo.err = jpeg_std_error(&err.pub);
  err.pub.error_exit = error_exit;
  // volatile: mutated between setjmp and a potential longjmp from libjpeg's
  // error_exit — without it the cleanup free() reads an indeterminate value
  uint8_t* volatile buffer = nullptr;
  if (setjmp(err.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fh);
    free(buffer);
    return res;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fh);
  jpeg_save_markers(&cinfo, JPEG_APP0 + 1, 0xFFFF);  // keep APP1 for EXIF
  jpeg_read_header(&cinfo, TRUE);

  int orient = 1;
  for (jpeg_saved_marker_ptr m = cinfo.marker_list; m; m = m->next) {
    if (m->marker == JPEG_APP0 + 1) {
      orient = parse_exif_orientation(m->data, m->data_length);
      break;
    }
  }

  // decode-time downscale via DCT scaling: pick the largest 1/2^k that
  // keeps the long edge above the requested bound
  cinfo.scale_num = 1;
  cinfo.scale_denom = 1;
  if (max_long_edge > 0) {
    unsigned long edge =
        cinfo.image_width > cinfo.image_height ? cinfo.image_width
                                               : cinfo.image_height;
    while (cinfo.scale_denom < 8 &&
           edge / (cinfo.scale_denom * 2) >= (unsigned long)max_long_edge) {
      cinfo.scale_denom *= 2;
    }
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  int W = cinfo.output_width, H = cinfo.output_height;
  buffer = static_cast<uint8_t*>(malloc(size_t(W) * H * 3));
  if (!buffer) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(fh);
    return res;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = buffer + size_t(cinfo.output_scanline) * W * 3;
    JSAMPROW rows[1] = {row};
    jpeg_read_scanlines(&cinfo, rows, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fh);

  buffer = apply_orientation(buffer, &W, &H, orient);
  res.rgb = buffer;
  res.width = W;
  res.height = H;
  res.ok = 1;
  return res;
}

}  // namespace

extern "C" {

// Decode one JPEG. Returns 1 on success; caller frees *out_rgb with
// facet_free(). max_long_edge <= 0 disables decode-time downscaling.
int facet_decode_jpeg(const char* path, int max_long_edge, uint8_t** out_rgb,
                      int* out_width, int* out_height) {
  DecodeResult res = decode_one(path, max_long_edge);
  *out_rgb = res.rgb;
  *out_width = res.width;
  *out_height = res.height;
  return res.ok;
}

// Decode a batch in parallel. ok[i]=1 and rgb[i]/width[i]/height[i] filled
// per success. n_threads <= 0 picks the hardware concurrency.
void facet_decode_jpeg_batch(const char** paths, int count, int max_long_edge,
                             int n_threads, uint8_t** rgb, int* widths,
                             int* heights, int* ok) {
  if (n_threads <= 0) {
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 1;
  }
  if (n_threads > count) n_threads = count;

  std::vector<std::thread> workers;
  // plain index striding keeps this allocation-free and deterministic
  for (int t = 0; t < n_threads; ++t) {
    workers.emplace_back([&, t]() {
      for (int i = t; i < count; i += n_threads) {
        DecodeResult res = decode_one(paths[i], max_long_edge);
        rgb[i] = res.rgb;
        widths[i] = res.width;
        heights[i] = res.height;
        ok[i] = res.ok;
      }
    });
  }
  for (auto& w : workers) w.join();
}

void facet_free(uint8_t* ptr) { free(ptr); }

int facet_io_version() { return 2; }

}  // extern "C"

namespace {

// Area-average downscale (cv2 INTER_AREA-equivalent): each output pixel
// integrates the exact fractional source window. High quality for the
// >=2x shrinks thumbnails perform; separable two-pass keeps it O(N).
uint8_t* resize_area(const uint8_t* src, int W, int H, int outW, int outH) {
  std::vector<float> tmp(static_cast<size_t>(outW) * H * 3);
  const double sx = static_cast<double>(W) / outW;
  // horizontal pass: src (H, W, 3) -> tmp (H, outW, 3)
  for (int y = 0; y < H; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * W * 3;
    float* trow = tmp.data() + static_cast<size_t>(y) * outW * 3;
    for (int ox = 0; ox < outW; ++ox) {
      const double x0 = ox * sx, x1 = (ox + 1) * sx;
      double acc[3] = {0, 0, 0};
      int ix0 = static_cast<int>(x0), ix1 = static_cast<int>(std::ceil(x1));
      if (ix1 > W) ix1 = W;
      for (int ix = ix0; ix < ix1; ++ix) {
        const double cover = std::min<double>(x1, ix + 1) -
                             std::max<double>(x0, ix);
        const uint8_t* px = row + static_cast<size_t>(ix) * 3;
        acc[0] += cover * px[0];
        acc[1] += cover * px[1];
        acc[2] += cover * px[2];
      }
      const double inv = 1.0 / (x1 - x0);
      trow[ox * 3 + 0] = static_cast<float>(acc[0] * inv);
      trow[ox * 3 + 1] = static_cast<float>(acc[1] * inv);
      trow[ox * 3 + 2] = static_cast<float>(acc[2] * inv);
    }
  }
  // vertical pass: tmp (H, outW, 3) -> out (outH, outW, 3)
  uint8_t* out = static_cast<uint8_t*>(
      malloc(static_cast<size_t>(outW) * outH * 3));
  if (!out) return nullptr;
  const double sy = static_cast<double>(H) / outH;
  for (int oy = 0; oy < outH; ++oy) {
    const double y0 = oy * sy, y1 = (oy + 1) * sy;
    int iy0 = static_cast<int>(y0), iy1 = static_cast<int>(std::ceil(y1));
    if (iy1 > H) iy1 = H;
    const double inv = 1.0 / (y1 - y0);
    uint8_t* orow = out + static_cast<size_t>(oy) * outW * 3;
    for (int ox = 0; ox < outW * 3; ++ox) {
      double acc = 0;
      for (int iy = iy0; iy < iy1; ++iy) {
        const double cover = std::min<double>(y1, iy + 1) -
                             std::max<double>(y0, iy);
        acc += cover * tmp[static_cast<size_t>(iy) * outW * 3 + ox];
      }
      double v = acc * inv + 0.5;
      orow[ox] = static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v));
    }
  }
  return out;
}

// RGB buffer -> JPEG bytes in a malloc'd buffer (jpeg_mem_dest).
int encode_jpeg_mem(const uint8_t* rgb, int W, int H, int quality,
                    uint8_t** out_buf, unsigned long* out_len) {
  jpeg_compress_struct cinfo;
  ErrorMgr err;
  cinfo.err = jpeg_std_error(&err.pub);
  err.pub.error_exit = error_exit;
  *out_buf = nullptr;
  *out_len = 0;
  if (setjmp(err.jump)) {
    jpeg_destroy_compress(&cinfo);
    if (*out_buf) { free(*out_buf); *out_buf = nullptr; }
    return 0;
  }
  jpeg_create_compress(&cinfo);
  jpeg_mem_dest(&cinfo, out_buf, out_len);
  cinfo.image_width = W;
  cinfo.image_height = H;
  cinfo.input_components = 3;
  cinfo.in_color_space = JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  jpeg_start_compress(&cinfo, TRUE);
  while (cinfo.next_scanline < cinfo.image_height) {
    JSAMPROW row = const_cast<uint8_t*>(
        rgb + static_cast<size_t>(cinfo.next_scanline) * W * 3);
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  return 1;
}

}  // namespace

extern "C" {

// Resize each RGB image so its long edge is <= `size` (area average) and
// encode it as a JPEG at `quality`, across threads. Per image i the
// caller provides rgb[i] (H*W*3, C-contiguous), widths[i], heights[i];
// receives a malloc'd JPEG in out_buf[i]/out_len[i] (free with
// facet_free) and ok[i]. Images already within `size` skip the resize.
void facet_encode_thumbnail_batch(const uint8_t** rgb, const int* widths,
                                  const int* heights, int count, int size,
                                  int quality, int n_threads,
                                  uint8_t** out_buf, int* out_len, int* ok) {
  if (n_threads <= 0) {
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 1;
  }
  if (n_threads > count) n_threads = count;
  std::vector<std::thread> workers;
  for (int t = 0; t < n_threads; ++t) {
    workers.emplace_back([&, t]() {
      for (int i = t; i < count; i += n_threads) {
        ok[i] = 0;
        out_buf[i] = nullptr;
        out_len[i] = 0;
        const int W = widths[i], H = heights[i];
        if (W <= 0 || H <= 0) continue;
        const uint8_t* src = rgb[i];
        uint8_t* resized = nullptr;
        int outW = W, outH = H;
        const int longEdge = W > H ? W : H;
        if (size > 0 && longEdge > size) {
          // PIL.thumbnail semantics exactly: long edge = size; the short
          // edge picks floor vs ceil minimizing the ASPECT error (PIL's
          // round_aspect — plain half-up rounding differs for extreme
          // ratios, e.g. 8000x131 @640 is 640x11 in PIL but 640x10
          // half-up; ties and 0 fall back the way PIL's min() does)
          const double aspect = static_cast<double>(W) / H;
          if (W <= H) {   // PIL: x/y (=1) >= aspect -> round the width
            outH = size;
            const double v = size * aspect;
            const int fl = static_cast<int>(std::floor(v));
            const int ce = static_cast<int>(std::ceil(v));
            const double ef = std::fabs(aspect - static_cast<double>(fl) / size);
            const double ec = std::fabs(aspect - static_cast<double>(ce) / size);
            outW = ef <= ec ? fl : ce;
          } else {        // round the height, key |aspect - size/n|
            outW = size;
            const double v = size / aspect;
            const int fl = static_cast<int>(std::floor(v));
            const int ce = static_cast<int>(std::ceil(v));
            const double ef = fl == 0 ? 0.0
                : std::fabs(aspect - static_cast<double>(size) / fl);
            const double ec = ce == 0 ? 0.0
                : std::fabs(aspect - static_cast<double>(size) / ce);
            outH = ef <= ec ? fl : ce;
          }
          if (outW < 1) outW = 1;
          if (outH < 1) outH = 1;
          resized = resize_area(src, W, H, outW, outH);
          if (!resized) continue;
          src = resized;
        }
        unsigned long len = 0;
        uint8_t* buf = nullptr;
        const int enc_ok = encode_jpeg_mem(src, outW, outH, quality,
                                           &buf, &len);
        if (resized) free(resized);
        if (!enc_ok) continue;
        out_buf[i] = buf;
        out_len[i] = static_cast<int>(len);
        ok[i] = 1;
      }
    });
  }
  for (auto& w : workers) w.join();
}

}  // extern "C"
