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

int facet_io_version() { return 1; }

}  // extern "C"
