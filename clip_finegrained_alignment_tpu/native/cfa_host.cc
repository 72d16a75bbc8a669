// Native host data-plane for the TPU input pipeline.
//
// The reference feeds its trainers through torch DataLoader worker
// *processes* doing per-sample PIL decode + resize
// (/root/reference/count_train_dataset/synthetic_dataloader.py:66-76,
// num_workers=1 at finetuner.py:334). This library replaces that with a
// single C call per batch: a std::thread pool decodes (libjpeg/libpng),
// pads to square, and box-resizes every sample directly into the caller's
// pinned [N, S, S, 3] uint8 buffer — no Python objects, no GIL (ctypes
// releases it around the call), no IPC.
//
// Also exposes the synthetic-generator compositing primitive (alpha-over
// paste) so 50k-sample dataset generation (gen_synthetic_data.py:202-329)
// runs at memory bandwidth.
//
// Build: g++ -O3 -march=native -shared -fPIC cfa_host.cc -o libcfa_host.so
//        -ljpeg -lpng -lpthread      (see native/__init__.py)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

extern "C" {

// ---------------------------------------------------------------------------
// Decoding
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode a JPEG file into an RGB buffer. Returns 0 on success; fills
// *width/*height. Caller frees *out with cfa_free.
static int decode_jpeg(FILE* f, uint8_t** out, int* width, int* height) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width, h = cinfo.output_height;
  uint8_t* buf = static_cast<uint8_t*>(malloc(size_t(w) * h * 3));
  if (!buf) { jpeg_destroy_decompress(&cinfo); return 2; }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = buf + size_t(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *out = buf; *width = w; *height = h;
  return 0;
}

static int decode_png(FILE* f, uint8_t** out, int* width, int* height) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING,
                                           nullptr, nullptr, nullptr);
  if (!png) return 1;
  png_infop info = png_create_info_struct(png);
  if (!info) { png_destroy_read_struct(&png, nullptr, nullptr); return 1; }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return 1;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_set_expand(png);                 // palette/gray/1-8bit -> 8bit
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  const int w = png_get_image_width(png, info);
  const int h = png_get_image_height(png, info);
  uint8_t* buf = static_cast<uint8_t*>(malloc(size_t(w) * h * 3));
  if (!buf) { png_destroy_read_struct(&png, &info, nullptr); return 2; }
  std::vector<png_bytep> rows(h);
  for (int y = 0; y < h; ++y) rows[y] = buf + size_t(y) * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  *out = buf; *width = w; *height = h;
  return 0;
}

// Decode JPEG or PNG by magic bytes. Returns 0 on success.
int cfa_decode_image(const char* path, uint8_t** out, int* width,
                     int* height) {
  FILE* f = fopen(path, "rb");
  if (!f) return 3;
  uint8_t magic[8] = {0};
  if (fread(magic, 1, 8, f) != 8) { fclose(f); return 4; }
  rewind(f);
  int rc;
  if (magic[0] == 0xFF && magic[1] == 0xD8) {
    rc = decode_jpeg(f, out, width, height);
  } else if (magic[0] == 0x89 && magic[1] == 'P') {
    rc = decode_png(f, out, width, height);
  } else {
    rc = 5;  // unsupported format
  }
  fclose(f);
  return rc;
}

void cfa_free(uint8_t* p) { free(p); }

// ---------------------------------------------------------------------------
// Geometry
// ---------------------------------------------------------------------------

// Box-filter (area-average) resize, RGB u8. Equivalent quality to
// PIL.Image.BOX on downscale; for the training feed (synthetic square
// PNGs -> model resolution) this is the right filter at 2x+ downscale.
void cfa_resize_box_u8(const uint8_t* src, int sh, int sw,
                       uint8_t* dst, int dh, int dw) {
  for (int y = 0; y < dh; ++y) {
    const float fy0 = (float)y * sh / dh, fy1 = (float)(y + 1) * sh / dh;
    const int y0 = (int)fy0, y1 = std::min((int)(fy1 + 0.9999f), sh);
    for (int x = 0; x < dw; ++x) {
      const float fx0 = (float)x * sw / dw, fx1 = (float)(x + 1) * sw / dw;
      const int x0 = (int)fx0, x1 = std::min((int)(fx1 + 0.9999f), sw);
      int acc[3] = {0, 0, 0};
      int n = 0;
      for (int yy = y0; yy < y1; ++yy) {
        const uint8_t* row = src + (size_t(yy) * sw + x0) * 3;
        for (int xx = x0; xx < x1; ++xx, row += 3) {
          acc[0] += row[0]; acc[1] += row[1]; acc[2] += row[2];
          ++n;
        }
      }
      uint8_t* o = dst + (size_t(y) * dw + x) * 3;
      if (n > 0) {
        o[0] = uint8_t(acc[0] / n);
        o[1] = uint8_t(acc[1] / n);
        o[2] = uint8_t(acc[2] / n);
      }
    }
  }
}

// Pad to square with a constant fill (the counterfactual loader's white
// pad, count_dataloader.py:12-24). dst must hold side*side*3 where
// side = max(h, w).
void cfa_pad_square_u8(const uint8_t* src, int h, int w, uint8_t* dst,
                       uint8_t fill) {
  const int side = std::max(h, w);
  memset(dst, fill, size_t(side) * side * 3);
  const int top = (side - h) / 2, left = (side - w) / 2;
  for (int y = 0; y < h; ++y) {
    memcpy(dst + (size_t(y + top) * side + left) * 3,
           src + size_t(y) * w * 3, size_t(w) * 3);
  }
}

// Alpha-over paste of an RGBA-ish object (separate alpha plane, 255 =
// opaque) into an RGB canvas at (x, y), clipping at borders — the
// synthetic-generator compositing op (gen_synthetic_data.py:249-267).
void cfa_alpha_paste(uint8_t* dst, int dh, int dw,
                     const uint8_t* obj_rgb, const uint8_t* obj_alpha,
                     int oh, int ow, int x, int y) {
  const int x0 = std::max(0, x), y0 = std::max(0, y);
  const int x1 = std::min(dw, x + ow), y1 = std::min(dh, y + oh);
  for (int yy = y0; yy < y1; ++yy) {
    const int oy = yy - y;
    uint8_t* drow = dst + (size_t(yy) * dw + x0) * 3;
    const uint8_t* srow = obj_rgb + (size_t(oy) * ow + (x0 - x)) * 3;
    const uint8_t* arow = obj_alpha
        ? obj_alpha + size_t(oy) * ow + (x0 - x) : nullptr;
    for (int xx = x0; xx < x1; ++xx, drow += 3, srow += 3) {
      if (!arow) {
        drow[0] = srow[0]; drow[1] = srow[1]; drow[2] = srow[2];
      } else {
        const int a = *arow++;
        drow[0] = uint8_t((a * srow[0] + (255 - a) * drow[0]) / 255);
        drow[1] = uint8_t((a * srow[1] + (255 - a) * drow[1]) / 255);
        drow[2] = uint8_t((a * srow[2] + (255 - a) * drow[2]) / 255);
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Batch assembler (the data-loader hot path)
// ---------------------------------------------------------------------------

// Python-compatible round-half-to-even (the PIL-path geometry in
// data/preprocess.py::resize_center_crop uses python round()).
static int py_round(double x) {
  const double f = std::floor(x);
  const double diff = x - f;
  if (diff > 0.5) return int(f) + 1;
  if (diff < 0.5) return int(f);
  const int fi = int(f);
  return (fi % 2 == 0) ? fi : fi + 1;
}

// Geometry modes for the batch assembler.
//   0: direct box resize to [size, size] (aspect squash; legacy)
//   1: pad to square (white) first, then box resize — the counterfactual
//      loader's transform (count_dataloader.py:12-24)
//   2: resize shorter side to `size`, then center crop — the HF-processor
//      geometry (synthetic_dataloader.py:69-76); same crop window as
//      data/preprocess.py::resize_center_crop (filter is box vs PIL
//      bicubic — pixel inclusion identical, kernel differs)
int cfa_assemble_batch_v2(const char** paths, int n, int size, int mode,
                          uint8_t* out, int num_threads) {
  std::atomic<int> next(0), failures(0);
  const size_t stride = size_t(size) * size * 3;
  auto worker = [&]() {
    std::vector<uint8_t> scratch;
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      uint8_t* decoded = nullptr;
      int w = 0, h = 0;
      if (cfa_decode_image(paths[i], &decoded, &w, &h) != 0) {
        memset(out + size_t(i) * stride, 0, stride);
        failures.fetch_add(1);
        continue;
      }
      uint8_t* src = decoded;
      int sh = h, sw = w;
      if (mode == 1 && h != w) {
        const int side = std::max(h, w);
        scratch.resize(size_t(side) * side * 3);
        cfa_pad_square_u8(decoded, h, w, scratch.data(), 255);
        src = scratch.data();
        sh = sw = side;
      }
      uint8_t* dst = out + size_t(i) * stride;
      if (sh == size && sw == size) {
        memcpy(dst, src, stride);
      } else if (mode == 2 && sh != sw) {
        // Shorter-side resize + center crop.
        const double scale = double(size) / std::min(sh, sw);
        const int nh = std::max(size, py_round(sh * scale));
        const int nw = std::max(size, py_round(sw * scale));
        std::vector<uint8_t> resized(size_t(nh) * nw * 3);
        cfa_resize_box_u8(src, sh, sw, resized.data(), nh, nw);
        const int top = (nh - size) / 2, left = (nw - size) / 2;
        for (int y = 0; y < size; ++y) {
          memcpy(dst + size_t(y) * size * 3,
                 resized.data() + (size_t(y + top) * nw + left) * 3,
                 size_t(size) * 3);
        }
      } else {
        cfa_resize_box_u8(src, sh, sw, dst, size, size);
      }
      free(decoded);
    }
  };
  const int nt = std::max(1, std::min(num_threads, n));
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failures.load();
}

// Back-compat wrapper (mode 0/1 only).
int cfa_assemble_batch(const char** paths, int n, int size,
                       int pad_to_square, uint8_t* out, int num_threads) {
  return cfa_assemble_batch_v2(paths, n, size, pad_to_square ? 1 : 0, out,
                               num_threads);
}

}  // extern "C"
