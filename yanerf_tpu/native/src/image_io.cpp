// Native image IO for the host data pipeline.
//
// The reference feeds its GPU through torch DataLoader worker *processes*
// (PIL decode per worker). On TPU hosts the analogous bottleneck is Python's
// GIL in the prefetch thread; this library moves decode + normalize into
// C++: PNG (libpng) and JPEG (libjpeg) to float32 RGB in [0,1], with a
// std::thread batch API so a whole batch decodes in parallel outside the
// interpreter. Exposed via a plain C ABI for ctypes (no pybind11 in the
// image).
//
// API contract (all return 0 on success, negative error codes otherwise):
//   yanerf_image_dims(path, &h, &w)        probe dimensions
//   yanerf_decode_image(path, out, h, w)   decode into caller buffer (h*w*3 f32)
//   yanerf_decode_batch(paths, n, outs, hs, ws, n_threads)
//
// Build: see build.py (g++ -O3 -shared -fPIC ... -lpng -ljpeg).

#include <csetjmp>
#include <cstdio>
#include <cstdint>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

constexpr int kOk = 0;
constexpr int kErrOpen = -1;
constexpr int kErrFormat = -2;
constexpr int kErrDecode = -3;
constexpr int kErrDims = -4;

bool has_suffix(const char* path, const char* a, const char* b = nullptr,
                const char* c = nullptr, const char* d = nullptr) {
  std::string s(path);
  auto ends = [&s](const char* suf) {
    if (!suf) return false;
    std::string x(suf);
    if (s.size() < x.size()) return false;
    std::string tail = s.substr(s.size() - x.size());
    for (auto& ch : tail) ch = static_cast<char>(tolower(ch));
    return tail == x;
  };
  return ends(a) || ends(b) || ends(c) || ends(d);
}

// ---------------------------------------------------------------- PNG ----

int png_dims(const char* path, int* h, int* w) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return kErrOpen;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return kErrDecode;
  }
  png_init_io(png, fp);
  png_read_info(png, info);
  *w = static_cast<int>(png_get_image_width(png, info));
  *h = static_cast<int>(png_get_image_height(png, info));
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return kOk;
}

// Decode a PNG to float32 RGB in [0,1]; alpha is dropped (matching
// PIL.convert("RGB") over a black... NOTE: PIL composites nothing — it
// discards alpha, which is what the reference's load_image does).
int png_decode(const char* path, float* out, int out_h, int out_w) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return kErrOpen;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  std::vector<png_bytep> rows;
  std::vector<uint8_t> buf;
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return kErrDecode;
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  int w = static_cast<int>(png_get_image_width(png, info));
  int h = static_cast<int>(png_get_image_height(png, info));
  if (h != out_h || w != out_w) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return kErrDims;
  }

  // Normalize every variant to 8-bit RGBA, then drop alpha.
  png_byte color_type = png_get_color_type(png, info);
  png_byte bit_depth = png_get_bit_depth(png, info);
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_RGB || color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_PALETTE)
    png_set_filler(png, 0xFF, PNG_FILLER_AFTER);
  if (color_type == PNG_COLOR_TYPE_GRAY || color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_read_update_info(png, info);

  size_t rowbytes = png_get_rowbytes(png, info);
  buf.resize(rowbytes * h);
  rows.resize(h);
  for (int y = 0; y < h; ++y) rows[y] = buf.data() + y * rowbytes;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);

  // IEEE division (NOT reciprocal multiply): bit-identical to the PIL
  // fallback's astype(float32)/255.0 and to the device cache's lossless
  // uint8 decode (datasets/loader.py::decode_cached_field)
  for (int y = 0; y < h; ++y) {
    const uint8_t* src = buf.data() + y * rowbytes;
    float* dst = out + static_cast<size_t>(y) * w * 3;
    for (int x = 0; x < w; ++x) {
      dst[x * 3 + 0] = src[x * 4 + 0] / 255.0f;
      dst[x * 3 + 1] = src[x * 4 + 1] / 255.0f;
      dst[x * 3 + 2] = src[x * 4 + 2] / 255.0f;
    }
  }
  return kOk;
}

// --------------------------------------------------------------- JPEG ----

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

int jpeg_dims(const char* path, int* h, int* w) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return kErrOpen;
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return kErrDecode;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  *w = static_cast<int>(cinfo.image_width);
  *h = static_cast<int>(cinfo.image_height);
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  return kOk;
}

int jpeg_decode(const char* path, float* out, int out_h, int out_w) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return kErrOpen;
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  std::vector<uint8_t> row;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return kErrDecode;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  int w = static_cast<int>(cinfo.output_width);
  int h = static_cast<int>(cinfo.output_height);
  if (h != out_h || w != out_w) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return kErrDims;
  }

  row.resize(static_cast<size_t>(w) * cinfo.output_components);
  // IEEE division to match the PIL fallback bit-for-bit (see PNG path)
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* rowptr = row.data();
    jpeg_read_scanlines(&cinfo, &rowptr, 1);
    float* dst = out + static_cast<size_t>(cinfo.output_scanline - 1) * w * 3;
    for (int x = 0; x < w; ++x) {
      dst[x * 3 + 0] = row[x * 3 + 0] / 255.0f;
      dst[x * 3 + 1] = row[x * 3 + 1] / 255.0f;
      dst[x * 3 + 2] = row[x * 3 + 2] / 255.0f;
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  return kOk;
}

}  // namespace

extern "C" {

int yanerf_image_dims(const char* path, int* h, int* w) {
  if (has_suffix(path, ".png")) return png_dims(path, h, w);
  if (has_suffix(path, ".jpg", ".jpeg")) return jpeg_dims(path, h, w);
  return kErrFormat;
}

int yanerf_decode_image(const char* path, float* out, int h, int w) {
  if (has_suffix(path, ".png")) return png_decode(path, out, h, w);
  if (has_suffix(path, ".jpg", ".jpeg")) return jpeg_decode(path, out, h, w);
  return kErrFormat;
}

// Decode n same-sized images in parallel; outs is one contiguous
// (n, h, w, 3) float32 buffer. Returns the first error code or 0.
int yanerf_decode_batch(const char** paths, int n, float* outs, int h, int w, int n_threads) {
  if (n_threads <= 0) n_threads = static_cast<int>(std::thread::hardware_concurrency());
  // hardware_concurrency() may legally return 0 (unknown); zero workers
  // would "succeed" with a fully uninitialized output buffer
  if (n_threads <= 0) n_threads = 1;
  if (n_threads > n) n_threads = n;
  std::vector<int> status(n, kOk);
  std::vector<std::thread> workers;
  std::size_t stride = static_cast<size_t>(h) * w * 3;
  for (int t = 0; t < n_threads; ++t) {
    workers.emplace_back([&, t]() {
      for (int i = t; i < n; i += n_threads) {
        status[i] = yanerf_decode_image(paths[i], outs + stride * i, h, w);
      }
    });
  }
  for (auto& th : workers) th.join();
  for (int i = 0; i < n; ++i)
    if (status[i] != kOk) return status[i];
  return kOk;
}

}  // extern "C"
