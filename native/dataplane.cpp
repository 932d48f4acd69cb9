// Native host data plane: multithreaded image decode + resize + normalize.
//
// The reference feeds the GPU through torch DataLoader worker *processes*
// (MT4MTLKD/Spatial_cnn/run.py:367-381) whose heavy lifting is libtorch/PIL
// C code. This is the TPU-VM equivalent: a small C++ library that decodes
// PNG/JPEG frames, bilinearly resizes to the model resolution, and writes
// ImageNet-normalized float32 NHWC directly into a caller-provided buffer —
// fanned out over a std::thread pool so the host keeps the device fed
// (SURVEY.md §7: host decode throughput, not FLOPs, is the likely
// bottleneck at >A100x5 rates).
//
// C ABI (ctypes-friendly); see computervision_codes_tpu/data/native.py.
// Build: native/build.sh  ->  native/libdataplane.so

#include <png.h>
#include <jpeglib.h>

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  std::vector<uint8_t> rgb;  // HWC uint8
  int h = 0, w = 0;
  bool ok = false;
};

Image decode_png(const char* path) {
  Image out;
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return out;
  png_byte header[8];
  if (std::fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    std::fclose(fp);
    return out;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return out;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);
  png_set_expand(png);          // palette/gray->8bit
  png_set_strip_16(png);        // 16bit->8bit
  png_set_strip_alpha(png);     // drop alpha
  png_set_gray_to_rgb(png);     // gray->rgb
  png_read_update_info(png, info);
  out.w = png_get_image_width(png, info);
  out.h = png_get_image_height(png, info);
  out.rgb.resize(size_t(out.h) * out.w * 3);
  std::vector<png_bytep> rows(out.h);
  for (int y = 0; y < out.h; ++y)
    rows[y] = out.rgb.data() + size_t(y) * out.w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  out.ok = true;
  return out;
}

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

Image decode_jpeg(const char* path) {
  Image out;
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return out;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(fp);
    return out;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out.w = cinfo.output_width;
  out.h = cinfo.output_height;
  out.rgb.resize(size_t(out.h) * out.w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out.rgb.data() + size_t(cinfo.output_scanline) * out.w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(fp);
  out.ok = true;
  return out;
}

Image decode(const char* path) {
  size_t n = std::strlen(path);
  bool jpg = (n >= 4 && std::strcmp(path + n - 4, ".jpg") == 0) ||
             (n >= 5 && std::strcmp(path + n - 5, ".jpeg") == 0);
  if (jpg) return decode_jpeg(path);
  Image img = decode_png(path);
  if (!img.ok) img = decode_jpeg(path);  // extension lied
  return img;
}

// PIL-parity bilinear resize: antialiased triangle filter with support
// scaled by the downscale ratio (Pillow's ImagingResample with BILINEAR),
// separable horizontal+vertical passes, then ImageNet normalize.
struct Coeffs {
  std::vector<int> xmin;           // first source index per output pixel
  std::vector<int> count;          // taps per output pixel
  std::vector<double> weights;     // flattened taps
  int max_taps = 0;
};

Coeffs precompute_coeffs(int in_size, int out_size) {
  Coeffs c;
  double scale = double(in_size) / out_size;
  double filterscale = scale < 1.0 ? 1.0 : scale;
  double support = 1.0 * filterscale;  // bilinear support = 1
  int max_taps = int(std::ceil(support)) * 2 + 1;
  c.xmin.resize(out_size);
  c.count.resize(out_size);
  c.weights.assign(size_t(out_size) * max_taps, 0.0);
  c.max_taps = max_taps;
  for (int i = 0; i < out_size; ++i) {
    double center = (i + 0.5) * scale;
    int xlo = int(center - support + 0.5);
    if (xlo < 0) xlo = 0;
    int xhi = int(center + support + 0.5);
    if (xhi > in_size) xhi = in_size;
    double sum = 0.0;
    double* w = &c.weights[size_t(i) * max_taps];
    for (int x = xlo; x < xhi; ++x) {
      double arg = (x - center + 0.5) / filterscale;
      double v = arg < 0 ? -arg : arg;
      double t = v < 1.0 ? 1.0 - v : 0.0;  // triangle filter
      w[x - xlo] = t;
      sum += t;
    }
    if (sum != 0.0)
      for (int k = 0; k < xhi - xlo; ++k) w[k] /= sum;
    c.xmin[i] = xlo;
    c.count[i] = xhi - xlo;
  }
  return c;
}

void resize_normalize(const Image& img, float* out, int oh, int ow,
                      const float* mean, const float* stddev) {
  Coeffs cx = precompute_coeffs(img.w, ow);
  Coeffs cy = precompute_coeffs(img.h, oh);
  // horizontal pass: (h, w, 3) -> (h, ow, 3) in float
  std::vector<float> tmp(size_t(img.h) * ow * 3);
  for (int y = 0; y < img.h; ++y) {
    const uint8_t* row = &img.rgb[size_t(y) * img.w * 3];
    float* trow = &tmp[size_t(y) * ow * 3];
    for (int x = 0; x < ow; ++x) {
      const double* w = &cx.weights[size_t(x) * cx.max_taps];
      int x0 = cx.xmin[x], n = cx.count[x];
      double acc[3] = {0, 0, 0};
      for (int k = 0; k < n; ++k) {
        const uint8_t* px = row + size_t(x0 + k) * 3;
        acc[0] += w[k] * px[0];
        acc[1] += w[k] * px[1];
        acc[2] += w[k] * px[2];
      }
      trow[x * 3 + 0] = float(acc[0]);
      trow[x * 3 + 1] = float(acc[1]);
      trow[x * 3 + 2] = float(acc[2]);
    }
  }
  // vertical pass + normalize
  for (int y = 0; y < oh; ++y) {
    const double* w = &cy.weights[size_t(y) * cy.max_taps];
    int y0 = cy.xmin[y], n = cy.count[y];
    float* dst = out + size_t(y) * ow * 3;
    for (int x = 0; x < ow; ++x) {
      double acc[3] = {0, 0, 0};
      for (int k = 0; k < n; ++k) {
        const float* px = &tmp[(size_t(y0 + k) * ow + x) * 3];
        acc[0] += w[k] * px[0];
        acc[1] += w[k] * px[1];
        acc[2] += w[k] * px[2];
      }
      for (int ci = 0; ci < 3; ++ci) {
        float v = float(acc[ci]) / 255.0f;
        dst[x * 3 + ci] = (v - mean[ci]) / stddev[ci];
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode one image file into normalized float32 HWC. Returns 0 on success.
int dp_decode_one(const char* path, float* out, int oh, int ow,
                  const float* mean, const float* stddev) {
  Image img = decode(path);
  if (!img.ok) return 1;
  resize_normalize(img, out, oh, ow, mean, stddev);
  return 0;
}

// Decode a batch of n image files (newline-joined paths) into out
// (n, oh, ow, 3) float32, using up to n_threads workers.
// Returns the number of failed decodes (their slots are zero-filled).
int dp_decode_batch(const char* joined_paths, int n, float* out, int oh,
                    int ow, const float* mean, const float* stddev,
                    int n_threads) {
  std::vector<std::string> paths;
  paths.reserve(n);
  const char* p = joined_paths;
  for (int i = 0; i < n; ++i) {
    const char* q = std::strchr(p, '\n');
    if (!q) q = p + std::strlen(p);
    paths.emplace_back(p, q - p);
    p = (*q == '\n') ? q + 1 : q;
  }
  std::atomic<int> next(0), failed(0);
  size_t stride = size_t(oh) * ow * 3;
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      float* dst = out + stride * i;
      if (dp_decode_one(paths[i].c_str(), dst, oh, ow, mean, stddev) != 0) {
        std::memset(dst, 0, stride * sizeof(float));
        failed.fetch_add(1);
      }
    }
  };
  int workers = n_threads < 1 ? 1 : (n_threads > n ? n : n_threads);
  std::vector<std::thread> pool;
  for (int i = 0; i < workers; ++i) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return failed.load();
}

int dp_version() { return 1; }

}  // extern "C"
