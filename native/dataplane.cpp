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

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
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

Image decode_jpeg(const char* path, int target_h = 0, int target_w = 0) {
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
  if (target_h > 0 && target_w > 0) {
    // decode-at-scale (libjpeg supports M/8 scaled IDCT): pick the
    // smallest M/8 whose scaled dims still cover the resize target —
    // e.g. 854x480 -> 256x448 decodes at 5/8, skipping ~60% of the IDCT
    int m = 8;
    for (int cand = 1; cand <= 8; ++cand) {
      long sh = (long(cinfo.image_height) * cand + 7) / 8;
      long sw = (long(cinfo.image_width) * cand + 7) / 8;
      if (sh >= target_h && sw >= target_w) { m = cand; break; }
    }
    cinfo.scale_num = m;
    cinfo.scale_denom = 8;
  }
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

// In-memory JPEG decode (video-container frames) with the same
// decode-at-scale policy as the file path.
Image decode_jpeg_mem(const uint8_t* buf, size_t len, int target_h = 0,
                      int target_w = 0) {
  Image out;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return out;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  if (target_h > 0 && target_w > 0) {
    int m = 8;
    for (int cand = 1; cand <= 8; ++cand) {
      long sh = (long(cinfo.image_height) * cand + 7) / 8;
      long sw = (long(cinfo.image_width) * cand + 7) / 8;
      if (sh >= target_h && sw >= target_w) { m = cand; break; }
    }
    cinfo.scale_num = m;
    cinfo.scale_denom = 8;
  }
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
  out.ok = true;
  return out;
}

Image decode(const char* path, int target_h = 0, int target_w = 0) {
  size_t n = std::strlen(path);
  bool jpg = (n >= 4 && std::strcmp(path + n - 4, ".jpg") == 0) ||
             (n >= 5 && std::strcmp(path + n - 5, ".jpeg") == 0);
  if (jpg) return decode_jpeg(path, target_h, target_w);
  Image img = decode_png(path);
  if (!img.ok) img = decode_jpeg(path, target_h, target_w);  // extension lied
  return img;
}

// PIL-parity bilinear resize, FIXED-POINT (round 3): int16 coefficients
// scaled by 1<<14 (weights per output pixel sum to exactly 1<<14, so the
// int32 accumulator is bounded by 255<<14), uint8 intermediate rows like
// Pillow's own 8bpc pipeline, horizontal-then-vertical pass order to match
// Pillow's rounding. The round-2 scalar double-precision version measured
// 44 img/s vs PIL's 168 (docs/BENCH.md); the fixed-point inner loops
// auto-vectorize under -O3 -march=native (AVX2/AVX-512 here).
struct Coeffs {
  std::vector<int> xmin;            // first source index per output pixel
  std::vector<int> count;           // taps per output pixel
  std::vector<int16_t> weights;     // flattened fixed-point taps
  int max_taps = 0;
};

constexpr int kPrec = 14;

Coeffs precompute_coeffs(int in_size, int out_size) {
  Coeffs c;
  double scale = double(in_size) / out_size;
  double filterscale = scale < 1.0 ? 1.0 : scale;
  double support = 1.0 * filterscale;  // bilinear support = 1
  int max_taps = int(std::ceil(support)) * 2 + 1;
  c.xmin.resize(out_size);
  c.count.resize(out_size);
  c.weights.assign(size_t(out_size) * max_taps, 0);
  c.max_taps = max_taps;
  std::vector<double> w(max_taps);
  for (int i = 0; i < out_size; ++i) {
    double center = (i + 0.5) * scale;
    int xlo = int(center - support + 0.5);
    if (xlo < 0) xlo = 0;
    int xhi = int(center + support + 0.5);
    if (xhi > in_size) xhi = in_size;
    double sum = 0.0;
    for (int x = xlo; x < xhi; ++x) {
      double arg = (x - center + 0.5) / filterscale;
      double v = arg < 0 ? -arg : arg;
      double t = v < 1.0 ? 1.0 - v : 0.0;  // triangle filter
      w[x - xlo] = t;
      sum += t;
    }
    int16_t* wq = &c.weights[size_t(i) * max_taps];
    int acc = 0;
    for (int k = 0; k < xhi - xlo; ++k) {
      // round each weight; force the set to sum to exactly 1<<kPrec by
      // assigning the residual to the last tap (bounds the accumulator)
      int q = int(std::lround(w[k] / sum * (1 << kPrec)));
      wq[k] = int16_t(q);
      acc += q;
    }
    if (xhi > xlo) wq[xhi - xlo - 1] = int16_t(wq[xhi - xlo - 1] +
                                               ((1 << kPrec) - acc));
    c.xmin[i] = xlo;
    c.count[i] = xhi - xlo;
  }
  return c;
}

inline uint8_t clamp_u8(int v) {
  return v < 0 ? 0 : (v > 255 ? 255 : uint8_t(v));
}

// (h, w, 3) uint8 -> (oh, ow, 3) uint8, horizontal then vertical.
void resize_u8(const uint8_t* src, int h, int w, uint8_t* dst, int oh,
               int ow) {
  Coeffs cx = precompute_coeffs(w, ow);
  Coeffs cy = precompute_coeffs(h, oh);
  const int round = 1 << (kPrec - 1);
  std::vector<uint8_t> tmp(size_t(h) * ow * 3);
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = src + size_t(y) * w * 3;
    uint8_t* trow = &tmp[size_t(y) * ow * 3];
    for (int x = 0; x < ow; ++x) {
      const int16_t* wq = &cx.weights[size_t(x) * cx.max_taps];
      const uint8_t* px = row + size_t(cx.xmin[x]) * 3;
      int n = cx.count[x];
      int a0 = round, a1 = round, a2 = round;
      for (int k = 0; k < n; ++k) {
        a0 += wq[k] * px[3 * k + 0];
        a1 += wq[k] * px[3 * k + 1];
        a2 += wq[k] * px[3 * k + 2];
      }
      trow[x * 3 + 0] = clamp_u8(a0 >> kPrec);
      trow[x * 3 + 1] = clamp_u8(a1 >> kPrec);
      trow[x * 3 + 2] = clamp_u8(a2 >> kPrec);
    }
  }
  // vertical: for each output row, taps over tmp rows; the inner loop is
  // contiguous over ow*3 and auto-vectorizes
  int row_elems = ow * 3;
  std::vector<int32_t> acc(row_elems);
  for (int y = 0; y < oh; ++y) {
    const int16_t* wq = &cy.weights[size_t(y) * cy.max_taps];
    int y0 = cy.xmin[y], n = cy.count[y];
    for (int e = 0; e < row_elems; ++e) acc[e] = round;
    for (int k = 0; k < n; ++k) {
      const uint8_t* trow = &tmp[size_t(y0 + k) * row_elems];
      int16_t wk = wq[k];
      for (int e = 0; e < row_elems; ++e) acc[e] += wk * trow[e];
    }
    uint8_t* drow = dst + size_t(y) * row_elems;
    for (int e = 0; e < row_elems; ++e) drow[e] = clamp_u8(acc[e] >> kPrec);
  }
}

void normalize_u8(const uint8_t* src, float* out, int oh, int ow,
                  const float* mean, const float* stddev) {
  // precompute per-channel affine: out = px * a + b
  float a[3], b[3];
  for (int ci = 0; ci < 3; ++ci) {
    a[ci] = 1.0f / (255.0f * stddev[ci]);
    b[ci] = -mean[ci] / stddev[ci];
  }
  size_t npx = size_t(oh) * ow;
  for (size_t i = 0; i < npx; ++i) {
    out[i * 3 + 0] = src[i * 3 + 0] * a[0] + b[0];
    out[i * 3 + 1] = src[i * 3 + 1] * a[1] + b[1];
    out[i * 3 + 2] = src[i * 3 + 2] * a[2] + b[2];
  }
}

void resize_normalize(const Image& img, float* out, int oh, int ow,
                      const float* mean, const float* stddev) {
  std::vector<uint8_t> resized(size_t(oh) * ow * 3);
  resize_u8(img.rgb.data(), img.h, img.w, resized.data(), oh, ow);
  normalize_u8(resized.data(), out, oh, ow, mean, stddev);
}

}  // namespace

extern "C" {

// Decode one image file into normalized float32 HWC. Returns 0 on success.
int dp_decode_one(const char* path, float* out, int oh, int ow,
                  const float* mean, const float* stddev) {
  Image img = decode(path, oh, ow);
  if (!img.ok) return 1;
  resize_normalize(img, out, oh, ow, mean, stddev);
  return 0;
}

// uint8 variant: resized RGB without normalization — the serving path
// normalizes uint8 frames on DEVICE (serving.py), so the host can skip
// the float conversion entirely (3x less output memory traffic).
int dp_decode_one_u8(const char* path, uint8_t* out, int oh, int ow) {
  Image img = decode(path, oh, ow);
  if (!img.ok) return 1;
  resize_u8(img.rgb.data(), img.h, img.w, out, oh, ow);
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

// Batch uint8 decode (paths newline-joined), threaded like dp_decode_batch.
int dp_decode_batch_u8(const char* joined_paths, int n, uint8_t* out, int oh,
                       int ow, int n_threads) {
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
      uint8_t* dst = out + stride * i;
      if (dp_decode_one_u8(paths[i].c_str(), dst, oh, ow) != 0) {
        std::memset(dst, 0, stride);
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

// ---------------------------------------------------------------------------
// Video-container ingest (round 4). PNG framestores cannot feed a serving
// chip (measured ~159 cores/chip for JPEG, ~595 for PNG — docs/BENCH.md);
// the production input is a video file. MJPEG-in-AVI is the first container:
// libjpeg is already linked, frames stay independently decodable (random
// access for the temporal samplers), and the demux is pure RIFF walking over
// an mmap'd file — zero copies until the decoder touches a frame. A raw
// concatenated-JPEG stream (.mjpg) is accepted via marker-structure walking.
// Replaces the reference's PNG-per-frame dataset layout
// (MT4MTLKD/readme.md:30-89) as the production feed.

namespace {

struct VideoFile {
  int fd = -1;
  const uint8_t* data = nullptr;
  size_t len = 0;
  int width = 0, height = 0;      // from avih when present, else 0
  double fps = 0.0;
  std::vector<std::pair<size_t, size_t>> frames;  // (offset, bytes) of JPEGs
};

inline uint32_t rd32le(const uint8_t* p) {
  return uint32_t(p[0]) | uint32_t(p[1]) << 8 | uint32_t(p[2]) << 16 |
         uint32_t(p[3]) << 24;
}

// Walk a RIFF chunk range, collecting MJPEG video chunks ('##dc'/'##db'
// whose payload starts with SOI) and the avih main header.
void walk_riff(const uint8_t* d, size_t pos, size_t end, VideoFile& vf) {
  while (pos + 8 <= end) {
    const uint8_t* id = d + pos;
    uint32_t size = rd32le(d + pos + 4);
    size_t body = pos + 8;
    if (body + size > end) break;
    if (!std::memcmp(id, "LIST", 4) || !std::memcmp(id, "RIFF", 4)) {
      if (size >= 4) walk_riff(d, body + 4, body + size, vf);
    } else if (id[2] == 'd' && (id[3] == 'c' || id[3] == 'b') &&
               size >= 2 && d[body] == 0xFF && d[body + 1] == 0xD8) {
      vf.frames.emplace_back(body, size);
    } else if (!std::memcmp(id, "avih", 4) && size >= 40) {
      uint32_t usec = rd32le(d + body);
      vf.fps = usec ? 1e6 / usec : 0.0;
      vf.width = int(rd32le(d + body + 32));
      vf.height = int(rd32le(d + body + 36));
    }
    pos = body + size + (size & 1);  // chunks are word-aligned
  }
}

// One past the EOI of the JPEG starting at `pos` (SOI), by marker-structure
// walking (entropy-coded data is scanned respecting byte stuffing and RST
// markers — a bare FFD9 byte pair inside scan data cannot occur). 0 = parse
// failure.
size_t jpeg_end(const uint8_t* d, size_t pos, size_t end) {
  size_t p = pos + 2;
  while (p + 2 <= end) {
    if (d[p] != 0xFF) return 0;
    uint8_t m = d[p + 1];
    if (m == 0xD9) return p + 2;                       // EOI
    if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) {       // TEM/RSTn: bare
      p += 2;
      continue;
    }
    if (p + 4 > end) return 0;
    uint16_t seglen = uint16_t(d[p + 2]) << 8 | d[p + 3];
    if (seglen < 2) return 0;
    p += 2 + seglen;
    if (m == 0xDA) {  // SOS: skip entropy data to the next real marker
      while (p + 2 <= end &&
             !(d[p] == 0xFF && d[p + 1] != 0x00 &&
               !(d[p + 1] >= 0xD0 && d[p + 1] <= 0xD7)))
        ++p;
    }
  }
  return 0;
}

void scan_raw_mjpeg(const uint8_t* d, size_t len, VideoFile& vf) {
  size_t pos = 0;
  while (pos + 4 <= len) {
    if (d[pos] == 0xFF && d[pos + 1] == 0xD8) {
      size_t e = jpeg_end(d, pos, len);
      if (!e) break;
      vf.frames.emplace_back(pos, e - pos);
      pos = e;
    } else {
      ++pos;  // tolerate inter-frame padding
    }
  }
}

std::mutex g_vid_mu;
std::unordered_map<long long, VideoFile*> g_vids;
long long g_next_vid = 1;

VideoFile* vid_get(long long handle) {
  std::lock_guard<std::mutex> lk(g_vid_mu);
  auto it = g_vids.find(handle);
  return it == g_vids.end() ? nullptr : it->second;
}

void vid_free(VideoFile* vf) {
  if (vf->data) munmap(const_cast<uint8_t*>(vf->data), vf->len);
  if (vf->fd >= 0) close(vf->fd);
  delete vf;
}

}  // namespace

// Open an MJPEG video (AVI container or raw concatenated-JPEG stream).
// Returns a handle > 0, or 0 on failure (unreadable / no JPEG frames).
long long dp_video_open(const char* path) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return 0;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < 12) {
    close(fd);
    return 0;
  }
  void* map = mmap(nullptr, size_t(st.st_size), PROT_READ, MAP_PRIVATE, fd, 0);
  if (map == MAP_FAILED) {
    close(fd);
    return 0;
  }
  auto* vf = new VideoFile;
  vf->fd = fd;
  vf->data = static_cast<const uint8_t*>(map);
  vf->len = size_t(st.st_size);
  if (!std::memcmp(vf->data, "RIFF", 4) &&
      !std::memcmp(vf->data + 8, "AVI ", 4)) {
    walk_riff(vf->data, 12, std::min(vf->len, size_t(rd32le(vf->data + 4)) + 8),
              *vf);
  } else if (vf->data[0] == 0xFF && vf->data[1] == 0xD8) {
    scan_raw_mjpeg(vf->data, vf->len, *vf);
  }
  if (vf->frames.empty()) {
    vid_free(vf);
    return 0;
  }
  std::lock_guard<std::mutex> lk(g_vid_mu);
  long long h = g_next_vid++;
  g_vids[h] = vf;
  return h;
}

int dp_video_frames(long long handle) {
  VideoFile* vf = vid_get(handle);
  return vf ? int(vf->frames.size()) : -1;
}

int dp_video_width(long long handle) {
  VideoFile* vf = vid_get(handle);
  return vf ? vf->width : -1;
}

int dp_video_height(long long handle) {
  VideoFile* vf = vid_get(handle);
  return vf ? vf->height : -1;
}

double dp_video_fps(long long handle) {
  VideoFile* vf = vid_get(handle);
  return vf ? vf->fps : -1.0;
}

// Decode arbitrary frame indices (the temporal samplers take strided /
// clip-sampled subsets) into (n, oh, ow, 3) uint8, threaded. Returns the
// number of failed frames (slots zero-filled); -1 on a bad handle.
int dp_video_decode_u8(long long handle, const int* indices, int n,
                       uint8_t* out, int oh, int ow, int n_threads) {
  VideoFile* vf = vid_get(handle);
  if (!vf) return -1;
  std::atomic<int> next(0), failed(0);
  size_t stride = size_t(oh) * ow * 3;
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      uint8_t* dst = out + stride * i;
      int fidx = indices[i];
      bool ok = fidx >= 0 && fidx < int(vf->frames.size());
      if (ok) {
        auto [off, sz] = vf->frames[fidx];
        Image img = decode_jpeg_mem(vf->data + off, sz, oh, ow);
        ok = img.ok;
        if (ok) resize_u8(img.rgb.data(), img.h, img.w, dst, oh, ow);
      }
      if (!ok) {
        std::memset(dst, 0, stride);
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

// float32 ImageNet-normalized variant of dp_video_decode_u8.
int dp_video_decode(long long handle, const int* indices, int n, float* out,
                    int oh, int ow, const float* mean, const float* stddev,
                    int n_threads) {
  VideoFile* vf = vid_get(handle);
  if (!vf) return -1;
  std::atomic<int> next(0), failed(0);
  size_t stride = size_t(oh) * ow * 3;
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      float* dst = out + stride * i;
      int fidx = indices[i];
      bool ok = fidx >= 0 && fidx < int(vf->frames.size());
      if (ok) {
        auto [off, sz] = vf->frames[fidx];
        Image img = decode_jpeg_mem(vf->data + off, sz, oh, ow);
        ok = img.ok;
        if (ok) resize_normalize(img, dst, oh, ow, mean, stddev);
      }
      if (!ok) {
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

void dp_video_close(long long handle) {
  VideoFile* vf = nullptr;
  {
    std::lock_guard<std::mutex> lk(g_vid_mu);
    auto it = g_vids.find(handle);
    if (it == g_vids.end()) return;
    vf = it->second;
    g_vids.erase(it);
  }
  vid_free(vf);
}

int dp_version() { return 3; }

}  // extern "C"
