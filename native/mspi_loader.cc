// Native data-loader: JPEG decode + antialiased bilinear resize + threaded
// clip decoding.
//
// Role: the reference's data path leans on native dependency code (PIL/libjpeg
// frame decode + torchvision Resize, avsp_dataloader.py:91-98,164-169); this
// library is the framework's own native implementation, exposed to Python via
// ctypes (mspi_tpu/data/native.py).
//
// Resize matches PIL's antialiased BILINEAR: a separable triangle filter with
// support scaled by the downsampling ratio, half-pixel centres.
//
// Build: make -C native   (g++ -O3 -shared -fPIC mspi_loader.cc -ljpeg)

#include <cstdio>  // must precede jpeglib.h (it needs FILE)

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrMgr* err = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG file to RGB8. Returns true on success.
bool decode_jpeg(const char* path, std::vector<unsigned char>& pixels, int& w,
                 int& h) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  w = cinfo.output_width;
  h = cinfo.output_height;
  pixels.resize(static_cast<size_t>(w) * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = pixels.data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

struct FilterTap {
  int start;
  int count;
  std::vector<float> weights;
};

// PIL-style antialiased triangle filter taps for one output axis.
std::vector<FilterTap> build_taps(int in_size, int out_size) {
  std::vector<FilterTap> taps(out_size);
  const double scale = static_cast<double>(in_size) / out_size;
  const double support = std::max(1.0, scale);  // triangle support * scale
  for (int i = 0; i < out_size; ++i) {
    const double center = (i + 0.5) * scale;
    int lo = std::max(0, static_cast<int>(std::floor(center - support)));
    int hi = std::min(in_size, static_cast<int>(std::ceil(center + support)));
    FilterTap& t = taps[i];
    t.start = lo;
    t.count = hi - lo;
    t.weights.resize(t.count);
    double sum = 0.0;
    for (int j = 0; j < t.count; ++j) {
      double x = (lo + j + 0.5 - center) / std::max(scale, 1.0);
      double wgt = std::max(0.0, 1.0 - std::fabs(x));  // triangle
      t.weights[j] = static_cast<float>(wgt);
      sum += wgt;
    }
    if (sum > 0) {
      for (float& wv : t.weights) wv = static_cast<float>(wv / sum);
    }
  }
  return taps;
}

// Separable resize RGB8 -> RGB8 (horizontal pass then vertical pass).
void resize_bilinear_aa(const unsigned char* src, int in_h, int in_w,
                        unsigned char* dst, int out_h, int out_w) {
  std::vector<FilterTap> xt = build_taps(in_w, out_w);
  std::vector<FilterTap> yt = build_taps(in_h, out_h);

  std::vector<float> tmp(static_cast<size_t>(in_h) * out_w * 3);
  for (int y = 0; y < in_h; ++y) {
    const unsigned char* row = src + static_cast<size_t>(y) * in_w * 3;
    float* trow = tmp.data() + static_cast<size_t>(y) * out_w * 3;
    for (int x = 0; x < out_w; ++x) {
      const FilterTap& t = xt[x];
      float acc[3] = {0, 0, 0};
      for (int j = 0; j < t.count; ++j) {
        const unsigned char* px = row + static_cast<size_t>(t.start + j) * 3;
        const float wgt = t.weights[j];
        acc[0] += wgt * px[0];
        acc[1] += wgt * px[1];
        acc[2] += wgt * px[2];
      }
      trow[x * 3 + 0] = acc[0];
      trow[x * 3 + 1] = acc[1];
      trow[x * 3 + 2] = acc[2];
    }
  }
  for (int y = 0; y < out_h; ++y) {
    const FilterTap& t = yt[y];
    unsigned char* drow = dst + static_cast<size_t>(y) * out_w * 3;
    for (int x = 0; x < out_w; ++x) {
      float acc[3] = {0, 0, 0};
      for (int j = 0; j < t.count; ++j) {
        const float* px = tmp.data() + (static_cast<size_t>(t.start + j) * out_w + x) * 3;
        const float wgt = t.weights[j];
        acc[0] += wgt * px[0];
        acc[1] += wgt * px[1];
        acc[2] += wgt * px[2];
      }
      for (int c = 0; c < 3; ++c) {
        int v = static_cast<int>(std::lround(acc[c]));
        drow[x * 3 + c] = static_cast<unsigned char>(std::clamp(v, 0, 255));
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode one JPEG and resize to (out_h, out_w) RGB8 into out. Returns 0 ok.
int mspi_decode_jpeg(const char* path, unsigned char* out, int out_h, int out_w) {
  std::vector<unsigned char> pixels;
  int w = 0, h = 0;
  if (!decode_jpeg(path, pixels, w, h)) return 1;
  if (w == out_w && h == out_h) {
    std::memcpy(out, pixels.data(), pixels.size());
  } else {
    resize_bilinear_aa(pixels.data(), h, w, out, out_h, out_w);
  }
  return 0;
}

// Decode n JPEGs in parallel into a contiguous [n, out_h, out_w, 3] buffer.
// Returns the number of failed frames (0 = all good).
int mspi_decode_clip(const char** paths, int n, unsigned char* out, int out_h,
                     int out_w, int n_threads) {
  if (n_threads <= 0) n_threads = 1;
  n_threads = std::min(n_threads, n);
  std::atomic<int> next(0), failed(0);
  const size_t frame_size = static_cast<size_t>(out_h) * out_w * 3;

  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      if (mspi_decode_jpeg(paths[i], out + frame_size * i, out_h, out_w) != 0) {
        failed.fetch_add(1);
      }
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failed.load();
}

}  // extern "C"
