// Native batched JPEG decode + resize + normalize for the signal_tpu
// input pipeline.
//
// The reference framework leans on torchvision/PIL in dataloader worker
// processes (data/datasets/bases.py, make_dataloader.py in
// maxingan2412/Signal). On a TPU-VM the host must sustain thousands of
// 3-modality decodes per second to keep the chips fed; this library does
// the hot eval-path work (decode → bilinear resize → normalize → CHW
// float32) in C++ with a thread pool, exposed through a plain C ABI for
// ctypes (no pybind11 in the image).
//
// Build: make -C native    (g++ -O3 -shared -fPIC ... -ljpeg -lpthread)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <atomic>
#include <functional>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void error_exit(j_common_ptr cinfo) {
  ErrMgr* err = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode one JPEG file into an RGB8 buffer. Returns true on success.
bool decode_jpeg(const char* path, std::vector<uint8_t>& rgb, int& w, int& h) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.jump)) {
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
  rgb.resize(static_cast<size_t>(w) * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = rgb.data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// Separable resample with PIL semantics (filters ANTIALIAS on downsample:
// the support scales with 1/scale). filter 0 = triangle (PIL BILINEAR,
// the reference eval transform), filter 1 = cubic a=-0.5 (PIL BICUBIC,
// the reference TRAIN resize, `make_dataloader.py:186-188`). Exact
// feature parity needs the same filters, not plain 2-tap bilinear.
struct FilterTable {
  std::vector<float> weights;  // [out, kmax]
  std::vector<int> starts;     // [out]
  int kmax;
};

inline double triangle_kernel(double x) {
  x = std::fabs(x);
  return x < 1.0 ? 1.0 - x : 0.0;
}

inline double cubic_kernel(double x) {  // PIL BICUBIC: a = -0.5
  constexpr double a = -0.5;
  x = std::fabs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

FilterTable build_filter(int in_size, int out_size, int filter) {
  FilterTable t;
  const double base_support = filter == 1 ? 2.0 : 1.0;
  const double scale = static_cast<double>(in_size) / out_size;
  const double fscale = scale < 1.0 ? 1.0 : scale;
  const double support = base_support * fscale;
  t.kmax = static_cast<int>(std::ceil(support)) * 2 + 1;
  t.weights.assign(static_cast<size_t>(out_size) * t.kmax, 0.f);
  t.starts.resize(out_size);
  for (int o = 0; o < out_size; ++o) {
    double center = (o + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    t.starts[o] = xmin;
    double total = 0.0;
    for (int x = xmin; x < xmax; ++x) {
      double arg = (x - center + 0.5) / fscale;
      double w = filter == 1 ? cubic_kernel(arg) : triangle_kernel(arg);
      t.weights[static_cast<size_t>(o) * t.kmax + (x - xmin)] = static_cast<float>(w);
      total += w;
    }
    if (total != 0) {
      for (int k = 0; k < t.kmax; ++k)
        t.weights[static_cast<size_t>(o) * t.kmax + k] /= static_cast<float>(total);
    }
  }
  return t;
}

void resize_normalize(const uint8_t* src, int sw, int sh, int cx0, int cx1,
                      int out_h, int out_w, const float* mean,
                      const float* stdv, float* out, int filter) {
  const int crop_w = cx1 - cx0;
  FilterTable fx = build_filter(crop_w, out_w, filter);
  FilterTable fy = build_filter(sh, out_h, filter);

  // horizontal pass: [sh, out_w, 3]
  std::vector<float> tmp(static_cast<size_t>(sh) * out_w * 3);
  for (int y = 0; y < sh; ++y) {
    const uint8_t* row = src + (static_cast<size_t>(y) * sw + cx0) * 3;
    float* trow = tmp.data() + static_cast<size_t>(y) * out_w * 3;
    for (int ox = 0; ox < out_w; ++ox) {
      const float* w = fx.weights.data() + static_cast<size_t>(ox) * fx.kmax;
      int x0 = fx.starts[ox];
      float acc[3] = {0.f, 0.f, 0.f};
      for (int k = 0; k < fx.kmax; ++k) {
        float wk = w[k];
        if (wk == 0.f) continue;
        const uint8_t* p = row + (static_cast<size_t>(x0 + k)) * 3;
        acc[0] += wk * p[0];
        acc[1] += wk * p[1];
        acc[2] += wk * p[2];
      }
      trow[ox * 3 + 0] = acc[0];
      trow[ox * 3 + 1] = acc[1];
      trow[ox * 3 + 2] = acc[2];
    }
  }

  // vertical pass + normalize → CHW
  const size_t plane = static_cast<size_t>(out_h) * out_w;
  for (int oy = 0; oy < out_h; ++oy) {
    const float* w = fy.weights.data() + static_cast<size_t>(oy) * fy.kmax;
    int y0 = fy.starts[oy];
    for (int ox = 0; ox < out_w; ++ox) {
      float acc[3] = {0.f, 0.f, 0.f};
      for (int k = 0; k < fy.kmax; ++k) {
        float wk = w[k];
        if (wk == 0.f) continue;
        const float* p = tmp.data() + (static_cast<size_t>(y0 + k) * out_w + ox) * 3;
        acc[0] += wk * p[0];
        acc[1] += wk * p[1];
        acc[2] += wk * p[2];
      }
      for (int c = 0; c < 3; ++c) {
        float v = acc[c];
        if (v < 0.f) v = 0.f;            // PIL clips to uint8 after resample
        if (v > 255.f) v = 255.f;
        out[c * plane + static_cast<size_t>(oy) * out_w + ox] =
            (v / 255.0f - mean[c]) / stdv[c];
      }
    }
  }
}

void parallel_for(int n, int num_threads, const std::function<void(int)>& fn) {
  if (num_threads <= 1 || n <= 1) {
    for (int i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int> next(0);
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      fn(i);
    }
  };
  int t = num_threads < n ? num_threads : n;
  std::vector<std::thread> pool;
  pool.reserve(t);
  for (int i = 0; i < t; ++i) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// Decode n independent jpegs → out[n, 3, out_h, out_w] float32 normalized.
// Returns number of failures (0 = all good); failed slots are zero-filled.
int signal_decode_batch(const char** paths, int n, int out_h, int out_w,
                        const float* mean, const float* stdv, float* out,
                        int num_threads, int filter) {
  std::atomic<int> failures(0);
  const size_t stride = static_cast<size_t>(3) * out_h * out_w;
  parallel_for(n, num_threads, [&](int i) {
    std::vector<uint8_t> rgb;
    int w, h;
    if (!decode_jpeg(paths[i], rgb, w, h)) {
      memset(out + i * stride, 0, stride * sizeof(float));
      failures.fetch_add(1);
      return;
    }
    resize_normalize(rgb.data(), w, h, 0, w, out_h, out_w, mean, stdv,
                     out + i * stride, filter);
  });
  return failures.load();
}

// Decode n packed side-by-side jpegs (RGB|NI|TI panes of equal width)
// → out[n, 3(modal), 3(ch), out_h, out_w].
int signal_decode_batch_packed(const char** paths, int n, int out_h,
                               int out_w, const float* mean,
                               const float* stdv, float* out,
                               int num_threads, int filter) {
  std::atomic<int> failures(0);
  const size_t plane = static_cast<size_t>(3) * out_h * out_w;
  const size_t stride = 3 * plane;
  parallel_for(n, num_threads, [&](int i) {
    std::vector<uint8_t> rgb;
    int w, h;
    if (!decode_jpeg(paths[i], rgb, w, h)) {
      memset(out + i * stride, 0, stride * sizeof(float));
      failures.fetch_add(1);
      return;
    }
    int pane = w / 3;
    for (int m = 0; m < 3; ++m) {
      resize_normalize(rgb.data(), w, h, m * pane, (m + 1) * pane, out_h,
                       out_w, mean, stdv, out + i * stride + m * plane,
                       filter);
    }
  });
  return failures.load();
}

}  // extern "C"
