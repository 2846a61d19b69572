// Native JPEG decode + fused resample/crop for the host input pipeline.
//
// TPU-native replacement for the reference's accimage (libjpeg-turbo)
// dependency (README.md:22,33): decodes with libjpeg using DCT scaling to
// land near the target size cheaply, then applies a separable triangle
// (PIL-BILINEAR-compatible, antialiased on downscale) resample, a square
// crop, and a final resample to the canonical output size — one pass per
// frame, no Python in the loop.  Called from ctypes
// (x3d_multigrid_tpu/data/native.py); every entry point releases the GIL
// implicitly (pure C, no Python API).
//
// Build: make -C csrc   (produces build/libx3djpeg.so)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG to RGB8. Uses libjpeg DCT scaling (M/8, M=1..16) to pick
// the smallest decode whose short side still covers `min_short` (0 = full
// size). Returns false on decode error.
bool decode_rgb(const uint8_t* data, size_t len, int min_short,
                std::vector<uint8_t>* out, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
               static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;

  if (min_short > 0) {
    const int full_short = std::min(static_cast<int>(cinfo.image_width),
                                    static_cast<int>(cinfo.image_height));
    // smallest M such that full_short * M/8 >= min_short
    int m = 8;
    for (int cand = 1; cand <= 8; ++cand) {
      if (full_short * cand / 8 >= min_short) {
        m = cand;
        break;
      }
    }
    cinfo.scale_num = m;
    cinfo.scale_denom = 8;
  }

  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  out->resize(static_cast<size_t>(*w) * *h * 3);
  const int stride = *w * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() + static_cast<size_t>(cinfo.output_scanline)
                   * stride;
    JSAMPROW rows[1] = {row};
    jpeg_read_scanlines(&cinfo, rows, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// Separable triangle-filter resample (PIL BILINEAR semantics: support
// scales with the reduction factor, so downscales are antialiased).
// Operates on interleaved RGB8; intermediate rows kept in float.
struct FilterTap {
  int first;
  std::vector<float> weights;  // normalized
};

void build_taps(int in_size, int out_size, std::vector<FilterTap>* taps) {
  taps->resize(out_size);
  const double scale = static_cast<double>(in_size) / out_size;
  const double support = (scale >= 1.0) ? scale : 1.0;
  for (int i = 0; i < out_size; ++i) {
    const double center = (i + 0.5) * scale;
    int lo = static_cast<int>(std::floor(center - support));
    int hi = static_cast<int>(std::ceil(center + support));
    lo = std::max(lo, 0);
    hi = std::min(hi, in_size);
    FilterTap& t = (*taps)[i];
    t.first = lo;
    t.weights.resize(hi - lo);
    double total = 0.0;
    for (int k = lo; k < hi; ++k) {
      const double x = (k + 0.5 - center) / (scale >= 1.0 ? scale : 1.0);
      const double wgt = (std::abs(x) < 1.0) ? 1.0 - std::abs(x) : 0.0;
      t.weights[k - lo] = static_cast<float>(wgt);
      total += wgt;
    }
    if (total > 0) {
      for (float& wv : t.weights) wv = static_cast<float>(wv / total);
    } else {
      // degenerate window: nearest
      t.weights.assign(1, 1.0f);
      t.first = std::min(static_cast<int>(center), in_size - 1);
    }
  }
}

// Resample an RGB8 image region (x0,y0,w,h inside stride-sized rows) to
// out_w x out_h RGB8.
void resample(const uint8_t* src, int src_stride_px, int x0, int y0,
              int in_w, int in_h, int out_w, int out_h, uint8_t* dst) {
  if (in_w == out_w && in_h == out_h) {  // pure crop: row memcpy
    for (int y = 0; y < in_h; ++y) {
      std::memcpy(dst + static_cast<size_t>(y) * out_w * 3,
                  src + (static_cast<size_t>(y0 + y) * src_stride_px + x0)
                      * 3,
                  static_cast<size_t>(in_w) * 3);
    }
    return;
  }
  std::vector<FilterTap> xt, yt;
  build_taps(in_w, out_w, &xt);
  build_taps(in_h, out_h, &yt);

  // horizontal pass into float buffer (in_h x out_w x 3)
  std::vector<float> tmp(static_cast<size_t>(in_h) * out_w * 3);
  for (int y = 0; y < in_h; ++y) {
    const uint8_t* row = src + (static_cast<size_t>(y0 + y) * src_stride_px
                                + x0) * 3;
    float* trow = tmp.data() + static_cast<size_t>(y) * out_w * 3;
    for (int x = 0; x < out_w; ++x) {
      const FilterTap& t = xt[x];
      float r = 0, g = 0, b = 0;
      for (size_t k = 0; k < t.weights.size(); ++k) {
        const uint8_t* px = row + (t.first + k) * 3;
        const float wgt = t.weights[k];
        r += wgt * px[0];
        g += wgt * px[1];
        b += wgt * px[2];
      }
      trow[x * 3 + 0] = r;
      trow[x * 3 + 1] = g;
      trow[x * 3 + 2] = b;
    }
  }
  // vertical pass
  for (int y = 0; y < out_h; ++y) {
    const FilterTap& t = yt[y];
    uint8_t* drow = dst + static_cast<size_t>(y) * out_w * 3;
    for (int x = 0; x < out_w; ++x) {
      float r = 0, g = 0, b = 0;
      for (size_t k = 0; k < t.weights.size(); ++k) {
        const float* px = tmp.data()
                          + (static_cast<size_t>(t.first + k) * out_w + x) * 3;
        const float wgt = t.weights[k];
        r += wgt * px[0];
        g += wgt * px[1];
        b += wgt * px[2];
      }
      drow[x * 3 + 0] = static_cast<uint8_t>(
          std::min(255.0f, std::max(0.0f, std::round(r))));
      drow[x * 3 + 1] = static_cast<uint8_t>(
          std::min(255.0f, std::max(0.0f, std::round(g))));
      drow[x * 3 + 2] = static_cast<uint8_t>(
          std::min(255.0f, std::max(0.0f, std::round(b))));
    }
  }
}

// Slurp a whole file; returns false on any IO error.
bool read_file(const char* path, std::vector<uint8_t>* buf) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  if (std::fseek(f, 0, SEEK_END) != 0) {
    std::fclose(f);
    return false;
  }
  const long sz = std::ftell(f);
  if (sz < 0) {
    std::fclose(f);
    return false;
  }
  std::fseek(f, 0, SEEK_SET);
  buf->resize(static_cast<size_t>(sz));
  const bool ok =
      sz == 0 ||
      std::fread(buf->data(), 1, static_cast<size_t>(sz), f) ==
          static_cast<size_t>(sz);
  std::fclose(f);
  return ok;
}

void short_side_dims(int w, int h, int short_side, int* nw, int* nh) {
  if (short_side <= 0 || std::min(w, h) == short_side) {
    *nw = w;
    *nh = h;
    return;
  }
  const double s = static_cast<double>(short_side) / std::min(w, h);
  *nw = std::max(short_side, static_cast<int>(std::lround(w * s)));
  *nh = std::max(short_side, static_cast<int>(std::lround(h * s)));
}

}  // namespace

extern "C" {

// Probe the post-(short-side-resize) dimensions of a JPEG.
int x3d_probe(const uint8_t* data, size_t len, int short_side,
              int* w, int* h) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
               static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  const int iw = cinfo.image_width, ih = cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  short_side_dims(iw, ih, short_side, w, h);
  return 0;
}

// Decode -> short-side resize -> crop (x1,y1,side in resized coords;
// side<=0 => centered largest square) -> resize to out_size.
// use_dct_scale != 0 lets libjpeg decode at a DCT-scaled (M/8) size just
// covering short_side — ~2-8x faster but a slightly different lowpass than
// a full decode + triangle resample (use 0 for PIL-exact output).
// out must hold out_size*out_size*3 bytes.  Returns 0 on success.
int x3d_decode_frame(const uint8_t* data, size_t len, int short_side,
                     int use_dct_scale, int crop_x, int crop_y,
                     int crop_side, int out_size, uint8_t* out) {
  std::vector<uint8_t> rgb;
  int dw = 0, dh = 0;
  if (!decode_rgb(data, len, use_dct_scale ? short_side : 0, &rgb, &dw,
                  &dh)) {
    return 1;
  }

  // resize decoded image to exact short-side target
  int tw, th;
  short_side_dims(dw, dh, short_side, &tw, &th);
  std::vector<uint8_t> resized;
  const uint8_t* base = rgb.data();
  int stride = dw;
  if (tw != dw || th != dh) {
    resized.resize(static_cast<size_t>(tw) * th * 3);
    resample(rgb.data(), dw, 0, 0, dw, dh, tw, th, resized.data());
    base = resized.data();
    stride = tw;
  } else {
    tw = dw;
    th = dh;
  }

  int side = crop_side;
  int x1 = crop_x, y1 = crop_y;
  if (side <= 0) {  // centered largest square
    side = std::min(tw, th);
    x1 = static_cast<int>(std::lround((tw - side) / 2.0));
    y1 = static_cast<int>(std::lround((th - side) / 2.0));
  }
  x1 = std::max(0, std::min(x1, tw - side));
  y1 = std::max(0, std::min(y1, th - side));
  if (side > std::min(tw, th)) return 2;

  resample(base, stride, x1, y1, side, side, out_size, out_size, out);
  return 0;
}

// Decode a whole clip natively: file IO + decode + crop for `n_frames`
// JPEG paths with one shared crop (the clip-consistent augmentation
// contract, spatial_transforms.py:30-32), frame-parallel over an internal
// worker team — no Python in the per-frame loop (the reference leans on 12
// forked DataLoader worker *processes* for this, dataloader.py:704-723).
// n_threads <= 0 => hardware concurrency. Crop/size semantics are exactly
// x3d_decode_frame's; out must hold n_frames*out_size*out_size*3 bytes.
// Returns 0, or the first failing frame's error code with its index in
// *err_frame.
int x3d_decode_clip(const char* const* paths, int n_frames, int short_side,
                    int use_dct_scale, int crop_x, int crop_y, int crop_side,
                    int out_size, int n_threads, uint8_t* out,
                    int* err_frame) {
  if (n_frames <= 0) return 0;
  if (n_threads <= 0) {
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 1;
  }
  n_threads = std::min(n_threads, n_frames);

  const size_t frame_bytes = static_cast<size_t>(out_size) * out_size * 3;
  std::vector<int> rcs(n_frames, 0);
  std::atomic<int> next(0);
  std::atomic<bool> failed(false);

  auto work = [&]() {
    std::vector<uint8_t> buf;
    for (;;) {
      const int i = next.fetch_add(1, std::memory_order_relaxed);
      if (i >= n_frames || failed.load(std::memory_order_relaxed)) break;
      int rc;
      if (!read_file(paths[i], &buf)) {
        rc = 3;
      } else {
        rc = x3d_decode_frame(buf.data(), buf.size(), short_side,
                              use_dct_scale, crop_x, crop_y, crop_side,
                              out_size, out + static_cast<size_t>(i)
                                            * frame_bytes);
      }
      if (rc != 0) {
        rcs[i] = rc;
        failed.store(true, std::memory_order_relaxed);
      }
    }
  };

  if (n_threads == 1) {
    work();
  } else {
    std::vector<std::thread> team;
    team.reserve(n_threads);
    for (int t = 0; t < n_threads; ++t) team.emplace_back(work);
    for (std::thread& th : team) th.join();
  }

  for (int i = 0; i < n_frames; ++i) {
    if (rcs[i] != 0) {
      if (err_frame != nullptr) *err_frame = i;
      return rcs[i];
    }
  }
  return 0;
}

}  // extern "C"
