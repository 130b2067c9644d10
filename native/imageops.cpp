// Native image operations for the data-loading pipeline.
//
// Replaces the reference's ImageMagick `mogrify` subprocess (reference
// load_llff.py:8-57) with an in-process, OpenMP-parallel area-average
// resampler matching cv2.INTER_AREA semantics for downscaling. Called from
// Python via ctypes (nerf_shared_tpu/data/native_imageops.py).
//
// Build: see native/Makefile (g++ -O3 -march=native -fopenmp -shared -fPIC).

#include <algorithm>
#include <cstdint>
#include <cstring>

extern "C" {

// Area-average resize: float32 HWC -> float32 HWC.
// Exact box average over the source footprint of each output pixel
// (cv2.INTER_AREA behavior for downscale; bilinear-equivalent for upscale
// is NOT handled here — callers only downscale).
void resize_area_f32(const float* src, int src_h, int src_w, int channels,
                     float* dst, int dst_h, int dst_w) {
  const double scale_y = static_cast<double>(src_h) / dst_h;
  const double scale_x = static_cast<double>(src_w) / dst_w;

#pragma omp parallel for schedule(static)
  for (int oy = 0; oy < dst_h; ++oy) {
    const double fy0 = oy * scale_y;
    const double fy1 = (oy + 1) * scale_y;
    const int y0 = static_cast<int>(fy0);
    const int y1 = std::min(static_cast<int>(std::max(fy1 - 1e-9, 0.0)),
                            src_h - 1);
    for (int ox = 0; ox < dst_w; ++ox) {
      const double fx0 = ox * scale_x;
      const double fx1 = (ox + 1) * scale_x;
      const int x0 = static_cast<int>(fx0);
      const int x1 = std::min(static_cast<int>(std::max(fx1 - 1e-9, 0.0)),
                              src_w - 1);
      for (int c = 0; c < channels; ++c) {
        double acc = 0.0;
        double wsum = 0.0;
        for (int y = y0; y <= y1; ++y) {
          // vertical coverage of source row y by output row oy
          const double cy = std::min<double>(y + 1, fy1) -
                            std::max<double>(y, fy0);
          for (int x = x0; x <= x1; ++x) {
            const double cx = std::min<double>(x + 1, fx1) -
                              std::max<double>(x, fx0);
            const double w = cy * cx;
            acc += w * src[(static_cast<int64_t>(y) * src_w + x) * channels + c];
            wsum += w;
          }
        }
        dst[(static_cast<int64_t>(oy) * dst_w + ox) * channels + c] =
            static_cast<float>(acc / wsum);
      }
    }
  }
}

// uint8 -> float32 [0,1] conversion fused with the resize (saves one pass
// over full-resolution data when minifying LLFF captures).
void resize_area_u8_to_f32(const uint8_t* src, int src_h, int src_w,
                           int channels, float* dst, int dst_h, int dst_w) {
  const double scale_y = static_cast<double>(src_h) / dst_h;
  const double scale_x = static_cast<double>(src_w) / dst_w;
  const double inv255 = 1.0 / 255.0;

#pragma omp parallel for schedule(static)
  for (int oy = 0; oy < dst_h; ++oy) {
    const double fy0 = oy * scale_y;
    const double fy1 = (oy + 1) * scale_y;
    const int y0 = static_cast<int>(fy0);
    const int y1 = std::min(static_cast<int>(std::max(fy1 - 1e-9, 0.0)),
                            src_h - 1);
    for (int ox = 0; ox < dst_w; ++ox) {
      const double fx0 = ox * scale_x;
      const double fx1 = (ox + 1) * scale_x;
      const int x0 = static_cast<int>(fx0);
      const int x1 = std::min(static_cast<int>(std::max(fx1 - 1e-9, 0.0)),
                              src_w - 1);
      for (int c = 0; c < channels; ++c) {
        double acc = 0.0;
        double wsum = 0.0;
        for (int y = y0; y <= y1; ++y) {
          const double cy = std::min<double>(y + 1, fy1) -
                            std::max<double>(y, fy0);
          for (int x = x0; x <= x1; ++x) {
            const double cx = std::min<double>(x + 1, fx1) -
                              std::max<double>(x, fx0);
            const double w = cy * cx;
            acc += w * src[(static_cast<int64_t>(y) * src_w + x) * channels + c];
            wsum += w;
          }
        }
        dst[(static_cast<int64_t>(oy) * dst_w + ox) * channels + c] =
            static_cast<float>(acc / wsum * inv255);
      }
    }
  }
}

// Composite RGBA onto a constant background: out = rgb*a + bg*(1-a).
// The blender/LINEMOD white-background pre-pass (reference utils.py:255-258)
// for large image stacks without a numpy temporary.
void composite_background_f32(const float* rgba, int64_t n_px, float bg,
                              float* rgb_out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n_px; ++i) {
    const float a = rgba[i * 4 + 3];
    const float one_minus = (1.0f - a) * bg;
    rgb_out[i * 3 + 0] = rgba[i * 4 + 0] * a + one_minus;
    rgb_out[i * 3 + 1] = rgba[i * 4 + 1] * a + one_minus;
    rgb_out[i * 3 + 2] = rgba[i * 4 + 2] * a + one_minus;
  }
}

}  // extern "C"
