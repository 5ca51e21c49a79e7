// cunet_host: native host-side data-pipeline kernels.
//
// The reference's input pipeline spends its host time in a chain of
// scipy/PIL calls per sample (shrink -> pad -> window-extract -> rotate ->
// resize, ref:pylib/HumanAug.py:115-174, plus per-point numpy Gaussian
// pastes, ref:pylib/HumanPts.py:49-76). This library collapses the crop
// chain into ONE fused inverse-affine bilinear warp and renders all heatmap
// channels in a single pass, with a pthread pool for batch parallelism.
// Exposed as a plain C ABI consumed via ctypes (cunet_tpu/data/native.py).
//
// Numerics notes:
// - render_heatmaps is bit-compatible with the Python renderer
//   (trunc-toward-zero windows, (3*sigma)^2 denominator, peak at ul+3).
// - affine_crop_bilinear is the float fast path: it skips the reference's
//   uint8 round-trips, so it is NOT bit-identical to the compat (PIL) path;
//   the Python pipeline keeps the compat mode for checkpoint-parity evals.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <pthread.h>

#include <algorithm>
#include <vector>

extern "C" {

// out[res*res*c] <- img[h*w*c] warped by the 3x3 matrix inv_t mapping
// OUTPUT (crop) coords -> SOURCE (image) coords. Zero padding outside.
void affine_crop_bilinear(const float* img, int64_t h, int64_t w, int64_t c,
                          const double* inv_t, float* out, int64_t res) {
  const double a00 = inv_t[0], a01 = inv_t[1], a02 = inv_t[2];
  const double a10 = inv_t[3], a11 = inv_t[4], a12 = inv_t[5];
  for (int64_t oy = 0; oy < res; ++oy) {
    for (int64_t ox = 0; ox < res; ++ox) {
      const double sx = a00 * ox + a01 * oy + a02;
      const double sy = a10 * ox + a11 * oy + a12;
      const int64_t x0 = (int64_t)std::floor(sx);
      const int64_t y0 = (int64_t)std::floor(sy);
      const double fx = sx - x0, fy = sy - y0;
      float* dst = out + (oy * res + ox) * c;
      if (x0 < -1 || y0 < -1 || x0 >= w || y0 >= h) {
        std::memset(dst, 0, sizeof(float) * c);
        continue;
      }
      const double w00 = (1 - fx) * (1 - fy), w01 = fx * (1 - fy);
      const double w10 = (1 - fx) * fy, w11 = fx * fy;
      const bool i00 = x0 >= 0 && y0 >= 0;
      const bool i01 = x0 + 1 < w && y0 >= 0;
      const bool i10 = x0 >= 0 && y0 + 1 < h;
      const bool i11 = x0 + 1 < w && y0 + 1 < h;
      const float* p00 = img + (y0 * w + x0) * c;
      const float* p01 = p00 + c;
      const float* p10 = p00 + w * c;
      const float* p11 = p10 + c;
      for (int64_t k = 0; k < c; ++k) {
        double v = 0.0;
        if (i00) v += w00 * p00[k];
        if (i01) v += w01 * p01[k];
        if (i10) v += w10 * p10[k];
        if (i11) v += w11 * p11[k];
        dst[k] = (float)v;
      }
    }
  }
}

// Heatmaps: pts[L*2] (x, y) -> out[height*width*L], channel-last.
// Bit-compatible with cunet_tpu.ops.heatmap.render_heatmaps_np.
void render_heatmaps(const double* pts, int64_t L, int64_t height,
                     int64_t width, double sigma, float* out) {
  const double t = std::ceil(3.0 * sigma);
  const int64_t ti = (int64_t)t;
  std::memset(out, 0, sizeof(float) * height * width * L);
  for (int64_t i = 0; i < L; ++i) {
    const double x = pts[i * 2], y = pts[i * 2 + 1];
    if (x <= 0 || y <= 0) continue;
    const int64_t ulx = (int64_t)(x - t);  // C++ casts truncate toward zero
    const int64_t uly = (int64_t)(y - t);
    const int64_t brx = (int64_t)(x + t);
    const int64_t bry = (int64_t)(y + t);
    if (ulx >= width || uly >= height || brx < 0 || bry < 0) continue;
    const int64_t cx = ulx + ti, cy = uly + ti;
    const int64_t y_lo = std::max<int64_t>(uly, 0);
    const int64_t y_hi = std::min<int64_t>(bry, height - 1);
    const int64_t x_lo = std::max<int64_t>(ulx, 0);
    const int64_t x_hi = std::min<int64_t>(brx, width - 1);
    for (int64_t py = y_lo; py <= y_hi; ++py) {
      for (int64_t px = x_lo; px <= x_hi; ++px) {
        const double dx = (double)(px - cx), dy = (double)(py - cy);
        out[(py * width + px) * L + i] =
            (float)std::exp(-(dx * dx + dy * dy) / (t * t));
      }
    }
  }
}

// Per-channel brightness scale + clamp [0,1], in place (the color jitter of
// ref:data/mpii_for_mpii_22.py:134-136).
void scale_clamp_channels(float* img, int64_t h, int64_t w, int64_t c,
                          const float* factors) {
  for (int64_t i = 0; i < h * w; ++i) {
    float* px = img + i * c;
    for (int64_t k = 0; k < c; ++k) {
      float v = px[k] * factors[k];
      px[k] = v < 0.f ? 0.f : (v > 1.f ? 1.f : v);
    }
  }
}

// ---------------------------------------------------------------------------
// batched crop with a pthread worker pool
// ---------------------------------------------------------------------------

struct CropJob {
  const float* img;
  int64_t h, w, c;
  const double* inv_t;  // 9 doubles
  float* out;
  int64_t res;
};

struct PoolCtx {
  const CropJob* jobs;
  int64_t n;
  int64_t next;  // guarded by mutex
  pthread_mutex_t mu;
};

static void* crop_worker(void* arg) {
  PoolCtx* ctx = (PoolCtx*)arg;
  for (;;) {
    pthread_mutex_lock(&ctx->mu);
    const int64_t i = ctx->next++;
    pthread_mutex_unlock(&ctx->mu);
    if (i >= ctx->n) return nullptr;
    const CropJob& j = ctx->jobs[i];
    affine_crop_bilinear(j.img, j.h, j.w, j.c, j.inv_t, j.out, j.res);
  }
}

// imgs: array of n pointers; dims: n*3 (h, w, c); inv_ts: n*9; outs: n ptrs.
void affine_crop_batch(const float** imgs, const int64_t* dims,
                       const double* inv_ts, float** outs, int64_t res,
                       int64_t n, int64_t n_threads) {
  std::vector<CropJob> jobs((size_t)n);
  for (int64_t i = 0; i < n; ++i) {
    jobs[(size_t)i] = {imgs[i], dims[i * 3], dims[i * 3 + 1], dims[i * 3 + 2],
                       inv_ts + i * 9, outs[i], res};
  }
  n_threads = std::max<int64_t>(1, std::min<int64_t>(n_threads, n));
  PoolCtx ctx{jobs.data(), n, 0, PTHREAD_MUTEX_INITIALIZER};
  std::vector<pthread_t> threads((size_t)n_threads);
  for (auto& th : threads) pthread_create(&th, nullptr, crop_worker, &ctx);
  for (auto& th : threads) pthread_join(th, nullptr);
}

int cunet_host_abi_version() { return 1; }

}  // extern "C"
