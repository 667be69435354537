// Native data-path kernels for curvature_tpu.
//
// The reference's input pipeline leans on torch DataLoader workers and
// PIL/torchvision C extensions; this library provides the equivalent native
// speed for our numpy-based loaders: batch decode of the binary dataset
// formats (MNIST idx, CIFAR CHW records, GTSRB PPM) plus fused
// scale+normalize, multithreaded over samples.
//
// Build: bash native/build.sh   (g++ -O3 -shared; no external deps)
// Python binding: curvature_tpu/data/native.py (ctypes).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>
#include <algorithm>

namespace {

void parallel_for(int64_t n, int threads, void (*fn)(int64_t, int64_t, void*),
                  void* ctx) {
  threads = std::max(1, std::min<int>(threads, (int)n));
  std::vector<std::thread> pool;
  int64_t chunk = (n + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    pool.emplace_back(fn, lo, hi, ctx);
  }
  for (auto& th : pool) th.join();
}

struct IdxCtx {
  const uint8_t* raw;
  float* out;
  int64_t pixels;  // per image
};

void idx_worker(int64_t lo, int64_t hi, void* p) {
  auto* c = (IdxCtx*)p;
  constexpr float kInv = 1.0f / 255.0f;
  for (int64_t i = lo; i < hi; ++i) {
    const uint8_t* src = c->raw + i * c->pixels;
    float* dst = c->out + i * c->pixels;
    for (int64_t j = 0; j < c->pixels; ++j) dst[j] = src[j] * kInv;
  }
}

struct CifarCtx {
  const uint8_t* raw;  // [n, 3, 32, 32] channel-major rows
  float* out;          // [n, 32, 32, 3] NHWC
  const float* mean;   // [3] or nullptr
  const float* inv_std;
};

void cifar_worker(int64_t lo, int64_t hi, void* p) {
  auto* c = (CifarCtx*)p;
  constexpr int HW = 32 * 32;
  constexpr float kInv = 1.0f / 255.0f;
  for (int64_t i = lo; i < hi; ++i) {
    const uint8_t* src = c->raw + i * 3 * HW;
    float* dst = c->out + i * 3 * HW;
    for (int ch = 0; ch < 3; ++ch) {
      float m = c->mean ? c->mean[ch] : 0.0f;
      float s = c->inv_std ? c->inv_std[ch] : 1.0f;
      const uint8_t* plane = src + ch * HW;
      for (int px = 0; px < HW; ++px) {
        dst[px * 3 + ch] = (plane[px] * kInv - m) * s;
      }
    }
  }
}

struct NormCtx {
  float* x;            // [n, c] rows
  const float* mean;   // [c]
  const float* inv_std;
  int64_t c;
};

void norm_worker(int64_t lo, int64_t hi, void* p) {
  auto* ctx = (NormCtx*)p;
  for (int64_t i = lo; i < hi; ++i) {
    float* row = ctx->x + i * ctx->c;
    for (int64_t j = 0; j < ctx->c; ++j) {
      row[j] = (row[j] - ctx->mean[j % 3]) * ctx->inv_std[j % 3];
    }
  }
}

}  // namespace

extern "C" {

// [n, pixels] uint8 -> float32 in [0, 1].
void ct_decode_idx(const uint8_t* raw, int64_t n, int64_t pixels, float* out,
                   int threads) {
  IdxCtx c{raw, out, pixels};
  parallel_for(n, threads, idx_worker, &c);
}

// CIFAR records [n, 3072] CHW uint8 -> NHWC float32, optionally normalized.
// mean/std may be null for plain [0, 1] scaling.
void ct_decode_cifar(const uint8_t* raw, int64_t n, float* out,
                     const float* mean, const float* inv_std, int threads) {
  CifarCtx c{raw, out, mean, inv_std};
  parallel_for(n, threads, cifar_worker, &c);
}

// In-place per-channel normalization of NHWC float32 [rows, 3].
void ct_normalize_nhwc3(float* x, int64_t rows, const float* mean,
                        const float* inv_std, int threads) {
  NormCtx c{x, mean, inv_std, 3};
  parallel_for(rows, threads, norm_worker, &c);
}

int ct_version() { return 1; }

}  // extern "C"
