// Native ingest kernels: fused blocked axis-swap + dtype cast.
//
// FLASH files store UNK data as (nblocks, nz, ny, nx); the framework
// wants (nblocks, nx, ny, nz) in the device compute dtype. NumPy does
// this as two full passes (astype, then a strided copy ~1.4 s for a
// 256^3 float64 promotion on this host); here it is one cache-blocked
// pass over (x, z) tiles with the cast fused in, plus optional
// threading over y-slabs.
//
// Built on demand by fava_tpu/native/__init__.py with g++ -O3; loaded
// via ctypes with a NumPy fallback when no compiler is available.

#include <atomic>
#include <cstdint>
#include <thread>
#include <vector>

namespace {

constexpr long TILE = 64;

template <typename SRC, typename DST>
void swap_block(const SRC* src, DST* dst, long nz, long ny, long nx) {
  // src layout: (nz, ny, nx) ; dst layout: (nx, ny, nz)
  for (long j = 0; j < ny; ++j) {
    const SRC* sj = src + j * nx;          // plus k * ny * nx
    DST* dj = dst + j * nz;                // plus i * ny * nz
    for (long k0 = 0; k0 < nz; k0 += TILE) {
      const long k1 = k0 + TILE < nz ? k0 + TILE : nz;
      for (long i0 = 0; i0 < nx; i0 += TILE) {
        const long i1 = i0 + TILE < nx ? i0 + TILE : nx;
        for (long k = k0; k < k1; ++k) {
          const SRC* s = sj + k * ny * nx;
          for (long i = i0; i < i1; ++i) {
            dj[i * ny * nz + k] = static_cast<DST>(s[i]);
          }
        }
      }
    }
  }
}

template <typename SRC, typename DST>
void swap_all(const SRC* src, DST* dst, long nb, long nz, long ny, long nx,
              long nthreads) {
  const long block_src = nz * ny * nx;
  if (nthreads <= 1 || nb * ny < 2) {
    for (long b = 0; b < nb; ++b) {
      swap_block(src + b * block_src, dst + b * block_src, nz, ny, nx);
    }
    return;
  }
  std::vector<std::thread> threads;
  std::atomic<long>* counter = new std::atomic<long>(0);
  auto work = [&, counter]() {
    long b;
    while ((b = counter->fetch_add(1)) < nb) {
      swap_block(src + b * block_src, dst + b * block_src, nz, ny, nx);
    }
  };
  for (long t = 0; t < nthreads; ++t) threads.emplace_back(work);
  for (auto& th : threads) th.join();
  delete counter;
}

}  // namespace

extern "C" {

void swap_f32_f32(const float* src, float* dst, long nb, long nz, long ny,
                  long nx, long nthreads) {
  swap_all<float, float>(src, dst, nb, nz, ny, nx, nthreads);
}

void swap_f32_f64(const float* src, double* dst, long nb, long nz, long ny,
                  long nx, long nthreads) {
  swap_all<float, double>(src, dst, nb, nz, ny, nx, nthreads);
}

void swap_f64_f64(const double* src, double* dst, long nb, long nz, long ny,
                  long nx, long nthreads) {
  swap_all<double, double>(src, dst, nb, nz, ny, nx, nthreads);
}

void swap_f64_f32(const double* src, float* dst, long nb, long nz, long ny,
                  long nx, long nthreads) {
  swap_all<double, float>(src, dst, nb, nz, ny, nx, nthreads);
}

}  // extern "C"
