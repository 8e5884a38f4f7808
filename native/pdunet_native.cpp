// Native host-side data engine for pdunet_tpu.
//
// Replaces the reference stack's native data-path components (torch
// DataLoader C++ worker machinery; SURVEY.md §2b C4/C12): multithreaded
// ellipse-phantom rasterization and closed-form parallel-beam sinogram
// synthesis, exposed through a plain C ABI consumed via ctypes
// (pdunet_tpu/data/native.py). All entry points release the GIL by
// construction (pure C, no Python API), so Python-side prefetch threads get
// true parallelism.
//
// The math mirrors pdunet_tpu/data/phantoms.py exactly (same supersampled
// box-average rasterization, same closed-form Radon of an ellipse), so the
// Python implementations serve as the correctness oracle.
//
// Build: make -C native   (produces libpdunet_native.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <functional>
#include <thread>
#include <vector>

namespace {

struct Ellipse {
  double rho, a, b, x0, y0, phi;
};

inline int hw_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n == 0 ? 1 : static_cast<int>(n);
}

void parallel_for(int n, int n_threads, const std::function<void(int, int)>& fn) {
  if (n_threads <= 1 || n < 2) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> pool;
  int chunk = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int lo = t * chunk;
    int hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    pool.emplace_back(fn, lo, hi);
  }
  for (auto& th : pool) th.join();
}

// xoshiro256** — small, fast, reproducible PRNG for phantom sampling.
struct Rng {
  uint64_t s[4];
  explicit Rng(uint64_t seed) {
    // splitmix64 initialization
    for (int i = 0; i < 4; ++i) {
      seed += 0x9E3779B97f4A7C15ULL;
      uint64_t z = seed;
      z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
      z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
      s[i] = z ^ (z >> 31);
    }
  }
  static uint64_t rotl(uint64_t x, int k) { return (x << k) | (x >> (64 - k)); }
  uint64_t next() {
    uint64_t r = rotl(s[1] * 5, 7) * 9;
    uint64_t t = s[1] << 17;
    s[2] ^= s[0]; s[3] ^= s[1]; s[1] ^= s[2]; s[0] ^= s[3]; s[2] ^= t;
    s[3] = rotl(s[3], 45);
    return r;
  }
  double uniform(double lo, double hi) {
    return lo + (hi - lo) * ((next() >> 11) * 0x1.0p-53);
  }
};

void rasterize_one(const Ellipse* ells, int n_ell, float* out, int N,
                   double pixel_spacing, int ss, int row_lo, int row_hi) {
  const double c = (N - 1) / 2.0;
  const double inv_ss2 = 1.0 / (ss * ss);
  for (int j = row_lo; j < row_hi; ++j) {
    for (int i = 0; i < N; ++i) {
      double acc = 0.0;
      for (int sy = 0; sy < ss; ++sy) {
        const double y = ((j * ss + sy + 0.5) / ss - 0.5 - c) * pixel_spacing;
        for (int sx = 0; sx < ss; ++sx) {
          const double x = ((i * ss + sx + 0.5) / ss - 0.5 - c) * pixel_spacing;
          double v = 0.0;
          for (int e = 0; e < n_ell; ++e) {
            const Ellipse& el = ells[e];
            const double cp = std::cos(el.phi), sp = std::sin(el.phi);
            const double xr = (x - el.x0) * cp + (y - el.y0) * sp;
            const double yr = -(x - el.x0) * sp + (y - el.y0) * cp;
            const double q = (xr / el.a) * (xr / el.a) + (yr / el.b) * (yr / el.b);
            if (q <= 1.0) v += el.rho;
          }
          acc += v;
        }
      }
      out[j * N + i] = static_cast<float>(acc * inv_ss2);
    }
  }
}

}  // namespace

extern "C" {

// Rasterize a sum of ellipses (n_ell × 6 doubles: rho a b x0 y0 phi) to an
// (N, N) float32 image, ss× supersampled, using up to n_threads threads
// (0 → hardware concurrency).
void pdunet_rasterize(const double* ellipses, int n_ell, float* out, int N,
                      double pixel_spacing, int ss, int n_threads) {
  const Ellipse* ells = reinterpret_cast<const Ellipse*>(ellipses);
  if (n_threads <= 0) n_threads = hw_threads();
  parallel_for(N, n_threads, [&](int lo, int hi) {
    rasterize_one(ells, n_ell, out, N, pixel_spacing, ss, lo, hi);
  });
}

// Closed-form parallel-beam sinogram (n_ang × n_det float32).
void pdunet_analytic_sinogram(const double* ellipses, int n_ell,
                              const double* angles, int n_ang, float* out,
                              int n_det, double det_spacing, int n_threads) {
  const Ellipse* ells = reinterpret_cast<const Ellipse*>(ellipses);
  if (n_threads <= 0) n_threads = hw_threads();
  const double cs = (n_det - 1) / 2.0;
  parallel_for(n_ang, n_threads, [&](int lo, int hi) {
    for (int a = lo; a < hi; ++a) {
      const double ca = std::cos(angles[a]), sa = std::sin(angles[a]);
      for (int d = 0; d < n_det; ++d) {
        const double s = (d - cs) * det_spacing;
        double acc = 0.0;
        for (int e = 0; e < n_ell; ++e) {
          const Ellipse& el = ells[e];
          const double th_c = ca * std::cos(el.phi) + sa * std::sin(el.phi);
          const double th_s = -ca * std::sin(el.phi) + sa * std::cos(el.phi);
          const double alpha2 = el.a * el.a * th_c * th_c + el.b * el.b * th_s * th_s;
          const double t = s - el.x0 * ca - el.y0 * sa;
          const double under = alpha2 - t * t;
          if (under > 0.0)
            acc += 2.0 * el.rho * el.a * el.b * std::sqrt(under) / alpha2;
        }
        out[a * n_det + d] = static_cast<float>(acc);
      }
    }
  });
}

// Sample a batch of random ellipse phantoms and rasterize them:
// out (batch, N, N) float32. Deterministic in (seed, batch index).
void pdunet_phantom_batch(uint64_t seed, int batch, int n_ell, float* out,
                          int N, double pixel_spacing, int ss,
                          double radius_frac, int n_threads) {
  if (n_threads <= 0) n_threads = hw_threads();
  const double radius = radius_frac * N * pixel_spacing;
  parallel_for(batch, n_threads, [&](int lo, int hi) {
    std::vector<Ellipse> ells(n_ell);
    for (int b = lo; b < hi; ++b) {
      Rng rng(seed * 0x517cc1b727220a95ULL + static_cast<uint64_t>(b));
      for (int e = 0; e < n_ell; ++e) {
        ells[e].rho = rng.uniform(-1.0, 1.0);
        ells[e].a = rng.uniform(0.08, 0.5) * radius;
        ells[e].b = rng.uniform(0.08, 0.5) * radius;
        const double r0 = rng.uniform(0.0, 0.6) * radius;
        const double ang = rng.uniform(0.0, 2.0 * M_PI);
        ells[e].x0 = r0 * std::cos(ang);
        ells[e].y0 = r0 * std::sin(ang);
        ells[e].phi = rng.uniform(0.0, M_PI);
      }
      rasterize_one(ells.data(), n_ell, out + static_cast<size_t>(b) * N * N,
                    N, pixel_spacing, ss, 0, N);
    }
  });
}

}  // extern "C"
