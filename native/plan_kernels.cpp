// Host-side visibility-stream planning kernels (C++/OpenMP).
//
// The reference's runtime substrate does this class of work in numba/C++
// (uv binning in utils/weighting.py, chunk mapping in utils/misc.py). Here
// the device compute path is XLA, and the native runtime owns the
// *planning* hot path: converting (uvw, freq) streams to oversampled grid
// coordinates and bucketing them by w-plane so the device program sees
// contiguous, statically sized slices (ops/gridder.py plan_wgridder).
//
// The bucketing is a stable counting sort over plane indices — O(n) vs the
// numpy argsort's O(n log n) — and the coordinate conversion is a fused,
// OpenMP-parallel pass instead of four numpy temporaries.
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).

#include <atomic>
#include <cstdint>
#include <cmath>
#include <cstring>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// Fused uvw -> (u_pix, v_pix, w_lam) conversion.
//   u_pix = su * u * (freq/c) * cellx * nbig_x   (likewise v)
//   w_lam = sw * w * (freq/c)
// Layout: outputs are flattened (row, chan).
void uvw_to_pix(const double* uvw, const double* freq, int64_t nrow, int64_t nchan,
                double su, double sv, double sw,
                double scale_u, double scale_v, double inv_c,
                double l_shift, double m_shift,
                double* u_pix, double* v_pix, double* w_lam,
                double* shift_re, double* shift_im) {
#pragma omp parallel for schedule(static)
  for (int64_t r = 0; r < nrow; ++r) {
    const double u = uvw[3 * r + 0];
    const double v = uvw[3 * r + 1];
    const double w = uvw[3 * r + 2];
    for (int64_t c = 0; c < nchan; ++c) {
      const double nf = freq[c] * inv_c;
      const int64_t k = r * nchan + c;
      const double ul = su * u * nf;
      const double vl = sv * v * nf;
      u_pix[k] = ul * scale_u;
      v_pix[k] = vl * scale_v;
      w_lam[k] = sw * w * nf;
      // phase-centre shift e^{-2 pi i (u' * lshift + v' * mshift)}
      const double ph = -2.0 * M_PI * (ul * l_shift + vl * m_shift);
      shift_re[k] = std::cos(ph);
      shift_im[k] = std::sin(ph);
    }
  }
}

// Stable counting sort of visibilities by base w-plane index i0 (values in
// [0, n_i0)), plus per-plane bucket ranges for kernel support w_supp:
// plane p covers sorted entries with i0 in [p - w_supp + 1, p].
// perm: output permutation (sorted order -> original index).
// starts/counts: (nw,) bucket ranges over the sorted stream.
void wplane_buckets(const int64_t* i0, int64_t n, int64_t n_i0, int64_t nw, int64_t w_supp,
                    int64_t* perm, int64_t* starts, int64_t* counts) {
  std::vector<int64_t> hist(n_i0 + 1, 0);
  for (int64_t i = 0; i < n; ++i) hist[i0[i] + 1]++;
  for (int64_t b = 0; b < n_i0; ++b) hist[b + 1] += hist[b];
  // hist[b] now = start offset of plane-b entries in sorted order
  std::vector<int64_t> cursor(hist.begin(), hist.end() - 1);
  for (int64_t i = 0; i < n; ++i) perm[cursor[i0[i]]++] = i;  // stable
  for (int64_t p = 0; p < nw; ++p) {
    const int64_t lo = p - w_supp + 1 < 0 ? 0 : p - w_supp + 1;
    const int64_t hi = p + 1 < n_i0 ? p + 1 : n_i0;
    const int64_t s = hist[lo];
    const int64_t e = hi <= lo ? s : hist[hi];
    starts[p] = s;
    counts[p] = e - s;
  }
}

// Apply a permutation out[i] = in[perm[i]] (gather), double payload.
void apply_perm(const double* in, const int64_t* perm, int64_t n, double* out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) out[i] = in[perm[i]];
}

}  // extern "C"
