// Native Box-Cox skewness-minimizing lambda fitter.
//
// The reference fits one Box-Cox lambda per input column by SLSQP
// minimization of the squared unbiased sample skewness (reference:
// SCFGP/Scaler.py:56-70): lambda = softplus(raw), raw in [-5, 5].  That
// host-side loop is the data-ingestion hot spot for wide inputs (D columns x
// ~100 optimizer iterations x O(N) objective evals — minutes at D=256,
// N=1e6 through SciPy).  This translation unit implements the same
// objective with
//   * an OpenMP parallel loop over columns,
//   * a coarse grid scan + golden-section refinement on the 1-D bounded
//     problem (more robust than a local quasi-Newton start at 0, and
//     bitwise-deterministic),
// exposed with a C ABI for ctypes (no pybind11 in this image).
//
// Build: make -C native   (produces libscfgp_native.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

// Squared unbiased sample skewness of boxcox(x, lm), reference formula:
// boxcox(x, lm) = (sign(x)*|x|^lm - 1)/lm; G1 = g1 * sqrt(n(n-1))/(n-2).
double objective(const double* x, int64_t n, double lm,
                 std::vector<double>& buf) {
  for (int64_t i = 0; i < n; ++i) {
    double v = x[i];
    double s = v >= 0.0 ? 1.0 : -1.0;
    buf[i] = (s * std::pow(std::fabs(v), lm) - 1.0) / lm;
  }
  double mean = 0.0;
  for (int64_t i = 0; i < n; ++i) mean += buf[i];
  mean /= static_cast<double>(n);
  double m2 = 0.0, m3 = 0.0;
  for (int64_t i = 0; i < n; ++i) {
    double d = buf[i] - mean;
    m2 += d * d;
    m3 += d * d * d;
  }
  m2 /= static_cast<double>(n);
  m3 /= static_cast<double>(n);
  if (m2 <= 0.0) return 0.0;
  double g1 = m3 / std::pow(m2, 1.5);
  double nn = static_cast<double>(n);
  double G1 = g1 * std::sqrt(nn * (nn - 1.0)) / (nn - 2.0);
  return G1 * G1;
}

inline double softplus(double r) { return std::log1p(std::exp(r)); }

// Golden-section minimization of f(raw) on [lo, hi].
template <typename F>
double golden(F f, double lo, double hi, double tol, int max_iter) {
  const double gr = 0.6180339887498949;
  double a = lo, b = hi;
  double c = b - gr * (b - a);
  double d = a + gr * (b - a);
  double fc = f(c), fd = f(d);
  for (int it = 0; it < max_iter && (b - a) > tol; ++it) {
    if (fc < fd) {
      b = d; d = c; fd = fc;
      c = b - gr * (b - a);
      fc = f(c);
    } else {
      a = c; c = d; fc = fd;
      d = a + gr * (b - a);
      fd = f(d);
    }
  }
  return 0.5 * (a + b);
}

}  // namespace

extern "C" {

// X: column-major (n rows, d cols) scaled to [0, 1]; lambdas: out, size d.
// distinct_min: columns with fewer distinct values keep lambda = 1
// (reference Scaler.py:60-61 uses 10).
void scfgp_fit_boxcox_lambdas(const double* X, int64_t n, int64_t d,
                              int64_t distinct_min, double* lambdas) {
#pragma omp parallel
  {
    std::vector<double> buf(static_cast<size_t>(n));
    std::vector<double> sorted(static_cast<size_t>(n));
#pragma omp for schedule(dynamic)
    for (int64_t j = 0; j < d; ++j) {
      const double* col = X + j * n;
      // distinct-count check (sort-based)
      sorted.assign(col, col + n);
      std::sort(sorted.begin(), sorted.end());
      int64_t distinct = n > 0 ? 1 : 0;
      for (int64_t i = 1; i < n; ++i)
        if (sorted[i] != sorted[i - 1]) ++distinct;
      if (distinct < distinct_min) {
        lambdas[j] = 1.0;
        continue;
      }
      auto f = [&](double raw) {
        return objective(col, n, softplus(raw), buf);
      };
      // Coarse scan over the bounded raw-domain, then golden refine.
      const int kGrid = 41;
      double best_raw = 0.0, best_val = f(0.0);
      for (int g = 0; g < kGrid; ++g) {
        double raw = -5.0 + 10.0 * g / (kGrid - 1);
        double v = f(raw);
        if (v < best_val) { best_val = v; best_raw = raw; }
      }
      double lo = best_raw - 10.0 / (kGrid - 1);
      double hi = best_raw + 10.0 / (kGrid - 1);
      if (lo < -5.0) lo = -5.0;
      if (hi > 5.0) hi = 5.0;
      double raw = golden(f, lo, hi, 1e-10, 200);
      lambdas[j] = softplus(raw);
    }
  }
}

}  // extern "C"
