// Sequential per-rating SGD oracle — the reference's exact training
// semantics (matrix_factorization/kernels.py:108-327 +
// kernel_matrix_factorization.py:320-445) in portable C++ (float64).
//
// Purpose: a fast, independent implementation of the reference's
// sequential trajectory for RMSE-parity testing of the vectorized
// mini-batch engine (the reference itself needs numba, absent here).
// This is a from-scratch implementation of the documented math, kept in
// the reference's conventions: error = pred - rating, updates use
// pre-update values within a rating, sigmoid/rbf deriv_base omits the
// outer scale factor c (PARITY.md #4), rbf has no bias terms.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

namespace {

inline double dot(const double* a, const double* b, int k) {
  double s = 0.0;
  for (int f = 0; f < k; ++f) s += a[f] * b[f];
  return s;
}

}  // namespace

extern "C" {

// kernel: 0=linear, 1=sigmoid, 2=rbf
// Runs n_epochs of per-rating SGD with a Fisher-Yates reshuffle of the
// visit order each epoch (seeded mt19937, mirroring the reference's
// np.random.shuffle at kernel_matrix_factorization.py:371).
// Arrays: u,i int32[n]; r float64[n]; P[nu*k], Q[ni*k], bu[nu], bi[ni].
// rmse_out[n_epochs] receives the full-train RMSE after each epoch.
void mf_sequential_sgd(
    int kernel, const int32_t* u, const int32_t* it, const double* r,
    long long n, int nu, int ni, int k, double mu, double lr, double reg,
    double gamma, double a, double c, int n_epochs, uint64_t seed,
    int do_shuffle, int update_user_params, int update_item_params,
    double* P, double* Q, double* bu, double* bi, double* rmse_out) {
  std::mt19937_64 rng(seed);
  std::vector<long long> order(static_cast<size_t>(n));
  for (long long x = 0; x < n; ++x) order[static_cast<size_t>(x)] = x;

  for (int e = 0; e < n_epochs; ++e) {
    // Fisher-Yates shuffle (skipped in test-vector mode: do_shuffle=0)
    for (long long x = do_shuffle ? n - 1 : 0; x > 0; --x) {
      long long j = static_cast<long long>(rng() % static_cast<uint64_t>(x + 1));
      std::swap(order[static_cast<size_t>(x)], order[static_cast<size_t>(j)]);
    }
    for (long long s = 0; s < n; ++s) {
      long long row = order[static_cast<size_t>(s)];
      int uu = u[row];
      int ii = it[row];
      double* pu = P + static_cast<long long>(uu) * k;
      double* qi = Q + static_cast<long long>(ii) * k;
      double d = dot(pu, qi, k);

      if (kernel == 0) {  // linear (kernels.py:108-180)
        double pred = mu + bu[uu] + bi[ii] + d;
        double err = pred - r[row];
        if (update_user_params) bu[uu] -= lr * (err + reg * bu[uu]);
        if (update_item_params) bi[ii] -= lr * (err + reg * bi[ii]);
        for (int f = 0; f < k; ++f) {
          double pf = pu[f], qf = qi[f];
          if (update_user_params) pu[f] -= lr * (err * qf + reg * pf);
          if (update_item_params) qi[f] -= lr * (err * pf + reg * qf);
        }
      } else if (kernel == 1) {  // sigmoid (kernels.py:183-262)
        double x = mu + bu[uu] + bi[ii] + d;
        double sig = 1.0 / (1.0 + std::exp(-x));
        double pred = a + c * sig;
        double err = pred - r[row];
        double base = sig * sig * std::exp(-x);
        if (update_user_params) bu[uu] -= lr * (err * base + reg * bu[uu]);
        if (update_item_params) bi[ii] -= lr * (err * base + reg * bi[ii]);
        for (int f = 0; f < k; ++f) {
          double pf = pu[f], qf = qi[f];
          if (update_user_params)
            pu[f] -= lr * (err * qf * base + reg * pf);
          if (update_item_params)
            qi[f] -= lr * (err * pf * base + reg * qf);
        }
      } else {  // rbf (kernels.py:265-327): no bias/mean terms
        double sq = 0.0;
        for (int f = 0; f < k; ++f) {
          double df = pu[f] - qi[f];
          sq += df * df;
        }
        double eexp = std::exp(-gamma * sq);
        double pred = a + c * eexp;
        double err = pred - r[row];
        double base = 2.0 * gamma * eexp;
        for (int f = 0; f < k; ++f) {
          double pf = pu[f], qf = qi[f];
          if (update_user_params)
            pu[f] -= lr * (err * base * (qf - pf) + reg * pf);
          if (update_item_params)
            qi[f] -= lr * (err * base * (pf - qf) + reg * qf);
        }
      }
    }
    // full-train RMSE pass (kernel_matrix_factorization.py:428-440)
    double sse = 0.0;
    for (long long row = 0; row < n; ++row) {
      int uu = u[row];
      int ii = it[row];
      const double* pu = P + static_cast<long long>(uu) * k;
      const double* qi = Q + static_cast<long long>(ii) * k;
      double pred;
      double d = dot(pu, qi, k);
      if (kernel == 0) {
        pred = mu + bu[uu] + bi[ii] + d;
      } else if (kernel == 1) {
        double x = mu + bu[uu] + bi[ii] + d;
        pred = a + c / (1.0 + std::exp(-x));
      } else {
        double sq = 0.0;
        for (int f = 0; f < k; ++f) {
          double df = pu[f] - qi[f];
          sq += df * df;
        }
        pred = a + c * std::exp(-gamma * sq);
      }
      double err = pred - r[row];
      sse += err * err;
    }
    rmse_out[e] = std::sqrt(sse / static_cast<double>(n));
  }
}

}  // extern "C"
