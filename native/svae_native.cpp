// Native sequential message-passing kernels (C++17, no external deps).
//
// Role: the TPU framework's counterpart of the reference's Cython fast path
// (reference: svae/lds/cython_lds_inference.pyx, svae/hmm/
// cython_hmm_inference.pyx) -- a host-side O(T) implementation of the same
// natural-parameter recursions, used as (a) the honest CPU baseline
// denominator for bench.py (the reference's production kernels were native,
// not NumPy), and (b) a fast parity harness for the associative-scan TPU
// kernels. Semantics mirror svae_tpu/ops/oracles.py exactly (same
// natural-parameter convention, see svae_tpu/ops/__init__.py).
//
// Build: g++ -O3 -march=native -shared -fPIC svae_native.cpp -o libsvae_native.so
// (driven by svae_tpu/ops/native.py at first import).

#include <cmath>
#include <cstring>
#include <vector>

namespace {

constexpr double kLog2Pi = 1.8378770664093454835606594728112;

// Dense column-agnostic row-major helpers for small d.
inline double &at(double *A, int d, int i, int j) { return A[i * d + j]; }
inline const double &at(const double *A, int d, int i, int j) {
  return A[i * d + j];
}

// In-place lower Cholesky of SPD A (row-major d x d); returns false if a
// pivot is non-positive.
bool cholesky(double *A, int d) {
  for (int i = 0; i < d; ++i) {
    for (int j = 0; j <= i; ++j) {
      double s = at(A, d, i, j);
      for (int k = 0; k < j; ++k) s -= at(A, d, i, k) * at(A, d, j, k);
      if (i == j) {
        if (s <= 0.0) return false;
        at(A, d, i, i) = std::sqrt(s);
      } else {
        at(A, d, i, j) = s / at(A, d, j, j);
      }
    }
    for (int j = i + 1; j < d; ++j) at(A, d, i, j) = 0.0;
  }
  return true;
}

// Solve L y = b, then L^T x = y (A = L L^T); b overwritten with x.
void cho_solve_vec(const double *L, int d, double *b) {
  for (int i = 0; i < d; ++i) {
    double s = b[i];
    for (int k = 0; k < i; ++k) s -= at(L, d, i, k) * b[k];
    b[i] = s / at(L, d, i, i);
  }
  for (int i = d - 1; i >= 0; --i) {
    double s = b[i];
    for (int k = i + 1; k < d; ++k) s -= at(L, d, k, i) * b[k];
    b[i] = s / at(L, d, i, i);
  }
}

// Solve A X = B for row-major B (d x m), overwriting B.
void cho_solve_mat(const double *L, int d, double *B, int m) {
  std::vector<double> col(d);
  for (int c = 0; c < m; ++c) {
    for (int i = 0; i < d; ++i) col[i] = B[i * m + c];
    cho_solve_vec(L, d, col.data());
    for (int i = 0; i < d; ++i) B[i * m + c] = col[i];
  }
}

double logdet_from_chol(const double *L, int d) {
  double s = 0.0;
  for (int i = 0; i < d; ++i) s += std::log(at(L, d, i, i));
  return 2.0 * s;
}

void symmetrize(double *A, int d) {
  for (int i = 0; i < d; ++i)
    for (int j = 0; j < i; ++j) {
      double v = 0.5 * (at(A, d, i, j) + at(A, d, j, i));
      at(A, d, i, j) = v;
      at(A, d, j, i) = v;
    }
}

// log integral exp(-1/2 x^T J x + h^T x) dx
double gauss_logZ(const double *J, const double *h, int d) {
  std::vector<double> Jc(J, J + d * d), v(h, h + d);
  symmetrize(Jc.data(), d);
  if (!cholesky(Jc.data(), d)) return NAN;
  double logdet = logdet_from_chol(Jc.data(), d);
  cho_solve_vec(Jc.data(), d, v.data());
  double quad = 0.0;
  for (int i = 0; i < d; ++i) quad += v[i] * h[i];
  return 0.5 * d * kLog2Pi - 0.5 * logdet + 0.5 * quad;
}

void matvec(const double *A, const double *x, int d, double *out,
            bool transpose = false) {
  for (int i = 0; i < d; ++i) {
    double s = 0.0;
    for (int j = 0; j < d; ++j)
      s += (transpose ? at(A, d, j, i) : at(A, d, i, j)) * x[j];
    out[i] = s;
  }
}

// C = A * B (all d x d row-major); transA/transB transpose inputs.
void matmul(const double *A, const double *B, int d, double *C, bool tA,
            bool tB) {
  for (int i = 0; i < d; ++i)
    for (int j = 0; j < d; ++j) {
      double s = 0.0;
      for (int k = 0; k < d; ++k) {
        double a = tA ? at(A, d, k, i) : at(A, d, i, k);
        double b = tB ? at(B, d, j, k) : at(B, d, k, j);
        s += a * b;
      }
      at(C, d, i, j) = s;
    }
}

}  // namespace

extern "C" {

// Information-form forward filter.
// init: I1 (d*d), I2 (d), Ic (1); pairs: P1,P2,P3 ((T-1)*d*d), Pc (T-1);
// nodes: N1 (T*d*d), N2 (T*d). Outputs: Jf (T*d*d), hf (T*d), logZ (1).
// Returns 0 on success, nonzero on a failed Cholesky.
int lds_filter_seq(const double *I1, const double *I2, double Ic,
                   const double *P1, const double *P2, const double *P3,
                   const double *Pc, const double *N1, const double *N2,
                   int T, int d, double *Jf, double *hf, double *logZ) {
  const int dd = d * d;
  std::vector<double> J(dd), h(d), L(dd), tmp(dd), Linv_P2T(dd), b(d);
  double lognorm = Ic;
  for (int i = 0; i < dd; ++i) J[i] = -2.0 * (I1[i] + N1[i]);
  for (int i = 0; i < d; ++i) h[i] = I2[i] + N2[i];
  std::memcpy(Jf, J.data(), dd * sizeof(double));
  std::memcpy(hf, h.data(), d * sizeof(double));
  for (int t = 0; t < T - 1; ++t) {
    // L_t = J - 2 P3_t (potential on x_t with pair quadratic term)
    for (int i = 0; i < dd; ++i) L[i] = J[i] - 2.0 * P3[t * dd + i];
    symmetrize(L.data(), d);
    std::vector<double> Lc(L);
    if (!cholesky(Lc.data(), d)) return t + 1;
    // lognorm += logZ of the marginalized x_t potential
    std::vector<double> v(h);
    cho_solve_vec(Lc.data(), d, v.data());
    double quad = 0.0;
    for (int i = 0; i < d; ++i) quad += v[i] * h[i];
    lognorm += 0.5 * d * kLog2Pi - 0.5 * logdet_from_chol(Lc.data(), d) +
               0.5 * quad + Pc[t];
    // J' = -2 P1_t - P2_t L^{-1} P2_t^T - 2 N1_{t+1}
    // Linv_P2T = L^{-1} P2^T
    for (int i = 0; i < d; ++i)
      for (int j = 0; j < d; ++j) at(tmp.data(), d, i, j) = at(P2 + t * dd, d, j, i);
    cho_solve_mat(Lc.data(), d, tmp.data(), d);
    matmul(P2 + t * dd, tmp.data(), d, Linv_P2T.data(), false, false);
    for (int i = 0; i < dd; ++i)
      J[i] = -2.0 * P1[t * dd + i] - Linv_P2T[i] - 2.0 * N1[(t + 1) * dd + i];
    symmetrize(J.data(), d);
    // h' = P2 L^{-1} h + N2_{t+1}
    matvec(P2 + t * dd, v.data(), d, b.data());
    for (int i = 0; i < d; ++i) h[i] = b[i] + N2[(t + 1) * d + i];
    std::memcpy(Jf + (t + 1) * dd, J.data(), dd * sizeof(double));
    std::memcpy(hf + (t + 1) * d, h.data(), d * sizeof(double));
  }
  *logZ = lognorm + gauss_logZ(J.data(), h.data(), d);
  return 0;
}

// Two-filter smoother. Outputs Ex (T*d), ExxT (T*d*d), Exnxt ((T-1)*d*d)
// with Exnxt[t] = E[x_t x_{t+1}^T], plus logZ.
int lds_smoother_seq(const double *I1, const double *I2, double Ic,
                     const double *P1, const double *P2, const double *P3,
                     const double *Pc, const double *N1, const double *N2,
                     int T, int d, double *logZ, double *Ex, double *ExxT,
                     double *Exnxt) {
  const int dd = d * d;
  std::vector<double> Jf(T * dd), hf(T * d);
  int rc = lds_filter_seq(I1, I2, Ic, P1, P2, P3, Pc, N1, N2, T, d,
                          Jf.data(), hf.data(), logZ);
  if (rc) return rc;
  // backward information filter
  std::vector<double> Jb(T * dd, 0.0), hb(T * d, 0.0);
  std::vector<double> M(dd), Mc(dd), b0(d), tmp(dd), P2T_Minv_P2(dd);
  for (int t = T - 2; t >= 0; --t) {
    for (int i = 0; i < dd; ++i)
      M[i] = -2.0 * P1[t * dd + i] - 2.0 * N1[(t + 1) * dd + i] +
             Jb[(t + 1) * dd + i];
    symmetrize(M.data(), d);
    Mc = M;
    if (!cholesky(Mc.data(), d)) return T + t + 1;
    for (int i = 0; i < d; ++i)
      b0[i] = hb[(t + 1) * d + i] + N2[(t + 1) * d + i];
    std::vector<double> Minv_b0(b0);
    cho_solve_vec(Mc.data(), d, Minv_b0.data());
    // hb_t = P2_t^T M^{-1} b0
    matvec(P2 + t * dd, Minv_b0.data(), d, hb.data() + t * d, true);
    // Jb_t = -2 P3_t - P2^T M^{-1} P2
    std::memcpy(tmp.data(), P2 + t * dd, dd * sizeof(double));
    cho_solve_mat(Mc.data(), d, tmp.data(), d);
    matmul(P2 + t * dd, tmp.data(), d, P2T_Minv_P2.data(), true, false);
    for (int i = 0; i < dd; ++i)
      Jb[t * dd + i] = -2.0 * P3[t * dd + i] - P2T_Minv_P2[i];
    symmetrize(Jb.data() + t * dd, d);
  }
  // node marginals
  std::vector<double> Js(dd), Ls(dd), mu(d), Cov(dd);
  std::vector<std::vector<double>> Covs(T, std::vector<double>(dd));
  for (int t = 0; t < T; ++t) {
    for (int i = 0; i < dd; ++i) Js[i] = Jf[t * dd + i] + Jb[t * dd + i];
    symmetrize(Js.data(), d);
    Ls = Js;
    if (!cholesky(Ls.data(), d)) return 2 * T + t + 1;
    for (int i = 0; i < d; ++i) mu[i] = hf[t * d + i] + hb[t * d + i];
    cho_solve_vec(Ls.data(), d, mu.data());
    // Cov = Js^{-1} via solving with identity
    std::fill(Cov.begin(), Cov.end(), 0.0);
    for (int i = 0; i < d; ++i) Cov[i * d + i] = 1.0;
    cho_solve_mat(Ls.data(), d, Cov.data(), d);
    Covs[t] = Cov;
    for (int i = 0; i < d; ++i) Ex[t * d + i] = mu[i];
    for (int i = 0; i < dd; ++i) ExxT[t * dd + i] = Cov[i];
    for (int i = 0; i < d; ++i)
      for (int j = 0; j < d; ++j) ExxT[t * dd + i * d + j] += mu[i] * mu[j];
  }
  // pair cross moments via 2d x 2d joint
  int D2 = 2 * d;
  std::vector<double> Jj(D2 * D2), hj(D2), Lj(D2 * D2), Cj(D2 * D2);
  for (int t = 0; t < T - 1; ++t) {
    std::fill(Jj.begin(), Jj.end(), 0.0);
    for (int i = 0; i < d; ++i)
      for (int j = 0; j < d; ++j) {
        Jj[i * D2 + j] = Jf[t * dd + i * d + j] - 2.0 * P3[t * dd + i * d + j];
        Jj[(d + i) * D2 + (d + j)] = -2.0 * P1[t * dd + i * d + j] -
                                     2.0 * N1[(t + 1) * dd + i * d + j] +
                                     Jb[(t + 1) * dd + i * d + j];
        Jj[(d + i) * D2 + j] = -P2[t * dd + i * d + j];
        Jj[j * D2 + (d + i)] = -P2[t * dd + i * d + j];
      }
    for (int i = 0; i < d; ++i) {
      hj[i] = hf[t * d + i];
      hj[d + i] = N2[(t + 1) * d + i] + hb[(t + 1) * d + i];
    }
    symmetrize(Jj.data(), D2);
    Lj = Jj;
    if (!cholesky(Lj.data(), D2)) return 3 * T + t + 1;
    std::vector<double> mj(hj);
    cho_solve_vec(Lj.data(), D2, mj.data());
    std::fill(Cj.begin(), Cj.end(), 0.0);
    for (int i = 0; i < D2; ++i) Cj[i * D2 + i] = 1.0;
    cho_solve_mat(Lj.data(), D2, Cj.data(), D2);
    for (int i = 0; i < d; ++i)
      for (int j = 0; j < d; ++j)
        Exnxt[t * dd + i * d + j] =
            Cj[i * D2 + (d + j)] + mj[i] * mj[d + j];
  }
  return 0;
}

// Backward sampler; eps is (T*d) standard normals, x out (T*d).
int lds_sample_seq(const double *I1, const double *I2, double Ic,
                   const double *P1, const double *P2, const double *P3,
                   const double *Pc, const double *N1, const double *N2,
                   const double *eps, int T, int d, double *x) {
  const int dd = d * d;
  std::vector<double> Jf(T * dd), hf(T * d);
  double logZ;
  int rc = lds_filter_seq(I1, I2, Ic, P1, P2, P3, Pc, N1, N2, T, d,
                          Jf.data(), hf.data(), &logZ);
  if (rc) return rc;
  std::vector<double> L(dd), mu(d), z(d);
  // terminal
  std::memcpy(L.data(), Jf.data() + (T - 1) * dd, dd * sizeof(double));
  symmetrize(L.data(), d);
  if (!cholesky(L.data(), d)) return 1;
  std::memcpy(mu.data(), hf.data() + (T - 1) * d, d * sizeof(double));
  cho_solve_vec(L.data(), d, mu.data());
  // z = L^{-T} eps  (backward substitution)
  std::memcpy(z.data(), eps + (T - 1) * d, d * sizeof(double));
  for (int i = d - 1; i >= 0; --i) {
    double s = z[i];
    for (int k = i + 1; k < d; ++k) s -= at(L.data(), d, k, i) * z[k];
    z[i] = s / at(L.data(), d, i, i);
  }
  for (int i = 0; i < d; ++i) x[(T - 1) * d + i] = mu[i] + z[i];
  // backward conditionals
  std::vector<double> Jc(dd), hc(d);
  for (int t = T - 2; t >= 0; --t) {
    for (int i = 0; i < dd; ++i) Jc[i] = Jf[t * dd + i] - 2.0 * P3[t * dd + i];
    symmetrize(Jc.data(), d);
    L = Jc;
    if (!cholesky(L.data(), d)) return t + 1;
    // hc = hf_t + P2_t^T x_{t+1}
    matvec(P2 + t * dd, x + (t + 1) * d, d, hc.data(), true);
    for (int i = 0; i < d; ++i) hc[i] += hf[t * d + i];
    std::memcpy(mu.data(), hc.data(), d * sizeof(double));
    cho_solve_vec(L.data(), d, mu.data());
    std::memcpy(z.data(), eps + t * d, d * sizeof(double));
    for (int i = d - 1; i >= 0; --i) {
      double s = z[i];
      for (int k = i + 1; k < d; ++k) s -= at(L.data(), d, k, i) * z[k];
      z[i] = s / at(L.data(), d, i, i);
    }
    for (int i = 0; i < d; ++i) x[t * d + i] = mu[i] + z[i];
  }
  return 0;
}

// HMM forward-backward: log_init (K), log_trans (K*K homogeneous),
// log_obs (T*K). Outputs logZ, node marginals (T*K), summed pair counts
// (K*K), all via stable log-space recursions.
int hmm_marginals_seq(const double *log_init, const double *log_trans,
                      const double *log_obs, int T, int K, double *logZ,
                      double *node, double *pair_sum) {
  std::vector<double> la(T * K), lb(T * K, 0.0);
  auto lse = [](const double *v, int n) {
    double m = v[0];
    for (int i = 1; i < n; ++i) m = std::max(m, v[i]);
    if (!std::isfinite(m)) return m;
    double s = 0.0;
    for (int i = 0; i < n; ++i) s += std::exp(v[i] - m);
    return m + std::log(s);
  };
  std::vector<double> tmp(K);
  for (int k = 0; k < K; ++k) la[k] = log_init[k] + log_obs[k];
  for (int t = 1; t < T; ++t) {
    for (int j = 0; j < K; ++j) {
      for (int i = 0; i < K; ++i)
        tmp[i] = la[(t - 1) * K + i] + log_trans[i * K + j];
      la[t * K + j] = lse(tmp.data(), K) + log_obs[t * K + j];
    }
  }
  *logZ = lse(la.data() + (T - 1) * K, K);
  for (int t = T - 2; t >= 0; --t) {
    for (int i = 0; i < K; ++i) {
      for (int j = 0; j < K; ++j)
        tmp[j] = log_trans[i * K + j] + log_obs[(t + 1) * K + j] +
                 lb[(t + 1) * K + j];
      lb[t * K + i] = lse(tmp.data(), K);
    }
  }
  for (int t = 0; t < T; ++t)
    for (int k = 0; k < K; ++k)
      node[t * K + k] = std::exp(la[t * K + k] + lb[t * K + k] - *logZ);
  std::fill(pair_sum, pair_sum + K * K, 0.0);
  for (int t = 0; t < T - 1; ++t)
    for (int i = 0; i < K; ++i)
      for (int j = 0; j < K; ++j)
        pair_sum[i * K + j] +=
            std::exp(la[t * K + i] + log_trans[i * K + j] +
                     log_obs[(t + 1) * K + j] + lb[(t + 1) * K + j] - *logZ);
  return 0;
}

}  // extern "C"
