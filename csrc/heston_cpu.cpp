// Native CPU reference kernels for the heston_tpu framework.
//
// Role: independent, dependency-free C++ implementations of the core
// numerical primitives (Thomas tridiagonal solve, pentadiagonal solve with
// first-row fill-in, and a complete Douglas ADI time loop) used as
//   * cross-implementation test oracles (the reference validates its GPU
//     kernels against plain CPU versions the same way, e.g. its standalone
//     pentadiagonal solver and BlackScholes_standard Thomas test,
//     ref: src/hes_A2_mat.cpp:686, src/BlackScholesMatrixTest.cpp), and
//   * a host-side fallback pricer for environments without an accelerator.
//
// Exposed as a plain C ABI consumed from Python via ctypes
// (heston_tpu/utils/native.py). All arrays are double, caller-allocated.
//
// Conventions match the framework: state U[v, s] row-major with s fastest
// (the flat v-major index i + j*(m1+1)); bands are row-aligned
// (l1[r] = A[r][r-1], u1[r] = A[r][r+1], ...).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Solve (I*0 + tridiag(ml, md, mu)) x = rhs of size n. Row-aligned bands:
// ml[0] and mu[n-1] are ignored. Plain Thomas elimination.
void ht_tridiag_solve(const double* ml, const double* md, const double* mu,
                      const double* rhs, double* x, int64_t n) {
  std::vector<double> temp(n), d(n);
  temp[0] = md[0];
  d[0] = rhs[0];
  for (int64_t i = 1; i < n; ++i) {
    const double w = ml[i] / temp[i - 1];
    temp[i] = md[i] - w * mu[i - 1];
    d[i] = rhs[i] - w * d[i - 1];
  }
  x[n - 1] = d[n - 1] / temp[n - 1];
  for (int64_t i = n - 2; i >= 0; --i) {
    x[i] = (d[i] - mu[i] * x[i + 1]) / temp[i];
  }
}

// Solve pentadiagonal system with row-aligned bands l2, l1, d0, u1, u2.
// Handles the Heston A2 structure: fill-in from the first-row u2 entry and
// trailing identity rows fall out of the general recurrence.
void ht_penta_solve(const double* l2, const double* l1, const double* d0,
                    const double* u1, const double* u2, const double* rhs,
                    double* x, int64_t n) {
  std::vector<double> c(n, 0.0), c2(n, 0.0), dp(n, 0.0);
  double c1p = 0.0, c2p = 0.0, cc1p = 0.0, cc2p = 0.0;
  double d1p = 0.0, d2p = 0.0;
  for (int64_t j = 0; j < n; ++j) {
    const double lj = l1[j] - l2[j] * c2p;
    const double den = d0[j] - lj * c1p - l2[j] * cc2p;
    const double m = 1.0 / den;
    const double cj = (u1[j] - lj * cc1p) * m;
    const double c2j = u2[j] * m;
    const double dj = (rhs[j] - lj * d1p - l2[j] * d2p) * m;
    c[j] = cj;
    c2[j] = c2j;
    dp[j] = dj;
    c2p = c1p; c1p = cj;
    cc2p = cc1p; cc1p = c2j;
    d2p = d1p; d1p = dj;
  }
  double x1 = 0.0, x2 = 0.0;
  for (int64_t j = n - 1; j >= 0; --j) {
    const double xj = dp[j] - c[j] * x1 - c2[j] * x2;
    x[j] = xj;
    x2 = x1; x1 = xj;
  }
}

namespace {

// Apply row-aligned tridiagonal bands along s for every v-row.
void a1_multiply(const double* ml, const double* md, const double* mu,
                 const double* u, double* out, int64_t nv, int64_t ns) {
  for (int64_t j = 0; j < nv; ++j) {
    const double* row = u + j * ns;
    const double* mlj = ml + j * ns;
    const double* mdj = md + j * ns;
    const double* muj = mu + j * ns;
    double* oj = out + j * ns;
    for (int64_t i = 0; i < ns; ++i) {
      double acc = mdj[i] * row[i];
      if (i > 0) acc += mlj[i] * row[i - 1];
      if (i + 1 < ns) acc += muj[i] * row[i + 1];
      oj[i] = acc;
    }
  }
}

// Apply 1-D row-aligned pentadiagonal bands along v (broadcast over s).
void a2_multiply(const double* l2, const double* l1, const double* d0,
                 const double* u1, const double* u2, const double* u,
                 double* out, int64_t nv, int64_t ns) {
  for (int64_t j = 0; j < nv; ++j) {
    for (int64_t i = 0; i < ns; ++i) {
      double acc = d0[j] * u[j * ns + i];
      if (j >= 1) acc += l1[j] * u[(j - 1) * ns + i];
      if (j >= 2) acc += l2[j] * u[(j - 2) * ns + i];
      if (j + 1 < nv) acc += u1[j] * u[(j + 1) * ns + i];
      if (j + 2 < nv) acc += u2[j] * u[(j + 2) * ns + i];
      out[j * ns + i] = acc;
    }
  }
}

// Mixed-derivative stencil in separable form c .* Dv(Ds(U)).
void a0_multiply(const double* a0c, const double* bsm, const double* bs0,
                 const double* bsp, const double* bvm, const double* bv0,
                 const double* bvp, const double* u, double* tmp,
                 double* out, int64_t nv, int64_t ns) {
  for (int64_t j = 0; j < nv; ++j) {
    for (int64_t i = 0; i < ns; ++i) {
      double acc = bs0[i] * u[j * ns + i];
      if (i > 0) acc += bsm[i] * u[j * ns + i - 1];
      if (i + 1 < ns) acc += bsp[i] * u[j * ns + i + 1];
      tmp[j * ns + i] = acc;
    }
  }
  for (int64_t j = 0; j < nv; ++j) {
    for (int64_t i = 0; i < ns; ++i) {
      double acc = bv0[j] * tmp[j * ns + i];
      if (j > 0) acc += bvm[j] * tmp[(j - 1) * ns + i];
      if (j + 1 < nv) acc += bvp[j] * tmp[(j + 1) * ns + i];
      out[j * ns + i] = a0c[j * ns + i] * acc;
    }
  }
}

}  // namespace

// Complete Douglas ADI time loop (one option instance) on CPU.
// All band arrays are the EXPLICIT operators; the implicit systems
// (I - theta*dt*A) are formed and factored internally.
// Returns the full terminal surface in u (in/out, initialized to payoff).
// lam must be zero-initialized scratch of the same size (used when
// american != 0).
void ht_do_solve(
    // dimensions / stepping
    int64_t nv, int64_t ns, int64_t n_steps, double delta_t, double theta,
    double r_f,
    // A0 separable data
    const double* a0c, const double* bsm, const double* bs0,
    const double* bsp, const double* bvm, const double* bv0,
    const double* bvp,
    // A1 bands [nv*ns]
    const double* a1_ml, const double* a1_md, const double* a1_mu,
    // A2 bands [nv]
    const double* a2_l2, const double* a2_l1, const double* a2_d,
    const double* a2_u1, const double* a2_u2,
    // boundary vectors [nv*ns]
    const double* b1, const double* b2,
    // American flag + payoff
    int64_t american, const double* u0,
    // state (in/out)
    double* u, double* lam) {
  const int64_t m = nv * ns;
  const double td = theta * delta_t;

  std::vector<double> a0r(m), a1r(m), a2r(m), y0(m), y1(m), tmp(m);
  std::vector<double> iml(m), imd(m), imu(m);
  for (int64_t k = 0; k < m; ++k) {
    iml[k] = -td * a1_ml[k];
    imd[k] = 1.0 - td * a1_md[k];
    imu[k] = -td * a1_mu[k];
  }
  std::vector<double> il2(nv), il1(nv), idg(nv), iu1(nv), iu2(nv);
  for (int64_t j = 0; j < nv; ++j) {
    il2[j] = -td * a2_l2[j];
    il1[j] = -td * a2_l1[j];
    idg[j] = 1.0 - td * a2_d[j];
    iu1[j] = -td * a2_u1[j];
    iu2[j] = -td * a2_u2[j];
  }
  std::vector<double> col_rhs(nv), col_x(nv);

  for (int64_t n = 1; n <= n_steps; ++n) {
    const double e0 = std::exp(r_f * delta_t * (double)(n - 1));
    const double e1 = std::exp(r_f * delta_t * (double)n);

    a0_multiply(a0c, bsm, bs0, bsp, bvm, bv0, bvp, u, tmp.data(),
                a0r.data(), nv, ns);
    a1_multiply(a1_ml, a1_md, a1_mu, u, a1r.data(), nv, ns);
    a2_multiply(a2_l2, a2_l1, a2_d, a2_u1, a2_u2, u, a2r.data(), nv, ns);

    for (int64_t k = 0; k < m; ++k) {
      y0[k] = u[k] + delta_t * (a0r[k] + a1r[k] + a2r[k]
                                + (b1[k] + b2[k]) * e0);
      if (american) y0[k] += delta_t * lam[k];
      y0[k] += td * (b1[k] * e1 - (a1r[k] + b1[k] * e0));
    }
    // A1 implicit solve per v-row
    for (int64_t j = 0; j < nv; ++j) {
      ht_tridiag_solve(iml.data() + j * ns, imd.data() + j * ns,
                       imu.data() + j * ns, y0.data() + j * ns,
                       y1.data() + j * ns, ns);
    }
    for (int64_t k = 0; k < m; ++k) {
      y1[k] += td * (b2[k] * e1 - (a2r[k] + b2[k] * e0));
    }
    // A2 implicit solve per s-column
    for (int64_t i = 0; i < ns; ++i) {
      for (int64_t j = 0; j < nv; ++j) col_rhs[j] = y1[j * ns + i];
      ht_penta_solve(il2.data(), il1.data(), idg.data(), iu1.data(),
                     iu2.data(), col_rhs.data(), col_x.data(), nv);
      for (int64_t j = 0; j < nv; ++j) u[j * ns + i] = col_x[j];
    }

    if (american) {
      for (int64_t k = 0; k < m; ++k) {
        const double u_bar = u[k];
        u[k] = std::max(u_bar - delta_t * lam[k], u0[k]);
        lam[k] = std::max(0.0, lam[k] + (u0[k] - u_bar) / delta_t);
        if (k % ns == ns - 1) lam[k] = 0.0;  // s_max column
      }
    }
  }
}

}  // extern "C"
