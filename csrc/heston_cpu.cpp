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

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Actual OpenMP thread count the batch engine will use (honors
// OMP_NUM_THREADS); 1 when built without OpenMP. Used by the benchmark
// labels so a 1-thread run is never tagged with the host core count.
int64_t ht_omp_threads(void) {
#ifdef _OPENMP
  return (int64_t)omp_get_max_threads();
#else
  return 1;
#endif
}

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

// Discrete-dividend surface re-map, replicating
// heston_tpu.models.douglas.apply_dividend exactly (which itself
// replicates ref: src/solver.hpp:382-425): new_s = s*(1-pct) - amount,
// linear interpolation, idx == 0 -> left extrapolation, and for
// new_s <= 0: zero (calls) or copy column 0 (puts). knock_top: re-knock
// a top-knocked barrier's column ns-1 to 0 after the re-map (up-out /
// double-out; a knocked BOTTOM needs nothing — the idx == 0
// fall-through copies column 0, which is already 0).
void apply_dividend_cpu(double* u, const double* vec_s, double amount,
                        double pct, int64_t put, int64_t knock_top,
                        int64_t nv, int64_t ns, double* scratch_row) {
  const int64_t m1 = ns - 1;
  for (int64_t j = 0; j < nv; ++j) {
    double* row = u + j * ns;
    const double left = row[0];
    for (int64_t i = 0; i < ns; ++i) {
      const double new_s = vec_s[i] * (1.0 - pct) - amount;
      // first index with vec_s[k] > new_s (strict); 0 if none
      int64_t idx = 0;
      for (int64_t k = 0; k < ns; ++k) idx += (vec_s[k] <= new_s) ? 1 : 0;
      if (idx > m1) idx = 0;
      const int64_t lo = idx > 0 ? idx - 1 : 0;
      const double s_lo = vec_s[lo];
      const double s_hi = vec_s[idx];
      const double den = (s_hi == s_lo) ? 1.0 : (s_hi - s_lo);
      const double w = (new_s - s_lo) / den;
      double out = (idx == 0) ? left
                              : (1.0 - w) * row[lo] + w * row[idx];
      if (new_s <= 0.0) out = put ? left : 0.0;
      scratch_row[i] = out;
    }
    if (knock_top) scratch_row[ns - 1] = 0.0;
    std::memcpy(row, scratch_row, ns * sizeof(double));
  }
}

// Scheme selectors (mirror heston_tpu.models.douglas._do_step; the math
// is the in 't Hout-Foulon ADI family, so formulas match by necessity).
enum Scheme : int64_t { kDo = 0, kCs = 1, kMcs = 2, kHv = 3 };

struct DoWorkspace {
  std::vector<double> a0r, a1r, a2r, y0, y1, y2, tmp;
  std::vector<double> a0y, a1y, a2y;                  // operator(Y2) fields
  std::vector<double> iml, imd, imu;                  // A1 implicit bands
  std::vector<double> il2, il1, idg, iu1, iu2;        // A2 implicit bands
  std::vector<double> ex_l2, ex_l1, ex_d, ex_u1, ex_u2;  // A2 explicit
  std::vector<double> col_rhs, col_x, row;
  void resize(int64_t nv, int64_t ns) {
    const int64_t m = nv * ns;
    for (auto* v : {&a0r, &a1r, &a2r, &y0, &y1, &y2, &tmp, &a0y, &a1y,
                    &a2y, &iml, &imd, &imu})
      v->resize(m);
    for (auto* v : {&il2, &il1, &idg, &iu1, &iu2, &ex_l2, &ex_l1, &ex_d,
                    &ex_u1, &ex_u2, &col_rhs, &col_x})
      v->resize(nv);
    row.resize(ns);
  }
  // derive implicit bands (I - theta*dt*A) and stash the explicit A2
  void prepare(int64_t nv, int64_t ns, double td, const double* a1_ml,
               const double* a1_md, const double* a1_mu,
               const double* a2_l2, const double* a2_l1, const double* a2_d,
               const double* a2_u1, const double* a2_u2) {
    const int64_t m = nv * ns;
    for (int64_t k = 0; k < m; ++k) {
      iml[k] = -td * a1_ml[k];
      imd[k] = 1.0 - td * a1_md[k];
      imu[k] = -td * a1_mu[k];
    }
    for (int64_t j = 0; j < nv; ++j) {
      il2[j] = -td * a2_l2[j];
      il1[j] = -td * a2_l1[j];
      idg[j] = 1.0 - td * a2_d[j];
      iu1[j] = -td * a2_u1[j];
      iu2[j] = -td * a2_u2[j];
      ex_l2[j] = a2_l2[j];
      ex_l1[j] = a2_l1[j];
      ex_d[j] = a2_d[j];
      ex_u1[j] = a2_u1[j];
      ex_u2[j] = a2_u2[j];
    }
  }
};

// Steps n = n_begin..n_end-1 (1-based, exclusive end) of the ADI loop
// for one option; factorable implicit bands are pre-derived in ws.
// `scheme` selects the corrector (Scheme enum), replicating
// heston_tpu.models.douglas._do_step:
//   DO : predictor + A1/A2 implicit stages
//   CS : + 1/2 dt mixed-derivative corrector, both stages re-run
//   MCS: + theta dt A0 corrector and (1/2-theta) dt full-operator
//        corrector, both stages re-run
//   HV : + 1/2 dt full-operator corrector with the implicit stages
//        anchored at Y2 (t_n boundary terms cancel)
void do_run_steps(int64_t n_begin, int64_t n_end, int64_t nv, int64_t ns,
                  double delta_t, double theta, int64_t scheme,
                  double b_rate,
                  const double* a0c, const double* bsm, const double* bs0,
                  const double* bsp, const double* bvm, const double* bv0,
                  const double* bvp, const double* a1_ml,
                  const double* a1_md, const double* a1_mu,
                  const double* b1, const double* b2, int64_t american,
                  const double* u0, double* u, double* lam,
                  DoWorkspace& ws) {
  const int64_t m = nv * ns;
  const double td = theta * delta_t;
  for (int64_t n = n_begin; n < n_end; ++n) {
    const double e0 = std::exp(b_rate * delta_t * (double)(n - 1));
    const double e1 = std::exp(b_rate * delta_t * (double)n);

    a0_multiply(a0c, bsm, bs0, bsp, bvm, bv0, bvp, u, ws.tmp.data(),
                ws.a0r.data(), nv, ns);
    a1_multiply(a1_ml, a1_md, a1_mu, u, ws.a1r.data(), nv, ns);
    // explicit A2 bands are stashed in ws by prepare().
    a2_multiply(ws.ex_l2.data(), ws.ex_l1.data(), ws.ex_d.data(),
                ws.ex_u1.data(), ws.ex_u2.data(), u, ws.a2r.data(), nv, ns);

    for (int64_t k = 0; k < m; ++k) {
      double y = u[k] + delta_t * (ws.a0r[k] + ws.a1r[k] + ws.a2r[k]
                                   + (b1[k] + b2[k]) * e0);
      if (american) y += delta_t * lam[k];
      ws.y0[k] = y;
    }

    // the two implicit stages (rhs boundary increments match the
    // theta-weighted t_{n-1} -> t_n substitution), x -> out
    const auto stage_solves = [&](const double* x, double* out) {
      for (int64_t k = 0; k < m; ++k) {
        ws.tmp[k] = x[k] + td * (b1[k] * e1 - (ws.a1r[k] + b1[k] * e0));
      }
      for (int64_t j = 0; j < nv; ++j) {
        ht_tridiag_solve(ws.iml.data() + j * ns, ws.imd.data() + j * ns,
                         ws.imu.data() + j * ns, ws.tmp.data() + j * ns,
                         ws.y1.data() + j * ns, ns);
      }
      for (int64_t k = 0; k < m; ++k) {
        ws.y1[k] += td * (b2[k] * e1 - (ws.a2r[k] + b2[k] * e0));
      }
      for (int64_t i = 0; i < ns; ++i) {
        for (int64_t j = 0; j < nv; ++j) ws.col_rhs[j] = ws.y1[j * ns + i];
        ht_penta_solve(ws.il2.data(), ws.il1.data(), ws.idg.data(),
                       ws.iu1.data(), ws.iu2.data(), ws.col_rhs.data(),
                       ws.col_x.data(), nv);
        for (int64_t j = 0; j < nv; ++j) out[j * ns + i] = ws.col_x[j];
      }
    };

    stage_solves(ws.y0.data(), ws.y2.data());

    if (scheme != kDo) {
      a0_multiply(a0c, bsm, bs0, bsp, bvm, bv0, bvp, ws.y2.data(),
                  ws.tmp.data(), ws.a0y.data(), nv, ns);
    }
    if (scheme == kCs) {
      for (int64_t k = 0; k < m; ++k) {
        ws.y0[k] += 0.5 * delta_t * (ws.a0y[k] - ws.a0r[k]);
      }
      stage_solves(ws.y0.data(), ws.y2.data());
    } else if (scheme == kMcs || scheme == kHv) {
      a1_multiply(a1_ml, a1_md, a1_mu, ws.y2.data(), ws.a1y.data(), nv,
                  ns);
      a2_multiply(ws.ex_l2.data(), ws.ex_l1.data(), ws.ex_d.data(),
                  ws.ex_u1.data(), ws.ex_u2.data(), ws.y2.data(),
                  ws.a2y.data(), nv, ns);
      const double w = (scheme == kMcs) ? (0.5 - theta) : 0.5;
      for (int64_t k = 0; k < m; ++k) {
        const double full_new =
            ws.a0y[k] + ws.a1y[k] + ws.a2y[k] + (b1[k] + b2[k]) * e1;
        const double full_old =
            ws.a0r[k] + ws.a1r[k] + ws.a2r[k] + (b1[k] + b2[k]) * e0;
        double y = ws.y0[k];
        if (scheme == kMcs) y += td * (ws.a0y[k] - ws.a0r[k]);
        ws.y0[k] = y + w * delta_t * (full_new - full_old);
      }
      if (scheme == kMcs) {
        stage_solves(ws.y0.data(), ws.y2.data());
      } else {  // HV: implicit corrections anchored at Y2
        for (int64_t k = 0; k < m; ++k) {
          ws.tmp[k] = ws.y0[k] - td * ws.a1y[k];
        }
        for (int64_t j = 0; j < nv; ++j) {
          ht_tridiag_solve(ws.iml.data() + j * ns, ws.imd.data() + j * ns,
                           ws.imu.data() + j * ns, ws.tmp.data() + j * ns,
                           ws.y1.data() + j * ns, ns);
        }
        for (int64_t k = 0; k < m; ++k) {
          ws.y1[k] -= td * ws.a2y[k];
        }
        for (int64_t i = 0; i < ns; ++i) {
          for (int64_t j = 0; j < nv; ++j)
            ws.col_rhs[j] = ws.y1[j * ns + i];
          ht_penta_solve(ws.il2.data(), ws.il1.data(), ws.idg.data(),
                         ws.iu1.data(), ws.iu2.data(), ws.col_rhs.data(),
                         ws.col_x.data(), nv);
          for (int64_t j = 0; j < nv; ++j) ws.y2[j * ns + i] = ws.col_x[j];
        }
      }
    }

    if (american == 2) {
      // STATIC-PIN + BOX projection for the discontinuous digital
      // obstacle: pin u = payoff on full-payoff nodes (cell-averaged
      // u0 == 1 exactly), project the rest onto [payoff, 1] — see
      // models/douglas._do_step for why the Ikonen-Toivanen multiplier
      // (and even one-sided max-projection) blows up on a payoff jump.
      // lam stays 0.
      for (int64_t k = 0; k < m; ++k) {
        u[k] = u0[k] == 1.0
                   ? 1.0
                   : std::min(std::max(ws.y2[k], u0[k]), 1.0);
      }
    } else if (american) {
      for (int64_t k = 0; k < m; ++k) {
        const double u_bar = ws.y2[k];
        u[k] = std::max(u_bar - delta_t * lam[k], u0[k]);
        lam[k] = std::max(0.0, lam[k] + (u0[k] - u_bar) / delta_t);
        if (k % ns == ns - 1) lam[k] = 0.0;  // s_max column
      }
    } else {
      std::memcpy(u, ws.y2.data(), m * sizeof(double));
    }
  }
}

}  // namespace

// Complete ADI time loop (one option instance) on CPU.
// All band arrays are the EXPLICIT operators; the implicit systems
// (I - theta*dt*A) are formed and factored internally. `scheme` is the
// Scheme enum (0 DO / 1 CS / 2 MCS / 3 HV); `rannacher_steps` = R runs
// the first min(R, n_steps) main steps as 2R theta=1 Douglas sub-steps
// at delta_t/2 (implicit bands re-derived internally; boundary vectors
// shared — sub-step k's e^{b_rate*(dt/2)*(k-1)} lands on the same
// absolute times, matching heston_tpu.models.douglas._phase_plan).
// Returns the full terminal surface in u (in/out, initialized to payoff).
// lam must be zero-initialized scratch of the same size (used when
// american != 0).
void ht_do_solve(
    // dimensions / stepping
    int64_t nv, int64_t ns, int64_t n_steps, double delta_t, double theta,
    int64_t scheme, int64_t rannacher_steps, double r_f,
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
    // American mode (0 = European, 1 = Ikonen-Toivanen LCP,
    // 2 = projected LCP for discontinuous obstacles) + payoff
    int64_t american, const double* u0,
    // state (in/out)
    double* u, double* lam) {
  DoWorkspace ws;
  ws.resize(nv, ns);
  const int64_t r =
      std::min(rannacher_steps, n_steps) < 0
          ? 0
          : std::min(rannacher_steps, n_steps);
  if (r > 0) {
    ws.prepare(nv, ns, delta_t / 2.0, a1_ml, a1_md, a1_mu, a2_l2, a2_l1,
               a2_d, a2_u1, a2_u2);
    do_run_steps(1, 2 * r + 1, nv, ns, delta_t / 2.0, 1.0, kDo, r_f, a0c,
                 bsm, bs0, bsp, bvm, bv0, bvp, a1_ml, a1_md, a1_mu, b1, b2,
                 american, u0, u, lam, ws);
  }
  ws.prepare(nv, ns, theta * delta_t, a1_ml, a1_md, a1_mu, a2_l2, a2_l1,
             a2_d, a2_u1, a2_u2);
  do_run_steps(r + 1, n_steps + 1, nv, ns, delta_t, theta, scheme, r_f,
               a0c, bsm, bs0, bsp, bvm, bv0, bvp, a1_ml, a1_md, a1_mu, b1,
               b2, american, u0, u, lam, ws);
}

// Standalone dividend re-map (oracle for apply_dividend parity tests).
void ht_apply_dividend(double* u, const double* vec_s, double amount,
                       double pct, int64_t put, int64_t knock_top,
                       int64_t nv, int64_t ns) {
  std::vector<double> row(ns);
  apply_dividend_cpu(u, vec_s, amount, pct, put, knock_top, nv, ns,
                     row.data());
}

// Batched Douglas loop with OpenMP over options — the CPU arm of the
// benchmark sweep, mirroring the reference's OpenMP build of its
// performance test (ref: src/perfomance_test.cpp:50-54, 507-534; the
// reference's README GPU-vs-CPU 30x claim is measured against exactly
// this kind of CPU run). Per-option arrays are stacked batch-major:
//   [b, nv, ns]: a0c, a1 bands, b1, b2, u0, u, lam
//   [b, ns]:     bsm, bs0, bsp, vec_s
//   [b, nv]:     bvm, bv0, bvp, a2 bands
// Dividends: n_events entries (applied before step ev_step[e], ascending;
// shared across the batch like the reference's schedule).
// n_steps_per (nullable): per-option step counts for MIXED-maturity books
// under the shared-dt convention T_o = n_o * delta_t (n_steps must be the
// max) — option o runs steps 1..n_o and sees only events with
// ev_step <= n_o, exactly like a dedicated n_o-step solve.
void ht_do_solve_batch(
    int64_t b, int64_t nv, int64_t ns, int64_t n_steps, double delta_t,
    double theta, int64_t scheme, int64_t rannacher_steps, double b_rate,
    const double* a0c, const double* bsm, const double* bs0,
    const double* bsp, const double* bvm, const double* bv0,
    const double* bvp, const double* a1_ml, const double* a1_md,
    const double* a1_mu, const double* a2_l2, const double* a2_l1,
    const double* a2_d, const double* a2_u1, const double* a2_u2,
    const double* b1, const double* b2, int64_t american, const double* u0,
    int64_t n_events, const int64_t* ev_step, const double* ev_amount,
    const double* ev_pct, const double* vec_s, int64_t put,
    double* u, double* lam, const int64_t* n_steps_per,
    int64_t knock_top) {
  const int64_t m = nv * ns;
#pragma omp parallel
  {
    DoWorkspace ws;
    ws.resize(nv, ns);
// dynamic: mixed-maturity books are sorted by maturity, so static
// chunking would hand the first threads all the short chains and the
// last threads all the long ones; per-option solves are big enough
// that the dynamic-dispatch overhead is noise for uniform books too
#pragma omp for schedule(dynamic)
    for (int64_t o = 0; o < b; ++o) {
      const int64_t n_o = n_steps_per ? n_steps_per[o] : n_steps;
      const double* a0c_o = a0c + o * m;
      const double* ml_o = a1_ml + o * m;
      const double* md_o = a1_md + o * m;
      const double* mu_o = a1_mu + o * m;
      const double* b1_o = b1 + o * m;
      const double* b2_o = b2 + o * m;
      const double* u0_o = u0 + o * m;
      double* u_o = u + o * m;
      double* lam_o = lam + o * m;
      // Phase table: the optional Rannacher start-up window (theta=1
      // Douglas at delta_t/2, sub-steps k = 2n-1, 2n per damped main
      // step n) then the main scheme. Per-option clamp r_o =
      // min(rannacher_steps, n_o) keeps mixed-maturity books equal to
      // per-group damped runs (the per-lane fused-kernel convention).
      // A dividend of main step n fires before local step
      // loc_a*n + loc_b — the same absolute tau in both phases.
      const int64_t r_o =
          rannacher_steps <= 0
              ? 0
              : std::min(rannacher_steps, n_o);
      struct Phase {
        int64_t lo, hi;       // main-step range (inclusive)
        int64_t loc_a, loc_b; // local = loc_a*n + loc_b
        int64_t local_end;    // exclusive phase-local loop end
        double dt, th;
        int64_t sch;
      };
      const Phase phases[2] = {
          {1, r_o, 2, -1, 2 * r_o + 1, delta_t / 2.0, 1.0, kDo},
          {r_o + 1, n_o, 1, 0, n_o + 1, delta_t, theta, scheme},
      };
      int64_t e = 0;
      for (const Phase& ph : phases) {
        if (ph.hi < ph.lo) continue;
        ws.prepare(nv, ns, ph.th * ph.dt, ml_o, md_o, mu_o,
                   a2_l2 + o * nv, a2_l1 + o * nv, a2_d + o * nv,
                   a2_u1 + o * nv, a2_u2 + o * nv);
        int64_t n_next = ph.loc_a * ph.lo + ph.loc_b;
        while (e < n_events && ev_step[e] <= ph.hi) {
          const int64_t kl = ph.loc_a * ev_step[e] + ph.loc_b;
          // steps n_next .. kl-1, then ALL re-maps due before local
          // step kl (date order, like events_for_step)
          do_run_steps(n_next, kl, nv, ns, ph.dt, ph.th, ph.sch, b_rate,
                       a0c_o, bsm + o * ns, bs0 + o * ns, bsp + o * ns,
                       bvm + o * nv, bv0 + o * nv, bvp + o * nv,
                       ml_o, md_o, mu_o, b1_o, b2_o, american, u0_o, u_o,
                       lam_o, ws);
          const int64_t n_ev = ev_step[e];
          while (e < n_events && ev_step[e] == n_ev) {
            apply_dividend_cpu(u_o, vec_s + o * ns, ev_amount[e],
                               ev_pct[e], put, knock_top, nv, ns,
                               ws.row.data());
            ++e;
          }
          n_next = kl;
        }
        do_run_steps(n_next, ph.local_end, nv, ns, ph.dt, ph.th, ph.sch,
                     b_rate, a0c_o, bsm + o * ns, bs0 + o * ns,
                     bsp + o * ns, bvm + o * nv, bv0 + o * nv,
                     bvp + o * nv, ml_o, md_o, mu_o, b1_o, b2_o, american,
                     u0_o, u_o, lam_o, ws);
      }
    }
  }
}

}  // extern "C"
