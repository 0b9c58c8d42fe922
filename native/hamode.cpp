// hamode — native adaptive ODE engine with GSL step-control semantics.
//
// The reference's entire time integration is an FFI call into GSL's RKF45
// (odeSolveV RKf45, reference src/Numeric/Hamilton.hs:445 with
// eps_abs = eps_rel = 1.49012e-08 and initial step (t1-t0)/100).  This file
// is the rebuild's native equivalent: a from-scratch C++ implementation of
//   * the Fehlberg 4(5) embedded pair (advance with the 5th-order solution,
//     error = y5 - y4), and
//   * the GSL "standard control" step-size law (a_y = 1, a_dydt = 0):
//       D_i = eps_abs + eps_rel*|y_i|   (on the updated y)
//       rmax = max_i |err_i| / D_i
//       rmax > 1.1  -> reject, h *= clamp(0.9*rmax^(-1/5), 0.2, 1)
//       rmax < 0.5  -> accept, h *= clamp(0.9*rmax^(-1/6), 1, 5)
//     with the final step of an interval truncated to land on t1 and the
//     next suggested h adjusted from that truncated step.
// It serves three roles: an independent oracle for trajectory-parity tests
// of the JAX adaptive driver, a fast native CPU path for single-trajectory
// stepping (the reference's own use case), and the runtime's native ODE
// component (SURVEY.md §2.3 build target).
//
// C ABI only (ctypes-friendly).  Build: `make` in this directory.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// RHS callback: dydt = f(y).  Time-independent, as in the reference
// (const f, Hamilton.hs:445).
typedef void (*ham_rhs_fn)(const double* y, double* dydt, int dim, void* user);

struct HamStats {
  int64_t n_steps;
  int64_t n_rejected;
  double h_final;
};

}  // extern "C"

namespace {

constexpr double kSafety = 0.9;
constexpr int kOrder = 5;  // GSL reports order 5 for rkf45

// Fehlberg 4(5) tableau (matches GSL rkf45.c).
constexpr double kC2 = 1.0 / 4.0;
constexpr double kA21 = 1.0 / 4.0;
constexpr double kA31 = 3.0 / 32.0, kA32 = 9.0 / 32.0;
constexpr double kA41 = 1932.0 / 2197.0, kA42 = -7200.0 / 2197.0,
                 kA43 = 7296.0 / 2197.0;
constexpr double kA51 = 439.0 / 216.0, kA52 = -8.0, kA53 = 3680.0 / 513.0,
                 kA54 = -845.0 / 4104.0;
constexpr double kA61 = -8.0 / 27.0, kA62 = 2.0, kA63 = -3544.0 / 2565.0,
                 kA64 = 1859.0 / 4104.0, kA65 = -11.0 / 40.0;
// 5th-order advance coefficients.
constexpr double kB1 = 16.0 / 135.0, kB3 = 6656.0 / 12825.0,
                 kB4 = 28561.0 / 56430.0, kB5 = -9.0 / 50.0, kB6 = 2.0 / 55.0;
// Error coefficients (y5 - y4), GSL rkf45.c ec[].
constexpr double kE1 = 1.0 / 360.0, kE3 = -128.0 / 4275.0,
                 kE4 = -2197.0 / 75240.0, kE5 = 1.0 / 50.0, kE6 = 2.0 / 55.0;

struct Work {
  std::vector<double> k1, k2, k3, k4, k5, k6, ytmp, ynew, yerr;
  explicit Work(int dim)
      : k1(dim), k2(dim), k3(dim), k4(dim), k5(dim), k6(dim), ytmp(dim),
        ynew(dim), yerr(dim) {}
};

// One embedded RKF45 step from y with size h into w.ynew / w.yerr.
void rkf45_step(ham_rhs_fn f, void* user, const double* y, int dim, double h,
                Work& w) {
  f(y, w.k1.data(), dim, user);
  for (int i = 0; i < dim; ++i) w.ytmp[i] = y[i] + h * kA21 * w.k1[i];
  f(w.ytmp.data(), w.k2.data(), dim, user);
  for (int i = 0; i < dim; ++i)
    w.ytmp[i] = y[i] + h * (kA31 * w.k1[i] + kA32 * w.k2[i]);
  f(w.ytmp.data(), w.k3.data(), dim, user);
  for (int i = 0; i < dim; ++i)
    w.ytmp[i] = y[i] + h * (kA41 * w.k1[i] + kA42 * w.k2[i] + kA43 * w.k3[i]);
  f(w.ytmp.data(), w.k4.data(), dim, user);
  for (int i = 0; i < dim; ++i)
    w.ytmp[i] = y[i] + h * (kA51 * w.k1[i] + kA52 * w.k2[i] + kA53 * w.k3[i] +
                            kA54 * w.k4[i]);
  f(w.ytmp.data(), w.k5.data(), dim, user);
  for (int i = 0; i < dim; ++i)
    w.ytmp[i] = y[i] + h * (kA61 * w.k1[i] + kA62 * w.k2[i] + kA63 * w.k3[i] +
                            kA64 * w.k4[i] + kA65 * w.k5[i]);
  f(w.ytmp.data(), w.k6.data(), dim, user);
  for (int i = 0; i < dim; ++i) {
    w.ynew[i] = y[i] + h * (kB1 * w.k1[i] + kB3 * w.k3[i] + kB4 * w.k4[i] +
                            kB5 * w.k5[i] + kB6 * w.k6[i]);
    w.yerr[i] = h * (kE1 * w.k1[i] + kE3 * w.k3[i] + kE4 * w.k4[i] +
                     kE5 * w.k5[i] + kE6 * w.k6[i]);
  }
}

}  // namespace

extern "C" {

// Evolve y from t0 to t1 with GSL evolve/control semantics.
// h_inout: in = suggested step; out = suggested step for the next interval.
// Returns 0 on success, 1 if max_steps exceeded, 2 on non-finite state.
int ham_rkf45_evolve(ham_rhs_fn f, void* user, int dim, double t0, double t1,
                     double eps_abs, double eps_rel, double* y,
                     double* h_inout, int64_t max_steps, HamStats* stats) {
  Work w(dim);
  double t = t0;
  double h_star = *h_inout;  // GSL's *h: updated only on accepted steps
  double h_try = h_star;
  int64_t steps = 0, rejected = 0;

  while (t < t1) {
    if (++steps > max_steps) return 1;
    const double dt_rem = t1 - t;
    const bool final_step = h_try >= dt_rem;
    const double h0 = final_step ? dt_rem : h_try;

    rkf45_step(f, user, y, dim, h0, w);

    double rmax = 0.0;
    for (int i = 0; i < dim; ++i) {
      const double d0 = eps_rel * std::fabs(w.ynew[i]) + eps_abs;
      const double r = std::fabs(w.yerr[i]) / d0;
      if (r > rmax) rmax = r;
    }
    if (!std::isfinite(rmax)) return 2;

    if (rmax > 1.1) {
      // decrease; gsl evolve retries only if the step actually shrank vs *h
      double r = kSafety * std::pow(rmax, -1.0 / kOrder);
      if (r < 0.2) r = 0.2;
      const double h_dec = h0 * r;
      if (h_dec < h_star && t + h_dec > t) {
        ++rejected;
        h_try = h_dec;  // reject: y, t unchanged
        continue;
      }
      // keep current step size (gsl: h0 = *h)
      t = final_step ? t1 : t + h0;
      std::memcpy(y, w.ynew.data(), dim * sizeof(double));
      h_try = h_star;
    } else if (rmax < 0.5) {
      // accept and grow from the used (possibly truncated) step
      double r = kSafety * std::pow(rmax, -1.0 / (kOrder + 1.0));
      if (r > 5.0) r = 5.0;
      if (r < 1.0) r = 1.0;
      t = final_step ? t1 : t + h0;
      std::memcpy(y, w.ynew.data(), dim * sizeof(double));
      h_star = h0 * r;
      h_try = h_star;
    } else {
      // accept, keep h0 as the suggestion
      t = final_step ? t1 : t + h0;
      std::memcpy(y, w.ynew.data(), dim * sizeof(double));
      h_star = h0;
      h_try = h_star;
    }
  }
  *h_inout = h_star;
  if (stats) {
    stats->n_steps = steps;
    stats->n_rejected = rejected;
    stats->h_final = h_star;
  }
  return 0;
}

// Evolve through a vector of output times (the odeSolveV pattern,
// Hamilton.hs:443-448): out is (n_ts x dim) row-major with out[0] = y0 at
// ts[0]; the suggested h carries across intervals; initial suggestion is
// (ts[1]-ts[0])/100 when h0 <= 0.
int ham_rkf45_evolve_times(ham_rhs_fn f, void* user, int dim,
                           const double* ts, int n_ts, double eps_abs,
                           double eps_rel, double h0, const double* y0,
                           double* out, int64_t max_steps, HamStats* stats) {
  if (n_ts < 2) return 3;
  std::vector<double> y(y0, y0 + dim);
  double h = h0 > 0.0 ? h0 : (ts[1] - ts[0]) / 100.0;
  std::memcpy(out, y.data(), dim * sizeof(double));
  HamStats acc{0, 0, h};
  for (int k = 1; k < n_ts; ++k) {
    HamStats st{0, 0, 0.0};
    const int rc = ham_rkf45_evolve(f, user, dim, ts[k - 1], ts[k], eps_abs,
                                    eps_rel, y.data(), &h, max_steps, &st);
    if (rc != 0) return rc;
    acc.n_steps += st.n_steps;
    acc.n_rejected += st.n_rejected;
    acc.h_final = h;
    std::memcpy(out + static_cast<size_t>(k) * dim, y.data(),
                dim * sizeof(double));
  }
  if (stats) *stats = acc;
  return 0;
}

// ---------------------------------------------------------------------------
// Built-in analytic double-pendulum RHS (reference doublePendulum system,
// app/Examples.hs:75-94), hand-derived so the native engine can run the
// baseline config standalone (no Python callback in the hot loop):
//   coords (sin t1, 1-cos t1, sin t1 + sin t2/2, 1-cos t1 - cos t2/2)
//   K = [[m1+m2, m2*cos(t1-t2)/2], [., m2/4]];  U = 5(m1 y1 + m2 y2)
//   qdot = K^-1 p
//   dH/dt1 =  w1 w2 m2 sin(t1-t2)/2 + 5(m1+m2) sin t1
//   dH/dt2 = -w1 w2 m2 sin(t1-t2)/2 + 5 m2 sin(t2)/2
// ---------------------------------------------------------------------------

struct DoublePendParams {
  double m1, m2;
};

void ham_double_pendulum_rhs(const double* y, double* dydt, int dim,
                             void* user) {
  (void)dim;  // always 4: (t1, t2, p1, p2)
  const DoublePendParams* prm = static_cast<const DoublePendParams*>(user);
  const double m1 = prm->m1, m2 = prm->m2;
  const double t1 = y[0], t2 = y[1], p1 = y[2], p2 = y[3];
  const double k11 = m1 + m2;
  const double k12 = 0.5 * m2 * std::cos(t1 - t2);
  const double k22 = 0.25 * m2;
  const double det = k11 * k22 - k12 * k12;
  const double w1 = (k22 * p1 - k12 * p2) / det;
  const double w2 = (k11 * p2 - k12 * p1) / det;
  const double s12 = std::sin(t1 - t2);
  const double dhdt1 = 0.5 * w1 * w2 * m2 * s12 + 5.0 * (m1 + m2) * std::sin(t1);
  const double dhdt2 = -0.5 * w1 * w2 * m2 * s12 + 2.5 * m2 * std::sin(t2);
  dydt[0] = w1;
  dydt[1] = w2;
  dydt[2] = -dhdt1;
  dydt[3] = -dhdt2;
}

// Convenience: evolve the built-in double pendulum over output times.
int ham_double_pendulum_evolve(double m1, double m2, const double* ts,
                               int n_ts, double eps_abs, double eps_rel,
                               double h0, const double* y0, double* out,
                               HamStats* stats) {
  DoublePendParams prm{m1, m2};
  return ham_rkf45_evolve_times(ham_double_pendulum_rhs, &prm, 4, ts, n_ts,
                                eps_abs, eps_rel, h0, y0, out, 10000000,
                                stats);
}

// Fixed-step benchmark helper: n_steps of RKF45-sized work on the built-in
// double pendulum with fixed h (no error control) — used to measure native
// single-trajectory step throughput for the bench baseline.
int ham_double_pendulum_fixed_steps(double m1, double m2, double h,
                                    int64_t n_steps, double* y /*4, in-out*/) {
  DoublePendParams prm{m1, m2};
  Work w(4);
  for (int64_t s = 0; s < n_steps; ++s) {
    rkf45_step(ham_double_pendulum_rhs, &prm, y, 4, h, w);
    std::memcpy(y, w.ynew.data(), 4 * sizeof(double));
  }
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Built-in analytic N-link chain RHS (the rebuild's stress model,
// hamilton_tpu/models/chain.py; BASELINE configs[3]).  Closed forms:
//   coords: x_k = sum_{j<=k} l sin t_j, y_k = sum_{j<=k} l (1 - cos t_j)
//   K_ij   = l^2 cos(t_i - t_j) * S_max(i,j),  S_k = sum_{m>=k} mass_m
//   dT/dt_a = w_a * sum_j w_j l^2 S_max(a,j) sin(t_a - t_j)
//   dU/dt_a = g l sin(t_a) S_a
// with w = K^-1 p via a dense Cholesky solve.  Used for (a) an independent
// parity oracle for the AD-derived chain dynamics, and (b) a native
// multi-core CPU ensemble runner (OpenMP) — the host-side counterpart of
// the TPU ensemble path.
// ---------------------------------------------------------------------------

namespace {

struct ChainParams {
  int n;
  double l, g;
  const double* suffix_mass;  // S_k, length n
};

// Dense lower-Cholesky solve of K w = p for small n (in-place workspace).
bool chol_solve(int n, std::vector<double>& k, const double* p, double* w) {
  for (int j = 0; j < n; ++j) {
    double s = k[j * n + j];
    for (int t = 0; t < j; ++t) s -= k[j * n + t] * k[j * n + t];
    if (s <= 0.0) return false;
    const double d = std::sqrt(s);
    k[j * n + j] = d;
    for (int i = j + 1; i < n; ++i) {
      double v = k[i * n + j];
      for (int t = 0; t < j; ++t) v -= k[i * n + t] * k[j * n + t];
      k[i * n + j] = v / d;
    }
  }
  std::vector<double> y(n);
  for (int i = 0; i < n; ++i) {
    double s = p[i];
    for (int t = 0; t < i; ++t) s -= k[i * n + t] * y[t];
    y[i] = s / k[i * n + i];
  }
  for (int i = n - 1; i >= 0; --i) {
    double s = y[i];
    for (int t = i + 1; t < n; ++t) s -= k[t * n + i] * w[t];
    w[i] = s / k[i * n + i];
  }
  return true;
}

}  // namespace

extern "C" {

void ham_chain_rhs(const double* y, double* dydt, int dim, void* user) {
  const ChainParams* prm = static_cast<const ChainParams*>(user);
  const int n = prm->n;
  (void)dim;  // 2n
  const double* t = y;
  const double* p = y + n;
  const double l2 = prm->l * prm->l;

  std::vector<double> k(static_cast<size_t>(n) * n);
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < n; ++j) {
      const int mx = i > j ? i : j;
      k[i * n + j] = l2 * std::cos(t[i] - t[j]) * prm->suffix_mass[mx];
    }
  std::vector<double> w(n);
  if (!chol_solve(n, k, p, w.data())) {
    for (int i = 0; i < 2 * n; ++i) dydt[i] = std::nan("");
    return;
  }
  for (int i = 0; i < n; ++i) dydt[i] = w[i];
  for (int a = 0; a < n; ++a) {
    double dtdq = 0.0;
    for (int j = 0; j < n; ++j) {
      const int mx = a > j ? a : j;
      dtdq += w[j] * l2 * prm->suffix_mass[mx] * std::sin(t[a] - t[j]);
    }
    dtdq *= w[a];
    const double dudq = prm->g * prm->l * std::sin(t[a]) * prm->suffix_mass[a];
    dydt[n + a] = -(dtdq + dudq);
  }
}

// Adaptive evolve of the analytic chain over output times (parity oracle).
int ham_chain_evolve(int n_links, const double* masses, double l, double g,
                     const double* ts, int n_ts, double eps_abs,
                     double eps_rel, double h0, const double* y0, double* out,
                     HamStats* stats) {
  std::vector<double> suffix(n_links);
  double acc = 0.0;
  for (int k = n_links - 1; k >= 0; --k) {
    acc += masses[k];
    suffix[k] = acc;
  }
  ChainParams prm{n_links, l, g, suffix.data()};
  return ham_rkf45_evolve_times(ham_chain_rhs, &prm, 2 * n_links, ts, n_ts,
                                eps_abs, eps_rel, h0, y0, out, 10000000,
                                stats);
}

// Native multi-core ensemble runner: fixed-h RKF45 stepping of `n_members`
// independent chain trajectories, OpenMP-parallel over members.  The host
// CPU counterpart of the TPU ensemble path.
int ham_chain_ensemble_fixed_steps(int n_links, const double* masses,
                                   double l, double g, double h,
                                   int64_t n_steps, int64_t n_members,
                                   double* states /* (members, 2n) */) {
  std::vector<double> suffix(n_links);
  double acc = 0.0;
  for (int k = n_links - 1; k >= 0; --k) {
    acc += masses[k];
    suffix[k] = acc;
  }
  ChainParams prm{n_links, l, g, suffix.data()};
  const int dim = 2 * n_links;
#pragma omp parallel for schedule(static)
  for (int64_t m = 0; m < n_members; ++m) {
    Work w(dim);
    double* y = states + m * dim;
    for (int64_t s = 0; s < n_steps; ++s) {
      rkf45_step(ham_chain_rhs, &prm, y, dim, h, w);
      std::memcpy(y, w.ynew.data(), dim * sizeof(double));
    }
  }
  return 0;
}

}  // extern "C"
