// Native CPU runtime: dense constrained nonlinear least squares.
//
// A from-scratch C++17 implementation of the same algorithm the JAX/TPU path
// runs (SQP outer loop, condensed-KKT interior-point inner QP, L1-merit
// Armijo line search, LM fallback; Nocedal & Wright ch. 16/18/19). Serves as
//  (1) the single-threaded CPU baseline bench.py compares TPU throughput
//      against (the upstream reference is unbuildable here: its Eigen/fmt
//      submodules are not checked out), and
//  (2) a host-side runtime for solving small problems without an XLA
//      round-trip.
//
// No external dependencies: small dense linear algebra is hand-rolled
// (unpivoted LDL^T on the quasi-definite condensed system, the same
// recurrence as the Pallas kernel). Exposed via a C ABI for ctypes.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <chrono>
#include <functional>
#include <vector>

namespace {

using Vec = std::vector<double>;
using Mat = std::vector<double>;  // row-major n x m

// ----------------------------------------------------------------------
// Dense micro-kernels.
// ----------------------------------------------------------------------

// Unpivoted LDL^T: A (n x n, row-major) -> unit-lower L, diagonal d.
// Returns false on a zero/non-finite pivot.
bool ldlt_factor(int n, const double* A, double* L, double* d) {
  for (int j = 0; j < n; ++j) {
    for (int i = 0; i < n; ++i) {
      double c = A[i * n + j];
      for (int k = 0; k < j; ++k) {
        c -= L[i * n + k] * d[k] * L[j * n + k];
      }
      if (i == j) {
        d[j] = c;
        if (!(std::fabs(c) > 1e-300) || !std::isfinite(c)) return false;
        L[j * n + j] = 1.0;
      } else if (i > j) {
        L[i * n + j] = c / d[j];
      } else {
        L[i * n + j] = 0.0;
      }
    }
  }
  return true;
}

void ldlt_solve(int n, const double* L, const double* d, const double* rhs,
                double* x) {
  // Forward: L y = rhs (unit lower).
  for (int i = 0; i < n; ++i) {
    double acc = rhs[i];
    for (int k = 0; k < i; ++k) acc -= L[i * n + k] * x[k];
    x[i] = acc;
  }
  for (int i = 0; i < n; ++i) x[i] /= d[i];
  // Backward: L^T z = y.
  for (int i = n - 1; i >= 0; --i) {
    double acc = x[i];
    for (int k = i + 1; k < n; ++k) acc -= L[k * n + i] * x[k];
    x[i] = acc;
  }
}

// ----------------------------------------------------------------------
// Problem definition (mirrors mini_opt_tpu.nonlinear.Problem).
// ----------------------------------------------------------------------

struct ResidualFn {
  int dim;                       // residual dimension R
  std::vector<int> index;        // global indices of the P touched params
  // eval(x_local, r[R], J[R x P] or nullptr)
  std::function<void(const double*, double*, double*)> eval;
};

struct BoxConstraint {
  int variable;
  double a, b;  // a * x[v] + b >= 0
};

struct Problem {
  int dimension = 0;
  std::vector<ResidualFn> costs;
  std::vector<ResidualFn> equality_constraints;
  std::vector<BoxConstraint> inequality_constraints;
};

struct NLSParams {
  int max_iterations = 10;
  int max_qp_iterations = 10;
  double kkt_tol = 1e-6;
  double comp_tol = 1e-6;
  double abs_exit_tol = 1e-9;
  double rel_exit_tol = 1e-12;
  double first_deriv_tol = 1e-10;
  int max_line_search_iterations = 10;
  double armijo_tau = 0.5;
  double armijo_c1 = 1e-4;
  double penalty_initial = 0.01;
  double penalty_scale = 1.01;
  double lambda_initial = 0.001;
  double lambda_failure_init = 0.001;
  double lambda_down_success = 0.1;
  double lambda_down_restore = 0.8;
  double min_lambda = 1e-9;
  double max_lambda = 1.0;
  bool wrap_angles = true;  // mod-pi retraction
};

double mod_pi(double a) {
  return a - 2.0 * M_PI * std::floor((a + M_PI) / (2.0 * M_PI));
}

// ----------------------------------------------------------------------
// Interior-point QP on the condensed system (same math as qp.py).
// ----------------------------------------------------------------------

struct QPData {
  int N = 0, K = 0, M = 0;
  Mat G;        // N x N
  Vec c;        // N
  Mat A_eq;     // K x N
  Vec b_eq;     // K
  std::vector<BoxConstraint> ineq;
};

struct IPWork {
  Vec x, s, y, z;    // iterate
  Mat H, L;          // (N+K)^2
  Vec d, rhs, sol;   // N+K
  Vec r_d, r_pe, r_pi, r_comp, r_aug;
  int iters = 0;
};

bool ip_solve(const QPData& qp, const NLSParams& p, IPWork& w) {
  const int N = qp.N, K = qp.K, M = qp.M, D = N + K;
  w.x.assign(N, 0.0);
  w.y.assign(K, 0.0);
  w.s.assign(M, 0.0);
  w.z.assign(M, 0.0);
  w.H.assign(D * D, 0.0);
  w.L.assign(D * D, 0.0);
  w.d.assign(D, 0.0);
  w.rhs.assign(D, 0.0);
  w.sol.assign(D, 0.0);
  w.r_d.assign(N, 0.0);
  w.r_pe.assign(K, 0.0);
  w.r_pi.assign(M, 0.0);
  w.r_comp.assign(M, 0.0);
  w.r_aug.assign(N, 0.0);
  w.iters = 0;

  auto build_H = [&](bool with_ineq) {
    std::fill(w.H.begin(), w.H.end(), 0.0);
    for (int i = 0; i < N; ++i)
      for (int j = 0; j < N; ++j) w.H[i * D + j] = qp.G[i * N + j];
    for (int k = 0; k < K; ++k)
      for (int j = 0; j < N; ++j) {
        w.H[(N + k) * D + j] = qp.A_eq[k * N + j];
        w.H[j * D + (N + k)] = qp.A_eq[k * N + j];
      }
    if (with_ineq) {
      for (int m = 0; m < M; ++m) {
        const auto& c = qp.ineq[m];
        w.H[c.variable * D + c.variable] += c.a * (w.z[m] / w.s[m]) * c.a;
      }
    }
  };
  auto eval_kkt = [&](bool with_ineq) {
    for (int i = 0; i < N; ++i) {
      double acc = qp.c[i];
      for (int j = 0; j < N; ++j) acc += qp.G[i * N + j] * w.x[j];
      for (int k = 0; k < K; ++k) acc -= qp.A_eq[k * N + i] * w.y[k];
      w.r_d[i] = acc;
    }
    for (int k = 0; k < K; ++k) {
      double acc = qp.b_eq[k];
      for (int j = 0; j < N; ++j) acc += qp.A_eq[k * N + j] * w.x[j];
      w.r_pe[k] = acc;
    }
    if (with_ineq) {
      for (int m = 0; m < M; ++m) {
        const auto& c = qp.ineq[m];
        w.r_d[c.variable] -= c.a * w.z[m];
        w.r_pi[m] = c.a * w.x[c.variable] + c.b - w.s[m];
        w.r_comp[m] = w.s[m] * w.z[m];
      }
    }
  };
  auto solve_cond = [&](double mu, bool with_ineq, Vec& dx, Vec& dy, Vec& ds,
                        Vec& dz) {
    w.r_aug = w.r_d;
    if (with_ineq) {
      for (int m = 0; m < M; ++m) {
        const auto& c = qp.ineq[m];
        const double zs = w.z[m] / w.s[m];
        w.r_aug[c.variable] += c.a * zs * w.r_pi[m];
        w.r_aug[c.variable] += c.a * (w.r_comp[m] - mu) / w.s[m];
      }
    }
    for (int i = 0; i < N; ++i) w.rhs[i] = -w.r_aug[i];
    for (int k = 0; k < K; ++k) w.rhs[N + k] = -w.r_pe[k];
    ldlt_solve(D, w.L.data(), w.d.data(), w.rhs.data(), w.sol.data());
    dx.assign(w.sol.begin(), w.sol.begin() + N);
    dy.assign(K, 0.0);
    for (int k = 0; k < K; ++k) dy[k] = -w.sol[N + k];
    ds.assign(M, 0.0);
    dz.assign(M, 0.0);
    if (with_ineq) {
      for (int m = 0; m < M; ++m) {
        const auto& c = qp.ineq[m];
        ds[m] = c.a * dx[c.variable] + w.r_pi[m];
        dz[m] = -(w.z[m] / w.s[m]) * ds[m] - (w.r_comp[m] - mu) / w.s[m];
      }
    }
  };

  // Initial guess: equality-constrained solve when K > 0 (qp.cc:439-482),
  // then clamp and set s, z.
  if (K > 0) {
    build_H(false);
    if (!ldlt_factor(D, w.H.data(), w.L.data(), w.d.data())) return false;
    eval_kkt(false);
    Vec dx, dy, ds, dz;
    solve_cond(0.0, /*with_ineq=*/false, dx, dy, ds, dz);
    w.x = dx;
    w.y = dy;
  }
  for (const auto& c : qp.ineq) {
    const double bound = (c.a < 0) ? c.b / -c.a : -c.b / c.a;
    if (c.a < 0)
      w.x[c.variable] = std::min(w.x[c.variable], bound);
    else
      w.x[c.variable] = std::max(w.x[c.variable], bound);
  }
  for (int m = 0; m < M; ++m) {
    const auto& c = qp.ineq[m];
    w.s[m] = std::max(1e-9, c.a * w.x[c.variable] + c.b);
    w.z[m] = 1.0 / w.s[m];
  }

  double mu = 1.0;
  const double sigma = 0.1;
  Vec dx, dy, ds, dz;
  for (int it = 0; it < p.max_qp_iterations; ++it) {
    ++w.iters;
    eval_kkt(true);
    build_H(true);
    if (!ldlt_factor(D, w.H.data(), w.L.data(), w.d.data())) return false;
    solve_cond(M > 0 ? mu : 0.0, M > 0, dx, dy, ds, dz);
    // Fraction-to-boundary (19.9), tau = 0.995.
    double ap = 1.0, ad = 1.0;
    for (int m = 0; m < M; ++m) {
      if (w.s[m] + ds[m] <= 0.0 && std::fabs(ds[m]) > 0)
        ap = std::min(ap, -0.995 * w.s[m] / ds[m]);
      if (w.z[m] + dz[m] <= 0.0 && std::fabs(dz[m]) > 0)
        ad = std::min(ad, -0.995 * w.z[m] / dz[m]);
    }
    for (int i = 0; i < N; ++i) w.x[i] += ap * dx[i];
    for (int m = 0; m < M; ++m) w.s[m] += ap * ds[m];
    for (int k = 0; k < K; ++k) w.y[k] += ad * dy[k];
    for (int m = 0; m < M; ++m) w.z[m] += ad * dz[m];
    // Errors.
    eval_kkt(true);
    double kkt_max = 0.0, nd = 0.0, ne = 0.0, ni = 0.0, nc = 0.0;
    for (int i = 0; i < N; ++i) nd += w.r_d[i] * w.r_d[i];
    for (int k = 0; k < K; ++k) ne += w.r_pe[k] * w.r_pe[k];
    for (int m = 0; m < M; ++m) {
      ni += w.r_pi[m] * w.r_pi[m];
      nc += w.r_comp[m] * w.r_comp[m];
    }
    kkt_max = std::max(std::max(std::sqrt(nd), std::sqrt(ne)),
                       std::max(std::sqrt(ni), std::sqrt(nc)));
    double comp = 0.0;
    for (int m = 0; m < M; ++m) comp += w.s[m] * w.z[m];
    if (M > 0) comp /= M;
    if (kkt_max < p.kkt_tol && comp < p.comp_tol) return true;
    mu = (M > 0) ? sigma * comp : 0.0;
  }
  return true;
}

// ----------------------------------------------------------------------
// SQP / LM outer loop (mirrors nonlinear.py).
// ----------------------------------------------------------------------

struct NLSOut {
  int iterations = 0;
  int qp_iterations = 0;
  int termination = 0;  // NLSTerminationState codes
};

struct Errors2 {
  double f = 0, eq = 0;
  double total(double pen) const { return f + pen * eq; }
  double linf() const { return std::max(f, eq); }
};

Errors2 eval_errors(const Problem& pr, const Vec& x, Vec& scratch_r) {
  Errors2 e;
  Vec xl;
  for (const auto& res : pr.costs) {
    xl.resize(res.index.size());
    for (size_t i = 0; i < res.index.size(); ++i) xl[i] = x[res.index[i]];
    scratch_r.resize(res.dim);
    res.eval(xl.data(), scratch_r.data(), nullptr);
    for (int i = 0; i < res.dim; ++i) e.f += 0.5 * scratch_r[i] * scratch_r[i];
  }
  for (const auto& res : pr.equality_constraints) {
    xl.resize(res.index.size());
    for (size_t i = 0; i < res.index.size(); ++i) xl[i] = x[res.index[i]];
    scratch_r.resize(res.dim);
    res.eval(xl.data(), scratch_r.data(), nullptr);
    for (int i = 0; i < res.dim; ++i) e.eq += std::fabs(scratch_r[i]);
  }
  return e;
}

NLSOut nls_solve(const Problem& pr, const NLSParams& p, Vec& x) {
  const int N = pr.dimension;
  int K = 0;
  for (const auto& r : pr.equality_constraints) K += r.dim;
  QPData qp;
  qp.N = N;
  qp.K = K;
  qp.M = static_cast<int>(pr.inequality_constraints.size());
  qp.G.assign(N * N, 0.0);
  qp.c.assign(N, 0.0);
  qp.A_eq.assign(K * N, 0.0);
  qp.b_eq.assign(K, 0.0);

  IPWork w;
  NLSOut out;
  double lambda = p.lambda_initial;
  double penalty = p.penalty_initial;
  int state = 0;  // 0 nominal, 1 restore
  Vec r, J, xl, dx(N), cand(N);

  for (int iter = 0; iter < p.max_iterations; ++iter) {
    ++out.iterations;
    // Linearize.
    std::fill(qp.G.begin(), qp.G.end(), 0.0);
    std::fill(qp.c.begin(), qp.c.end(), 0.0);
    Errors2 errors_pre;
    for (const auto& res : pr.costs) {
      const int P = static_cast<int>(res.index.size());
      xl.resize(P);
      for (int i = 0; i < P; ++i) xl[i] = x[res.index[i]];
      r.resize(res.dim);
      J.resize(res.dim * P);
      res.eval(xl.data(), r.data(), J.data());
      for (int i = 0; i < res.dim; ++i) errors_pre.f += 0.5 * r[i] * r[i];
      for (int a = 0; a < P; ++a) {
        const int ga = res.index[a];
        for (int b = 0; b < P; ++b) {
          const int gb = res.index[b];
          double acc = 0.0;
          for (int i = 0; i < res.dim; ++i) acc += J[i * P + a] * J[i * P + b];
          qp.G[ga * N + gb] += acc;
        }
        double acc = 0.0;
        for (int i = 0; i < res.dim; ++i) acc += J[i * P + a] * r[i];
        qp.c[ga] += acc;
      }
    }
    for (int i = 0; i < N; ++i) qp.G[i * N + i] += lambda;
    int row = 0;
    std::fill(qp.A_eq.begin(), qp.A_eq.end(), 0.0);
    for (const auto& res : pr.equality_constraints) {
      const int P = static_cast<int>(res.index.size());
      xl.resize(P);
      for (int i = 0; i < P; ++i) xl[i] = x[res.index[i]];
      r.resize(res.dim);
      J.resize(res.dim * P);
      res.eval(xl.data(), r.data(), J.data());
      for (int i = 0; i < res.dim; ++i) {
        qp.b_eq[row + i] = r[i];
        errors_pre.eq += std::fabs(r[i]);
        for (int a = 0; a < P; ++a) qp.A_eq[(row + i) * N + res.index[a]] = J[i * P + a];
      }
      row += res.dim;
    }
    qp.ineq.clear();
    for (const auto& c : pr.inequality_constraints) {
      qp.ineq.push_back({c.variable, c.a, c.a * x[c.variable] + c.b});
    }

    if (!ip_solve(qp, p, w)) {
      out.termination = 5;  // QP_INDEFINITE
      return out;
    }
    out.qp_iterations += w.iters;
    dx = w.x;

    // Directional derivative + penalty update (Lagrange L-inf, eq 18.32).
    double d_f = 0.0;
    for (int i = 0; i < N; ++i) d_f += qp.c[i] * dx[i];
    double d_eq = 0.0;
    for (int k = 0; k < K; ++k) {
      double adx = 0.0;
      for (int j = 0; j < N; ++j) adx += qp.A_eq[k * N + j] * dx[j];
      d_eq += ((qp.b_eq[k] > 0) - (qp.b_eq[k] < 0)) * adx;
    }
    if (K > 0) {
      double linf = 0.0;
      for (int k = 0; k < K; ++k) linf = std::max(linf, std::fabs(w.y[k]));
      if (linf > penalty) penalty = linf * p.penalty_scale;
    }
    const double dd = d_f + penalty * d_eq;
    const double dd_linf = std::max(std::fabs(d_f), std::fabs(d_eq));

    // Armijo backtracking line search on the L1 merit.
    double alpha = 1.0;
    int step_result = 1;  // MAX_ITERATIONS
    Errors2 cand_err;
    for (int ls = 0; ls <= p.max_line_search_iterations; ++ls) {
      if (ls > 0) alpha *= p.armijo_tau;
      for (int i = 0; i < N; ++i) {
        cand[i] = x[i] + alpha * dx[i];
        if (p.wrap_angles) cand[i] = mod_pi(cand[i]);
      }
      Vec scratch;
      cand_err = eval_errors(pr, cand, scratch);
      if (dd_linf < p.first_deriv_tol) {
        step_result = 2;  // FIRST_ORDER_SATISFIED
        break;
      }
      if (dd > 0) {
        step_result = 3;  // POSITIVE_DERIVATIVE
        break;
      }
      if (cand_err.total(penalty) <=
          errors_pre.total(penalty) + dd * alpha * p.armijo_c1) {
        step_result = 0;  // SUCCESS
        break;
      }
    }

    if (step_result == 0) {
      x = cand;
      lambda = std::max(
          lambda * (state == 1 ? p.lambda_down_restore : p.lambda_down_success),
          p.min_lambda);
      state = 0;
      if (cand_err.linf() < p.abs_exit_tol) {
        out.termination = 1;  // SATISFIED_ABSOLUTE_TOL
        return out;
      }
      if (cand_err.total(penalty) >
          errors_pre.total(penalty) * (1.0 - p.rel_exit_tol)) {
        out.termination = 2;  // SATISFIED_RELATIVE_TOL
        return out;
      }
    } else if (step_result == 2) {
      out.termination = 3;  // SATISFIED_FIRST_ORDER_TOL
      return out;
    } else {
      if (state == 0) {
        lambda = std::max(p.lambda_failure_init, lambda * 10.0);
        state = 1;
      } else {
        lambda *= 10.0;
      }
      if (lambda > p.max_lambda) {
        out.termination = 4;  // MAX_LAMBDA
        return out;
      }
    }
  }
  out.termination = 0;  // MAX_ITERATIONS
  return out;
}

// ----------------------------------------------------------------------
// Benchmark workload: the planar n-link IK problem (mirrors models/ik.py).
// ----------------------------------------------------------------------

void planar_fk(int n, double link_len, const double* theta, double* xy,
               double* J /* 2 x n or nullptr */) {
  // Effector of a chain of n cumulative planar rotations with equal-length
  // links: x = sum_i L cos(phi_i), phi_i = theta_0 + ... + theta_i.
  double phi = 0.0;
  double px = 0.0, py = 0.0;
  std::vector<double> cphi(n), sphi(n);
  for (int i = 0; i < n; ++i) {
    phi += theta[i];
    cphi[i] = std::cos(phi);
    sphi[i] = std::sin(phi);
    px += link_len * cphi[i];
    py += link_len * sphi[i];
  }
  xy[0] = px;
  xy[1] = py;
  if (J) {
    for (int a = 0; a < n; ++a) {
      double dx = 0.0, dy = 0.0;
      for (int i = a; i < n; ++i) {
        dx -= link_len * sphi[i];
        dy += link_len * cphi[i];
      }
      J[0 * n + a] = dx;
      J[1 * n + a] = dy;
    }
  }
}

Problem make_ik_problem(int n_active, double link_len, double tx, double ty,
                        bool joint_limits) {
  Problem pr;
  pr.dimension = n_active;
  std::vector<int> idx(n_active);
  for (int i = 0; i < n_active; ++i) idx[i] = i;

  ResidualFn y_cost;
  y_cost.dim = 1;
  y_cost.index = idx;
  y_cost.eval = [n_active, link_len, ty](const double* xl, double* r, double* J) {
    double xy[2];
    std::vector<double> Jfk(2 * n_active);
    planar_fk(n_active, link_len, xl, xy, J ? Jfk.data() : nullptr);
    r[0] = xy[1] - ty;
    if (J)
      for (int a = 0; a < n_active; ++a) J[a] = Jfk[1 * n_active + a];
  };
  pr.costs.push_back(std::move(y_cost));

  ResidualFn x_eq;
  x_eq.dim = 1;
  x_eq.index = idx;
  x_eq.eval = [n_active, link_len, tx](const double* xl, double* r, double* J) {
    double xy[2];
    std::vector<double> Jfk(2 * n_active);
    planar_fk(n_active, link_len, xl, xy, J ? Jfk.data() : nullptr);
    r[0] = xy[0] - tx;
    if (J)
      for (int a = 0; a < n_active; ++a) J[a] = Jfk[0 * n_active + a];
  };
  pr.equality_constraints.push_back(std::move(x_eq));

  if (joint_limits) {
    for (int i = 1; i < n_active; ++i) {
      pr.inequality_constraints.push_back({i, 1.0, 0.0});            // theta >= 0
      pr.inequality_constraints.push_back({i, -1.0, 3.14159265358979});  // <= pi
    }
  }
  return pr;
}

}  // namespace

// ----------------------------------------------------------------------
// C ABI.
// ----------------------------------------------------------------------

extern "C" {

// Solve B planar IK instances. targets: B x 2, x0/x_out: B x n_active.
// Returns the number of instances whose termination indicates satisfied tol.
int miniopt_native_ik_solve_batch(const double* targets, const double* x0,
                                  int batch, int n_active, double link_len,
                                  int max_iters, int max_qp_iters,
                                  double* x_out, int* term_out,
                                  int* total_inner_iters) {
  NLSParams p;
  p.max_iterations = max_iters;
  p.max_qp_iterations = max_qp_iters;
  int ok = 0;
  int inner = 0;
  for (int b = 0; b < batch; ++b) {
    Problem pr = make_ik_problem(n_active, link_len, targets[b * 2 + 0],
                                 targets[b * 2 + 1], true);
    Vec x(x0 + b * n_active, x0 + (b + 1) * n_active);
    NLSOut out = nls_solve(pr, p, x);
    std::memcpy(x_out + b * n_active, x.data(), n_active * sizeof(double));
    if (term_out) term_out[b] = out.termination;
    inner += out.qp_iterations;
    if (out.termination >= 1 && out.termination <= 3) ++ok;
  }
  if (total_inner_iters) *total_inner_iters = inner;
  return ok;
}

// Time the condensed-KKT LDLT factor+solve in isolation.
// Returns microseconds per factor+solve for an n x n quasi-definite system.
double miniopt_native_ldlt_us(int n, int reps) {
  Mat A(n * n, 0.0), L(n * n), rhsv(n), x(n);
  Vec d(n);
  for (int i = 0; i < n; ++i) {
    A[i * n + i] = 2.0 + i * 0.01;
    for (int j = 0; j < i; ++j) {
      A[i * n + j] = A[j * n + i] = 0.3 / (1 + i + j);
    }
    rhsv[i] = 1.0 + 0.1 * i;
  }
  auto t0 = std::chrono::steady_clock::now();
  double sink = 0.0;
  for (int r = 0; r < reps; ++r) {
    A[0] = 2.0 + (r % 7) * 1e-9;  // defeat CSE
    ldlt_factor(n, A.data(), L.data(), d.data());
    ldlt_solve(n, L.data(), d.data(), rhsv.data(), x.data());
    sink += x[0];
  }
  auto t1 = std::chrono::steady_clock::now();
  const double us =
      std::chrono::duration<double, std::micro>(t1 - t0).count() / reps;
  return sink != sink ? -1.0 : us;  // keep `sink` alive
}

// Forward kinematics for testing the native chain against the JAX one.
void miniopt_native_planar_fk(int n, double link_len, const double* theta,
                              double* xy, double* J) {
  planar_fk(n, link_len, theta, xy, J);
}

}  // extern "C"
