// Differential-fuzzing driver for the ACTUAL reference library.
//
// scripts/diff_fuzz.py generates seeded problem instances, writes them to a
// plain-text file, and runs this binary to solve every instance with the
// unmodified reference solvers (compiled from /root/reference/source, the
// same build recipe as bench_reference.cc).  The Python side then solves the
// IDENTICAL instances through this framework and asserts solution agreement,
// termination-state agreement, and iteration-count distribution match -- the
// reference's own randomized families (qp_test.cc:483-574 random QPs,
// nonlinear_test.cc:390-424 Rosenbrock starts, :597-665 Himmelblau grid) as
// a data-driven equivalence check instead of an argument.
//
// This file is OUR code: it only drives the reference's public API
// (qp.hpp:132-295, nonlinear.hpp:33-157).  Instances travel through the file
// so both solvers consume bit-identical doubles (printf %.17g round-trips).
//
// Usage:
//   diff_fuzz qp         <in> <out>   box-constrained QPs, IP solver,
//                                     NAIVE + SOLVE_EQUALITY_CONSTRAINED
//   diff_fuzz rosenbrock <in> <out>   unconstrained 2D Rosenbrock NLS
//   diff_fuzz himmelblau <in> <out>   box-constrained Himmelblau NLS

#include <cmath>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include <Eigen/Dense>

#include "mini_opt/nonlinear.hpp"
#include "mini_opt/qp.hpp"
#include "mini_opt/residual.hpp"

namespace {

constexpr double kSqrtB = 10.0;  // sqrt(100), the Rosenbrock residual weight

// ---------------------------------------------------------------------------
// QP mode.  Input: "B n m" then per problem n*n G (row major), n c, m lines
// "v a b".  Output per problem: "term_warm iters_warm x_warm[n] term_naive
// iters_naive x_naive[n]" (term: 0 = SATISFIED_KKT_TOL, 1 = MAX_ITERATIONS).
// ---------------------------------------------------------------------------

int RunQP(std::FILE* in, std::FILE* out) {
  using namespace mini_opt;
  int B = 0, n = 0, m = 0;
  if (std::fscanf(in, "%d %d %d", &B, &n, &m) != 3) return 1;

  QPInteriorPointSolver solver{};
  for (int p = 0; p < B; ++p) {
    QP qp(n);
    for (int i = 0; i < n; ++i)
      for (int j = 0; j < n; ++j)
        if (std::fscanf(in, "%lf", &qp.G(i, j)) != 1) return 1;
    for (int i = 0; i < n; ++i)
      if (std::fscanf(in, "%lf", &qp.c[i]) != 1) return 1;
    for (int k = 0; k < m; ++k) {
      int v;
      double a, b;
      if (std::fscanf(in, "%d %lf %lf", &v, &a, &b) != 3) return 1;
      qp.constraints.emplace_back(v, a, b);
    }

    for (const auto method : {InitialGuessMethod::SOLVE_EQUALITY_CONSTRAINED,
                              InitialGuessMethod::NAIVE}) {
      QPInteriorPointSolver::Params params{};
      params.max_iterations = 30;
      params.termination_kkt_tol = 1.0e-12;
      params.initial_guess_method = method;
      params.barrier_strategy = BarrierStrategy::COMPLEMENTARITY;
      solver.Setup(&qp);
      const auto outputs = solver.Solve(params);
      std::fprintf(out, "%d %d", static_cast<int>(outputs.termination_state),
                   static_cast<int>(outputs.iterations.size()));
      const auto x = solver.x_block();
      for (int i = 0; i < n; ++i) std::fprintf(out, " %.17g", x[i]);
      std::fprintf(out, method == InitialGuessMethod::NAIVE ? "\n" : " ");
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// NLS modes.  Residual definitions mirror this framework's tests
// (tests/test_nonlinear.py), which themselves mirror the reference test
// suites' problem statements (nonlinear_test.cc:390-424, 597-665).
// Output per start: "term num_iterations num_qp_iterations x y"
// (term: reference NLSTerminationState enum order, structs.hpp:233-248).
// ---------------------------------------------------------------------------

int RunNLS(std::FILE* in, std::FILE* out, const bool himmelblau) {
  using namespace mini_opt;
  using Eigen::Matrix;
  using Eigen::VectorXd;

  int B = 0;
  double lo = -5.0;
  if (himmelblau) {
    if (std::fscanf(in, "%d %lf", &B, &lo) != 2) return 1;
  } else {
    if (std::fscanf(in, "%d", &B) != 1) return 1;
  }

  Problem problem{};
  problem.dimension = 2;
  if (himmelblau) {
    // Two 1-dim residuals: x^2 + y - 11, x + y^2 - 7; box on both vars.
    auto h1 = [](const Matrix<double, 2, 1>& v,
                 Matrix<double, 1, 2>* const J) -> Matrix<double, 1, 1> {
      if (J) (*J) << 2.0 * v[0], 1.0;
      return Matrix<double, 1, 1>{v[0] * v[0] + v[1] - 11.0};
    };
    auto h2 = [](const Matrix<double, 2, 1>& v,
                 Matrix<double, 1, 2>* const J) -> Matrix<double, 1, 1> {
      if (J) (*J) << 1.0, 2.0 * v[1];
      return Matrix<double, 1, 1>{v[0] + v[1] * v[1] - 7.0};
    };
    problem.costs.push_back(MakeResidual<1, 2>({0, 1}, h1));
    problem.costs.push_back(MakeResidual<1, 2>({0, 1}, h2));
    problem.inequality_constraints.push_back(Var(0) >= lo);
    problem.inequality_constraints.push_back(Var(0) <= 5.0);
    problem.inequality_constraints.push_back(Var(1) >= lo);
    problem.inequality_constraints.push_back(Var(1) <= 5.0);
  } else {
    auto rb = [](const Matrix<double, 2, 1>& v,
                 Matrix<double, 2, 2>* const J) -> Matrix<double, 2, 1> {
      if (J) (*J) << -1.0, 0.0, -2.0 * kSqrtB * v[0], kSqrtB;
      return Matrix<double, 2, 1>{1.0 - v[0], kSqrtB * (v[1] - v[0] * v[0])};
    };
    problem.costs.push_back(MakeResidual<2, 2>({0, 1}, rb));
  }

  ConstrainedNonlinearLeastSquares nls(&problem);

  ConstrainedNonlinearLeastSquares::Params p{};
  if (himmelblau) {
    // tests/test_nonlinear.py HIMMELBLAU_PARAMS.
    p.max_iterations = 20;
    p.max_qp_iterations = 10;
    p.relative_exit_tol = 1.0e-12;
    p.absolute_first_derivative_tol = 1.0e-8;
    p.termination_kkt_tolerance = 1.0e-6;
  } else {
    // tests/test_nonlinear.py::test_rosenbrock_unconstrained.
    p.max_iterations = 5;
    p.max_qp_iterations = 1;
  }

  for (int i = 0; i < B; ++i) {
    double x0, y0;
    if (std::fscanf(in, "%lf %lf", &x0, &y0) != 2) return 1;
    const auto outputs = nls.Solve(p, Eigen::Vector2d(x0, y0));
    const VectorXd& x = nls.variables();
    std::fprintf(out, "%d %d %d %.17g %.17g\n",
                 static_cast<int>(outputs.termination_state),
                 static_cast<int>(outputs.iterations.size()),
                 static_cast<int>(outputs.NumQPIterations()), x[0], x[1]);
  }
  return 0;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc != 4) {
    std::fprintf(stderr, "usage: diff_fuzz <qp|rosenbrock|himmelblau> <in> <out>\n");
    return 2;
  }
  std::FILE* in = std::fopen(argv[2], "r");
  std::FILE* out = std::fopen(argv[3], "w");
  if (!in || !out) {
    std::fprintf(stderr, "cannot open files\n");
    return 2;
  }
  int rc = 2;
  if (std::strcmp(argv[1], "qp") == 0) {
    rc = RunQP(in, out);
  } else if (std::strcmp(argv[1], "rosenbrock") == 0) {
    rc = RunNLS(in, out, false);
  } else if (std::strcmp(argv[1], "himmelblau") == 0) {
    rc = RunNLS(in, out, true);
  }
  std::fclose(in);
  std::fclose(out);
  return rc;
}
