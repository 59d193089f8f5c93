// Benchmark harness driving the ACTUAL reference library (gareth-cross/
// mini_opt, compiled unmodified from /root/reference/source against the
// Eigen and fmt headers bundled with this image's tensorflow/torch wheels).
//
// BASELINE.md requires speed claims to be measured against a locally built
// mini_opt on the same problems (reference README.md:14-23); the submodules
// are not checked out here, so CMake cannot run -- but the library itself
// only needs Eigen + fmt, both available. This harness is OUR code: it
// implements bench.py's exact workload (planar 2-link IK, soft y cost, hard
// x equality, [0, pi] elbow limits, mod-pi retraction, same instance
// distribution and iteration budgets) against the reference API
// (nonlinear.hpp:33-157), single-threaded like the reference.
//
// Build: native/build_reference_bench.sh. Run: bench_reference [B] [iters
// qp_iters ls_iters]. Prints one JSON line: {"metric":
// "reference_cpu_ik_solves_per_s", ...}.

#include <chrono>
#include <cmath>
#include <cstdio>
#include <random>
#include <vector>

#include <Eigen/Dense>

#include "mini_opt/nonlinear.hpp"
#include "mini_opt/qp.hpp"
#include "mini_opt/residual.hpp"

namespace {

constexpr double kLink = 0.4;
constexpr double kPi = 3.14159265358979323846;

double ModPi(double a) { return a - 2.0 * kPi * std::floor((a + kPi) / (2.0 * kPi)); }

struct Instance {
  double tx, ty;
  double th0, th1;
};

// bench.py make_instances: reachable targets (radius 0.55-0.95 of full
// reach, angle 0.25-1.25) with warm starts = analytic IK solution + noise.
std::vector<Instance> MakeInstances(int b, unsigned seed) {
  std::mt19937_64 rng(seed);
  std::uniform_real_distribution<double> u01(0.0, 1.0);
  std::vector<Instance> out;
  out.reserve(b);
  for (int i = 0; i < b; ++i) {
    const double radius = (0.55 + 0.40 * u01(rng)) * 2 * kLink;
    const double angle = 0.25 + 1.00 * u01(rng);
    const double tx = radius * std::cos(angle);
    const double ty = radius * std::sin(angle);
    const double r2 = tx * tx + ty * ty;
    const double c1 =
        std::min(1.0, std::max(-1.0, (r2 - 2 * kLink * kLink) / (2 * kLink * kLink)));
    const double th1 = std::acos(c1);
    const double th0 = std::atan2(ty, tx) -
                       std::atan2(kLink * std::sin(th1), kLink + kLink * std::cos(th1));
    double g0 = th0 + (u01(rng) - 0.5) * 0.6;
    double g1 = th1 + (u01(rng) - 0.5) * 0.6;
    g1 = std::min(kPi - 0.05, std::max(0.05, g1));
    out.push_back({tx, ty, g0, g1});
  }
  return out;
}

}  // namespace

int main(int argc, char** argv) {
  using Eigen::Matrix;
  using Eigen::VectorXd;
  using namespace mini_opt;

  const int B = argc > 1 ? std::atoi(argv[1]) : 8192;
  ConstrainedNonlinearLeastSquares::Params p{};
  // bench.py's reference-style budget (10/6/2); override via argv.
  p.max_iterations = argc > 4 ? std::atoi(argv[2]) : 10;
  p.max_qp_iterations = argc > 4 ? std::atoi(argv[3]) : 6;
  p.max_line_search_iterations = argc > 4 ? std::atoi(argv[4]) : 2;
  // Fixed-budget serving semantics (tolerances effectively off), matching
  // the TPU kernels' fixed-trip configuration and bench.py.
  p.relative_exit_tol = 0.0;
  p.absolute_exit_tol = 1.0e-30;
  p.absolute_first_derivative_tol = 1.0e-12;
  p.termination_kkt_tolerance = 1.0e-12;
  p.equality_penalty_initial = 0.01;
  p.line_search_strategy = LineSearchStrategy::ARMIJO_BACKTRACK;
  p.armijo_search_tau = 0.5;
  p.lambda_initial = 0.001;
  p.lambda_failure_init = 0.001;
  p.min_lambda = 1.0e-9;

  double tx = 0.0, ty = 0.0;  // mutated per instance; residuals close over these

  // Planar 2-link FK with analytic Jacobians (the same closed form as
  // bench.py's parity check; no chain machinery needed for n=2).
  auto y_res = [&](const VectorXd& q,
                   Matrix<double, 1, Eigen::Dynamic>* const J) -> Matrix<double, 1, 1> {
    const double p1 = q[0], p2 = q[0] + q[1];
    if (J) {
      J->resize(1, 2);
      (*J)(0, 0) = kLink * (std::cos(p1) + std::cos(p2));
      (*J)(0, 1) = kLink * std::cos(p2);
    }
    return Matrix<double, 1, 1>{kLink * (std::sin(p1) + std::sin(p2)) - ty};
  };
  auto x_eq = [&](const VectorXd& q,
                  Matrix<double, 1, Eigen::Dynamic>* const J) -> Matrix<double, 1, 1> {
    const double p1 = q[0], p2 = q[0] + q[1];
    if (J) {
      J->resize(1, 2);
      (*J)(0, 0) = -kLink * (std::sin(p1) + std::sin(p2));
      (*J)(0, 1) = -kLink * std::sin(p2);
    }
    return Matrix<double, 1, 1>{kLink * (std::cos(p1) + std::cos(p2)) - tx};
  };

  Problem problem{};
  problem.dimension = 2;
  problem.costs.push_back(MakeResidual<1, Eigen::Dynamic>({0, 1}, y_res));
  problem.equality_constraints.push_back(MakeResidual<1, Eigen::Dynamic>({0, 1}, x_eq));
  problem.inequality_constraints.push_back(Var(1) >= 0.0);
  problem.inequality_constraints.push_back(Var(1) <= kPi);

  ConstrainedNonlinearLeastSquares nls(
      &problem, [](Eigen::VectorXd& x, const ConstVectorBlock& dx, const double alpha) {
        for (int i = 0; i < x.rows(); ++i) {
          x[i] = ModPi(x[i] + dx[i] * alpha);
        }
      });

  const auto instances = MakeInstances(B, 0);

  // Warmup pass (allocations, page faults), then the timed pass.
  for (int pass = 0; pass < 2; ++pass) {
    int converged = 0;
    const auto t0 = std::chrono::steady_clock::now();
    for (const auto& inst : instances) {
      tx = inst.tx;
      ty = inst.ty;
      (void)nls.Solve(p, Eigen::Vector2d(inst.th0, inst.th1));
      const VectorXd& q = nls.variables();
      const double px = kLink * (std::cos(q[0]) + std::cos(q[0] + q[1]));
      const double py = kLink * (std::sin(q[0]) + std::sin(q[0] + q[1]));
      if (std::max(std::abs(px - inst.tx), std::abs(py - inst.ty)) < 1e-3) {
        ++converged;
      }
    }
    const double dt =
        std::chrono::duration<double>(std::chrono::steady_clock::now() - t0).count();
    if (pass == 1) {
      std::printf(
          "{\"metric\": \"reference_cpu_ik_solves_per_s\", \"value\": %.1f, "
          "\"unit\": \"solves/s\", \"batch\": %d, \"iters\": [%d, %d, %d], "
          "\"parity\": %.4f, \"wall_s\": %.3f, \"threads\": 1}\n",
          B / dt, B, p.max_iterations, p.max_qp_iterations,
          p.max_line_search_iterations, static_cast<double>(converged) / B, dt);
    }
  }
  return 0;
}
