"""On-chip verification at REFERENCE tolerances (VERDICT round-1 item 3).

The CPU suite verifies reference-grade tolerances in f64; this script runs
the same gates ON THE REAL TPU and records what passes at which precision:

1. f64-on-TPU: the condensed-KKT oracle, the 1000-problem randomized QP sweep
   at kkt_tol 1e-12 (the suite's tol ladder 'pico', reference default 1e-9 at
   /root/reference/include/mini_opt/qp.hpp:141-146), and the
   Rosenbrock/Himmelblau convergence families at reference tolerances.
2. f32 (+ one iterative-refinement step on the KKT solve, kkt.py::ldlt_ir):
   the same sweep, recording the ACHIEVED kkt/accuracy distribution.

Prints one JSON line per experiment; results are recorded in STATUS.md.
Run only when the chip is otherwise idle (the tunnel serializes clients).
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def sweep_instances(B=1000, n=8, m=4, seed=42):
    from test_qp import _active_set_oracle, random_pd_matrix

    rng = np.random.default_rng(seed)
    Gs, cs, avs, aas, abs_, x_exp = [], [], [], [], [], []
    for _ in range(B):
        G = random_pd_matrix(rng, n, scale=2.0)
        root = rng.uniform(-20.0, 20.0, n)
        c = -G @ root
        v = np.sort(rng.permutation(n)[:m])
        scale = rng.uniform(0.1, 0.9, m)
        bound = root[v] * scale
        a = np.where(root[v] < 0, 1.0, -1.0)
        b = np.where(root[v] < 0, -bound, bound)
        Gs.append(G), cs.append(c), avs.append(v), aas.append(a), abs_.append(b)
        x_exp.append(_active_set_oracle(G, c, v, a, b))
    return (
        np.stack(Gs), np.stack(cs), np.stack(avs), np.stack(aas),
        np.stack(abs_), np.stack(x_exp),
    )


def run_qp_sweep(dtype, kkt_solver, kkt_tol, label):
    from mini_opt_tpu import (
        QP, InitialGuessMethod, QPInteriorPointParams, QPTerminationState,
        qp_ip_solve,
    )

    G, c, av, aa, ab, x_exp = sweep_instances()
    B, n = c.shape
    qp = QP(
        G=jnp.asarray(G, dtype), c=jnp.asarray(c, dtype),
        A_eq=jnp.zeros((B, 0, n), dtype), b_eq=jnp.zeros((B, 0), dtype),
        ineq_var=jnp.asarray(av, jnp.int32),
        ineq_a=jnp.asarray(aa, dtype), ineq_b=jnp.asarray(ab, dtype),
    )
    params = QPInteriorPointParams(
        max_iterations=30,
        termination_kkt_tol=kkt_tol,
        initial_guess_method=InitialGuessMethod.SOLVE_EQUALITY_CONSTRAINED,
        kkt_solver=kkt_solver,
        record_history=False,
        early_exit=False,
    )
    t0 = time.time()
    res = jax.jit(jax.vmap(lambda q: qp_ip_solve(q, params)))(qp)
    # Aggregate ON DEVICE; fetch scalars only.
    err = jnp.max(jnp.abs(res.x - jnp.asarray(x_exp, dtype)), axis=1)
    ok = res.termination_state == QPTerminationState.SATISFIED_KKT_TOL
    stats = jnp.stack(
        [
            jnp.mean(ok.astype(dtype)),
            jnp.mean((err < 5e-5).astype(dtype)),
            jnp.max(err),
            jnp.quantile(err, 0.5),
            jnp.quantile(err, 0.99),
        ]
    )
    sv = np.asarray(stats)
    dt = time.time() - t0
    emit(
        experiment=f"qp_sweep_{label}",
        backend=jax.default_backend(),
        dtype=str(jnp.dtype(dtype)),
        kkt_solver=kkt_solver,
        kkt_tol=kkt_tol,
        problems=int(B),
        converged_frac=round(float(sv[0]), 4),
        accuracy_5e5_frac=round(float(sv[1]), 4),
        err_max=float(sv[2]),
        err_median=float(sv[3]),
        err_p99=float(sv[4]),
        wall_s=round(dt, 1),
    )


def run_rosenbrock(dtype, kkt_solver, label):
    from mini_opt_tpu import make_residual
    from mini_opt_tpu.nonlinear import NLSParams, Problem, nls_solve
    from mini_opt_tpu.structs import termination_state_indicates_satisfied_tol

    def rosen(xy):
        return jnp.stack([10.0 * (xy[1] - xy[0] * xy[0]), 1.0 - xy[0]])

    problem = Problem(dimension=2, costs=(make_residual([0, 1], rosen, 2),))
    # Reference test config (nonlinear_test.cc:390-424 == the suite's
    # test_rosenbrock_unconstrained, which passes 9/9): 5 iterations, default
    # exit tolerances, solution (1, 1).
    params = NLSParams(
        max_iterations=5,
        max_qp_iterations=1,
        record_history=False,
        early_exit=False,
        kkt_solver=kkt_solver,
    )
    # The reference's 9 guesses (nonlinear_test.cc:403-423), which its test
    # asserts converge within 5 outer iterations.
    starts = jnp.asarray(
        [
            [-5.0, -3.0], [10.0, 8.0], [-20.0, 3.0], [0.0, -5.0], [4.0, 0.0],
            [100.0, 50.0], [-35.0, 40.0], [1000.0, -50.0], [0.8, -0.3],
        ],
        dtype,
    )
    t0 = time.time()
    res = jax.jit(jax.vmap(lambda x0: nls_solve(problem, params, x0)))(starts)
    xerr = jnp.max(jnp.abs(res.x - 1.0), axis=1)
    sat = termination_state_indicates_satisfied_tol(res.termination_state)
    stats = np.asarray(
        jnp.stack([jnp.mean(sat.astype(dtype)), jnp.max(xerr)])
    )
    emit(
        experiment=f"rosenbrock_{label}",
        backend=jax.default_backend(),
        dtype=str(jnp.dtype(dtype)),
        satisfied_frac=round(float(stats[0]), 4),
        x_err_max=float(stats[1]),
        wall_s=round(time.time() - t0, 1),
    )


def run_himmelblau(dtype, kkt_solver, label):
    from mini_opt_tpu import make_residual
    from mini_opt_tpu.nonlinear import NLSParams, Problem, nls_solve
    from mini_opt_tpu.qp import Var

    def himmel(xy):
        return jnp.stack(
            [xy[0] * xy[0] + xy[1] - 11.0, xy[0] + xy[1] * xy[1] - 7.0]
        )

    # Box-constrained grid of starts (nonlinear_test.cc:597-665): every start
    # must converge to one of the four roots to 5e-5.
    roots = jnp.asarray(
        [
            [3.0, 2.0],
            [-2.805118086953, 3.131312518250],
            [-3.779310253378, -3.283185991286],
            [3.584428340330, -1.848126526964],
        ],
        dtype,
    )
    problem = Problem(
        dimension=2,
        costs=(make_residual([0, 1], himmel, 2),),
        inequality_constraints=(
            Var(0) >= -5.0, Var(0) <= 5.0, Var(1) >= -5.0, Var(1) <= 5.0,
        ),
    )
    # The suite's HIMMELBLAU_PARAMS (tests/test_nonlinear.py), which pass the
    # full grid at 5e-5 -- relative + first-order exits, not absolute.
    params = NLSParams(
        max_iterations=20,
        max_qp_iterations=10,
        relative_exit_tol=1e-12,
        absolute_first_derivative_tol=1e-8,
        termination_kkt_tolerance=1e-6,
        record_history=False,
        early_exit=False,
        kkt_solver=kkt_solver,
    )
    g = np.linspace(-4.5, 4.5, 30)
    xs, ys = np.meshgrid(g, g)
    starts = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], 1), dtype)
    t0 = time.time()
    res = jax.jit(jax.vmap(lambda x0: nls_solve(problem, params, x0)))(starts)
    d_root = jnp.min(
        jnp.max(jnp.abs(res.x[:, None, :] - roots[None, :, :]), axis=2), axis=1
    )
    stats = np.asarray(
        jnp.stack(
            [
                jnp.mean((d_root < 5e-5).astype(dtype)),
                jnp.quantile(d_root, 0.99),
                jnp.max(d_root),
            ]
        )
    )
    emit(
        experiment=f"himmelblau_{label}",
        backend=jax.default_backend(),
        dtype=str(jnp.dtype(dtype)),
        starts=int(starts.shape[0]),
        root_5e5_frac=round(float(stats[0]), 4),
        d_root_p99=float(stats[1]),
        d_root_max=float(stats[2]),
        wall_s=round(time.time() - t0, 1),
    )


def run_cg_constrained(dtype, label):
    """The matrix-free CG constraint paths on-chip: (a) projected-CG equality
    (n=300 linear LS + 5 constraints vs the analytic KKT solution), (b)
    two-metric gradient projection box bounds (vs feasibility + projected-
    gradient optimality). Everything aggregates on device; scalars fetched."""
    import dataclasses

    from mini_opt_tpu import Var, make_residual
    from mini_opt_tpu.nonlinear import NLSParams, Problem, nls_solve

    rng = np.random.default_rng(12)
    n, m, k = 300, 450, 5
    A = rng.normal(0, 1.0, (m, n)) / np.sqrt(m)
    b = rng.normal(0, 1.0, m)
    C = rng.normal(0, 1.0, (k, n))
    d = rng.normal(0, 0.5, k)
    KKT = np.block([[A.T @ A, C.T], [C, np.zeros((k, k))]])
    x_star = np.linalg.solve(KKT, np.concatenate([A.T @ b, d]))[:n]

    Aj, bj, Cj, dj = (jnp.asarray(v, dtype) for v in (A, b, C, d))
    prob_eq = Problem(
        dimension=n,
        costs=(make_residual(list(range(n)), lambda p: Aj @ p - bj, m),),
        equality_constraints=(
            make_residual(list(range(n)), lambda p: Cj @ p - dj, k),
        ),
    )
    params = NLSParams(
        max_iterations=20,
        max_qp_iterations=1,
        absolute_exit_tol=1e-14,
        relative_exit_tol=1e-13,
        qp_solver="cg",
        cg_iterations=300,
        lambda_initial=1e-9,
        record_history=False,
        early_exit=False,
    )
    t0 = time.time()
    res = jax.jit(lambda x: nls_solve(prob_eq, params, x))(jnp.zeros((n,), dtype))
    stats = np.asarray(
        jnp.stack(
            [
                jnp.max(jnp.abs(res.x - jnp.asarray(x_star, dtype))),
                jnp.max(jnp.abs(Cj @ res.x - dj)),
            ]
        )
    )
    emit(
        experiment=f"cg_equality_{label}",
        backend=jax.default_backend(),
        dtype=str(jnp.dtype(dtype)),
        n=n,
        x_err_max=float(stats[0]),
        constraint_violation_max=float(stats[1]),
        wall_s=round(time.time() - t0, 1),
    )

    box = 0.1
    prob_box = Problem(
        dimension=n,
        costs=(make_residual(list(range(n)), lambda p: Aj @ p - bj, m),),
        inequality_constraints=tuple(
            c_ for i in range(n) for c_ in (Var(i) >= -box, Var(i) <= box)
        ),
    )
    params_box = dataclasses.replace(params, max_iterations=40)
    t0 = time.time()
    rb = jax.jit(lambda x: nls_solve(prob_box, params_box, x))(
        jnp.zeros((n,), dtype)
    )
    g = Aj.T @ (Aj @ rb.x - bj)
    up = rb.x >= box - 1e-9
    dn = rb.x <= -box + 1e-9
    pg = jnp.where(up & (g < 0), 0.0, jnp.where(dn & (g > 0), 0.0, g))
    stats = np.asarray(
        jnp.stack(
            [
                jnp.max(jnp.abs(rb.x)) - box,
                jnp.max(jnp.abs(pg)),
                jnp.sum((up | dn).astype(dtype)),
            ]
        )
    )
    emit(
        experiment=f"cg_box_{label}",
        backend=jax.default_backend(),
        dtype=str(jnp.dtype(dtype)),
        n=n,
        feasibility_excess=float(stats[0]),
        projected_grad_max=float(stats[1]),
        active_bounds=int(stats[2]),
        wall_s=round(time.time() - t0, 1),
    )


def run_mpc(dtype, label, B=64, periods=30, horizon=20):
    """MPC family on-chip (VERDICT round-2 item 8): a cart-pole fleet under
    receding-horizon control with the Riccati-structured KKT backend; gate =
    rollout stabilization fraction + actuation-bound satisfaction, plus the
    rollout-loop solve rate (a LOWER bound: the rollout is inherently
    sequential, timing includes the plant stepping)."""
    from mini_opt_tpu.models import mpc

    cp = mpc.CartPole()
    rng = np.random.default_rng(0)
    x_init = jnp.asarray(
        np.column_stack(
            [
                rng.uniform(-0.2, 0.2, B),
                rng.uniform(-0.2, 0.2, B),
                rng.uniform(-0.35, 0.35, B),
                rng.uniform(-0.2, 0.2, B),
            ]
        ),
        dtype,
    )
    params = mpc.default_mpc_params(dtype, early_exit=False, horizon=horizon)

    @jax.jit
    def fleet(x0):
        return mpc.mpc_rollout_batch(cp, x0, periods, horizon, 0.05, params=params)

    t0 = time.time()
    states, us, _, _ = fleet(x_init)
    states, us = np.asarray(states), np.asarray(us)
    compile_s = time.time() - t0
    t0 = time.time()
    states = np.asarray(fleet(x_init)[0])
    warm_s = time.time() - t0
    theta_final = np.abs(states[:, -1, 2])
    emit(
        experiment=f"mpc_riccati_{label}",
        backend=jax.default_backend(),
        dtype=str(jnp.dtype(dtype)),
        fleet=B,
        periods=periods,
        horizon=horizon,
        kkt_solver=params.kkt_solver,
        stabilized_frac=float(np.mean(theta_final < 0.05)),
        theta_final_max=float(theta_final.max()),
        u_max_violation=float(max(0.0, np.abs(us).max() - 10.0)),
        solve_rate_lower_bound_per_s=round(B * periods / warm_s, 1),
        wall_s=round(compile_s + warm_s, 1),
    )


def run_obstacle(dtype, label, B=256):
    """Slack-lifted nonlinear-inequality family on-chip: Rosenbrock on the
    unit disk from B random feasible/infeasible starts; gates = constraint
    satisfaction at f32 and distance to the classic optimum (0.7864, 0.6177).
    Ref: an explicit reference NON-feature (README.md:35-38), ineq.py."""
    from mini_opt_tpu import make_residual
    from mini_opt_tpu.ineq import with_nonlinear_inequalities
    from mini_opt_tpu.nonlinear import NLSParams, Problem, nls_solve

    sb = float(np.sqrt(100.0))  # python float: weak-typed, no f64 promotion
    rosen = make_residual(
        (0, 1),
        lambda xy: jnp.stack([1.0 - xy[0], sb * (xy[1] - xy[0] * xy[0])]),
        dim=2,
    )
    disk = make_residual((0, 1), lambda v: jnp.stack([1.0 - v @ v]), 1)
    aug = with_nonlinear_inequalities(
        Problem(dimension=2, costs=(rosen,)), (disk,)
    )
    params = aug.params(
        NLSParams(
            # 80 f32 iterations: wild starts land on the flat Rosenbrock
            # valley floor and crawl (CPU sweep: 40 iters leaves ~12% short,
            # 80 converges all but the ~5% basin-limited tail -- the same
            # class as the Himmelblau f32 0.994 row).
            max_iterations=80,
            max_qp_iterations=10,
            max_line_search_iterations=5,
            record_history=False,
            early_exit=False,
            kkt_solver="ldlt",
        )
    )
    rng = np.random.default_rng(3)
    # Mix of interior, near-boundary, and infeasible starts.
    starts = np.concatenate(
        [
            rng.uniform(-0.6, 0.6, (B // 2, 2)),
            rng.uniform(-2.0, 2.0, (B - B // 2, 2)),
        ]
    ).astype(np.float32)
    x0 = jax.vmap(aug.initial_guess)(jnp.asarray(starts, dtype))
    t0 = time.time()
    res = jax.jit(jax.vmap(lambda x: nls_solve(aug.problem, params, x)))(x0)
    xs = np.asarray(aug.extract(res.x))
    g = np.asarray(aug.constraint_values(res.x))[:, 0]
    d_opt = np.max(np.abs(xs - np.array([0.78641516, 0.61769831])), axis=1)
    emit(
        experiment=f"obstacle_slack_{label}",
        backend=jax.default_backend(),
        dtype=str(jnp.dtype(dtype)),
        starts=B,
        constraint_satisfied_frac=float(np.mean(g >= -1e-4)),
        g_min=float(g.min()),
        at_optimum_5e4_frac=float(np.mean(d_opt < 5e-4)),
        d_opt_p99=float(np.quantile(d_opt, 0.99)),
        wall_s=round(time.time() - t0, 1),
    )


def run_fused_spatial(dtype, label, B=8192, seeds=(0, 1, 2)):
    """Fused SPATIAL IK family accuracy on-chip (VERDICT round-3 item 5):
    effector-error percentiles + convergence fraction at the reference IK
    gate (1e-3, nonlinear_test.cc:939-958) across several seeds of the
    bench distribution, at the family's converged serving budget
    (12/2/2, STATUS round-2 study). The known irreducible chaotic tail of
    this distribution is ~0.14% (35/24576); the gate is 99.8%."""
    from mini_opt_tpu.models.ik import make_spatial_chain
    from mini_opt_tpu.ops.pallas_ik import fused_spatial_ik_solve_batch

    n = 3
    chain = make_spatial_chain(n, dtype=jnp.float64)
    fkv = jax.jit(jax.vmap(lambda t: chain.update(t).translation))
    errs = []
    t0 = time.time()
    for seed in seeds:
        rng = np.random.default_rng(seed)
        th_true = np.stack(
            [rng.uniform(-1.2, 1.2, B)]
            + [rng.uniform(0.25, 2.6, B) for _ in range(n - 1)],
            1,
        )
        targets = np.asarray(fkv(jnp.asarray(th_true)))
        x0 = th_true + rng.uniform(-0.25, 0.25, (B, n))
        x0[:, 1:] = np.clip(x0[:, 1:], 0.05, np.pi - 0.05)
        # The fused kernels are f32 serving kernels; this script's global
        # x64 mode leaks 64-bit constants into the Mosaic lowering (layout
        # bitwidth check fails) -- scope it off around the kernel call.
        with jax.enable_x64(False):
            out = np.asarray(
                fused_spatial_ik_solve_batch(
                    jnp.asarray(np.asarray(targets, np.float32)),
                    jnp.asarray(np.asarray(x0, np.float32)),
                    max_iterations=12, qp_iterations=2, ls_iterations=2,
                )
            )
        final = np.asarray(fkv(jnp.asarray(out, jnp.float64)))
        errs.append(np.abs(final - targets).max(axis=1))
    err = np.concatenate(errs)
    emit(
        experiment=f"fused_spatial_{label}",
        backend=jax.default_backend(),
        dtype=str(jnp.dtype(dtype)),
        instances=len(err),
        budget=[12, 2, 2],
        converged_frac_1e3=float(np.mean(err < 1e-3)),
        err_median=float(np.median(err)),
        err_p99=float(np.quantile(err, 0.99)),
        err_max=float(err.max()),
        gate_pass=bool(np.mean(err < 1e-3) >= 0.998),
        wall_s=round(time.time() - t0, 1),
    )


def run_fused_pose_graph(dtype, label, B=8192, n_poses=4):
    """Fused SE(2) pose-graph family accuracy on-chip (VERDICT round-3
    item 5): terminal cost distribution of B noisy N-pose ring graphs
    through the BlockResidual-compiled kernel vs the SAME instances through
    the general path (vmapped nls_solve, same chip, f64) -- convergence
    fraction at the 0.02-noise floor plus a direct per-instance cost-parity
    gate against the general solutions."""
    from mini_opt_tpu import family_from_problem
    from mini_opt_tpu.models.pose_graph import (
        make_pose_graph_problem,
        scalar_pose_graph_builder,
    )
    from mini_opt_tpu.nonlinear import NLSParams, nls_solve
    from mini_opt_tpu.ops.pallas_ik import fused_solve_batch

    N = n_poses
    edges = tuple((i, (i + 1) % N) for i in range(N))
    turn = 2 * np.pi / N
    meas = np.tile([1.0, 0.0, turn], (N, 1))
    th = np.arange(N) * turn
    pts = np.zeros((N, 2))
    for i in range(1, N):
        pts[i] = pts[i - 1] + [np.cos(th[i - 1]), np.sin(th[i - 1])]
    truth = np.column_stack([pts, np.where(th > np.pi, th - 2 * np.pi, th)])
    builder = scalar_pose_graph_builder(N, edges)
    fam = family_from_problem(builder, data_rows=3 * N)
    rng = np.random.default_rng(0)
    data = (meas.ravel() + rng.normal(0, 0.02, (B, 3 * N))).astype(np.float32)
    x0 = (truth.ravel() + rng.normal(0, 0.15, (B, 3 * N))).astype(np.float32)

    t0 = time.time()
    # f32 serving kernel: scope the script's global x64 off (see
    # run_fused_spatial).
    with jax.enable_x64(False):
        _, state = fused_solve_batch(
            fam, jnp.asarray(data), jnp.asarray(x0),
            max_iterations=6, qp_iterations=1, ls_iterations=2,
            return_state=True,
        )
        f_fused = np.asarray(state[:, 0])

    # General-path twin on the SAME instances (subset: the general path is
    # ~50x slower per instance; 1024 is plenty for a parity distribution).
    Bg = min(B, 1024)
    gen_params = NLSParams(
        max_iterations=8, max_qp_iterations=1, max_line_search_iterations=2,
        record_history=False, early_exit=False, kkt_solver="ldlt",
    )

    def gen_one(d, x):
        prob = make_pose_graph_problem(
            N, tuple(edges), d.reshape(N, 3), jnp.ones((N,), jnp.float64),
            anchor_weight=100.0,
        )
        res = nls_solve(prob, gen_params, x)
        return res.errors.f

    f_gen = np.asarray(
        jax.jit(jax.vmap(gen_one))(
            jnp.asarray(data[:Bg], jnp.float64), jnp.asarray(x0[:Bg], jnp.float64)
        )
    )
    delta = f_fused[:Bg] - f_gen  # >0 = fused worse than general
    emit(
        experiment=f"fused_pose_graph_n{N}_{label}",
        backend=jax.default_backend(),
        dtype=str(jnp.dtype(dtype)),
        instances=B,
        poses=N,
        budget=[6, 1, 2],
        converged_frac_1e2=float(np.mean(f_fused < 1e-2)),
        cost_median=float(np.median(f_fused)),
        cost_p99=float(np.quantile(f_fused, 0.99)),
        parity_instances=Bg,
        cost_delta_vs_general_p99=float(np.quantile(delta, 0.99)),
        cost_delta_vs_general_max=float(delta.max()),
        gate_pass=bool(
            np.mean(f_fused < 1e-2) == 1.0
            and float(np.quantile(delta, 0.99)) < 1e-3
        ),
        wall_s=round(time.time() - t0, 1),
    )


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--only",
        default="all",
        choices=["all", "qp", "nls", "cg", "mpc", "obstacle", "fused_spatial", "fused_pose_graph"],
        help="subset: qp sweeps / nls families / cg paths / mpc / obstacle",
    )
    args = ap.parse_args()
    log(f"backend={jax.default_backend()}")
    # First fetch behind a watchdog (CLAUDE.md: cold tunnel transfers can
    # take minutes; never leave one silent on the critical path).
    import threading

    out = {}
    t = threading.Thread(
        target=lambda: out.setdefault("v", float(np.asarray(jnp.zeros(())))),
        daemon=True,
    )
    t0 = time.time()
    t.start()
    while t.is_alive() and time.time() - t0 < 900:
        t.join(30)
        if t.is_alive():
            log(f"cold-tunnel warmup fetch pending ({time.time()-t0:.0f}s)...")
    if args.only in ("all", "qp"):
        # --- f64 on TPU at reference tolerances ----------------------------
        run_qp_sweep(jnp.float64, "ldlt", 1e-12, "f64")
        # --- f32 + iterative refinement ------------------------------------
        run_qp_sweep(jnp.float32, "ldlt_ir", 1e-6, "f32_ir")
        run_qp_sweep(jnp.float32, "ldlt", 1e-6, "f32")
    if args.only in ("all", "nls"):
        run_rosenbrock(jnp.float64, "ldlt", "f64")
        run_himmelblau(jnp.float64, "ldlt", "f64")
        run_himmelblau(jnp.float32, "ldlt_ir", "f32_ir")
    if args.only in ("all", "cg"):
        run_cg_constrained(jnp.float64, "f64")
    if args.only in ("all", "mpc"):
        run_mpc(jnp.float32, "f32")
    if args.only in ("all", "obstacle"):
        run_obstacle(jnp.float32, "f32")
    if args.only in ("all", "fused_spatial"):
        run_fused_spatial(jnp.float32, "f32")
    if args.only in ("all", "fused_pose_graph"):
        run_fused_pose_graph(jnp.float32, "f32", n_poses=4)
        run_fused_pose_graph(jnp.float32, "f32", n_poses=8)
    return 0


if __name__ == "__main__":
    sys.exit(main())
