"""Fused blocked MPC kernel (ops/pallas_mpc.py) vs the general path.

The blocked tier's contract (VERDICT round-3 item 1): the whole cart-pole
MPC period -- stagewise RK4 linearization, register-Riccati interior point
on the actuation bounds, L1-merit Armijo line search, lambda machine --
fused into one kernel, with dense-vs-blocked solutions pinned.

Oracle chain (each link verified separately):
  * one-outer-iteration step == linearize_and_fill_qp + qp_ip_solve
    (Mehrotra, SOLVE_EQUALITY_CONSTRAINED) to 1e-12: the inner QP including
    the register Riccati solve is exactly the general interior point;
  * full fixed-trip solve == nls_solve at matched budgets to 1e-6 (the
    general path must run PREDICTOR_CORRECTOR -- the kernel implements the
    reference's mu_aff form, qp.cc:519-537, with the carried mu standing in
    for s^T z / M);
  * Pallas (interpret) backend == XLA backend on identical register math;
  * fori_loop form == unrolled form (the compile-size lever is semantics-
    free).

Tests run at horizon 3 because the XLA-CPU compile of the stage-unrolled
body is superlinear in T (measured: T=4 body ~40 s; T=8 >8 min); the math
is T-generic and the chip runs T=20 (scripts/bench_extras.py).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mini_opt_tpu.models import mpc
from mini_opt_tpu.nonlinear import linearize_and_fill_qp
from mini_opt_tpu.qp import (
    InitialGuessMethod,
    QPInteriorPointParams,
    qp_ip_solve,
)
from mini_opt_tpu.structs import BarrierStrategy, NLSTerminationState
from mini_opt_tpu.ops.pallas_ik import fused_termination_status
from mini_opt_tpu.ops.pallas_mpc import (
    cartpole_mpc_family,
    fused_mpc_solve_batch,
)

T, DT = 3, 0.05
CP = mpc.CartPole()
FAM = cartpole_mpc_family(T, DT)


def _instances(B, key=0, spread=0.4, dtype=jnp.float64):
    x0s = jax.random.uniform(
        jax.random.PRNGKey(key), (B, 4), minval=-spread, maxval=spread
    ).astype(dtype)
    z0s = jax.vmap(lambda x: mpc.initial_guess(CP, x, T, DT))(x0s)
    return x0s, z0s


def _general_params(it, qp, ls):
    params = mpc.default_mpc_params(jnp.float64, early_exit=False, horizon=T)
    return dataclasses.replace(
        params,
        max_iterations=it,
        max_qp_iterations=qp,
        max_line_search_iterations=ls,
        qp_barrier_strategy=BarrierStrategy.PREDICTOR_CORRECTOR,
    )


def test_qp_step_matches_general_interior_point():
    """One outer iteration at ls=0 (alpha=1 accepted on this distribution):
    z - z0 IS the inner-QP solution, pinned against qp_ip_solve on the same
    linearization -- the dense-vs-blocked oracle, through the full Mehrotra
    loop at 1..3 iterations."""
    x0s, z0s = _instances(4)
    for qp_iters in (1, 2, 3):
        z_f = fused_mpc_solve_batch(
            FAM, x0s, z0s, max_iterations=1, qp_iterations=qp_iters,
            ls_iterations=0, backend="xla",
        )
        du_fused = z_f - z0s

        def qp_step(x0, z0):
            qp, _ = linearize_and_fill_qp(
                mpc.make_cartpole_mpc_problem(CP, x0, T, DT), z0, 1e-6
            )
            params = QPInteriorPointParams(
                max_iterations=qp_iters,
                sigma=0.1,
                barrier_strategy=BarrierStrategy.PREDICTOR_CORRECTOR,
                initial_guess_method=InitialGuessMethod.SOLVE_EQUALITY_CONSTRAINED,
                termination_kkt_tol=1e-300,
                early_exit=False,
            )
            return qp_ip_solve(qp, params).x

        dx_gen = jax.jit(jax.vmap(qp_step))(x0s, z0s)
        np.testing.assert_allclose(
            np.asarray(du_fused), np.asarray(dx_gen), atol=1e-11,
            err_msg=f"qp_iters={qp_iters}",
        )


def test_full_solve_matches_general_path():
    """Whole fixed-trip solves against nls_solve at matched budgets."""
    x0s, z0s = _instances(8)
    for budget, atol in (((2, 2, 1), 1e-10), ((6, 3, 2), 2e-6)):
        it, qp, ls = budget
        z_f = fused_mpc_solve_batch(
            FAM, x0s, z0s, max_iterations=it, qp_iterations=qp,
            ls_iterations=ls, backend="xla",
        )
        params = _general_params(it, qp, ls)

        def gen(x0, z0):
            return mpc.nls_solve(
                mpc.make_cartpole_mpc_problem(CP, x0, T, DT), params, z0
            ).x

        xg = jax.jit(jax.vmap(gen))(x0s, z0s)
        np.testing.assert_allclose(
            np.asarray(z_f), np.asarray(xg), atol=atol, err_msg=str(budget)
        )


def test_converges_and_feasible():
    """At a verification budget every lane reaches machine-level defect
    feasibility and the best-merit return holds (f finite, flags clean)."""
    x0s, z0s = _instances(8, key=2)
    z, state = fused_mpc_solve_batch(
        FAM, x0s, z0s, max_iterations=8, qp_iterations=3, ls_iterations=2,
        return_state=True, backend="xla",
    )
    st = np.asarray(state)
    assert np.isfinite(np.asarray(z)).all()
    assert (st[:, 1] < 1e-10).all(), st[:, 1]  # |defects|_1
    assert (st[:, 2] == 0.0).all(), st[:, 2]  # no singular/lambda flags
    status = np.asarray(fused_termination_status(state, f_tol=np.inf, eq_tol=1e-10))
    assert (status == NLSTerminationState.SATISFIED_ABSOLUTE_TOL).all()


def test_pallas_backend_matches_xla():
    """Same register program through the Pallas (interpret) and XLA
    schedulers, f32 serving precision."""
    x0s, z0s = _instances(32, key=1, dtype=jnp.float32)
    kw = dict(max_iterations=2, qp_iterations=2, ls_iterations=1, return_state=True)
    z_p, st_p = fused_mpc_solve_batch(FAM, x0s, z0s, backend="pallas", **kw)
    z_x, st_x = fused_mpc_solve_batch(FAM, x0s, z0s, backend="xla", **kw)
    np.testing.assert_allclose(np.asarray(z_p), np.asarray(z_x), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(st_p)[:, 1:], np.asarray(st_x)[:, 1:], atol=2e-4
    )


def test_unrolled_matches_fori_loop():
    """The compile-size lever (fori_loop vs Python unroll) is semantics-free;
    also exercises debug_history (unrolled-only channel layout). Budget
    (1, 1, 1): the UNROLLED program's XLA-CPU compile is superlinear in
    (budget x stage) size, and one trip already distinguishes the two forms
    (fori carry packing/unpacking vs straight-line)."""
    x0s, z0s = _instances(4, key=3)
    kw = dict(max_iterations=1, qp_iterations=1, ls_iterations=1, backend="xla")
    z_fori = fused_mpc_solve_batch(FAM, x0s, z0s, unroll=False, **kw)
    z_unroll, hist = fused_mpc_solve_batch(
        FAM, x0s, z0s, unroll=True, debug_history=True, **kw
    )
    np.testing.assert_allclose(np.asarray(z_fori), np.asarray(z_unroll), atol=1e-13)
    h = np.asarray(hist)
    assert h.shape == (4, 1, 7)
    assert np.isfinite(h).all()
    # Channels: f, eq, penalty, lam, dd, accepted, alpha. Warm starts accept
    # a descent step (dd < 0) in the first iteration on this distribution.
    assert (h[:, 0, 5] == 1.0).all(), h[:, 0, 5]
    assert (h[:, 0, 4] < 0).all(), h[:, 0, 4]
    assert (h[:, 0, 6] > 0).all(), h[:, 0, 6]


def test_servo_kernel_matches_manual_rollout():
    """The whole-servo kernel (solve + plant step + warm-start shift, K
    periods in one launch) must equal the manual composition of
    fused_mpc_solve_batch + rk4_step + shift_warm_start period by period."""
    from mini_opt_tpu.ops.pallas_mpc import fused_mpc_servo_batch

    x0s, z0s = _instances(4, key=5)
    periods = 2
    xf, zf, stats = fused_mpc_servo_batch(
        FAM, x0s, z0s, periods, max_iterations=1, qp_iterations=1,
        ls_iterations=1, backend="xla",
    )

    x, z = x0s, z0s
    max_u = jnp.zeros((4,), x0s.dtype)
    for _ in range(periods):
        z = fused_mpc_solve_batch(
            FAM, x, z, max_iterations=1, qp_iterations=1, ls_iterations=1,
            backend="xla",
        )
        u0 = z[:, 0]
        max_u = jnp.maximum(max_u, jnp.abs(u0))
        x = jax.vmap(lambda xi, ui: mpc.rk4_step(CP, xi, ui, DT))(x, u0)
        z = jax.vmap(lambda zi: mpc.shift_warm_start(CP, zi, T, DT))(z)
    np.testing.assert_allclose(np.asarray(xf), np.asarray(x), atol=1e-12)
    np.testing.assert_allclose(np.asarray(zf), np.asarray(z), atol=1e-12)
    np.testing.assert_allclose(np.asarray(stats[:, 3]), np.asarray(max_u), atol=1e-12)


def test_nonfinite_lane_contained_and_flagged():
    """A poisoned lane (NaN plant state) must not contaminate neighbors and
    must surface as MAX_LAMBDA through fused_termination_status."""
    x0s, z0s = _instances(8, key=4)
    x0s = x0s.at[3].set(jnp.nan)
    # Budget (2, 2, 1) shares the jit specialization with
    # test_full_solve_matches_general_path (compile economy).
    z, state = fused_mpc_solve_batch(
        FAM, x0s, z0s, max_iterations=2, qp_iterations=2, ls_iterations=1,
        return_state=True, backend="xla",
    )
    status = np.asarray(fused_termination_status(state, f_tol=np.inf, eq_tol=1e-8))
    ok = np.ones(8, bool)
    ok[3] = False
    assert np.isfinite(np.asarray(z)[ok]).all()
    # The poisoned lane surfaces as a failure state: QP_INDEFINITE (the
    # non-finite step trips the sticky factorization flag, the same channel
    # a singular LDLT uses) or MAX_LAMBDA (never produced a valid merit).
    assert status[3] in (
        NLSTerminationState.QP_INDEFINITE,
        NLSTerminationState.MAX_LAMBDA,
    ), status[3]
    # Healthy lanes are not dragged to failure states by lane 3.
    assert (
        (status[ok] != NLSTerminationState.MAX_LAMBDA)
        & (status[ok] != NLSTerminationState.QP_INDEFINITE)
    ).all(), status


def test_serving_budget_regression_gate():
    """Standing distribution gate for the blocked MPC tier (round-4 VERDICT
    item 7; nonlinear_test.cc:350-373 SummarizeCounts semantics): on a FIXED
    seeded plant distribution at the warm serving budget (2, 2, 1), the
    per-lane terminal stats must stay inside the recorded band -- a solver
    or distribution drift trips this before it reaches the chip."""
    x0s, z0s = _instances(32, key=6)
    z, state = fused_mpc_solve_batch(
        FAM, x0s, z0s, max_iterations=2, qp_iterations=2, ls_iterations=1,
        return_state=True, backend="xla",
    )
    st = np.asarray(state)
    # Recorded band (f64, T=3, budget 2/2/1, key 6, B=32): measured defect
    # max 2.6e-6 / median well below 1e-7 at the lean budget from cold
    # constant-state starts; zero failure flags; bounded cost.
    assert (st[:, 1] < 1e-5).all(), st[:, 1].max()
    assert np.median(st[:, 1]) < 1e-6, np.median(st[:, 1])
    assert (st[:, 2] == 0.0).all()
    assert np.median(st[:, 0]) < 4.0 and st[:, 0].max() < 20.0, (
        np.median(st[:, 0]), st[:, 0].max(),
    )


@pytest.mark.slow
def test_full_solve_matches_general_path_T8():
    """Step-level parity at a MID/PRODUCTION horizon (round-4 VERDICT item
    6): the fori-loop kernel form keeps program size budget-independent, so
    T = 8 (dim 40, 32 defect rows) is compilable on XLA-CPU -- whole
    fixed-trip solves against nls_solve at a matched budget.  ~10 min of
    compile; the chip serves T = 20 with the same T-generic stage code."""
    T8 = 8
    fam8 = cartpole_mpc_family(T8, DT)
    x0s = jax.random.uniform(
        jax.random.PRNGKey(0), (4, 4), minval=-0.3, maxval=0.3
    ).astype(jnp.float64)
    z0s = jax.vmap(lambda x: mpc.initial_guess(CP, x, T8, DT))(x0s)
    it, qp, ls = 2, 2, 1
    z_f = fused_mpc_solve_batch(
        fam8, x0s, z0s, max_iterations=it, qp_iterations=qp,
        ls_iterations=ls, backend="xla",
    )
    params = dataclasses.replace(
        mpc.default_mpc_params(jnp.float64, early_exit=False, horizon=T8),
        max_iterations=it,
        max_qp_iterations=qp,
        max_line_search_iterations=ls,
        qp_barrier_strategy=BarrierStrategy.PREDICTOR_CORRECTOR,
    )

    def gen(x0, z0):
        return mpc.nls_solve(
            mpc.make_cartpole_mpc_problem(CP, x0, T8, DT), params, z0
        ).x

    xg = jax.jit(jax.vmap(gen))(x0s, z0s)
    np.testing.assert_allclose(np.asarray(z_f), np.asarray(xg), atol=1e-9)
