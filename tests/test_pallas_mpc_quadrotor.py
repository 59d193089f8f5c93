"""The generalized blocked MPC kernel on a SECOND plant (round-4 VERDICT
item 4): planar quadrotor, nx = 6, nu = 2, asymmetric bounds [0, u_max] --
none of cart-pole's dimensions or structure.  Same oracle chain as
tests/test_pallas_mpc.py: inner-QP step vs qp_ip_solve, full solve vs
nls_solve on the generic transcription (models/mpc.py::
make_family_mpc_problem), Pallas-vs-XLA backends, servo composition.

Horizon 3 on CPU for the same compile-superlinearity reason (the chip runs
T=20; scripts/bench_extras.py --only mpc_quadrotor measures it).
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
    fused_mpc_solve_batch,
    quadrotor_mpc_family,
)

T, DT = 3, 0.05
FAM = quadrotor_mpc_family(T, DT)


def _instances(B, key=0, spread=0.3, dtype=jnp.float64):
    x0s = jax.random.uniform(
        jax.random.PRNGKey(key), (B, FAM.nx), minval=-spread, maxval=spread
    ).astype(dtype)
    z0s = jax.vmap(lambda x: mpc.family_initial_guess(FAM, x))(x0s)
    return x0s, z0s


def _general_params(it, qp, ls):
    # Dense "auto" KKT (the Riccati NAME backend is T/NX/NU-specific to
    # cart-pole's riccati:T:4:1 string; the generic family oracle runs dense).
    params = mpc.default_mpc_params(jnp.float64, early_exit=False)
    return dataclasses.replace(
        params,
        max_iterations=it,
        max_qp_iterations=qp,
        max_line_search_iterations=ls,
        qp_barrier_strategy=BarrierStrategy.PREDICTOR_CORRECTOR,
    )


@pytest.mark.slow
def test_quadrotor_qp_step_matches_general_interior_point():
    """One outer iteration at ls=0: the nu=2 register-Riccati Mehrotra inner
    QP (dense F blocks through the unrolled LDL^T) == qp_ip_solve on the
    same linearization -- the dense-vs-blocked oracle for vector controls."""
    x0s, z0s = _instances(4)
    for qp_iters in (1, 3):
        z_f = fused_mpc_solve_batch(
            FAM, x0s, z0s, max_iterations=1, qp_iterations=qp_iters,
            ls_iterations=0, backend="xla",
        )
        du_fused = z_f - z0s

        def qp_step(x0, z0):
            qp, _ = linearize_and_fill_qp(
                mpc.make_family_mpc_problem(FAM, x0), z0, 1e-6
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
            np.asarray(du_fused), np.asarray(dx_gen), atol=1e-10,
            err_msg=f"qp_iters={qp_iters}",
        )


@pytest.mark.slow
def test_quadrotor_full_solve_matches_general_path():
    """Whole fixed-trip solves against nls_solve on the generic
    transcription at matched budgets."""
    x0s, z0s = _instances(6)
    for budget, atol in (((2, 2, 1), 1e-9), ((5, 3, 2), 5e-6)):
        it, qp, ls = budget
        z_f = fused_mpc_solve_batch(
            FAM, x0s, z0s, max_iterations=it, qp_iterations=qp,
            ls_iterations=ls, backend="xla",
        )
        params = _general_params(it, qp, ls)

        def gen(x0, z0):
            return mpc.nls_solve(
                mpc.make_family_mpc_problem(FAM, x0), params, z0
            ).x

        xg = jax.jit(jax.vmap(gen))(x0s, z0s)
        np.testing.assert_allclose(
            np.asarray(z_f), np.asarray(xg), atol=atol, err_msg=str(budget)
        )


def test_quadrotor_converges_feasible_and_bounded():
    """Verification budget: defect feasibility, clean flags, and the
    ASYMMETRIC thrust bounds 0 <= u <= u_max respected."""
    x0s, z0s = _instances(6, key=2)
    z, state = fused_mpc_solve_batch(
        FAM, x0s, z0s, max_iterations=8, qp_iterations=3, ls_iterations=2,
        return_state=True, backend="xla",
    )
    z = np.asarray(z)
    st = np.asarray(state)
    assert np.isfinite(z).all()
    assert (st[:, 1] < 1e-9).all(), st[:, 1]
    assert (st[:, 2] == 0.0).all(), st[:, 2]
    u = z[:, : T * FAM.nu]
    assert (u >= -1e-9).all() and (u <= FAM.u_max[0] + 1e-9).all()
    status = np.asarray(
        fused_termination_status(state, f_tol=np.inf, eq_tol=1e-9)
    )
    assert (status == NLSTerminationState.SATISFIED_ABSOLUTE_TOL).all()


def test_quadrotor_pallas_backend_matches_xla():
    x0s, z0s = _instances(32, key=1, dtype=jnp.float32)
    kw = dict(
        max_iterations=2, qp_iterations=2, ls_iterations=1, return_state=True
    )
    z_p, st_p = fused_mpc_solve_batch(FAM, x0s, z0s, backend="pallas", **kw)
    z_x, st_x = fused_mpc_solve_batch(FAM, x0s, z0s, backend="xla", **kw)
    np.testing.assert_allclose(np.asarray(z_p), np.asarray(z_x), atol=2e-4)


@pytest.mark.slow
def test_quadrotor_servo_matches_manual_rollout():
    """Servo kernel (solve + plant step + shift per period, one launch) ==
    manual composition, with the nu=2 u_0 applied and the warm start
    shifted blockwise."""
    from mini_opt_tpu.ops.pallas_mpc import fused_mpc_servo_batch

    x0s, z0s = _instances(4, key=5)
    periods = 2
    nu, nx = FAM.nu, FAM.nx
    xf, zf, stats = fused_mpc_servo_batch(
        FAM, x0s, z0s, periods, max_iterations=1, qp_iterations=1,
        ls_iterations=1, backend="xla",
    )

    x, z = x0s, z0s
    for _ in range(periods):
        z = fused_mpc_solve_batch(
            FAM, x, z, max_iterations=1, qp_iterations=1, ls_iterations=1,
            backend="xla",
        )
        u0 = z[:, :nu]
        x = jax.vmap(lambda xi, ui: mpc.family_rk4_step(FAM, xi, ui))(x, u0)
        # shift: u_t <- u_{t+1} (last repeated), x_t <- x_{t+1}, terminal
        # integrated with the repeated last control.
        u_blk = z[:, : T * nu].reshape(-1, T, nu)
        x_blk = z[:, T * nu :].reshape(-1, T, nx)
        u_next = jnp.concatenate([u_blk[:, 1:], u_blk[:, -1:]], axis=1)
        x_term = jax.vmap(
            lambda xr, ur: mpc.family_rk4_step(FAM, xr, ur)
        )(x_blk[:, -1], u_next[:, -1])
        x_next_blk = jnp.concatenate(
            [x_blk[:, 1:], x_term[:, None, :]], axis=1
        )
        z = jnp.concatenate(
            [u_next.reshape(-1, T * nu), x_next_blk.reshape(-1, T * nx)],
            axis=1,
        )
    np.testing.assert_allclose(np.asarray(xf), np.asarray(x), atol=1e-12)
    np.testing.assert_allclose(np.asarray(zf), np.asarray(z), atol=1e-12)


@pytest.mark.slow
def test_quadrotor_stabilizes_hover():
    """End-to-end control sanity: from position/attitude/spin perturbations
    the receding-horizon loop recovers hover.  The T = 3 / dt = 0.05 oracle
    configuration has only a 0.15 s lookahead -- too short for the slow
    position mode through the 4-integrator chain u -> omega -> theta -> vx
    -> x (measured: x oscillates) -- so the servo sanity runs dt = 0.15
    (0.45 s lookahead at the same compile size), which recovers hover to
    ~1e-4 in 40 periods."""
    fam = quadrotor_mpc_family(3, 0.15)
    B, periods = 4, 40
    rng = np.random.default_rng(6)
    x0 = np.zeros((B, fam.nx))
    x0[:, 0] = rng.uniform(-0.1, 0.1, B)  # position offset
    x0[:, 1] = rng.uniform(-0.1, 0.1, B)
    x0[:, 2] = rng.uniform(-0.3, 0.3, B)  # attitude perturbation
    x0[:, 5] = rng.uniform(-0.5, 0.5, B)  # spin perturbation
    x0s = jnp.asarray(x0)
    z0s = jax.vmap(lambda x: mpc.family_initial_guess(fam, x))(x0s)
    from mini_opt_tpu.ops.pallas_mpc import fused_mpc_servo_batch

    # Cold solve then servo at a warm budget (the serving ladder shape).
    z1 = fused_mpc_solve_batch(
        fam, x0s, z0s, max_iterations=6, qp_iterations=2, ls_iterations=2,
        backend="xla",
    )
    xf, zf, stats = fused_mpc_servo_batch(
        fam, x0s, z1, periods, max_iterations=2, qp_iterations=1,
        ls_iterations=1, backend="xla",
    )
    xf = np.asarray(xf)
    assert np.isfinite(xf).all()
    # After 6 s of control: hover recovered in every state.
    assert (np.abs(xf[:, :2]) < 0.01).all(), xf[:, :2]
    assert (np.abs(xf[:, 2]) < 0.01).all(), xf[:, 2]
    assert (np.abs(xf[:, 3:]) < 0.01).all(), xf[:, 3:]
    assert (np.asarray(stats)[:, 2] == 0.0).all()  # clean flags
