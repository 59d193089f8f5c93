"""Box-constrained matrix-free CG path (two-metric gradient projection):
must reach the same constrained minimum as the dense interior-point path on
problems small enough for both."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mini_opt_tpu import Var, make_residual
from mini_opt_tpu.nonlinear import NLSParams, Problem, nls_solve


def _ls_problem(n, m, seed, box=0.2):
    rng = np.random.default_rng(seed)
    A = jnp.asarray(rng.normal(0, 1.0, (m, n)))
    b = jnp.asarray(rng.normal(0, 1.5, m))

    def res(p):
        return A @ p - b

    ineq = tuple(
        c for i in range(n) for c in (Var(i) >= -box, Var(i) <= box)
    )
    return (
        Problem(
            dimension=n,
            costs=(make_residual(list(range(n)), res, m),),
            inequality_constraints=ineq,
        ),
        A,
        b,
    )


def test_bounded_cg_matches_interior_point():
    n, m, box = 24, 40, 0.2
    problem, A, b = _ls_problem(n, m, seed=4, box=box)
    x_uncon = np.linalg.lstsq(np.asarray(A), np.asarray(b), rcond=None)[0]
    assert (np.abs(x_uncon) > box).sum() >= 4  # bounds genuinely bind

    x0 = jnp.zeros((n,), jnp.float64)
    params_ip = NLSParams(
        max_iterations=40,
        max_qp_iterations=12,
        absolute_exit_tol=1e-14,
        relative_exit_tol=1e-12,
    )
    params_cg = dataclasses.replace(
        params_ip, qp_solver="cg", cg_iterations=80, max_qp_iterations=1
    )
    r_ip = jax.jit(lambda x: nls_solve(problem, params_ip, x))(x0)
    r_cg = jax.jit(lambda x: nls_solve(problem, params_cg, x))(x0)

    x_ip = np.asarray(r_ip.x)
    x_cg = np.asarray(r_cg.x)
    assert (np.abs(x_cg) <= box + 1e-12).all()  # strictly feasible
    active = np.abs(x_cg) > box - 1e-8
    assert active.sum() >= 4, active.sum()
    # Same minimum: IP sits ~1e-6 interior of its active bounds (barrier
    # smoothing), projected CG lands exactly on them -- compare the cost and
    # the KKT conditions, not exact coordinates.
    np.testing.assert_allclose(x_cg, x_ip, atol=5e-4)
    np.testing.assert_allclose(
        float(r_cg.errors.f), float(r_ip.errors.f), rtol=1e-7
    )
    assert float(r_cg.errors.f) <= float(r_ip.errors.f) + 1e-9
    # Direct optimality: projected gradient vanishes at the CG solution
    # (free coords: g ~ 0; active coords: gradient pushes outward).
    An, bn = np.asarray(A), np.asarray(b)
    g = An.T @ (An @ x_cg - bn)
    pg = g.copy()
    up = x_cg >= box - 1e-10
    dn = x_cg <= -box + 1e-10
    pg[up] = np.where(g[up] < 0, 0.0, g[up])
    pg[dn] = np.where(g[dn] > 0, 0.0, g[dn])
    assert np.abs(pg).max() < 1e-2, np.abs(pg).max()


def test_bounded_cg_infeasible_start_is_projected():
    """x0 outside the box must be projected before the first iteration and
    every candidate stays feasible."""
    n, m, box = 12, 20, 0.3
    problem, A, b = _ls_problem(n, m, seed=9, box=box)
    x0 = jnp.full((n,), 5.0, jnp.float64)  # far outside
    params = NLSParams(
        max_iterations=30,
        max_qp_iterations=1,
        absolute_exit_tol=1e-14,
        relative_exit_tol=1e-12,
        qp_solver="cg",
        cg_iterations=60,
    )
    res = jax.jit(lambda x: nls_solve(problem, params, x))(x0)
    x = np.asarray(res.x)
    assert (np.abs(x) <= box + 1e-12).all()
    # Sanity: beats the projected start.
    f0 = 0.5 * np.sum(
        (np.asarray(A) @ np.clip(np.asarray(x0), -box, box) - np.asarray(b))
        ** 2
    )
    assert float(res.errors.f) < 0.5 * f0
