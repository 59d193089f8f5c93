"""Equality-constrained matrix-free CG path (projected CG, Nocedal & Wright
§16.3): must agree with the dense null-space path on linear problems and
converge the reference's nonlinear product-constraint family."""

import jax
import jax.numpy as jnp
import numpy as np

from mini_opt_tpu import make_residual
from mini_opt_tpu.nonlinear import NLSParams, Problem, nls_solve
from mini_opt_tpu.structs import termination_state_indicates_satisfied_tol


def test_eq_cg_matches_null_space_on_linear_problem():
    """Linear LS + linear equality constraints: projected CG and the dense
    null-space path must produce the same constrained minimum."""
    rng = np.random.default_rng(3)
    n, m, k = 20, 36, 4
    A = jnp.asarray(rng.normal(0, 1.0, (m, n)))
    b = jnp.asarray(rng.normal(0, 1.0, m))
    C = jnp.asarray(rng.normal(0, 1.0, (k, n)))
    d = jnp.asarray(rng.normal(0, 0.5, k))

    problem = Problem(
        dimension=n,
        costs=(make_residual(list(range(n)), lambda p: A @ p - b, m),),
        equality_constraints=(
            make_residual(list(range(n)), lambda p: C @ p - d, k),
        ),
    )
    x0 = jnp.zeros((n,), jnp.float64)
    params_ns = NLSParams(
        max_iterations=30,
        max_qp_iterations=1,
        absolute_exit_tol=1e-14,
        relative_exit_tol=1e-12,
    )
    params_cg = NLSParams(
        max_iterations=30,
        max_qp_iterations=1,
        absolute_exit_tol=1e-14,
        relative_exit_tol=1e-12,
        qp_solver="cg",
        cg_iterations=60,
    )
    r_ns = jax.jit(lambda x: nls_solve(problem, params_ns, x))(x0)
    r_cg = jax.jit(lambda x: nls_solve(problem, params_cg, x))(x0)

    x_ns, x_cg = np.asarray(r_ns.x), np.asarray(r_cg.x)
    # Constraints satisfied to solver precision; same minimizer.
    np.testing.assert_allclose(
        np.asarray(C) @ x_cg - np.asarray(d), 0.0, atol=1e-9
    )
    np.testing.assert_allclose(x_cg, x_ns, atol=1e-7)
    np.testing.assert_allclose(
        float(r_cg.errors.f), float(r_ns.errors.f), rtol=1e-10
    )


def test_eq_cg_nonlinear_sphere_constraint():
    """min 1/2||x - a||^2 s.t. ||x||^2 = 1: solution is a/||a||. Nonlinear
    constraint exercises the restoration step + multiplier penalty update."""
    n = 8
    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.normal(0, 2.0, n))
    x_star = np.asarray(a) / np.linalg.norm(np.asarray(a))

    problem = Problem(
        dimension=n,
        costs=(make_residual(list(range(n)), lambda p: p - a, n),),
        equality_constraints=(
            make_residual(
                list(range(n)), lambda p: jnp.stack([jnp.dot(p, p) - 1.0]), 1
            ),
        ),
    )
    params = NLSParams(
        max_iterations=60,
        max_qp_iterations=1,
        relative_exit_tol=1e-13,
        absolute_first_derivative_tol=1e-10,
        qp_solver="cg",
        cg_iterations=40,
        lambda_initial=1e-3,
    )
    starts = jnp.asarray(rng.uniform(-2.0, 2.0, (12, n)))
    res = jax.jit(jax.vmap(lambda x0: nls_solve(problem, params, x0)))(starts)

    ok = np.asarray(
        termination_state_indicates_satisfied_tol(res.termination_state)
    )
    assert ok.all(), np.asarray(res.termination_state)[~ok]
    x = np.asarray(res.x)
    np.testing.assert_allclose(
        np.sum(x * x, axis=1), 1.0, atol=1e-8
    )  # on the sphere
    # All starts here are in the attraction basin of a/|a| (none opposite).
    err = np.abs(x - x_star[None]).max(axis=1)
    assert (err < 5e-6).all(), err.max()


def test_eq_cg_product_constraints_reference_family():
    """The reference's sphere + product-equality family
    (nonlinear_test.cc:745-825) solved by the matrix-free path: converges to
    a known optimum from random starts."""
    N = 6
    problem = Problem(
        dimension=N,
        costs=(make_residual(range(N), lambda x: x, N),),
        equality_constraints=(
            make_residual([0, 1], lambda v: jnp.stack([v[0] * v[1] - 4.0]), 1),
            make_residual([2, 3], lambda v: jnp.stack([v[2 - 2] * v[3 - 2] - 9.0]), 1),
        ),
    )
    params = NLSParams(
        max_iterations=100,
        max_qp_iterations=1,
        relative_exit_tol=1e-12,
        absolute_first_derivative_tol=1e-9,
        qp_solver="cg",
        cg_iterations=30,
        lambda_initial=1e-3,
    )
    rng = np.random.default_rng(7)
    guesses = rng.uniform(-30.0, 30.0, (40, N))

    solutions = []
    for x0 in (-2.0, 2.0):
        for x2 in (-3.0, 3.0):
            s = np.zeros(N)
            s[0] = s[1] = x0
            s[2] = s[3] = x2
            solutions.append(s)
    solutions = np.stack(solutions)

    res = jax.jit(jax.vmap(lambda x0: nls_solve(problem, params, x0)))(
        jnp.asarray(guesses)
    )
    ok = np.asarray(
        termination_state_indicates_satisfied_tol(res.termination_state)
    )
    assert ok.all(), f"{(~ok).sum()} failed"
    x = np.asarray(res.x)
    dists = np.linalg.norm(x[:, None, :] - solutions[None], axis=2)
    nearest = solutions[np.argmin(dists, axis=1)]
    err = np.abs(x - nearest).max(axis=1)
    assert (err < 5e-5).all(), f"max err {err.max()}"


def test_eq_cg_with_box_bounds_combined():
    """Box bounds AND equality constraints in ONE matrix-free problem: the
    equality projector restricted to the free subspace composes with the
    two-metric bound projection. Oracle: dense interior-point path on the
    same problem."""
    import dataclasses

    from mini_opt_tpu import Var

    rng = np.random.default_rng(17)
    n, m, k, box = 16, 30, 2, 0.4
    A = jnp.asarray(rng.normal(0, 1.0, (m, n)))
    b = jnp.asarray(rng.normal(0, 1.2, m))
    C = jnp.asarray(rng.normal(0, 1.0, (k, n)))
    d = jnp.asarray(rng.normal(0, 0.2, k))

    problem = Problem(
        dimension=n,
        costs=(make_residual(list(range(n)), lambda p: A @ p - b, m),),
        equality_constraints=(
            make_residual(list(range(n)), lambda p: C @ p - d, k),
        ),
        inequality_constraints=tuple(
            c for i in range(n) for c in (Var(i) >= -box, Var(i) <= box)
        ),
    )
    params_ip = NLSParams(
        max_iterations=50,
        max_qp_iterations=15,
        absolute_exit_tol=1e-14,
        relative_exit_tol=1e-12,
    )
    params_cg = dataclasses.replace(
        params_ip, qp_solver="cg", cg_iterations=120, max_qp_iterations=1
    )
    x0 = jnp.zeros((n,), jnp.float64)
    r_ip = jax.jit(lambda x: nls_solve(problem, params_ip, x))(x0)
    r_cg = jax.jit(lambda x: nls_solve(problem, params_cg, x))(x0)

    x_ip, x_cg = np.asarray(r_ip.x), np.asarray(r_cg.x)
    Cn, dn = np.asarray(C), np.asarray(d)
    # Feasible on both constraint families.
    assert (np.abs(x_cg) <= box + 1e-10).all()
    np.testing.assert_allclose(Cn @ x_cg - dn, 0.0, atol=1e-8)
    # Bounds genuinely active at the solution.
    assert (np.abs(x_cg) > box - 1e-7).sum() >= 2, x_cg
    # Same constrained minimum as the dense interior-point path.
    np.testing.assert_allclose(
        float(r_cg.errors.f), float(r_ip.errors.f), rtol=1e-6
    )
    np.testing.assert_allclose(x_cg, x_ip, atol=5e-4)
