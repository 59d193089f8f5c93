"""Nonlinear solver tests, mirroring the reference's nonlinear_test.cc:

* residual Jacobians vs numerical oracles (the repo-wide pattern,
  nonlinear_test.cc:21-39),
* QP-cost directional derivative vs numeric (:109-183),
* line-search polynomial fits vs closed form (:185-250),
* Rosenbrock 2D from 9 starts (:390-424) + pure-LM variant (:427-460),
* inequality-constrained Rosenbrock 2D (:463-500) and 6D (:502-577),
* Himmelblau box-constrained over a grid of starts (:597-665) and
  quadrant-constrained (:668-718),
* sphere + nonlinear product equality constraints from random starts
  (:745-825) exercising the null-space path.

Grid/multi-start sweeps run as ONE vmapped call -- the TPU-native style.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mini_opt_tpu import (
    LineSearchStrategy,
    NLSTerminationState,
    StepSizeSelectionResult,
    Var,
    make_residual,
    termination_state_indicates_satisfied_tol,
)
from mini_opt_tpu.nonlinear import (
    NLSParams,
    Problem,
    compute_qp_cost_derivative,
    cubic_approx_coeffs,
    cubic_approx_minimum,
    evaluate_nonlinear_errors,
    linearize_and_fill_qp,
    nls_solve,
    quadratic_approx_minimum,
)
from mini_opt_tpu.utils.numerical import numerical_jacobian

# ---------------------------------------------------------------------------
# Residual functions under test.
# ---------------------------------------------------------------------------

SQRT_B = np.sqrt(100.0)


def rosenbrock(xy):
    """h with h^T h = (1-x)^2 + 100 (y - x^2)^2."""
    return jnp.stack([1.0 - xy[0], SQRT_B * (xy[1] - xy[0] * xy[0])])


def rosenbrock_nd(x):
    """Chained 6D Rosenbrock, residual dim 10 (nonlinear_test.cc:502-516)."""
    parts = []
    for i in range(x.shape[0] - 1):
        parts.append(1.0 - x[i])
        parts.append(SQRT_B * (x[i + 1] - x[i] * x[i]))
    return jnp.stack(parts)


def himmelblau1(xy):
    return jnp.stack([xy[0] ** 2 + xy[1] - 11.0])


def himmelblau2(xy):
    return jnp.stack([xy[0] + xy[1] ** 2 - 7.0])


HIMMELBLAU_ROOTS = np.array(
    [
        [3.0, 2.0],
        [-2.805118, 3.131312],
        [-3.779310, -3.283186],
        [3.584428, -1.848126],
    ]
)


# ---------------------------------------------------------------------------
# Derivative oracles.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "fn,pts",
    [
        (rosenbrock, [[5.0, -3.0], [1.0, 1.0]]),
        (himmelblau1, [[0.0, 0.0], [4.0, -3.0]]),
        (himmelblau2, [[-1.0, 3.0], [0.5, -1.5]]),
    ],
)
def test_residual_jacobians_vs_numerical(fn, pts):
    for pt in pts:
        x = np.asarray(pt)
        J = jax.jacfwd(fn)(jnp.asarray(x))
        J_num = numerical_jacobian(lambda v: np.asarray(fn(jnp.asarray(v))), x)
        np.testing.assert_allclose(np.asarray(J), J_num, atol=1e-6)


def test_qp_cost_directional_derivative_vs_numeric():
    """nonlinear_test.cc:109-183 analog: d/dalpha of the linearized merit at
    alpha=0 must match the numeric derivative of the true nonlinear merit."""
    problem = Problem(
        dimension=2,
        costs=(make_residual([0, 1], rosenbrock, 2),),
        equality_constraints=(
            make_residual([0, 1], lambda v: jnp.stack([v[0] * v[1] - 2.0]), 1),
        ),
    )
    x = jnp.asarray([0.5, -1.3])
    qp, _ = linearize_and_fill_qp(problem, x, 0.0)
    rng = np.random.default_rng(0)
    for _ in range(5):
        dx = jnp.asarray(rng.standard_normal(2))
        d = compute_qp_cost_derivative(qp, dx)
        penalty = 0.73

        def merit(alpha):
            e = evaluate_nonlinear_errors(problem, x + alpha * dx)
            return float(e.total(penalty))

        h = 1e-7
        num = (merit(h) - merit(-h)) / (2 * h)
        assert float(d.total(penalty)) == pytest.approx(num, abs=1e-5)


# ---------------------------------------------------------------------------
# Polynomial line-search fits (nonlinear_test.cc:185-250).
# ---------------------------------------------------------------------------


def test_quadratic_approx_recovers_polynomial():
    # phi(a) = 3 a^2 - 2 a + 5 -> minimum at a = 1/3
    phi = lambda a: 3 * a * a - 2 * a + 5
    alpha, ok = quadratic_approx_minimum(phi(0.0), -2.0, 1.0, phi(1.0))
    assert bool(ok) and float(alpha) == pytest.approx(1.0 / 3.0, abs=1e-12)
    # positive derivative -> invalid
    _, ok = quadratic_approx_minimum(5.0, 2.0, 1.0, 6.0)
    assert not bool(ok)


def test_cubic_approx_recovers_polynomial():
    # phi(a) = 2 a^3 + a^2 - 3 a + 4: phi'(0) = -3
    a_true, b_true = 2.0, 1.0
    phi = lambda a: a_true * a**3 + b_true * a * a - 3 * a + 4
    a, b = cubic_approx_coeffs(phi(0.0), -3.0, 1.0, phi(1.0), 0.5, phi(0.5))
    assert float(a) == pytest.approx(a_true, abs=1e-12)
    assert float(b) == pytest.approx(b_true, abs=1e-12)
    alpha, ok = cubic_approx_minimum(-3.0, jnp.asarray(a), jnp.asarray(b))
    # phi'(a) = 6a^2 + 2a - 3 = 0 -> a = (-1 + sqrt(19)) / 6
    assert bool(ok)
    assert float(alpha) == pytest.approx((-1 + np.sqrt(19)) / 6, abs=1e-12)


# ---------------------------------------------------------------------------
# Rosenbrock 2D (nonlinear_test.cc:390-460).
# ---------------------------------------------------------------------------

ROSENBROCK_GUESSES = np.array(
    [
        [-5, -3], [10, 8], [-20, 3], [0, -5], [4, 0],
        [100, 50], [-35, 40], [1000, -50], [0.8, -0.3],
    ],
    dtype=np.float64,
)


def test_rosenbrock_unconstrained():
    problem = Problem(dimension=2, costs=(make_residual([0, 1], rosenbrock, 2),))
    params = NLSParams(max_iterations=5, max_qp_iterations=1)
    solve = jax.jit(jax.vmap(lambda x0: nls_solve(problem, params, x0)))
    res = solve(jnp.asarray(ROSENBROCK_GUESSES))
    assert (
        np.asarray(res.termination_state)
        == NLSTerminationState.SATISFIED_ABSOLUTE_TOL
    ).all(), np.asarray(res.termination_state)
    np.testing.assert_allclose(
        np.asarray(res.x), np.ones((9, 2)), atol=1e-6
    )
    # Quadratic + unconstrained: exactly one QP iteration per outer iteration.
    np.testing.assert_array_equal(
        np.asarray(res.iterations.qp_num_iterations).sum(axis=1),
        np.asarray(res.num_iterations),
    )


def test_rosenbrock_pure_lm():
    """Line search disabled; rely on the LM state machine
    (nonlinear_test.cc:427-460)."""
    problem = Problem(dimension=2, costs=(make_residual([0, 1], rosenbrock, 2),))
    params = NLSParams(
        max_iterations=10,
        max_qp_iterations=1,
        absolute_first_derivative_tol=1e-12,
        max_line_search_iterations=0,
    )
    solve = jax.jit(jax.vmap(lambda x0: nls_solve(problem, params, x0)))
    res = solve(jnp.asarray(ROSENBROCK_GUESSES))
    assert (
        np.asarray(res.termination_state)
        == NLSTerminationState.SATISFIED_ABSOLUTE_TOL
    ).all()
    np.testing.assert_allclose(np.asarray(res.x), np.ones((9, 2)), atol=1e-6)


def test_rosenbrock_inequality_constrained():
    """Constraints x >= 1.2, y <= 0.5 exclude the optimum; solution pinned at
    (1.2, 0.5). Last three starts are infeasible (nonlinear_test.cc:463-500).
    """
    problem = Problem(
        dimension=2,
        costs=(make_residual([0, 1], rosenbrock, 2),),
        inequality_constraints=(Var(0) >= 1.2, Var(1) <= 0.5),
    )
    params = NLSParams(max_iterations=10, max_qp_iterations=10)
    guesses = np.array(
        [[12, -5], [100, -20], [1423, -400], [-20, 10], [-120, 35], [-50, 0.5]],
        dtype=np.float64,
    )
    solve = jax.jit(jax.vmap(lambda x0: nls_solve(problem, params, x0)))
    res = solve(jnp.asarray(guesses))
    term = np.asarray(res.termination_state)
    assert (term != NLSTerminationState.MAX_ITERATIONS).all(), term
    assert (term != NLSTerminationState.MAX_LAMBDA).all(), term
    np.testing.assert_allclose(
        np.asarray(res.x), np.tile([1.2, 0.5], (6, 1)), atol=1e-6
    )


def test_rosenbrock_6d_box_constrained():
    """6D chained Rosenbrock with 4 box constraints
    (nonlinear_test.cc:502-577)."""
    problem = Problem(
        dimension=6,
        costs=(make_residual(range(6), rosenbrock_nd, 10),),
        inequality_constraints=(
            Var(0) >= 2.3,
            Var(1) <= -1.2,
            Var(2) >= 3.0,
            Var(3) <= -2.5,
        ),
    )
    params = NLSParams(
        max_iterations=30,
        max_qp_iterations=30,
        relative_exit_tol=1e-6,
        absolute_first_derivative_tol=5e-6,
        termination_kkt_tolerance=1e-6,
        max_lambda=10.0,
    )
    guesses = np.array(
        [
            [10.5, -8.0, 50.0, -14.0, 4.0, -0.6],
            [100.0, -50.0, 30.0, -100.0, 150.0, -400.0],
        ]
    )
    solution = np.array([2.3, -1.2, 3.0, -2.5, 6.19802, 6.19802**2])
    solve = jax.jit(jax.vmap(lambda x0: nls_solve(problem, params, x0)))
    res = solve(jnp.asarray(guesses))
    assert np.asarray(
        termination_state_indicates_satisfied_tol(res.termination_state)
    ).all(), np.asarray(res.termination_state)
    np.testing.assert_allclose(
        np.asarray(res.x), np.tile(solution, (2, 1)), atol=1e-4
    )


# ---------------------------------------------------------------------------
# Himmelblau (nonlinear_test.cc:597-718).
# ---------------------------------------------------------------------------


def _himmelblau_problem(lo=-5.0):
    return Problem(
        dimension=2,
        costs=(
            make_residual([0, 1], himmelblau1, 1),
            make_residual([0, 1], himmelblau2, 1),
        ),
        inequality_constraints=(
            Var(0) >= lo,
            Var(0) <= 5.0,
            Var(1) >= lo,
            Var(1) <= 5.0,
        ),
    )


HIMMELBLAU_PARAMS = NLSParams(
    max_iterations=20,
    max_qp_iterations=10,
    relative_exit_tol=1e-12,
    absolute_first_derivative_tol=1e-8,
    termination_kkt_tolerance=1e-6,
)


def test_himmelblau_grid():
    problem = _himmelblau_problem()
    xs = np.arange(-4.5, 4.51, 0.3)
    gx, gy = np.meshgrid(xs, xs)
    guesses = np.stack([gx.ravel(), gy.ravel()], axis=1)  # ~961 starts

    solve = jax.jit(jax.vmap(lambda x0: nls_solve(problem, HIMMELBLAU_PARAMS, x0)))
    res = solve(jnp.asarray(guesses))

    ok = np.asarray(termination_state_indicates_satisfied_tol(res.termination_state))
    assert ok.all(), f"{(~ok).sum()} failed: {np.asarray(res.termination_state)[~ok]}"
    x = np.asarray(res.x)
    dists = np.linalg.norm(x[:, None, :] - HIMMELBLAU_ROOTS[None], axis=2)
    nearest = HIMMELBLAU_ROOTS[np.argmin(dists, axis=1)]
    err = np.abs(x - nearest).max(axis=1)
    assert (err < 5e-5).all(), f"max err {err.max()}"


def test_himmelblau_quadrant_constrained():
    """Constrained to the (+,+) quadrant -> unique root (3, 2)
    (nonlinear_test.cc:668-718)."""
    problem = _himmelblau_problem(lo=0.1)
    xs = np.arange(0.2, 4.81, 0.2)
    gx, gy = np.meshgrid(xs, xs)
    guesses = np.stack([gx.ravel(), gy.ravel()], axis=1)

    solve = jax.jit(jax.vmap(lambda x0: nls_solve(problem, HIMMELBLAU_PARAMS, x0)))
    res = solve(jnp.asarray(guesses))
    ok = np.asarray(termination_state_indicates_satisfied_tol(res.termination_state))
    assert ok.all()
    err = np.abs(np.asarray(res.x) - np.array([3.0, 2.0])).max(axis=1)
    assert (err < 5e-5).all(), f"max err {err.max()}"


# ---------------------------------------------------------------------------
# Sphere + nonlinear equality constraints: null-space path
# (nonlinear_test.cc:745-825).
# ---------------------------------------------------------------------------


def test_sphere_with_nonlinear_equality_constraints():
    N = 6

    def product_constraint(v, target):
        return jnp.stack([v[0] * v[1] - target])

    problem = Problem(
        dimension=N,
        costs=(make_residual(range(N), lambda x: x, N),),
        equality_constraints=(
            make_residual([0, 1], lambda v: product_constraint(v, 4.0), 1),
            make_residual([2, 3], lambda v: product_constraint(v, 9.0), 1),
        ),
    )
    params = NLSParams(
        max_iterations=100,
        max_qp_iterations=1,
        relative_exit_tol=1e-12,
        absolute_first_derivative_tol=1e-9,
        termination_kkt_tolerance=1e-6,
        lambda_initial=0.001,
    )
    rng = np.random.default_rng(7)
    guesses = rng.uniform(-30.0, 30.0, (100, N))

    solutions = []
    for x0 in (-2.0, 2.0):
        for x2 in (-3.0, 3.0):
            s = np.zeros(N)
            s[0] = s[1] = x0
            s[2] = s[3] = x2
            solutions.append(s)
    solutions = np.stack(solutions)

    solve = jax.jit(jax.vmap(lambda x0: nls_solve(problem, params, x0)))
    res = solve(jnp.asarray(guesses))

    ok = np.asarray(termination_state_indicates_satisfied_tol(res.termination_state))
    assert ok.all(), f"{(~ok).sum()} failed: {np.asarray(res.termination_state)[~ok]}"
    x = np.asarray(res.x)
    dists = np.linalg.norm(x[:, None, :] - solutions[None], axis=2)
    nearest = solutions[np.argmin(dists, axis=1)]
    err = np.abs(x - nearest).max(axis=1)
    assert (err < 5e-5).all(), f"max err {err.max()}"
    assert (np.asarray(jax.vmap(lambda r: r.num_failed_line_searches())(res)) == 0).all()


# ---------------------------------------------------------------------------
# Driver features: retraction, exit callback, history.
# ---------------------------------------------------------------------------


def test_custom_retraction_angle_wrap():
    """A retraction that wraps an angle parameter must be applied on every
    candidate (nonlinear.hpp:127 / nonlinear.cc:160-168)."""

    def cost(v):
        # minimized at angle = pi/4 + 2k*pi
        return jnp.stack([jnp.sin(v[0] - jnp.pi / 4)])

    problem = Problem(dimension=1, costs=(make_residual([0], cost, 1),))

    def retraction(x, dx, alpha):
        from mini_opt_tpu.utils.so3 import mod_pi

        return mod_pi(x + dx * alpha)

    params = NLSParams(max_iterations=20, max_qp_iterations=1)
    res = nls_solve(problem, params, jnp.asarray([3.0]), retraction=retraction)
    assert bool(termination_state_indicates_satisfied_tol(res.termination_state))
    x = float(res.x[0])
    assert abs(x) <= np.pi + 1e-9  # stayed wrapped
    # sin(x - pi/4) has roots at pi/4 + k*pi; either wrapped root is valid.
    assert min(abs(x - np.pi / 4), abs(x + 3 * np.pi / 4)) < 1e-5


def test_user_exit_callback():
    problem = Problem(dimension=2, costs=(make_residual([0, 1], rosenbrock, 2),))
    params = NLSParams(max_iterations=10, max_qp_iterations=1)

    def always_stop(row):
        return jnp.asarray(False)  # never proceed

    res = nls_solve(
        problem, params, jnp.asarray([1000.0, -50.0]), exit_callback=always_stop
    )
    # A convergence exit would take precedence (nonlinear.cc:146-151); from
    # this far start the first iteration cannot converge, so the callback wins.
    assert int(res.termination_state) == NLSTerminationState.USER_CALLBACK
    assert int(res.num_iterations) == 1


def test_history_is_recorded():
    problem = Problem(dimension=2, costs=(make_residual([0, 1], rosenbrock, 2),))
    params = NLSParams(max_iterations=5, max_qp_iterations=1)
    res = nls_solve(problem, params, jnp.asarray([-5.0, -3.0]))
    n = int(res.num_iterations)
    assert n >= 1
    it = res.iterations
    # errors decrease across iterations
    f = np.asarray(it.errors_initial.f)[:n]
    assert (np.diff(f) <= 1e-9).all()
    assert (np.asarray(it.step_result)[:n] == StepSizeSelectionResult.SUCCESS).all()
    # rendering works
    from mini_opt_tpu import nls_result_to_string

    s = nls_result_to_string(res, use_color=True, include_qp=True)
    assert "Terminated" in s and "alpha" in s


def test_armijo_backtrack_strategy():
    problem = Problem(dimension=2, costs=(make_residual([0, 1], rosenbrock, 2),))
    params = NLSParams(
        max_iterations=10,
        max_qp_iterations=1,
        max_line_search_iterations=5,
        line_search_strategy=LineSearchStrategy.ARMIJO_BACKTRACK,
        armijo_search_tau=0.5,
    )
    res = nls_solve(problem, params, jnp.asarray([-5.0, -3.0]))
    assert bool(termination_state_indicates_satisfied_tol(res.termination_state))
    np.testing.assert_allclose(np.asarray(res.x), [1.0, 1.0], atol=1e-6)


def test_summarize_counts_regression_gates():
    """Iteration-count statistics over a suite (the reference's
    SummarizeCounts pattern, nonlinear_test.cc:350-373) with regression
    caps: Rosenbrock from the 9 reference starts."""
    from mini_opt_tpu import summarize_counts

    problem = Problem(dimension=2, costs=(make_residual([0, 1], rosenbrock, 2),))
    params = NLSParams(max_iterations=10, max_qp_iterations=1)
    res = jax.vmap(lambda x0: nls_solve(problem, params, x0))(
        jnp.asarray(ROSENBROCK_GUESSES)
    )
    s = summarize_counts(res)
    assert s["num_iterations"]["max"] <= 5  # reference gate: <= 5 outer iters
    assert s["num_failed_line_searches"]["max"] == 0
    assert s["num_qp_iterations"]["mean"] == s["num_iterations"]["mean"]
    assert s["num_line_search_steps"]["p95"] <= 10


def test_parallel_line_search_matches_sequential():
    """parallel_line_search=True (all Armijo probes in one batched call) must
    reproduce the sequential loop exactly: statuses, iterates, and the full
    line-search history, across a batch of IK solves with retraction and box
    constraints."""
    import dataclasses

    from mini_opt_tpu.models.ik import (
        default_ik_params,
        make_ik_problem,
        make_planar_chain,
        mod_pi_retraction,
    )

    chain = make_planar_chain(n_active=2, dtype=jnp.float64)
    base = default_ik_params(jnp.float64, max_iterations=8, max_qp_iterations=6)
    rng = np.random.default_rng(3)
    B = 64
    r = rng.uniform(0.3, 0.75, B)
    th = rng.uniform(0.1, 1.4, B)
    targets = jnp.asarray(np.stack([r * np.cos(th), r * np.sin(th)], 1))
    x0 = jnp.asarray(rng.uniform(0.2, 1.2, (B, 2)))

    def solve(params):
        def one(t, x):
            problem = make_ik_problem(chain, t, with_joint_limits=True)
            return nls_solve(problem, params, x, retraction=mod_pi_retraction)

        return jax.vmap(one)(targets, x0)

    res_seq = solve(base)
    res_par = solve(dataclasses.replace(base, parallel_line_search=True))
    for a, b in zip(jax.tree.leaves(res_seq), jax.tree.leaves(res_par)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-13, rtol=1e-12
        )

    # Same equivalence on the fixed-trip (TPU batched) configuration.
    res_seq_ft = solve(dataclasses.replace(base, early_exit=False))
    res_par_ft = solve(
        dataclasses.replace(base, early_exit=False, parallel_line_search=True)
    )
    for a, b in zip(jax.tree.leaves(res_seq_ft), jax.tree.leaves(res_par_ft)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-13, rtol=1e-12
        )


def test_outer_unroll_matches_rolled():
    """outer_unroll is a pure scheduling knob: results identical to the
    rolled fixed-trip scan."""
    import dataclasses

    from mini_opt_tpu.models.ik import (
        default_ik_params,
        make_ik_problem,
        make_planar_chain,
        mod_pi_retraction,
    )

    chain = make_planar_chain(n_active=2, dtype=jnp.float64)
    base = dataclasses.replace(
        default_ik_params(jnp.float64, max_iterations=6, max_qp_iterations=4),
        early_exit=False,
        record_history=False,
    )
    targets = jnp.asarray([[0.5, 0.3], [0.2, 0.6], [0.4, 0.4]])
    x0 = jnp.asarray([[0.4, 0.9], [1.0, 0.5], [0.3, 1.2]])

    def solve(params):
        def one(t, x):
            problem = make_ik_problem(chain, t, with_joint_limits=True)
            return nls_solve(problem, params, x, retraction=mod_pi_retraction)

        return jax.vmap(one)(targets, x0)

    res_rolled = solve(base)
    res_unrolled = solve(dataclasses.replace(base, outer_unroll=6, inner_unroll=4))
    for a, b in zip(jax.tree.leaves(res_rolled), jax.tree.leaves(res_unrolled)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-13)


def test_fuse_probe_linearize_matches_standalone():
    """fuse_probe_linearize carries the winning probe's linearization instead
    of re-linearizing each iteration: results must match the standalone path
    to fp noise, alone and combined with the fused QP engine."""
    import dataclasses

    from mini_opt_tpu.models.ik import (
        default_ik_params,
        make_planar_chain,
        solve_ik_batch,
    )

    chain = make_planar_chain(2, dtype=jnp.float64)
    base = dataclasses.replace(
        default_ik_params(jnp.float64),
        record_history=False,
        early_exit=False,
        parallel_line_search=True,
        kkt_solver="ldlt",
    )
    rng = np.random.default_rng(0)
    B = 64
    r = rng.uniform(0.45, 0.75, B)
    th = rng.uniform(0.25, 1.25, B)
    targets = jnp.asarray(np.stack([r * np.cos(th), r * np.sin(th)], 1))
    x0 = jnp.asarray(rng.uniform(0.2, 1.2, (B, 2)))
    ra = solve_ik_batch(targets, x0, chain, base)
    rb = solve_ik_batch(
        targets, x0, chain, dataclasses.replace(base, fuse_probe_linearize=True)
    )
    np.testing.assert_allclose(np.asarray(rb.x), np.asarray(ra.x), atol=1e-12)

    fk = jax.vmap(lambda x: chain.update(x).translation[:2])
    rc = solve_ik_batch(
        targets,
        x0,
        chain,
        dataclasses.replace(
            base, fuse_probe_linearize=True, qp_solver="pallas_fused"
        ),
    )
    err = np.abs(np.asarray(fk(rc.x)) - np.asarray(targets)).max(1)
    assert (err < 1e-3).all()


def test_second_order_correction():
    """Port of the reference's SOC prototype checks (nonlinear_test.cc:
    252-348): the correction is minimum-norm, satisfies the linearized
    constraints with the re-evaluated values, and reduces the nonlinear
    constraint error after a large hypothetical step."""
    from mini_opt_tpu.nonlinear import (
        compute_second_order_correction,
        linearize_and_fill_qp,
    )

    def eq_fn(x):
        return jnp.stack([x[0] * x[0], x[1] * x[0] - x[2]])

    x_lin = jnp.asarray([-0.5, 1.2, -0.5])
    problem = Problem(
        dimension=3,
        equality_constraints=(make_residual([0, 1, 2], eq_fn, 2),),
    )
    qp, _ = linearize_and_fill_qp(problem, x_lin, 0.0)

    # Min-norm solution of the linearized constraints.
    dx0 = -jnp.linalg.pinv(qp.A_eq) @ qp.b_eq
    np.testing.assert_allclose(
        np.asarray(qp.A_eq @ dx0 + qp.b_eq), 0.0, atol=1e-12
    )
    # Null-space direction keeps the linearized constraints satisfied.
    _, _, vt = np.linalg.svd(np.asarray(qp.A_eq))
    null = jnp.asarray(vt[-1])
    np.testing.assert_allclose(
        np.asarray(qp.A_eq @ (dx0 + 4.231 * null) + qp.b_eq), 0.0, atol=1e-10
    )
    # Min-norm property: |dx0 + a*null| has zero derivative at a=0.
    eps = 1e-6
    n_plus = float(jnp.linalg.norm(dx0 + eps * null))
    n_minus = float(jnp.linalg.norm(dx0 - eps * null))
    assert abs(n_plus - n_minus) / (2 * eps) < 1e-6

    # Hypothetical (bad) step: correction must reduce the re-evaluated error.
    dx_in = dx0 + 5.334 * null
    dx_soc = compute_second_order_correction(problem, qp, x_lin + dx_in)
    np.testing.assert_allclose(
        np.asarray(qp.A_eq @ dx_soc + eq_fn(x_lin + dx_in)), 0.0, atol=1e-10
    )
    err_before = float(jnp.linalg.norm(eq_fn(x_lin + dx_in)))
    err_after = float(jnp.linalg.norm(eq_fn(x_lin + dx_in + dx_soc)))
    assert err_after < err_before


def test_random_bounded_ls_sweep_vs_active_set_oracle():
    """Distribution-wide gate on the FULL nls_solve stack (linearize ->
    penalty -> IP QP -> line search -> exits): 128 random box-constrained
    least-squares instances, vmapped, each checked against the exact
    active-set-enumeration oracle. The QP sweep (test_qp.py) pins qp_ip_solve
    alone; this pins the whole driver on the same distribution idiom
    (qp_test.cc:483-574 randomized-family strategy, one level up)."""
    from test_qp import _active_set_oracle

    B, n, m_res = 128, 8, 12
    rng = np.random.default_rng(21)
    As = rng.normal(0, 1.0, (B, m_res, n))
    roots = rng.uniform(-2.0, 2.0, (B, n))
    bs = np.einsum("bij,bj->bi", As, roots)  # residual zero at the root

    bound_vars = [0, 1, 2]
    lo, hi = -1.0, 1.0
    constraints = tuple(
        c for v in bound_vars for c in (Var(v) >= lo, Var(v) <= hi)
    )
    # At a bound-active optimum the IP direction carries a small POSITIVE
    # cost derivative (the barrier holds the QP solution ~complementarity/z
    # interior of the bound; measured ~1.4e-6 on this distribution), so the
    # first-order exit tolerance must sit above that scale or those
    # instances escalate to MAX_LAMBDA with a fully accurate x.
    params = NLSParams(
        max_iterations=12,
        max_qp_iterations=12,
        absolute_first_derivative_tol=1e-5,
        termination_kkt_tolerance=1e-10,
    )

    def one(A, b):
        problem = Problem(
            dimension=n,
            costs=(make_residual(list(range(n)), lambda p: A @ p - b, m_res),),
            inequality_constraints=constraints,
        )
        return nls_solve(problem, params, jnp.zeros((n,), jnp.float64))

    res = jax.jit(jax.vmap(one))(jnp.asarray(As), jnp.asarray(bs))
    ok = np.asarray(termination_state_indicates_satisfied_tol(res.termination_state))
    assert ok.all(), f"{(~ok).sum()} unconverged"

    var = np.asarray(bound_vars * 2)
    a_arr = np.asarray([1.0] * 3 + [-1.0] * 3)
    b_arr = np.asarray([-lo] * 3 + [hi] * 3)
    x = np.asarray(res.x)
    n_active_total = 0
    for k in range(B):
        G = As[k].T @ As[k]
        c = -As[k].T @ bs[k]
        x_star = _active_set_oracle(G, c, var, a_arr, b_arr)
        assert np.abs(x[k] - x_star).max() < 5e-5, (
            k, np.abs(x[k] - x_star).max()
        )
        n_active_total += int(
            np.sum((np.abs(x_star[bound_vars]) > 1.0 - 1e-9))
        )
    # The distribution genuinely exercises the constrained path.
    assert n_active_total > B // 2, n_active_total


def test_parallel_line_search_survives_nan_losing_probe():
    """A residual with a restricted domain can make a LOSING probe non-finite
    while the winning probe is fine (domain hole between x and x + dx). The
    parallel line search must select with where-masking, not multiplicative
    one-hots (0 * NaN = NaN poisoned the winner; with fuse_probe_linearize
    the carried QP went all-NaN and the solve exited QP_INDEFINITE at a
    worse point -- measured before the fix)."""
    import dataclasses

    def res(p):  # domain hole: requires |x - 2| >= 1
        return jnp.stack([jnp.sqrt((p[0] - 2.0) ** 2 - 1.0), 2.0 * (p[0] - 6.0)])

    problem = Problem(dimension=1, costs=(make_residual([0], res, 2),))
    base = NLSParams(
        max_iterations=15,
        max_qp_iterations=1,
        relative_exit_tol=1e-13,
        max_line_search_iterations=4,
        line_search_strategy=LineSearchStrategy.ARMIJO_BACKTRACK,
    )
    x0 = jnp.asarray([0.5])  # alpha=1 probe jumps the hole; alpha=0.5 lands in it
    results = {}
    for par, fuse in ((False, False), (True, False), (True, True)):
        params = dataclasses.replace(
            base, parallel_line_search=par, fuse_probe_linearize=fuse
        )
        r = jax.jit(lambda x, p=params: nls_solve(problem, p, x))(x0)
        results[(par, fuse)] = r
        assert np.isfinite(float(r.errors.f)), (par, fuse)
        assert int(r.termination_state) != NLSTerminationState.QP_INDEFINITE
    x_seq = float(results[(False, False)].x[0])
    for key, r in results.items():
        np.testing.assert_allclose(float(r.x[0]), x_seq, atol=1e-9, err_msg=str(key))


def test_stock_default_params_solve():
    """NLSParams() with NO overrides must just work (round-3 VERDICT item 3:
    kkt_solver="auto" resolves per backend at trace time, early_exit=None
    resolves to the backend-appropriate loop form). Rosenbrock from the
    reference's hardest guess, under jit and vmapped."""
    problem = Problem(dimension=2, costs=(make_residual([0, 1], rosenbrock, 2),))
    params = NLSParams()
    assert params.kkt_solver == "auto" and params.early_exit is None
    res = jax.jit(lambda x: nls_solve(problem, params, x))(
        jnp.asarray([5.0, -3.0])
    )
    np.testing.assert_allclose(np.asarray(res.x), [1.0, 1.0], atol=1e-6)
    # vmapped too (the configuration the TPU serving path uses).
    xs = jax.vmap(lambda x: nls_solve(problem, params, x).x)(
        jnp.asarray(ROSENBROCK_GUESSES)
    )
    np.testing.assert_allclose(np.asarray(xs), np.ones_like(xs), atol=1e-5)
