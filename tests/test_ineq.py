"""Nonlinear inequality constraints (slack reformulation, mini_opt_tpu/ineq.py).

The reference does NOT support nonlinear inequalities (README.md:35-38 lists
them as an explicit non-feature); these tests pin the slack-variable lift
``g(x) >= 0  ->  g(x) - s = 0, s >= 0`` (N&W 18.12) against known optima and
first-order KKT conditions.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mini_opt_tpu import (
    InitialGuessMethod,
    make_residual,
    termination_state_indicates_satisfied_tol,
)
from mini_opt_tpu.ineq import with_nonlinear_inequalities
from mini_opt_tpu.nonlinear import NLSParams, Problem, nls_solve

SQRT_B = np.sqrt(100.0)


def rosenbrock(xy):
    return jnp.stack([1.0 - xy[0], SQRT_B * (xy[1] - xy[0] * xy[0])])


def rosenbrock_cost(xy):
    r = rosenbrock(xy)
    return jnp.sum(r * r)


def disk(r2):
    """g(x) = r2 - ||x||^2 >= 0 (inside the disk of squared radius r2)."""
    return make_residual((0, 1), lambda xl: jnp.array([r2 - xl @ xl]), dim=1)


# NAIVE inner-QP guess: the structure-driven SOLVE_EQUALITY_CONSTRAINED warm
# start is f64-singular on slack-reformulated problems (see ineq.py module
# docstring / NLSParams.qp_initial_guess_method).
PARAMS = NLSParams(
    max_iterations=40,
    max_qp_iterations=10,
    max_line_search_iterations=5,
    termination_kkt_tolerance=1.0e-9,
    absolute_first_derivative_tol=1.0e-9,
    qp_initial_guess_method=InitialGuessMethod.NAIVE,
)

BASE = Problem(
    dimension=2,
    costs=(make_residual((0, 1), rosenbrock, dim=2),),
)


def test_rosenbrock_on_unit_disk_active_constraint():
    """min rosenbrock s.t. ||x||^2 <= 1: the unconstrained optimum (1,1) is
    infeasible; the disk-constrained minimizer is ~(0.7864, 0.6177)
    (the classic trust-region benchmark value). The constraint is active and
    KKT holds with a positive multiplier."""
    aug = with_nonlinear_inequalities(BASE, (disk(1.0),))
    assert aug.problem.dimension == 3
    # A strictly feasible start away from the flat Rosenbrock valley floor
    # (valley-floor starts crawl in the polynomial line search exactly as the
    # unconstrained solver does from the same points -- not a slack artifact).
    x0 = aug.initial_guess(jnp.array([0.5, -0.5]))
    res = jax.jit(lambda x: nls_solve(aug.problem, PARAMS, x))(x0)
    assert bool(termination_state_indicates_satisfied_tol(res.termination_state))
    x = aug.extract(res.x)
    np.testing.assert_allclose(
        np.asarray(x), [0.78641516, 0.61769831], atol=2.0e-5
    )
    # Constraint active: g ~ 0, slack ~ 0.
    g = aug.constraint_values(res.x)
    assert abs(float(g[0])) < 1.0e-5
    assert float(aug.slacks(res.x)[0]) < 1.0e-4
    # KKT at the solution: grad f = lambda * grad g with lambda >= 0.
    gf = jax.grad(rosenbrock_cost)(x)
    gg = jax.grad(lambda z: (1.0 - z @ z))(x)
    cross = gf[0] * gg[1] - gf[1] * gg[0]
    assert abs(float(cross)) < 1.0e-3 * float(jnp.linalg.norm(gf))
    assert float(gf @ gg) > 0.0  # multiplier sign


def test_inactive_constraint_recovers_unconstrained_optimum():
    aug = with_nonlinear_inequalities(BASE, (disk(4.0),))
    x0 = aug.initial_guess(jnp.array([0.0, -2.0]))
    res = jax.jit(lambda x: nls_solve(aug.problem, PARAMS, x))(x0)
    x = aug.extract(res.x)
    np.testing.assert_allclose(np.asarray(x), [1.0, 1.0], atol=1.0e-5)
    # Slack sits at g(x*) = 4 - 2 = 2 (constraint slack, multiplier ~ 0).
    np.testing.assert_allclose(float(aug.slacks(res.x)[0]), 2.0, atol=1.0e-5)


def test_infeasible_start_converges():
    """x0 outside the disk: the margin floor keeps s > 0 and the equality
    penalty drives g(x) - s -> 0 from the infeasible side."""
    aug = with_nonlinear_inequalities(BASE, (disk(1.0),))
    x0 = aug.initial_guess(jnp.array([2.0, -2.0]))
    assert float(aug.slacks(x0)[0]) == 1.0e-2  # floored, not g(x0) = -7
    res = jax.jit(lambda x: nls_solve(aug.problem, PARAMS, x))(x0)
    x = aug.extract(res.x)
    np.testing.assert_allclose(
        np.asarray(x), [0.78641516, 0.61769831], atol=2.0e-4
    )


def test_custom_jacobian_matches_jacfwd():
    def g_jac(xl):
        return jnp.array([1.0 - xl @ xl]), (-2.0 * xl)[None, :]

    g_custom = make_residual(
        (0, 1), lambda xl: jnp.array([1.0 - xl @ xl]), dim=1, jac=g_jac
    )
    aug_a = with_nonlinear_inequalities(BASE, (disk(1.0),))
    aug_b = with_nonlinear_inequalities(BASE, (g_custom,))
    x0 = jnp.array([0.3, -0.2])
    ra = nls_solve(aug_a.problem, PARAMS, aug_a.initial_guess(x0))
    rb = nls_solve(aug_b.problem, PARAMS, aug_b.initial_guess(x0))
    np.testing.assert_allclose(np.asarray(ra.x), np.asarray(rb.x), atol=1.0e-12)


def test_vector_constraint_and_multiple_blocks():
    """Quadratic pulled to (-2, -2) with x >= -1 (one dim-2 block) and
    x0 + x1 >= -1.5 (a second block): solution is the projection (-1, -1)
    with only the box-like block active (sum = -2 < -1.5 would violate --
    actually at (-1,-1) the sum constraint g = -2 + 1.5 = -0.5 < 0 is
    violated, so the true optimum balances both: closest feasible point to
    (-2,-2) under x >= -1 AND x0+x1 >= -1.5 is (-0.75, -0.75)."""
    cost = make_residual((0, 1), lambda xl: xl - jnp.array([-2.0, -2.0]), dim=2)
    g_box = make_residual((0, 1), lambda xl: xl + 1.0, dim=2)
    g_sum = make_residual((0, 1), lambda xl: jnp.array([xl[0] + xl[1] + 1.5]), dim=1)
    base = Problem(dimension=2, costs=(cost,))
    aug = with_nonlinear_inequalities(base, (g_box, g_sum))
    assert aug.problem.dimension == 5
    x0 = aug.initial_guess(jnp.array([0.0, 0.0]))
    res = jax.jit(lambda x: nls_solve(aug.problem, PARAMS, x))(x0)
    x = aug.extract(res.x)
    np.testing.assert_allclose(np.asarray(x), [-0.75, -0.75], atol=1.0e-6)


def test_vmapped_batch():
    """The augmented problem vmaps like any other: a batch of disk radii via
    closure data is not possible with static residuals, so batch over starts
    instead (the standard multi-start pattern)."""
    aug = with_nonlinear_inequalities(BASE, (disk(1.0),))
    starts = jnp.array([[2.0, -2.0], [0.0, -2.0], [0.5, -0.5], [0.9, 0.1]])
    x0 = jax.vmap(aug.initial_guess)(starts)
    res = jax.jit(jax.vmap(lambda x: nls_solve(aug.problem, PARAMS, x)))(x0)
    xs = aug.extract(res.x)
    np.testing.assert_allclose(
        np.asarray(xs),
        np.tile([0.78641516, 0.61769831], (4, 1)),
        atol=2.0e-4,
    )


def test_elbow_keep_out_ik():
    """Composes with the flagship IK family: a redundant 3-link arm holds the
    effector target while a nonlinear keep-out pushes the elbow off the spot
    the unconstrained solve parks it (examples/obstacle_ik.py)."""
    from mini_opt_tpu import make_planar_chain
    from mini_opt_tpu.models.ik import make_ik_problem, mod_pi_retraction

    chain = make_planar_chain(n_active=3, link_length=0.4, dtype=jnp.float64)
    elbow = make_planar_chain(n_active=2, link_length=0.4, dtype=jnp.float64)
    target = jnp.array([0.9, 0.35])
    x_ref = jnp.array([0.2, 0.2, 0.2])
    base = make_ik_problem(chain, target, with_joint_limits=False)
    params = NLSParams(
        max_iterations=60,
        max_qp_iterations=10,
        max_line_search_iterations=5,
        relative_exit_tol=0.0,
        qp_initial_guess_method=InitialGuessMethod.NAIVE,
    )
    res0 = nls_solve(base, params, x_ref, retraction=mod_pi_retraction)
    center = elbow.update(res0.x[:2]).translation[:2]
    radius = 0.15

    def keep_out(p2):
        d = elbow.update(p2).translation[:2] - center
        return jnp.array([d @ d - radius * radius])

    prox = make_residual((0, 1, 2), lambda p: 0.05 * (p - x_ref), 3)
    regularized = Problem(
        dimension=3,
        costs=base.costs + (prox,),
        equality_constraints=base.equality_constraints,
    )
    aug = with_nonlinear_inequalities(
        regularized, (make_residual((0, 1), keep_out, 1),)
    )
    res = jax.jit(
        lambda x: nls_solve(
            aug.problem, params, x, retraction=aug.wrap_retraction(mod_pi_retraction)
        )
    )(aug.initial_guess(x_ref))
    assert bool(termination_state_indicates_satisfied_tol(res.termination_state))
    theta = aug.extract(res.x)
    eff = chain.update(theta).translation[:2]
    assert abs(float(eff[0]) - 0.9) < 1.0e-6  # hard equality
    assert abs(float(eff[1]) - 0.35) < 1.0e-2  # soft target (prox bias)
    g = float(aug.constraint_values(res.x)[0])
    assert g >= -1.0e-6  # keep-out satisfied
    assert g < 0.05  # ... and genuinely near-active (the obstacle bound it)


def test_wrapper_accepted_by_nls_solve_with_default_params():
    """nls_solve takes the NonlinearInequalityProblem itself and forces the
    slack-safe NAIVE warm start: with DEFAULT params this multi-block
    projection previously picked SOLVE_EQUALITY_CONSTRAINED, hit the singular
    condensed KKT, and returned x0 unchanged (QP_INDEFINITE)."""
    cost = make_residual((0, 1), lambda xl: xl - jnp.array([-2.0, -2.0]), dim=2)
    g_box = make_residual((0, 1), lambda xl: xl + 1.0, dim=2)
    g_sum = make_residual((0, 1), lambda xl: jnp.array([xl[0] + xl[1] + 1.5]), dim=1)
    base = Problem(dimension=2, costs=(cost,))
    aug = with_nonlinear_inequalities(base, (g_box, g_sum))
    params = NLSParams(
        max_iterations=40, max_qp_iterations=10, max_line_search_iterations=5
    )  # guess method deliberately left at the structure-driven default
    res = jax.jit(lambda x: nls_solve(aug, params, x))(
        aug.initial_guess(jnp.array([0.0, 0.0]))
    )
    np.testing.assert_allclose(
        np.asarray(aug.extract(res.x)), [-0.75, -0.75], atol=1.0e-6
    )


def test_params_override_and_explicit_conflict_rejected():
    import pytest

    aug = with_nonlinear_inequalities(BASE, (disk(1.0),))
    p = aug.params(NLSParams(max_iterations=7))
    assert p.qp_initial_guess_method == InitialGuessMethod.NAIVE
    assert p.max_iterations == 7
    assert aug.params().qp_initial_guess_method == InitialGuessMethod.NAIVE
    with pytest.raises(ValueError, match="singular"):
        aug.params(
            NLSParams(
                qp_initial_guess_method=InitialGuessMethod.SOLVE_EQUALITY_CONSTRAINED
            )
        )


def test_out_of_range_inequality_index_rejected():
    import pytest

    g_bad = make_residual((0, 2), lambda xl: jnp.array([xl[0] + xl[1]]), dim=1)
    with pytest.raises(ValueError, match="dimension 2"):
        with_nonlinear_inequalities(BASE, (g_bad,))


def test_constraint_values_batched():
    aug = with_nonlinear_inequalities(BASE, (disk(1.0),))
    xs = jnp.array([[0.5, -0.5], [0.9, 0.1]])
    x_aug = jax.vmap(aug.initial_guess)(xs)
    g = aug.constraint_values(x_aug)
    assert g.shape == (2, 1)
    expected = 1.0 - jnp.sum(xs * xs, axis=1)
    np.testing.assert_allclose(np.asarray(g[:, 0]), np.asarray(expected), atol=1e-12)


def test_wrap_retraction():
    aug = with_nonlinear_inequalities(BASE, (disk(1.0),))
    calls = []

    def retraction(x, dx, alpha):
        calls.append(1)
        return x + alpha * dx

    wrapped = aug.wrap_retraction(retraction)
    x = jnp.array([1.0, 2.0, 3.0])
    dx = jnp.array([0.1, 0.2, 0.3])
    out = wrapped(x, dx, jnp.asarray(0.5))
    assert calls  # the base retraction ran on the head
    np.testing.assert_allclose(np.asarray(out), [1.05, 2.1, 3.15], atol=1e-12)


def test_convenience_path_wraps_user_retraction():
    """Passing the WRAPPER to nls_solve with a base-space retraction must
    lift the retraction (slacks update additively); an elementwise base
    retraction applied to slack coordinates would wrap large slacks negative
    with no shape error to catch it (round-3 advisor finding)."""
    from mini_opt_tpu.utils.so3 import mod_pi

    def base_retraction(x, dx, alpha):
        return mod_pi(x + alpha * dx)

    aug = with_nonlinear_inequalities(BASE, (disk(16.0),))
    # Start far inside the disk: the optimal slack is 16 - 2 = 14 >> pi, so
    # an unwrapped mod_pi retraction would keep folding it into [-pi, pi).
    x0 = aug.initial_guess(jnp.array([0.2, 0.2]))

    # Convenience path: wrapper + base retraction straight into nls_solve.
    res_conv = jax.jit(
        lambda x: nls_solve(aug, PARAMS, x, retraction=base_retraction)
    )(x0)
    # Explicit path: unwrap by hand with the documented wrap_retraction.
    res_exp = jax.jit(
        lambda x: nls_solve(
            aug.problem,
            aug.params(PARAMS),
            x,
            retraction=aug.wrap_retraction(base_retraction),
        )
    )(x0)
    np.testing.assert_allclose(
        np.asarray(res_conv.x), np.asarray(res_exp.x), atol=0.0
    )
    # And the slack genuinely exceeds pi (the wrap would have destroyed it).
    assert float(aug.slacks(res_conv.x)[0]) > 3.2
