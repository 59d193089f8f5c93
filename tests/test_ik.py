"""End-to-end IK tests: the reference's hardest workloads
(nonlinear_test.cc:828-960 TestTwoAngleActuatorChain, :966-1135
TestDualActuatorBalancing), run as vmapped grids of starts.

These are also the problems behind the repo's headline benchmark
(BASELINE.md north star: batched transform-chain IK solves/s/chip).
"""

import jax
import jax.numpy as jnp
import numpy as np

from mini_opt_tpu import LineSearchStrategy, Var, make_residual
from mini_opt_tpu.models.chains import ActuatorChain, ActuatorLink, Pose
from mini_opt_tpu.nonlinear import NLSParams, Problem, nls_solve
from mini_opt_tpu.utils import so3


def make_two_angle_chain():
    """Three links: two active Z-rotations, fixed end link
    (nonlinear_test.cc:832-838)."""
    mask = (0, 0, 1, 0, 0, 0)
    off = (0, 0, 0, 0, 0, 0)
    qi = so3.quat_identity()

    def link(t, m):
        return ActuatorLink.create(Pose(qi, jnp.asarray(t)), m)

    return ActuatorChain(
        links=(
            link([0.0, 0.0, 0.0], mask),
            link([0.4, 0.0, 0.0], mask),
            link([0.4, 0.0, 0.0], off),
        )
    )


def mod_pi_retraction(x, dx, alpha):
    return so3.mod_pi(x + dx * alpha)


def _two_angle_problem(chain, with_inequalities):
    """Cost pins effector y to 0.6; equality constraint pins x to 0.45;
    Jacobians come from the chain's analytic derivative panels
    (nonlinear_test.cc:841-867)."""

    def y_res_jac(params):
        st = chain.update(params)
        return jnp.stack([st.translation[1] - 0.6]), st.translation_D_params[1:2, :]

    def x_eq_jac(params):
        st = chain.update(params)
        return jnp.stack([st.translation[0] - 0.45]), st.translation_D_params[0:1, :]

    return Problem(
        dimension=2,
        costs=(
            make_residual(
                [0, 1], lambda p: y_res_jac(p)[0], 1, jac=y_res_jac
            ),
        ),
        equality_constraints=(
            make_residual([0, 1], lambda p: x_eq_jac(p)[0], 1, jac=x_eq_jac),
        ),
        inequality_constraints=(
            (Var(1) >= 0.0, Var(1) <= np.pi) if with_inequalities else ()
        ),
    )


def _two_angle_params(max_qp_iterations):
    return NLSParams(
        max_iterations=50,
        max_qp_iterations=max_qp_iterations,
        relative_exit_tol=1e-12,
        absolute_first_derivative_tol=1e-10,
        absolute_exit_tol=1e-9,
        termination_kkt_tolerance=1e-6,
        max_line_search_iterations=10,
        equality_penalty_initial=0.01,
        line_search_strategy=LineSearchStrategy.ARMIJO_BACKTRACK,
        lambda_failure_init=0.001,
        armijo_search_tau=0.5,
        lambda_initial=0.001,
        min_lambda=1e-9,
    )


def test_two_angle_chain_equality_only():
    """Null-space SQP path: grid of starts, all must reach (0.45, 0.6)
    (nonlinear_test.cc:903-925)."""
    chain = make_two_angle_chain()
    problem = _two_angle_problem(chain, with_inequalities=False)
    params = _two_angle_params(max_qp_iterations=1)

    t0 = np.arange(0.1, np.pi / 2, 0.1)
    t1 = np.arange(-np.pi / 3, np.pi / 3, 0.1)
    g0, g1 = np.meshgrid(t0, t1)
    guesses = np.stack([g0.ravel(), g1.ravel()], axis=1)

    solve = jax.jit(
        jax.vmap(
            lambda x0: nls_solve(problem, params, x0, retraction=mod_pi_retraction)
        )
    )
    res = solve(jnp.asarray(guesses))

    final = jax.vmap(lambda x: chain.update(x).translation[:2])(res.x)
    err = np.abs(np.asarray(final) - np.array([0.45, 0.6])).max(axis=1)
    assert (err < 5e-5).all(), (
        f"{(err >= 5e-5).sum()} failed, max {err.max()}, "
        f"states {np.asarray(res.termination_state)[err >= 5e-5]}"
    )


def test_two_angle_chain_with_inequalities():
    """Interior-point SQP path with theta1 in [0, pi]
    (nonlinear_test.cc:927-958); line-search steps < 100."""
    chain = make_two_angle_chain()
    problem = _two_angle_problem(chain, with_inequalities=True)
    params = _two_angle_params(max_qp_iterations=10)

    t0 = np.arange(0.1, np.pi / 2, 0.1)
    t1 = np.arange(1e-3, np.pi / 2 - 1e-3, 0.1)
    g0, g1 = np.meshgrid(t0, t1)
    guesses = np.stack([g0.ravel(), g1.ravel()], axis=1)

    solve = jax.jit(
        jax.vmap(
            lambda x0: nls_solve(problem, params, x0, retraction=mod_pi_retraction)
        )
    )
    res = solve(jnp.asarray(guesses))

    final = jax.vmap(lambda x: chain.update(x).translation[:2])(res.x)
    err = np.abs(np.asarray(final) - np.array([0.45, 0.6])).max(axis=1)
    assert (err < 1e-3).all(), (
        f"{(err >= 1e-3).sum()} failed, max {err.max()}, "
        f"states {np.asarray(res.termination_state)[err >= 1e-3]}"
    )
    ls_steps = np.asarray(res.iterations.line_search.num_steps).sum(axis=1)
    assert (ls_steps < 100).all(), ls_steps.max()


def test_dual_actuator_balancing():
    """Two-legged balancing robot: feet pinned to the floor via nonlinear
    equality constraints, zero-moment soft cost, knee inequality
    (nonlinear_test.cc:966-1135)."""
    mask = (0, 0, 1, 0, 0, 0)
    off = (0, 0, 0, 0, 0, 0)
    qi = so3.quat_identity()

    def link(t, m):
        return ActuatorLink.create(Pose(qi, jnp.asarray(t)), m)

    origin = [0.0, 0.4, 0.0]
    chain_front = ActuatorChain(
        links=(
            link(origin, mask),
            link([0.25, 0.0, 0.0], mask),
            link([0.3, 0.0, 0.0], mask),
            link([0.3, 0.0, 0.0], off),
        )
    )
    chain_rear = ActuatorChain(
        links=(
            link(origin, mask),
            link([0.0, 0.0, 0.0], mask),
            link([0.3, 0.0, 0.0], mask),
            link([0.3, 0.0, 0.0], off),
        )
    )

    rear_foot_y, front_foot_y = 0.0, 0.05
    mu1, mu2 = 1.0, 2.0
    com_x = 0.15

    def level_cost(v):
        return 0.1 * v

    def rear_foot(v):
        return jnp.stack([chain_rear.update(v).translation[1] - rear_foot_y])

    def front_foot(v):
        return jnp.stack([chain_front.update(v).translation[1] - front_foot_y])

    def moments(v):
        rear = chain_rear.update(v[:3]).translation
        front = chain_front.update(jnp.stack([v[0], v[3], v[4]])).translation
        m = (
            mu1 * (rear[1] - front[1])
            + (rear[0] - com_x)
            + (front[0] - com_x) * mu1 / mu2
        )
        return jnp.stack([m])

    problem = Problem(
        dimension=5,
        costs=(
            make_residual([0], level_cost, 1),
            make_residual([0, 1, 2, 3, 4], moments, 1),
        ),
        equality_constraints=(
            make_residual([0, 1, 2], rear_foot, 1),
            make_residual([0, 3, 4], front_foot, 1),
        ),
        inequality_constraints=(Var(2) >= 0.0, Var(2) <= np.pi),
    )
    params = NLSParams(
        max_iterations=100,
        max_qp_iterations=5,
        relative_exit_tol=1e-12,
        absolute_first_derivative_tol=1e-10,
        absolute_exit_tol=1e-8,
        termination_kkt_tolerance=1e-6,
        max_line_search_iterations=5,
        line_search_strategy=LineSearchStrategy.ARMIJO_BACKTRACK,
        lambda_failure_init=0.01,
        armijo_search_tau=0.5,
        lambda_initial=0.001,
        min_lambda=1e-9,
    )
    guesses = np.array(
        [
            [np.pi / 6, -np.pi / 2, np.pi / 6, -np.pi / 2, np.pi / 4],
            [-np.pi / 4, -np.pi / 4, np.pi / 6, -np.pi / 3, -np.pi / 4],
            [-np.pi / 3, -np.pi / 2, 0.001, -np.pi / 2, 0.0],
        ]
    )
    solve = jax.jit(
        jax.vmap(
            lambda x0: nls_solve(problem, params, x0, retraction=mod_pi_retraction)
        )
    )
    res = solve(jnp.asarray(guesses))

    from mini_opt_tpu import NLSTerminationState

    assert (
        np.asarray(res.termination_state) == NLSTerminationState.SATISFIED_ABSOLUTE_TOL
    ).all(), np.asarray(res.termination_state)

    # All costs and constraints near zero at the solution.
    for x in np.asarray(res.x):
        xj = jnp.asarray(x)
        assert abs(float(rear_foot(xj[jnp.asarray([0, 1, 2])])[0])) ** 2 / 2 < 1e-8
        assert abs(float(front_foot(xj[jnp.asarray([0, 3, 4])])[0])) ** 2 / 2 < 1e-8
        assert float(level_cost(xj[:1])[0]) ** 2 / 2 < 1e-8
        assert float(moments(xj)[0]) ** 2 / 2 < 1e-8

    # Regression gate on total line-search work, at the reference's own bound
    # (nonlinear_test.cc:1131 asserts < 36; observed here: 9/17/32 per guess).
    ls_steps = np.asarray(res.iterations.line_search.num_steps).sum(axis=1)
    assert (ls_steps < 36).all(), ls_steps
