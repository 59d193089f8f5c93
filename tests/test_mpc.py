"""MPC family: cart-pole direct-transcription trajectory optimization and
the receding-horizon servo loop.

This is the workload the reference library was written for (its problem
statement, nonlinear.hpp:11-32, is a direct-transcription optimal-control
problem: residual costs + nonlinear dynamics equality constraints + box
actuation limits). Tests follow the reference idioms: numerical-Jacobian
oracles for hand-assembled residuals (nonlinear_test.cc:21-39) and
many-start convergence sweeps with termination-state predicates.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mini_opt_tpu import termination_state_indicates_satisfied_tol
from mini_opt_tpu.models import mpc
from mini_opt_tpu.utils.numerical import numerical_jacobian

CP = mpc.CartPole()


def _simulate(cp, x0, us, dt):
    """Roll the plant forward under a control sequence."""
    xs = [x0]
    for u in us:
        xs.append(mpc.rk4_step(cp, xs[-1], u, dt))
    return jnp.stack(xs[1:])


def test_defect_residual_jacobian_vs_numeric():
    """Every dynamics-defect residual's jacfwd Jacobian matches a numerical
    oracle (the reference's TestResidualFunctionDerivative pattern)."""
    T, dt = 5, 0.05
    x0 = jnp.array([0.1, -0.2, 0.4, 0.3])
    problem = mpc.make_cartpole_mpc_problem(CP, x0, T, dt)
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=mpc.mpc_dimension(T)) * 0.3)
    for res in problem.equality_constraints:
        xl = res.gather(z)
        _, jac = res.error_and_jacobian(z)
        jac_num = numerical_jacobian(res.fn, xl)
        np.testing.assert_allclose(jac, jac_num, atol=1e-6)


def test_single_solve_dynamics_and_bounds():
    """Stabilization solve: dynamics defects at f64 tolerance, the returned
    trajectory IS the plant rollout of the returned controls, and actuation
    bounds hold (the saturating instance keeps them active)."""
    T, dt, u_max = 20, 0.05, 10.0
    x0 = jnp.array([0.0, 0.0, 0.35, 0.0])
    res = mpc.solve_mpc(CP, x0, T, dt, u_max=u_max)
    assert bool(termination_state_indicates_satisfied_tol(res.termination_state))
    assert float(res.errors.equality) < 1e-9

    us, X = mpc.split_z(res.x, T)
    np.testing.assert_allclose(_simulate(CP, x0, us, dt), X, atol=1e-8)
    assert float(jnp.max(jnp.abs(us))) <= u_max + 1e-7
    # This instance demands saturation: the bound is genuinely active.
    assert float(jnp.max(jnp.abs(us))) > u_max - 1e-3
    # The horizon ends near upright.
    assert abs(float(X[-1, 2])) < 0.05


def test_track_limit_constrains_position():
    """With p_max the cart stays on the track; without it the same instance
    travels beyond the limit (the constraint is doing real work)."""
    T, dt, p_max = 20, 0.05, 0.45
    x0 = jnp.array([0.0, 0.0, 0.35, 0.0])
    free = mpc.solve_mpc(CP, x0, T, dt)
    lim = mpc.solve_mpc(CP, x0, T, dt, p_max=p_max)
    assert bool(termination_state_indicates_satisfied_tol(lim.termination_state))
    _, X_free = mpc.split_z(free.x, T)
    _, X_lim = mpc.split_z(lim.x, T)
    assert float(jnp.max(jnp.abs(X_free[:, 0]))) > p_max  # unconstrained exceeds
    assert float(jnp.max(jnp.abs(X_lim[:, 0]))) <= p_max + 1e-7
    assert float(lim.errors.equality) < 1e-9


def test_shift_warm_start_semantics():
    """u shifts left (last repeated); states shift left; the new terminal
    state is one integration step from the last shifted pair."""
    T, dt = 6, 0.05
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.normal(size=mpc.mpc_dimension(T)))
    z2 = mpc.shift_warm_start(CP, z, T, dt)
    u, X = mpc.split_z(z, T)
    u2, X2 = mpc.split_z(z2, T)
    np.testing.assert_allclose(u2[:-1], u[1:])
    np.testing.assert_allclose(u2[-1], u[-1])
    np.testing.assert_allclose(X2[:-1], X[1:])
    np.testing.assert_allclose(X2[-1], mpc.rk4_step(CP, X[-1], u2[-1], dt))


def test_rollout_stabilizes_and_rejects_disturbance():
    """Jitted receding-horizon loop: the pole reaches upright, a mid-run
    impulse visibly perturbs it, the loop re-stabilizes, and actuation
    bounds hold throughout."""
    n_steps, T, dt = 40, 20, 0.05
    x0 = jnp.array([0.0, 0.0, 0.25, 0.0])
    dist = jnp.zeros((n_steps,)).at[20].set(6.0)  # impulse force on the plant

    roll = jax.jit(
        lambda x, d: mpc.mpc_rollout(CP, x, n_steps, T, dt, disturbance=d)
    )
    states, us, merits, terms = roll(x0, dist)
    # Stabilized before the impulse...
    assert abs(float(states[20, 2])) < 0.05
    # ...the impulse measurably deflects the pole...
    assert abs(float(states[22, 2] - states[20, 2])) > 0.015
    # ...and the loop re-stabilizes.
    assert abs(float(states[-1, 2])) < 0.05
    assert float(jnp.max(jnp.abs(us))) <= 10.0 + 1e-6
    assert states.shape == (n_steps + 1, mpc.NX) and us.shape == (n_steps,)


def test_serving_params_pair():
    params, warm = mpc.serving_mpc_params(jnp.float32, horizon=20, warm=(2, 2, 1))
    assert params.kkt_solver == warm.kkt_solver == "riccati:20:4:1"
    assert (warm.max_iterations, warm.max_qp_iterations,
            warm.max_line_search_iterations) == (2, 2, 1)
    assert not params.early_exit and not warm.early_exit


def test_rollout_warm_budget_matches_full_budget():
    """Serving lever: the lean warm-start budget for periods 1..n-1 (cold
    first period keeps the full budget) must hold the same control quality --
    stabilization, bounds, and a trajectory close to the full-budget loop."""
    import dataclasses

    n_steps, T, dt = 30, 20, 0.05
    x0 = jnp.array([0.1, 0.0, 0.3, 0.0])
    params = mpc.default_mpc_params(x0.dtype, early_exit=False, horizon=T)
    warm = dataclasses.replace(
        params, max_iterations=3, max_qp_iterations=3,
        max_line_search_iterations=2,
    )
    roll_full = jax.jit(lambda x: mpc.mpc_rollout(CP, x, n_steps, T, dt, params=params))
    roll_warm = jax.jit(
        lambda x: mpc.mpc_rollout(CP, x, n_steps, T, dt, params=params, warm_params=warm)
    )
    sf, uf, _, _ = roll_full(x0)
    sw, uw, _, _ = roll_warm(x0)
    assert abs(float(sw[-1, 2])) < 0.05  # stabilized
    assert float(jnp.max(jnp.abs(uw))) <= 10.0 + 1e-5  # actuation bounds hold
    # Trajectories stay close (same controller up to budget truncation).
    assert float(jnp.max(jnp.abs(sw - sf))) < 0.05, float(
        jnp.max(jnp.abs(sw - sf))
    )
    # The first (cold) period is identical by construction.
    np.testing.assert_allclose(float(uw[0]), float(uf[0]), atol=1e-6)


def test_implicit_feedback_gain_matches_lqr():
    """Differentiable MPC oracle: at the upright equilibrium the implicit
    du_0/dx_plant of the MPC solve equals the finite-horizon LQR gain -K_0
    computed by an independent Riccati recursion on the linearized plant
    (the transcription's KKT system at z*=0 IS that LQR problem)."""
    T, dt = 10, 0.05
    gain = mpc.mpc_feedback_gain(CP, jnp.zeros((mpc.NX,)), T, dt)
    K0 = mpc.finite_horizon_lqr_gain(CP, T, dt)
    np.testing.assert_allclose(gain, -K0[0], rtol=1e-6, atol=1e-8)


def test_implicit_gradient_matches_unrolled():
    """Away from the equilibrium (interior, no saturation): the implicit
    gradient of a scalar loss on the policy output matches differentiating
    through the unrolled fixed-trip solve."""
    import dataclasses as _dc

    T, dt = 8, 0.05
    x_op = jnp.array([0.05, -0.02, 0.1, 0.03])
    params = mpc.default_mpc_params(jnp.float64, early_exit=False)
    solve = mpc.make_implicit_mpc_solver(CP, T, dt, params=params)
    z0 = mpc.initial_guess(CP, x_op, T, dt)

    def loss_implicit(x):
        return solve(x, z0)[mpc.u_index(0)] ** 2

    def loss_unrolled(x):
        problem = mpc.make_cartpole_mpc_problem(CP, x, T, dt)
        res = mpc.nls_solve(problem, params, z0)
        return res.x[mpc.u_index(0)] ** 2

    gi = jax.grad(loss_implicit)(x_op)
    gu = jax.grad(loss_unrolled)(x_op)
    np.testing.assert_allclose(gi, gu, rtol=1e-5, atol=1e-8)


def test_implicit_gradient_with_saturated_actuation():
    """With u_0 pinned at the actuation bound, the policy is locally constant
    in the plant state: the active-set implicit gradient is ~0 and agrees
    with the unrolled derivative."""
    T, dt, u_max = 12, 0.05, 3.0
    x_op = jnp.array([0.0, 0.0, 0.35, 0.0])  # demands |u0| = u_max
    params = mpc.default_mpc_params(jnp.float64, early_exit=False)
    solve = mpc.make_implicit_mpc_solver(CP, T, dt, params=params, u_max=u_max)
    z0 = mpc.initial_guess(CP, x_op, T, dt)
    z_star = solve(x_op, z0)
    assert abs(abs(float(z_star[0])) - u_max) < 1e-6  # genuinely saturated

    g = jax.jacrev(lambda x: solve(x, z0)[mpc.u_index(0)])(x_op)
    np.testing.assert_allclose(g, jnp.zeros((mpc.NX,)), atol=1e-7)


def test_rollout_batch_matches_single():
    """vmapped fleet == per-plant rollouts (batching changes nothing)."""
    n_steps, T, dt = 12, 10, 0.05
    x_init = jnp.array(
        [[0.0, 0.0, 0.3, 0.0], [0.2, -0.1, -0.45, 0.2]]
    )
    bs, bu, bm, bt = mpc.mpc_rollout_batch(CP, x_init, n_steps, T, dt)
    assert bs.shape == (2, n_steps + 1, mpc.NX)
    for b in range(2):
        s, u, m, t = mpc.mpc_rollout(CP, x_init[b], n_steps, T, dt)
        np.testing.assert_allclose(bs[b], s, atol=1e-9)
        np.testing.assert_allclose(bu[b], u, atol=1e-9)
        np.testing.assert_array_equal(bt[b], t)


def test_nonlinear_state_constraint_tip_wall():
    """Nonlinear state constraints compose with the MPC transcription through
    the slack lift (ineq.py): keep the pole TIP x-position p + l sin(theta)
    behind a wall the unconstrained swing crosses. The optimal trajectory
    rides the wall (active constraint) while the dynamics defects stay exact
    -- a constraint class the reference cannot express at all."""
    import dataclasses

    from mini_opt_tpu import InitialGuessMethod, make_residual
    from mini_opt_tpu.ineq import with_nonlinear_inequalities
    from mini_opt_tpu.nonlinear import nls_solve

    T, dt = 10, 0.06
    x0 = jnp.array([0.0, 0.8, 0.3, 0.0])
    base = mpc.make_cartpole_mpc_problem(CP, x0, T, dt)
    params = mpc.default_mpc_params(jnp.float64, max_iterations=20)
    z0 = mpc.initial_guess(CP, x0, T, dt)

    def tips(z):
        xs = jnp.stack(
            [z[jnp.array(mpc.x_indices(T, t))] for t in range(1, T + 1)]
        )
        return xs[:, 0] + CP.length * jnp.sin(xs[:, 2])

    res0 = nls_solve(base, params, z0)
    assert bool(termination_state_indicates_satisfied_tol(res0.termination_state))
    wall = float(jnp.max(tips(res0.x))) - 0.05  # 5 cm inside the free swing

    gs = tuple(
        make_residual(
            mpc.x_indices(T, t),
            lambda xl, w=wall, length=CP.length: jnp.array(
                [w - (xl[0] + length * jnp.sin(xl[2]))]
            ),
            1,
        )
        for t in range(1, T + 1)
    )
    aug = with_nonlinear_inequalities(base, gs)
    params_n = dataclasses.replace(
        params,
        qp_initial_guess_method=InitialGuessMethod.NAIVE,
        max_iterations=30,
    )
    res = jax.jit(lambda z: nls_solve(aug.problem, params_n, z))(
        aug.initial_guess(z0)
    )
    assert bool(termination_state_indicates_satisfied_tol(res.termination_state))
    g = np.asarray(aug.constraint_values(res.x))
    assert g.min() >= -1.0e-8          # wall never crossed
    assert g.min() < 1.0e-6            # ... and genuinely active (rides it)
    assert float(res.errors.equality) < 1.0e-10  # dynamics defects exact


def test_goal_accepts_plain_sequence():
    """A list/tuple goal must be accepted like any array-like (round-3
    advisor finding: goal.astype assumed a jax array)."""
    T, dt = 4, 0.05
    x0 = jnp.array([0.1, 0.0, 0.2, 0.0])
    goal_list = [0.5, 0.0, 0.0, 0.0]
    p_list = mpc.make_cartpole_mpc_problem(CP, x0, T, dt, goal=goal_list)
    p_arr = mpc.make_cartpole_mpc_problem(
        CP, x0, T, dt, goal=jnp.asarray(goal_list, x0.dtype)
    )
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.normal(size=mpc.mpc_dimension(T)) * 0.3, x0.dtype)
    fl = sum(float(jnp.sum(c.error_vectors(z) ** 2)) if hasattr(c, "error_vectors")
             else float(jnp.sum(c.error_vector(z) ** 2)) for c in p_list.costs)
    fa = sum(float(jnp.sum(c.error_vectors(z) ** 2)) if hasattr(c, "error_vectors")
             else float(jnp.sum(c.error_vector(z) ** 2)) for c in p_arr.costs)
    assert fl == fa
