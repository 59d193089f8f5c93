"""End-to-end differentiability: with fixed-trip loops (early_exit=False) the
entire constrained solve is reverse-mode differentiable -- d(solution)/d(data)
by jacrev straight through SQP + interior point + line search. (A capability
the reference cannot express; useful for bilevel problems / learning.)
"""

import jax
import jax.numpy as jnp
import numpy as np

from mini_opt_tpu import Var, make_residual
from mini_opt_tpu.nonlinear import NLSParams, Problem, nls_solve

PARAMS = NLSParams(
    max_iterations=4,
    max_qp_iterations=3,
    record_history=False,
    early_exit=False,
)


def test_jacrev_through_unconstrained_solve():
    """min ||x - t||^2 has x*(t) = t, so dx*/dt = I."""

    def solve(target):
        problem = Problem(
            dimension=2,
            costs=(make_residual([0, 1], lambda v: v - target, 2),),
        )
        return nls_solve(problem, PARAMS, jnp.zeros(2)).x

    J = jax.jacrev(solve)(jnp.asarray([0.3, -0.7]))
    np.testing.assert_allclose(np.asarray(J), np.eye(2), atol=1e-3)


def test_jacrev_through_constrained_solve():
    """With an ACTIVE bound x0 <= c the solution is (c, t1): dx*/dt has a
    zero row for the pinned coordinate, and dx0*/dc = 1."""

    def solve(inputs):
        target, bound = inputs[:2], inputs[2]
        problem = Problem(
            dimension=2,
            costs=(make_residual([0, 1], lambda v: v - target, 2),),
            inequality_constraints=(Var(0) <= bound,),
        )
        return nls_solve(problem, PARAMS, jnp.zeros(2)).x

    inputs = jnp.asarray([0.8, -0.4, 0.25])  # bound 0.25 < target 0.8: active
    x = solve(inputs)
    np.testing.assert_allclose(np.asarray(x), [0.25, -0.4], atol=1e-4)
    J = np.asarray(jax.jacrev(solve)(inputs))
    assert np.isfinite(J).all()
    # x0 pinned at the bound: insensitive to target, sensitive to the bound.
    np.testing.assert_allclose(J[0], [0.0, 0.0, 1.0], atol=5e-3)
    np.testing.assert_allclose(J[1], [0.0, 1.0, 0.0], atol=5e-3)


def test_grad_of_outer_objective():
    """Bilevel pattern: gradient of an outer loss of the inner solution."""

    def outer_loss(target):
        problem = Problem(
            dimension=2,
            costs=(make_residual([0, 1], lambda v: v - target, 2),),
        )
        x = nls_solve(problem, PARAMS, jnp.zeros(2)).x
        return jnp.sum((x - 1.0) ** 2)

    g = jax.grad(outer_loss)(jnp.asarray([0.3, -0.7]))
    # d/dt ||t - 1||^2 = 2 (t - 1)
    np.testing.assert_allclose(
        np.asarray(g), 2 * (np.array([0.3, -0.7]) - 1.0), atol=1e-3
    )


def test_grad_through_pose_graph_solve():
    """Gradient of an outer loss through a complete SE(2) pose-graph solve
    wrt the edge MEASUREMENTS (the 'learning from SLAM' surface: calibrate
    sensor offsets by differentiating the optimizer), fixed-trip loops,
    pinned against central finite differences."""
    import dataclasses

    import numpy as np

    from mini_opt_tpu.models.pose_graph import (
        default_pose_graph_params,
        make_pose_graph_problem,
        pose_graph_retraction,
    )
    from mini_opt_tpu.nonlinear import nls_solve

    n = 6
    rng = np.random.default_rng(3)
    edges = [[i, i + 1] for i in range(n - 1)] + [[n - 1, 0]]
    # A consistent-ish loop with noise.
    meas0 = np.asarray(
        [[1.0, 0.0, 2 * np.pi / n]] * len(edges)
    ) + rng.normal(0, 0.02, (len(edges), 3))
    w = jnp.ones((len(edges),))
    params = default_pose_graph_params(jnp.float64, max_iterations=8)
    params = dataclasses.replace(
        params, record_history=False, early_exit=False
    )
    x0 = jnp.zeros((3 * n,), jnp.float64)

    def loss(meas):
        problem = make_pose_graph_problem(n, edges, meas, w)
        res = nls_solve(problem, params, x0, retraction=pose_graph_retraction)
        return jnp.sum(res.x[3:6] ** 2)  # position+heading of pose 1

    g = np.asarray(jax.grad(loss)(jnp.asarray(meas0)))
    # Central differences on a few random entries.
    eps = 1e-6
    checked = 0
    for (i, j) in [(0, 0), (0, 2), (2, 1), (5, 2)]:
        dm = np.zeros_like(meas0)
        dm[i, j] = eps
        f_p = float(loss(jnp.asarray(meas0 + dm)))
        f_m = float(loss(jnp.asarray(meas0 - dm)))
        fd = (f_p - f_m) / (2 * eps)
        np.testing.assert_allclose(g[i, j], fd, rtol=2e-5, atol=1e-9)
        checked += 1
    assert checked == 4 and np.isfinite(g).all()
