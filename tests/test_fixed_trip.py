"""The fixed-trip (scan) loop configuration must produce results identical to
the early-exit while_loop configuration -- it is the same computation with a
frozen-carry mask instead of a loop exit."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mini_opt_tpu import (
    QP,
    QPInteriorPointParams,
    Var,
    make_residual,
    qp_ip_solve,
)
from mini_opt_tpu.nonlinear import NLSParams, Problem, nls_solve


def test_qp_fixed_trip_matches_while():
    rng = np.random.default_rng(0)
    n = 5
    G = np.eye(n)
    for _ in range(3 * n):
        v = rng.standard_normal(n)
        G += np.outer(v, v) / n
    qp = QP.create(
        G, rng.standard_normal(n),
        A_eq=rng.standard_normal((1, n)), b_eq=rng.standard_normal(1),
        constraints=[Var(0) >= -2.0, Var(3) <= 1.5],
    )
    base = QPInteriorPointParams(max_iterations=25, termination_kkt_tol=1e-10)
    res_w = qp_ip_solve(qp, base)
    res_s = qp_ip_solve(qp, dataclasses.replace(base, early_exit=False))
    np.testing.assert_allclose(np.asarray(res_s.x), np.asarray(res_w.x), atol=0)
    assert int(res_s.termination_state) == int(res_w.termination_state)
    assert int(res_s.num_iterations) == int(res_w.num_iterations)
    # History rows match too.
    for a, b in zip(jax.tree.leaves(res_w.iterations), jax.tree.leaves(res_s.iterations)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_nls_fixed_trip_matches_while():
    def rosenbrock(xy):
        return jnp.stack([1.0 - xy[0], 10.0 * (xy[1] - xy[0] * xy[0])])

    problem = Problem(
        dimension=2,
        costs=(make_residual([0, 1], rosenbrock, 2),),
        inequality_constraints=(Var(0) >= 1.2, Var(1) <= 0.5),
    )
    base = NLSParams(max_iterations=10, max_qp_iterations=10)
    x0s = jnp.asarray([[12.0, -5.0], [-20.0, 10.0], [0.3, 0.1]])

    res_w = jax.vmap(lambda x: nls_solve(problem, base, x))(x0s)
    fixed = dataclasses.replace(base, early_exit=False)
    res_s = jax.vmap(lambda x: nls_solve(problem, fixed, x))(x0s)
    np.testing.assert_allclose(np.asarray(res_s.x), np.asarray(res_w.x), atol=0)
    np.testing.assert_array_equal(
        np.asarray(res_s.termination_state), np.asarray(res_w.termination_state)
    )
    np.testing.assert_array_equal(
        np.asarray(res_s.num_iterations), np.asarray(res_w.num_iterations)
    )


def test_nls_no_history_matches():
    def rosenbrock(xy):
        return jnp.stack([1.0 - xy[0], 10.0 * (xy[1] - xy[0] * xy[0])])

    problem = Problem(dimension=2, costs=(make_residual([0, 1], rosenbrock, 2),))
    base = NLSParams(max_iterations=6, max_qp_iterations=1)
    x0 = jnp.asarray([-5.0, -3.0])
    res_full = nls_solve(problem, base, x0)
    res_lean = nls_solve(
        problem,
        dataclasses.replace(base, record_history=False, early_exit=False),
        x0,
    )
    np.testing.assert_allclose(np.asarray(res_lean.x), np.asarray(res_full.x), atol=0)
    assert int(res_lean.termination_state) == int(res_full.termination_state)
    assert res_lean.iterations.lam.shape == (0,)
