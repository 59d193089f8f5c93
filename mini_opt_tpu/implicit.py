"""Implicit differentiation of solves via the KKT conditions.

Two ways to differentiate through this framework:

1. **Unrolled**: with ``early_exit=False`` every loop is a fixed-trip scan,
   so plain ``jax.grad``/``jacrev`` works end-to-end (tests/
   test_differentiable.py). Cost and memory grow with the iteration count.

2. **Implicit** (this module): apply the implicit function theorem to the
   stationarity conditions at the returned solution -- one linear solve in
   the backward pass, independent of how many iterations the forward solve
   took, and exact at a converged point. The standard pattern for bilevel
   optimization / learning-through-optimization (cf. jaxopt).

Supported problem class: sum-of-squares costs with optional nonlinear
EQUALITY constraints and diagonal box INEQUALITY constraints. Inequalities
are handled by an active-set KKT system: constraints within ``active_tol``
of their bound at the solution are treated as equalities (strict
complementarity assumed); inactive constraints contribute the trivial
equation ``z_m = 0`` so shapes stay static under jit. The resulting
gradients are exact wherever the active set is locally stable -- at a point
where the active set changes (a weakly-active bound) the solution map is
genuinely nonsmooth and this returns the one-sided derivative of the branch
the solver landed on.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .nonlinear import NLSParams, Problem, nls_solve
from .residual import constraint_rows


def _eq_rows(eq, x: jax.Array) -> jax.Array:
    """Flattened residual rows of one equality constraint -- a BlockResidual
    contributes constraint_rows(eq) rows via error_vectors (mirroring
    nonlinear.py's stacked-equality assembly)."""
    if hasattr(eq, "error_vectors"):
        return eq.error_vectors(x).ravel()
    return eq.error_vector(x)


def _problem_value_and_constraints(problem: Problem, x: jax.Array):
    """f0(x) = 0.5 sum ||h_i||^2 and stacked equality residuals g(x)."""
    f = jnp.zeros((), x.dtype)
    for cost in problem.costs:
        if hasattr(cost, "error_vectors"):
            r = cost.error_vectors(x)
        else:
            r = cost.error_vector(x)
        f = f + 0.5 * jnp.sum(r * r)
    if problem.equality_constraints:
        g = jnp.concatenate(
            [_eq_rows(eq, x) for eq in problem.equality_constraints]
        )
    else:
        g = jnp.zeros((0,), x.dtype)
    return f, g


def _ineq_values(problem: Problem, x: jax.Array) -> jax.Array:
    """Constraint values a_m * x[v_m] + b_m, shape (M,) (static indices)."""
    cons = problem.inequality_constraints
    if not cons:
        return jnp.zeros((0,), x.dtype)
    return jnp.stack(
        [
            jnp.asarray(c.a, x.dtype) * x[c.variable] + jnp.asarray(c.b, x.dtype)
            for c in cons
        ]
    )


def make_implicit_solver(
    problem_fn: Callable[..., Problem],
    params: NLSParams,
    retraction=None,
    active_tol: float = 1.0e-6,
) -> Callable:
    """Build ``solve(data, x0) -> x*`` that is differentiable in ``data``
    through the KKT conditions at the solution.

    ``problem_fn(data) -> Problem`` may build costs, equality constraints,
    and diagonal box inequality constraints (whose a/b offsets may themselves
    depend on ``data``). ``active_tol`` classifies a box constraint as active
    when |a x[v] + b| <= active_tol at the solution.
    """

    def _kkt_residual(x, y, z, act_mask, data):
        """F(x, y, z; data) = [grad f + Jg^T y + A_act^T z ;
                               g ;
                               act*(a x[v]+b) + (1-act)*z]  -- zero at a KKT
        point with the given active set (act_mask is a constant of the
        differentiation, computed from the forward solution)."""
        problem = problem_fn(data)

        def f0(xx):
            return _problem_value_and_constraints(problem, xx)[0]

        def g0(xx):
            return _problem_value_and_constraints(problem, xx)[1]

        grad_l = jax.grad(f0)(x)
        g = g0(x)
        if g.shape[0] > 0:
            _, jg_vjp = jax.vjp(g0, x)
            (jg_t_y,) = jg_vjp(y)
            grad_l = grad_l + jg_t_y
        vals = _ineq_values(problem, x)
        if vals.shape[0] > 0:
            _, ji_vjp = jax.vjp(lambda xx: _ineq_values(problem, xx), x)
            (ji_t_z,) = ji_vjp(act_mask * z)
            grad_l = grad_l + ji_t_z
            comp = act_mask * vals + (1.0 - act_mask) * z
        else:
            comp = vals
        return jnp.concatenate([grad_l, g, comp])

    def _multipliers(x, act_mask, data):
        """Least-squares multipliers (y, z) at the solution:
        minimize ||grad f + [Jg; A_act]^T [y; z]||."""
        problem = problem_fn(data)
        k = sum(constraint_rows(eq) for eq in problem.equality_constraints)
        m = len(problem.inequality_constraints)
        if k + m == 0:
            e = jnp.zeros((0,), x.dtype)
            return e, e

        def f0(xx):
            return _problem_value_and_constraints(problem, xx)[0]

        grad_f = jax.grad(f0)(x)
        rows = []
        if k > 0:
            rows.append(
                jax.jacfwd(
                    lambda xx: _problem_value_and_constraints(problem, xx)[1]
                )(x)
            )
        if m > 0:
            Ji = jax.jacfwd(lambda xx: _ineq_values(problem, xx))(x)
            rows.append(act_mask[:, None] * Ji)
        J_all = jnp.concatenate(rows, axis=0)  # (k+m, n)
        JJt = J_all @ J_all.T + 1e-12 * jnp.eye(k + m, dtype=x.dtype)
        mult = jnp.linalg.solve(JJt, -(J_all @ grad_f))
        y = mult[:k]
        z = act_mask * mult[k:] if m > 0 else jnp.zeros((0,), x.dtype)
        return y, z

    @jax.custom_vjp
    def solve(data, x0):
        return nls_solve(problem_fn(data), params, x0, retraction=retraction).x

    def solve_fwd(data, x0):
        x = solve(data, x0)
        return x, (data, x, x0)

    def solve_bwd(res, gx):
        data, x, x0 = res
        problem = problem_fn(data)
        m = len(problem.inequality_constraints)
        vals = _ineq_values(problem, x)
        act_mask = (
            (jnp.abs(vals) <= active_tol).astype(x.dtype)
            if m > 0
            else jnp.zeros((0,), x.dtype)
        )
        act_mask = jax.lax.stop_gradient(act_mask)
        y, z = _multipliers(x, act_mask, data)
        n, k = x.shape[0], y.shape[0]

        # dF/d(x, y, z) at the solution.
        def F_xyz(xyz):
            return _kkt_residual(
                xyz[:n], xyz[n : n + k], xyz[n + k :], act_mask, data
            )

        xyz = jnp.concatenate([x, y, z])
        A = jax.jacfwd(F_xyz)(xyz)  # (n+k+m, n+k+m)
        rhs = jnp.concatenate([gx, jnp.zeros((k + m,), gx.dtype)])
        lam = jnp.linalg.solve(A.T, rhs)

        # dtheta_bar = -lam^T dF/d(data) via vjp.
        _, f_vjp = jax.vjp(
            lambda d: _kkt_residual(x, y, z, act_mask, d), data
        )
        (dbar,) = f_vjp(-lam)
        return dbar, jnp.zeros_like(x0)

    solve.defvjp(solve_fwd, solve_bwd)
    return solve
