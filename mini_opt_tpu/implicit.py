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
EQUALITY constraints (the L1-merit stationary point satisfies the classic
KKT equations). Box-inequality constraints are not handled here -- at an
active bound the solution is nonsmooth in the data; use the unrolled path
(whose where-masked fixed-trip gradients are the subgradient-style answer)
for such problems.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .nonlinear import NLSParams, Problem, nls_solve


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
            [eq.error_vector(x) for eq in problem.equality_constraints]
        )
    else:
        g = jnp.zeros((0,), x.dtype)
    return f, g


def make_implicit_solver(
    problem_fn: Callable[..., Problem],
    params: NLSParams,
    retraction=None,
) -> Callable:
    """Build ``solve(data, x0) -> x*`` that is differentiable in ``data``
    through the KKT conditions at the solution.

    ``problem_fn(data) -> Problem`` must build a problem with costs and
    (optionally) equality constraints only.
    """

    def _kkt_residual(x, y, data):
        """F(x, y; data) = [grad f + (dg/dx)^T y ; g] -- zero at a KKT point."""
        problem = problem_fn(data)

        def f0(xx):
            return _problem_value_and_constraints(problem, xx)[0]

        def g0(xx):
            return _problem_value_and_constraints(problem, xx)[1]

        grad_f = jax.grad(f0)(x)
        g = g0(x)
        if g.shape[0] > 0:
            _, jg_vjp = jax.vjp(g0, x)
            (jg_t_y,) = jg_vjp(y)
            grad_l = grad_f + jg_t_y
        else:
            grad_l = grad_f
        return jnp.concatenate([grad_l, g])

    def _multipliers(x, data):
        """Least-squares multipliers at the solution:
        y* = -(Jg Jg^T)^-1 Jg grad_f."""
        problem = problem_fn(data)
        k = sum(eq.dim for eq in problem.equality_constraints)
        if k == 0:
            return jnp.zeros((0,), x.dtype)

        def f0(xx):
            return _problem_value_and_constraints(problem, xx)[0]

        def g0(xx):
            return _problem_value_and_constraints(problem, xx)[1]

        grad_f = jax.grad(f0)(x)
        Jg = jax.jacfwd(g0)(x)  # (k, n)
        rhs = -(Jg @ grad_f)
        JJt = Jg @ Jg.T + 1e-12 * jnp.eye(k, dtype=x.dtype)
        return jnp.linalg.solve(JJt, rhs)

    @jax.custom_vjp
    def solve(data, x0):
        return nls_solve(problem_fn(data), params, x0, retraction=retraction).x

    def solve_fwd(data, x0):
        x = solve(data, x0)
        return x, (data, x, x0)

    def solve_bwd(res, gx):
        data, x, x0 = res
        y = _multipliers(x, data)
        n, k = x.shape[0], y.shape[0]

        # dF/d(x, y) at the solution.
        def F_xy(xy):
            return _kkt_residual(xy[:n], xy[n:], data)

        xy = jnp.concatenate([x, y])
        A = jax.jacfwd(F_xy)(xy)  # (n+k, n+k)
        rhs = jnp.concatenate([gx, jnp.zeros((k,), gx.dtype)])
        lam = jnp.linalg.solve(A.T, rhs)

        # dtheta_bar = -lam^T dF/d(data) via vjp.
        _, f_vjp = jax.vjp(lambda d: _kkt_residual(x, y, d), data)
        (dbar,) = f_vjp(-lam)
        return dbar, jnp.zeros_like(x0)

    solve.defvjp(solve_fwd, solve_bwd)
    return solve
