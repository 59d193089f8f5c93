"""Nonlinear inequality constraints via slack reformulation.

The reference explicitly does NOT support nonlinear inequality constraints:
its README lists them as a non-feature (/root/reference/README.md:35-38) and
the only inequalities in the QP layer are diagonal linear box constraints
(/root/reference/include/mini_opt/qp.hpp:28-70). This module lifts that
restriction the standard way (Nocedal & Wright, Numerical Optimization 2nd
ed., eq. 18.10-18.12): each user constraint ``g(x) >= 0`` gains a slack
vector ``s`` and becomes

    g(x) - s = 0      (nonlinear equality, handled by the L1-merit SQP loop)
    s >= 0            (diagonal box constraint, handled by the IP inner QP)

so the augmented problem is exactly of the class ``nls_solve`` already
handles -- no solver changes, full telemetry, vmap/shard compatible.

Differentiability: the lift composes with ``implicit.make_implicit_solver``
-- pass a ``problem_fn`` returning the AUGMENTED ``.problem`` and params from
``.params(base)``; the active-set KKT system then contains the slackened
equality row ``[grad g, -I]`` plus the active box row on the slack, which is
nonsingular whenever ``grad g != 0`` (LICQ). Gradients match the unrolled
``early_exit=False`` path with the keep-out active
(tests/test_implicit.py::test_implicit_grad_obstacle_ik_matches_unrolled).

Multiplier sign convention: at a solution with constraint ``i`` active, the
equality row ``g_i(x) - s_i = 0`` carries the same Lagrange multiplier as the
original inequality (KKT: ``grad f = sum_i lambda_i grad g_i`` with
``lambda_i >= 0``), recoverable from the augmented QP's ``y`` block.

Solver configuration: ``nls_solve`` accepts the
:class:`NonlinearInequalityProblem` wrapper directly and forces
``qp_initial_guess_method=NAIVE`` (also available explicitly via
``.params(base)``). The reference's structure-driven
SOLVE_EQUALITY_CONSTRAINED warm start clamps slacks exactly onto their bound
whenever the equality-only step violates ``s >= 0``; the ``s = max(1e-9, .)``
heuristic (qp.cc:470-481) then weights the slack identity block of ``A_eq``
by 1e-18 in the condensed system, and because slackened equality rows are
frequently dependent in the BASE columns (e.g. ``x0 >= a``, ``x1 >= b``,
``x0 + x1 >= c``), the condensed KKT matrix becomes exactly singular in f64.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .nonlinear import NLSParams, Problem
from .qp import Var
from .residual import Residual
from .structs import InitialGuessMethod


def _slackened(g: Residual, slack_index: Tuple[int, ...]) -> Residual:
    """``g(x) >= 0``  ->  equality residual ``g(x_g) - s`` over
    ``index = g.index + slack_index``."""
    p = len(g.index)

    def fn(xl):
        return g.fn(xl[:p]) - xl[p:]

    jac = None
    if g.jac is not None:

        def jac(xl):  # noqa: F811 - deliberate rebind
            r, J = g.jac(xl[:p])
            return r - xl[p:], jnp.concatenate(
                [J, -jnp.eye(g.dim, dtype=J.dtype)], axis=1
            )

    return Residual(fn=fn, index=tuple(g.index) + tuple(slack_index), dim=g.dim,
                    jac=jac)


@dataclasses.dataclass(frozen=True)
class NonlinearInequalityProblem:
    """An augmented :class:`Problem` whose trailing ``slack_dim`` variables
    are slacks for nonlinear inequality constraints ``g(x) >= 0``.

    Feed ``.problem`` and ``.initial_guess(x0)`` to ``nls_solve`` (or any
    batched wrapper); read the base solution back with ``.extract``.
    """

    problem: Problem
    base_dimension: int
    inequalities: Tuple[Residual, ...]

    @property
    def slack_dim(self) -> int:
        return self.problem.dimension - self.base_dimension

    def initial_guess(self, x0: jax.Array, margin: float = 1.0e-2) -> jax.Array:
        """Augment ``x0`` with slacks ``s = max(g(x0), margin)``.

        A strictly positive floor keeps the interior-point inner QP away from
        the boundary at the first linearization (the same role as the
        reference's ``s = max(1e-9, a x + b)`` guess heuristic, qp.cc:470-481)
        even when ``x0`` violates ``g``; the violation itself is driven out by
        the equality-penalty machinery.
        """
        vals = [jnp.maximum(g.error_vector(x0), margin) for g in self.inequalities]
        if not vals:
            return x0
        return jnp.concatenate([x0] + vals)

    def extract(self, x_aug: jax.Array) -> jax.Array:
        """Base-problem variables from an augmented iterate (batched OK)."""
        return x_aug[..., : self.base_dimension]

    def slacks(self, x_aug: jax.Array) -> jax.Array:
        return x_aug[..., self.base_dimension :]

    def wrap_retraction(self, retraction: Callable) -> Callable:
        """Lift a base-problem retraction to the augmented space: the user
        retraction acts on the first ``base_dimension`` coordinates, slacks
        update by plain addition."""
        n = self.base_dimension

        def retract(x, dx, alpha):
            head = retraction(x[:n], dx[:n], alpha)
            return jnp.concatenate([head, x[n:] + alpha * dx[n:]])

        return retract

    def constraint_values(self, x_aug: jax.Array) -> jax.Array:
        """Stacked ``g(x)`` at an augmented iterate (not the slacks: the true
        constraint values at the extracted base point). Batched inputs
        ``(B, n_aug)`` map over the leading axis (``Residual.error_vector``
        gathers along axis 0, so a raw batched call would gather batch rows
        instead of variables)."""
        if jnp.ndim(x_aug) > 1:
            return jax.vmap(self.constraint_values)(x_aug)
        x = self.extract(x_aug)
        return jnp.concatenate([g.error_vector(x) for g in self.inequalities])

    def params(self, base: Optional[NLSParams] = None) -> NLSParams:
        """A solver configuration safe for this augmented problem.

        Forces ``qp_initial_guess_method=NAIVE``: the structure-driven
        SOLVE_EQUALITY_CONSTRAINED warm start clamps slacks exactly onto
        their bound, which makes the condensed KKT matrix singular whenever
        slackened rows are dependent in the base columns (see module
        docstring). ``nls_solve`` applies the same override automatically
        when handed this wrapper directly.
        """
        base = base if base is not None else NLSParams()
        if base.qp_initial_guess_method == InitialGuessMethod.SOLVE_EQUALITY_CONSTRAINED:
            raise ValueError(
                "SOLVE_EQUALITY_CONSTRAINED warm starts are singular on "
                "slack-lifted problems; use NAIVE (the default here)"
            )
        return dataclasses.replace(
            base, qp_initial_guess_method=InitialGuessMethod.NAIVE
        )


def with_nonlinear_inequalities(
    problem: Problem,
    inequalities: Sequence[Residual],
    extra_costs_on_slack: Sequence[Residual] = (),
) -> NonlinearInequalityProblem:
    """Augment ``problem`` with nonlinear inequality constraints
    ``g_i(x) >= 0`` given as :class:`Residual` blocks.

    Returns a :class:`NonlinearInequalityProblem` whose ``problem`` has
    dimension ``problem.dimension + sum(g.dim)``: each ``g_i`` becomes the
    nonlinear equality ``g_i(x) - s_i = 0`` plus box rows ``s_i >= 0``
    (N&W 18.12). Existing costs / equalities / box constraints are untouched
    (their indices only reference base variables).

    ``extra_costs_on_slack`` may add regularizers over augmented indices
    (rarely needed; the slack columns of the Gauss-Newton Hessian are already
    filled by the ``-I`` Jacobian block of the slackened equalities).
    """
    ineqs = tuple(inequalities)
    n = problem.dimension
    for k, g in enumerate(ineqs):
        if max(g.index) >= n:
            raise ValueError(
                f"inequality residual {k} references variable "
                f"{max(g.index)} but the base problem has dimension {n}; "
                "indices in [n, n+slack_dim) would alias another "
                "constraint's slack column"
            )
    offset = n
    eqs = list(problem.equality_constraints)
    box = list(problem.inequality_constraints)
    for g in ineqs:
        sidx = tuple(range(offset, offset + g.dim))
        eqs.append(_slackened(g, sidx))
        box.extend(Var(j) >= 0.0 for j in sidx)
        offset += g.dim
    aug = Problem(
        dimension=offset,
        costs=tuple(problem.costs) + tuple(extra_costs_on_slack),
        equality_constraints=tuple(eqs),
        inequality_constraints=tuple(box),
    )
    return NonlinearInequalityProblem(
        problem=aug, base_dimension=n, inequalities=ineqs
    )
