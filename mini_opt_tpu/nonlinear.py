"""Nonlinear layer: the SQP / Levenberg-Marquardt constrained NLS driver.

TPU-native redesign of the reference outer loop
(/root/reference/include/mini_opt/nonlinear.hpp:33-157,
source/nonlinear.cc:13-605). The callback-oriented, exception-throwing C++
driver becomes one pure function built from nested ``lax.while_loop``s:

* outer loop carry = (x, lambda, penalty, LM state, status, histories); the
  lambda/restore state machine (nonlinear.cc:296-343) is branchless
  ``jnp.where`` arithmetic on that carry;
* the line search (nonlinear.cc:351-443) is an inner while_loop with the
  quadratic -> cubic polynomial fits in closed form;
* termination is a status lattice identical to NLSTerminationState
  (structs.hpp:233-248) -- the semantics the reference test-suite asserts on;
* the whole solve jits, vmaps over problem batches, and differentiates.

Solving ``min 0.5 sum ||h_i(x)||^2  s.t. g(x) = 0, a x[v] + b >= 0`` via
linearize -> QP -> L1-merit line search, per Nocedal & Wright ch. 18.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from .qp import (
    QP,
    LinearInequalityConstraint,
    QPInteriorPointParams,
    bounded_loop,
    qp_ip_solve,
    qp_null_space_solve,
    resolve_early_exit,
)
from .residual import (
    BlockResidual,
    Residual,
    accumulate_hessian,
    accumulate_hessian_block,
    constraint_rows,
    fill_jacobian_rows,
)
from .structs import (
    BarrierStrategy,
    DirectionalDerivatives,
    Errors,
    InitialGuessMethod,
    LineSearchHistory,
    LineSearchStrategy,
    NLSIterationHistory,
    NLSResult,
    NLSTerminationState,
    OptimizerState,
    QPEigenvalues,
    QPNullSpaceTerminationState,
    QPSolverVariant,
    QPTerminationState,
    StepSizeSelectionResult,
)
from .utils.tracing import annotate, traced_phase

Retraction = Callable[[jax.Array, jax.Array, jax.Array], jax.Array]
CostTerm = Union[Residual, BlockResidual]


@dataclasses.dataclass(frozen=True)
class Problem:
    """Constrained NLS problem definition (nonlinear.hpp:33-52).

    Static structure; residual functions may close over traced data when the
    problem is constructed inside a jitted caller.
    """

    dimension: int
    costs: Tuple[CostTerm, ...] = ()
    equality_constraints: Tuple[Residual, ...] = ()
    inequality_constraints: Tuple[LinearInequalityConstraint, ...] = ()

    @property
    def total_eq_dim(self) -> int:
        from .residual import constraint_rows as _rows

        return sum(_rows(c) for c in self.equality_constraints)


@dataclasses.dataclass(frozen=True)
class NLSParams:
    """Outer-loop configuration; analog of the 22-knob Params struct
    (nonlinear.hpp:64-124), frozen/hashable for use as a jit static arg."""

    max_iterations: int = 10
    max_qp_iterations: int = 10
    termination_kkt_tolerance: float = 1.0e-6
    absolute_exit_tol: float = 1.0e-12
    relative_exit_tol: float = 1.0e-5
    absolute_first_derivative_tol: float = 1.0e-6
    max_line_search_iterations: int = 2
    line_search_strategy: LineSearchStrategy = (
        LineSearchStrategy.POLYNOMIAL_APPROXIMATION
    )
    armijo_search_tau: float = 0.8
    equality_penalty_initial: float = 1.0
    equality_penalty_scale_factor: float = 1.01
    equality_penalty_rho: float = 0.1
    lambda_initial: float = 0.0
    lambda_failure_init: float = 1.0e-2
    lambda_decrease_on_success: float = 0.1
    lambda_decrease_on_restore: float = 0.8
    max_lambda: float = 1.0
    min_lambda: float = 0.0
    armijo_c1: float = 1.0e-4
    # Condensed-KKT factorization backend (ops/kkt.py). "auto" (default)
    # resolves at trace time: ldlt on TPU (lu_factor's lowering crashes the
    # TPU compiler when nested in solver loops; see CLAUDE.md), lu elsewhere
    # -- so NLSParams() just works on the chip, matching the reference whose
    # defaults need no hardware knowledge (nonlinear.hpp:64-124).
    kkt_solver: str = "auto"
    # False drops all per-iteration telemetry buffers (throughput path);
    # incompatible with exit_callback.
    record_history: bool = True
    # False replaces every data-dependent while_loop (outer SQP, inner QP,
    # line search) with fixed-trip scans -- the batched-TPU configuration.
    # None (default) = auto: fixed-trip on TPU (static loop structure
    # compiles far faster, avoids an XLA-TPU memory-space-assignment crash,
    # and under vmap a while_loop runs to the slowest lane anyway),
    # while_loop elsewhere.
    early_exit: Optional[bool] = None
    # Record min/max/abs-min eigenvalues of the QP hessian G per iteration
    # (nonlinear.hpp:122-123 / qp.cc:12-16). Requires record_history.
    log_qp_eigenvalues: bool = False
    # Barrier decrease rate of the inner QP (the reference hard-codes 0.1,
    # nonlinear.cc:230); smaller = fewer inner iterations to reach the
    # complementarity tolerance, at some robustness cost.
    qp_sigma: float = 0.1
    # Barrier schedule of the inner QP. The reference hard-codes
    # COMPLEMENTARITY (nonlinear.cc:226-239); Mehrotra PREDICTOR_CORRECTOR
    # converges borderline instances the plain schedule loses at tight
    # iteration budgets (see ops/pallas_ik.py).
    qp_barrier_strategy: BarrierStrategy = BarrierStrategy.COMPLEMENTARITY
    # Scan unroll factor for the INNER fixed-trip loops (QP iterations and
    # line search) when early_exit=False: fuses iterations to cut dispatch
    # overhead; compile time grows with the unrolled body count.
    inner_unroll: int = 1
    # Scan unroll factor for the OUTER fixed-trip SQP loop (early_exit=False
    # only): hands XLA a straight-line program so fusion crosses iteration
    # boundaries -- the main dispatch-overhead lever for batched throughput.
    outer_unroll: int = 1
    # Evaluate ALL Armijo backtracking probes (alpha = tau^i is a fixed
    # schedule) in one batched call and select the first acceptance --
    # semantically identical to the sequential loop, but one fused kernel
    # instead of max_line_search_iterations+1 dispatch rounds. Requires
    # ARMIJO_BACKTRACK.
    parallel_line_search: bool = False
    # Inner-QP engine. "default" = qp.py::qp_ip_solve (full telemetry,
    # early exit, any kkt_solver). "pallas_fused" = the whole fixed-trip
    # interior-point loop as ONE lane-batched Pallas kernel under vmap
    # (ops/pallas_qp.py) -- the batched throughput configuration; requires
    # record_history=False (no per-QP-iteration telemetry is materialized).
    # "cg" = matrix-free preconditioned conjugate-gradient Gauss-Newton step:
    # the (N, N) Hessian is never materialized ((J^T J + lambda I) v products
    # run through jvp/vjp of the stacked residual), which is the large-N path
    # (1000+ pose graphs) the dense assembly cannot reach. Costs + diagonal
    # box inequality constraints (handled by two-metric gradient projection:
    # masked CG on the free set, projected line search); no equality
    # constraints.
    qp_solver: str = "default"
    # CG iterations per outer step for qp_solver="cg" (fixed-trip scan).
    cg_iterations: int = 50
    # With parallel_line_search: every probe computes its full linearization
    # (errors fall out of it) and the winner's raw QP is carried to the next
    # iteration, eliminating the standalone per-iteration linearize pass.
    # Identical results in exact arithmetic; extra (discarded) Jacobian work
    # per losing probe, which is free on TPU where the path is launch-bound.
    fuse_probe_linearize: bool = False
    # Inner-QP initial-guess override. None = the reference's structure-driven
    # choice (SOLVE_EQUALITY_CONSTRAINED iff equality constraints exist,
    # nonlinear.cc:226-239). Slack-reformulated nonlinear inequalities
    # (ineq.py) need NAIVE: the equality-constrained guess clamps slacks onto
    # their bound, the s=max(1e-9,.) heuristic (qp.cc:470-481) then sets
    # Sigma=z/s=1e18, and since slackened equality rows are often linearly
    # dependent in the base columns (independent only through the slack
    # identity block, now weighted 1e-18), the condensed KKT system is
    # EXACTLY singular in f64 -> FAILED_FACTORIZATION.
    qp_initial_guess_method: Optional[InitialGuessMethod] = None

    def __post_init__(self):
        # Eager validation mirroring CheckParams (nonlinear.cc:49-73).
        assert self.max_iterations >= 0
        assert self.max_qp_iterations >= 1
        assert self.termination_kkt_tolerance > 0
        assert self.absolute_exit_tol > 0
        assert self.max_line_search_iterations >= 0
        assert 0 <= self.relative_exit_tol <= 1
        assert self.absolute_first_derivative_tol >= 0
        assert 0 < self.armijo_search_tau < 1
        assert self.equality_penalty_initial >= 0
        assert self.equality_penalty_scale_factor >= 1.0
        assert 0 <= self.equality_penalty_rho < 1
        assert self.max_lambda >= 0
        assert self.min_lambda <= self.max_lambda
        assert self.min_lambda <= self.lambda_initial <= self.max_lambda
        assert self.lambda_failure_init >= 0
        assert 0 <= self.lambda_decrease_on_success < 1.0
        assert 0 <= self.lambda_decrease_on_restore < 1.0
        assert not (
            self.parallel_line_search
            and self.line_search_strategy != LineSearchStrategy.ARMIJO_BACKTRACK
        ), "parallel_line_search requires ARMIJO_BACKTRACK (polynomial probes depend on previous probe values)"
        assert self.qp_solver in ("default", "pallas_fused", "cg")
        assert self.cg_iterations >= 1
        assert not (self.fuse_probe_linearize and not self.parallel_line_search), (
            "fuse_probe_linearize requires parallel_line_search"
        )
        assert not (self.fuse_probe_linearize and self.qp_solver == "cg")
        assert self.qp_initial_guess_method != InitialGuessMethod.USER_PROVIDED, (
            "the NLS driver owns the inner-QP state; USER_PROVIDED warm "
            "starts enter through x0 of nls_solve itself"
        )
        assert not (self.qp_solver == "pallas_fused" and self.record_history), (
            "qp_solver='pallas_fused' runs the whole inner loop in one kernel "
            "and materializes no per-QP-iteration telemetry; set "
            "record_history=False"
        )


# ---------------------------------------------------------------------------
# Linearization / evaluation.
# ---------------------------------------------------------------------------


def _linearize_raw(
    problem: Problem, x: jax.Array, axis_name: Optional[str] = None
) -> Tuple[QP, Errors]:
    """Gauss-Newton assembly WITHOUT the LM damping term (the raw
    linearization is lambda-independent, so it can be carried across
    iterations by the fused probe-linearize path)."""
    n = problem.dimension
    dtype = x.dtype
    G = jnp.zeros((n, n), dtype)
    c = jnp.zeros((n,), dtype)
    f_total = jnp.zeros((), dtype)
    for cost in problem.costs:
        if isinstance(cost, BlockResidual):
            G, c, f = accumulate_hessian_block(G, c, cost, x)
        else:
            G, c, f = accumulate_hessian(G, c, cost, x)
        f_total = f_total + f
    if axis_name is not None:
        G = jax.lax.psum(G, axis_name)
        c = jax.lax.psum(c, axis_name)
        f_total = jax.lax.psum(f_total, axis_name)

    k_total = problem.total_eq_dim
    A_eq = jnp.zeros((k_total, n), dtype)
    b_eq = jnp.zeros((k_total,), dtype)
    row = 0
    for eq in problem.equality_constraints:
        A_eq, b_eq = fill_jacobian_rows(A_eq, b_eq, eq, x, row)
        row += constraint_rows(eq)
    eq_l1 = jnp.sum(jnp.abs(b_eq)) if k_total > 0 else jnp.zeros((), dtype)

    m = len(problem.inequality_constraints)
    if m > 0:
        var = jnp.array(
            [c_.variable for c_ in problem.inequality_constraints], jnp.int32
        )
        a = jnp.stack(
            [jnp.asarray(c_.a, dtype) for c_ in problem.inequality_constraints]
        )
        # ShiftTo the linearization point (qp.hpp:57-59); static per-element
        # indices so no traced gather is emitted.
        b = jnp.stack(
            [
                jnp.asarray(c_.a, dtype) * x[c_.variable] + jnp.asarray(c_.b, dtype)
                for c_ in problem.inequality_constraints
            ]
        )
    else:
        var = jnp.zeros((0,), jnp.int32)
        a = jnp.zeros((0,), dtype)
        b = jnp.zeros((0,), dtype)

    qp = QP(G=G, c=c, A_eq=A_eq, b_eq=b_eq, ineq_var=var, ineq_a=a, ineq_b=b)
    return qp, Errors(f=f_total, equality=eq_l1)


def _damp(qp: QP, lam) -> QP:
    """Add the LM damping term to the raw linearization's Hessian."""
    return dataclasses.replace(
        qp, G=qp.G + lam * jnp.eye(qp.N, dtype=qp.G.dtype)
    )


@traced_phase("LinearizeAndFillQP")
def linearize_and_fill_qp(
    problem: Problem, x: jax.Array, lam, axis_name: Optional[str] = None
) -> Tuple[QP, Errors]:
    """LinearizeAndFillQP analog (nonlinear.cc:170-214): Gauss-Newton
    assembly of (G, c), LM damping of the diagonal, equality Jacobian rows,
    and inequality constraints shifted to the linearization point.

    With ``axis_name`` (inside shard_map), the cost terms are treated as a
    device-local partition of a larger residual set: G, c and the cost value
    are psum-reduced over the mesh axis before damping -- the Schur-style
    distributed assembly of SURVEY.md section 2.3. Equality/inequality
    constraints are assumed replicated across the axis.
    """
    qp, errors = _linearize_raw(problem, x, axis_name)
    return _damp(qp, lam), errors


@traced_phase("EvaluateNonlinearErrors")
def evaluate_nonlinear_errors(
    problem: Problem, x: jax.Array, axis_name: Optional[str] = None
) -> Errors:
    """EvaluateNonlinearErrors analog (nonlinear.cc:279-293). With
    ``axis_name``, cost terms are psum-reduced (device-local partition)."""
    dtype = x.dtype
    f = jnp.zeros((), dtype)
    for cost in problem.costs:
        if isinstance(cost, BlockResidual):
            r = cost.error_vectors(x)
        else:
            r = cost.error_vector(x)
        f = f + 0.5 * jnp.sum(r * r)
    if axis_name is not None:
        f = jax.lax.psum(f, axis_name)
    eq = jnp.zeros((), dtype)
    for eq_c in problem.equality_constraints:
        if isinstance(eq_c, BlockResidual):
            eq = eq + jnp.sum(jnp.abs(eq_c.error_vectors(x)))
        else:
            eq = eq + jnp.sum(jnp.abs(eq_c.error_vector(x)))
    return Errors(f=f, equality=eq)


def _stacked_residual(problem: Problem, x: jax.Array) -> jax.Array:
    """All cost residuals as one flat vector (for matrix-free JᵀJ products)."""
    parts = []
    for cost in problem.costs:
        if isinstance(cost, BlockResidual):
            parts.append(cost.error_vectors(x).ravel())
        else:
            parts.append(cost.error_vector(x))
    return jnp.concatenate(parts) if len(parts) > 1 else parts[0]


def _stacked_equality(problem: Problem, x: jax.Array) -> jax.Array:
    """All equality-constraint residuals as one flat vector (block-major for
    BlockResidual, matching fill_jacobian_rows' row order)."""
    parts = [
        c_.error_vectors(x).ravel()
        if isinstance(c_, BlockResidual)
        else c_.error_vector(x)
        for c_ in problem.equality_constraints
    ]
    return jnp.concatenate(parts) if len(parts) > 1 else parts[0]


def _pcg(matvec, b, prec_apply, iterations: int):
    """Fixed-trip preconditioned conjugate gradient; ``prec_apply`` is the
    M^-1 application (Jacobi ``r / diag`` by default, or a block solve from
    ``cg_preconditioner``).

    A fixed ``lax.scan`` rather than a tolerance loop: the batched-TPU
    configuration wants static trip counts, and converged iterates are stable
    under further iterations (guards keep alpha/beta finite at exact
    convergence)."""
    tiny = jnp.finfo(b.dtype).tiny
    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = prec_apply(r0)
    rz0 = jnp.dot(r0, z0)

    def body(carry, _):
        xk, rk, zk, pk, rz = carry
        Ap = matvec(pk)
        denom = jnp.dot(pk, Ap)
        alpha = rz / jnp.where(jnp.abs(denom) > tiny, denom, 1.0)
        alpha = jnp.where(jnp.abs(denom) > tiny, alpha, 0.0)
        x1 = xk + alpha * pk
        r1 = rk - alpha * Ap
        z1 = prec_apply(r1)
        rz1 = jnp.dot(r1, z1)
        beta = jnp.where(jnp.abs(rz) > tiny, rz1 / jnp.where(jnp.abs(rz) > tiny, rz, 1.0), 0.0)
        p1 = z1 + beta * pk
        return (x1, r1, z1, p1, rz1), None

    (xk, *_), _ = jax.lax.scan(
        body, (x0, r0, z0, z0, rz0), None, length=iterations
    )
    return xk


def _box_bounds(problem: Problem, dtype):
    """Per-variable (lo, hi) bound vectors from the diagonal inequality list
    (±inf where unbounded). ``a x_v + b >= 0`` gives ``x_v >= -b/a`` for
    a > 0 and ``x_v <= -b/a`` for a < 0 (qp.hpp:28-70 semantics).

    Bounds are usually static Python scalars, in which case the vectors are
    assembled host-side in numpy -- the CG path targets 1000s of variables
    and tracing two scatter ops per constraint inflates the jaxpr (and the
    minutes-long remote TPU compiles) for nothing. Traced per-instance
    bounds fall back to the scatter path."""
    import numpy as np

    n = problem.dimension
    try:
        lo = np.full((n,), -np.inf)
        hi = np.full((n,), np.inf)
        for c_ in problem.inequality_constraints:
            a = float(c_.a)
            bound = -float(c_.b) / a
            v = int(c_.variable)
            if a > 0:
                lo[v] = max(lo[v], bound)
            else:
                hi[v] = min(hi[v], bound)
        return jnp.asarray(lo, dtype), jnp.asarray(hi, dtype)
    except (TypeError, jax.errors.TracerArrayConversionError):
        pass  # traced bounds: assemble on device
    lo = jnp.full((n,), -jnp.inf, dtype)
    hi = jnp.full((n,), jnp.inf, dtype)
    for c_ in problem.inequality_constraints:
        a = jnp.asarray(c_.a, dtype)
        bound = -jnp.asarray(c_.b, dtype) / a
        v = c_.variable
        lo = lo.at[v].set(jnp.where(a > 0, jnp.maximum(lo[v], bound), lo[v]))
        hi = hi.at[v].set(jnp.where(a < 0, jnp.minimum(hi[v], bound), hi[v]))
    return lo, hi


@traced_phase("ComputeStepDirection")
def _cg_step_direction(
    problem: Problem, x, lam, params: "NLSParams", diag_fn, axis_name=None,
    bounds=None, prec_fn=None,
):
    """Matrix-free Gauss-Newton step: solve (JᵀJ + lam I) dx = -Jᵀr by PCG
    without materializing the Hessian.
    Returns (dx, errors_pre, derivatives, lagrange_l_inf).

    With ``axis_name`` (inside shard_map), the problem's cost blocks are a
    device-local partition of the global residual set: the gradient, the
    cost, every Hessian-vector product, and the preconditioner diagonal are
    psum-reduced, while x and the CG iterates stay replicated (the inner dot
    products then need no collectives -- identical on every device).
    Equality constraints stay replicated (not psum'd), matching the dense
    path's A_eq assembly.

    Equality constraints are handled by the projected-CG composite step
    (Nocedal & Wright §16.3): a minimum-norm Newton restoration step
    ``dx_p = -Aᵀ(AAᵀ)⁻¹ c`` plus a tangential step solved by CG inside
    null(A) (the operator is the projected Hessian on range(P) and the
    identity on the normal space, so plain PCG applies). ``A`` is the m×n
    constraint Jacobian with m small; only the m×m ``AAᵀ`` is factored
    (TPU-safe LDLT). Lagrange multipliers ``y = -(AAᵀ)⁻¹A(g + H dx)``
    feed the eq-18.32 penalty update exactly like the IP path."""
    r0, vjp = jax.vjp(lambda xx: _stacked_residual(problem, xx), x)
    f_total = 0.5 * jnp.sum(r0 * r0)
    (g,) = vjp(r0)  # Jᵀ r
    if axis_name is not None:
        f_total = jax.lax.psum(f_total, axis_name)
        g = jax.lax.psum(g, axis_name)

    def matvec(v):
        _, jv = jax.jvp(lambda xx: _stacked_residual(problem, xx), (x,), (v,))
        (jtjv,) = vjp(jv)
        if axis_name is not None:
            jtjv = jax.lax.psum(jtjv, axis_name)
        return jtjv + lam * v

    if prec_fn is not None:
        # General preconditioner apply M^-1 r (e.g. block-Jacobi); the
        # factory sees (x, lam) and owns any damping of its blocks.
        # Single-device only (an opaque apply cannot be psum-reduced here;
        # nls_solve rejects the combination eagerly).
        prec_apply = prec_fn(x, lam)
    else:
        if diag_fn is not None:
            diag = diag_fn(x)  # device-LOCAL contribution under axis_name
            if axis_name is not None:
                diag = jax.lax.psum(diag, axis_name)
            diag = diag + lam
        else:
            diag = jnp.ones_like(g)

        def prec_apply(r, _diag=diag):
            return r / _diag

    has_eq = len(problem.equality_constraints) > 0
    b = -g
    mv = matvec
    fmask = None
    if bounds is not None:
        # Two-metric gradient projection: variables pinned at a bound with a
        # gradient pushing outward are frozen (dx_i = 0, the masked system is
        # identity there); the Newton/CG model acts on the free set only, and
        # the line search projects candidates back into the box.
        lo, hi = bounds
        free = ~(((x <= lo) & (g > 0)) | ((x >= hi) & (g < 0)))
        fmask = free.astype(x.dtype)

        def mv(v):  # noqa: F811 -- masked wrapper of matvec
            return fmask * matvec(fmask * v) + (1.0 - fmask) * v

        b = fmask * b
        inner_apply = prec_apply

        def prec_apply(r, _inner=inner_apply):  # noqa: F811
            # Frozen coordinates see the identity (their system row is the
            # identity in mv); the preconditioner acts on the free set.
            return fmask * _inner(fmask * r) + (1.0 - fmask) * r

    if not has_eq:
        dx = _pcg(mv, b, prec_apply, params.cg_iterations)
        derivatives = DirectionalDerivatives(
            d_f=jnp.dot(g, dx), d_equality=jnp.zeros((), x.dtype)
        )
        return dx, Errors(f=f_total, equality=jnp.zeros((), x.dtype)), \
            derivatives, None

    from .ops.kkt import ldlt_factorize, ldlt_solve

    c0 = _stacked_equality(problem, x)
    A = jax.jacrev(lambda xx: _stacked_equality(problem, xx))(x)  # (m, n)
    if fmask is not None:
        # Box + equality: the equality projector is restricted to the FREE
        # subspace (A_F = A with frozen columns zeroed); the feasible step
        # space is S = null(A_F) ∩ {frozen = 0}, whose orthogonal projector
        # is P_eqF ∘ mask (A_F already maps frozen coords to nothing). A
        # frozen set that makes A_F row-rank-deficient NaNs the LDLT and
        # exits QP_INDEFINITE.
        A = A * fmask[None, :]
    fact, fact_ok = ldlt_factorize(A @ A.T)
    bad = jnp.where(fact_ok, 0.0, jnp.nan).astype(x.dtype)

    def solve_nrm(rhs):  # (AAᵀ)⁻¹ rhs; NaN on rank deficiency -> status path
        return ldlt_solve(fact, rhs) + bad

    def mask(v):
        return v if fmask is None else fmask * v

    def proj(v):  # orthogonal projector onto S (null(A_F) within free set)
        u = mask(v)
        return u - mask(A.T @ solve_nrm(A @ u))

    dx_p = -(A.T @ solve_nrm(c0))  # minimum-norm restoration (free coords)
    b_t = proj(-(g + matvec(dx_p)))

    def mv_t(v):  # projected Hessian on range(P), identity on the complement
        pv = proj(v)
        return proj(matvec(pv)) + (v - pv)

    dx_t = _pcg(mv_t, b_t, prec_apply, params.cg_iterations)
    dx = dx_p + dx_t
    y = -solve_nrm(A @ (g + matvec(dx)))  # first-order multiplier estimate
    derivatives = DirectionalDerivatives(
        d_f=jnp.dot(g, dx),
        # nonlinear.cc:457-482 semantics: d|c + alpha A dx|/d alpha at 0.
        d_equality=jnp.sum(jnp.sign(c0) * (A @ dx)),
    )
    errors = Errors(f=f_total, equality=jnp.sum(jnp.abs(c0)))
    return dx, errors, derivatives, jnp.max(jnp.abs(y))


def compute_second_order_correction(
    problem: Problem, qp: QP, x_updated: jax.Array
) -> jax.Array:
    """Second-order correction step (the reference's test-only prototype,
    nonlinear_test.cc:252-348): re-evaluate the nonlinear equality
    constraints at the stepped point and return the minimum-norm correction
    ``dx_soc = -A_eq^+ g(x + dx)`` against the CURRENT linearization -- the
    standard anti-Maratos device for SQP line searches.

    Utility-level like the reference (not wired into the driver); jittable.
    """
    g = jnp.concatenate(
        [
            eq.error_vectors(x_updated).ravel()
            if isinstance(eq, BlockResidual)
            else eq.error_vector(x_updated)
            for eq in problem.equality_constraints
        ]
    )
    return -jnp.linalg.pinv(qp.A_eq) @ g


@traced_phase("ComputeQPCostDerivative")
def compute_qp_cost_derivative(qp: QP, dx: jax.Array) -> DirectionalDerivatives:
    """Directional derivative of cost + L1 equality merit along dx
    (nonlinear.cc:457-482)."""
    d_f = jnp.dot(qp.c, dx)
    if qp.K > 0:
        d_eq = jnp.sum(jnp.sign(qp.b_eq) * (qp.A_eq @ dx))
    else:
        d_eq = jnp.zeros((), dx.dtype)
    return DirectionalDerivatives(d_f=d_f, d_equality=d_eq)


def select_penalty(qp: QP, dx: jax.Array, lagrange_l_inf: Optional[jax.Array], rho):
    """SelectPenalty analog (nonlinear.cc:484-502): eq 18.32 when Lagrange
    multipliers are available (IP path), else the eq 18.36 bound."""
    if lagrange_l_inf is not None:
        return lagrange_l_inf
    eps = jnp.finfo(dx.dtype).eps
    l1_eq = jnp.maximum(jnp.sum(jnp.abs(qp.b_eq)), eps)
    quad = jnp.dot(qp.c, dx) + 0.5 * jnp.maximum(0.0, jnp.dot(dx, qp.G @ dx))
    return quad / ((1.0 - rho) * l1_eq)


# ---------------------------------------------------------------------------
# Polynomial line-search fits (nonlinear.cc:504-605).
# ---------------------------------------------------------------------------


def quadratic_approx_minimum(phi_0, phi_prime_0, alpha_0, phi_alpha_0):
    """Eq 3.57/3.58 quadratic fit; returns (alpha_min, valid)."""
    numerator = phi_alpha_0 - phi_prime_0 * alpha_0 - phi_0
    valid = (phi_prime_0 <= 0) & (numerator > 0)
    alpha = -phi_prime_0 * alpha_0 * alpha_0 / (2.0 * jnp.where(valid, numerator, 1.0))
    return alpha, valid


def cubic_approx_coeffs(phi_0, phi_prime_0, alpha_0, phi_alpha_0, alpha_1, phi_alpha_1):
    """Solve for [a, b] of phi(a) = a x^3 + b x^2 + x phi'(0) + phi(0)
    through two probes (closed-form 2x2 inverse)."""
    a00 = alpha_0 * alpha_0 * alpha_0
    a01 = alpha_0 * alpha_0
    a10 = alpha_1 * alpha_1 * alpha_1
    a11 = alpha_1 * alpha_1
    r0 = phi_alpha_0 - phi_0 - phi_prime_0 * alpha_0
    r1 = phi_alpha_1 - phi_0 - phi_prime_0 * alpha_1
    det = a00 * a11 - a01 * a10
    # det == 0 only for degenerate probe pairs whose result is discarded by
    # the validity checks downstream; guard it so gradients stay finite.
    det = jnp.where(det == 0.0, 1.0, det)
    a = (a11 * r0 - a01 * r1) / det
    b = (-a10 * r0 + a00 * r1) / det
    return a, b


def cubic_approx_minimum(phi_prime_0, a, b):
    """Minimum of the cubic fit; returns (alpha_min, valid)."""
    arg_sqrt = b * b - 3.0 * a * phi_prime_0
    neg_tol = -1.0e-12
    valid = (a != 0.0) & (arg_sqrt >= neg_tol)
    # Clamp away from exactly 0: sqrt's infinite slope there turns the zero
    # cotangent of a discarded branch into NaN under reverse-mode autodiff.
    tiny = jnp.finfo(jnp.result_type(arg_sqrt)).tiny
    denom = -b + jnp.sqrt(jnp.maximum(arg_sqrt, tiny))
    alpha = denom / (3.0 * jnp.where(valid, a, 1.0))
    return alpha, valid


# ---------------------------------------------------------------------------
# Line search.
# ---------------------------------------------------------------------------


class _LSCarry(NamedTuple):
    it: jax.Array  # int32 probe index
    status: jax.Array  # int32; -1 = keep searching
    alpha: jax.Array  # alpha of the most recent probe
    candidate: jax.Array  # x after the most recent retraction
    # previous two probes for the cubic fit:
    alpha_prev: jax.Array
    phi_prev: jax.Array
    alpha_prev2: jax.Array
    phi_prev2: jax.Array
    steps: LineSearchHistory


def _select_step_size_parallel(
    problem: Problem,
    params: NLSParams,
    x: jax.Array,
    dx: jax.Array,
    errors_pre: Errors,
    derivatives: DirectionalDerivatives,
    penalty,
    retraction: Optional[Retraction],
    axis_name: Optional[str] = None,
    return_linearization: bool = False,
):
    """Armijo backtracking with every probe evaluated at once.

    The backtracking schedule alpha_i = tau^i is data-independent, so the
    sequential probe loop (nonlinear.cc:351-416) can be replaced by ONE
    batched evaluation of all max_line_search_iterations+1 candidates and a
    first-acceptance selection. Bit-for-bit identical statuses, history and
    accepted candidate as the sequential path (pinned by
    tests/test_nonlinear.py), but a single fused kernel instead of one
    dispatch round per probe -- the measured hot spot of the batched
    throughput path.
    """
    dtype = x.dtype
    n_probes = params.max_line_search_iterations + 1
    phi_0 = errors_pre.total(penalty)
    dd_total = derivatives.total(penalty)
    dd_linf = derivatives.l_infinity()

    alphas = jnp.asarray(params.armijo_search_tau, dtype) ** jnp.arange(
        n_probes, dtype=dtype
    )

    def retract(alpha):
        if retraction is None:
            return x + dx * alpha
        return retraction(x, dx, alpha)

    candidates = jax.vmap(retract)(alphas)  # (n_probes, N)
    if return_linearization:
        # Each probe computes its FULL linearization (errors fall out of it);
        # the winner's raw QP is carried to the next iteration, so the
        # standalone per-iteration linearize disappears (the dominant
        # measured hot spot of the batched throughput path).
        qps, errs = jax.vmap(
            lambda cand: _linearize_raw(problem, cand, axis_name)
        )(candidates)
    else:
        errs = jax.vmap(
            lambda cand: evaluate_nonlinear_errors(problem, cand, axis_name)
        )(candidates)
    phi = errs.total(penalty)  # (n_probes,)

    # Per-probe status lattice in reference evaluation order
    # (nonlinear.cc:374-412); scalar conditions broadcast over probes.
    armijo = phi <= phi_0 + dd_total * alphas * params.armijo_c1
    status_i = jnp.where(
        errs.contains_invalid_values(),
        jnp.int32(StepSizeSelectionResult.FAILURE_NON_FINITE_COST),
        jnp.where(
            dd_linf < params.absolute_first_derivative_tol,
            jnp.int32(StepSizeSelectionResult.FIRST_ORDER_SATISFIED),
            jnp.where(
                dd_total > 0,
                jnp.int32(StepSizeSelectionResult.POSITIVE_DERIVATIVE),
                jnp.where(
                    armijo,
                    jnp.int32(StepSizeSelectionResult.SUCCESS),
                    jnp.int32(-1),
                ),
            ),
        ),
    )
    stops = status_i >= 0
    any_stop = jnp.any(stops)
    # Index of the probe the sequential loop would have stopped at (last
    # probe when none stops). One-hot selection instead of traced-index
    # gathers (TPU memory-space-assignment crash; see CLAUDE.md).
    k = jnp.where(any_stop, jnp.argmax(stops), n_probes - 1).astype(jnp.int32)
    sel = jnp.arange(n_probes) == k

    def select(v):
        # where-masked sum, NOT a multiplicative one-hot: a non-finite LOSING
        # probe (restricted-domain residual, f32 overflow) would poison the
        # winner through 0 * NaN = NaN. Still gather-free (traced-index
        # gathers crash the TPU memory-space-assignment pass; see CLAUDE.md).
        mask = sel.reshape((n_probes,) + (1,) * (v.ndim - 1))
        return jnp.sum(jnp.where(mask, v, jnp.zeros_like(v)), axis=0)

    status = jnp.where(
        any_stop,
        select(status_i).astype(jnp.int32),
        jnp.int32(StepSizeSelectionResult.MAX_ITERATIONS),
    )
    candidate = select(candidates)
    final_errors = Errors(f=select(errs.f), equality=select(errs.equality))
    evaluated = jnp.arange(n_probes) <= k
    steps = LineSearchHistory(
        alpha=jnp.where(evaluated, alphas, 0.0),
        f=jnp.where(evaluated, errs.f, 0.0),
        equality=jnp.where(evaluated, errs.equality, 0.0),
        num_steps=k + 1,
    )
    if return_linearization:
        qp_sel = QP(
            G=select(qps.G),
            c=select(qps.c),
            A_eq=select(qps.A_eq),
            b_eq=select(qps.b_eq),
            ineq_var=qps.ineq_var[0],
            ineq_a=select(qps.ineq_a),
            ineq_b=select(qps.ineq_b),
        )
        return status, candidate, final_errors, steps, (qp_sel, final_errors)
    return status, candidate, final_errors, steps


@traced_phase("SelectStepSize")
def select_step_size(
    problem: Problem,
    params: NLSParams,
    x: jax.Array,
    dx: jax.Array,
    errors_pre: Errors,
    derivatives: DirectionalDerivatives,
    penalty,
    retraction: Optional[Retraction],
    axis_name: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array, Errors, LineSearchHistory]:
    """SelectStepSize analog (nonlinear.cc:351-416): try alpha = 1, then
    either Armijo backtracking or quadratic/cubic polynomial minimization,
    accepting on the Armijo condition over the L1 merit function.

    Returns (status, accepted_candidate, candidate_errors, steps_log).
    """
    if (
        params.parallel_line_search
        and params.line_search_strategy == LineSearchStrategy.ARMIJO_BACKTRACK
    ):
        return _select_step_size_parallel(
            problem,
            params,
            x,
            dx,
            errors_pre,
            derivatives,
            penalty,
            retraction,
            axis_name,
            return_linearization=params.fuse_probe_linearize,
        )
    dtype = x.dtype
    max_probes = params.max_line_search_iterations + 1
    phi_0 = errors_pre.total(penalty)
    dd_total = derivatives.total(penalty)
    dd_linf = derivatives.l_infinity()

    def retract(alpha):
        if retraction is None:
            return x + dx * alpha
        return retraction(x, dx, alpha)

    def body(c: _LSCarry) -> _LSCarry:
        it = c.it
        # --- compute the probe alpha ------------------------------------
        if params.line_search_strategy == LineSearchStrategy.POLYNOMIAL_APPROXIMATION:
            qa, q_ok = quadratic_approx_minimum(phi_0, dd_total, c.alpha_prev, c.phi_prev)
            a_cub, b_cub = cubic_approx_coeffs(
                phi_0, dd_total, c.alpha_prev2, c.phi_prev2, c.alpha_prev, c.phi_prev
            )
            ca, c_ok = cubic_approx_minimum(dd_total, a_cub, b_cub)
            new_alpha = jnp.where(it == 1, qa, ca)
            new_ok = jnp.where(it == 1, q_ok, c_ok)
            new_ok = (
                new_ok
                & jnp.isfinite(new_alpha)
                & (new_alpha > 0.0)
                & (new_alpha < c.alpha)
            )
            alpha = jnp.where(it == 0, jnp.ones((), dtype), new_alpha)
            invalid = (it > 0) & ~new_ok
        else:
            alpha = jnp.where(
                it == 0, jnp.ones((), dtype), c.alpha * params.armijo_search_tau
            )
            invalid = jnp.zeros((), bool)

        # --- evaluate the candidate -------------------------------------
        candidate = retract(alpha)
        errs = evaluate_nonlinear_errors(problem, candidate, axis_name)
        phi = errs.total(penalty)

        # An invalid polynomial fit is not logged: the reference returns
        # FAILURE_INVALID_ALPHA before evaluating the probe
        # (nonlinear.cc:374-377), so the steps history must not contain it.
        steps = LineSearchHistory(
            alpha=c.steps.alpha.at[it].set(
                jnp.where(invalid, c.steps.alpha[it], alpha)
            ),
            f=c.steps.f.at[it].set(jnp.where(invalid, c.steps.f[it], errs.f)),
            equality=c.steps.equality.at[it].set(
                jnp.where(invalid, c.steps.equality[it], errs.equality)
            ),
            num_steps=c.steps.num_steps + jnp.where(invalid, 0, 1),
        )

        # --- status lattice, in reference order (nonlinear.cc:374-412) ---
        armijo = phi <= phi_0 + dd_total * alpha * params.armijo_c1
        status = jnp.where(
            invalid,
            jnp.int32(StepSizeSelectionResult.FAILURE_INVALID_ALPHA),
            jnp.where(
                errs.contains_invalid_values(),
                jnp.int32(StepSizeSelectionResult.FAILURE_NON_FINITE_COST),
                jnp.where(
                    dd_linf < params.absolute_first_derivative_tol,
                    jnp.int32(StepSizeSelectionResult.FIRST_ORDER_SATISFIED),
                    jnp.where(
                        dd_total > 0,
                        jnp.int32(StepSizeSelectionResult.POSITIVE_DERIVATIVE),
                        jnp.where(
                            armijo,
                            jnp.int32(StepSizeSelectionResult.SUCCESS),
                            jnp.int32(-1),
                        ),
                    ),
                ),
            ),
        )
        return _LSCarry(
            it=it + 1,
            status=status,
            alpha=alpha,
            candidate=candidate,
            alpha_prev=alpha,
            phi_prev=phi,
            alpha_prev2=c.alpha_prev,
            phi_prev2=c.phi_prev,
            steps=steps,
        )

    def cond(c: _LSCarry):
        return (c.status < 0) & (c.it < max_probes)

    # Benign initializers (only read after the first probe overwrites them;
    # NaN seeds would poison reverse-mode gradients through the scan path).
    init = _LSCarry(
        it=jnp.zeros((), jnp.int32),
        status=jnp.int32(-1),
        alpha=jnp.ones((), dtype),
        candidate=x,
        alpha_prev=jnp.ones((), dtype),
        phi_prev=phi_0,
        alpha_prev2=jnp.full((), 2.0, dtype),
        phi_prev2=phi_0,
        steps=LineSearchHistory.empty(max_probes, dtype),
    )
    out = bounded_loop(
        cond, body, init, max_probes, params.early_exit, params.inner_unroll
    )
    status = jnp.where(
        out.status < 0, jnp.int32(StepSizeSelectionResult.MAX_ITERATIONS), out.status
    )
    final_errors = Errors(
        f=out.steps.f[out.it - 1], equality=out.steps.equality[out.it - 1]
    )
    return status, out.candidate, final_errors, out.steps


# ---------------------------------------------------------------------------
# The outer SQP/LM loop.
# ---------------------------------------------------------------------------


class _NLSCarry(NamedTuple):
    x: jax.Array
    lam: jax.Array
    penalty: jax.Array
    opt_state: jax.Array  # int32 OptimizerState
    it: jax.Array  # int32 iterations completed
    status: jax.Array  # int32 NLSTerminationState; NONE = continue
    history: NLSIterationHistory
    # (raw QP, errors) of the current x when fuse_probe_linearize; else None.
    lin: object = None


def _uses_null_space(problem: Problem) -> bool:
    """Solver variant choice (nonlinear.cc:83-89): null-space iff there are
    equality constraints and no inequality constraints."""
    return (
        len(problem.inequality_constraints) == 0
        and len(problem.equality_constraints) > 0
    )


@traced_phase("Solve")
def nls_solve(
    problem: Problem,
    params: NLSParams,
    x0: jax.Array,
    retraction: Optional[Retraction] = None,
    exit_callback: Optional[Callable] = None,
    axis_name: Optional[str] = None,
    cg_diag_preconditioner: Optional[Callable] = None,
    cg_preconditioner: Optional[Callable] = None,
    distributed_cg_preconditioner: bool = False,
) -> NLSResult:
    """Solve the constrained NLS problem (nonlinear.cc:75-157) as one pure,
    jittable, vmappable function.

    Args:
      problem: static problem structure (residual fns may close over traced
        per-instance data).
      params: static solver configuration.
      x0: initial guess, shape (problem.dimension,).
      retraction: optional manifold update ``(x, dx, alpha) -> x_new``
        (nonlinear.hpp:127); default is ``x + alpha * dx``.
      exit_callback: optional jittable ``f(history_row_pytree) -> bool``;
        returning False terminates with USER_CALLBACK (the jit-safe analog of
        SetUserExitCallback, nonlinear.hpp:153-157).
      axis_name: when running inside shard_map with cost terms partitioned
        across a mesh axis, the axis to psum-reduce Gauss-Newton assembly and
        cost evaluation over (large-single-instance parallelism).
      cg_diag_preconditioner: for ``qp_solver="cg"``, an optional
        ``f(x) -> diag(JᵀJ)`` estimate used as the Jacobi preconditioner.
      cg_preconditioner: for ``qp_solver="cg"``, a general preconditioner
        FACTORY ``(x, lam) -> (apply: r -> M^-1 r)`` (e.g. block-Jacobi over
        camera/landmark blocks, models/bundle_adjustment.py). Overrides
        ``cg_diag_preconditioner``; the factory owns damping of its blocks.
        With ``axis_name``, the factory runs inside the shard_map program
        and MUST produce a replicated-consistent apply: assemble its
        operator from psum-reduced quantities (see
        ops/tree_prec.py::make_chain_tree_preconditioner ``axis_name``) —
        its apply itself is not psum-reduced, so a device-local apply would
        silently desynchronize the replicated CG iterates. Set
        ``distributed_cg_preconditioner=True`` to assert you did this.
      distributed_cg_preconditioner: opt-in acknowledgment that
        ``cg_preconditioner`` is replicated-consistent under ``axis_name``
        (guards against accidentally passing a single-device factory into a
        distributed solve).
    """
    from .assertions import validate_problem

    if hasattr(problem, "base_dimension") and hasattr(problem, "inequalities"):
        # A NonlinearInequalityProblem wrapper (ineq.py): unwrap and force the
        # slack-safe QP warm start so default usage cannot silently pick the
        # singular SOLVE_EQUALITY_CONSTRAINED guess (see ineq.py docstring).
        # A user retraction is written against the BASE problem; lift it to
        # the augmented space (slacks update additively) -- applying an
        # elementwise base retraction such as mod_pi to slack coordinates
        # would wrap large slacks negative with no shape error to catch it.
        if retraction is not None:
            retraction = problem.wrap_retraction(retraction)
        params = problem.params(params)
        problem = problem.problem

    if params.early_exit is None:
        params = dataclasses.replace(params, early_exit=resolve_early_exit(None))

    validate_problem(problem)
    if (
        cg_preconditioner is not None
        and axis_name is not None
        and not distributed_cg_preconditioner
    ):
        raise ValueError(
            "cg_preconditioner's apply is not psum-reduced: under axis_name "
            "the factory must assemble from psum'd quantities so the apply "
            "is replicated-consistent. If it does, pass "
            "distributed_cg_preconditioner=True; otherwise use "
            "cg_diag_preconditioner (psum'd internally)"
        )
    x0 = jnp.asarray(x0)
    dtype = x0.dtype
    use_ns = _uses_null_space(problem)
    has_eq = len(problem.equality_constraints) > 0
    max_probes = params.max_line_search_iterations + 1
    use_cg = params.qp_solver == "cg"
    cg_bounds = None
    if use_cg:
        assert not params.log_qp_eigenvalues, (
            "qp_solver='cg' is matrix-free: there is no assembled QP Hessian "
            "to log eigenvalues of"
        )
        if problem.inequality_constraints:
            cg_bounds = _box_bounds(problem, dtype)
            x0 = jnp.clip(x0, cg_bounds[0], cg_bounds[1])
            base_retraction = retraction

            def retraction(x, dx, alpha, _base=base_retraction):
                xc = _base(x, dx, alpha) if _base is not None else x + alpha * dx
                return jnp.clip(xc, cg_bounds[0], cg_bounds[1])

    qp_params = QPInteriorPointParams(
        max_iterations=params.max_qp_iterations,
        termination_kkt_tol=params.termination_kkt_tolerance,
        initial_mu=1.0,
        sigma=params.qp_sigma,
        barrier_strategy=params.qp_barrier_strategy,
        initialize_mu_with_complementarity=False,
        initial_guess_method=(
            params.qp_initial_guess_method
            if params.qp_initial_guess_method is not None
            else (
                InitialGuessMethod.SOLVE_EQUALITY_CONSTRAINED
                if has_eq
                else InitialGuessMethod.NAIVE
            )
        ),
        kkt_solver=params.kkt_solver,
        record_history=params.record_history,
        early_exit=params.early_exit,
        unroll=params.inner_unroll,
    )
    if exit_callback is not None:
        assert params.record_history, "exit_callback requires record_history"

    def body(carry: _NLSCarry) -> _NLSCarry:
        x, lam, penalty, opt_state, i = (
            carry.x,
            carry.lam,
            carry.penalty,
            carry.opt_state,
            carry.it,
        )
        # --- step direction (nonlinear.cc:216-259) -----------------------
        if use_cg:
            dx, errors_pre, derivatives, lagrange_l_inf = _cg_step_direction(
                problem, x, lam, params, cg_diag_preconditioner, axis_name,
                cg_bounds, cg_preconditioner,
            )
            qp_indefinite = ~jnp.all(jnp.isfinite(dx))
            dx = jnp.where(qp_indefinite, jnp.zeros_like(dx), dx)
            qp_term = jnp.where(
                qp_indefinite,
                jnp.int32(QPTerminationState.FAILED_FACTORIZATION),
                jnp.int32(QPTerminationState.MAX_ITERATIONS),
            )
            qp_iters = jnp.int32(params.cg_iterations)
            qp_kkt_final = jnp.zeros((), dtype)
            qp_hist_row = None
        elif params.fuse_probe_linearize:
            qp_raw, errors_pre = carry.lin
            qp = _damp(qp_raw, lam)
        else:
            qp, errors_pre = linearize_and_fill_qp(problem, x, lam, axis_name)

        if use_cg:
            pass
        elif use_ns:
            with annotate("ComputeStepDirection"):
                ns = qp_null_space_solve(qp)
            dx = ns.x
            # Any NS failure (non-PD reduced Hessian, inconsistent degenerate
            # constraints) terminates the outer loop via the QP_INDEFINITE
            # path (the reference's early return, nonlinear.cc:103-105).
            qp_indefinite = (
                ns.termination_state != QPNullSpaceTerminationState.SUCCESS
            )
            qp_term = ns.termination_state
            qp_iters = jnp.zeros((), jnp.int32)
            qp_kkt_final = jnp.zeros((), dtype)
            qp_hist_row = None
            lagrange_l_inf = None
        elif params.qp_solver == "pallas_fused":
            from .ops.pallas_qp import make_fused_qp_solver

            fused = make_fused_qp_solver(
                tuple(c_.variable for c_ in problem.inequality_constraints),
                params.max_qp_iterations,
                params.qp_sigma,
                "mpc"
                if params.qp_barrier_strategy == BarrierStrategy.PREDICTOR_CORRECTOR
                else "complementarity",
                has_eq,
            )
            with annotate("ComputeStepDirection"):
                dx, y_qp = fused(qp.G, qp.c, qp.A_eq, qp.b_eq, qp.ineq_a, qp.ineq_b)
            qp_indefinite = ~jnp.all(jnp.isfinite(dx))
            dx = jnp.where(qp_indefinite, jnp.zeros_like(dx), dx)
            qp_term = jnp.where(
                qp_indefinite,
                jnp.int32(QPTerminationState.FAILED_FACTORIZATION),
                jnp.int32(QPTerminationState.MAX_ITERATIONS),
            )
            qp_iters = jnp.int32(params.max_qp_iterations)
            qp_kkt_final = jnp.zeros((), dtype)
            qp_hist_row = None
            lagrange_l_inf = jnp.max(jnp.abs(y_qp)) if has_eq else None
        else:
            with annotate("ComputeStepDirection"):
                ipres = qp_ip_solve(qp, qp_params)
            dx = ipres.x
            # The reference throws FailedFactorization here; we terminate
            # with QP_INDEFINITE status instead (jit-safe).
            qp_indefinite = (
                ipres.termination_state == QPTerminationState.FAILED_FACTORIZATION
            )
            qp_term = ipres.termination_state
            qp_iters = ipres.num_iterations
            if params.record_history:
                last = jnp.maximum(ipres.num_iterations - 1, 0)
                qp_kkt_final = jax.tree.map(
                    lambda a: a[last], ipres.iterations.kkt_final
                ).max()
                qp_hist_row = ipres.iterations
            else:
                qp_kkt_final = jnp.zeros((), dtype)
                qp_hist_row = None
            lagrange_l_inf = (
                ipres.lagrange_multipliers.l_infinity if has_eq else None
            )

        if not use_cg:
            derivatives = compute_qp_cost_derivative(qp, dx)

        # --- penalty update (nonlinear.cc:112-118) -----------------------
        if has_eq:
            # CG path: no QP object; select_penalty takes the eq-18.32
            # multiplier branch (lagrange_l_inf is always available there).
            new_penalty = select_penalty(
                None if use_cg else qp,
                dx,
                lagrange_l_inf,
                params.equality_penalty_rho,
            )
            penalty = jnp.where(
                new_penalty > penalty,
                new_penalty * params.equality_penalty_scale_factor,
                penalty,
            )

        # --- line search -------------------------------------------------
        ls_out = select_step_size(
            problem, params, x, dx, errors_pre, derivatives, penalty, retraction,
            axis_name,
        )
        if params.fuse_probe_linearize:
            step_result, candidate, cand_errors, steps, new_lin = ls_out
        else:
            step_result, candidate, cand_errors, steps = ls_out
            new_lin = None

        # --- lambda update + exit conditions (nonlinear.cc:296-343) ------
        success = step_result == StepSizeSelectionResult.SUCCESS
        x_next = jnp.where(success, candidate, x)
        lam_decrease = jnp.where(
            opt_state == OptimizerState.ATTEMPTING_RESTORE_LM,
            params.lambda_decrease_on_restore,
            params.lambda_decrease_on_success,
        )
        lam_on_success = jnp.maximum(lam * lam_decrease, params.min_lambda)

        failed = (step_result == StepSizeSelectionResult.MAX_ITERATIONS) | (
            step_result == StepSizeSelectionResult.POSITIVE_DERIVATIVE
        )
        lam_on_fail = jnp.where(
            opt_state == OptimizerState.NOMINAL,
            jnp.maximum(params.lambda_failure_init, lam * 10.0),
            lam * 10.0,
        )

        lam_next = jnp.where(success, lam_on_success, jnp.where(failed, lam_on_fail, lam))
        state_next = jnp.where(
            success,
            jnp.int32(OptimizerState.NOMINAL),
            jnp.where(
                failed, jnp.int32(OptimizerState.ATTEMPTING_RESTORE_LM), opt_state
            ),
        )

        exit_abs = success & (cand_errors.l_infinity() < params.absolute_exit_tol)
        exit_rel = success & (
            cand_errors.total(penalty)
            > errors_pre.total(penalty) * (1.0 - params.relative_exit_tol)
        )
        exit_first_order = (
            step_result == StepSizeSelectionResult.FIRST_ORDER_SATISFIED
        )
        exit_max_lambda = failed & (lam_next > params.max_lambda)

        status = jnp.where(
            qp_indefinite,
            jnp.int32(NLSTerminationState.QP_INDEFINITE),
            jnp.where(
                exit_abs,
                jnp.int32(NLSTerminationState.SATISFIED_ABSOLUTE_TOL),
                jnp.where(
                    exit_rel,
                    jnp.int32(NLSTerminationState.SATISFIED_RELATIVE_TOL),
                    jnp.where(
                        exit_first_order,
                        jnp.int32(NLSTerminationState.SATISFIED_FIRST_ORDER_TOL),
                        jnp.where(
                            exit_max_lambda,
                            jnp.int32(NLSTerminationState.MAX_LAMBDA),
                            jnp.int32(NLSTerminationState.NONE),
                        ),
                    ),
                ),
            ),
        )
        # On QP_INDEFINITE nothing is applied (reference returns immediately
        # before the line search; mask out the state updates).
        x_next = jnp.where(qp_indefinite, x, x_next)
        lam_next = jnp.where(qp_indefinite, lam, lam_next)
        state_next = jnp.where(qp_indefinite, opt_state, state_next)
        if params.fuse_probe_linearize:
            # Adopt the winning probe's linearization only when its candidate
            # was adopted; otherwise keep the current x's linearization.
            adopt = success & ~qp_indefinite
            lin_next = jax.tree.map(
                lambda nv, ov: jnp.where(adopt, nv, ov), new_lin, carry.lin
            )
        else:
            lin_next = carry.lin

        # --- record history (nonlinear.cc:132-143) -----------------------
        h = carry.history
        if not params.record_history:
            return _NLSCarry(
                x=x_next,
                lam=lam_next,
                penalty=penalty,
                opt_state=state_next,
                it=i + 1,
                status=status,
                history=h,
                lin=lin_next,
            )
        h = NLSIterationHistory(
            optimizer_state=h.optimizer_state.at[i].set(opt_state),
            lam=h.lam.at[i].set(lam),
            errors_initial=Errors(
                h.errors_initial.f.at[i].set(errors_pre.f),
                h.errors_initial.equality.at[i].set(errors_pre.equality),
            ),
            directional_derivatives=DirectionalDerivatives(
                h.directional_derivatives.d_f.at[i].set(derivatives.d_f),
                h.directional_derivatives.d_equality.at[i].set(
                    derivatives.d_equality
                ),
            ),
            penalty=h.penalty.at[i].set(penalty),
            step_result=h.step_result.at[i].set(step_result),
            qp_termination_state=h.qp_termination_state.at[i].set(qp_term),
            qp_num_iterations=h.qp_num_iterations.at[i].set(qp_iters),
            qp_kkt_final_max=h.qp_kkt_final_max.at[i].set(qp_kkt_final),
            line_search=LineSearchHistory(
                alpha=h.line_search.alpha.at[i].set(steps.alpha),
                f=h.line_search.f.at[i].set(steps.f),
                equality=h.line_search.equality.at[i].set(steps.equality),
                num_steps=h.line_search.num_steps.at[i].set(steps.num_steps),
            ),
            qp_eigenvalues=h.qp_eigenvalues,
            # Nested per-QP-iteration telemetry (structs.hpp:307 qp_outputs).
            qp_iterations=(
                jax.tree.map(
                    lambda buf, v: buf.at[i].set(v), h.qp_iterations, qp_hist_row
                )
                if qp_hist_row is not None
                else h.qp_iterations
            ),
        )
        if params.log_qp_eigenvalues:
            w = jnp.linalg.eigvalsh(qp.G)
            h = dataclasses.replace(
                h,
                qp_eigenvalues=QPEigenvalues(
                    min=h.qp_eigenvalues.min.at[i].set(w.min()),
                    max=h.qp_eigenvalues.max.at[i].set(w.max()),
                    abs_min=h.qp_eigenvalues.abs_min.at[i].set(jnp.abs(w).min()),
                ),
            )

        if exit_callback is not None:
            # Empty (disabled) buffers like qp_eigenvalues pass through as-is.
            row = jax.tree.map(lambda a: a[i] if a.shape[0] > 0 else a, h)
            proceed = exit_callback(row)
            status = jnp.where(
                (status == NLSTerminationState.NONE) & ~proceed,
                jnp.int32(NLSTerminationState.USER_CALLBACK),
                status,
            )

        return _NLSCarry(
            x=x_next,
            lam=lam_next,
            penalty=penalty,
            opt_state=state_next,
            it=i + 1,
            status=status,
            history=h,
            lin=lin_next,
        )

    def cond(carry: _NLSCarry):
        return (carry.status == NLSTerminationState.NONE) & (
            carry.it < params.max_iterations
        )

    init = _NLSCarry(
        x=x0,
        lam=jnp.asarray(params.lambda_initial, dtype),
        penalty=jnp.asarray(params.equality_penalty_initial, dtype),
        opt_state=jnp.int32(OptimizerState.NOMINAL),
        it=jnp.zeros((), jnp.int32),
        status=jnp.int32(NLSTerminationState.NONE),
        lin=(
            _linearize_raw(problem, x0, axis_name)
            if params.fuse_probe_linearize
            else None
        ),
        history=NLSIterationHistory.empty(
            params.max_iterations if params.record_history else 0,
            max_probes if params.record_history else 0,
            dtype,
            with_eigenvalues=params.log_qp_eigenvalues and params.record_history,
            max_qp_iterations=(
                params.max_qp_iterations
                if (params.record_history and not use_ns)
                else 0
            ),
        ),
    )
    out = bounded_loop(
        cond, body, init, params.max_iterations, params.early_exit,
        params.outer_unroll,
    )
    status = jnp.where(
        out.status == NLSTerminationState.NONE,
        jnp.int32(NLSTerminationState.MAX_ITERATIONS),
        out.status,
    )
    final_errors = evaluate_nonlinear_errors(problem, out.x, axis_name)
    return NLSResult(
        termination_state=status,
        num_iterations=out.it,
        x=out.x,
        errors=final_errors,
        iterations=out.history,
        solver_variant=jnp.int32(
            QPSolverVariant.MATRIX_FREE_CG
            if use_cg
            else (
                QPSolverVariant.NULL_SPACE
                if use_ns
                else QPSolverVariant.INTERIOR_POINT
            )
        ),
    )
