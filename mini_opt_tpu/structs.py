"""Status enums and result pytrees for the TPU-native solver.

This is the analog of the reference's telemetry/data layer
(/root/reference/include/mini_opt/structs.hpp:24-347), redesigned for XLA:
every enum is an int32 status code usable inside ``jax.jit`` / ``lax.while_loop``
carries (no exceptions, no dynamic containers), and every per-iteration record
is a fixed-shape pytree of stacked arrays so that a whole solve history can be
returned from a single jitted call and vmapped over thousands of problem
instances.
"""

from __future__ import annotations

import dataclasses
import enum
import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Enums (carried as int32 inside jitted code).
# ---------------------------------------------------------------------------


class BarrierStrategy(enum.IntEnum):
    """How the interior-point barrier parameter mu is updated each iteration.

    Mirrors reference semantics (structs.hpp:24-31).
    """

    COMPLEMENTARITY = 0
    FIXED_DECREASE = 1
    PREDICTOR_CORRECTOR = 2


class InitialGuessMethod(enum.IntEnum):
    """QP interior-point initial guess selection (structs.hpp:34-41)."""

    NAIVE = 0
    SOLVE_EQUALITY_CONSTRAINED = 1
    USER_PROVIDED = 2


class LineSearchStrategy(enum.IntEnum):
    """Line search method for the nonlinear solver (structs.hpp:148-153)."""

    ARMIJO_BACKTRACK = 0
    POLYNOMIAL_APPROXIMATION = 1


class OptimizerState(enum.IntEnum):
    """LM restore state machine of the outer loop (structs.hpp:159-164)."""

    NOMINAL = 0
    ATTEMPTING_RESTORE_LM = 1


class StepSizeSelectionResult(enum.IntEnum):
    """Outcome of the line search (structs.hpp:215-228)."""

    SUCCESS = 0
    MAX_ITERATIONS = 1
    FIRST_ORDER_SATISFIED = 2
    POSITIVE_DERIVATIVE = 3
    FAILURE_NON_FINITE_COST = 4
    FAILURE_INVALID_ALPHA = 5


class QPTerminationState(enum.IntEnum):
    """Interior-point termination (structs.hpp:97-102), plus a numerical
    failure code replacing the reference's FailedFactorization exception
    (qp.cc:303-307) -- jitted code carries status instead of throwing."""

    SATISFIED_KKT_TOL = 0
    MAX_ITERATIONS = 1
    FAILED_FACTORIZATION = 2
    # A USER_PROVIDED warm start with s <= 0 or z <= 0 (the reference's
    # InfeasibleGuess exception, qp.hpp:326-328): named instead of letting
    # the 1/s barrier terms surface as a FAILED_FACTORIZATION NaN storm.
    INFEASIBLE_GUESS = 3


class QPNullSpaceTerminationState(enum.IntEnum):
    """Null-space solver termination (structs.hpp:137-142), plus a
    rank-deficiency status: the reference adapts its null-space basis to the
    numerical rank of A_eq (qp.cc:687-698) but produces garbage for an
    INCONSISTENT degenerate constraint set; this framework reports it."""

    SUCCESS = 0
    NOT_POSITIVE_DEFINITE = 1
    CONSTRAINT_RANK_DEFICIENT = 2


class QPSolverVariant(enum.IntEnum):
    """Which inner-QP solver an NLS solve used; the static discriminator of
    the reference's variant<QPNullSpaceTerminationState,
    QPInteriorPointSolverOutputs> (structs.hpp:307, serialization.cc:79-91).
    MATRIX_FREE_CG is this framework's large-N path (no reference analog);
    its history rows use the interior-point enum/count fields
    (qp_num_iterations = the fixed CG trip count)."""

    INTERIOR_POINT = 0
    NULL_SPACE = 1
    MATRIX_FREE_CG = 2


class NLSTerminationState(enum.IntEnum):
    """Nonlinear solve termination (structs.hpp:233-248).

    NONE is the in-progress sentinel used inside the while-loop carry.
    """

    NONE = -1
    MAX_ITERATIONS = 0
    SATISFIED_ABSOLUTE_TOL = 1
    SATISFIED_RELATIVE_TOL = 2
    SATISFIED_FIRST_ORDER_TOL = 3
    MAX_LAMBDA = 4
    QP_INDEFINITE = 5
    USER_CALLBACK = 6


def termination_state_indicates_satisfied_tol(state) -> jax.Array:
    """Jittable analog of TerminationStateIndicatesSatisfiedTol
    (structs.hpp:250-261)."""
    state = jnp.asarray(state)
    return (
        (state == NLSTerminationState.SATISFIED_ABSOLUTE_TOL)
        | (state == NLSTerminationState.SATISFIED_RELATIVE_TOL)
        | (state == NLSTerminationState.SATISFIED_FIRST_ORDER_TOL)
    )


# ---------------------------------------------------------------------------
# Small value pytrees.
# ---------------------------------------------------------------------------


def _pytree_dataclass(cls):
    cls = dataclasses.dataclass(cls)
    return jax.tree_util.register_dataclass(cls)


@_pytree_dataclass
class KKTError:
    """L2 norms of the four first-order KKT residuals (structs.hpp:68-78)."""

    r_dual: jax.Array
    r_comp: jax.Array
    r_primal_eq: jax.Array
    r_primal_ineq: jax.Array

    def max(self) -> jax.Array:
        return jnp.maximum(
            jnp.maximum(self.r_dual, self.r_comp),
            jnp.maximum(self.r_primal_eq, self.r_primal_ineq),
        )

    @staticmethod
    def zero(dtype=jnp.float64) -> "KKTError":
        z = jnp.zeros((), dtype)
        return KKTError(z, z, z, z)


@_pytree_dataclass
class Errors:
    """Nonlinear cost components (structs.hpp:169-186): ``f`` is the sum of
    squared residual costs, ``equality`` the L1 norm of equality-constraint
    violations."""

    f: jax.Array
    equality: jax.Array

    def total(self, penalty) -> jax.Array:
        return self.f + penalty * self.equality

    def l_infinity(self) -> jax.Array:
        return jnp.maximum(self.f, self.equality)

    def contains_invalid_values(self) -> jax.Array:
        return ~(jnp.isfinite(self.f) & jnp.isfinite(self.equality))


@_pytree_dataclass
class DirectionalDerivatives:
    """Directional derivatives of ``Errors`` along the QP step
    (structs.hpp:189-203)."""

    d_f: jax.Array
    d_equality: jax.Array

    def total(self, penalty) -> jax.Array:
        return self.d_f + penalty * self.d_equality

    def l_infinity(self) -> jax.Array:
        return jnp.maximum(jnp.abs(self.d_f), jnp.abs(self.d_equality))


@_pytree_dataclass
class AlphaValues:
    """Fraction-to-boundary step sizes (structs.hpp:45-50)."""

    primal: jax.Array
    dual: jax.Array


@_pytree_dataclass
class QPLagrangeMultipliers:
    """Summary of equality-constraint multipliers (structs.hpp:108-113)."""

    min: jax.Array
    l_infinity: jax.Array


# ---------------------------------------------------------------------------
# Stacked iteration histories (fixed-shape; row i = iteration i).
# ---------------------------------------------------------------------------


@_pytree_dataclass
class QPIterationHistory:
    """Stacked analog of vector<QPInteriorPointIteration> (structs.hpp:81-94).

    All leaves have leading dimension ``max_iterations``; rows at index >=
    ``num_iterations`` are zero-filled.
    """

    kkt_initial: KKTError
    kkt_final: KKTError
    mu: jax.Array
    alpha: AlphaValues
    alpha_probe: AlphaValues
    mu_affine: jax.Array

    @staticmethod
    def empty(max_iterations: int, dtype=jnp.float64) -> "QPIterationHistory":
        # alpha_probe/mu_affine are 0 (not NaN) when the predictor-corrector
        # is unused: NaN sentinels poison reverse-mode autodiff through the
        # solver. Rendering treats 0 as "not computed".
        v = jnp.zeros((max_iterations,), dtype)
        kkt = KKTError(v, v, v, v)
        return QPIterationHistory(
            kkt_initial=kkt,
            kkt_final=kkt,
            mu=v,
            alpha=AlphaValues(jnp.ones_like(v), jnp.ones_like(v)),
            alpha_probe=AlphaValues(v, v),
            mu_affine=v,
        )


@_pytree_dataclass
class QPIPResult:
    """Result of the interior-point QP solve; analog of
    QPInteriorPointSolverOutputs (structs.hpp:116-134) plus the final iterate.
    """

    termination_state: jax.Array  # int32, QPTerminationState
    num_iterations: jax.Array  # int32
    x: jax.Array  # (N,)
    s: jax.Array  # (M,)
    y: jax.Array  # (K,)
    z: jax.Array  # (M,)
    iterations: QPIterationHistory
    lagrange_multipliers: QPLagrangeMultipliers  # zeros when K == 0


@_pytree_dataclass
class QPNullSpaceResult:
    """Result of the null-space equality-constrained QP solve."""

    termination_state: jax.Array  # int32, QPNullSpaceTerminationState
    x: jax.Array  # (N,)
    # Numerical rank of A_eq (the reference computes it via pivoted QR,
    # qp.cc:694); rank < K means redundant or inconsistent constraints.
    rank: jax.Array  # int32


@_pytree_dataclass
class LineSearchHistory:
    """Stacked analog of vector<LineSearchStep> (structs.hpp:206-212)."""

    alpha: jax.Array  # (max_steps,)
    f: jax.Array  # (max_steps,)
    equality: jax.Array  # (max_steps,)
    num_steps: jax.Array  # int32

    @staticmethod
    def empty(max_steps: int, dtype=jnp.float64) -> "LineSearchHistory":
        z = jnp.zeros((max_steps,), dtype)
        return LineSearchHistory(z, z, z, jnp.zeros((), jnp.int32))


@_pytree_dataclass
class QPEigenvalues:
    """Eigenvalue summary of the QP hessian G (structs.hpp:267-274)."""

    min: jax.Array
    max: jax.Array
    abs_min: jax.Array


@_pytree_dataclass
class NLSIterationHistory:
    """Stacked analog of vector<NLSIteration> (structs.hpp:277-326).

    Leading dim of every leaf = max outer iterations.
    """

    optimizer_state: jax.Array  # int32 per iteration
    lam: jax.Array  # lambda at iteration start
    errors_initial: Errors
    directional_derivatives: DirectionalDerivatives
    penalty: jax.Array
    step_result: jax.Array  # int32 StepSizeSelectionResult
    qp_termination_state: jax.Array  # int32 (IP or null-space enum)
    qp_num_iterations: jax.Array  # int32
    qp_kkt_final_max: jax.Array  # max KKT error of last QP iteration
    line_search: LineSearchHistory  # leaves (max_iter, max_steps)
    qp_eigenvalues: QPEigenvalues  # zeros unless log_qp_eigenvalues
    # Full nested per-QP-iteration telemetry: leaves (max_iter, max_qp_iter).
    # The analog of NLSIteration.qp_outputs carrying the complete
    # QPInteriorPointSolverOutputs per outer iteration (structs.hpp:307);
    # zero-size trailing dim when not recorded (null-space path / history off).
    qp_iterations: QPIterationHistory

    @staticmethod
    def empty(
        max_iterations: int,
        max_line_search_steps: int,
        dtype=jnp.float64,
        with_eigenvalues: bool = False,
        max_qp_iterations: int = 0,
    ) -> "NLSIterationHistory":
        v = jnp.zeros((max_iterations,), dtype)
        i = jnp.zeros((max_iterations,), jnp.int32)
        ls = LineSearchHistory(
            alpha=jnp.zeros((max_iterations, max_line_search_steps), dtype),
            f=jnp.zeros((max_iterations, max_line_search_steps), dtype),
            equality=jnp.zeros((max_iterations, max_line_search_steps), dtype),
            num_steps=jnp.zeros((max_iterations,), jnp.int32),
        )
        ev = jnp.zeros((max_iterations if with_eigenvalues else 0,), dtype)
        qp_hist = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (max_iterations,) + a.shape).copy(),
            QPIterationHistory.empty(max_qp_iterations, dtype),
        )
        return NLSIterationHistory(
            optimizer_state=i,
            lam=v,
            errors_initial=Errors(v, v),
            directional_derivatives=DirectionalDerivatives(v, v),
            penalty=v,
            step_result=i,
            qp_termination_state=i,
            qp_num_iterations=i,
            qp_kkt_final_max=v,
            line_search=ls,
            qp_eigenvalues=QPEigenvalues(ev, ev, ev),
            qp_iterations=qp_hist,
        )


@_pytree_dataclass
class NLSResult:
    """Result of the nonlinear solve; analog of NLSSolverOutputs
    (structs.hpp:329-347) plus the final iterate."""

    termination_state: jax.Array  # int32 NLSTerminationState
    num_iterations: jax.Array  # int32
    x: jax.Array  # (N,) final linearization point
    errors: Errors  # nonlinear errors at the final iterate
    iterations: NLSIterationHistory
    # int32 QPSolverVariant: discriminates qp_termination_state's enum and
    # whether qp_iterations is meaningful (the reference's variant key,
    # serialization.cc:79-91). Static per problem, carried as data for vmap.
    solver_variant: jax.Array

    def num_qp_iterations(self) -> jax.Array:
        """Total inner-QP iterations (structs.cc:208-214)."""
        return jnp.sum(self.iterations.qp_num_iterations)

    def num_line_search_steps(self) -> jax.Array:
        """Total line-search probes (structs.cc:216-222)."""
        return jnp.sum(self.iterations.line_search.num_steps)

    def num_failed_line_searches(self) -> jax.Array:
        """Iterations whose step selection failed (structs.cc:224-236)."""
        valid = (
            jnp.arange(self.iterations.step_result.shape[0]) < self.num_iterations
        )
        failed = (
            (self.iterations.step_result == StepSizeSelectionResult.MAX_ITERATIONS)
            | (
                self.iterations.step_result
                == StepSizeSelectionResult.FAILURE_NON_FINITE_COST
            )
            | (
                self.iterations.step_result
                == StepSizeSelectionResult.FAILURE_INVALID_ALPHA
            )
        )
        return jnp.sum(jnp.where(valid, failed, False).astype(jnp.int32))


# ---------------------------------------------------------------------------
# Human-readable rendering (host side; analog of structs.cc ToString).
# ---------------------------------------------------------------------------

_GREEN = "\x1b[32m"
_RED = "\x1b[31m"
_RESET = "\x1b[0m"


def _color(text: str, good: bool, use_color: bool) -> str:
    if not use_color:
        return text
    return f"{_GREEN if good else _RED}{text}{_RESET}"


def qp_iteration_to_string(history: QPIterationHistory, i: int) -> str:
    """Render one interior-point iteration (structs.cc:122-148 analog)."""
    ki, kf = history.kkt_initial, history.kkt_final

    def _row(k: KKTError) -> str:
        return (
            f"dual={float(k.r_dual[i]):.3e} comp={float(k.r_comp[i]):.3e} "
            f"p_eq={float(k.r_primal_eq[i]):.3e} p_ineq={float(k.r_primal_ineq[i]):.3e}"
        )

    lines = [
        f"QP iteration {i}: mu={float(history.mu[i]):.3e} "
        f"alpha_p={float(history.alpha.primal[i]):.4f} "
        f"alpha_d={float(history.alpha.dual[i]):.4f}",
        f"  kkt initial: {_row(ki)}",
        f"  kkt final:   {_row(kf)}",
    ]
    mu_aff = float(history.mu_affine[i])
    if mu_aff != 0.0 and mu_aff == mu_aff:  # computed (predictor-corrector)
        lines.append(f"  mu_affine={mu_aff:.3e}")
    return "\n".join(lines)


def summarize_counts(batched_result: "NLSResult") -> dict:
    """Aggregate iteration statistics over a batched solve; analog of the
    reference tests' StatCounters/SummarizeCounts (nonlinear_test.cc:350-373)
    which print mean/median/p95 per suite and gate regressions on them."""
    import numpy as np

    r = batched_result
    iters = np.asarray(r.num_iterations)
    qp_iters = np.asarray(r.iterations.qp_num_iterations).sum(axis=-1)
    ls_steps = np.asarray(r.iterations.line_search.num_steps).sum(axis=-1)
    n_it = np.asarray(r.iterations.step_result.shape[-1])
    valid = np.arange(int(n_it))[None, :] < iters[..., None]
    failed_codes = (
        StepSizeSelectionResult.MAX_ITERATIONS,
        StepSizeSelectionResult.FAILURE_NON_FINITE_COST,
        StepSizeSelectionResult.FAILURE_INVALID_ALPHA,
    )
    sr = np.asarray(r.iterations.step_result)
    failed = np.isin(sr, failed_codes) & valid
    failed_ls = failed.sum(axis=-1)

    def stats(v):
        v = np.asarray(v, np.float64).ravel()
        return {
            "mean": float(v.mean()),
            "median": float(np.median(v)),
            "p95": float(np.quantile(v, 0.95)),
            "max": float(v.max()),
        }

    return {
        "num_iterations": stats(iters),
        "num_qp_iterations": stats(qp_iters),
        "num_line_search_steps": stats(ls_steps),
        "num_failed_line_searches": stats(failed_ls),
    }


def nls_result_to_string(
    result: NLSResult, use_color: bool = False, include_qp: bool = False
) -> str:
    """Render a full solve history; analog of NLSSolverOutputs::ToString
    (structs.cc:238-268)."""
    n = int(result.num_iterations)
    term = NLSTerminationState(int(result.termination_state))
    good = bool(termination_state_indicates_satisfied_tol(result.termination_state))
    out = [
        _color(f"Terminated with state: {term.name}", good, use_color),
        f"Iterations: {n}, total QP iterations: {int(result.num_qp_iterations())}, "
        f"line-search steps: {int(result.num_line_search_steps())}, "
        f"failed line searches: {int(result.num_failed_line_searches())}",
    ]
    it = result.iterations
    for i in range(n):
        step = StepSizeSelectionResult(int(it.step_result[i]))
        state = OptimizerState(int(it.optimizer_state[i]))
        line = (
            f"iter={i} state={state.name} lambda={float(it.lam[i]):.3e} "
            f"f={float(it.errors_initial.f[i]):.6e} "
            f"|eq|={float(it.errors_initial.equality[i]):.6e} "
            f"penalty={float(it.penalty[i]):.3e} "
            f"df={float(it.directional_derivatives.d_f[i]):.3e} "
            f"deq={float(it.directional_derivatives.d_equality[i]):.3e} "
            f"step={_color(step.name, step == StepSizeSelectionResult.SUCCESS, use_color)}"
        )
        out.append(line)
        nsteps = int(it.line_search.num_steps[i])
        for j in range(nsteps):
            out.append(
                f"    alpha={float(it.line_search.alpha[i, j]):.6f} "
                f"f={float(it.line_search.f[i, j]):.6e} "
                f"|eq|={float(it.line_search.equality[i, j]):.6e}"
            )
        if include_qp:
            variant = QPSolverVariant(int(getattr(result, "solver_variant", 0)))
            if variant == QPSolverVariant.NULL_SPACE:
                ns = QPNullSpaceTerminationState(int(it.qp_termination_state[i]))
                out.append(f"    qp (null-space): {ns.name}")
            elif variant == QPSolverVariant.MATRIX_FREE_CG:
                # No nested per-QP rows: qp_num_iterations is the fixed CG
                # trip count, not an index into the (max_qp_iterations,)
                # nested buffers.
                cg_term = QPTerminationState(int(it.qp_termination_state[i]))
                out.append(
                    f"    cg (matrix-free): term={cg_term.name} "
                    f"iters={int(it.qp_num_iterations[i])}"
                )
            else:
                qp_term = QPTerminationState(int(it.qp_termination_state[i]))
                out.append(
                    f"    qp: term={qp_term.name} "
                    f"iters={int(it.qp_num_iterations[i])} "
                    f"kkt_final_max={float(it.qp_kkt_final_max[i]):.3e}"
                )
                # Full nested per-QP-iteration rows when recorded (the
                # include_qp rendering of structs.cc:159-206).
                if it.qp_iterations.mu.shape[-1] > 0:
                    row = jax.tree.map(lambda a: a[i], it.qp_iterations)
                    for j in range(int(it.qp_num_iterations[i])):
                        qp_str = qp_iteration_to_string(row, j)
                        out.extend("    " + ln for ln in qp_str.split("\n"))
    return "\n".join(out)
