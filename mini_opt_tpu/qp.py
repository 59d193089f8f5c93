"""Dense QP layer: problem definition, interior-point and null-space solvers.

TPU-native redesign of the reference QP layer
(/root/reference/include/mini_opt/qp.hpp:28-333, source/qp.cc:18-729).
Everything here is a pure function of fixed-shape arrays:

* The QP is a pytree (G, c, A_eq, b_eq, diagonal box constraints as three
  length-M arrays). Shapes (N, M, K) are static; zero-size M/K degrade
  gracefully.
* The interior-point iteration (qp.cc:153-201) is a ``lax.while_loop`` whose
  carry holds (x, s, y, z, mu, status) plus fixed-size per-iteration history
  buffers -- the reference's exceptions become int32 status codes.
* The condensed KKT system (the (N+K)x(N+K) reduction derived in
  qp.cc:228-316) is formed with symmetric scatter-adds and solved through a
  pluggable kernel (``ops.kkt``): LU fallback anywhere, lane-batched Pallas
  LDLT on TPU for the vmapped many-instance path.
* Everything vmaps: a batch of B independent QPs is one call.

Algorithmic source: Nocedal & Wright, Numerical Optimization 2nd ed.,
chapters 16/19 -- same as the reference (qp.hpp:8-16).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .ops import kkt as kkt_ops
from .structs import (
    AlphaValues,
    BarrierStrategy,
    InitialGuessMethod,
    KKTError,
    QPIPResult,
    QPIterationHistory,
    QPLagrangeMultipliers,
    QPNullSpaceResult,
    QPNullSpaceTerminationState,
    QPTerminationState,
    _pytree_dataclass,
)
from .utils.tracing import traced_phase


# ---------------------------------------------------------------------------
# Constraint DSL.
# ---------------------------------------------------------------------------


class LinearInequalityConstraint(NamedTuple):
    """Diagonal/affine inequality ``a * x[variable] + b >= 0``
    (qp.hpp:28-70). ``a``/``b`` may be python floats or traced scalars."""

    variable: int
    a: float
    b: float

    def is_feasible(self, x_var) -> jax.Array:
        return jnp.asarray(self.a * x_var + self.b >= 0.0)

    def clamp_x(self, x_var):
        """Clamp a value into the feasible half-line (qp.hpp:43-53)."""
        return jnp.where(
            jnp.asarray(self.a) < 0,
            jnp.minimum(x_var, self.b / -self.a),
            jnp.maximum(x_var, -self.b / self.a),
        )

    def shift_to(self, x_var) -> "LinearInequalityConstraint":
        """Shift to a new linearization point (qp.hpp:57-59)."""
        return LinearInequalityConstraint(self.variable, self.a, self.a * x_var + self.b)


class Var:
    """Sugar: ``Var(i) >= alpha`` / ``Var(i) <= alpha`` (qp.hpp:77-92)."""

    def __init__(self, variable: int):
        self.variable = int(variable)

    def __ge__(self, value) -> LinearInequalityConstraint:
        return LinearInequalityConstraint(self.variable, 1.0, -value)

    def __le__(self, value) -> LinearInequalityConstraint:
        return LinearInequalityConstraint(self.variable, -1.0, value)


# ---------------------------------------------------------------------------
# QP problem pytree.
# ---------------------------------------------------------------------------


@_pytree_dataclass
class QP:
    """Dense QP ``min 0.5 x^T G x + c^T x`` s.t. ``A_eq x + b_eq = 0`` and
    ``ineq_a * x[ineq_var] + ineq_b >= 0`` (qp.hpp:94-124).

    All leaves are arrays; (N, K, M) are static shapes. ``ineq_var`` carries
    int32 variable indices (the diagonal structure of A_i).
    """

    G: jax.Array  # (N, N), symmetric
    c: jax.Array  # (N,)
    A_eq: jax.Array  # (K, N)
    b_eq: jax.Array  # (K,)
    ineq_var: jax.Array  # (M,) int32
    ineq_a: jax.Array  # (M,)
    ineq_b: jax.Array  # (M,)

    @property
    def N(self) -> int:
        return self.G.shape[-1]

    @property
    def K(self) -> int:
        return self.A_eq.shape[-2]

    @property
    def M(self) -> int:
        return self.ineq_var.shape[-1]

    @staticmethod
    def create(
        G,
        c,
        A_eq=None,
        b_eq=None,
        constraints: Sequence[LinearInequalityConstraint] = (),
        dtype=None,
    ) -> "QP":
        G = jnp.asarray(G, dtype)
        dtype = G.dtype
        c = jnp.asarray(c, dtype)
        n = G.shape[-1]
        if A_eq is None:
            A_eq = jnp.zeros((0, n), dtype)
            b_eq = jnp.zeros((0,), dtype)
        else:
            A_eq = jnp.asarray(A_eq, dtype)
            b_eq = jnp.asarray(b_eq, dtype)
        if len(constraints) > 0:
            ineq_var = jnp.array([cst.variable for cst in constraints], jnp.int32)
            ineq_a = jnp.stack([jnp.asarray(cst.a, dtype) for cst in constraints])
            ineq_b = jnp.stack([jnp.asarray(cst.b, dtype) for cst in constraints])
        else:
            ineq_var = jnp.zeros((0,), jnp.int32)
            ineq_a = jnp.zeros((0,), dtype)
            ineq_b = jnp.zeros((0,), dtype)
        return QP(G, c, A_eq, b_eq, ineq_var, ineq_a, ineq_b)

    def eigenvalue_stats(self):
        """min / max / abs-min eigenvalues of G (qp.cc:12-16)."""
        w = jnp.linalg.eigvalsh(self.G)
        return w.min(), w.max(), jnp.abs(w).min()


# ---------------------------------------------------------------------------
# Interior-point solver.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class QPInteriorPointParams:
    """Static solver config; analog of QPInteriorPointSolver::Params
    (qp.hpp:134-164). Frozen/hashable so it can be a jit static arg."""

    initial_mu: float = 1.0
    sigma: float = 0.5
    termination_kkt_tol: float = 1.0e-9
    termination_complementarity_tol: float = 1.0e-6
    max_iterations: int = 10
    barrier_strategy: BarrierStrategy = BarrierStrategy.COMPLEMENTARITY
    decrease_mu_only_on_small_error: bool = False
    initial_guess_method: InitialGuessMethod = InitialGuessMethod.NAIVE
    initialize_mu_with_complementarity: bool = False
    # One of ops.kkt.SOLVERS; "auto" resolves per backend at trace time
    # (ldlt on TPU -- lu_factor's lowering crashes the TPU compiler inside
    # solver loops -- lu elsewhere), so stock params just work on the chip.
    kkt_solver: str = "auto"
    # False drops the per-iteration telemetry buffers from the loop carry
    # (throughput path: less memory traffic, smaller HLO).
    record_history: bool = True
    # False replaces the data-dependent while_loop with a fixed-trip scan
    # (see bounded_loop) -- the right choice for large vmapped batches.
    # None = auto: fixed-trip on TPU (static loop structure compiles far
    # faster and sidesteps a memory-space-assignment compiler crash),
    # while_loop elsewhere.
    early_exit: Optional[bool] = None
    # Scan unroll factor for the fixed-trip path (fuses iterations, cutting
    # per-step dispatch overhead at some compile-time cost).
    unroll: int = 1

    def __post_init__(self):
        # Eager validation, mirroring CheckParams (qp.cc:76-82).
        assert self.initial_mu > 0
        assert 0 < self.sigma <= 1.0
        assert self.termination_kkt_tol > 0
        assert self.max_iterations > 0
        assert kkt_ops.is_valid_solver(self.kkt_solver), self.kkt_solver


class _IPState(NamedTuple):
    x: jax.Array
    s: jax.Array
    y: jax.Array
    z: jax.Array


def _ineq_matrix(qp: QP) -> jax.Array:
    """Dense (M, N) inequality matrix A_i with A_i[m, ineq_var[m]] = ineq_a[m].

    Built by iota-compare instead of scatter: gathers/scatters with traced
    indices inside nested loops both trigger an XLA-TPU memory-space-
    assignment crash and lower poorly; the dense form turns every constraint
    gather/scatter in the solver into a small matmul.
    """
    N = qp.N
    onehot = (
        jnp.arange(N, dtype=qp.ineq_var.dtype)[None, :] == qp.ineq_var[:, None]
    ).astype(qp.G.dtype)
    return onehot * qp.ineq_a[:, None]


def recommended_kkt_solver() -> str:
    """'ldlt' on TPU (lu_factor's lowering crashes the TPU compiler when
    nested in the solver loops; see CLAUDE.md), 'lu' elsewhere. Equivalent to
    passing ``kkt_solver="auto"`` (the stock default), which resolves the
    same way at trace time."""
    return kkt_ops.resolve_solver("auto")


def resolve_early_exit(early_exit: Optional[bool]) -> bool:
    """Resolve the ``early_exit=None`` auto sentinel: fixed-trip scans on TPU
    (faster compiles, no MSA compiler crash, and under vmap a while_loop runs
    to the slowest lane anyway), data-dependent while_loop elsewhere."""
    if early_exit is None:
        import jax as _jax

        return _jax.default_backend() != "tpu"
    return early_exit


def bounded_loop(cond, body, init, max_trips: int, early_exit: bool, unroll: int = 1):
    """``while_loop`` when early exit pays (single instance, CPU), or a
    fixed-trip ``lax.scan`` with a frozen-carry mask (TPU batched path).

    Under ``vmap`` a while_loop already runs until EVERY lane finishes, so the
    scan variant loses nothing semantically for batches -- but it hands XLA a
    static loop structure, which compiles far faster on TPU and sidesteps a
    memory-space-assignment compiler crash observed with deeply nested
    data-dependent while loops.

    ``early_exit=None`` resolves per backend (fixed-trip on TPU).
    """
    early_exit = resolve_early_exit(early_exit)
    if early_exit:
        return jax.lax.while_loop(cond, body, init)

    def scan_body(carry, _):
        keep = cond(carry)
        new = body(carry)
        carry = jax.tree.map(lambda old, nv: jnp.where(keep, nv, old), carry, new)
        return carry, None

    out, _ = jax.lax.scan(scan_body, init, None, length=max_trips, unroll=unroll)
    return out


def _kkt_conditions(qp: QP, st: _IPState, include_inequalities: bool = True):
    """First-order KKT residuals, eqs 19.2a-d with mu = 0 (qp.cc:391-420).

    Returns (r_d (N,), r_comp (M,), r_pe (K,), r_pi (M,)).
    """
    r_d = qp.G @ st.x + qp.c
    if qp.K > 0:
        r_d = r_d - qp.A_eq.T @ st.y
        r_pe = qp.A_eq @ st.x + qp.b_eq
    else:
        r_pe = jnp.zeros((0,), st.x.dtype)
    if include_inequalities and qp.M > 0:
        A_i = _ineq_matrix(qp)
        r_d = r_d - A_i.T @ st.z
        r_pi = A_i @ st.x + qp.ineq_b - st.s
        r_comp = st.s * st.z
    else:
        r_pi = jnp.zeros((qp.M,), st.x.dtype)
        r_comp = jnp.zeros((qp.M,), st.x.dtype)
    return r_d, r_comp, r_pe, r_pi


def _safe_norm(v: jax.Array) -> jax.Array:
    """L2 norm with a finite gradient at 0 (norm's sqrt has d/dx = inf there;
    KKT residuals are exactly 0 at a converged iterate, so plain norms poison
    reverse-mode differentiation through the solver)."""
    tiny = jnp.finfo(v.dtype).tiny
    return jnp.sqrt(jnp.sum(v * v) + tiny)


def _kkt_errors(r_d, r_comp, r_pe, r_pi, mu, M: int) -> KKTError:
    """L2 norms of the KKT residuals with the mu-corrected complementarity
    term (qp.cc:423-437)."""
    r_dual = _safe_norm(r_d)
    r_primal_eq = _safe_norm(r_pe) if r_pe.shape[0] > 0 else jnp.zeros((), r_d.dtype)
    if M > 0:
        # || s*z - mu ||_2 computed from the stored s*z (qp.cc:430-433).
        corrected = (
            jnp.sum(r_comp * r_comp) - 2.0 * jnp.sum(r_comp) * mu + mu * mu * M
        )
        r_comp_n = jnp.sqrt(jnp.maximum(corrected, jnp.finfo(r_d.dtype).tiny))
        r_primal_ineq = _safe_norm(r_pi)
    else:
        r_comp_n = jnp.zeros((), r_d.dtype)
        r_primal_ineq = jnp.zeros((), r_d.dtype)
    return KKTError(r_dual, r_comp_n, r_primal_eq, r_primal_ineq)


def _build_condensed(qp: QP, st: _IPState, include_inequalities: bool) -> jax.Array:
    """Condensed (N+K)x(N+K) KKT matrix (derivation: qp.cc:228-298):

        [[G + A_i^T Sigma A_i, A_eq^T], [A_eq, 0]],  Sigma = diag(z/s).
    """
    N, K = qp.N, qp.K
    dtype = qp.G.dtype
    G = qp.G
    if include_inequalities and qp.M > 0:
        A_i = _ineq_matrix(qp)
        G = G + A_i.T @ ((st.z / st.s)[:, None] * A_i)
    if K == 0:
        return G
    # Assemble by concatenation (static blocks, no scatter).
    zero_kk = jnp.zeros((K, K), dtype)
    top = jnp.concatenate([G, qp.A_eq.T], axis=1)
    bottom = jnp.concatenate([qp.A_eq, zero_kk], axis=1)
    return jnp.concatenate([top, bottom], axis=0)


def _solve_condensed(fact, r_dual_aug, r_pe, N: int, K: int, solver: str):
    """Solve the condensed system for (dx, dy) with the reference's sign
    convention (delta holds -p_y; see qp.cc:318-364)."""
    rhs = jnp.concatenate([-r_dual_aug, -r_pe]) if K > 0 else -r_dual_aug
    sol = kkt_ops.kkt_solve(fact, rhs, solver)
    dx = sol[:N]
    dy = -sol[N:] if K > 0 else jnp.zeros((0,), dx.dtype)
    return dx, dy


def _solve_for_update(
    qp: QP, st: _IPState, fact, r, mu, delta_affine, solver: str
):
    """SolveForUpdate analog (qp.cc:318-364): variable elimination of the
    inequality rows, condensed solve, then back-substitution of (ds, dz).

    ``r`` = (r_d, r_comp, r_pe, r_pi); ``delta_affine`` = (ds_aff, dz_aff)
    for the Mehrotra corrector term, zeros otherwise.
    """
    r_d, r_comp, r_pe, r_pi = r
    ds_aff, dz_aff = delta_affine
    N, K, M = qp.N, qp.K, qp.M

    r_dual_aug = r_d
    if M > 0:
        A_i = _ineq_matrix(qp)
        zs = st.z / st.s
        contrib = zs * r_pi + (r_comp + ds_aff * dz_aff - mu) / st.s
        r_dual_aug = r_dual_aug + A_i.T @ contrib

    dx, dy = _solve_condensed(fact, r_dual_aug, r_pe, N, K, solver)

    if M > 0:
        ds = A_i @ dx + r_pi
        dz = -(st.z / st.s) * ds - (r_comp + ds_aff * dz_aff - mu) / st.s
    else:
        ds = jnp.zeros((0,), dx.dtype)
        dz = jnp.zeros((0,), dx.dtype)
    return _IPState(dx, ds, dy, dz)


def _compute_alpha_vec(val, d_val, tau):
    """Fraction-to-boundary rule, formula 19.9 (qp.cc:491-507): largest
    alpha <= 1 with val + alpha*d_val >= (1 - tau) * val."""
    if val.shape[0] == 0:
        return jnp.ones((), val.dtype)
    updated = val + d_val
    blocking = (updated <= 0.0) & (jnp.abs(d_val) > 0.0)
    candidate = -tau * val / jnp.where(blocking, d_val, 1.0)
    return jnp.minimum(1.0, jnp.min(jnp.where(blocking, candidate, 1.0)))


def _compute_alpha(st: _IPState, delta: _IPState, tau) -> AlphaValues:
    return AlphaValues(
        primal=_compute_alpha_vec(st.s, delta.s, tau),
        dual=_compute_alpha_vec(st.z, delta.z, tau),
    )


def _compute_mu(st: _IPState, M: int):
    """Average complementarity, eq 19.19 (qp.cc:509-516)."""
    if M == 0:
        return jnp.zeros((), st.x.dtype)
    return jnp.dot(st.s, st.z) / M


def _mu_affine(st: _IPState, delta_aff: _IPState, mu, alpha_probe: AlphaValues, M: int):
    """Predictor-corrector mu_affine, eq 19.22 (qp.cc:519-537)."""
    mu_aff = (
        mu
        + alpha_probe.dual * jnp.dot(st.s, delta_aff.z) / M
        + alpha_probe.primal * jnp.dot(st.z, delta_aff.s) / M
        + alpha_probe.dual * alpha_probe.primal * jnp.dot(delta_aff.s, delta_aff.z) / M
    )
    return jnp.maximum(mu_aff, 0.0)


def _clamp_feasible(qp: QP, x: jax.Array) -> jax.Array:
    """Clamp x[var] into each constraint's feasible half-line
    (qp.cc:463-467)."""
    if qp.M == 0:
        return x
    # t_m = a x[v] + b; a violation (t < 0) is corrected by shifting x[v] by
    # -t/a. Violations of a lower and an upper bound on the same variable are
    # mutually exclusive, so the additive one-hot update equals the
    # reference's sequential per-constraint clamp.
    A_i = _ineq_matrix(qp)
    t = A_i @ x + qp.ineq_b
    shift = jnp.where(t < 0.0, -t / qp.ineq_a, 0.0)
    onehot = (A_i != 0.0).astype(x.dtype)
    return x + onehot.T @ shift


def _initial_sz(qp: QP, x: jax.Array):
    """Slack/dual heuristic s = max(1e-9, a*x+b), z = 1/s (qp.cc:469-481)."""
    if qp.M == 0:
        e = jnp.zeros((0,), x.dtype)
        return e, e
    s = jnp.maximum(1.0e-9, _ineq_matrix(qp) @ x + qp.ineq_b)
    return s, 1.0 / s


def _compute_initial_guess(
    qp: QP, params: QPInteriorPointParams, x0: Optional[_IPState]
) -> Tuple[_IPState, jax.Array]:
    """ComputeInitialGuess analog (qp.cc:439-482). Returns (state, ok)."""
    N, K = qp.N, qp.K
    dtype = qp.G.dtype
    ok = jnp.array(True)
    if params.initial_guess_method == InitialGuessMethod.USER_PROVIDED:
        assert x0 is not None, "USER_PROVIDED requires an initial state"
        return x0, ok

    x = jnp.zeros((N,), dtype)
    y = jnp.zeros((K,), dtype)
    if params.initial_guess_method == InitialGuessMethod.SOLVE_EQUALITY_CONSTRAINED:
        st0 = _IPState(x, jnp.zeros((qp.M,), dtype), y, jnp.zeros((qp.M,), dtype))
        H = _build_condensed(qp, st0, include_inequalities=False)
        fact, fac_ok = kkt_ops.kkt_factorize(H, params.kkt_solver)
        r_d, _, r_pe, _ = _kkt_conditions(qp, st0, include_inequalities=False)
        dx, dy = _solve_condensed(fact, r_d, r_pe, N, K, params.kkt_solver)
        good = fac_ok & jnp.all(jnp.isfinite(dx)) & jnp.all(jnp.isfinite(dy))
        x = jnp.where(good, dx, x)
        y = jnp.where(good, dy, y)
        ok = ok & good

    x = _clamp_feasible(qp, x)
    s, z = _initial_sz(qp, x)
    return _IPState(x, s, y, z), ok


class _IPCarry(NamedTuple):
    st: _IPState
    mu: jax.Array
    it: jax.Array  # int32 iterations completed
    status: jax.Array  # int32, -1 = running
    history: QPIterationHistory


@traced_phase("QPInteriorPointSolve")
def qp_ip_solve(
    qp: QP,
    params: QPInteriorPointParams = QPInteriorPointParams(),
    x0: Optional[jax.Array] = None,
    s0: Optional[jax.Array] = None,
    y0: Optional[jax.Array] = None,
    z0: Optional[jax.Array] = None,
) -> QPIPResult:
    """Primal-dual interior-point solve (qp.cc:100-201) as one jittable,
    vmappable function.

    The loop runs as ``lax.while_loop`` with an early-exit status; per
    iteration it: evaluates KKT residuals, factorizes the condensed system,
    solves for the step (with the selected barrier strategy), applies the
    fraction-to-boundary rule (tau = 0.995), and updates (x, s, y, z).
    """
    dtype = qp.G.dtype
    N, M, K = qp.N, qp.M, qp.K
    has_ineq = M > 0

    user_state = None
    guess_feasible = jnp.asarray(True)
    if params.initial_guess_method == InitialGuessMethod.USER_PROVIDED:
        user_state = _IPState(
            jnp.asarray(x0, dtype),
            jnp.asarray(s0, dtype) if s0 is not None else jnp.zeros((M,), dtype),
            jnp.asarray(y0, dtype) if y0 is not None else jnp.zeros((K,), dtype),
            jnp.asarray(z0, dtype) if z0 is not None else jnp.zeros((M,), dtype),
        )
        if M > 0:
            # The barrier terms divide by s and the interior-point iteration
            # assumes s, z > 0; validate instead of emitting NaN steps that
            # masquerade as FAILED_FACTORIZATION (reference: InfeasibleGuess,
            # qp.hpp:326-328).
            feas = jnp.all(user_state.s > 0) & jnp.all(user_state.z > 0)
            if isinstance(feas, jax.core.Tracer):
                guess_feasible = feas  # in-jit: carried as a status code
            elif not bool(feas):
                raise ValueError(
                    "InfeasibleGuess: USER_PROVIDED initial state must have "
                    "s > 0 and z > 0 elementwise (qp.hpp:326-328); got "
                    f"min(s)={float(jnp.min(user_state.s))}, "
                    f"min(z)={float(jnp.min(user_state.z))}"
                )

    st, guess_ok = _compute_initial_guess(qp, params, user_state)

    mu0 = (
        _compute_mu(st, M)
        if params.initialize_mu_with_complementarity
        else jnp.asarray(params.initial_mu, dtype)
    )

    def iterate(st: _IPState, mu):
        """One interior-point step (qp.cc:153-201). Returns
        (new_state, record, ok)."""
        r = _kkt_conditions(qp, st)
        H = _build_condensed(qp, st, include_inequalities=True)
        fact, ok = kkt_ops.kkt_factorize(H, params.kkt_solver)
        zeros_aff = (jnp.zeros((M,), dtype), jnp.zeros((M,), dtype))

        # 0 = "not computed" sentinel (NaN would poison autodiff).
        zero = jnp.zeros((), dtype)
        alpha_probe = AlphaValues(zero, zero)
        mu_aff = zero
        mu_used = mu

        if not has_ineq:
            delta = _solve_for_update(qp, st, fact, r, jnp.zeros((), dtype), zeros_aff, params.kkt_solver)
        elif params.barrier_strategy != BarrierStrategy.PREDICTOR_CORRECTOR:
            delta = _solve_for_update(qp, st, fact, r, mu_used, zeros_aff, params.kkt_solver)
        else:
            # Mehrotra predictor-corrector, algorithm 16.4 (qp.cc:170-188).
            delta_aff = _solve_for_update(
                qp, st, fact, r, jnp.zeros((), dtype), zeros_aff, params.kkt_solver
            )
            alpha_probe = _compute_alpha(st, delta_aff, jnp.ones((), dtype))
            mu_aff = _mu_affine(st, delta_aff, mu, alpha_probe, M)
            sigma = (mu_aff / mu) ** 3  # eq 19.22
            mu_used = sigma * mu
            delta = _solve_for_update(
                qp, st, fact, r, mu_used, (delta_aff.s, delta_aff.z), params.kkt_solver
            )

        ok = ok & jnp.all(jnp.isfinite(delta.x)) & jnp.all(jnp.isfinite(delta.y))
        if has_ineq:
            ok = ok & jnp.all(jnp.isfinite(delta.s)) & jnp.all(jnp.isfinite(delta.z))
            alpha = _compute_alpha(st, delta, jnp.asarray(0.995, dtype))
        else:
            alpha = AlphaValues(jnp.ones((), dtype), jnp.ones((), dtype))

        new_st = _IPState(
            st.x + delta.x * alpha.primal,
            st.s + delta.s * alpha.primal,
            st.y + delta.y * alpha.dual,
            st.z + delta.z * alpha.dual,
        )
        # Freeze the state if the factorization failed.
        new_st = jax.tree.map(lambda a, b: jnp.where(ok, a, b), new_st, st)
        return new_st, (mu_used, alpha, alpha_probe, mu_aff), ok

    def cond(carry: _IPCarry):
        return (carry.status < 0) & (carry.it < params.max_iterations)

    def body(carry: _IPCarry):
        st0_, mu, i = carry.st, carry.mu, carry.it
        r0 = _kkt_conditions(qp, st0_)
        kkt_prev = _kkt_errors(*r0, mu, M)

        st1, (mu_used, alpha, alpha_probe, mu_aff), ok = iterate(st0_, mu)

        r1 = _kkt_conditions(qp, st1)
        # kkt_after uses the incoming loop mu, not the Mehrotra-adjusted
        # mu_used: the reference (qp.cc:117-128) evaluates termination and the
        # decrease_mu_only_on_small_error gate against the loop mu; mu_used is
        # recorded in the history only.
        kkt_after = _kkt_errors(*r1, mu, M)

        h = carry.history
        if params.record_history:
            h = QPIterationHistory(
                kkt_initial=jax.tree.map(
                    lambda buf, v: buf.at[i].set(v), h.kkt_initial, kkt_prev
                ),
                kkt_final=jax.tree.map(
                    lambda buf, v: buf.at[i].set(v), h.kkt_final, kkt_after
                ),
                mu=h.mu.at[i].set(mu_used),
                alpha=AlphaValues(
                    h.alpha.primal.at[i].set(alpha.primal),
                    h.alpha.dual.at[i].set(alpha.dual),
                ),
                alpha_probe=AlphaValues(
                    h.alpha_probe.primal.at[i].set(alpha_probe.primal),
                    h.alpha_probe.dual.at[i].set(alpha_probe.dual),
                ),
                mu_affine=h.mu_affine.at[i].set(mu_aff),
            )

        comp = _compute_mu(st1, M)
        converged = (kkt_after.max() < params.termination_kkt_tol) & (
            comp < params.termination_complementarity_tol
        )
        status = jnp.where(
            ~ok,
            jnp.int32(QPTerminationState.FAILED_FACTORIZATION),
            jnp.where(converged, jnp.int32(QPTerminationState.SATISFIED_KKT_TOL), -1),
        )

        # Barrier update (qp.cc:140-146).
        may_decrease = (kkt_after.max() <= mu) | (
            not params.decrease_mu_only_on_small_error
        )
        if params.barrier_strategy == BarrierStrategy.FIXED_DECREASE:
            mu_next = jnp.where(may_decrease, mu * params.sigma, mu)
        else:
            mu_next = jnp.where(may_decrease, params.sigma * comp, mu)

        return _IPCarry(st1, mu_next, i + 1, status, h)

    init = _IPCarry(
        st=st,
        mu=mu0,
        it=jnp.zeros((), jnp.int32),
        status=jnp.where(
            guess_feasible,
            jnp.where(
                guess_ok,
                jnp.int32(-1),
                jnp.int32(QPTerminationState.FAILED_FACTORIZATION),
            ),
            jnp.int32(QPTerminationState.INFEASIBLE_GUESS),
        ),
        history=QPIterationHistory.empty(
            params.max_iterations if params.record_history else 0, dtype
        ),
    )
    out = bounded_loop(
        cond,
        body,
        init,
        params.max_iterations,
        resolve_early_exit(params.early_exit),
        params.unroll,
    )

    status = jnp.where(
        out.status < 0, jnp.int32(QPTerminationState.MAX_ITERATIONS), out.status
    )
    if K > 0:
        lagrange = QPLagrangeMultipliers(
            min=jnp.min(out.st.y), l_infinity=jnp.max(jnp.abs(out.st.y))
        )
    else:
        z0_ = jnp.zeros((), dtype)
        lagrange = QPLagrangeMultipliers(z0_, z0_)
    return QPIPResult(
        termination_state=status,
        num_iterations=out.it,
        x=out.st.x,
        s=out.st.s,
        y=out.st.y,
        z=out.st.z,
        iterations=out.history,
        lagrange_multipliers=lagrange,
    )


def build_full_kkt_system(qp: QP, x, s, y, z):
    """Dense (N+2M+K) Newton system of eq 19.12, used as the brute-force test
    oracle (analog of BuildFullSystem, qp.cc:595-655). Returns (H, r) with
    delta ordering [p_x; p_s; -p_y; -p_z] and mu = 0."""
    N, M, K = qp.N, qp.M, qp.K
    dtype = qp.G.dtype
    dim = N + 2 * M + K
    H = jnp.zeros((dim, dim), dtype)
    r = jnp.zeros((dim,), dtype)

    H = H.at[:N, :N].set(qp.G)
    if K > 0:
        H = H.at[:N, N + M : N + M + K].set(qp.A_eq.T)
        H = H.at[N + M : N + M + K, :N].set(qp.A_eq)

    r_d = qp.G @ x + qp.c
    if K > 0:
        r_d = r_d - qp.A_eq.T @ y
        r = r.at[N + M : N + M + K].set(qp.A_eq @ x + qp.b_eq)

    if M > 0:
        A_i = jnp.zeros((M, N), dtype).at[jnp.arange(M), qp.ineq_var].set(qp.ineq_a)
        H = H.at[:N, N + M + K :].set(A_i.T)
        H = H.at[N + M + K :, :N].set(A_i)
        H = H.at[
            jnp.arange(N + M + K, dim), jnp.arange(N, N + M)
        ].set(-1.0)  # -I in the p_s column of the last block row
        H = H.at[jnp.arange(N, N + M), jnp.arange(N, N + M)].set(z / s)  # Sigma
        H = H.at[jnp.arange(N, N + M), jnp.arange(N + M + K, dim)].set(-1.0)
        r_d = r_d - A_i.T @ z
        r = r.at[N : N + M].set(z)  # diag(s)^-1 * r_comp with mu = 0
        r = r.at[N + M + K :].set(A_i @ x + qp.ineq_b - s)
    r = r.at[:N].set(r_d)
    return H, r


# ---------------------------------------------------------------------------
# Null-space solver.
# ---------------------------------------------------------------------------


@traced_phase("QPNullSpaceSolve")
def qp_null_space_solve(qp: QP) -> QPNullSpaceResult:
    """Equality-constrained QP via the null-space method (qp.cc:657-729),
    rank-aware.

    The reference factors A_eq^T by column-pivoted Householder QR and sizes
    the null-space basis Q2 from the *numerical rank* (qp.cc:687-698).
    Dynamic basis widths don't jit, so this uses the static-shape equivalent:
    an SVD ``A_eq^T = U S V^T`` whose trailing columns of U span null(A_eq),
    selected by a rank MASK rather than a slice. The reduced system
    ``(Q2^T G Q2) y = -Q2^T (c + G u)`` becomes a masked N x N system in the
    rotated basis U (identity rows outside the null space), factored by
    Cholesky -- non-PD yields NOT_POSITIVE_DEFINITE exactly as the
    reference's LLT failure path.

    Rank-deficient A_eq with *consistent* constraints succeeds (minimum-norm
    particular solution; the redundant rows are inert). Rank-deficient with
    *inconsistent* constraints -- no x satisfies them -- returns
    CONSTRAINT_RANK_DEFICIENT instead of the silent garbage a full-row-rank
    assumption would produce.
    """
    K, N = qp.A_eq.shape
    assert K > 0, "Problem must have at least one equality constraint"
    dtype = qp.G.dtype
    eps = jnp.finfo(dtype).eps

    U, S, Vt = jnp.linalg.svd(qp.A_eq.T, full_matrices=True)  # (N,N),(m,),(K,K)
    m_sv = S.shape[0]  # min(N, K)
    smax = jnp.maximum(S[0], eps)
    # Numerical-rank threshold (Eigen/NumPy convention): relative to the
    # largest singular value, scaled by the matrix size.
    nonzero = S > smax * max(N, K) * eps
    rank = jnp.sum(nonzero.astype(jnp.int32))

    # Minimum-norm particular solution u = A_eq^+ (-b_eq) = U S^+ V^T (-b_eq).
    s_inv = jnp.where(nonzero, 1.0 / jnp.where(nonzero, S, 1.0), 0.0)
    u = U[:, :m_sv] @ (s_inv * (Vt @ (-qp.b_eq))[:m_sv])

    # Consistency of the (possibly redundant) constraint set at u.
    resid = jnp.max(jnp.abs(qp.A_eq @ u + qp.b_eq))
    consistent = resid <= jnp.sqrt(eps) * (1.0 + jnp.max(jnp.abs(qp.b_eq)))

    # Masked reduced problem: column j of U is a null-space direction iff
    # j >= rank (static-shape analog of Q2 = U[:, rank:]).
    null_mask = (jnp.arange(N) >= rank).astype(dtype)
    B = U.T @ qp.G @ U
    B_masked = null_mask[:, None] * B * null_mask[None, :] + jnp.diag(
        1.0 - null_mask
    )
    L = jnp.linalg.cholesky(B_masked)  # NaN rows when not PD
    ok_pd = jnp.all(jnp.isfinite(L))
    L_safe = jnp.where(ok_pd, L, jnp.eye(N, dtype=dtype))

    rhs = -(U.T @ (qp.c + qp.G @ u)) * null_mask
    w = jax.scipy.linalg.solve_triangular(L_safe, rhs, lower=True)
    yv = jax.scipy.linalg.solve_triangular(L_safe.T, w, lower=False)
    x = u + U @ (yv * null_mask)

    ok = ok_pd & consistent
    status = jnp.where(
        ~consistent,
        jnp.int32(QPNullSpaceTerminationState.CONSTRAINT_RANK_DEFICIENT),
        jnp.where(
            ok_pd,
            jnp.int32(QPNullSpaceTerminationState.SUCCESS),
            jnp.int32(QPNullSpaceTerminationState.NOT_POSITIVE_DEFINITE),
        ),
    )
    return QPNullSpaceResult(
        termination_state=status,
        x=jnp.where(ok, x, jnp.zeros_like(x)),
        rank=rank,
    )
