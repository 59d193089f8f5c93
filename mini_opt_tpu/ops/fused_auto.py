"""Compile a general-path ``Problem`` into a fused whole-solver kernel.

``family_from_problem`` closes the loop between the two solver tiers: the
same ``Problem`` description that drives ``nls_solve`` (the general SQP
path) is compiled into a :class:`FusedFamily`, whose whole constrained-SQP
solve then runs as ONE Pallas kernel per batch (``fused_solve_batch``) --
the VERDICT round-1 item 4 "generator from a static Problem description".

How it works. The fused kernels hold every per-instance quantity as an
(8, 128) lane register (1024 instances per vector op). User residuals are
written for a single instance: ``fn(x_local: (P,)) -> (dim,)``. We evaluate
them directly on a stacked register array of shape ``(P, 8, 128)``:

* indexing ``x[0]``/``x[i]`` yields a register,
* elementwise jnp math broadcasts over the trailing lane dims,
* ``jnp.stack([...])`` of registers builds the ``(dim, 8, 128)`` output,

so any residual written in this **scalar style** (static Python indexing +
elementwise ops; nothing that depends on ``x.shape`` like ``jnp.sum(x)`` or
matmuls over the parameter axis) traces to pure register code that Mosaic
can compile. Jacobians are taken with ``P`` unrolled ``jax.jvp`` calls
(one basis tangent per local parameter, built by stacking -- Pallas has no
scatter, so ``.at[].set`` is off limits), which is exactly ``jacfwd``
column by column; custom ``Residual.jac`` callables are NOT consulted
(jvp of ``fn`` is authoritative -- reference residual_test.cc pins custom
jacobians to the numerical derivative of ``fn`` anyway).

The structural metadata (variable count, residual indices/dims, box
bounds) is read from one eager probe call of the builder with zero data.
``check_family_against_problem`` validates the scalar-style contract by
comparing the compiled linearization against the general path's on random
instances -- run it in a test whenever you write a new builder.

Reference provenance: the generated kernel is the same fused SQP as
ops/pallas_ik.py (reference algorithm: nonlinear.cc:75-343 outer loop,
qp.cc:100-201 interior point); this module only generates the
family-specific ``linearize``/``errors`` register callables.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..residual import BlockResidual, Residual
from .pallas_ik import FusedFamily


def _probe_structure(problem_builder, data_rows):
    """Eagerly build the problem once with zero data to read off its static
    structure (costs/equality indices+dims, dimension, box bounds)."""
    import numpy as np

    probe = problem_builder(np.zeros((data_rows,), dtype=np.float64))
    n = probe.dimension
    for group in (probe.costs, probe.equality_constraints):
        for r in group:
            if isinstance(r, Residual):
                continue
            if isinstance(r, BlockResidual):
                # Small homogeneous blocks (MPC tracking rows, pose-graph
                # edges at small N) unroll into per-block register code; the
                # block count and index rows must be static Python.
                if not isinstance(r.indices, tuple):
                    raise TypeError(
                        "family_from_problem needs STATIC BlockResidual "
                        "indices (nested tuples); traced index arrays are "
                        "the sharded large-N case -- use the CG path."
                    )
                continue
            raise TypeError(
                "family_from_problem supports Residual and static-index "
                f"BlockResidual costs (got {type(r).__name__})."
            )
    lower = [None] * n
    upper = [None] * n
    for con in probe.inequality_constraints:
        a = float(con.a)
        b = float(con.b)
        if a == 0.0:
            raise ValueError("inequality with a == 0 constrains nothing")
        bound = -b / a
        v = int(con.variable)
        if a > 0.0:
            lower[v] = bound if lower[v] is None else max(lower[v], bound)
        else:
            upper[v] = bound if upper[v] is None else min(upper[v], bound)
    m_eq = sum(
        c.dim * (c.num_blocks if isinstance(c, BlockResidual) else 1)
        for c in probe.equality_constraints
    )
    return probe, n, tuple(lower), tuple(upper), m_eq


def _static_blocks(res):
    """The static (global-index-tuple, dim) list of a Residual /
    static-index BlockResidual, in _iter_blocks emission order."""
    if isinstance(res, BlockResidual):
        return [(tuple(res.indices[b]), res.dim) for b in range(res.num_blocks)]
    return [(tuple(res.index), res.dim)]


def _sparsity_patterns(probe, n):
    """Read the Hessian lower-triangle pattern and per-equality-row variable
    sets off the probe Problem's static block structure.  Must mirror
    ``linearize``'s accumulation/emission order exactly: G[ga][gb] cells are
    touched for every (ga, gb) pair within a cost block (gb <= ga); equality
    rows are emitted block by block, ``dim`` rows per block, each touching
    exactly the block's index set."""
    g = set()
    for cost in probe.costs:
        for idx, _dim in _static_blocks(cost):
            for ga in idx:
                for gb in idx:
                    if gb <= ga:
                        g.add((ga, gb))
    eq_rows = []
    for con in probe.equality_constraints:
        for idx, dim in _static_blocks(con):
            eq_rows.extend([frozenset(idx)] * dim)
    return frozenset(g), tuple(eq_rows)


def _basis_tangents(p, one, zero):
    """P one-hot (P, 8, 128) tangents, built by stacking (no scatter)."""
    return [
        jnp.stack([one if i == a else zero for i in range(p)])
        for a in range(p)
    ]


def family_from_problem(
    problem_builder: Callable,
    data_rows: int,
    retract: Optional[Callable] = None,
) -> FusedFamily:
    """Compile ``problem_builder`` into a :class:`FusedFamily`.

    Args:
      problem_builder: ``data -> Problem`` for ONE instance, where ``data``
        is the per-instance payload of shape ``(data_rows,)`` (targets,
        weights, ...; may be traced). Every residual ``fn`` must be written
        in scalar style (see module docstring). The problem's *structure*
        (dimension, residual indices/dims, box bounds) must not depend on
        the data values.
      data_rows: payload length per instance.
      retract: optional manifold update applied to every line-search
        candidate, as a register-level ``list[n] -> list[n]`` callable
        (e.g. ``lambda th: [mod_pi(t) for t in th]``).

    Returns a family for :func:`fused_solve_batch`; construct ONCE at module
    level (each instance is a distinct kernel specialization).
    """
    probe, n, lower, upper, m_eq = _probe_structure(problem_builder, data_rows)
    g_pattern, eq_patterns = _sparsity_patterns(probe, n)

    def _eval_one(fn, dim, idx, x_regs, with_jac):
        """Evaluate one residual block ``fn(xl) -> (dim,)`` on registers.

        Returns (rows, cols) where rows[k] is output-row register k and
        cols[a][k] is d rows[k] / d local-param a (None without jac)."""
        p = len(idx)
        xl = jnp.stack([x_regs[i] for i in idx])  # (P, 8, 128)
        if not with_jac:
            r = fn(xl)
            return [r[k] for k in range(dim)], None
        one = jnp.ones_like(x_regs[0])
        zero = jnp.zeros_like(x_regs[0])
        rows = None
        cols = []
        for tangent in _basis_tangents(p, one, zero):
            r, dr = jax.jvp(fn, (xl,), (tangent,))
            if rows is None:
                rows = [r[k] for k in range(dim)]
            cols.append([dr[k] for k in range(dim)])
        if rows is None:  # P == 0 cannot happen for a valid Residual
            rows = [fn(xl)[k] for k in range(dim)]
        return rows, cols

    def _iter_blocks(res, x_regs, with_jac):
        """Yield (global_idx, rows, cols) per block: one for a plain
        Residual, ``num_blocks`` for a static-index BlockResidual (each
        unrolled to register code with its own data row bound)."""
        if isinstance(res, BlockResidual):
            for b in range(res.num_blocks):
                idx = tuple(res.indices[b])
                if res.data is None:
                    fn = lambda xl, _fn=res.fn: _fn(
                        xl, jnp.zeros((0,), xl.dtype)
                    )
                else:
                    drow = res.data[b]
                    fn = lambda xl, _fn=res.fn, _d=drow: _fn(xl, _d)
                yield idx, *_eval_one(fn, res.dim, idx, x_regs, with_jac)
        else:
            yield res.index, *_eval_one(
                res.fn, res.dim, res.index, x_regs, with_jac
            )

    def linearize(x_regs, data_regs):
        problem = problem_builder(jnp.stack(data_regs))
        zero = jnp.zeros_like(x_regs[0])
        f = zero
        G = [[zero] * (i + 1) for i in range(n)]
        c = [zero] * n
        for cost in problem.costs:
            for idx, rows, cols in _iter_blocks(cost, x_regs, with_jac=True):
                for r in rows:
                    f = f + 0.5 * r * r
                # J^T J into the global lower triangle, J^T r into the
                # gradient (residual.hpp:204-224 scatter-add, as static
                # register sums).
                for a, ga in enumerate(idx):
                    for b, gb in enumerate(idx):
                        if gb > ga:
                            continue
                        acc = G[ga][gb]
                        for k in range(cost.dim):
                            acc = acc + cols[a][k] * cols[b][k]
                        G[ga][gb] = acc
                    acc = c[ga]
                    for k in range(cost.dim):
                        acc = acc + cols[a][k] * rows[k]
                    c[ga] = acc
        r_eq = []
        J_eq = []
        for con in problem.equality_constraints:
            for idx, rows, cols in _iter_blocks(con, x_regs, with_jac=True):
                for k in range(con.dim):
                    r_eq.append(rows[k])
                    row = [zero] * n
                    for a, ga in enumerate(idx):
                        row[ga] = cols[a][k]
                    J_eq.append(row)
        return f, r_eq, J_eq, G, c

    def errors(x_regs, data_regs):
        problem = problem_builder(jnp.stack(data_regs))
        zero = jnp.zeros_like(x_regs[0])
        f = zero
        for cost in problem.costs:
            for _, rows, _ in _iter_blocks(cost, x_regs, with_jac=False):
                for r in rows:
                    f = f + 0.5 * r * r
        eq_l1 = zero
        for con in problem.equality_constraints:
            for _, rows, _ in _iter_blocks(con, x_regs, with_jac=False):
                for r in rows:
                    eq_l1 = eq_l1 + jnp.abs(r)
        return f, eq_l1

    return FusedFamily(
        n=n,
        data_rows=data_rows,
        m_eq=m_eq,
        linearize=linearize,
        errors=errors,
        lower=lower,
        upper=upper,
        retract=retract,
        g_pattern=g_pattern,
        eq_patterns=eq_patterns,
    )


def check_family_against_problem(
    family: FusedFamily,
    problem_builder: Callable,
    data: jax.Array,  # (B, data_rows) sample instances
    x: jax.Array,  # (B, n) sample points
    atol: float = 1e-6,
    rtol: float = 1e-6,
):
    """Eager validation of the scalar-style contract: compare the compiled
    register ``linearize``/``errors`` against the general path's per-block
    semantics on B sample instances (run OUTSIDE any kernel). Raises on
    mismatch; returns the max absolute deviation otherwise."""
    import numpy as np

    B = data.shape[0]
    if B > 1024:
        raise ValueError(
            f"check_family_against_problem packs one (8, 128) register tile "
            f"(1024 instances); got B={B} -- validate on a sample"
        )
    pad = 1024
    dtype = x.dtype

    def to_regs(arr, rows):
        # (B, rows) -> list of rows (8, 128)-register stacks of ceil(B/1024)
        # tiles; we only use the first tile here (B <= 1024 recommended).
        a = np.zeros((pad, rows), dtype=dtype)
        a[:B] = np.asarray(arr)
        t = a.T.reshape(rows, 8, 128)
        return [jnp.asarray(t[i]) for i in range(rows)]

    x_regs = to_regs(x, family.n)
    d_regs = to_regs(data, family.data_rows)
    f, r_eq, J_eq, G, c = jax.jit(family.linearize)(x_regs, d_regs)
    fe, eqe = jax.jit(family.errors)(x_regs, d_regs)

    def flat(reg):
        return np.asarray(reg).reshape(-1)[:B]

    worst = 0.0

    def cmp(a, b, what):
        nonlocal worst
        a = np.asarray(a)
        b = np.asarray(b)
        dev = float(np.max(np.abs(a - b))) if a.size else 0.0
        worst = max(worst, dev)
        if not np.allclose(a, b, atol=atol, rtol=rtol):
            raise AssertionError(
                f"{what}: register path deviates from the general path "
                f"(max abs {dev:.3e}) -- the builder's residuals are not "
                "scalar-style (see fused_auto docstring)"
            )

    from ..nonlinear import linearize_and_fill_qp

    for b in range(B):
        problem = problem_builder(data[b])
        qp, errs = linearize_and_fill_qp(problem, x[b], lam=jnp.zeros((), dtype))
        n = family.n
        G_b = np.zeros((n, n))
        for i in range(n):
            for j in range(i + 1):
                G_b[i, j] = flat(G[i][j])[b]
        ref_G = np.asarray(qp.G)
        cmp(G_b, np.tril(ref_G), f"G[{b}]")
        cmp([flat(ci)[b] for ci in c], np.asarray(qp.c), f"c[{b}]")
        cmp([flat(r)[b] for r in r_eq], np.asarray(qp.b_eq), f"r_eq[{b}]")
        for k in range(family.m_eq):
            cmp(
                [flat(J_eq[k][i])[b] for i in range(n)],
                np.asarray(qp.A_eq)[k],
                f"J_eq[{k}][{b}]",
            )
        cmp(flat(f)[b], float(errs.f), f"f[{b}]")
        cmp(flat(eqe)[b], float(errs.equality), f"eq_l1[{b}]")
        # Sparsity-hint SOUNDNESS (the blocked tier zeroes cells outside the
        # hints -- an unsound pattern would silently corrupt G / J_eq there):
        # every general-path nonzero must lie inside the declared pattern.
        if family.g_pattern is not None:
            tl = np.tril(ref_G)
            bad = [
                (i, j)
                for i, j in zip(*np.nonzero(np.abs(tl) > atol))
                if (int(i), int(j)) not in family.g_pattern
            ]
            assert not bad, (
                f"g_pattern unsound for instance {b}: general-path G has "
                f"nonzeros outside the hint at {bad[:5]}"
            )
        if family.eq_patterns is not None:
            A = np.asarray(qp.A_eq)
            for k in range(family.m_eq):
                bad = [
                    int(j)
                    for j in np.nonzero(np.abs(A[k]) > atol)[0]
                    if int(j) not in family.eq_patterns[k]
                ]
                assert not bad, (
                    f"eq_patterns[{k}] unsound for instance {b}: nonzero "
                    f"Jacobian columns {bad[:5]} outside the hint"
                )
    return worst


@functools.lru_cache(maxsize=None)
def _cached_family(problem_builder, data_rows, retract):
    return family_from_problem(problem_builder, data_rows, retract=retract)


def fused_nls_solve_batch(
    problem_builder: Callable,
    data: jax.Array,  # (B, data_rows)
    x0: jax.Array,  # (B, n)
    params,  # NLSParams
    retract: Optional[Callable] = None,
):
    """``nls_solve``'s fused-kernel twin: solve B instances of
    ``problem_builder`` with ONE whole-solver Pallas kernel, configured from
    the same :class:`NLSParams` the general path takes.

    Honored knobs: ``max_iterations`` / ``max_qp_iterations`` /
    ``max_line_search_iterations`` (the kernel runs them as FIXED trip
    counts -- it has no early exit, like ``early_exit=False``),
    ``line_search_strategy``, and ``qp_barrier_strategy`` (FIXED_DECREASE is
    not available in the kernel; COMPLEMENTARITY and PREDICTOR_CORRECTOR
    are). Tolerance knobs are ignored (fixed-trip semantics). The damping /
    penalty machine uses the kernel's fixed constants (lambda0 1e-3,
    penalty0 1e-2, Armijo tau 0.5 -- the ``default_ik_params`` values);
    a different ``armijo_search_tau`` raises rather than being silently
    ignored.

    The compiled family is cached on (builder, data_rows, retract) identity,
    so repeated calls reuse one kernel specialization.
    """
    from ..structs import BarrierStrategy, LineSearchStrategy

    if params.line_search_strategy == LineSearchStrategy.ARMIJO_BACKTRACK:
        if abs(params.armijo_search_tau - 0.5) > 1e-12:
            raise ValueError(
                "the fused kernel backtracks with fixed tau=0.5; got "
                f"armijo_search_tau={params.armijo_search_tau}"
            )
        line_search = "armijo"
    else:
        line_search = "polynomial"
    if params.qp_barrier_strategy == BarrierStrategy.PREDICTOR_CORRECTOR:
        barrier = "mpc"
    elif params.qp_barrier_strategy == BarrierStrategy.COMPLEMENTARITY:
        barrier = "complementarity"
    else:
        raise ValueError(
            f"unsupported barrier for the fused kernel: "
            f"{params.qp_barrier_strategy!r}"
        )
    family = _cached_family(problem_builder, int(data.shape[1]), retract)
    from .pallas_ik import fused_solve_batch

    return fused_solve_batch(
        family,
        data,
        x0,
        max_iterations=params.max_iterations,
        qp_iterations=params.max_qp_iterations,
        ls_iterations=params.max_line_search_iterations,
        line_search=line_search,
        barrier=barrier,
    )
