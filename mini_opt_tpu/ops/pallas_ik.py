"""Fused whole-solver Pallas kernels, generated from a problem-family DSL.

The general solver (nonlinear.py) is a composition of XLA ops under nested
scans; it is dispatch/granularity-bound, not FLOP-bound (measured ~8M
solves/s/chip after round-2 fusion work). These kernels are the
speed-of-light serving path: the ENTIRE constrained SQP solve -- residual
linearization, Gauss-Newton assembly, the condensed-KKT interior-point inner
loop with a fully unrolled scalar LDL^T, fraction-to-boundary, L1-merit
Armijo/polynomial line search with retraction, and the LM lambda state
machine -- unrolled into straight-line elementwise code over sublane-packed
(8, 128) register tiles (measured ~130M IK solves/s/chip at n=2). One kernel
invocation solves 1024 instances per grid step with zero inter-op overhead;
the same packed layout runs compiled on TPU and interpreted in CPU tests.

The public surface is the **family DSL** (`FusedFamily` + `fused_solve_batch`):
a user writes ``linearize`` / ``errors`` over *lists of lane registers* (each
register is one (8, 128) tile holding 1024 instances of one scalar), declares
per-variable box bounds and an optional retraction, and gets the fused
whole-solver kernel for that family. All matrices are nested Python lists of
registers, so every linear-algebra step unrolls to scalar lane arithmetic; the
number of equality rows, the bound structure, and the chain length are static
Python, erased at trace time.

Built-in families: the planar Z-rotation chain (the reference IK problem,
/root/reference/test/nonlinear_test.cc:828-960 -- cost on effector y, equality
on effector x, [0, pi] limits on joints 1..n-1) and the alternating-axis 3-D
spatial chain (models/ik.py::make_spatial_chain is the general-solver twin).
Arbitrary chains need no handwritten family at all: ANY ActuatorChain
(multi-axis euler masks, prismatic joints, fixed offsets) compiles through
models/ik.py::scalar_chain_ik_builder + ops/fused_auto.py (one call:
models/ik.py::fused_chain_ik_solve).

Fixed-trip robustness: kernels return the BEST-merit iterate ever visited
(not the final one) and clamp the Armijo slack term to <= 0 -- see the
best-merit guard in _make_kernel for why post-convergence f32 inner-QP
iterations demand this.

Semantics mirror nls_solve's fixed-trip configuration (same mu schedule,
tolerances, penalty update, Armijo constants; qp.cc:153-201 barrier math);
state-level parity against the general solver is asserted in
tests/test_pallas_ik.py, and custom DSL families are pinned against nls_solve
in tests/test_fused_family.py.

This is the production pattern for a hot workload (like fused attention),
sitting on top of the general solver.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

@functools.lru_cache(maxsize=1)
def _interpret() -> bool:
    """Interpret-mode decision, deferred to first kernel call: resolving the
    backend at IMPORT time would initialize JAX's platform as a side effect
    of `import mini_opt_tpu`, defeating the documented post-import
    `jax.config.update("jax_platforms", "cpu")` workaround for the axon
    plugin (see CLAUDE.md) and touching the TPU tunnel for host-only use."""
    return jax.default_backend() != "tpu" or bool(
        int(os.environ.get("MINI_OPT_PALLAS_INTERPRET", "0"))
    )


_PI = 3.14159265358979


def _mod_pi(a):
    return a - 2.0 * _PI * jnp.floor((a + _PI) / (2.0 * _PI))


def _ldlt_factor_unrolled(H):
    """Factor the symmetric DxD system (nested list of lane rows, lower
    triangle read) as unit-lower L and diagonal d; fully unrolled."""
    n = len(H)
    L = [[None] * n for _ in range(n)]
    d = [None] * n
    for j in range(n):
        acc = H[j][j]
        for k in range(j):
            acc = acc - L[j][k] * L[j][k] * d[k]
        d[j] = acc
        for i in range(j + 1, n):
            aij = H[i][j] if i >= j else H[j][i]
            for k in range(j):
                aij = aij - L[i][k] * L[j][k] * d[k]
            L[i][j] = aij / d[j]
    return L, d


def _ldlt_apply(L, d, r):
    """Solve with an existing LDL^T factorization (unrolled substitutions)."""
    n = len(r)
    y = list(r)
    for i in range(n):
        for k in range(i):
            y[i] = y[i] - L[i][k] * y[k]
    for i in range(n):
        y[i] = y[i] / d[i]
    for i in range(n - 1, -1, -1):
        for k in range(i + 1, n):
            y[i] = y[i] - L[k][i] * y[k]
    return y


def _ldlt_solve_unrolled(H, r):
    L, d = _ldlt_factor_unrolled(H)
    return _ldlt_apply(L, d, r)


def _ldlt_bad(d, zero):
    """Per-lane factorization-health register: 1.0 where any pivot is
    (near-)zero or non-finite -- the in-kernel analog of the ok flag every
    ops.kkt backend returns (qp.cc:303-307 FailedFactorization)."""
    tiny = jnp.finfo(zero.dtype).tiny
    bad = zero
    one = jnp.ones_like(zero)
    for dj in d:
        good = (jnp.abs(dj) > tiny) & jnp.isfinite(dj)
        bad = jnp.maximum(bad, jnp.where(good, zero, one))
    return bad


@dataclasses.dataclass(frozen=True, eq=False)
class FusedFamily:
    """A problem family compilable to a fused whole-solver kernel.

    The callables operate on *lists of lane registers*: ``x`` is a list of
    ``n`` registers (variable i across 1024 instances), ``data`` a list of
    ``data_rows`` registers of per-instance payload (targets, weights, ...).
    Use ``jnp`` elementwise ops only -- every register op is one VPU
    instruction over the (8, 128) tile; no dynamic shapes, no gathers.

    Attributes:
      n: number of optimization variables.
      data_rows: per-instance data registers handed to the callables.
      m_eq: number of (nonlinear, L1-penalized) equality constraint rows.
      linearize: ``(x, data) -> (f, r_eq, J_eq, G, c)`` -- the Gauss-Newton
        linearization at x: scalar cost register f = 0.5*||r_cost||^2;
        equality residual registers ``r_eq`` (length m_eq) with row Jacobians
        ``J_eq`` (m_eq lists of n registers); the cost Hessian's lower
        triangle ``G`` (``G[i][j]`` for j <= i) and gradient ``c`` (J^T r).
      errors: ``(x, data) -> (f, eq_l1)`` -- cost and summed |equality|
        at x (the line-search probe evaluation; no Jacobians).
      lower / upper: per-variable bound constants (None = unbounded on that
        side). Bounds become interior-point slack rows, matching
        ``Var(i) >= lo`` / ``<= hi`` in the general solver.
      retract: optional manifold update applied to every line-search
        candidate, ``list[n] -> list[n]`` (e.g. angle wrapping); identity
        when None.

    Hashable by identity (construct once, reuse across calls -- each distinct
    instance is a separate jit/kernel specialization).
    """

    n: int
    data_rows: int
    m_eq: int
    linearize: Callable
    errors: Callable
    lower: Tuple[Optional[float], ...]
    upper: Tuple[Optional[float], ...]
    retract: Optional[Callable] = None
    # Optional static sparsity hints, used ONLY by the blocked tier
    # (ops/pallas_blocked.py) to coalesce structural-zero runs when stacking
    # the register lists into VMEM tensors -- trace size O(nnz) instead of
    # O(n^2) per outer iteration (the round-5 program-size ceiling).  Values
    # are bit-identical with or without them (the skipped cells are exact
    # zeros).  ``g_pattern``: frozenset of lower-triangle (i, j), i >= j,
    # pairs that MAY be nonzero in the cost Hessian G (None = treat dense).
    # ``eq_patterns``: per equality row, the frozenset of variable indices
    # its Jacobian row touches (None = treat dense).  family_from_problem
    # fills both from the Problem's static block structure
    # (residual.hpp:204-224's index lists, read at build time).
    g_pattern: "Optional[frozenset]" = None
    eq_patterns: "Optional[Tuple[frozenset, ...]]" = None

    def __post_init__(self):
        assert len(self.lower) == self.n and len(self.upper) == self.n
        if self.eq_patterns is not None:
            assert len(self.eq_patterns) == self.m_eq


@functools.lru_cache(maxsize=None)
def planar_family(n, link_len):
    """The planar Z-rotation chain family (the reference IK problem,
    nonlinear_test.cc:828-960): cost on effector y, equality on effector x,
    [0, pi] limits on joints 1..n-1."""
    L = link_len

    def fk(th):
        phis = []
        acc = None
        for i in range(n):
            acc = th[i] if acc is None else acc + th[i]
            phis.append(acc)
        c = [jnp.cos(p) for p in phis]
        s = [jnp.sin(p) for p in phis]
        px = L * sum(c)
        py = L * sum(s)
        # dpx/dth_a = -L sum_{i>=a} s_i ; dpy/dth_a = L sum_{i>=a} c_i
        jx, jy = [], []
        sx = sy = None
        for a in range(n - 1, -1, -1):
            sx = s[a] if sx is None else sx + s[a]
            sy = c[a] if sy is None else sy + c[a]
            jx.append(-L * sx)
            jy.append(L * sy)
        jx.reverse()
        jy.reverse()
        return px, py, jx, jy

    def linearize(th, tgt):
        tx, ty = tgt
        px, py, jx, jy = fk(th)
        ry = py - ty
        rx = px - tx
        f_pre = 0.5 * ry * ry
        G = [[jy[i] * jy[j] for j in range(i + 1)] for i in range(n)]
        c = [jy[i] * ry for i in range(n)]
        return f_pre, [rx], [jx], G, c

    def errors(th, tgt):
        tx, ty = tgt
        px, py, _, _ = fk(th)
        return 0.5 * (py - ty) ** 2, jnp.abs(px - tx)

    return FusedFamily(
        n=n,
        data_rows=2,
        m_eq=1,
        linearize=linearize,
        errors=errors,
        lower=(None,) + (0.0,) * (n - 1),
        upper=(None,) + (_PI,) * (n - 1),
        retract=lambda th: [_mod_pi(t) for t in th],
    )


@functools.lru_cache(maxsize=None)
def spatial_family(n, link_len):
    """3-D chain with ALTERNATING rotation axes (z, y, z, y, ...), links
    along local x: cost on effector (y, z), equality on effector x -- the
    non-planar fused family (models/ik.py::make_spatial_chain is the
    general-solver twin built from SO(3) actuator masks)."""
    L = link_len

    def fk(th):
        """Returns effector p (3 registers) and per-joint world Jacobians
        J[a] = w_a x (p - q_a), all as register lists."""
        one = jnp.ones_like(th[0])
        zero = jnp.zeros_like(th[0])
        # R as columns; start at identity.
        R = [[one, zero, zero], [zero, one, zero], [zero, zero, one]]
        p = [zero, zero, zero]
        ws, qs = [], []
        for a in range(n):
            axis_col = 2 if a % 2 == 0 else 1  # z-axis or y-axis column
            ws.append([R[0][axis_col], R[1][axis_col], R[2][axis_col]])
            qs.append(list(p))
            c_, s_ = jnp.cos(th[a]), jnp.sin(th[a])
            if a % 2 == 0:  # R = R @ Rz: col0' = c col0 + s col1, col1' = ...
                c0 = [c_ * R[r][0] + s_ * R[r][1] for r in range(3)]
                c1 = [-s_ * R[r][0] + c_ * R[r][1] for r in range(3)]
                R = [[c0[r], c1[r], R[r][2]] for r in range(3)]
            else:  # R = R @ Ry: col0' = c col0 - s col2, col2' = s col0 + c col2
                c0 = [c_ * R[r][0] - s_ * R[r][2] for r in range(3)]
                c2 = [s_ * R[r][0] + c_ * R[r][2] for r in range(3)]
                R = [[c0[r], R[r][1], c2[r]] for r in range(3)]
            p = [p[r] + L * R[r][0] for r in range(3)]
        J = []
        for a in range(n):
            d = [p[r] - qs[a][r] for r in range(3)]
            w = ws[a]
            J.append(
                [
                    w[1] * d[2] - w[2] * d[1],
                    w[2] * d[0] - w[0] * d[2],
                    w[0] * d[1] - w[1] * d[0],
                ]
            )
        return p, J

    def linearize(th, tgt):
        tx, ty, tz = tgt
        p, J = fk(th)
        ry = p[1] - ty
        rz = p[2] - tz
        rx = p[0] - tx
        f_pre = 0.5 * (ry * ry + rz * rz)
        jy = [J[a][1] for a in range(n)]
        jz = [J[a][2] for a in range(n)]
        jx = [J[a][0] for a in range(n)]
        G = [
            [jy[i] * jy[j] + jz[i] * jz[j] for j in range(i + 1)]
            for i in range(n)
        ]
        c = [jy[i] * ry + jz[i] * rz for i in range(n)]
        return f_pre, [rx], [jx], G, c

    def errors(th, tgt):
        tx, ty, tz = tgt
        p, _ = fk(th)
        return 0.5 * ((p[1] - ty) ** 2 + (p[2] - tz) ** 2), jnp.abs(p[0] - tx)

    return FusedFamily(
        n=n,
        data_rows=3,
        m_eq=1,
        linearize=linearize,
        errors=errors,
        lower=(None,) + (0.0,) * (n - 1),
        upper=(None,) + (_PI,) * (n - 1),
        retract=lambda th: [_mod_pi(t) for t in th],
    )


def _make_kernel(
    family: FusedFamily,
    max_iterations,
    qp_iterations,
    ls_iterations,
    line_search="armijo",
    barrier="complementarity",
    debug_history=False,
):
    assert line_search in ("armijo", "polynomial")
    assert barrier in ("complementarity", "mpc")
    # The final write-out reads iteration-loop state (f_pre, accepted, the
    # best-merit tracker), so a zero-trip kernel cannot be generated.
    assert max_iterations >= 1, "fused kernels need max_iterations >= 1"
    n = family.n
    m = family.m_eq
    # Bounded sides as static (slack-index, var-index, bound) lists.
    lo_list = [(i, lo) for i, lo in enumerate(family.lower) if lo is not None]
    hi_list = [(i, hi) for i, hi in enumerate(family.upper) if hi is not None]
    n_lo, n_hi = len(lo_list), len(hi_list)
    ncon = n_lo + n_hi  # inequality rows

    def _interleave(lo_terms, hi_terms):
        """Alternate lo/hi contributions per slack index (matches the fp
        summation order of the original two-sided kernel)."""
        out = []
        for j in range(max(len(lo_terms), len(hi_terms))):
            if j < len(lo_terms):
                out.append(lo_terms[j])
            if j < len(hi_terms):
                out.append(hi_terms[j])
        return out

    def qp_solve(G, c, Jeq, beq, ib_lo, ib_hi, one, zero):
        """Interior point on the condensed (n+m)x(n+m) system
        (qp.cc:228-316 structure). Bound rows act per side: for a slack j on
        variable i, dx_i + ib_lo[j] >= 0 (lower) and -dx_i + ib_hi[j] >= 0
        (upper), where ib_* is the distance from x_i to the bound. Returns
        (dx list, dy list of |y_k|-ready duals, bad register: 1.0 where any
        factorization in this solve had a zero/non-finite pivot)."""
        D = n + m

        def assemble(sig_lo, sig_hi):
            H = [[zero] * D for _ in range(D)]
            for i in range(n):
                for j in range(i + 1):
                    H[i][j] = G[i][j]
            for j, (i, _) in enumerate(lo_list):
                H[i][i] = H[i][i] + sig_lo[j]
            for j, (i, _) in enumerate(hi_list):
                H[i][i] = H[i][i] + sig_hi[j]
            for k in range(m):
                for j in range(n):
                    H[n + k][j] = Jeq[k][j]
            return H

        # Equality-constrained initial guess, then clamp + slack init
        # (InitialGuessMethod::SOLVE_EQUALITY_CONSTRAINED, qp.cc:439-482).
        H0 = assemble([zero] * n_lo, [zero] * n_hi)
        rhs0 = [-c[i] for i in range(n)] + [-beq[k] for k in range(m)]
        L0, d0 = _ldlt_factor_unrolled(H0)
        bad = _ldlt_bad(d0, zero)
        sol = _ldlt_apply(L0, d0, rhs0)
        x = sol[:n]
        y = [-sol[n + k] for k in range(m)]
        if ncon == 0:
            return x, y, bad
        for j, (i, _) in enumerate(lo_list):
            x[i] = jnp.maximum(x[i], -ib_lo[j])
        for j, (i, _) in enumerate(hi_list):
            x[i] = jnp.minimum(x[i], ib_hi[j])
        s_lo = [
            jnp.maximum(1e-9, x[i] + ib_lo[j]) for j, (i, _) in enumerate(lo_list)
        ]
        s_hi = [
            jnp.maximum(1e-9, -x[i] + ib_hi[j]) for j, (i, _) in enumerate(hi_list)
        ]
        z_lo = [1.0 / v for v in s_lo]
        z_hi = [1.0 / v for v in s_hi]

        mu = one
        tau = 0.995
        for _ in range(qp_iterations):
            # KKT residuals (eqs 19.2a-d, qp.cc:391-420).
            r_d = []
            for i in range(n):
                acc = c[i]
                for k in range(m):
                    acc = acc - Jeq[k][i] * y[k]
                for j in range(n):
                    acc = acc + (G[i][j] if i >= j else G[j][i]) * x[j]
                r_d.append(acc)
            for j, (i, _) in enumerate(lo_list):
                r_d[i] = r_d[i] - z_lo[j]
            for j, (i, _) in enumerate(hi_list):
                r_d[i] = r_d[i] + z_hi[j]
            r_pe = []
            for k in range(m):
                acc = beq[k]
                for j in range(n):
                    acc = acc + Jeq[k][j] * x[j]
                r_pe.append(acc)
            r_pi_lo = [
                x[i] + ib_lo[j] - s_lo[j] for j, (i, _) in enumerate(lo_list)
            ]
            r_pi_hi = [
                -x[i] + ib_hi[j] - s_hi[j] for j, (i, _) in enumerate(hi_list)
            ]
            r_c_lo = [s_lo[j] * z_lo[j] for j in range(n_lo)]
            r_c_hi = [s_hi[j] * z_hi[j] for j in range(n_hi)]

            sig_lo = [z_lo[j] / s_lo[j] for j in range(n_lo)]
            sig_hi = [z_hi[j] / s_hi[j] for j in range(n_hi)]
            H = assemble(sig_lo, sig_hi)
            Lf, df = _ldlt_factor_unrolled(H)
            bad = jnp.maximum(bad, _ldlt_bad(df, zero))

            def solve_step(mu_v, corr_lo, corr_hi):
                """Variable elimination + condensed solve + back-substitution
                for a given barrier value and Mehrotra corrector terms."""
                r_aug = list(r_d)
                for j, (i, _) in enumerate(lo_list):
                    r_aug[i] = (
                        r_aug[i]
                        + sig_lo[j] * r_pi_lo[j]
                        + (r_c_lo[j] + corr_lo[j] - mu_v) / s_lo[j]
                    )
                for j, (i, _) in enumerate(hi_list):
                    r_aug[i] = (
                        r_aug[i]
                        - sig_hi[j] * r_pi_hi[j]
                        - (r_c_hi[j] + corr_hi[j] - mu_v) / s_hi[j]
                    )
                rhs = [-v for v in r_aug] + [-v for v in r_pe]
                sol = _ldlt_apply(Lf, df, rhs)
                dx_v = sol[:n]
                dy_v = [-sol[n + k] for k in range(m)]
                ds_lo_v = [
                    dx_v[i] + r_pi_lo[j] for j, (i, _) in enumerate(lo_list)
                ]
                ds_hi_v = [
                    -dx_v[i] + r_pi_hi[j] for j, (i, _) in enumerate(hi_list)
                ]
                dz_lo_v = [
                    -sig_lo[j] * ds_lo_v[j]
                    - (r_c_lo[j] + corr_lo[j] - mu_v) / s_lo[j]
                    for j in range(n_lo)
                ]
                dz_hi_v = [
                    -sig_hi[j] * ds_hi_v[j]
                    - (r_c_hi[j] + corr_hi[j] - mu_v) / s_hi[j]
                    for j in range(n_hi)
                ]
                return dx_v, dy_v, ds_lo_v, ds_hi_v, dz_lo_v, dz_hi_v

            def ftb(vs, dvs, tau_v):
                alpha = one
                for v, dv in zip(vs, dvs):
                    blocking = (v + dv <= 0.0) & (jnp.abs(dv) > 0.0)
                    cand = -tau_v * v / jnp.where(blocking, dv, one)
                    alpha = jnp.minimum(alpha, jnp.where(blocking, cand, one))
                return alpha

            zeros_lo = [zero] * n_lo
            zeros_hi = [zero] * n_hi
            if barrier == "mpc":
                # Mehrotra predictor-corrector, algorithm 16.4 / eq 19.22
                # (same math as qp.cc:170-188): affine probe with mu = 0,
                # sigma = (mu_aff / mu)^3, corrector diag(ds_aff) dz_aff.
                dxa, dya, dsl_a, dsh_a, dzl_a, dzh_a = solve_step(
                    zero, zeros_lo, zeros_hi
                )
                ap_a = ftb(s_lo + s_hi, dsl_a + dsh_a, 1.0)
                ad_a = ftb(z_lo + z_hi, dzl_a + dzh_a, 1.0)
                mu_aff = zero
                for t in _interleave(
                    [
                        (s_lo[j] + ap_a * dsl_a[j]) * (z_lo[j] + ad_a * dzl_a[j])
                        for j in range(n_lo)
                    ],
                    [
                        (s_hi[j] + ap_a * dsh_a[j]) * (z_hi[j] + ad_a * dzh_a[j])
                        for j in range(n_hi)
                    ],
                ):
                    mu_aff = mu_aff + t
                mu_aff = jnp.maximum(mu_aff / ncon, 0.0)
                sigma = (mu_aff / mu) ** 3
                mu_used = sigma * mu
                corr_lo = [dsl_a[j] * dzl_a[j] for j in range(n_lo)]
                corr_hi = [dsh_a[j] * dzh_a[j] for j in range(n_hi)]
                dx, dy, ds_lo, ds_hi, dz_lo, dz_hi = solve_step(
                    mu_used, corr_lo, corr_hi
                )
            else:
                dx, dy, ds_lo, ds_hi, dz_lo, dz_hi = solve_step(
                    mu, zeros_lo, zeros_hi
                )

            ap = ftb(s_lo + s_hi, ds_lo + ds_hi, tau)
            ad = ftb(z_lo + z_hi, dz_lo + dz_hi, tau)
            x = [x[i] + ap * dx[i] for i in range(n)]
            s_lo = [s_lo[j] + ap * ds_lo[j] for j in range(n_lo)]
            s_hi = [s_hi[j] + ap * ds_hi[j] for j in range(n_hi)]
            y = [y[k] + ad * dy[k] for k in range(m)]
            z_lo = [z_lo[j] + ad * dz_lo[j] for j in range(n_lo)]
            z_hi = [z_hi[j] + ad * dz_hi[j] for j in range(n_hi)]
            comp = zero
            for t in _interleave(
                [s_lo[j] * z_lo[j] for j in range(n_lo)],
                [s_hi[j] * z_hi[j] for j in range(n_hi)],
            ):
                comp = comp + t
            mu = 0.1 * (comp / ncon)
        return x, y, bad

    def kernel(tgt_ref, x0_ref, out_ref, stat_ref, *hist_refs):
        # Blocks are (vars, 1, 8, 128): each per-variable tile fills all
        # 8 sublanes x 128 lanes of a VPU register (a (1, BB) row layout
        # would waste 7/8 of each vector op). ONE layout for both the
        # compiled TPU path and the CPU interpret path, so tests exercise
        # exactly the production code.
        tgt = [tgt_ref[i, 0] for i in range(family.data_rows)]
        th = [x0_ref[i, 0] for i in range(n)]
        one = jnp.ones_like(th[0])
        zero = jnp.zeros_like(th[0])

        lam = 0.001 * one
        penalty = 0.01 * one
        restore = zero
        # Best-merit iterate ever visited (under the CURRENT penalty). A
        # fixed-trip kernel has no tolerance exit, so it keeps iterating at
        # already-converged points where the f32 inner QP can emit garbage
        # directions (collapsed mu, sigma=(mu_aff/mu)^3 unclamped per
        # qp.cc:182); any accepted bad step would otherwise overwrite a
        # converged state on its way out. NaN-poisoned lanes also stay on
        # their last good iterate (NaN comparisons are False).
        th_best = list(th)
        f_best = None
        eq_best = None
        # Failure-taxonomy flags (structs.hpp:233-248 analogs). fac_bad is
        # STICKY: the general path terminates QP_INDEFINITE at the FIRST
        # singular inner-QP factorization (nonlinear.cc:103-105 semantics),
        # so any occurrence is recorded. lam_maxed carries the LAST
        # iteration's lambda-machine state (failed line search with damping
        # past the general solver's max_lambda).
        fac_bad = zero
        lam_maxed = zero

        for it in range(max_iterations):
            f_pre, r_eq, Jeq, G0, c = family.linearize(th, tgt)
            assert len(r_eq) == m and len(Jeq) == m
            eq_pre = zero
            for k in range(m):
                eq_pre = eq_pre + jnp.abs(r_eq[k])
            if f_best is None:
                f_best, eq_best = f_pre, eq_pre
            else:
                better = (
                    f_pre + penalty * eq_pre < f_best + penalty * eq_best
                )
                th_best = [
                    jnp.where(better, th[i], th_best[i]) for i in range(n)
                ]
                f_best = jnp.where(better, f_pre, f_best)
                eq_best = jnp.where(better, eq_pre, eq_best)
            if debug_history:
                # errors_initial per outer iteration (the NLSIteration
                # analog), for state-level parity against nls_solve.
                # Channels 2+ carry solver internals (penalty, lambda, dd,
                # accepted, alpha, dx) for kernel forensics -- see
                # _DEBUG_CHANNELS.
                hist_refs[0][it, 0, 0] = f_pre
                hist_refs[0][it, 1, 0] = eq_pre
            G = [
                [G0[i][j] + (lam if i == j else zero) for j in range(i + 1)]
                for i in range(n)
            ]
            ib_lo = [th[i] - lo for (i, lo) in lo_list]
            ib_hi = [hi - th[i] for (i, hi) in hi_list]

            dx, y, bad_it = qp_solve(G, c, Jeq, r_eq, ib_lo, ib_hi, one, zero)
            fac_bad = jnp.maximum(fac_bad, bad_it)

            d_f = sum(c[i] * dx[i] for i in range(n))
            if m > 0:
                y_abs = jnp.abs(y[0])
                for k in range(1, m):
                    y_abs = jnp.maximum(y_abs, jnp.abs(y[k]))
                penalty = jnp.where(y_abs > penalty, y_abs * 1.01, penalty)
                d_eq = zero
                for k in range(m):
                    d_eq = d_eq + jnp.sign(r_eq[k]) * sum(
                        Jeq[k][i] * dx[i] for i in range(n)
                    )
            else:
                d_eq = zero
            dd = d_f + penalty * d_eq
            merit_pre = f_pre + penalty * eq_pre

            alpha = one
            accepted = zero
            dead = zero  # lanes whose polynomial fit went invalid
            best = list(th)
            f_acc = f_pre
            eq_acc = eq_pre
            alpha_prev = one
            phi_prev = merit_pre
            alpha_prev2 = 2.0 * one
            phi_prev2 = merit_pre
            for probe in range(ls_iterations + 1):
                if probe > 0:
                    if line_search == "armijo":
                        alpha = alpha * 0.5
                    else:
                        # quadratic fit (probe 1), cubic after (the
                        # nonlinear.cc:418-443 schedule), with the reference's
                        # validity gating; an invalid fit kills the lane's
                        # remaining probes (FAILURE_INVALID_ALPHA analog).
                        if probe == 1:
                            num = phi_prev - dd * alpha_prev - merit_pre
                            num_s = jnp.where(num == 0.0, one, num)
                            a_new = -dd * alpha_prev * alpha_prev / (2.0 * num_s)
                            valid = (dd <= 0.0) & (num > 0.0)
                        else:
                            a0, a1 = alpha_prev2, alpha_prev
                            r0 = phi_prev2 - merit_pre - dd * a0
                            r1 = phi_prev - merit_pre - dd * a1
                            det = a0 * a0 * a1 * a1 * (a0 - a1)
                            det_s = jnp.where(det == 0.0, one, det)
                            ca = (a1 * a1 * r0 - a0 * a0 * r1) / det_s
                            cb = (-a1 * a1 * a1 * r0 + a0 * a0 * a0 * r1) / det_s
                            arg = cb * cb - 3.0 * ca * dd
                            ca_s = jnp.where(ca == 0.0, one, ca)
                            a_new = (
                                -cb + jnp.sqrt(jnp.maximum(arg, 1e-30))
                            ) / (3.0 * ca_s)
                            valid = (ca != 0.0) & (arg >= -1e-12) & (det != 0.0)
                        valid = valid & (a_new > 0.0) & (a_new < alpha)
                        dead = jnp.maximum(
                            dead, (1.0 - valid.astype(one.dtype)) * (1.0 - accepted)
                        )
                        alpha = jnp.where(valid, a_new, alpha * 0.5)
                cand = [th[i] + alpha * dx[i] for i in range(n)]
                if family.retract is not None:
                    cand = family.retract(cand)
                f_c, eq_c = family.errors(cand, tgt)
                merit_c = f_c + penalty * eq_c
                # Armijo with the slack term clamped to <= 0: a POSITIVE
                # directional derivative (degenerate post-convergence QP
                # direction, or the small positive dd of a bound-active
                # optimum) must demand a plain decrease, never RELAX the
                # acceptance threshold -- an unclamped dd > 0 let garbage
                # steps through on converged lanes (the reference rejects
                # such steps outright, nonlinear.cc FAILURE_POSITIVE_*).
                ok = (
                    merit_c <= merit_pre + 1e-4 * alpha * jnp.minimum(dd, zero)
                ).astype(one.dtype)
                take = ok * (1.0 - accepted) * (1.0 - dead)
                best = [take * cand[i] + (1.0 - take) * best[i] for i in range(n)]
                f_acc = take * f_c + (1.0 - take) * f_acc
                eq_acc = take * eq_c + (1.0 - take) * eq_acc
                accepted = jnp.minimum(accepted + take, 1.0)
                alpha_prev2, phi_prev2 = alpha_prev, phi_prev
                alpha_prev, phi_prev = alpha, merit_c

            th = [jnp.where(accepted > 0, best[i], th[i]) for i in range(n)]
            if debug_history:
                hist_refs[0][it, 2, 0] = penalty
                hist_refs[0][it, 3, 0] = lam
                hist_refs[0][it, 4, 0] = dd
                hist_refs[0][it, 5, 0] = accepted
                hist_refs[0][it, 6, 0] = alpha
                for i in range(n):
                    hist_refs[0][it, 7 + i, 0] = dx[i]
            lam_succ = jnp.maximum(lam * jnp.where(restore > 0, 0.8, 0.1), 1e-9)
            lam_fail = jnp.where(
                restore > 0, lam * 10.0, jnp.maximum(0.001 * one, lam * 10.0)
            )
            lam = jnp.where(accepted > 0, lam_succ, lam_fail)
            restore = jnp.where(accepted > 0, zero, one)
            # MAX_LAMBDA analog: this iteration failed line search with the
            # damping already past the general solver's max_lambda default.
            lam_maxed = jnp.where(
                (accepted == 0) & (lam > 1.0), one, zero
            )

        # Final best update covers the last iteration's accepted step (its
        # (f, eq) was tracked through the probes -- no extra evaluation).
        f_fin = jnp.where(accepted > 0, f_acc, f_pre)
        eq_fin = jnp.where(accepted > 0, eq_acc, eq_pre)
        better = f_fin + penalty * eq_fin < f_best + penalty * eq_best
        for i in range(n):
            out_ref[i, 0] = jnp.where(better, th[i], th_best[i])
        # Per-lane terminal state (structs.hpp:233-248 contract for the
        # serving tier): the (f, |eq|_1) of the RETURNED iterate, already in
        # registers -- the host derives an int32 status at the family's gate
        # (fused_termination_status) without a second evaluation pass.
        stat_ref[0, 0] = jnp.where(better, f_fin, f_best)
        stat_ref[1, 0] = jnp.where(better, eq_fin, eq_best)
        # Channel 2: bit-packed failure flags of the terminal iteration
        # (1 = factorization singular, 2 = lambda machine maxed out while
        # failing) -- lets fused_termination_status distinguish numerical
        # failure from plain budget exhaustion (full structs.hpp:233-248
        # taxonomy for the serving tier).
        stat_ref[2, 0] = fac_bad + 2.0 * lam_maxed

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "family",
        "max_iterations",
        "qp_iterations",
        "ls_iterations",
        "line_search",
        "barrier",
        "debug_history",
        "return_state",
    ),
)
def fused_solve_batch(
    family: FusedFamily,
    data: jax.Array,  # (B, family.data_rows)
    x0: jax.Array,  # (B, family.n)
    max_iterations: int = 10,
    qp_iterations: int = 6,
    ls_iterations: int = 2,
    line_search: str = "armijo",  # or "polynomial"
    barrier: str = "mpc",  # or "complementarity"
    # True additionally returns the per-outer-iteration history, shape
    # (B, max_iterations, 7 + n): channels [f, eq, penalty, lam, dd,
    # accepted, alpha, dx_0..dx_{n-1}]. Channels 0-1 are the
    # errors_initial trajectory (state-level parity checks against
    # nls_solve's recorded history); 2+ are solver internals for kernel
    # forensics.
    debug_history: bool = False,
    # True additionally returns per-lane terminal state (B, 2): columns
    # (f, |eq|_1) at the returned iterate, already computed in kernel
    # registers. Feed to fused_termination_status for an int32 status
    # (the serving-tier analog of the structs.hpp:233-248 contract).
    return_state: bool = False,
):
    """Solve B instances of a DSL-defined family with one fused kernel.

    ``family`` must be a stable (module-level / cached) ``FusedFamily``
    instance -- it is a static jit argument hashed by identity. Returns
    (B, n); with ``return_state`` ((B, n), (B, 2)); ``debug_history``
    appends (B, max_iterations, 7 + n) (channel layout above).
    """
    return _fused_solve(
        family, data, x0, max_iterations, qp_iterations, ls_iterations,
        line_search, barrier, debug_history, return_state,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "link_len",
        "max_iterations",
        "qp_iterations",
        "ls_iterations",
        "line_search",
        "barrier",
        "debug_history",
        "return_state",
    ),
)
def fused_ik_solve_batch(
    targets: jax.Array,  # (B, 2)
    x0: jax.Array,  # (B, n)
    link_len: float = 0.4,
    max_iterations: int = 10,
    qp_iterations: int = 6,
    ls_iterations: int = 2,
    line_search: str = "armijo",  # or "polynomial"
    # Mehrotra predictor-corrector by default: at the same iteration budget it
    # converges EVERY instance of the test distribution (the plain
    # complementarity schedule leaves ~1.5% of borderline instances in a
    # wrong basin under f32 -- fp-context-sensitive, see
    # tests/test_pallas_ik.py).
    barrier: str = "mpc",  # or "complementarity"
    debug_history: bool = False,
    return_state: bool = False,
):
    """Solve B planar n-link IK instances with the fused kernel.
    Returns (B, n); optional extras as in fused_solve_batch."""
    family = planar_family(x0.shape[1], link_len)
    return _fused_solve(
        family, targets, x0, max_iterations, qp_iterations, ls_iterations,
        line_search, barrier, debug_history, return_state,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "link_len",
        "max_iterations",
        "qp_iterations",
        "ls_iterations",
        "line_search",
        "barrier",
        "debug_history",
        "return_state",
    ),
)
def fused_spatial_ik_solve_batch(
    targets: jax.Array,  # (B, 3)
    x0: jax.Array,  # (B, n)
    link_len: float = 0.4,
    max_iterations: int = 10,
    qp_iterations: int = 6,
    ls_iterations: int = 2,
    line_search: str = "armijo",
    barrier: str = "mpc",
    debug_history: bool = False,
    return_state: bool = False,
):
    """Solve B spatial (alternating z/y axis) n-link IK instances with the
    fused kernel -- the non-planar family. Returns (B, n) (+extras)."""
    family = spatial_family(x0.shape[1], link_len)
    return _fused_solve(
        family, targets, x0, max_iterations, qp_iterations, ls_iterations,
        line_search, barrier, debug_history, return_state,
    )


def _fused_solve(
    family, targets, x0, max_iterations, qp_iterations, ls_iterations,
    line_search, barrier, debug_history, return_state=False,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # Medium-N dispatch: past the register class's KKT cap the unrolled
    # LDL^T program size is the wall -- route to the generic blocked tier
    # (ops/pallas_blocked.py), same FusedFamily contract and solver
    # semantics, O(D)-statement blocked factorization.
    from .pallas_blocked import REGISTER_KKT_MAX, blocked_solve_batch

    if family.n + family.m_eq > REGISTER_KKT_MAX:
        if debug_history:
            raise ValueError(
                "debug_history is a register-tier feature; the blocked "
                f"tier (n + m_eq = {family.n + family.m_eq} > "
                f"{REGISTER_KKT_MAX}) does not record per-iteration rows"
            )
        return blocked_solve_batch(
            family, targets, x0,
            max_iterations=max_iterations,
            qp_iterations=qp_iterations,
            ls_iterations=ls_iterations,
            line_search=line_search,
            barrier=barrier,
            return_state=return_state,
        )

    B = targets.shape[0]
    n = x0.shape[1]
    assert n == family.n
    t_rows = family.data_rows
    assert targets.shape[1] == t_rows
    kernel = _make_kernel(
        family, max_iterations, qp_iterations, ls_iterations,
        line_search, barrier, debug_history,
    )

    tile = 8 * 128  # one full (sublanes x lanes) VPU register per variable
    b_pad = -(-B // tile) * tile
    grid = b_pad // tile

    def pack(arr, fill):
        p = jnp.pad(arr, [(0, b_pad - B), (0, 0)], constant_values=fill)
        # (b_pad, vars) -> (vars, grid, 8, 128)
        return jnp.moveaxis(p, 0, -1).reshape(arr.shape[1], grid, 8, 128)

    out_specs = [
        pl.BlockSpec((n, 1, 8, 128), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
        # per-lane terminal (f, |eq|_1, flags) registers -- always emitted
        # (three vector stores per tile; free next to the solve itself)
        pl.BlockSpec((3, 1, 8, 128), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((n, grid, 8, 128), targets.dtype),
        jax.ShapeDtypeStruct((3, grid, 8, 128), targets.dtype),
    ]
    n_dbg = 7 + n  # _DEBUG_CHANNELS: f, eq, penalty, lam, dd, accepted, alpha, dx_i
    if debug_history:
        out_specs.append(
            pl.BlockSpec(
                (max_iterations, n_dbg, 1, 8, 128),
                lambda i: (0, 0, i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        out_shapes.append(
            jax.ShapeDtypeStruct(
                (max_iterations, n_dbg, grid, 8, 128), targets.dtype
            )
        )

    # Padding lanes start mid-range of the built-in IK families (reachable
    # target, interior x0) so they converge benignly alongside real lanes.
    res = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (t_rows, 1, 8, 128), lambda i: (0, i, 0, 0),
                memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n, 1, 8, 128), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=_interpret(),
    )(pack(targets, 0.5), pack(x0, 0.3))
    if debug_history:
        out, stat, hist = res
    else:
        out, stat = res
    x = jnp.moveaxis(out.reshape(n, b_pad), -1, 0)[:B]
    outs = [x]
    if return_state:
        # (3, grid, 8, 128) -> (B, 3): columns are (f, |eq|_1, flags) at the
        # returned iterate (flags: 1 = singular factorization, 2 = lambda
        # maxed, bit-packed; see fused_termination_status).
        outs.append(jnp.moveaxis(stat.reshape(3, b_pad), -1, 0)[:B])
    if debug_history:
        # (iters, n_dbg, grid, 8, 128) -> (B, iters, n_dbg)
        h = jnp.moveaxis(hist.reshape(max_iterations, n_dbg, b_pad), -1, 0)[:B]
        outs.append(h)
    return tuple(outs) if len(outs) > 1 else x


def fused_termination_status(
    state: jax.Array,  # (B, 3): (f, |eq|_1, flags) from return_state=True
    f_tol: float = 1.0e-6,
    eq_tol: float = 1.0e-5,
) -> jax.Array:
    """Derive an int32 per-lane NLSTerminationState from the fused kernel's
    emitted terminal (f, |eq|_1, flags) registers -- the serving-tier analog
    of the reference's typed-outcome contract (structs.hpp:233-248).

    Lattice (first match wins):
      * SATISFIED_ABSOLUTE_TOL -- cost and equality both under the family's
        gate (flags are irrelevant on a converged lane: a transient singular
        factorization the lambda machine recovered from is not terminal in
        the general path either).
      * QP_INDEFINITE -- some inner-QP factorization was singular/non-finite
        (flag bit 1, sticky: the general path terminates at the FIRST such
        failure, nonlinear.cc:103-105 / qp.cc:303-307 FailedFactorization).
      * MAX_LAMBDA -- non-finite terminal state (the lane never produced a
        valid merit), or the terminal iteration failed line search with the
        damping past the general solver's max_lambda (flag bit 2): the
        in-kernel analog of the LM restore machine giving up
        (nonlinear.cc:296-343).
      * MAX_ITERATIONS -- finite, healthy, simply out of fixed-trip budget.

    A legacy (B, 2) state (no flags channel) degrades to the old 3-state
    taxonomy."""
    from ..structs import NLSTerminationState

    f, eq = state[..., 0], state[..., 1]
    if state.shape[-1] >= 3:
        flags = state[..., 2]
        fac_bad = jnp.floor(flags) % 2.0 >= 1.0
        lam_maxed = flags >= 2.0
    else:
        fac_bad = jnp.zeros(f.shape, bool)
        lam_maxed = jnp.zeros(f.shape, bool)
    finite = jnp.isfinite(f) & jnp.isfinite(eq)
    converged = finite & (f <= f_tol) & (eq <= eq_tol)
    return jnp.where(
        converged,
        jnp.int32(NLSTerminationState.SATISFIED_ABSOLUTE_TOL),
        jnp.where(
            fac_bad,
            jnp.int32(NLSTerminationState.QP_INDEFINITE),
            jnp.where(
                ~finite | lam_maxed,
                jnp.int32(NLSTerminationState.MAX_LAMBDA),
                jnp.int32(NLSTerminationState.MAX_ITERATIONS),
            ),
        ),
    )


def fused_solve_refined(
    family: FusedFamily,
    data: jax.Array,  # (B, data_rows)
    x0: jax.Array,  # (B, n)
    refine_fn,  # (data_k (K, rows) f64, x0_k (K, n) f64) -> (K, n) f64
    refine_k: int = 64,
    eq_penalty: float = 1.0,
    **kernel_kwargs,
):
    """f32 fused kernel + f64 refinement of the worst-merit lanes.

    The fused families' residual tail (ROADMAP: 35/24576 spatial instances
    single-start, 6 with multi-start) is f32-basin-limited: the same descent
    in f64 converges. This wrapper keeps the kernel's throughput for the
    bulk and re-solves only the ``refine_k`` worst lanes (by the family's
    own merit f + eq_penalty*|eq|) through a caller-supplied f64 solver --
    typically the general ``nls_solve`` on the family's general-path twin,
    vmapped (static top-k shape: jit-friendly). A refined lane replaces the
    kernel's answer only when its f64 merit is strictly better.

    Requires x64 enabled; otherwise the refinement silently runs in f32 and
    can only match the kernel. Returns (B, n) in x0's dtype."""
    n = family.n
    for reserved in ("return_state", "debug_history"):
        if reserved in kernel_kwargs:
            raise ValueError(
                f"fused_solve_refined owns {reserved!r} (it reads the "
                "kernel's per-lane state to pick refinement lanes and "
                "returns only the (B, n) solutions); call fused_solve_batch "
                "directly for raw state/history access"
            )
    # The kernel emits per-lane terminal (f, |eq|_1) for free -- the
    # worst-lane selection needs no re-evaluation pass.
    x, state = fused_solve_batch(
        family, data, x0, return_state=True, **kernel_kwargs
    )

    def merit_of(xs, ds):
        f, eq = family.errors(
            [xs[:, i] for i in range(n)],
            [ds[:, i] for i in range(family.data_rows)],
        )
        return f + eq_penalty * eq

    merit = state[:, 0] + eq_penalty * state[:, 1]
    _, worst = jax.lax.top_k(merit, refine_k)
    d64 = data[worst].astype(jnp.float64)
    xr = refine_fn(d64, x0[worst].astype(jnp.float64))
    # Compare merits in f64 on both candidates (the kernel's f32 merit is
    # noisy at the crossover scale).
    m_kernel = merit_of(x[worst].astype(jnp.float64), d64)
    m_refined = merit_of(xr, d64)
    take = (m_refined < m_kernel)[:, None]
    replacement = jnp.where(take, xr, x[worst].astype(jnp.float64))
    return x.at[worst].set(replacement.astype(x.dtype))


def fused_solve_proximal(
    family: FusedFamily,
    data: jax.Array,  # (B, data_rows - n): the family's payload WITHOUT x_ref
    x0: jax.Array,  # (B, n)
    stages: int = 4,
    **kernel_kwargs,
):
    """Proximal-point continuation for REDUNDANT families.

    On chains with more DOF than task constraints, the Gauss-Newton
    landscape has constrained dead-ends that trap a few percent of warm
    starts in BOTH solver tiers (LM damping decays along the null
    direction, the step explodes where the linear model is flat, and the
    line search can only crawl). The textbook cure is the proximal-point
    method: add a damped-least-squares term ``sqrt(w) * (x - x_ref)``
    (``scalar_chain_ik_builder(..., prox_weight=w)``), solve, RE-CENTER
    ``x_ref`` at the result, repeat — each subproblem is well-posed, and
    the regularization bias shrinks geometrically with the stage count
    (measured on a 4-DOF/3-task chain, w=0.05: max effector error
    1.6e-2 -> 4.9e-3 -> 1.6e-3 -> 5e-4 over 4 stages, 100% convergence
    where the unregularized kernel leaves 7% at dead-ends;
    tests/test_fused_auto.py).

    ``family`` must carry ``x_ref`` as its LAST ``n`` data rows (the
    ``prox_weight`` builders do). All stages run the same compiled kernel.
    Returns (B, n)."""
    if kernel_kwargs.get("debug_history"):
        raise ValueError(
            "fused_solve_proximal chains stage outputs into stage inputs; "
            "debug_history's (x, history) tuple cannot be chained -- call "
            "fused_solve_batch per stage yourself to collect histories"
        )
    x = x0
    for _ in range(stages):
        d = jnp.concatenate([data, x], axis=1)
        x = fused_solve_batch(family, d, x, **kernel_kwargs)
    return x


def fused_solve_multi_start(
    family: FusedFamily,
    data: jax.Array,  # (B, data_rows)
    x0s: jax.Array,  # (B, S, n): S starts per instance
    eq_penalty: float = 1.0,
    **kernel_kwargs,
):
    """Multi-start robustification of the fused path: solve all B*S starts
    in one kernel batch (extra starts are nearly free on TPU) and keep, per
    instance, the start with the lowest merit f + eq_penalty * |eq| -- the
    standard cure for the chaotic-tail instances a single cold start loses
    (same pattern as models/ik.py::solve_ik_multi_start for the general
    path). The merit is evaluated with the family's own ``errors`` callable,
    which is elementwise register code and therefore works directly on
    (B*S,) columns outside the kernel. Returns (B, n)."""
    B, S, n = x0s.shape
    assert n == family.n
    data_rep = jnp.repeat(data, S, axis=0)
    x = fused_solve_batch(
        family, data_rep, x0s.reshape(B * S, n), **kernel_kwargs
    )
    f, eq = family.errors(
        [x[:, i] for i in range(n)],
        [data_rep[:, i] for i in range(family.data_rows)],
    )
    merit = (f + eq_penalty * eq).reshape(B, S)
    best = jnp.argmin(merit, axis=1)
    return x.reshape(B, S, n)[jnp.arange(B), best]
