"""Family-generic BLOCKED fused solver for medium-N problems (N ~ 32-128).

The register-class fused kernels (ops/pallas_ik.py) hold every scalar of the
per-instance state in its own (8, 128) lane register and factor the condensed
KKT system with a fully unrolled LDL^T -- O(D^3) straight-line register ops
for a D = n + m_eq system.  That caps the register tier at D ~ 32: beyond it
the PROGRAM SIZE (not the FLOPs) is the wall, which round 4 worked around
with two handwritten structure-specific kernels (ops/pallas_mpc.py's Riccati,
ops/pallas_pose_ring.py's bordered block-Thomas).  This module is the GENERIC
third tier those kernels previewed (round-4 VERDICT item 1): the same
:class:`FusedFamily` whole-solver semantics, but with the per-instance KKT
system held as a STACKED VMEM tensor and factored by a blocked batched LDL^T
whose program size is O(D) statements:

* registers are (1, LANES) tiles (LANES instances per grid step) instead of
  (8, 128): a dense (D, D, LANES) system at D = 100 then costs ~5 MB of VMEM
  instead of the 40 MB the (8, 128) layout would need;
* the family's ``linearize``/``errors`` callables run unchanged on the
  (1, LANES) registers (they are elementwise register code by contract), and
  their outputs are stacked ONCE per outer iteration into (n, n, LANES) /
  (m, n, LANES) tensors;
* all O(D^2) solver algebra (KKT residuals, mat-vecs) is tensorized -- one
  jnp op each instead of O(D^2) register statements;
* the LDL^T factorization streams columns through a (D, D, LANES) VMEM
  scratch ref with STATIC slices only (Mosaic has no scatter), exactly the
  column recurrence of ops/kkt.py::ldlt_factorize and ops/pallas_ldlt.py --
  which are its oracles in tests/test_pallas_blocked.py;
* the outer-SQP and inner-QP loops ride ``lax.fori_loop``, so compiled
  program size is independent of the iteration budget (the move proven by
  ops/pallas_mpc.py).

Solver semantics mirror ops/pallas_ik.py::_make_kernel exactly (which in
turn mirrors the reference: nonlinear.cc:75-343 outer loop, qp.cc:100-201
interior point, qp.cc:439-482 SOLVE_EQUALITY_CONSTRAINED warm start,
qp.cc:170-188 Mehrotra, nonlinear.cc:296-343 lambda machine): the blocked
tier is a different EXECUTION of the same algorithm, pinned against
``nls_solve`` and against the register kernel by tests.

Dispatch: ``fused_solve_batch`` / ``fused_nls_solve_batch`` route here
automatically when ``family.n + family.m_eq > REGISTER_KKT_MAX`` -- an
arbitrary medium-N family compiled by ops/fused_auto.py (a dim-48 IK chain,
a 20-pose graph, a slack-lifted obstacle problem) gets this fast path with
no handwritten kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .pallas_ik import FusedFamily, _interpret

# Largest D = n + m_eq the register-class unrolled LDL^T is allowed to
# compile; beyond it fused_solve_batch dispatches to this module.  The
# register class has been measured healthy through D ~ 26 (8-pose graphs);
# 32 leaves margin without letting the O(D^3) unroll grow past ~30k ops.
REGISTER_KKT_MAX = 32

_TAU_FTB = 0.995


def _cat(regs):
    """list of k (1, L) registers -> (k, L) stacked tensor."""
    return jnp.concatenate(regs, axis=0)


def _rows(st):
    """(k, L) stacked tensor -> list of k (1, L) registers (static slices)."""
    return [st[i : i + 1] for i in range(st.shape[0])]


def _coalesced_row(present_cols, reg_fn, n, zero):
    """One (n, L) stacked row with structural-zero RUNS coalesced into single
    broadcast segments: O(nnz_row) trace elements instead of O(n).  The
    register values are identical to the dense ``_cat`` form (skipped cells
    are exact zeros), so the downstream program is bit-identical -- pinned by
    tests/test_pallas_blocked.py::test_sparse_assembly_matches_dense."""
    parts = []
    run = 0
    for j in range(n):
        if j in present_cols:
            if run:
                parts.append(jnp.broadcast_to(zero, (run, zero.shape[-1])))
                run = 0
            parts.append(reg_fn(j))
        else:
            run += 1
    if run:
        parts.append(jnp.broadcast_to(zero, (run, zero.shape[-1])))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def _make_blocked_kernel(
    family: FusedFamily,
    max_iterations,
    qp_iterations,
    ls_iterations,
    line_search="armijo",
    barrier="mpc",
):
    assert line_search in ("armijo", "polynomial")
    assert barrier in ("complementarity", "mpc")
    assert max_iterations >= 1, "fused kernels need max_iterations >= 1"
    n = family.n
    m = family.m_eq
    D = n + m
    lo_list = [(i, lo) for i, lo in enumerate(family.lower) if lo is not None]
    hi_list = [(i, hi) for i, hi in enumerate(family.upper) if hi is not None]
    n_lo, n_hi = len(lo_list), len(hi_list)
    ncon = n_lo + n_hi
    lo_idx = [i for i, _ in lo_list]
    hi_idx = [i for i, _ in hi_list]
    # Static sparsity hints (family_from_problem fills them): per-row column
    # sets for the symmetric G stack and per-equality-row variable sets.
    # None = dense assembly (handwritten families without hints).
    g_cols = None
    if family.g_pattern is not None:
        g_cols = [set() for _ in range(n)]
        for a, b in family.g_pattern:
            g_cols[a].add(b)
            g_cols[b].add(a)
    eq_pats = family.eq_patterns

    def gather(v_st, idx):
        """(n, L) -> (len(idx), L) rows at the static index list."""
        return jnp.concatenate([v_st[i : i + 1] for i in idx], axis=0)

    def scatter(vals, idx, zero):
        """(k, L) rows at UNIQUE static indices -> (n, L), zeros elsewhere.
        (The bound lists are unique per side by construction: family.lower /
        family.upper carry at most one bound per variable per side.)"""
        pos = {i: j for j, i in enumerate(idx)}
        return jnp.concatenate(
            [
                vals[pos[i] : pos[i] + 1] if i in pos else zero
                for i in range(n)
            ],
            axis=0,
        )

    def matvec(A, x):
        """(k, n, L) @ (n, L) -> (k, L)."""
        return jnp.sum(A * x[None, :, :], axis=1)

    def matvec_t(A, y):
        """(m, n, L)^T @ (m, L) -> (n, L)."""
        return jnp.sum(A * y[:, None, :], axis=0)

    def make_kkt(l_scr, d_scr, x_scr):
        """Blocked LDL^T factor/solve through the VMEM scratch refs.

        ``factor`` consumes columns lazily via ``col_fn(j) -> (D, L)`` so the
        KKT matrix is never materialized as a separate value tensor (the
        column below the diagonal is assembled from G/Jeq/sigma on the fly);
        rows above the diagonal are never read (the recurrence masks them),
        matching the lower-triangle storage of ops/kkt.py::ldlt_factorize.
        """
        rows_iota = jax.lax.broadcasted_iota(jnp.int32, (D, 1), 0)

        def factor(col_fn, zero, one):
            for j in range(D):
                c = col_fn(j)
                if j > 0:
                    w = d_scr[:j, :] * l_scr[j, :j, :]
                    c = c - jnp.sum(l_scr[:, :j, :] * w[None], axis=1)
                dj = c[j : j + 1, :]
                col = jnp.where(
                    rows_iota > j, c / dj, jnp.where(rows_iota == j, 1.0, 0.0)
                )
                l_scr[:, j, :] = col
                d_scr[j : j + 1, :] = dj
            d = d_scr[:, :]
            tiny = jnp.finfo(d.dtype).tiny
            good = (jnp.abs(d) > tiny) & jnp.isfinite(d)
            allg = jnp.min(good.astype(d.dtype), axis=0, keepdims=True)
            return jnp.where(allg > 0, zero, one)

        def solve(rhs):
            """L diag(d) L^T x = rhs for one (D, L) rhs; returns a VALUE
            (read back out of the x scratch, so sequential solves reuse it)."""
            for j in range(D):
                acc = rhs[j : j + 1, :]
                if j > 0:
                    acc = acc - jnp.sum(
                        l_scr[j, :j, :] * x_scr[:j, :], axis=0, keepdims=True
                    )
                x_scr[j : j + 1, :] = acc
            x_scr[:, :] = x_scr[:, :] / d_scr[:, :]
            for j in range(D - 2, -1, -1):
                acc = x_scr[j : j + 1, :] - jnp.sum(
                    l_scr[j + 1 :, j, :] * x_scr[j + 1 :, :],
                    axis=0,
                    keepdims=True,
                )
                x_scr[j : j + 1, :] = acc
            return x_scr[:, :]

        return factor, solve

    def make_col_fn(G, Jeq, sig_d, zero_col):
        """Column-j generator of the condensed KKT lower triangle
        (qp.cc:228-316 structure): [[G + diag(sigma), .], [A_eq, 0]]."""

        def col_fn(j):
            if j >= n:
                # Equality block column: zero at and below the diagonal (the
                # (2,2) block of the quasi-definite KKT system is 0).
                return zero_col
            parts = []
            if j > 0:
                parts.append(jnp.zeros_like(zero_col[:j]))
            diag = G[j : j + 1, j, :]
            if sig_d is not None:
                diag = diag + sig_d[j : j + 1]
            parts.append(diag)
            if j + 1 < n:
                parts.append(G[j + 1 :, j, :])
            if m > 0:
                parts.append(Jeq[:, j, :])
            return jnp.concatenate(parts, axis=0)

        return col_fn

    def qp_solve(G, c, Jeq, beq, ib_lo, ib_hi, one, zero, factor, solve):
        """Interior point on the condensed (n+m)x(n+m) system, stacked form.
        Math and iteration order mirror ops/pallas_ik.py::qp_solve
        (SOLVE_EQUALITY_CONSTRAINED warm start qp.cc:439-482, Mehrotra
        qp.cc:170-188, fraction-to-boundary tau = 0.995 qp.cc:191-192).
        Empty sides (no lower / no upper bounds, no equalities) are
        represented as ``None`` and excluded from the loop carry -- Mosaic
        must never see a zero-sized array.  Returns
        (dx (n, L), dy (m, L) | None, bad (1, L))."""
        L = zero.shape[-1]
        zero_col = jnp.zeros_like(jnp.broadcast_to(zero, (D, L)))

        bad = factor(make_col_fn(G, Jeq, None, zero_col), zero, one)
        rhs0 = jnp.concatenate([-c, -beq], axis=0) if m else -c
        sol = solve(rhs0)
        x = sol[:n]
        y = -sol[n:] if m else None
        if ncon == 0:
            return x, y, bad

        # Clamp into the shifted bounds + slack/dual init (qp.cc:470-481).
        # Row-wise so no mask constant is captured (Pallas kernels cannot
        # close over array constants).
        lo_pos = {i: j for j, i in enumerate(lo_idx)}
        hi_pos = {i: j for j, i in enumerate(hi_idx)}
        rows_x = []
        for i in range(n):
            row = x[i : i + 1]
            if i in lo_pos:
                j = lo_pos[i]
                row = jnp.maximum(row, -ib_lo[j : j + 1])
            if i in hi_pos:
                j = hi_pos[i]
                row = jnp.minimum(row, ib_hi[j : j + 1])
            rows_x.append(row)
        x = jnp.concatenate(rows_x, axis=0)
        s_lo = jnp.maximum(1e-9, gather(x, lo_idx) + ib_lo) if n_lo else None
        s_hi = jnp.maximum(1e-9, -gather(x, hi_idx) + ib_hi) if n_hi else None
        z_lo = 1.0 / s_lo if n_lo else None
        z_hi = 1.0 / s_hi if n_hi else None

        def pack_carry(x, s_lo, z_lo, s_hi, z_hi, y, mu, bad):
            out = [x, mu, bad]
            if n_lo:
                out += [s_lo, z_lo]
            if n_hi:
                out += [s_hi, z_hi]
            if m:
                out.append(y)
            return tuple(out)

        def unpack_carry(carry):
            x, mu, bad = carry[0], carry[1], carry[2]
            k = 3
            s_lo = z_lo = s_hi = z_hi = y = None
            if n_lo:
                s_lo, z_lo = carry[k], carry[k + 1]
                k += 2
            if n_hi:
                s_hi, z_hi = carry[k], carry[k + 1]
                k += 2
            if m:
                y = carry[k]
            return x, s_lo, z_lo, s_hi, z_hi, y, mu, bad

        def qp_body(carry):
            x, s_lo, z_lo, s_hi, z_hi, y, mu, bad = unpack_carry(carry)
            # KKT residuals (eqs 19.2a-d, qp.cc:391-420), tensorized.
            r_d = c + matvec(G, x)
            if m:
                r_d = r_d - matvec_t(Jeq, y)
            if n_lo:
                r_d = r_d - scatter(z_lo, lo_idx, zero)
            if n_hi:
                r_d = r_d + scatter(z_hi, hi_idx, zero)
            r_pe = beq + matvec(Jeq, x) if m else None
            r_pi_lo = gather(x, lo_idx) + ib_lo - s_lo if n_lo else None
            r_pi_hi = -gather(x, hi_idx) + ib_hi - s_hi if n_hi else None
            r_c_lo = s_lo * z_lo if n_lo else None
            r_c_hi = s_hi * z_hi if n_hi else None
            sig_lo = z_lo / s_lo if n_lo else None
            sig_hi = z_hi / s_hi if n_hi else None
            sig_d = zero_col[:n]
            if n_lo:
                sig_d = sig_d + scatter(sig_lo, lo_idx, zero)
            if n_hi:
                sig_d = sig_d + scatter(sig_hi, hi_idx, zero)
            bad = jnp.maximum(
                bad, factor(make_col_fn(G, Jeq, sig_d, zero_col), zero, one)
            )

            def solve_step(mu_v, corr_lo, corr_hi):
                r_aug = r_d
                if n_lo:
                    r_aug = r_aug + scatter(
                        sig_lo * r_pi_lo + (r_c_lo + corr_lo - mu_v) / s_lo,
                        lo_idx,
                        zero,
                    )
                if n_hi:
                    r_aug = r_aug - scatter(
                        sig_hi * r_pi_hi + (r_c_hi + corr_hi - mu_v) / s_hi,
                        hi_idx,
                        zero,
                    )
                rhs = (
                    jnp.concatenate([-r_aug, -r_pe], axis=0) if m else -r_aug
                )
                sol = solve(rhs)
                dx_v = sol[:n]
                dy_v = -sol[n:] if m else None
                ds_lo_v = gather(dx_v, lo_idx) + r_pi_lo if n_lo else None
                ds_hi_v = -gather(dx_v, hi_idx) + r_pi_hi if n_hi else None
                dz_lo_v = (
                    -sig_lo * ds_lo_v - (r_c_lo + corr_lo - mu_v) / s_lo
                    if n_lo
                    else None
                )
                dz_hi_v = (
                    -sig_hi * ds_hi_v - (r_c_hi + corr_hi - mu_v) / s_hi
                    if n_hi
                    else None
                )
                return dx_v, dy_v, ds_lo_v, ds_hi_v, dz_lo_v, dz_hi_v

            def ftb(pairs, tau_v):
                alpha = one
                for v, dv in pairs:
                    if v is None:
                        continue
                    blocking = (v + dv <= 0.0) & (jnp.abs(dv) > 0.0)
                    cand = -tau_v * v / jnp.where(blocking, dv, 1.0)
                    cand = jnp.where(blocking, cand, 1.0)
                    alpha = jnp.minimum(
                        alpha, jnp.min(cand, axis=0, keepdims=True)
                    )
                return alpha

            zl = jnp.zeros_like(s_lo) if n_lo else None
            zh = jnp.zeros_like(s_hi) if n_hi else None
            if barrier == "mpc":
                # Mehrotra predictor-corrector (alg 16.4 / qp.cc:170-188).
                dxa, dya, dsl_a, dsh_a, dzl_a, dzh_a = solve_step(
                    zero, zl, zh
                )
                ap_a = ftb([(s_lo, dsl_a), (s_hi, dsh_a)], 1.0)
                ad_a = ftb([(z_lo, dzl_a), (z_hi, dzh_a)], 1.0)
                mu_aff = zero
                if n_lo:
                    mu_aff = mu_aff + jnp.sum(
                        (s_lo + ap_a * dsl_a) * (z_lo + ad_a * dzl_a),
                        axis=0,
                        keepdims=True,
                    )
                if n_hi:
                    mu_aff = mu_aff + jnp.sum(
                        (s_hi + ap_a * dsh_a) * (z_hi + ad_a * dzh_a),
                        axis=0,
                        keepdims=True,
                    )
                mu_aff = jnp.maximum(mu_aff / ncon, 0.0)
                sigma = (mu_aff / mu) ** 3
                mu_used = sigma * mu
                dx, dy, ds_lo, ds_hi, dz_lo, dz_hi = solve_step(
                    mu_used,
                    dsl_a * dzl_a if n_lo else None,
                    dsh_a * dzh_a if n_hi else None,
                )
            else:
                dx, dy, ds_lo, ds_hi, dz_lo, dz_hi = solve_step(mu, zl, zh)

            ap = ftb([(s_lo, ds_lo), (s_hi, ds_hi)], _TAU_FTB)
            ad = ftb([(z_lo, dz_lo), (z_hi, dz_hi)], _TAU_FTB)
            x = x + ap * dx
            comp = zero
            if n_lo:
                s_lo = s_lo + ap * ds_lo
                z_lo = z_lo + ad * dz_lo
                comp = comp + jnp.sum(s_lo * z_lo, axis=0, keepdims=True)
            if n_hi:
                s_hi = s_hi + ap * ds_hi
                z_hi = z_hi + ad * dz_hi
                comp = comp + jnp.sum(s_hi * z_hi, axis=0, keepdims=True)
            if m:
                y = y + ad * dy
            mu = 0.1 * (comp / ncon)
            return pack_carry(x, s_lo, z_lo, s_hi, z_hi, y, mu, bad)

        carry = jax.lax.fori_loop(
            0,
            qp_iterations,
            lambda _i, cr: qp_body(cr),
            pack_carry(x, s_lo, z_lo, s_hi, z_hi, y, one, bad),
        )
        x, _s_lo, _z_lo, _s_hi, _z_hi, y, _mu, bad = unpack_carry(carry)
        fin = jnp.min(jnp.isfinite(x).astype(x.dtype), axis=0, keepdims=True)
        bad = jnp.maximum(bad, jnp.where(fin > 0, zero, one))
        return x, y, bad

    def core(th, tgt_regs, factor, solve):
        """Whole solve on a stacked (n, L) state.  Mirrors
        ops/pallas_ik.py::_make_kernel's outer loop statement for statement
        (penalty 18.32 machine nonlinear.cc:484-502, lambda restore machine
        nonlinear.cc:296-343 at the IK-family constants, Armijo tau = 0.5
        with the clamped slack term, best-merit return)."""
        one = jnp.ones_like(th[:1])
        zero = jnp.zeros_like(one)
        inf = jnp.full_like(one, jnp.inf)

        def outer_body(carry):
            (
                th, lam, penalty, restore, th_best, f_best, eq_best,
                fac_bad, lam_maxed, accepted, f_acc, eq_acc, _f_pre, _eq_pre,
            ) = carry
            th_regs = _rows(th)
            f_pre, r_eq, Jeq_n, G0, c_l = family.linearize(th_regs, tgt_regs)
            assert len(r_eq) == m and len(Jeq_n) == m
            c = _cat(c_l)
            beq = _cat(r_eq) if m else None
            if not m:
                Jeq = None
            elif eq_pats is not None:
                Jeq = jnp.stack(
                    [
                        _coalesced_row(
                            eq_pats[r],
                            lambda j, _row=Jeq_n[r]: _row[j],
                            n,
                            zero,
                        )
                        for r in range(m)
                    ]
                )
            else:
                Jeq = jnp.stack([_cat(row) for row in Jeq_n])
            # Full symmetric G from the lower-triangle register lists (each
            # register referenced twice; no transpose op -- Mosaic-friendly).
            # With a sparsity hint, structural-zero runs coalesce to single
            # broadcasts: O(nnz) trace elements per outer iteration instead
            # of O(n^2) -- the blocked tier's program-size ceiling item.
            if g_cols is not None:
                G_sym = jnp.stack(
                    [
                        _coalesced_row(
                            g_cols[i],
                            lambda j, _i=i: G0[max(_i, j)][min(_i, j)],
                            n,
                            zero,
                        )
                        for i in range(n)
                    ]
                )
            else:
                G_sym = jnp.stack(
                    [
                        _cat([G0[max(i, j)][min(i, j)] for j in range(n)])
                        for i in range(n)
                    ]
                )
            eq_pre = (
                jnp.sum(jnp.abs(beq), axis=0, keepdims=True) if m else zero
            )

            better = f_pre + penalty * eq_pre < f_best + penalty * eq_best
            th_best = jnp.where(better, th, th_best)
            f_best = jnp.where(better, f_pre, f_best)
            eq_best = jnp.where(better, eq_pre, eq_best)

            # lam on the diagonal via an iota-built identity (array constants
            # cannot be captured by a Pallas kernel).
            ri = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
            ci = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
            G = G_sym + lam[None] * (ri == ci).astype(G_sym.dtype)
            # Bound constants fold in as Python floats per row.
            ib_lo = (
                _cat([th[i : i + 1] - lo for (i, lo) in lo_list])
                if n_lo
                else None
            )
            ib_hi = (
                _cat([hi - th[i : i + 1] for (i, hi) in hi_list])
                if n_hi
                else None
            )

            dx, y, bad_it = qp_solve(
                G, c, Jeq, beq, ib_lo, ib_hi, one, zero, factor, solve
            )
            fac_bad = jnp.maximum(fac_bad, bad_it)

            d_f = jnp.sum(c * dx, axis=0, keepdims=True)
            if m:
                y_abs = jnp.max(jnp.abs(y), axis=0, keepdims=True)
                penalty = jnp.where(y_abs > penalty, y_abs * 1.01, penalty)
                d_eq = jnp.sum(
                    jnp.sign(beq) * matvec(Jeq, dx), axis=0, keepdims=True
                )
            else:
                d_eq = zero
            dd = d_f + penalty * d_eq
            merit_pre = f_pre + penalty * eq_pre

            alpha = one
            accepted = zero
            dead = zero
            best = th
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
                        # quadratic (probe 1) then cubic fits with the
                        # reference's validity gating (nonlinear.cc:418-443);
                        # scalar-register math identical to pallas_ik.
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
                            cb = (
                                -a1 * a1 * a1 * r0 + a0 * a0 * a0 * r1
                            ) / det_s
                            arg = cb * cb - 3.0 * ca * dd
                            ca_s = jnp.where(ca == 0.0, one, ca)
                            a_new = (
                                -cb + jnp.sqrt(jnp.maximum(arg, 1e-30))
                            ) / (3.0 * ca_s)
                            valid = (ca != 0.0) & (arg >= -1e-12) & (det != 0.0)
                        valid = valid & (a_new > 0.0) & (a_new < alpha)
                        dead = jnp.maximum(
                            dead,
                            (1.0 - valid.astype(one.dtype)) * (1.0 - accepted),
                        )
                        alpha = jnp.where(valid, a_new, alpha * 0.5)
                cand = th + alpha * dx
                if family.retract is not None:
                    cand = _cat(family.retract(_rows(cand)))
                f_c, eq_c = family.errors(_rows(cand), tgt_regs)
                merit_c = f_c + penalty * eq_c
                # Armijo slack clamped to <= 0 (see pallas_ik: a positive
                # directional derivative must demand plain decrease).
                ok = (
                    merit_c <= merit_pre + 1e-4 * alpha * jnp.minimum(dd, zero)
                ).astype(one.dtype)
                take = ok * (1.0 - accepted) * (1.0 - dead)
                best = take * cand + (1.0 - take) * best
                f_acc = take * f_c + (1.0 - take) * f_acc
                eq_acc = take * eq_c + (1.0 - take) * eq_acc
                accepted = jnp.minimum(accepted + take, 1.0)
                alpha_prev2, phi_prev2 = alpha_prev, phi_prev
                alpha_prev, phi_prev = alpha, merit_c

            th = jnp.where(accepted > 0, best, th)
            lam_succ = jnp.maximum(
                lam * jnp.where(restore > 0, 0.8, 0.1), 1e-9
            )
            lam_fail = jnp.where(
                restore > 0, lam * 10.0, jnp.maximum(0.001 * one, lam * 10.0)
            )
            lam = jnp.where(accepted > 0, lam_succ, lam_fail)
            restore = jnp.where(accepted > 0, zero, one)
            lam_maxed = jnp.where((accepted == 0) & (lam > 1.0), one, zero)
            return (
                th, lam, penalty, restore, th_best, f_best, eq_best,
                fac_bad, lam_maxed, accepted, f_acc, eq_acc, f_pre, eq_pre,
            )

        carry0 = (
            th, 0.001 * one, 0.01 * one, zero, th, inf, zero,
            zero, zero, zero, zero, zero, zero, zero,
        )
        carry = jax.lax.fori_loop(
            0, max_iterations, lambda _i, cr: outer_body(cr), carry0
        )
        (
            th, _lam, penalty, _restore, th_best, f_best, eq_best,
            fac_bad, lam_maxed, accepted, f_acc, eq_acc, f_pre, eq_pre,
        ) = carry
        f_fin = jnp.where(accepted > 0, f_acc, f_pre)
        eq_fin = jnp.where(accepted > 0, eq_acc, eq_pre)
        better = f_fin + penalty * eq_fin < f_best + penalty * eq_best
        x_out = jnp.where(better, th, th_best)
        f_out = jnp.where(better, f_fin, f_best)
        eq_out = jnp.where(better, eq_fin, eq_best)
        flags = fac_bad + 2.0 * lam_maxed
        return x_out, f_out, eq_out, flags

    def kernel(tgt_ref, x0_ref, out_ref, stat_ref, l_scr, d_scr, x_scr):
        tgt = [tgt_ref[i, 0] for i in range(family.data_rows)]
        th = x0_ref[:, 0, 0, :]  # (n, L) stacked state
        factor, solve = make_kkt(l_scr, d_scr, x_scr)
        x_out, f_out, eq_out, flags = core(th, tgt, factor, solve)
        out_ref[:, 0, 0, :] = x_out
        stat_ref[0, 0] = f_out
        stat_ref[1, 0] = eq_out
        stat_ref[2, 0] = flags

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
        "return_state",
        "lanes",
    ),
)
def blocked_solve_batch(
    family: FusedFamily,
    data: jax.Array,  # (B, family.data_rows)
    x0: jax.Array,  # (B, family.n)
    max_iterations: int = 10,
    qp_iterations: int = 6,
    ls_iterations: int = 2,
    line_search: str = "armijo",
    barrier: str = "mpc",
    return_state: bool = False,
    lanes: "int | None" = None,
) -> jax.Array:
    """Solve B instances of a medium-N family with the blocked fused kernel.

    Same contract as ops/pallas_ik.py::fused_solve_batch (which dispatches
    here automatically past REGISTER_KKT_MAX): returns (B, n); with
    ``return_state`` also the per-lane (B, 3) (f, |eq|_1, flags) channel
    accepted by ``fused_termination_status``.  ``lanes`` instances are
    solved per grid step; ``None`` = 128 (measured FASTER on-chip than 256
    at D = 49 -- 11.8 vs 13.8 ms/batch-8192 -- despite half the grid
    steps; wider tiles also double the (D, D, lanes) VMEM footprint, which
    a D = 128 system cannot afford).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = data.shape[0]
    n = family.n
    D = n + family.m_eq
    t_rows = family.data_rows
    assert data.shape == (B, t_rows) and x0.shape == (B, n)
    if lanes is None:
        lanes = 128
    assert lanes % 128 == 0
    kernel = _make_blocked_kernel(
        family, max_iterations, qp_iterations, ls_iterations,
        line_search, barrier,
    )

    b_pad = -(-B // lanes) * lanes
    grid = b_pad // lanes

    def pack(arr):
        # Pad by replicating the last real instance: benign convergent
        # padding for ANY family (the register tier's family-specific fill
        # constants don't generalize).
        p = jnp.pad(arr, [(0, b_pad - B), (0, 0)], mode="edge")
        return jnp.moveaxis(p, 0, -1).reshape(arr.shape[1], grid, 1, lanes)

    dt = data.dtype
    out, stat = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (t_rows, 1, 1, lanes), lambda i: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (n, 1, 1, lanes), lambda i: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (n, 1, 1, lanes), lambda i: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, 1, 1, lanes), lambda i: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, grid, 1, lanes), dt),
            jax.ShapeDtypeStruct((3, grid, 1, lanes), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((D, D, lanes), dt),
            pltpu.VMEM((D, lanes), dt),
            pltpu.VMEM((D, lanes), dt),
        ],
        interpret=_interpret(),
    )(pack(data), pack(x0))
    x = jnp.moveaxis(out.reshape(n, b_pad), -1, 0)[:B]
    if return_state:
        return x, jnp.moveaxis(stat.reshape(3, b_pad), -1, 0)[:B]
    return x


# ---------------------------------------------------------------------------
# Standalone blocked KKT solve (the oracle hook): one factor + solve through
# the same scratch-ref column recurrence the fused kernel uses, pinned
# against ops/kkt.py::ldlt in tests/test_pallas_blocked.py.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("lanes",))
def blocked_kkt_solve(H: jax.Array, rhs: jax.Array, lanes: int = 128):
    """Solve B dense quasi-definite systems H x = rhs with the blocked
    batched LDL^T kernel.  H (B, D, D) (lower triangle read), rhs (B, D).
    The medium-N standalone analog of ops/pallas_ldlt.py (which unrolls per
    column on (8, 128)-lane tiles and is preferred for D <= ~40)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, D, _ = H.shape
    b_pad = -(-max(B, 1) // lanes) * lanes
    eye = jnp.eye(D, dtype=H.dtype)
    mask = (jnp.arange(b_pad) < B)[:, None, None]
    H_p = jnp.where(
        mask, jnp.pad(H, [(0, b_pad - B), (0, 0), (0, 0)]), eye[None]
    )
    r_p = jnp.pad(rhs, [(0, b_pad - B), (0, 0)])
    grid = b_pad // lanes

    def kernel(h_ref, r_ref, x_out, l_scr, d_scr, x_scr):
        rows_iota = jax.lax.broadcasted_iota(jnp.int32, (D, 1), 0)
        for j in range(D):
            c = h_ref[:, j, :]
            if j > 0:
                w = d_scr[:j, :] * l_scr[j, :j, :]
                c = c - jnp.sum(l_scr[:, :j, :] * w[None], axis=1)
            dj = c[j : j + 1, :]
            col = jnp.where(
                rows_iota > j, c / dj, jnp.where(rows_iota == j, 1.0, 0.0)
            )
            l_scr[:, j, :] = col
            d_scr[j : j + 1, :] = dj
        for j in range(D):
            acc = r_ref[j : j + 1, :]
            if j > 0:
                acc = acc - jnp.sum(
                    l_scr[j, :j, :] * x_scr[:j, :], axis=0, keepdims=True
                )
            x_scr[j : j + 1, :] = acc
        x_scr[:, :] = x_scr[:, :] / d_scr[:, :]
        for j in range(D - 2, -1, -1):
            acc = x_scr[j : j + 1, :] - jnp.sum(
                l_scr[j + 1 :, j, :] * x_scr[j + 1 :, :], axis=0, keepdims=True
            )
            x_scr[j : j + 1, :] = acc
        x_out[:, :] = x_scr[:, :]

    xt = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (D, D, lanes), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (D, lanes), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (D, lanes), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((D, b_pad), H.dtype),
        scratch_shapes=[
            pltpu.VMEM((D, D, lanes), H.dtype),
            pltpu.VMEM((D, lanes), H.dtype),
            pltpu.VMEM((D, lanes), H.dtype),
        ],
        interpret=_interpret(),
    )(jnp.moveaxis(H_p, 0, -1), jnp.moveaxis(r_p, 0, -1))
    return jnp.moveaxis(xt, -1, 0)[:B]
