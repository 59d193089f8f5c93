"""Fused whole-solver Pallas kernel for the flagship 2-link IK family.

The general solver (nonlinear.py) is a composition of XLA ops under nested
scans; at ~4 us/solve it is dispatch-bound, not FLOP-bound. This kernel is
the speed-of-light serving path for the benchmark problem family
(models/ik.py, the reference's actuator-limit IK): the ENTIRE constrained
SQP solve -- forward kinematics, Gauss-Newton assembly, the condensed-KKT
interior-point inner loop (closed-form 3x3 LDLT), fraction-to-boundary,
L1-merit Armijo line search with angle-wrap retraction, and the LM lambda
state machine -- unrolled into straight-line elementwise code over
``(1, BB)`` lane rows. One kernel invocation solves BB instances with zero
inter-op overhead; the grid tiles the batch.

Semantics mirror nls_solve's fixed-trip configuration on this family
(same mu schedule, tolerances, penalty update, Armijo constants); parity is
asserted against the general solver in tests and against the 1e-3 effector
gate in bench.py.

This is a family-specific kernel by design -- the production pattern for a
hot workload (like fused attention), sitting on top of the general solver.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

_INTERPRET = jax.default_backend() != "tpu" or bool(
    int(os.environ.get("MINI_OPT_PALLAS_INTERPRET", "0"))
)

_LANES = 512
_PI = 3.14159265358979


def _mod_pi(a):
    return a - 2.0 * _PI * jnp.floor((a + _PI) / (2.0 * _PI))


def _make_kernel(link_len, max_iterations, qp_iterations, ls_iterations):
    L = link_len

    def fk(th0, th1):
        """Effector (px, py) and Jacobian rows for the cumulative-angle
        planar chain; all (1, BB)."""
        c1, s1 = jnp.cos(th0), jnp.sin(th0)
        c12, s12 = jnp.cos(th0 + th1), jnp.sin(th0 + th1)
        px = L * (c1 + c12)
        py = L * (s1 + s12)
        # d px/d th = (-L(s1+s12), -L s12); d py/d th = (L(c1+c12), L c12)
        jx0, jx1 = -L * (s1 + s12), -L * s12
        jy0, jy1 = L * (c1 + c12), L * c12
        return px, py, jx0, jx1, jy0, jy1

    def errors(th0, th1, tx, ty):
        px, py, *_ = fk(th0, th1)
        f = 0.5 * (py - ty) ** 2
        eq = jnp.abs(px - tx)
        return f, eq

    def qp_solve(g00, g01, g11, c0, c1v, a0, a1, b_eq, ib0, ib1):
        """Interior-point solve of the condensed QP for this family:
        min 0.5 dx^T G dx + c^T dx, s.t. [a0 a1] dx + b_eq = 0 and the two
        theta1 box rows dx1 + ib0 >= 0, -dx1 + ib1 >= 0. Returns
        (dx0, dx1, |y|) after `qp_iterations` steps; all (1, BB)."""
        one = jnp.ones_like(g00)
        zero = jnp.zeros_like(g00)

        def ldlt3_solve(h00, h01, h02, h11, h12, h22, r0, r1, r2):
            """Closed-form LDL^T solve of the symmetric 3x3 system."""
            d0 = h00
            l10 = h01 / d0
            l20 = h02 / d0
            d1 = h11 - l10 * l10 * d0
            l21 = (h12 - l20 * l10 * d0) / d1
            d2 = h22 - l20 * l20 * d0 - l21 * l21 * d1
            # forward
            y0 = r0
            y1 = r1 - l10 * y0
            y2 = r2 - l20 * y0 - l21 * y1
            # scale
            y0, y1, y2 = y0 / d0, y1 / d1, y2 / d2
            # backward
            x2 = y2
            x1 = y1 - l21 * x2
            x0 = y0 - l10 * x1 - l20 * x2
            return x0, x1, x2

        def kkt(x0, x1, s0, s1, y, z0, z1):
            """KKT residuals (mu = 0)."""
            r_d0 = g00 * x0 + g01 * x1 + c0 - a0 * y
            r_d1 = g01 * x0 + g11 * x1 + c1v - a1 * y - z0 + z1
            r_pe = a0 * x0 + a1 * x1 + b_eq
            r_pi0 = x1 + ib0 - s0
            r_pi1 = -x1 + ib1 - s1
            r_c0 = s0 * z0
            r_c1 = s1 * z1
            return r_d0, r_d1, r_pe, r_pi0, r_pi1, r_c0, r_c1

        # Equality-constrained initial guess (mu-free solve), then clamp.
        x0g, x1g, yneg = ldlt3_solve(
            g00, g01, a0, g11, a1, zero, -c0, -c1v, -b_eq
        )
        yg = -yneg
        # Clamp dx1 into [-ib0, ib1] (the feasible band of the shifted rows).
        x1g = jnp.clip(x1g, -ib0, ib1)
        s0 = jnp.maximum(1e-9, x1g + ib0)
        s1 = jnp.maximum(1e-9, -x1g + ib1)
        z0 = 1.0 / s0
        z1 = 1.0 / s1

        mu = one
        x0v, x1v, yv = x0g, x1g, yg
        for _ in range(qp_iterations):
            r_d0, r_d1, r_pe, r_pi0, r_pi1, r_c0, r_c1 = kkt(
                x0v, x1v, s0, s1, yv, z0, z1
            )
            sig0 = z0 / s0
            sig1 = z1 / s1
            # Condensed H = G + A_i^T Sigma A_i (theta1 only), bordered by A_eq.
            h11 = g11 + sig0 + sig1
            # Augmented dual residual after eliminating (s, z).
            r_aug0 = r_d0
            r_aug1 = (
                r_d1
                + sig0 * r_pi0 + (r_c0 - mu) / s0
                - sig1 * r_pi1 - (r_c1 - mu) / s1
            )
            dx0, dx1, dyneg = ldlt3_solve(
                g00, g01, a0, h11, a1, zero, -r_aug0, -r_aug1, -r_pe
            )
            dy = -dyneg
            ds0 = dx1 + r_pi0
            ds1 = -dx1 + r_pi1
            dz0 = -sig0 * ds0 - (r_c0 - mu) / s0
            dz1 = -sig1 * ds1 - (r_c1 - mu) / s1
            # Fraction-to-boundary, tau = 0.995.
            tau = 0.995

            def ftb(v, dv, alpha):
                blocking = (v + dv <= 0.0) & (jnp.abs(dv) > 0.0)
                cand = -tau * v / jnp.where(blocking, dv, one)
                return jnp.minimum(alpha, jnp.where(blocking, cand, one))

            ap = ftb(s1, ds1, ftb(s0, ds0, one))
            ad = ftb(z1, dz1, ftb(z0, dz0, one))
            x0v = x0v + ap * dx0
            x1v = x1v + ap * dx1
            s0 = s0 + ap * ds0
            s1 = s1 + ap * ds1
            yv = yv + ad * dy
            z0 = z0 + ad * dz0
            z1 = z1 + ad * dz1
            mu = 0.1 * (s0 * z0 + s1 * z1) / 2.0
        return x0v, x1v, jnp.abs(yv)

    def kernel(tgt_ref, x0_ref, out_ref):
        tx = tgt_ref[0:1, :]
        ty = tgt_ref[1:2, :]
        th0 = x0_ref[0:1, :]
        th1 = x0_ref[1:2, :]
        one = jnp.ones_like(tx)
        zero = jnp.zeros_like(tx)

        lam = 0.001 * one
        penalty = 0.01 * one
        restore = zero  # 0 nominal, 1 attempting-restore

        for _ in range(max_iterations):
            # --- linearize ------------------------------------------------
            px, py, jx0, jx1, jy0, jy1 = fk(th0, th1)
            ry = py - ty
            rx = px - tx
            f_pre = 0.5 * ry * ry
            eq_pre = jnp.abs(rx)
            g00 = jy0 * jy0 + lam
            g01 = jy0 * jy1
            g11 = jy1 * jy1 + lam
            c0 = jy0 * ry
            c1v = jy1 * ry
            # Shifted box rows for theta1 in [0, pi].
            ib0 = th1
            ib1 = _PI - th1

            # --- inner QP ---------------------------------------------------
            dx0, dx1, y_abs = qp_solve(
                g00, g01, g11, c0, c1v, jx0, jx1, rx, ib0, ib1
            )

            # --- penalty + directional derivative ---------------------------
            penalty = jnp.where(
                y_abs > penalty, y_abs * 1.01, penalty
            )
            d_f = c0 * dx0 + c1v * dx1
            d_eq = jnp.sign(rx) * (jx0 * dx0 + jx1 * dx1)
            dd = d_f + penalty * d_eq
            merit_pre = f_pre + penalty * eq_pre

            # --- Armijo backtracking line search ----------------------------
            alpha = one
            accepted = zero  # bool mask as float
            best_th0, best_th1 = th0, th1
            for probe in range(ls_iterations + 1):
                if probe > 0:
                    alpha = alpha * 0.5
                c_th0 = _mod_pi(th0 + alpha * dx0)
                c_th1 = _mod_pi(th1 + alpha * dx1)
                f_c, eq_c = errors(c_th0, c_th1, tx, ty)
                merit_c = f_c + penalty * eq_c
                ok = (merit_c <= merit_pre + 1e-4 * alpha * dd).astype(tx.dtype)
                take = ok * (1.0 - accepted)
                best_th0 = take * c_th0 + (1.0 - take) * best_th0
                best_th1 = take * c_th1 + (1.0 - take) * best_th1
                accepted = jnp.minimum(accepted + ok, 1.0)

            # --- lambda state machine --------------------------------------
            th0 = jnp.where(accepted > 0, best_th0, th0)
            th1 = jnp.where(accepted > 0, best_th1, th1)
            lam_succ = jnp.maximum(
                lam * jnp.where(restore > 0, 0.8, 0.1), 1e-9
            )
            lam_fail = jnp.where(
                restore > 0, lam * 10.0, jnp.maximum(0.001 * one, lam * 10.0)
            )
            lam = jnp.where(accepted > 0, lam_succ, lam_fail)
            restore = jnp.where(accepted > 0, zero, one)

        out_ref[0:1, :] = th0
        out_ref[1:2, :] = th1

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("link_len", "max_iterations", "qp_iterations", "ls_iterations"),
)
def fused_ik_solve_batch(
    targets: jax.Array,  # (B, 2)
    x0: jax.Array,  # (B, 2)
    link_len: float = 0.4,
    max_iterations: int = 10,
    qp_iterations: int = 6,
    ls_iterations: int = 2,
) -> jax.Array:
    """Solve B 2-link IK instances with the fused kernel. Returns (B, 2)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = targets.shape[0]
    bb = min(_LANES, max(128, B))
    b_pad = -(-B // bb) * bb
    pad = [(0, b_pad - B), (0, 0)]
    tgt = jnp.moveaxis(jnp.pad(targets, pad, constant_values=0.5), 0, -1)
    x0t = jnp.moveaxis(jnp.pad(x0, pad, constant_values=0.3), 0, -1)

    kernel = _make_kernel(link_len, max_iterations, qp_iterations, ls_iterations)
    out = pl.pallas_call(
        kernel,
        grid=(b_pad // bb,),
        in_specs=[
            pl.BlockSpec((2, bb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, bb), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, bb), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, b_pad), targets.dtype),
        interpret=_INTERPRET,
    )(tgt, x0t)
    return jnp.moveaxis(out, -1, 0)[:B]
