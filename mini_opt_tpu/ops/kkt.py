"""Pluggable linear-solve kernels for the condensed KKT system.

The reference factors its condensed (N+K)x(N+K) system with Eigen's dense
LDLT and forms H^-1 explicitly (qp.cc:275-316). Here the factorization is a
pure function chosen by name:

* ``"lu"``     -- partial-pivot LU via jax.scipy (robust generic path; this is
                  also the brute-force oracle the tests compare against).
* ``"ldlt"``   -- unpivoted LDL^T in pure jnp, written as a masked column
                  recurrence (O(D) steps of O(D^2) vector work) so it lowers
                  to VPU-friendly code and batches under ``vmap``. Valid for
                  the quasi-definite KKT matrices this solver produces
                  (G PD + LM damping, fraction-to-boundary keeps s, z > 0).
* ``"pallas_ldlt"`` -- the same recurrence as a lane-batched Pallas TPU
                  kernel: one (D, D, lanes) tile per grid step, batch
                  instances on the 128-wide lane axis (see ops/pallas_ldlt).

All three share the (factorize, solve) interface; factorize returns
``(fact, ok)`` where ``ok`` is the jittable replacement for the reference's
FailedFactorization exception (qp.cc:303-307).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

SOLVERS = ("auto", "lu", "ldlt", "ldlt_ir", "pallas_ldlt")


def is_valid_solver(name: str) -> bool:
    """Fixed names plus the parameterized structured backends
    (``"riccati:T:NX:NU"``, see ops/riccati.py)."""
    return name in SOLVERS or name.startswith("riccati:")


def resolve_solver(name: str) -> str:
    """Resolve the ``"auto"`` sentinel to a backend-appropriate solver at
    trace time: ``"ldlt"`` on TPU (``lu_factor``'s lowering crashes the TPU
    compiler when nested inside the solver loops), ``"lu"`` elsewhere. The
    stock configuration must just work on the chip (nonlinear.hpp:64-124
    needs no such knowledge either)."""
    if name == "auto":
        return "ldlt" if jax.default_backend() == "tpu" else "lu"
    return name


# ---------------------------------------------------------------------------
# LU (generic fallback / oracle).
# ---------------------------------------------------------------------------


def _lu_factorize(H: jax.Array):
    lu, piv = jax.scipy.linalg.lu_factor(H)
    diag = jnp.diagonal(lu)
    # Deliberately lenient: interior-point Sigma terms legitimately span ~18
    # orders of magnitude, so a relative pivot test mis-flags healthy systems.
    # An exactly-singular factorization (zero pivot / non-finite) is caught
    # here; near-singular ones surface as non-finite steps in the caller.
    ok = jnp.all(jnp.isfinite(lu)) & jnp.all(
        jnp.abs(diag) > jnp.finfo(H.dtype).tiny
    )
    return (lu, piv), ok


def _lu_solve(fact, rhs: jax.Array) -> jax.Array:
    return jax.scipy.linalg.lu_solve(fact, rhs)


# ---------------------------------------------------------------------------
# Unpivoted LDL^T (quasi-definite KKT path; maps 1:1 onto the Pallas kernel).
# ---------------------------------------------------------------------------


_LDLT_UNROLL_MAX = 24


def ldlt_factorize(H: jax.Array) -> Tuple[Tuple[jax.Array, jax.Array], jax.Array]:
    """Unpivoted LDL^T: H = L diag(d) L^T with unit-lower L.

    For small D (the solver's condensed systems) the column recurrence is
    unrolled into straight-line code: no fori_loop means no loop nesting when
    this sits inside the SQP scans -- far cheaper to compile on TPU and
    better fused. Larger D falls back to a masked fori_loop.
    """
    D = H.shape[-1]
    dtype = H.dtype

    if D <= _LDLT_UNROLL_MAX:
        cols = []
        ds = []
        for j in range(D):
            c = H[:, j]
            for k in range(j):
                # c_j -= L[:, k] * d_k * L[j, k]
                c = c - cols[k] * (ds[k] * cols[k][j])
            dj = c[j]
            col = jnp.concatenate(
                [
                    jnp.zeros((j,), dtype),
                    jnp.ones((1,), dtype),
                    c[j + 1 :] / dj,
                ]
            )
            cols.append(col)
            ds.append(dj)
        L = jnp.stack(cols, axis=1)
        d = jnp.stack(ds)
        ok = jnp.all(jnp.isfinite(L)) & jnp.all(
            jnp.abs(d) > jnp.finfo(dtype).tiny
        )
        return (L, d), ok

    rows = jnp.arange(D)

    def body(j, carry):
        L, d = carry
        mask = (rows < j).astype(dtype)
        c = H[:, j] - L @ (d * L[j, :] * mask)
        dj = c[j]
        col = jnp.where(rows > j, c / dj, jnp.where(rows == j, 1.0, 0.0))
        return L.at[:, j].set(col), d.at[j].set(dj)

    L0 = jnp.zeros((D, D), dtype)
    d0 = jnp.zeros((D,), dtype)
    L, d = jax.lax.fori_loop(0, D, body, (L0, d0))
    # Lenient pivot test; see _lu_factorize for rationale.
    ok = jnp.all(jnp.isfinite(L)) & jnp.all(jnp.abs(d) > jnp.finfo(dtype).tiny)
    return (L, d), ok


def ldlt_solve(fact, rhs: jax.Array) -> jax.Array:
    L, d = fact
    w = jax.scipy.linalg.solve_triangular(L, rhs, lower=True, unit_diagonal=True)
    # The diagonal scale acts on the ROW axis; broadcast accordingly for
    # matrix right-hand sides (e.g. solving for an explicit inverse).
    w = w / (d[:, None] if rhs.ndim == 2 else d)
    return jax.scipy.linalg.solve_triangular(
        L.T, w, lower=False, unit_diagonal=True
    )


# ---------------------------------------------------------------------------
# LDL^T + one step of iterative refinement (the f32-on-TPU bridge toward the
# reference's f64 tolerances, SURVEY.md section 7 'hard parts': the refined
# residual recovers most of the accuracy a single f32 solve loses).
# ---------------------------------------------------------------------------


def ldlt_ir_factorize(H: jax.Array):
    fact, ok = ldlt_factorize(H)
    return (fact, H), ok


def ldlt_ir_solve(fact_h, rhs: jax.Array) -> jax.Array:
    fact, H = fact_h
    x = ldlt_solve(fact, rhs)
    r = rhs - H @ x
    return x + ldlt_solve(fact, r)


# ---------------------------------------------------------------------------
# Dispatch.
# ---------------------------------------------------------------------------


def kkt_factorize(H: jax.Array, solver: str):
    solver = resolve_solver(solver)
    if solver == "lu":
        return _lu_factorize(H)
    if solver == "ldlt":
        return ldlt_factorize(H)
    if solver == "ldlt_ir":
        return ldlt_ir_factorize(H)
    if solver == "pallas_ldlt":
        from . import pallas_ldlt

        return pallas_ldlt.factorize(H)
    if solver.startswith("riccati:"):
        from . import riccati

        return riccati.riccati_factorize(H, *riccati.parse(solver))
    raise ValueError(f"unknown kkt solver: {solver!r}")


def kkt_solve(fact, rhs: jax.Array, solver: str) -> jax.Array:
    solver = resolve_solver(solver)
    if solver == "lu":
        return _lu_solve(fact, rhs)
    if solver == "ldlt":
        return ldlt_solve(fact, rhs)
    if solver == "ldlt_ir":
        return ldlt_ir_solve(fact, rhs)
    if solver == "pallas_ldlt":
        from . import pallas_ldlt

        return pallas_ldlt.solve(fact, rhs)
    if solver.startswith("riccati:"):
        from . import riccati

        return riccati.riccati_solve(fact, rhs, *riccati.parse(solver))
    raise ValueError(f"unknown kkt solver: {solver!r}")
