"""Riccati (LQR) structured solver for optimal-control KKT systems.

The MPC transcription (models/mpc.py) produces condensed interior-point
systems with the classic direct-multiple-shooting structure: decision vector
z = [u_0..u_{T-1}, x_1..x_T], a STAGE-BLOCK-DIAGONAL Hessian (tracking /
effort / LM-damping / box-barrier Sigma terms all live on per-stage blocks),
and T dynamics-defect equality rows each coupling (u_t, x_t, x_{t+1}).  The
generic dense path factors the full (N+K)x(N+K) saddle matrix with an O(N+K)
sequential LDLT recurrence -- at horizon 20 that is 180 dependent steps per
interior-point iteration, the dominant cost of the MPC family on TPU.

This module eliminates the same system by backward Riccati recursion
instead: T steps of (NX+NU)-sized dense algebra, each a handful of tiny
einsums that batch perfectly over a vmapped fleet.  It plugs into the
existing pluggable-KKT interface (ops/kkt.py) under the solver name

    ``f"riccati:{T}:{NX}:{NU}"``

so ``qp_ip_solve`` / ``nls_solve`` use it unchanged -- the reference has no
analog (its dense LDLT at qp.cc:275-316 is the only KKT path); this is the
TPU-native structured answer to the same problem statement
(/root/reference/include/mini_opt/nonlinear.hpp:11-32, which IS an MPC
transcription).

Math.  The condensed system (qp.cc:228-298 derivation) is

    [[G, E^T], [E, 0]] @ [p; w] = [b1; b2]

with G stage-block-diagonal (R_t on u_t, Q_t on x_t) and equality block-rows
t = 0..T-1:  D_t p_{u_t} + C_t p_{x_t} + N_t p_{x_{t+1}} = b2_t  (C_0 absent;
for the RK4 defect rows D_t = -B_t, C_t = -A_t, N_t = I, but none of that is
assumed -- blocks are taken as found, N_t only needs to be invertible).
Normalizing each row by N_t^{-1} gives dynamics

    dx_{t+1} = Abar_t dx_t + Bbar_t du_t + cbar_t,

and the substitution wbar_t = N_t^T w_t, lam_{t+1} = -wbar_t turns the
remaining KKT rows into the standard two-point boundary problem

    lam_T = Q_T dx_T - b1x_T
    lam_t = Q_t dx_t + Abar_t^T lam_{t+1} - b1x_t          (x_t rows)
    R_t du_t + Bbar_t^T lam_{t+1} = b1u_t                  (u_t rows)

solved exactly by the affine value-function ansatz lam_t = V_t dx_t + v_t:

    V_T = Q_T,  v_T = -b1x_T
    F_t = R_t + Bbar^T V_{t+1} Bbar                        (PD when G is)
    K_t = F_t^{-1} Bbar^T V_{t+1} Abar
    k_t = F_t^{-1} (b1u_t - Bbar^T (V_{t+1} cbar_t + v_{t+1}))
    V_t = Q_t + Abar^T V_{t+1} (Abar - Bbar K_t)
    v_t = Abar^T (V_{t+1} (Bbar k_t + cbar_t) + v_{t+1}) - b1x_t

then du_t = -K_t dx_t + k_t forward from dx_0 = 0 (x_0 is the plant state, a
parameter, so it has no correction column), and w_t = -N_t^{-T} lam_{t+1}.

The V/K/F recursion depends only on the matrix, so it IS the factorization;
the v/k backward sweep plus the forward rollout are the per-rhs solve --
matching the (factorize, solve-many-rhs) split the interior-point loop needs
(one factorization, one or two Mehrotra solves).

Structure is VERIFIED, not trusted: the factorization masks the input
against the stagewise sparsity pattern and folds any off-pattern mass into
the ``ok`` flag, so feeding a non-LQR problem surfaces as
FAILED_FACTORIZATION (the same channel a singular dense factorization uses)
rather than silent garbage.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp


def parse(name: str) -> Tuple[int, int, int]:
    """``"riccati:T:NX:NU"`` -> (T, NX, NU)."""
    parts = name.split(":")
    if len(parts) != 4 or parts[0] != "riccati":
        raise ValueError(f"bad riccati solver spec: {name!r}")
    T, NX, NU = (int(p) for p in parts[1:])
    assert T >= 1 and NX >= 1 and NU >= 1
    return T, NX, NU


def solver_name(horizon: int, nx: int, nu: int) -> str:
    return f"riccati:{horizon}:{nx}:{nu}"


# ---------------------------------------------------------------------------
# Small static helpers.
# ---------------------------------------------------------------------------


def _diag_blocks(M: jax.Array, T: int, a: int, b: int) -> jax.Array:
    """(T*a, T*b) -> (T, a, b) diagonal blocks (static reshape, no gather)."""
    X = M.reshape(T, a, T, b)
    return jnp.moveaxis(jnp.diagonal(X, axis1=0, axis2=2), -1, 0)


def _sub_blocks(M: jax.Array, T: int, a: int, b: int) -> jax.Array:
    """Blocks (t, t-1) for t = 1..T-1, shape (T-1, a, b)."""
    if T == 1:
        return jnp.zeros((0, a, b), M.dtype)
    X = M.reshape(T, a, T, b)[1:, :, :-1, :]
    return jnp.moveaxis(jnp.diagonal(X, axis1=0, axis2=2), -1, 0)


def _unrolled_inv(M: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Unpivoted Gauss-Jordan inverse of small (..., n, n) blocks.

    Straight-line code (n is tiny and static): no fori_loop, no lu_factor --
    both are TPU landmines inside the solver scans (see CLAUDE.md).  Valid
    for the diagonally-dominant blocks this path meets (N_t is the identity
    for explicit-integrator defects; F_t is PD).  Returns (inv, pivots);
    callers fold pivot magnitude into their ``ok`` flag.
    """
    n = M.shape[-1]
    rows = [M[..., i, :] for i in range(n)]
    eye = jnp.eye(n, dtype=M.dtype)
    inv_rows = [jnp.broadcast_to(eye[i], rows[i].shape) for i in range(n)]
    pivots = []
    for j in range(n):
        p = rows[j][..., j : j + 1]
        pivots.append(p[..., 0])
        rj = rows[j] / p
        ij = inv_rows[j] / p
        for i in range(n):
            if i == j:
                continue
            f = rows[i][..., j : j + 1]
            rows[i] = rows[i] - f * rj
            inv_rows[i] = inv_rows[i] - f * ij
        rows[j] = rj
        inv_rows[j] = ij
    return jnp.stack(inv_rows, axis=-2), jnp.stack(pivots, axis=-1)


def _structure_mask(T: int, NX: int, NU: int) -> np.ndarray:
    """Static boolean mask of the allowed stagewise sparsity pattern."""
    N = T * (NU + NX)
    D = N + T * NX
    mask = np.zeros((D, D), dtype=bool)

    def u(t):
        return slice(t * NU, (t + 1) * NU)

    def x(t):  # t in [1, T]
        return slice(T * NU + (t - 1) * NX, T * NU + t * NX)

    def e(t):  # constraint block-row t in [0, T)
        return slice(N + t * NX, N + (t + 1) * NX)

    for t in range(T):
        mask[u(t), u(t)] = True
        mask[x(t + 1), x(t + 1)] = True
        mask[e(t), u(t)] = True
        if t >= 1:
            mask[e(t), x(t)] = True
        mask[e(t), x(t + 1)] = True
    return mask | mask.T


def _scan_unroll(T: int) -> int:
    # Tiny per-step bodies: lax.scan blocks fusion and its dispatch dominates
    # (CLAUDE.md), so short horizons are fully unrolled into straight-line
    # code; long ones get a bounded unroll factor.
    return T if T <= 32 else 8


# ---------------------------------------------------------------------------
# Factorize / solve (the ops.kkt backend interface).
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(1, 2, 3))
def riccati_factorize(H: jax.Array, T: int, NX: int, NU: int):
    """Backward Riccati pass over the condensed (N+K)x(N+K) matrix.

    Returns ``(fact, ok)`` like every ops.kkt factorization; ``ok`` is False
    when the matrix violates the stagewise pattern, a transition block N_t is
    (near-)singular, or any reduced Hessian F_t loses positive definiteness.
    """
    dtype = H.dtype
    N = T * (NU + NX)
    K = T * NX
    assert H.shape[-2:] == (N + K, N + K), (
        f"riccati:{T}:{NX}:{NU} expects a {(N + K,)}-sized condensed system, "
        f"got {H.shape}"
    )

    R = _diag_blocks(H[: T * NU, : T * NU], T, NU, NU)
    Qn = _diag_blocks(H[T * NU : N, T * NU : N], T, NX, NX)  # Qn[t] = Q_{t+1}
    E = H[N:, :N]
    Db = _diag_blocks(E[:, : T * NU], T, NX, NU)
    Ex = E[:, T * NU :]
    Nb = _diag_blocks(Ex, T, NX, NX)
    C = jnp.concatenate(
        [jnp.zeros((1, NX, NX), dtype), _sub_blocks(Ex, T, NX, NX)], axis=0
    )

    # Off-pattern mass -> failed factorization (structurally-zero entries are
    # exact zeros out of the one-hot assembly, so the gate can be tight).
    mask = jnp.asarray(_structure_mask(T, NX, NU), dtype=dtype)
    h_max = jnp.max(jnp.abs(H))
    off = jnp.max(jnp.abs(H * (1.0 - mask)))
    structure_ok = off <= 16.0 * jnp.finfo(dtype).eps * jnp.maximum(h_max, 1.0)

    Ninv, npiv = _unrolled_inv(Nb)
    Abar = -jnp.einsum("tij,tjk->tik", Ninv, C)
    Bbar = -jnp.einsum("tij,tjk->tik", Ninv, Db)
    Qcur = jnp.concatenate([jnp.zeros((1, NX, NX), dtype), Qn[:-1]], axis=0)

    def bwd(V, inp):
        Rt, Qt, At, Bt = inp
        VB = V @ Bt  # (NX, NU)
        F = Rt + Bt.T @ VB
        Finv, fpiv = _unrolled_inv(F)
        Kt = Finv @ (VB.T @ At)
        Vt = Qt + At.T @ (V @ At - VB @ Kt)
        Vt = 0.5 * (Vt + Vt.T)
        return Vt, (Finv, Kt, V, fpiv)

    xs = (R[::-1], Qcur[::-1], Abar[::-1], Bbar[::-1])
    _, (Finv_r, K_r, Vn_r, fpiv_r) = jax.lax.scan(
        bwd, Qn[-1], xs, unroll=_scan_unroll(T)
    )
    Finv, Kg, Vnext = Finv_r[::-1], K_r[::-1], Vn_r[::-1]

    tiny = jnp.finfo(dtype).tiny
    ok = (
        structure_ok
        & jnp.all(jnp.isfinite(Vnext))
        & jnp.all(jnp.isfinite(Finv))
        & jnp.all(jnp.isfinite(Kg))
        & jnp.all(jnp.abs(npiv) > tiny)
        & jnp.all(fpiv_r > tiny)  # GJ pivots of a PD matrix are positive
    )
    fact = (Ninv, Abar, Bbar, Finv, Kg, Vnext)
    return fact, ok


@partial(jax.jit, static_argnums=(2, 3, 4))
def riccati_solve(fact, rhs: jax.Array, T: int, NX: int, NU: int) -> jax.Array:
    """Per-rhs sweeps: backward (v, k), forward (du, dx, w).

    Returns the full saddle solution [p; w] in the same layout the dense
    backends produce, so ``qp._solve_condensed`` consumes it unchanged.
    """
    Ninv, Abar, Bbar, Finv, Kg, Vnext = fact
    dtype = rhs.dtype
    N = T * (NU + NX)
    assert rhs.ndim == 1 and rhs.shape[0] == N + T * NX

    b1u = rhs[: T * NU].reshape(T, NU)
    b1x = rhs[T * NU : N].reshape(T, NX)  # rows of x_1..x_T
    b2 = rhs[N:].reshape(T, NX)
    cbar = jnp.einsum("tij,tj->ti", Ninv, b2)
    # b1x_cur[t] = b1 entry of the x_t row (t >= 1); t = 0 slot unused.
    b1x_cur = jnp.concatenate([jnp.zeros((1, NX), dtype), b1x[:-1]], axis=0)
    unroll = _scan_unroll(T)

    def bwd(v, inp):
        Vt1, Ft, At, Bt, bu, bxc, cb = inp
        k = Ft @ (bu - Bt.T @ (Vt1 @ cb + v))
        vt = At.T @ (Vt1 @ (Bt @ k + cb) + v) - bxc
        return vt, (k, v)

    xs = (
        Vnext[::-1],
        Finv[::-1],
        Abar[::-1],
        Bbar[::-1],
        b1u[::-1],
        b1x_cur[::-1],
        cbar[::-1],
    )
    _, (k_r, v_r) = jax.lax.scan(bwd, -b1x[-1], xs, unroll=unroll)
    ks, vnext = k_r[::-1], v_r[::-1]  # vnext[t] = v_{t+1}

    def fwd(dx, inp):
        Kt, kt, At, Bt, cb, Vt1, vt1, Ninv_t = inp
        du = -(Kt @ dx) + kt
        dxn = At @ dx + Bt @ du + cb
        lam = Vt1 @ dxn + vt1
        w = -(Ninv_t.T @ lam)
        return dxn, (du, dxn, w)

    xs_f = (Kg, ks, Abar, Bbar, cbar, Vnext, vnext, Ninv)
    _, (du, dx, w) = jax.lax.scan(
        fwd, jnp.zeros((NX,), dtype), xs_f, unroll=unroll
    )
    return jnp.concatenate([du.reshape(-1), dx.reshape(-1), w.reshape(-1)])
