"""Lane-batched LDL^T Pallas TPU kernel for the condensed KKT solve.

The reference factors one small dense (N+K)x(N+K) system at a time with
Eigen LDLT (qp.cc:275-316). The TPU workload is thousands of such tiny
systems at once (one per vmapped problem instance), which is hostile to
cuBLAS/LAPACK-style batched linalg on an MXU. The right layout is
**structure-of-arrays**: transpose the batch to ``(D, D, B)`` so the batch
axis rides the 128-wide vector lanes, then run the O(D) column recurrence of
the unpivoted LDL^T with every elementwise step vectorized across all B
instances on the VPU. D is static and tiny (~3-40), so the recurrence is
fully unrolled into straight-line code; the kernel is compute-regular,
branch-free, and keeps everything in VMEM.

Same recurrence as ops.kkt.ldlt_factorize (which is its oracle in tests);
valid for the quasi-definite KKT matrices the interior-point solver produces.

Integration is via ``jax.custom_batching.custom_vmap``: the scalar-problem
call falls back to the jnp recurrence, and a vmapped call dispatches the
whole batch to one pallas_call -- so ``QPInteriorPointParams(
kkt_solver="pallas_ldlt")`` composes transparently with ``vmap``/``jit``.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from . import kkt as kkt_ops

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

_LANE_BLOCK = 256  # batch instances per grid step (multiple of 128)


def _ldlt_kernel(h_ref, l_ref, d_ref):
    """Factor H = L diag(d) L^T for a (D, D, BB) tile, batch on lanes.

    Columns are written straight into the output refs and read back for later
    columns (static slices only -- Mosaic has no scatter; `.at[].set` on
    values is off-limits in TPU kernels).
    """
    D = h_ref.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (D, 1), 0)  # (D, 1)
    for j in range(D):
        if j == 0:
            c = h_ref[:, 0, :]  # (D, BB)
        else:
            # c = H[:, j] - sum_{k<j} L[:, k] * d[k] * L[j, k]
            L_prev = l_ref[:, :j, :]  # (D, j, BB)
            w = d_ref[:j, :] * l_ref[j, :j, :]  # (j, BB)
            c = h_ref[:, j, :] - jnp.sum(L_prev * w[None, :, :], axis=1)
        dj = c[j : j + 1, :]  # (1, BB)
        col = jnp.where(rows > j, c / dj, jnp.where(rows == j, 1.0, 0.0))
        l_ref[:, j, :] = col
        d_ref[j : j + 1, :] = dj


def _solve_kernel(l_ref, d_ref, rhs_ref, x_ref):
    """Solve L diag(d) L^T x = rhs for a (D, BB) tile of rhs.

    2-D (1, BB) row slices throughout; x_ref doubles as the working buffer
    for both substitution sweeps.
    """
    D = l_ref.shape[0]
    # Forward substitution with unit-lower L: y[j] = rhs[j] - L[j,:j] @ y[:j]
    for j in range(D):
        acc = rhs_ref[j : j + 1, :]  # (1, BB)
        if j > 0:
            acc = acc - jnp.sum(l_ref[j, :j, :] * x_ref[:j, :], axis=0, keepdims=True)
        x_ref[j : j + 1, :] = acc
    # Scale by 1/d.
    x_ref[:, :] = x_ref[:, :] / d_ref[:, :]
    # Backward substitution with L^T: x[j] = y[j] - L[j+1:, j] @ x[j+1:]
    for j in range(D - 2, -1, -1):
        acc = x_ref[j : j + 1, :] - jnp.sum(
            l_ref[j + 1 :, j, :] * x_ref[j + 1 :, :], axis=0, keepdims=True
        )
        x_ref[j : j + 1, :] = acc


def _pad_batch(x, b_pad, fill=0.0):
    pad = [(0, b_pad - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad, constant_values=fill)


@functools.partial(jax.jit, static_argnames=())
def _batched_factorize(H):
    """H (B, D, D) -> (L (B, D, D), d (B, D), ok (B,))."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, D, _ = H.shape
    bb = min(_LANE_BLOCK, -(-max(B, 1) // 128) * 128)
    b_pad = -(-B // bb) * bb
    # Pad with identity systems so the padded lanes stay finite.
    H_p = _pad_batch(H, b_pad)
    eye = jnp.eye(D, dtype=H.dtype)
    mask = (jnp.arange(b_pad) < B)[:, None, None]
    H_p = jnp.where(mask, H_p, eye[None])
    Ht = jnp.moveaxis(H_p, 0, -1)  # (D, D, b_pad)

    grid = (b_pad // bb,)
    L_t, d_t = pl.pallas_call(
        _ldlt_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((D, D, bb), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        ],
        out_specs=[
            pl.BlockSpec((D, D, bb), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, bb), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((D, D, b_pad), H.dtype),
            jax.ShapeDtypeStruct((D, b_pad), H.dtype),
        ],
        interpret=_interpret(),
    )(Ht)
    L = jnp.moveaxis(L_t, -1, 0)[:B]
    d = jnp.moveaxis(d_t, -1, 0)[:B]
    ok = jnp.all(jnp.isfinite(L), axis=(1, 2)) & jnp.all(
        jnp.abs(d) > jnp.finfo(H.dtype).tiny, axis=1
    )
    return L, d, ok


@functools.partial(jax.jit, static_argnames=())
def _batched_solve(L, d, rhs):
    """(B, D, D), (B, D), (B, D) -> x (B, D)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, D, _ = L.shape
    bb = min(_LANE_BLOCK, -(-max(B, 1) // 128) * 128)
    b_pad = -(-B // bb) * bb
    eye = jnp.eye(D, dtype=L.dtype)
    mask = (jnp.arange(b_pad) < B)[:, None, None]
    L_p = jnp.where(mask, _pad_batch(L, b_pad), eye[None])
    d_p = jnp.where(mask[:, :, 0], _pad_batch(d, b_pad), 1.0)
    r_p = _pad_batch(rhs, b_pad)

    grid = (b_pad // bb,)
    x_t = pl.pallas_call(
        _solve_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((D, D, bb), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, bb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, bb), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (D, bb), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((D, b_pad), L.dtype),
        interpret=_interpret(),
    )(
        jnp.moveaxis(L_p, 0, -1),
        jnp.moveaxis(d_p, 0, -1),
        jnp.moveaxis(r_p, 0, -1),
    )
    return jnp.moveaxis(x_t, -1, 0)[:B]


# ---------------------------------------------------------------------------
# custom_vmap wrappers: scalar call -> jnp recurrence; vmapped -> one kernel.
# ---------------------------------------------------------------------------


@jax.custom_batching.custom_vmap
def _factorize_cv(H):
    (L, d), ok = kkt_ops.ldlt_factorize(H)
    return L, d, ok


@_factorize_cv.def_vmap
def _factorize_vmap_rule(axis_size, in_batched, H):
    del axis_size
    (h_batched,) = in_batched
    assert h_batched, "H must be batched in the vmapped call"
    L, d, ok = _batched_factorize(H)
    return (L, d, ok), (True, True, True)


@jax.custom_batching.custom_vmap
def _solve_cv(L, d, rhs):
    return kkt_ops.ldlt_solve((L, d), rhs)


@_solve_cv.def_vmap
def _solve_vmap_rule(axis_size, in_batched, L, d, rhs):
    lb, db, rb = in_batched
    if not lb:
        L = jnp.broadcast_to(L, (axis_size,) + L.shape)
    if not db:
        d = jnp.broadcast_to(d, (axis_size,) + d.shape)
    if not rb:
        rhs = jnp.broadcast_to(rhs, (axis_size,) + rhs.shape)
    return _batched_solve(L, d, rhs), True


def factorize(H):
    """ops.kkt interface: returns ((L, d), ok)."""
    L, d, ok = _factorize_cv(H)
    return (L, d), ok


def solve(fact, rhs):
    L, d = fact
    return _solve_cv(L, d, rhs)
