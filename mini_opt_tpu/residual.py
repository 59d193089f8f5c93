"""Residual layer: user cost functions and Gauss-Newton assembly.

TPU-native redesign of the reference residual abstraction
(/root/reference/include/mini_opt/residual.hpp:28-250). Differences by design:

* A residual is a **pure function** ``f(x_local) -> r`` plus a static tuple of
  global parameter indices -- no type erasure, no virtual dispatch. Jacobians
  come from ``jax.jacfwd`` by default (the reference requires hand-written
  Jacobians); a custom ``jac`` returning ``(r, J)`` may be supplied.
* Gather is ``x[index]``; the reference's scatter-add of ``J^T J`` into the
  lower-triangular global Hessian (residual.hpp:204-224) becomes a symmetric
  indexed add -- XLA fuses these into the surrounding linearization.
* ``BlockResidual`` is the scalable path with no reference analog: one
  function vmapped over ``B`` index rows, assembled with one segment
  scatter-add. This is what turns per-residual loops into batched einsums on
  the MXU.

Residual functions may close over traced arrays (targets, weights, ...) when
the Problem is built inside a jitted caller -- that is the JAX-native way to
thread per-instance data through a solve.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Residual:
    """One cost/constraint block: ``r = fn(x[index])`` with ``dim`` outputs.

    Static (not a pytree): hold it in Python structure, not in jit carries.

    Attributes:
      fn: pure function mapping local params ``(P,)`` to residual ``(dim,)``.
      index: global indices of the P parameters this block touches.
      dim: residual dimension R.
      jac: optional custom linearization ``x_local -> (r, J)`` with J of shape
        ``(dim, P)``; defaults to ``jax.jacfwd(fn)``.
    """

    fn: Callable[[jax.Array], jax.Array]
    index: Tuple[int, ...]
    dim: int
    jac: Optional[Callable[[jax.Array], Tuple[jax.Array, jax.Array]]] = None

    def gather(self, x: jax.Array) -> jax.Array:
        """GatherValues analog (residual.hpp:150-163)."""
        return x[jnp.array(self.index, dtype=jnp.int32)]

    def error_vector(self, x: jax.Array) -> jax.Array:
        """h(x) for this block (residual.hpp:175-180)."""
        return self.fn(self.gather(x))

    def error_and_jacobian(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """(r, J) with J in local coordinates, shape (dim, P)."""
        xl = self.gather(x)
        if self.jac is not None:
            return self.jac(xl)
        r = self.fn(xl)
        J = jax.jacfwd(self.fn)(xl)
        return r, J.reshape(self.dim, len(self.index))

    def quadratic_error(self, x: jax.Array) -> jax.Array:
        """0.5 * ||h(x)||^2 (residual.cc:6-11)."""
        r = self.error_vector(x)
        return 0.5 * jnp.sum(r * r)


def make_residual(
    index: Sequence[int],
    fn: Callable[[jax.Array], jax.Array],
    dim: int,
    jac: Optional[Callable] = None,
) -> Residual:
    """MakeResidual analog (residual.hpp:121-143)."""
    return Residual(fn=fn, index=tuple(int(i) for i in index), dim=int(dim), jac=jac)


@dataclasses.dataclass(frozen=True)
class BlockResidual:
    """B homogeneous residual blocks sharing one function.

    ``indices`` has shape (B, P): row b gives the global indices of block b.
    The function is vmapped over blocks; assembly is one batched
    scatter-add. This is the TPU-scalable replacement for a Python list of
    thousands of identical residuals.
    """

    fn: Callable[[jax.Array, jax.Array], jax.Array]  # (x_local, data_row) -> r
    # (B, P): static nested tuples, or an int32 array (possibly traced --
    # required when blocks are sharded across devices with shard_map).
    indices: object
    dim: int
    data: Optional[jax.Array] = None  # (B, ...) per-block payload, traced OK

    def _idx(self) -> jax.Array:
        if isinstance(self.indices, tuple):
            return jnp.array(self.indices, dtype=jnp.int32)
        return jnp.asarray(self.indices, dtype=jnp.int32)

    @property
    def num_blocks(self) -> int:
        if isinstance(self.indices, tuple):
            return len(self.indices)
        return self.indices.shape[0]

    def _data_rows(self):
        if self.data is None:
            return jnp.zeros((self.num_blocks, 0))
        return self.data

    def error_vectors(self, x: jax.Array) -> jax.Array:
        """All residuals stacked, shape (B, dim)."""
        xl = x[self._idx()]  # (B, P)
        return jax.vmap(self.fn)(xl, self._data_rows())

    def errors_and_jacobians(self, x: jax.Array):
        idx = self._idx()
        xl = x[idx]

        def one(xloc, drow):
            r = self.fn(xloc, drow)
            J = jax.jacfwd(lambda v: self.fn(v, drow))(xloc)
            return r, J.reshape(self.dim, idx.shape[1])

        r, J = jax.vmap(one)(xl, self._data_rows())
        return r, J  # (B, R), (B, R, P)


# ---------------------------------------------------------------------------
# Assembly: scatter residual linearizations into the global system.
# ---------------------------------------------------------------------------


def accumulate_hessian(
    G: jax.Array, c: jax.Array, res: Residual, x: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """UpdateHessian analog (residual.hpp:185-226): adds J^T J into G and
    J^T r into c. Returns (G, c, 0.5*||r||^2)."""
    r, J = res.error_and_jacobian(x)
    idx = jnp.array(res.index, dtype=jnp.int32)
    JtJ = J.T @ J
    Jtr = J.T @ r
    G = G.at[jnp.ix_(idx, idx)].add(JtJ)
    c = c.at[idx].add(Jtr)
    return G, c, 0.5 * jnp.sum(r * r)


def accumulate_hessian_block(
    G: jax.Array, c: jax.Array, block: BlockResidual, x: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batched accumulation of B block linearizations.

    TPU-first: the per-block index maps become one-hot matrices (built by
    iota-compare) and the global Gauss-Newton accumulation becomes two MXU
    matmuls -- `G += O_b^T JtJ_b O_b` summed over blocks -- instead of a
    scatter-add (traced-index scatters both lower poorly on TPU and trigger
    an XLA memory-space-assignment compiler crash inside solver loops)."""
    r, J = block.errors_and_jacobians(x)  # (B,R), (B,R,P)
    idx = block._idx()  # (B, P)
    n = G.shape[-1]
    JtJ = jnp.einsum("brp,brq->bpq", J, J)
    Jtr = jnp.einsum("brp,br->bp", J, r)
    onehot = (
        jnp.arange(n, dtype=idx.dtype)[None, None, :] == idx[:, :, None]
    ).astype(G.dtype)  # (B, P, N)
    G = G + jnp.einsum("bpn,bpq,bqm->nm", onehot, JtJ, onehot)
    c = c + jnp.einsum("bpn,bp->n", onehot, Jtr)
    return G, c, 0.5 * jnp.sum(r * r)


def fill_jacobian_rows(
    A: jax.Array, b: jax.Array, res: Residual, x: jax.Array, row: int
) -> Tuple[jax.Array, jax.Array]:
    """UpdateJacobian analog (residual.hpp:229-250): writes this block's
    linearization into rows [row, row+dim) of the global (A, b). Accepts a
    BlockResidual too: its ``num_blocks * dim`` rows land consecutively
    (block-major), assembled by one one-hot einsum instead of a scatter."""
    if isinstance(res, BlockResidual):
        r, J = res.errors_and_jacobians(x)  # (B, R), (B, R, P)
        idx = res._idx()  # (B, P)
        n = A.shape[-1]
        onehot = (
            jnp.arange(n, dtype=idx.dtype)[None, None, :] == idx[:, :, None]
        ).astype(A.dtype)  # (B, P, N)
        rows = jnp.einsum("brp,bpn->brn", J, onehot)
        k = res.num_blocks * res.dim
        A = A.at[row : row + k, :].set(rows.reshape(k, n))
        b = b.at[row : row + k].set(r.reshape(k))
        return A, b
    r, J = res.error_and_jacobian(x)
    idx = jnp.array(res.index, dtype=jnp.int32)
    A = A.at[row : row + res.dim, idx].set(J)
    b = b.at[row : row + res.dim].set(r)
    return A, b


def constraint_rows(res) -> int:
    """Total equality rows contributed by a Residual or BlockResidual."""
    if isinstance(res, BlockResidual):
        return res.num_blocks * res.dim
    return res.dim


# ---------------------------------------------------------------------------
# Robust loss kernels (no reference analog -- mini_opt is pure least squares,
# README.md:6-10; production pose graphs need outlier-tolerant edges).
# ---------------------------------------------------------------------------


def _robust_rescale(r: jax.Array, kind: str, delta: float) -> jax.Array:
    """Rescale a residual so plain least squares on the result equals the
    robust loss exactly: with s = 0.5||r||^2, returns r~ = r * sqrt(rho(s)/s),
    giving 0.5||r~||^2 == rho(s). Autodiff of r~ then yields exact robust
    Jacobians -- no IRLS loop, works on every solver path (dense assembly,
    matrix-free jvp/vjp, implicit diff).

    Kinds (delta = transition scale in residual-NORM units):
      huber:  rho = s                      for ||r|| <= delta
              rho = delta*||r|| - delta^2/2 beyond (linear growth)
      cauchy: rho = (delta^2/2) * log1p(2 s / delta^2)  (logarithmic growth)

    Floors follow the quat_log lesson: norms at exactly 0 have NaN
    reverse-mode derivatives through the DISCARDED where-branch, so every
    sqrt/division is tiny-floored.
    """
    dtype = r.dtype
    # Floor at eps*delta^2, NOT finfo.tiny: the vjp of 1/s_safe evaluates
    # -1/s_safe^2, which OVERFLOWS to inf at the denormal floor and turns
    # into 0*inf = NaN through the maximum()'s zero gradient. eps*delta^2 is
    # still deep inside the exact-identity regime (s <= eps*delta^2 implies
    # the quadratic branch), so values are unchanged.
    eps = jnp.finfo(dtype).eps * delta * delta
    # axis=0 (the residual-row axis), NOT a full reduction: on the general
    # path r is (dim,) so this is the same scalar, while on the fused
    # compiler's (dim, 8, 128) register stacks (ops/fused_auto.py) it keeps
    # one s per lane instead of contaminating 1024 instances. All following
    # scales broadcast over the trailing lane dims either way.
    s = 0.5 * jnp.sum(r * r, axis=0)
    s_safe = jnp.maximum(s, eps)
    if kind == "huber":
        a = jnp.sqrt(2.0 * s_safe)  # ||r||
        small = a <= delta
        rho = jnp.where(small, s, delta * a - 0.5 * delta * delta)
        ratio = jnp.where(small, 1.0, rho / s_safe)  # rho/s
        drho = jnp.where(small, 1.0, delta / a)  # rho'(s)
    elif kind == "cauchy":
        u = 2.0 * s / (delta * delta)
        u_safe = jnp.maximum(u, 2.0 * jnp.finfo(dtype).eps)
        tiny_u = u <= 2.0 * jnp.finfo(dtype).eps
        ratio = jnp.where(tiny_u, 1.0 - u / 2.0, jnp.log1p(u_safe) / u_safe)
        drho = 1.0 / (1.0 + u)
    else:
        raise ValueError(f"unknown robust kind: {kind!r}")
    # Two frozen scales (Ceres-equivalent semantics):
    #   VALUE scale s1 = sqrt(rho/s): 0.5||r~||^2 == rho(s) exactly, so the
    #     line-search merit and every recorded cost is the true robust loss.
    #   JACOBIAN scale s2 = rho'/s1: autodiff of the second term gives
    #     J~ = s2 J, so the assembled Gauss-Newton gradient J~^T r~ =
    #     s1 s2 J^T r = rho' J^T r -- the EXACT robust gradient -- with a
    #     PSD model G = s2^2 J^T J.
    # Both scales are stop_gradient'd: differentiating through them (full
    # Triggs-style second-order correction) makes the GN model indefinite
    # for gross outliers and stalls the solver (measured); freezing them is
    # standard practice.
    s1 = jnp.sqrt(ratio)
    s2 = drho / jnp.maximum(s1, jnp.finfo(dtype).eps)
    return jax.lax.stop_gradient((s1 - s2) * r) + jax.lax.stop_gradient(s2) * r


def robustify(block, kind: str = "huber", delta: float = 1.0):
    """Wrap a Residual or BlockResidual in a robust loss kernel.

    The wrapped block is a drop-in replacement whose Gauss-Newton cost is
    exactly ``rho(0.5 ||r||^2)`` per block -- below the ``delta`` transition
    it is bit-identical to the unwrapped block; beyond it, the residual's
    influence grows linearly (huber) or logarithmically (cauchy) instead of
    quadratically, so outlier edges cannot drag the solution. A custom
    ``jac`` on the wrapped Residual is dropped (jacfwd of the rescaled
    function is exact).
    """
    _robust_rescale  # (closure capture for clarity)
    if isinstance(block, Residual):
        base = block.fn

        def fn(xl):
            return _robust_rescale(base(xl), kind, delta)

        return Residual(fn=fn, index=block.index, dim=block.dim, jac=None)
    if isinstance(block, BlockResidual):
        base_b = block.fn

        def fnb(xl, row):
            return _robust_rescale(base_b(xl, row), kind, delta)

        return BlockResidual(
            fn=fnb, indices=block.indices, dim=block.dim, data=block.data
        )
    raise TypeError(f"robustify expects Residual or BlockResidual, got {type(block)}")
