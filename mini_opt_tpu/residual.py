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
    linearization into rows [row, row+dim) of the global (A, b)."""
    r, J = res.error_and_jacobian(x)
    idx = jnp.array(res.index, dtype=jnp.int32)
    A = A.at[row : row + res.dim, idx].set(J)
    b = b.at[row : row + res.dim].set(r)
    return A, b
