"""Block-tridiagonal (spanning-chain) preconditioner kernels.

The matrix-free CG Gauss-Newton path (nonlinear.py ``qp_solver="cg"``) spends
its iterations fighting the long-range coupling of chain-structured graphs:
on a cycle graph the Jacobi-preconditioned system has condition number
O(N^2), so the 1200-pose benchmark costs ~hundreds of CG iterations per
linear solve. The classic SLAM remedy is a spanning-tree preconditioner
(Dellaert et al., "Subgraph preconditioners"): solve the chain part of the
Hessian EXACTLY and let CG handle only the loop-closure corrections.

For pose graphs whose spanning tree is the odometry chain (pose i <-> pose
i+1 — the layout of every sequential SLAM dataset), the tree Hessian is
symmetric block-tridiagonal with small d x d blocks (d = 3 for SE(2), 6 for
SE(3), 2 for the chordal relaxations). This module provides the TPU-native
factor/apply pair:

* ``block_tridiag_factor`` — block LDL^T by a sequential ``lax.scan`` over
  the N blocks (tiny d x d bodies; runs ONCE per outer Gauss-Newton
  iteration). Inner factorization reuses the TPU-safe unrolled LDL^T of
  ops/kkt.py (no lu_factor — see CLAUDE.md on the memory_space_assignment
  compiler crash).
* ``block_tridiag_apply`` — the M^-1 r solve via THREE O(log N)-depth
  ``lax.associative_scan`` passes (forward substitution, block-diagonal
  scale, backward substitution), each substitution being an affine
  recurrence x_i = A_i x_{i-1} + b_i composed associatively. This runs
  twice per CG iteration, so its depth — not the factorization's — sets the
  preconditioner's cost; associative scan keeps it logarithmic where the
  reference-style sequential sweep would be O(N).

The preconditioner matrix is the block-tridiagonal PART of the full
Gauss-Newton Hessian: chain edges contribute their full 2x2-block outer
products, off-chain (loop-closure) edges contribute their two diagonal
blocks only. This dominates plain (scalar) Jacobi — it is exact on path
graphs (chains), in any labeling once ``spanning_chain_order`` has run; on
branching trees only the DFS first-child runs are captured in full, the
remaining tree edges diagonally.

No reference analog: the reference is dense-only (README.md:35-38) and
solves N<=12 problems; preconditioning structure is a pure scale-out
concern of this rebuild.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .kkt import ldlt_factorize, ldlt_solve


class TreeFactor(NamedTuple):
    """Factored block-tridiagonal preconditioner H_tree = L D L^T.

    Dinv: (N, d, d) inverses of the Schur diagonal blocks D_i.
    G:    (N-1, d, d) forward factors G_i = U_{i-1}^T D_{i-1}^{-1}
          (the (i, i-1) block of unit-lower L).
    U:    (N-1, d, d) upper blocks of H_tree (block (i, i+1)).
    ok:   scalar bool — every diagonal block factorized (SPD up to the
          caller's damping floor).
    """

    Dinv: jax.Array
    G: jax.Array
    U: jax.Array
    ok: jax.Array


def block_tridiag_factor(Hd: jax.Array, Hu: jax.Array) -> TreeFactor:
    """Block LDL^T of the symmetric block-tridiagonal matrix with diagonal
    blocks ``Hd`` (N, d, d) and upper blocks ``Hu`` (N-1, d, d).

    Sequential recurrence D_i = Hd_i - Hu_{i-1}^T D_{i-1}^{-1} Hu_{i-1}
    (a matrix continued fraction — not associative), run as one
    ``lax.scan`` of tiny d x d bodies; executed once per outer iteration,
    while the solve side is log-depth (``block_tridiag_apply``)."""
    n, d, _ = Hd.shape
    eye = jnp.eye(d, dtype=Hd.dtype)

    def inv(block):
        (L, dvec), ok = ldlt_factorize(block)
        # ldlt_factorize's ok only guards nonzero pivots (it factors
        # indefinite matrices happily); a CG preconditioner must be SPD,
        # so require strictly positive pivots too.
        spd = jnp.logical_and(ok, jnp.all(dvec > 0))
        return ldlt_solve((L, dvec), eye), spd

    Dinv0, ok0 = inv(Hd[0])
    if n == 1:
        return TreeFactor(
            Dinv=Dinv0[None], G=jnp.zeros((0, d, d), Hd.dtype),
            U=Hu, ok=ok0,
        )

    def body(carry, inputs):
        Dinv_prev, ok_prev = carry
        H_ii, U_prev = inputs
        G_i = U_prev.T @ Dinv_prev
        D_i = H_ii - G_i @ U_prev
        Dinv_i, ok_i = inv(D_i)
        return (Dinv_i, jnp.logical_and(ok_prev, ok_i)), (Dinv_i, G_i)

    (_, ok), (Dinv_rest, G) = jax.lax.scan(
        body, (Dinv0, ok0), (Hd[1:], Hu)
    )
    Dinv = jnp.concatenate([Dinv0[None], Dinv_rest], axis=0)
    return TreeFactor(Dinv=Dinv, G=G, U=Hu, ok=ok)


def _affine_scan(A: jax.Array, b: jax.Array) -> jax.Array:
    """x_i = A_i x_{i-1} + b_i with x_{-1} = 0, by associative scan.

    A: (N, d, d) with A_0 ignored (forced to 0); b: (N, d)."""
    A = A.at[0].set(jnp.zeros_like(A[0]))

    def combine(left, right):
        A1, b1 = left
        A2, b2 = right
        return A2 @ A1, (A2 @ b1[..., None])[..., 0] + b2

    _, x = jax.lax.associative_scan(combine, (A, b))
    return x


def block_tridiag_apply(fact: TreeFactor, r: jax.Array) -> jax.Array:
    """Solve H_tree x = r given the factor; r and the result are (N, d).

    Three log-depth passes: L y = r (forward affine recurrence
    y_i = r_i - G_i y_{i-1}), z = D^{-1} y, L^T x = z (backward recurrence
    x_i = z_i - D_i^{-1} U_i x_{i+1}, run as a forward scan on the flipped
    sequence)."""
    n = r.shape[0]
    if n == 1:
        return (fact.Dinv[0] @ r[0])[None]

    # forward: y_i = -G_i y_{i-1} + r_i   (G defined for i = 1..N-1)
    Af = jnp.concatenate([jnp.zeros_like(fact.G[:1]), -fact.G], axis=0)
    y = _affine_scan(Af, r)

    z = jnp.einsum("nij,nj->ni", fact.Dinv, y)

    # backward: x_i = -(Dinv_i U_i) x_{i+1} + z_i   (i = N-2 .. 0)
    DU = jnp.einsum("nij,njk->nik", fact.Dinv[:-1], fact.U)
    Ab = jnp.concatenate([jnp.zeros_like(DU[:1]), -jnp.flip(DU, axis=0)], axis=0)
    x_rev = _affine_scan(Ab, jnp.flip(z, axis=0))
    return jnp.flip(x_rev, axis=0)


def spanning_chain_order(
    block_pairs: np.ndarray, n_blocks: int, root: int = 0
) -> np.ndarray:
    """Host-side DFS preorder of a spanning tree of the block graph.

    ``block_pairs`` is an (E, 2) integer array of block-index endpoints.
    Returns ``perm`` with ``perm[p] = block id visited at position p``:
    relabeling blocks by their position makes every first-child tree edge
    consecutive, so the block-tridiagonal preconditioner captures the
    spanning chain of ANY graph layout, not just consecutive-pose SLAM
    orderings. DFS preorder (not BFS) is used precisely because it walks
    each tree branch as an unbroken run of consecutive positions; only
    branching points (edges to second/later children) and loop closures
    fall back to diagonal-only coverage. On a graph that already contains
    the consecutive chain (i, i+1) this returns the identity. Disconnected
    components are laid out back to back (the zero coupling block between
    them keeps the factor exact there). Each component starts at its
    lowest-index degree-1 vertex when one exists (``root`` wins the
    tie-break in its component): starting mid-path would split that path
    into two non-adjacent runs and lose half the chain coverage."""
    pairs = {
        (min(ia, ib), max(ia, ib))
        for ia, ib in np.asarray(block_pairs, dtype=np.int64).tolist()
        if ia != ib
    }
    if all((i, i + 1) in pairs for i in range(n_blocks - 1)):
        return np.arange(n_blocks, dtype=np.int32)  # consecutive chain present

    adj: list[set[int]] = [set() for _ in range(n_blocks)]
    for ia, ib in pairs:
        adj[ia].add(ib)
        adj[ib].add(ia)
    seen = np.zeros(n_blocks, dtype=bool)
    perm: list[int] = []
    for r0 in [root] + [i for i in range(n_blocks) if i != root]:
        if seen[r0]:
            continue
        # Discover the component, then restart its DFS from a leaf if any.
        comp, frontier = {r0}, [r0]
        while frontier:
            u = frontier.pop()
            for v in adj[u]:
                if v not in comp:
                    comp.add(v)
                    frontier.append(v)
        leaves = sorted(v for v in comp if len(adj[v]) == 1)
        start = (
            r0
            if (not leaves or (r0 in leaves))
            else leaves[0]
        )
        stack = [start]
        while stack:
            u = stack.pop()
            if seen[u]:
                continue
            seen[u] = True
            perm.append(u)
            # Reverse-sorted push -> lowest-index unvisited neighbor is
            # visited next (deterministic output).
            for v in sorted(adj[u], reverse=True):
                if not seen[v]:
                    stack.append(v)
    return np.asarray(perm, dtype=np.int32)


def chain_block_hessian(
    residual_fn: Callable,
    x: jax.Array,
    idx: jax.Array,  # (E, 2*dof) int32 variable indices (two dof-blocks)
    data: jax.Array,  # (E, k) per-edge data rows
    n_blocks: int,
    dof: int,
    block_map: jax.Array | None = None,  # (N,) old block id -> position
):
    """Block-tridiagonal part of the Gauss-Newton Hessian of one
    BlockResidual edge set whose rows touch exactly two ``dof``-sized,
    block-aligned variable groups (the pose-graph layout).

    Chain edges (|block_i - block_j| == 1, in ``block_map`` order when one
    is given) contribute their full four blocks; all other edges contribute
    their two diagonal blocks only.
    Returns (Hd (N, d, d), Hu (N-1, d, d)) in position order."""
    bi = idx[:, 0] // dof  # (E,)
    bj = idx[:, dof] // dof
    if block_map is not None:
        bi = block_map[bi]
        bj = block_map[bj]

    def one(row_idx, row_data):
        xl = x[row_idx]
        J = jax.jacfwd(lambda v: residual_fn(v, row_data))(xl)  # (rdim, 2*dof)
        A = J[:, :dof]
        B = J[:, dof:]
        return A.T @ A, B.T @ B, A.T @ B

    AtA, BtB, AtB = jax.vmap(one)(idx, data)  # (E, d, d) each

    Hd = jnp.zeros((n_blocks, dof, dof), x.dtype)
    Hd = Hd.at[bi].add(AtA).at[bj].add(BtB)

    is_fwd = (bj == bi + 1)[:, None, None]
    is_rev = (bi == bj + 1)[:, None, None]
    pos_f = jnp.clip(bi, 0, n_blocks - 2)
    pos_r = jnp.clip(bj, 0, n_blocks - 2)
    Hu = jnp.zeros((n_blocks - 1, dof, dof), x.dtype)
    Hu = Hu.at[pos_f].add(jnp.where(is_fwd, AtB, jnp.zeros_like(AtB)))
    Hu = Hu.at[pos_r].add(
        jnp.where(is_rev, jnp.swapaxes(AtB, 1, 2), jnp.zeros_like(AtB))
    )
    return Hd, Hu


def make_chain_tree_preconditioner(
    residual_fn: Callable,
    idx: jax.Array,
    data: jax.Array,
    n_blocks: int,
    dof: int,
    anchor_block: jax.Array | None = None,  # (d, d) added to block 0
    floor: float = 1e-12,
    order: np.ndarray | str | None = "auto",
    block_pairs: np.ndarray | None = None,  # (E, 2) host block endpoints
    axis_name: str | None = None,
):
    """Generic ``cg_preconditioner`` factory over one two-block-per-row edge
    set (SE(2)/SE(3) pose graphs share it, as do the chordal relaxation
    stages). ``anchor_block`` carries the gauge prior's J^T J (block 0);
    ``lam`` from the solver plus ``floor`` damp every diagonal block, so the
    factorization stays SPD whenever the chain is connected.

    ``order`` selects the block ordering the tridiagonal factor follows:
    ``"auto"`` (default) runs ``spanning_chain_order`` on the host over the
    concrete edge set — arbitrary (non-consecutive) graph layouts get their
    spanning chain captured with no caller involvement, and graphs whose
    chain is already consecutive skip the permutation entirely; ``None``
    forces the raw index order; an explicit (N,) permutation array uses
    that. The permutation indices are compile-time constants, so the gathers
    they introduce are static (no traced-index scatters — see CLAUDE.md).
    Under an enclosing ``jit`` trace ``idx`` slices stage to tracers
    (omnistaging), so pass the host-side ``block_pairs`` (E, 2) explicitly
    there — the pose-graph factories do.

    ``axis_name`` makes the factory DISTRIBUTED: ``idx``/``data`` are the
    device-local edge shard, and the (N, d, d) tridiagonal blocks are
    psum-reduced over the mesh axis before the (replicated, O(N)-cheap)
    factorization — matching the edge-partitioned matrix-free solvers,
    where x and the CG iterates are replicated. ``block_pairs`` must then
    be the GLOBAL edge set so every device agrees on the ordering."""
    if isinstance(order, str):
        assert order == "auto", order
        if block_pairs is not None:
            bp = np.asarray(block_pairs, dtype=np.int64)
        elif isinstance(idx, jax.core.Tracer):
            raise ValueError(
                "order='auto' inside a jit trace needs the concrete "
                "block_pairs (or an explicit order / order=None)"
            )
        else:
            idx_np = np.asarray(idx)
            bp = np.stack(
                [idx_np[:, 0] // dof, idx_np[:, dof] // dof], axis=1
            )
        order_np = spanning_chain_order(bp, n_blocks)
        if np.array_equal(order_np, np.arange(n_blocks, dtype=np.int32)):
            order_np = None
    elif order is None:
        order_np = None
    else:
        order_np = np.asarray(order, dtype=np.int32)
        assert order_np.shape == (n_blocks,)

    if order_np is None:
        perm = iperm = None
        block_map = None
        anchor_pos = 0
    else:
        perm = jnp.asarray(order_np)  # position -> old block id
        inv = np.empty(n_blocks, dtype=np.int32)
        inv[order_np] = np.arange(n_blocks, dtype=np.int32)
        iperm = jnp.asarray(inv)  # old block id -> position
        block_map = iperm
        anchor_pos = int(inv[0])

    eye = None

    def prec_fn(x, lam):
        nonlocal eye
        if eye is None or eye.dtype != x.dtype:
            eye = jnp.eye(dof, dtype=x.dtype)
        Hd, Hu = chain_block_hessian(
            residual_fn, x, idx, data, n_blocks, dof, block_map=block_map
        )
        if axis_name is not None:
            Hd = jax.lax.psum(Hd, axis_name)
            Hu = jax.lax.psum(Hu, axis_name)
        if anchor_block is not None:
            Hd = Hd.at[anchor_pos].add(anchor_block.astype(x.dtype))
        Hd = Hd + (lam + jnp.asarray(floor, x.dtype)) * eye
        fact = block_tridiag_factor(Hd, Hu)

        def apply(r):
            rb = r.reshape(n_blocks, dof)
            if perm is not None:
                rb = rb[perm]
            xb = block_tridiag_apply(fact, rb)
            if perm is not None:
                xb = xb[iperm]
            return xb.reshape(-1)

        return apply

    return prec_fn
