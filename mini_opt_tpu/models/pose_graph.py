"""Second model family: 2-D pose-graph optimization (SLAM-style).

No analog in the reference's test tree (which is kinematics-only); this
family demonstrates the framework on a different problem shape: many poses
(N = 3 * n_poses variables), a large homogeneous set of relative-pose
residuals expressed as ONE BlockResidual (odometry + loop closures), an
anchor prior, and the angle-wrap retraction on every heading variable.
Assembly runs through the one-hot MXU path; the problem vmaps over graph
batches and partitions its edge set across a mesh axis like any other
BlockResidual problem.

Pose i = (x_i, y_i, theta_i). Edge (i, j) with measurement (dx, dy, dtheta)
in frame i contributes the residual

    r = [ R(theta_i)^T (t_j - t_i) - (dx, dy) ;  wrap(theta_j - theta_i - dtheta) ]

weighted per-edge.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..nonlinear import NLSParams, Problem, nls_solve
from ..residual import BlockResidual, make_residual
from ..structs import LineSearchStrategy, NLSResult
from ..utils import so3


def _wrap(a):
    return so3.mod_pi(a)


def _edge_residual(xl, row):
    """Relative-pose residual of one edge; xl = (xi, yi, thi, xj, yj, thj),
    row = (dx, dy, dtheta, w0, w1, w2)."""
    xi, yi, thi, xj, yj, thj = xl[0], xl[1], xl[2], xl[3], xl[4], xl[5]
    meas, w = row[:3], row[3:]
    c, s = jnp.cos(thi), jnp.sin(thi)
    dx_w = xj - xi
    dy_w = yj - yi
    # world -> frame i
    rx = c * dx_w + s * dy_w
    ry = -s * dx_w + c * dy_w
    rt = _wrap(thj - thi - meas[2])
    return w * jnp.stack([rx - meas[0], ry - meas[1], rt])


def _edge_data(measurements, weights):
    if weights.ndim == 1:
        weights = weights[:, None] * jnp.ones((1, 3), weights.dtype)
    return jnp.concatenate([measurements, weights], axis=1)  # (E, 6)


def _edge_indices(edges_ij):
    import numpy as np

    edges = np.asarray(edges_ij, dtype=np.int64)
    return tuple(
        tuple(
            int(v)
            for v in (3 * i, 3 * i + 1, 3 * i + 2, 3 * j, 3 * j + 1, 3 * j + 2)
        )
        for i, j in edges
    )


def make_pose_graph_problem(
    n_poses: int,
    edges_ij,  # (E, 2) int array-like: (i, j) pose indices per edge
    measurements: jax.Array,  # (E, 3): (dx, dy, dtheta) in frame i
    weights: jax.Array,  # (E,) or (E, 3)
    anchor_weight: float = 100.0,
    hard_anchor: bool = False,
    robust: Optional[str] = None,  # "huber" | "cauchy" on the edge residuals
    robust_delta: float = 1.0,
) -> Problem:
    """Build the pose-graph Problem. Pose p occupies variables
    [3p, 3p+1, 3p+2]. Pose 0 fixes the gauge: softly (a weighted prior cost,
    default) or exactly (``hard_anchor=True``: a 3-row equality constraint,
    solved by the projected-CG path when ``qp_solver='cg'``). ``robust``
    wraps every edge in a robust loss kernel (residual.robustify) so outlier
    loop closures cannot drag the trajectory."""
    from ..residual import robustify

    data = _edge_data(measurements, weights)
    indices = _edge_indices(edges_ij)

    def anchor(xl):
        return anchor_weight * jnp.stack([xl[0], xl[1], _wrap(xl[2])])

    def gauge(xl):
        return jnp.stack([xl[0], xl[1], _wrap(xl[2])])

    block = BlockResidual(fn=_edge_residual, indices=indices, dim=3, data=data)
    if robust is not None:
        block = robustify(block, kind=robust, delta=robust_delta)
    if hard_anchor:
        return Problem(
            dimension=3 * n_poses,
            costs=(block,),
            equality_constraints=(make_residual([0, 1, 2], gauge, 3),),
        )
    return Problem(
        dimension=3 * n_poses,
        costs=(block, make_residual([0, 1, 2], anchor, 3)),
    )


def scalar_pose_graph_builder(n_poses, edges_ij, anchor_weight: float = 100.0):
    """``data -> Problem`` builder in the fused-kernel compiler's scalar
    style (ops/fused_auto.py): a whole small SE(2) pose graph as ONE fused
    Pallas kernel per 1024-instance register tile -- the BlockResidual class
    the round-3 compiler extension unlocked. Payload rows: the E edge
    measurements raveled, ``data[3e:3e+3] = (dx, dy, dtheta)`` of edge e
    (unit weights; the edge set and anchor are static). The general-path
    twin is ``make_pose_graph_problem`` with the same edges and soft anchor;
    tests pin register linearization and full solves against it."""
    indices = _edge_indices(edges_ij)
    E = len(indices)

    def builder(data):
        one = jnp.ones_like(data[0])
        rows = [
            jnp.stack(
                [data[3 * e], data[3 * e + 1], data[3 * e + 2], one, one, one]
            )
            for e in range(E)
        ]
        block = BlockResidual(
            fn=_edge_residual, indices=indices, dim=3, data=jnp.stack(rows)
        )

        def anchor(xl):
            return anchor_weight * jnp.stack([xl[0], xl[1], _wrap(xl[2])])

        return Problem(
            dimension=3 * n_poses,
            costs=(block, make_residual([0, 1, 2], anchor, 3)),
        )

    return builder


def ring_edges(n_poses: int):
    """Edge list of the canonical ring topology: the odometry chain
    (t, t+1) plus the loop closure (N-1, 0)."""
    return tuple((t, (t + 1) % n_poses) for t in range(n_poses))


def solve_pose_graph_rings(
    measurements: jax.Array,  # (B, E, 3) edge measurements (chain first)
    x0: jax.Array,  # (B, N, 3) initial poses
    anchor_weight: float = 100.0,
    max_iterations: int = 6,
    ls_iterations: int = 2,
    return_state: bool = False,
    backend: str = "pallas",
    closures=None,  # tuple of (from, to) pairs; None = canonical ring
):
    """Serving tier for BATCHES of N-pose chain-plus-closure graphs (unit
    edge weights, soft pose-0 anchor): dispatches the blocked bordered
    block-Thomas Pallas kernel (ops/pallas_pose_ring.py), the medium-N tier
    that replaces the register class's O((3N)^3) dense LDLT unroll (the
    fused family caps at N~8; the canonical N=16 ring runs at 51.2M
    graphs/s on-chip, 312x the general path). ``closures`` selects the
    topology: ``None`` is the canonical ring (chain + (N-1, 0)); one or
    more (from, to) pairs run the generalized border-set elimination.
    Edge order in ``measurements``: chain edges (t, t+1) for t < N-1, then
    the closures in declaration order (E = N-1 + len(closures)). Semantics
    are exactly ``make_pose_graph_problem(N, edges, ...)`` + ``nls_solve``
    at the matched fixed-trip budget (tests/test_pallas_pose_ring.py).

    Returns x (B, N, 3); with ``return_state`` also the per-lane (B, 3)
    (f, 0, flags) channel accepted by ``fused_termination_status``."""
    from ..ops.pallas_pose_ring import pose_ring_family, pose_ring_solve_batch

    if measurements.ndim != 3 or measurements.shape[-1] != 3:
        raise ValueError(
            f"measurements must have shape (B, E, 3); got {measurements.shape}"
        )
    B, E, _ = measurements.shape
    if x0.ndim != 3 or x0.shape[0] != B or x0.shape[-1] != 3:
        raise ValueError(
            f"x0 must have shape (B, N, 3) with B={B}; got {x0.shape}"
        )
    N = x0.shape[1]
    if closures is not None and len(closures) > 1:
        fam = pose_ring_family(
            N, anchor_weight=anchor_weight,
            closures=tuple(tuple(int(v) for v in c) for c in closures),
        )
    else:
        closure = tuple(int(v) for v in closures[0]) if closures else None
        fam = pose_ring_family(N, anchor_weight=anchor_weight, closure=closure)
    if E != fam.n_edges:
        raise ValueError(
            f"measurements carry {E} edges; topology needs {fam.n_edges} "
            f"(chain {N - 1} + closures {len(fam.closure_list)})"
        )
    res = pose_ring_solve_batch(
        fam,
        measurements.reshape(B, 3 * E),
        x0.reshape(B, 3 * N),
        max_iterations=max_iterations,
        ls_iterations=ls_iterations,
        return_state=return_state,
        backend=backend,
    )
    if return_state:
        x, state = res
        return x.reshape(B, N, 3), state
    return res.reshape(B, N, 3)


def edge_jtj_diag(residual_fn, x, idx, data):
    """Exact diag(JᵀJ) contribution of one edge-set BlockResidual: per-edge
    Jacobians squared and scatter-added at constant indices (block-sparse
    assembly of just the diagonal -- the Jacobi preconditioner of the
    matrix-free CG path). Shared by the SE(2)/SE(3) plain and sharded
    variants so the four preconditioners cannot drift apart."""

    def one(row_idx, row_data):
        xl = x[row_idx]
        J = jax.jacfwd(lambda v: residual_fn(v, row_data))(xl)  # (dim, 2*dof)
        return jnp.sum(J * J, axis=0)

    contrib = jax.vmap(one)(idx, data)  # (E, 2*dof)
    return jnp.zeros_like(x).at[idx.ravel()].add(contrib.ravel())


def make_jacobi_preconditioner(
    edges_ij,
    measurements: jax.Array,
    weights: jax.Array,
    anchor_weight: float = 100.0,
):
    """Jacobi preconditioner for the SE(2) pose-graph CG path."""
    import numpy as np

    data = _edge_data(measurements, weights)
    idx = jnp.asarray(
        np.asarray(_edge_indices(edges_ij), dtype=np.int32)
    )  # (E, 6)

    def diag_fn(x):
        d = edge_jtj_diag(_edge_residual, x, idx, data)
        d = d.at[:3].add(anchor_weight * anchor_weight)
        return jnp.maximum(d, jnp.asarray(1e-12, x.dtype))

    return diag_fn


def make_tree_preconditioner(
    n_poses: int,
    edges_ij,
    measurements: jax.Array,
    weights: jax.Array,
    anchor_weight: float = 100.0,
):
    """Spanning-chain block-tridiagonal preconditioner for the SE(2)
    pose-graph CG path (ops/tree_prec.py): the odometry chain's Hessian is
    solved exactly per CG iteration (log-depth associative-scan
    substitution), so CG only has to correct for loop closures — the
    standard subgraph-preconditioner upgrade over Jacobi for cycle-heavy
    graphs. Use with ``nls_solve(..., cg_preconditioner=...)`` or
    ``solve_pose_graph_large(..., preconditioner="tree")``."""
    import numpy as np

    from ..ops.tree_prec import make_chain_tree_preconditioner

    data = _edge_data(measurements, weights)
    idx = jnp.asarray(np.asarray(_edge_indices(edges_ij), dtype=np.int32))
    anchor_block = (anchor_weight * anchor_weight) * jnp.eye(3)
    return make_chain_tree_preconditioner(
        _edge_residual, idx, data, n_poses, 3, anchor_block=anchor_block,
        block_pairs=np.asarray(edges_ij, np.int64),
    )


def pose_graph_retraction(x, dx, alpha):
    """Additive update with heading wrap on every third variable."""
    x_new = x + alpha * dx
    n = x.shape[0] // 3
    heads = _wrap(x_new[2::3])
    return x_new.at[2::3].set(heads)


def default_pose_graph_params(dtype=jnp.float64, max_iterations: int = 30) -> NLSParams:
    return NLSParams(
        max_iterations=max_iterations,
        max_qp_iterations=1,  # unconstrained: one Newton/GN step per outer
        absolute_exit_tol=1e-12,
        relative_exit_tol=1e-10,
        max_line_search_iterations=8,
        line_search_strategy=LineSearchStrategy.ARMIJO_BACKTRACK,
        armijo_search_tau=0.5,
        lambda_initial=1e-4,
        min_lambda=1e-10,
    )


def solve_pose_graph(
    n_poses: int,
    edges_ij,
    measurements: jax.Array,
    weights: jax.Array,
    x0: jax.Array,
    params: Optional[NLSParams] = None,
    robust: Optional[str] = None,
    robust_delta: float = 1.0,
) -> NLSResult:
    problem = make_pose_graph_problem(
        n_poses, edges_ij, measurements, weights,
        robust=robust, robust_delta=robust_delta,
    )
    if params is None:
        params = default_pose_graph_params(x0.dtype)
    return nls_solve(problem, params, x0, retraction=pose_graph_retraction)


def solve_pose_graph_large(
    n_poses: int,
    edges_ij,
    measurements: jax.Array,
    weights: jax.Array,
    x0: jax.Array,
    params: Optional[NLSParams] = None,
    cg_iterations: int = 100,
    hard_anchor: bool = False,
    robust: Optional[str] = None,
    robust_delta: float = 1.0,
    preconditioner: str = "jacobi",  # "jacobi" | "tree"
) -> NLSResult:
    """Large-N path: matrix-free preconditioned-CG Gauss-Newton. The
    (3N, 3N) Hessian is never materialized, so graphs of thousands of poses
    fit where the dense path's O(N^2) assembly cannot. The dense reference
    (all-dense Eigen, README.md:35-38 'no sparse solvers') has no counterpart
    at this scale.

    ``preconditioner="tree"`` upgrades scalar Jacobi to the spanning-chain
    block-tridiagonal preconditioner (exact on the odometry chain; CG then
    only corrects for loop closures — far fewer iterations on cycle-heavy
    graphs). ``hard_anchor=True`` fixes the gauge exactly (pose 0 == origin)
    via the projected-CG equality path instead of the soft prior
    (Jacobi-only: the tree factor needs the gauge prior to stay SPD)."""
    import dataclasses

    problem = make_pose_graph_problem(
        n_poses, edges_ij, measurements, weights, hard_anchor=hard_anchor,
        robust=robust, robust_delta=robust_delta,
    )
    if params is None:
        params = default_pose_graph_params(x0.dtype)
    params = dataclasses.replace(
        params, qp_solver="cg", cg_iterations=cg_iterations
    )
    if preconditioner == "tree":
        if hard_anchor:
            raise ValueError(
                "preconditioner='tree' requires the soft anchor (the gauge "
                "prior keeps the chain factor SPD); use jacobi with "
                "hard_anchor=True"
            )
        return nls_solve(
            problem,
            params,
            x0,
            retraction=pose_graph_retraction,
            cg_preconditioner=make_tree_preconditioner(
                n_poses, edges_ij, measurements, weights
            ),
        )
    diag_fn = make_jacobi_preconditioner(
        edges_ij,
        measurements,
        weights,
        anchor_weight=0.0 if hard_anchor else 100.0,
    )
    return nls_solve(
        problem,
        params,
        x0,
        retraction=pose_graph_retraction,
        cg_diag_preconditioner=diag_fn,
    )


def solve_pose_graph_large_sharded(
    mesh,
    n_poses: int,
    edges_ij,
    measurements: jax.Array,
    weights: jax.Array,
    x0: jax.Array,
    params: Optional[NLSParams] = None,
    cg_iterations: int = 100,
    axis: str = "mp",
    anchor_weight: float = 100.0,
    preconditioner: str = "jacobi",  # "jacobi" | "tree"
) -> NLSResult:
    """Edge-partitioned distributed large-N path.

    The edge set is split across ``mesh`` axis ``axis`` (one shard_map
    program; edges padded with zero-weight self-loops to a multiple of the
    axis size). Each device holds a local ``BlockResidual`` over its edge
    shard; gradients, Hessian-vector products, costs, and the Jacobi
    diagonal are psum-reduced inside the matrix-free CG Gauss-Newton step
    while x and the CG iterates stay replicated. The anchor prior is applied
    on device 0 only, so the global problem is exactly the single-device
    one -- iterates match ``solve_pose_graph_large`` to solver tolerance.

    ``preconditioner="tree"`` upgrades Jacobi to the spanning-chain
    block-tridiagonal preconditioner, assembled DISTRIBUTED: each device
    contributes its edge shard's (N, 3, 3) tridiagonal blocks, psum'd
    before the replicated O(N) factorization (ops/tree_prec.py
    ``axis_name``).
    """
    import dataclasses
    from functools import partial

    import numpy as np
    from jax.sharding import PartitionSpec as P

    n_dev = mesh.shape[axis]
    edges = np.asarray(edges_ij, dtype=np.int64)
    data = np.asarray(_edge_data(jnp.asarray(measurements), jnp.asarray(weights)))
    E = edges.shape[0]
    E_pad = -(-E // n_dev) * n_dev
    if E_pad != E:
        edges = np.concatenate(
            [edges, np.zeros((E_pad - E, 2), np.int64)], axis=0
        )
        data = np.concatenate(
            [data, np.zeros((E_pad - E, data.shape[1]), data.dtype)], axis=0
        )  # zero WEIGHT rows: padded residuals and Jacobians vanish
    idx = np.stack(
        [3 * edges[:, 0], 3 * edges[:, 0] + 1, 3 * edges[:, 0] + 2,
         3 * edges[:, 1], 3 * edges[:, 1] + 1, 3 * edges[:, 1] + 2],
        axis=1,
    ).astype(np.int32)

    if params is None:
        params = default_pose_graph_params(x0.dtype)
    params = dataclasses.replace(
        params, qp_solver="cg", cg_iterations=cg_iterations
    )

    @partial(
        jax.shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=P(),
    )
    def run(x, idx_local, data_local):
        on0 = (jax.lax.axis_index(axis) == 0).astype(x.dtype)
        aw = anchor_weight * on0

        def anchor(xl):
            return aw * jnp.stack([xl[0], xl[1], _wrap(xl[2])])

        problem = Problem(
            dimension=3 * n_poses,
            costs=(
                BlockResidual(
                    fn=_edge_residual, indices=idx_local, dim=3, data=data_local
                ),
                make_residual([0, 1, 2], anchor, 3),
            ),
        )

        def diag_fn(xx):
            # Device-local contribution; psum'd (and +lam floored) by
            # _cg_step_direction, so no explicit floor is needed here.
            d = edge_jtj_diag(_edge_residual, xx, idx_local, data_local)
            return d.at[:3].add(on0 * anchor_weight * anchor_weight)

        prec_fn = None
        if preconditioner == "tree":
            from ..ops.tree_prec import make_chain_tree_preconditioner

            prec_fn = make_chain_tree_preconditioner(
                _edge_residual, idx_local, data_local, n_poses, 3,
                anchor_block=(anchor_weight * anchor_weight)
                * jnp.eye(3, dtype=x.dtype),
                block_pairs=edges,  # GLOBAL edge set: ordering must agree
                axis_name=axis,
            )

        return nls_solve(
            problem,
            params,
            x,
            retraction=pose_graph_retraction,
            axis_name=axis,
            cg_diag_preconditioner=None if prec_fn is not None else diag_fn,
            cg_preconditioner=prec_fn,
            distributed_cg_preconditioner=prec_fn is not None,
        )

    return run(x0, jnp.asarray(idx), jnp.asarray(data, x0.dtype))


def chordal_initialization(
    n_poses: int,
    edges_ij,
    measurements: jax.Array,  # (E, 3)
    weights: jax.Array,  # (E,) or (E, 3)
    anchor_pose: Optional[jax.Array] = None,  # (3,) pose-0 gauge; origin if None
    cg_iterations: int = 300,
    anchor_weight: float = 100.0,
    preconditioner: str = "none",  # "none" | "tree"
) -> jax.Array:
    """Chordal initialization: two LINEAR least-squares solves instead of a
    long nonlinear descent.

    ``preconditioner="tree"`` runs both stage solves under the
    spanning-chain block-tridiagonal preconditioner (2x2 blocks;
    ops/tree_prec.py), cutting the CG budget each stage needs by ~an order
    of magnitude on cycle-heavy graphs.

    Stage 1 relaxes each heading to a free 2-vector r_i = (cos, sin) --
    edge residual r_j - Rot(dtheta_ij) r_i is linear, so one Gauss-Newton
    step solves it exactly (up to CG tolerance); headings come back through
    atan2. Stage 2 solves positions, which are exactly linear once the
    rotations are fixed. Both stages run through the same matrix-free CG
    machinery (qp_solver="cg", max_iterations=1).

    The descent from a chordal start needs only a short polish (2-5 GN
    iterations) instead of the ~100 a spread-out odometry start costs --
    the standard large-graph recipe (Carlone et al.; Ceres/g2o practice).
    Returns the (3 n_poses,) initial state.
    """
    import numpy as np

    measurements = jnp.asarray(measurements)
    dtype = measurements.dtype
    weights = jnp.asarray(weights, dtype)
    if weights.ndim == 1:
        weights = weights[:, None] * jnp.ones((1, 3), dtype)
    edges = np.asarray(edges_ij, dtype=np.int64)
    anchor = (
        jnp.zeros((3,), dtype) if anchor_pose is None
        else jnp.asarray(anchor_pose, dtype)
    )

    lin_params = NLSParams(
        max_iterations=1,
        max_qp_iterations=1,
        max_line_search_iterations=0,
        line_search_strategy=LineSearchStrategy.ARMIJO_BACKTRACK,
        armijo_search_tau=0.5,
        relative_exit_tol=0.0,
        early_exit=False,
        qp_solver="cg",
        cg_iterations=cg_iterations,
    )

    # --- stage 1: chordal rotations --------------------------------------
    rot_idx = tuple(
        (2 * i, 2 * i + 1, 2 * j, 2 * j + 1) for i, j in edges
    )
    rot_data = jnp.stack(
        [jnp.cos(measurements[:, 2]), jnp.sin(measurements[:, 2]),
         weights[:, 2]],
        axis=1,
    )

    def rot_res(xl, row):
        ci, si, cj, sj = xl[0], xl[1], xl[2], xl[3]
        c, s, w = row[0], row[1], row[2]
        return w * jnp.stack([cj - (c * ci - s * si), sj - (s * ci + c * si)])

    def rot_anchor(xl):
        return anchor_weight * jnp.stack(
            [xl[0] - jnp.cos(anchor[2]), xl[1] - jnp.sin(anchor[2])]
        )

    rot_problem = Problem(
        dimension=2 * n_poses,
        costs=(
            BlockResidual(fn=rot_res, indices=rot_idx, dim=2, data=rot_data),
            make_residual([0, 1], rot_anchor, 2),
        ),
    )

    def _tree_prec(res_fn, idx_tuples, stage_data):
        if preconditioner != "tree":
            return None
        from ..ops.tree_prec import make_chain_tree_preconditioner

        return make_chain_tree_preconditioner(
            res_fn,
            jnp.asarray(np.asarray(idx_tuples, np.int32)),
            stage_data,
            n_poses,
            2,
            anchor_block=(anchor_weight * anchor_weight) * jnp.eye(2, dtype=dtype),
            block_pairs=np.asarray(edges, np.int64),
        )

    r0 = jnp.tile(jnp.asarray([1.0, 0.0], dtype), n_poses)
    r_sol = nls_solve(
        rot_problem, lin_params, r0,
        cg_preconditioner=_tree_prec(rot_res, rot_idx, rot_data),
    ).x.reshape(n_poses, 2)
    theta = jnp.arctan2(r_sol[:, 1], r_sol[:, 0])

    # --- stage 2: positions, exactly linear given the rotations ----------
    pos_idx = tuple((2 * i, 2 * i + 1, 2 * j, 2 * j + 1) for i, j in edges)
    ci = jnp.cos(theta)[jnp.asarray(edges[:, 0])]
    si = jnp.sin(theta)[jnp.asarray(edges[:, 0])]
    pos_data = jnp.stack(
        [ci, si, measurements[:, 0], measurements[:, 1],
         0.5 * (weights[:, 0] + weights[:, 1])],
        axis=1,
    )

    def pos_res(xl, row):
        xi, yi, xj, yj = xl[0], xl[1], xl[2], xl[3]
        c, s, dx, dy, w = row[0], row[1], row[2], row[3], row[4]
        rx = c * (xj - xi) + s * (yj - yi) - dx
        ry = -s * (xj - xi) + c * (yj - yi) - dy
        return w * jnp.stack([rx, ry])

    def pos_anchor(xl):
        return anchor_weight * jnp.stack(
            [xl[0] - anchor[0], xl[1] - anchor[1]]
        )

    pos_problem = Problem(
        dimension=2 * n_poses,
        costs=(
            BlockResidual(fn=pos_res, indices=pos_idx, dim=2, data=pos_data),
            make_residual([0, 1], pos_anchor, 2),
        ),
    )
    t0 = jnp.zeros((2 * n_poses,), dtype)
    t_sol = nls_solve(
        pos_problem, lin_params, t0,
        cg_preconditioner=_tree_prec(pos_res, pos_idx, pos_data),
    ).x.reshape(n_poses, 2)

    return jnp.stack(
        [t_sol[:, 0], t_sol[:, 1], theta], axis=1
    ).reshape(-1)
