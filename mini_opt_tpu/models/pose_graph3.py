"""Third model family: 3-D (SE(3)) pose-graph optimization.

Extends the SE(2) family (pose_graph.py) to full 6-DoF poses: pose i is
(t_i in R^3, w_i in R^3) with w a rotation vector (axis * angle, the SO(3)
log). One ``BlockResidual`` holds every relative-pose edge; the retraction
renormalizes rotation vectors through the quaternion exp/log round trip so
|w| stays <= pi. Large graphs run matrix-free through ``qp_solver="cg"``
exactly like the SE(2) family; ``hard_anchor=True`` pins the gauge through
the projected-CG equality path.

No analog in the reference (kinematics-only test tree); built on the same
SO(3) utilities the actuator-chain family uses (utils/so3.py, the
geometry_utils equivalents: /root/reference/test/transform_chains.cc:57-110
usage of QuaternionExp / Skew3).

Edge (i, j) with measurement (dt in frame i, dw as a rotation vector):

    r_t = w_t * ( R(w_i)^T (t_j - t_i) - dt )
    r_R = w_r * log( (R(w_i) R(dw))^T R(w_j) )
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..nonlinear import NLSParams, Problem, nls_solve
from ..residual import BlockResidual, make_residual
from ..structs import LineSearchStrategy, NLSResult
from ..utils.so3 import (
    quat_conjugate,
    quat_exp,
    quat_log,
    quat_multiply,
    quat_rotate,
)


def _edge_residual3(xl, row):
    """6-row relative-pose residual of one SE(3) edge.

    xl = (t_i(3), w_i(3), t_j(3), w_j(3)); row = (dt(3), dw(3), w_t, w_r).
    """
    ti, wi = xl[0:3], xl[3:6]
    tj, wj = xl[6:9], xl[9:12]
    dt, dw = row[0:3], row[3:6]
    wt, wr = row[6], row[7]
    qi = quat_exp(wi)
    qj = quat_exp(wj)
    r_t = quat_rotate(quat_conjugate(qi), tj - ti) - dt
    q_pred = quat_multiply(qi, quat_exp(dw))  # predicted world rotation of j
    r_r = quat_log(quat_multiply(quat_conjugate(q_pred), qj))
    return jnp.concatenate([wt * r_t, wr * r_r])


def _edge_data3(measurements, weights):
    """(E, 8) data rows from (E, 6) measurements and (E,) | (E, 2) weights."""
    measurements = jnp.asarray(measurements)
    weights = jnp.asarray(weights, measurements.dtype)
    if weights.ndim == 1:
        weights = weights[:, None] * jnp.ones((1, 2), weights.dtype)
    return jnp.concatenate([measurements, weights], axis=1)


def _edge_indices3(edges_ij):
    import numpy as np

    edges = np.asarray(edges_ij, dtype=np.int64)
    return tuple(
        tuple(int(v) for v in list(range(6 * i, 6 * i + 6)) + list(range(6 * j, 6 * j + 6)))
        for i, j in edges
    )


def make_pose_graph3_problem(
    n_poses: int,
    edges_ij,  # (E, 2) int array-like
    measurements: jax.Array,  # (E, 6): (dt(3) in frame i, dw(3) rotation vec)
    weights: jax.Array,  # (E,) or (E, 2): (translation, rotation) weights
    anchor_weight: float = 100.0,
    hard_anchor: bool = False,
    robust: Optional[str] = None,  # "huber" | "cauchy" on the edge residuals
    robust_delta: float = 1.0,
) -> Problem:
    """Pose p occupies variables [6p, 6p+6). Pose 0 fixes the gauge, softly
    (prior cost) or exactly (6-row equality constraint, ``hard_anchor``).
    ``robust`` wraps every edge in a robust loss kernel (residual.robustify)."""
    from ..residual import robustify

    data = _edge_data3(measurements, weights)
    indices = _edge_indices3(edges_ij)

    def gauge(xl):
        return jnp.concatenate([xl[0:3], quat_log(quat_exp(xl[3:6]))])

    def anchor(xl):
        return anchor_weight * gauge(xl)

    block = BlockResidual(fn=_edge_residual3, indices=indices, dim=6, data=data)
    if robust is not None:
        block = robustify(block, kind=robust, delta=robust_delta)
    if hard_anchor:
        return Problem(
            dimension=6 * n_poses,
            costs=(block,),
            equality_constraints=(make_residual(list(range(6)), gauge, 6),),
        )
    return Problem(
        dimension=6 * n_poses,
        costs=(block, make_residual(list(range(6)), anchor, 6)),
    )


def make_jacobi_preconditioner3(
    edges_ij,
    measurements: jax.Array,
    weights: jax.Array,
    anchor_weight: float = 100.0,
):
    """Jacobi preconditioner for the SE(3) pose-graph CG path (shared
    edge_jtj_diag core with the SE(2) family)."""
    import numpy as np

    from .pose_graph import edge_jtj_diag

    data = _edge_data3(measurements, weights)
    idx = jnp.asarray(np.asarray(_edge_indices3(edges_ij), dtype=np.int32))

    def diag_fn(x):
        d = edge_jtj_diag(_edge_residual3, x, idx, data)
        d = d.at[:6].add(anchor_weight * anchor_weight)
        return jnp.maximum(d, jnp.asarray(1e-12, x.dtype))

    return diag_fn


def make_tree_preconditioner3(
    n_poses: int,
    edges_ij,
    measurements: jax.Array,
    weights: jax.Array,
    anchor_weight: float = 100.0,
):
    """Spanning-chain block-tridiagonal preconditioner for the SE(3)
    pose-graph CG path — the 6x6-block twin of
    pose_graph.make_tree_preconditioner (shared ops/tree_prec.py core).
    The anchor block uses aw^2 I_6: quat_log(quat_exp(w)) has identity
    Jacobian inside the |w| < pi chart, and preconditioners only shape the
    search."""
    import numpy as np

    from ..ops.tree_prec import make_chain_tree_preconditioner

    data = _edge_data3(measurements, weights)
    idx = jnp.asarray(np.asarray(_edge_indices3(edges_ij), dtype=np.int32))
    anchor_block = (anchor_weight * anchor_weight) * jnp.eye(6)
    return make_chain_tree_preconditioner(
        _edge_residual3, idx, data, n_poses, 6, anchor_block=anchor_block,
        block_pairs=np.asarray(edges_ij, np.int64),
    )


def pose_graph3_retraction(x, dx, alpha):
    """Additive update; rotation vectors renormalized through the quaternion
    exp/log round trip so every |w| stays in [0, pi] (the SO(3) analog of the
    SE(2) family's heading wrap)."""
    x_new = x + alpha * dx
    n = x.shape[0] // 6
    ws = x_new.reshape(n, 6)[:, 3:6]
    ws = jax.vmap(lambda w: quat_log(quat_exp(w)))(ws)
    return x_new.reshape(n, 6).at[:, 3:6].set(ws).reshape(-1)


def default_pose_graph3_params(dtype=jnp.float64, max_iterations: int = 30) -> NLSParams:
    return NLSParams(
        max_iterations=max_iterations,
        max_qp_iterations=1,  # unconstrained: one GN step per outer iteration
        absolute_exit_tol=1e-12,
        relative_exit_tol=1e-10,
        max_line_search_iterations=8,
        line_search_strategy=LineSearchStrategy.ARMIJO_BACKTRACK,
        armijo_search_tau=0.5,
        lambda_initial=1e-4,
        min_lambda=1e-10,
    )


def solve_pose_graph3(
    n_poses: int,
    edges_ij,
    measurements: jax.Array,
    weights: jax.Array,
    x0: jax.Array,
    params: Optional[NLSParams] = None,
) -> NLSResult:
    """Dense path (one-hot MXU assembly); graphs up to a few hundred poses."""
    problem = make_pose_graph3_problem(n_poses, edges_ij, measurements, weights)
    if params is None:
        params = default_pose_graph3_params(x0.dtype)
    return nls_solve(problem, params, x0, retraction=pose_graph3_retraction)


def solve_pose_graph3_large(
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
    """Large-N path: matrix-free PCG Gauss-Newton over the edge set
    (the 6N x 6N Hessian is never materialized). ``preconditioner="tree"``
    solves the odometry-chain Hessian exactly per CG iteration (see
    pose_graph.solve_pose_graph_large)."""
    import dataclasses

    problem = make_pose_graph3_problem(
        n_poses, edges_ij, measurements, weights, hard_anchor=hard_anchor,
        robust=robust, robust_delta=robust_delta,
    )
    if params is None:
        params = default_pose_graph3_params(x0.dtype)
    params = dataclasses.replace(
        params, qp_solver="cg", cg_iterations=cg_iterations
    )
    if preconditioner == "tree":
        if hard_anchor:
            raise ValueError(
                "preconditioner='tree' requires the soft anchor; use jacobi "
                "with hard_anchor=True"
            )
        return nls_solve(
            problem,
            params,
            x0,
            retraction=pose_graph3_retraction,
            cg_preconditioner=make_tree_preconditioner3(
                n_poses, edges_ij, measurements, weights
            ),
        )
    diag_fn = make_jacobi_preconditioner3(
        edges_ij,
        measurements,
        weights,
        anchor_weight=0.0 if hard_anchor else 100.0,
    )
    return nls_solve(
        problem,
        params,
        x0,
        retraction=pose_graph3_retraction,
        cg_diag_preconditioner=diag_fn,
    )


def solve_pose_graph3_large_sharded(
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
    """Edge-partitioned distributed SE(3) path (same design as the SE(2)
    variant, pose_graph.py:solve_pose_graph_large_sharded): the edge set is
    split across ``mesh`` axis ``axis`` (zero-weight padding rows when not
    divisible), each device holds a local BlockResidual shard, and gradient /
    Hessian-vector products / cost / Jacobi diagonal psum-reduce while x and
    the CG iterates stay replicated. Anchor prior on device 0 only.
    ``preconditioner="tree"``: distributed spanning-chain block-tridiagonal
    preconditioner (psum'd (N, 6, 6) assembly, replicated factor)."""
    import dataclasses
    from functools import partial

    import numpy as np
    from jax.sharding import PartitionSpec as P

    n_dev = mesh.shape[axis]
    edges = np.asarray(edges_ij, dtype=np.int64)
    data = np.asarray(_edge_data3(measurements, weights))
    E = edges.shape[0]
    E_pad = -(-E // n_dev) * n_dev
    if E_pad != E:
        edges = np.concatenate([edges, np.zeros((E_pad - E, 2), np.int64)], 0)
        data = np.concatenate(
            [data, np.zeros((E_pad - E, data.shape[1]), data.dtype)], 0
        )  # zero WEIGHT rows: padded residuals and Jacobians vanish
    idx = np.stack(
        [6 * edges[:, 0] + k for k in range(6)]
        + [6 * edges[:, 1] + k for k in range(6)],
        axis=1,
    ).astype(np.int32)

    if params is None:
        params = default_pose_graph3_params(x0.dtype)
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
            return aw * jnp.concatenate([xl[0:3], quat_log(quat_exp(xl[3:6]))])

        problem = Problem(
            dimension=6 * n_poses,
            costs=(
                BlockResidual(
                    fn=_edge_residual3, indices=idx_local, dim=6,
                    data=data_local,
                ),
                make_residual(list(range(6)), anchor, 6),
            ),
        )

        def diag_fn(xx):
            from .pose_graph import edge_jtj_diag

            # Device-local contribution; psum'd (and +lam floored) by
            # _cg_step_direction.
            d = edge_jtj_diag(_edge_residual3, xx, idx_local, data_local)
            return d.at[:6].add(on0 * anchor_weight * anchor_weight)

        prec_fn = None
        if preconditioner == "tree":
            from ..ops.tree_prec import make_chain_tree_preconditioner

            prec_fn = make_chain_tree_preconditioner(
                _edge_residual3, idx_local, data_local, n_poses, 6,
                anchor_block=(anchor_weight * anchor_weight)
                * jnp.eye(6, dtype=x.dtype),
                block_pairs=edges,  # GLOBAL edge set: ordering must agree
                axis_name=axis,
            )

        return nls_solve(
            problem,
            params,
            x,
            retraction=pose_graph3_retraction,
            axis_name=axis,
            cg_diag_preconditioner=None if prec_fn is not None else diag_fn,
            cg_preconditioner=prec_fn,
            distributed_cg_preconditioner=prec_fn is not None,
        )

    return run(x0, jnp.asarray(idx), jnp.asarray(data, x0.dtype))


def chordal_initialization3(
    n_poses: int,
    edges_ij,
    measurements: jax.Array,  # (E, 6)
    weights: jax.Array,  # (E,) or (E, 2)
    anchor_pose: Optional[jax.Array] = None,  # (6,) pose-0 gauge
    cg_iterations: int = 300,
    anchor_weight: float = 100.0,
    preconditioner: str = "none",  # "none" | "tree"
) -> jax.Array:
    """SE(3) chordal initialization (same recipe as the SE(2)
    ``chordal_initialization``): relax each rotation to a free 3x3 matrix
    M_i in R^9 -- the edge residual ``M_j - M_i R(dw_ij)`` is LINEAR, so one
    Gauss-Newton step through the matrix-free CG machinery solves the
    rotation graph; each M is then projected to SO(3) by SVD and positions
    solve a second linear system ``(t_j - t_i) - R_i dt_ij``. Returns the
    (6 n_poses,) initial state for the nonlinear polish.

    ``preconditioner="tree"`` runs both stage solves under the
    spanning-chain block-tridiagonal preconditioner (9x9 / 3x3 blocks;
    ops/tree_prec.py) — an order-of-magnitude smaller CG budget on
    cycle-heavy graphs."""
    import numpy as np

    from ..utils.so3 import quat_from_matrix, quat_to_matrix

    measurements = jnp.asarray(measurements)
    dtype = measurements.dtype
    weights = jnp.asarray(weights, dtype)
    if weights.ndim == 1:
        weights = weights[:, None] * jnp.ones((1, 2), dtype)
    edges = np.asarray(edges_ij, dtype=np.int64)
    anchor = (
        jnp.zeros((6,), dtype) if anchor_pose is None
        else jnp.asarray(anchor_pose, dtype)
    )
    anchor_R = quat_to_matrix(quat_exp(anchor[3:6]))

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

    # --- stage 1: chordal rotations over R^9 ------------------------------
    Rd = jax.vmap(lambda w: quat_to_matrix(quat_exp(w)))(
        measurements[:, 3:6]
    )  # (E, 3, 3)
    rot_idx = tuple(
        tuple(range(9 * i, 9 * i + 9)) + tuple(range(9 * j, 9 * j + 9))
        for i, j in edges
    )
    rot_data = jnp.concatenate(
        [Rd.reshape(-1, 9), weights[:, 1:2]], axis=1
    )  # (E, 10)

    def rot_res(xl, row):
        w = row[9]
        rows = []
        for r_ in range(3):
            for c in range(3):
                acc = xl[9 + 3 * r_ + c]
                for k in range(3):
                    acc = acc - xl[3 * r_ + k] * row[3 * k + c]
                rows.append(w * acc)
        return jnp.stack(rows)

    def rot_anchor(xl):
        return anchor_weight * (xl - anchor_R.reshape(-1))

    rot_problem = Problem(
        dimension=9 * n_poses,
        costs=(
            BlockResidual(fn=rot_res, indices=rot_idx, dim=9, data=rot_data),
            make_residual(list(range(9)), rot_anchor, 9),
        ),
    )
    def _tree_prec(res_fn, idx_tuples, stage_data, dof):
        if preconditioner != "tree":
            return None
        from ..ops.tree_prec import make_chain_tree_preconditioner

        return make_chain_tree_preconditioner(
            res_fn,
            jnp.asarray(np.asarray(idx_tuples, np.int32)),
            stage_data,
            n_poses,
            dof,
            anchor_block=(anchor_weight * anchor_weight)
            * jnp.eye(dof, dtype=dtype),
            block_pairs=np.asarray(edges, np.int64),
        )

    m0 = jnp.tile(jnp.eye(3, dtype=dtype).reshape(-1), n_poses)
    M = nls_solve(
        rot_problem, lin_params, m0,
        cg_preconditioner=_tree_prec(rot_res, rot_idx, rot_data, 9),
    ).x.reshape(n_poses, 3, 3)

    def project(Mi):
        U, _, Vt = jnp.linalg.svd(Mi)
        det = jnp.linalg.det(U @ Vt)
        return U @ jnp.diag(jnp.asarray([1.0, 1.0, 0.0], dtype) + jnp.asarray(
            [0.0, 0.0, 1.0], dtype) * det) @ Vt

    R = jax.vmap(project)(M)  # (N, 3, 3) in SO(3)
    w_vec = jax.vmap(lambda Ri: quat_log(quat_from_matrix(Ri)))(R)

    # --- stage 2: positions, linear given rotations -----------------------
    Ri_dt = jnp.einsum(
        "eab,eb->ea", R[jnp.asarray(edges[:, 0])], measurements[:, 0:3]
    )
    pos_idx = tuple(
        tuple(range(3 * i, 3 * i + 3)) + tuple(range(3 * j, 3 * j + 3))
        for i, j in edges
    )
    pos_data = jnp.concatenate([Ri_dt, weights[:, 0:1]], axis=1)  # (E, 4)

    def pos_res(xl, row):
        return row[3] * jnp.stack(
            [xl[3 + k] - xl[k] - row[k] for k in range(3)]
        )

    def pos_anchor(xl):
        return anchor_weight * (xl - anchor[0:3])

    pos_problem = Problem(
        dimension=3 * n_poses,
        costs=(
            BlockResidual(fn=pos_res, indices=pos_idx, dim=3, data=pos_data),
            make_residual([0, 1, 2], pos_anchor, 3),
        ),
    )
    t = nls_solve(
        pos_problem, lin_params, jnp.zeros((3 * n_poses,), dtype),
        cg_preconditioner=_tree_prec(pos_res, pos_idx, pos_data, 3),
    ).x.reshape(n_poses, 3)

    return jnp.concatenate([t, w_vec], axis=1).reshape(-1)
