"""Fourth model family: bundle adjustment (cameras + landmarks).

The canonical large-scale NLS workload: C cameras with 6-DoF poses and L
3-D landmarks, tied by K reprojection observations. One ``BlockResidual``
holds every observation, so the whole structure-from-motion refinement runs
through the same machinery as the pose-graph families -- dense one-hot MXU
assembly for tiny scenes, matrix-free Jacobi-PCG Gauss-Newton
(``qp_solver="cg"``) when the (6C+3L)-dim Hessian must never materialize,
``robustify`` for outlier-tolerant reprojection terms.

No analog in the reference (kinematics-only test tree,
/root/reference/test/transform_chains.cc); built on the same SO(3)
utilities as the SE(3) pose-graph family (utils/so3.py).

Variable layout: camera c owns ``[6c, 6c+6)`` as (t_c(3), w_c(3)) --
camera-to-world translation + rotation vector; landmark l owns
``[6C + 3l, 6C + 3l + 3)``.

Observation (camera c sees landmark l at normalized pixel (u, v)):

    p_cam = R(w_c)^T (X_l - t_c)          # world -> camera
    r     = weight * (p_cam[:2] / p_cam[2] - (u, v))   # pinhole, f = 1

Monocular reprojection-only BA has a 7-dim gauge freedom (6 rigid + scale);
the problem fixes it with a camera-0 anchor (soft prior or 6 hard equality
rows) plus a scale row pinning ``||t_1 - t_0||`` to its initial value.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..nonlinear import NLSParams, Problem, nls_solve
from ..residual import BlockResidual, make_residual, robustify
from ..structs import LineSearchStrategy, NLSResult
from ..utils.so3 import quat_conjugate, quat_exp, quat_log, quat_rotate


def _reprojection_residual(xl, row):
    """2-row reprojection residual of one observation.

    xl = (t_c(3), w_c(3), X(3)); row = (u, v, weight).
    """
    t_c, w_c, X = xl[0:3], xl[3:6], xl[6:9]
    uv, w = row[0:2], row[2]
    p = quat_rotate(quat_conjugate(quat_exp(w_c)), X - t_c)
    # Depth guard: a candidate step can push a point near the camera plane;
    # clamping the denominator keeps the residual finite (the line search
    # rejects such steps on merit).
    d = p[2]
    d_safe = jnp.where(jnp.abs(d) < 1e-6, jnp.where(d < 0, -1e-6, 1e-6), d)
    return w * (p[0:2] / d_safe - uv)


def _obs_data(uv: jax.Array, weights) -> jax.Array:
    uv = jnp.asarray(uv)
    if weights is None:
        weights = jnp.ones((uv.shape[0],), uv.dtype)
    weights = jnp.asarray(weights, uv.dtype)
    return jnp.concatenate([uv, weights[:, None]], axis=1)


def _obs_indices(n_cameras: int, obs_cl) -> jax.Array:
    """(K, 9) int32 global indices: camera block then landmark block."""
    import numpy as np

    obs = np.asarray(obs_cl, dtype=np.int64)
    cam = (6 * obs[:, 0:1] + np.arange(6)[None, :]).astype(np.int64)
    lmk = (6 * n_cameras + 3 * obs[:, 1:2] + np.arange(3)[None, :]).astype(
        np.int64
    )
    return jnp.asarray(np.concatenate([cam, lmk], axis=1), dtype=jnp.int32)


def make_ba_problem(
    n_cameras: int,
    n_landmarks: int,
    obs_cl,  # (K, 2) int: (camera, landmark) per observation
    uv: jax.Array,  # (K, 2) normalized pixel coordinates
    weights: Optional[jax.Array] = None,  # (K,)
    scale_ref: float = 1.0,  # gauge: target for ||t_1 - t_0||
    anchor_ref: Optional[jax.Array] = None,  # (6,): camera-0 (t, w) to pin
    anchor_weight: float = 100.0,
    hard_anchor: bool = False,
    robust: Optional[str] = None,  # "huber" | "cauchy" on the observations
    robust_delta: float = 1.0,
) -> Problem:
    """Bundle-adjustment problem over 6C + 3L variables.

    The 7-dim monocular gauge is fixed by pinning camera 0 to
    ``anchor_ref`` (its initial pose in the solver wrappers; origin if
    None) plus the scale row. ``hard_anchor=True`` makes all 7 rows exact
    equality constraints through the projected-CG path; otherwise they are
    soft priors of weight ``anchor_weight``.
    """
    data = _obs_data(uv, weights)
    indices = _obs_indices(n_cameras, obs_cl)

    block = BlockResidual(
        fn=_reprojection_residual, indices=indices, dim=2, data=data
    )
    if robust is not None:
        block = robustify(block, kind=robust, delta=robust_delta)

    ref = (
        jnp.zeros((6,), jnp.asarray(uv).dtype)
        if anchor_ref is None
        else jnp.asarray(anchor_ref)
    )

    def gauge(xl):
        # Camera-0 pose (6, relative to the reference) + scale row
        # ||t_1 - t_0|| - scale_ref.
        d = xl[6:9] - xl[0:3]
        scale = jnp.sqrt(jnp.sum(d * d, axis=0) + 1e-18) - scale_ref
        return jnp.concatenate(
            [xl[0:3] - ref[0:3], xl[3:6] - ref[3:6], scale[None]]
        )

    gauge_idx = list(range(6)) + list(range(6, 9))  # t0, w0, t1

    if hard_anchor:
        return Problem(
            dimension=6 * n_cameras + 3 * n_landmarks,
            costs=(block,),
            equality_constraints=(make_residual(gauge_idx, gauge, 7),),
        )

    def anchor(xl):
        return anchor_weight * gauge(xl)

    return Problem(
        dimension=6 * n_cameras + 3 * n_landmarks,
        costs=(block, make_residual(gauge_idx, anchor, 7)),
    )


def make_ba_jacobi_preconditioner(
    n_cameras: int,
    obs_cl,
    uv: jax.Array,
    weights: Optional[jax.Array] = None,
    anchor_weight: float = 100.0,
):
    """Jacobi preconditioner for the CG path (shared edge_jtj_diag core
    with the pose-graph families)."""
    from .pose_graph import edge_jtj_diag

    data = _obs_data(uv, weights)
    idx = _obs_indices(n_cameras, obs_cl)

    def diag_fn(x):
        d = edge_jtj_diag(_reprojection_residual, x, idx, data)
        d = d.at[:9].add(anchor_weight * anchor_weight)
        return jnp.maximum(d, jnp.asarray(1e-12, x.dtype))

    return diag_fn


def make_ba_retraction(n_cameras: int):
    """Additive update with camera rotation vectors renormalized through the
    quaternion exp/log round trip (|w| stays <= pi); landmarks plain."""

    def retraction(x, dx, alpha):
        x_new = x + alpha * dx
        cams = x_new[: 6 * n_cameras].reshape(n_cameras, 6)
        ws = jax.vmap(lambda w: quat_log(quat_exp(w)))(cams[:, 3:6])
        cams = cams.at[:, 3:6].set(ws)
        return jnp.concatenate([cams.reshape(-1), x_new[6 * n_cameras :]])

    return retraction


def default_ba_params(dtype=jnp.float64, max_iterations: int = 30) -> NLSParams:
    return NLSParams(
        max_iterations=max_iterations,
        max_qp_iterations=1,  # unconstrained: one GN step per outer iteration
        absolute_exit_tol=1e-14,
        relative_exit_tol=1e-10,
        max_line_search_iterations=8,
        line_search_strategy=LineSearchStrategy.ARMIJO_BACKTRACK,
        armijo_search_tau=0.5,
        lambda_initial=1e-4,
        min_lambda=1e-10,
    )


def solve_bundle_adjustment(
    n_cameras: int,
    n_landmarks: int,
    obs_cl,
    uv: jax.Array,
    x0: jax.Array,
    weights: Optional[jax.Array] = None,
    scale_ref: float = 1.0,
    params: Optional[NLSParams] = None,
    robust: Optional[str] = None,
    robust_delta: float = 1.0,
) -> NLSResult:
    """Dense path (one-hot MXU assembly); scenes up to a few hundred
    variables."""
    problem = make_ba_problem(
        n_cameras, n_landmarks, obs_cl, uv, weights, scale_ref=scale_ref,
        anchor_ref=x0[0:6], robust=robust, robust_delta=robust_delta,
    )
    if params is None:
        params = default_ba_params(x0.dtype)
    return nls_solve(
        problem, params, x0, retraction=make_ba_retraction(n_cameras)
    )


def solve_bundle_adjustment_large(
    n_cameras: int,
    n_landmarks: int,
    obs_cl,
    uv: jax.Array,
    x0: jax.Array,
    weights: Optional[jax.Array] = None,
    scale_ref: float = 1.0,
    params: Optional[NLSParams] = None,
    cg_iterations: int = 100,
    hard_anchor: bool = False,
    robust: Optional[str] = None,
    robust_delta: float = 1.0,
) -> NLSResult:
    """Large-scene path: matrix-free Jacobi-PCG Gauss-Newton over the
    observation set -- the (6C+3L)^2 Hessian is never materialized, so
    thousands of landmarks fit where the dense path's O(N^2) assembly
    cannot. ``hard_anchor=True`` fixes the 7-dim gauge exactly through the
    projected-CG equality path."""
    import dataclasses

    problem = make_ba_problem(
        n_cameras, n_landmarks, obs_cl, uv, weights, scale_ref=scale_ref,
        anchor_ref=x0[0:6], hard_anchor=hard_anchor, robust=robust,
        robust_delta=robust_delta,
    )
    if params is None:
        params = default_ba_params(x0.dtype)
    params = dataclasses.replace(
        params, qp_solver="cg", cg_iterations=cg_iterations
    )
    diag_fn = make_ba_jacobi_preconditioner(
        n_cameras, obs_cl, uv, weights,
        anchor_weight=0.0 if hard_anchor else 100.0,
    )
    return nls_solve(
        problem,
        params,
        x0,
        retraction=make_ba_retraction(n_cameras),
        cg_diag_preconditioner=diag_fn,
    )


def make_ba_schur_preconditioner_sparse(
    n_cameras: int,
    n_landmarks: int,
    obs_cl,
    uv: jax.Array,
    weights: Optional[jax.Array] = None,
    anchor_weight: float = 100.0,
):
    """Sparse-visibility EXACT Schur preconditioner.

    Numerically identical to ``make_ba_schur_preconditioner`` (same reduced
    camera system S = H_cc - W H_ll^-1 W^T, same back-substitution), but W
    is never materialized as (C, L, 6, 3): every term is a segment-sum over
    the K observations, and the Schur correction is a segment-sum over the
    per-landmark observation PAIRS (two observations of the same landmark
    couple their two cameras). Memory is O(K) + O(P) with
    P = sum_l k_l^2 (k_l = cameras seeing landmark l) + the dense (6C)^2
    reduced system -- so a 64-camera scene with 100k landmarks seen by ~6
    views each costs ~3.6M pair blocks instead of the dense variant's
    6.4M * 18 W entries and C^2 L contraction flops.

    Pair lists are enumerated host-side from ``obs_cl`` (static sparsity,
    like the reference's per-residual index metadata residual.hpp:150-163);
    duplicate (c, l) observations are handled exactly (their couplings sum,
    matching W_{c,l} = sum of their per-observation blocks)."""
    import numpy as np

    from ..ops.kkt import ldlt_factorize, ldlt_solve

    data = _obs_data(uv, weights)
    idx = _obs_indices(n_cameras, obs_cl)
    obs = np.asarray(obs_cl, dtype=np.int64)
    cam_ids = jnp.asarray(obs[:, 0], jnp.int32)
    lmk_ids = jnp.asarray(obs[:, 1], jnp.int32)
    C, L = n_cameras, n_landmarks

    by_lmk: dict = {}
    for k, (_, l) in enumerate(obs):
        by_lmk.setdefault(int(l), []).append(k)
    pa, pb = [], []
    for ks in by_lmk.values():
        for a in ks:
            for b in ks:
                pa.append(a)
                pb.append(b)
    pair_a = jnp.asarray(np.asarray(pa, np.int32))
    pair_b = jnp.asarray(np.asarray(pb, np.int32))
    pair_cc = jnp.asarray(
        obs[pa, 0].astype(np.int64) * C + obs[pb, 0], jnp.int32
    )

    def prec_fn(x, lam):
        def one(row_idx, row_data):
            return jax.jacfwd(
                lambda v: _reprojection_residual(v, row_data)
            )(x[row_idx])  # (2, 9)

        J = jax.vmap(one)(idx, data)
        Jc, Jl = J[:, :, 0:6], J[:, :, 6:9]
        eye6 = jnp.eye(6, dtype=x.dtype)
        eye3 = jnp.eye(3, dtype=x.dtype)
        floor = jnp.asarray(1e-12, x.dtype)
        Hcc = jax.ops.segment_sum(
            jnp.einsum("koa,kob->kab", Jc, Jc), cam_ids, num_segments=C
        )
        aw2 = anchor_weight * anchor_weight
        Hcc = Hcc.at[0].add(aw2 * eye6)
        Hcc = Hcc.at[1, 0:3, 0:3].add(aw2 * eye3)
        Hcc = Hcc + (lam + floor) * eye6
        Hll = (
            jax.ops.segment_sum(
                jnp.einsum("koa,kob->kab", Jl, Jl), lmk_ids, num_segments=L
            )
            + (lam + floor) * eye3
        )
        Wk = jnp.einsum("koa,kob->kab", Jc, Jl)  # (K, 6, 3) per-obs coupling
        lmk_fact, _ = jax.vmap(ldlt_factorize)(Hll)

        def hll_solve(v):  # (L, 3) -> (L, 3)
            return jax.vmap(ldlt_solve)(lmk_fact, v)

        # Y_k = W_k Hll_{l(k)}^-1: gather each observation's landmark factor,
        # push the 6 rows of W_k through the 3x3 solve.
        fact_k = jax.tree_util.tree_map(lambda a: a[lmk_ids], lmk_fact)
        Yk = jax.vmap(
            lambda f, Wc: jax.vmap(lambda row: ldlt_solve(f, row))(Wc)
        )(fact_k, Wk)  # (K, 6, 3)

        # S = blockdiag(Hcc) - sum over same-landmark observation pairs of
        # Y_{k1} W_{k2}^T scattered at camera-block (c(k1), c(k2)).
        Scontrib = jnp.einsum("pax,pbx->pab", Yk[pair_a], Wk[pair_b])
        Soff = jax.ops.segment_sum(
            Scontrib, pair_cc, num_segments=C * C
        ).reshape(C, C, 6, 6)
        S = (
            jnp.zeros((C, 6, C, 6), x.dtype)
            .at[jnp.arange(C), :, jnp.arange(C), :]
            .add(Hcc)
            - jnp.transpose(Soff, (0, 2, 1, 3))
        ).reshape(6 * C, 6 * C)
        S_fact, _ = ldlt_factorize(S)

        def apply(r):
            rc = r[: 6 * C]
            rl = r[6 * C :].reshape(L, 3)
            yl = hll_solve(rl)  # Hll^-1 rl
            rhs_c = rc - jax.ops.segment_sum(
                jnp.einsum("kab,kb->ka", Wk, yl[lmk_ids]),
                cam_ids,
                num_segments=C,
            ).reshape(-1)
            zc = ldlt_solve(S_fact, rhs_c)
            rl2 = rl - jax.ops.segment_sum(
                jnp.einsum("kab,ka->kb", Wk, zc.reshape(C, 6)[cam_ids]),
                lmk_ids,
                num_segments=L,
            )
            zl = hll_solve(rl2)
            return jnp.concatenate([zc, zl.reshape(-1)])

        return apply

    return prec_fn


def make_synthetic_scene(
    n_cameras: int,
    n_landmarks: int,
    seed: int = 0,
    pixel_noise: float = 1e-3,
    outlier_fraction: float = 0.0,
    dtype=jnp.float64,
    cameras_per_landmark: Optional[int] = None,
):
    """Synthetic ring-of-cameras scene for tests and benches.

    Cameras sit on a circle of radius 4 in the z=0 plane looking at the
    origin; landmarks fill a unit cube at the center; every camera observes
    every landmark, unless ``cameras_per_landmark`` limits each landmark to
    a window of consecutive ring cameras (the sparse-visibility regime).
    Returns (obs_cl, uv, x_true, scale_ref)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    cams = np.zeros((n_cameras, 6))
    for c in range(n_cameras):
        ang = 2.0 * np.pi * c / n_cameras
        t = np.array([4.0 * np.cos(ang), 4.0 * np.sin(ang), 0.0])
        # Rotation: camera z-axis (optical axis) points at the origin.
        z = -t / np.linalg.norm(t)
        up = np.array([0.0, 0.0, 1.0])
        xaxis = np.cross(up, z)
        xaxis /= np.linalg.norm(xaxis)
        yaxis = np.cross(z, xaxis)
        R = np.stack([xaxis, yaxis, z], axis=1)  # camera-to-world columns
        # Rotation vector from R via Shepperd's method: branch on the largest
        # of (trace, R00, R11, R22) so 180-degree rotations (trace -> -1,
        # where the naive qw = sqrt(tr+1)/2 formula divides by ~0) extract
        # exactly -- ring cameras hit that case.
        tr = np.trace(R)
        if tr > max(R[0, 0], R[1, 1], R[2, 2]):
            s4 = 2.0 * np.sqrt(tr + 1.0)
            q = np.array(
                [
                    s4 / 4.0,
                    (R[2, 1] - R[1, 2]) / s4,
                    (R[0, 2] - R[2, 0]) / s4,
                    (R[1, 0] - R[0, 1]) / s4,
                ]
            )
        else:
            i = int(np.argmax([R[0, 0], R[1, 1], R[2, 2]]))
            j, k = (i + 1) % 3, (i + 2) % 3
            s4 = 2.0 * np.sqrt(max(R[i, i] - R[j, j] - R[k, k] + 1.0, 1e-12))
            q = np.zeros(4)
            q[0] = (R[k, j] - R[j, k]) / s4
            q[1 + i] = s4 / 4.0
            q[1 + j] = (R[j, i] + R[i, j]) / s4
            q[1 + k] = (R[k, i] + R[i, k]) / s4
        q /= np.linalg.norm(q)
        w = np.asarray(quat_log(jnp.asarray(q)))
        cams[c, 0:3] = t
        cams[c, 3:6] = w
    lmks = rng.uniform(-1.0, 1.0, (n_landmarks, 3))
    x_true = np.concatenate([cams.reshape(-1), lmks.reshape(-1)])

    obs_cl = np.stack(
        np.meshgrid(np.arange(n_cameras), np.arange(n_landmarks), indexing="ij"),
        axis=-1,
    ).reshape(-1, 2)
    if cameras_per_landmark is not None:
        # Sparse visibility: landmark l is seen by a window of
        # ``cameras_per_landmark`` consecutive ring cameras anchored at a
        # landmark-dependent offset -- the realistic SfM regime (each point
        # appears in a handful of nearby views, not all of them).
        c_all, l_all = obs_cl[:, 0], obs_cl[:, 1]
        start = (l_all * n_cameras) // n_landmarks
        keep = ((c_all - start) % n_cameras) < cameras_per_landmark
        obs_cl = obs_cl[keep]
    xt = jnp.asarray(x_true)
    idx = _obs_indices(n_cameras, obs_cl)
    data0 = _obs_data(jnp.zeros((obs_cl.shape[0], 2)), None)
    uv_clean = jax.vmap(
        lambda i, row: _reprojection_residual(xt[i], row)
    )(idx, data0)
    uv = np.asarray(uv_clean) + rng.normal(0.0, pixel_noise, uv_clean.shape)
    if outlier_fraction > 0.0:
        k = int(outlier_fraction * uv.shape[0])
        sel = rng.choice(uv.shape[0], size=k, replace=False)
        uv[sel] += rng.uniform(-0.5, 0.5, (k, 2))
    scale_ref = float(
        np.linalg.norm(cams[1, 0:3] - cams[0, 0:3])
    )
    return (
        obs_cl,
        jnp.asarray(uv, dtype),
        jnp.asarray(x_true, dtype),
        scale_ref,
    )


def solve_bundle_adjustment_large_sharded(
    mesh,
    n_cameras: int,
    n_landmarks: int,
    obs_cl,
    uv: jax.Array,
    x0: jax.Array,
    weights: Optional[jax.Array] = None,
    scale_ref: float = 1.0,
    params: Optional[NLSParams] = None,
    cg_iterations: int = 100,
    axis: str = "mp",
    anchor_weight: float = 100.0,
) -> NLSResult:
    """Observation-partitioned distributed BA (same design as the
    pose-graph sharded variants): the observation set is split across
    ``mesh`` axis ``axis`` (zero-weight padding rows when not divisible),
    each device holds a local BlockResidual shard, and gradient /
    Hessian-vector products / cost / Jacobi diagonal psum-reduce while x
    and the CG iterates stay replicated. Gauge prior on device 0 only."""
    import dataclasses
    from functools import partial

    import numpy as np
    from jax.sharding import PartitionSpec as P

    n_dev = mesh.shape[axis]
    data = np.asarray(_obs_data(uv, weights))
    idx = np.asarray(_obs_indices(n_cameras, obs_cl))
    K = idx.shape[0]
    K_pad = -(-K // n_dev) * n_dev
    if K_pad != K:
        idx = np.concatenate([idx, np.zeros((K_pad - K, 9), idx.dtype)], 0)
        data = np.concatenate(
            [data, np.zeros((K_pad - K, data.shape[1]), data.dtype)], 0
        )  # zero WEIGHT rows: padded residuals and Jacobians vanish

    if params is None:
        params = default_ba_params(x0.dtype)
    params = dataclasses.replace(
        params, qp_solver="cg", cg_iterations=cg_iterations
    )
    ref = jnp.asarray(x0[0:6])
    retraction = make_ba_retraction(n_cameras)

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
            d = xl[6:9] - xl[0:3]
            scale = jnp.sqrt(jnp.sum(d * d, axis=0) + 1e-18) - scale_ref
            return aw * jnp.concatenate(
                [xl[0:3] - ref[0:3], xl[3:6] - ref[3:6], scale[None]]
            )

        problem = Problem(
            dimension=6 * n_cameras + 3 * n_landmarks,
            costs=(
                BlockResidual(
                    fn=_reprojection_residual, indices=idx_local, dim=2,
                    data=data_local,
                ),
                make_residual(list(range(9)), anchor, 7),
            ),
        )

        def diag_fn(xx):
            from .pose_graph import edge_jtj_diag

            # Device-local contribution; psum'd (and +lam floored) by
            # _cg_step_direction.
            d = edge_jtj_diag(_reprojection_residual, xx, idx_local, data_local)
            return d.at[:9].add(on0 * anchor_weight * anchor_weight)

        return nls_solve(
            problem,
            params,
            x,
            retraction=retraction,
            axis_name=axis,
            cg_diag_preconditioner=diag_fn,
        )

    return run(x0, jnp.asarray(idx), jnp.asarray(data, x0.dtype))


def make_ba_block_preconditioner(
    n_cameras: int,
    n_landmarks: int,
    obs_cl,
    uv: jax.Array,
    weights: Optional[jax.Array] = None,
    anchor_weight: float = 100.0,
):
    """Block-Jacobi preconditioner exploiting BA's primary/secondary
    structure: per-camera 6x6 and per-landmark 3x3 diagonal blocks of J^T J,
    damped and LDLT-factored per outer iteration (batched tiny linalg). The
    strong intra-block coupling (a landmark's 3 coordinates; a camera's 6
    DoF) that plain Jacobi ignores is exactly what makes CG slow on BA.

    Returns a factory ``(x, lam) -> apply`` for ``nls_solve``'s
    ``cg_preconditioner``."""
    import numpy as np

    from ..ops.kkt import ldlt_factorize, ldlt_solve

    data = _obs_data(uv, weights)
    idx = _obs_indices(n_cameras, obs_cl)
    obs = np.asarray(obs_cl, dtype=np.int64)
    cam_ids = jnp.asarray(obs[:, 0], jnp.int32)
    lmk_ids = jnp.asarray(obs[:, 1], jnp.int32)

    def prec_fn(x, lam):
        def one(row_idx, row_data):
            return jax.jacfwd(
                lambda v: _reprojection_residual(v, row_data)
            )(x[row_idx])  # (2, 9)

        J = jax.vmap(one)(idx, data)
        Jc, Jl = J[:, :, 0:6], J[:, :, 6:9]
        cam_blocks = jax.ops.segment_sum(
            jnp.einsum("koa,kob->kab", Jc, Jc), cam_ids,
            num_segments=n_cameras,
        )
        lmk_blocks = jax.ops.segment_sum(
            jnp.einsum("koa,kob->kab", Jl, Jl), lmk_ids,
            num_segments=n_landmarks,
        )
        # Gauge prior contribution (approximate is fine for a
        # preconditioner): camera-0 pose rows + the scale row's t0/t1 parts.
        aw2 = anchor_weight * anchor_weight
        cam_blocks = cam_blocks.at[0].add(aw2 * jnp.eye(6, dtype=x.dtype))
        cam_blocks = cam_blocks.at[1, 0:3, 0:3].add(
            aw2 * jnp.eye(3, dtype=x.dtype)
        )
        floor = jnp.asarray(1e-12, x.dtype)
        cam_blocks = cam_blocks + (lam + floor) * jnp.eye(6, dtype=x.dtype)
        lmk_blocks = lmk_blocks + (lam + floor) * jnp.eye(3, dtype=x.dtype)
        cam_fact, _ = jax.vmap(ldlt_factorize)(cam_blocks)
        lmk_fact, _ = jax.vmap(ldlt_factorize)(lmk_blocks)

        def apply(r):
            rc = r[: 6 * n_cameras].reshape(n_cameras, 6)
            rl = r[6 * n_cameras :].reshape(n_landmarks, 3)
            zc = jax.vmap(ldlt_solve)(cam_fact, rc)
            zl = jax.vmap(ldlt_solve)(lmk_fact, rl)
            return jnp.concatenate([zc.reshape(-1), zl.reshape(-1)])

        return apply

    return prec_fn


def make_ba_schur_preconditioner(
    n_cameras: int,
    n_landmarks: int,
    obs_cl,
    uv: jax.Array,
    weights: Optional[jax.Array] = None,
    anchor_weight: float = 100.0,
):
    """EXACT Gauss-Newton preconditioner via the Schur complement -- the
    textbook large-BA factorization. Per outer iteration: assemble the
    per-landmark 3x3 blocks H_ll (closed-form eliminable), the per-camera
    6x6 blocks H_cc, and the camera-landmark coupling W (6C x 3L,
    block-sparse, materialized as (C, L, 6, 3)); factor the DENSE reduced
    camera system S = H_cc - W H_ll^-1 W^T (6C x 6C -- tiny for hundreds of
    cameras). ``apply`` then solves (J^T J + lam I) z = r exactly by
    back-substitution, so the outer CG converges in ~1 iteration regardless
    of conditioning.

    Use with ``nls_solve(..., cg_preconditioner=...)`` and a small
    ``cg_iterations`` (2 is enough; the CG wrapper just polishes fp error).
    Memory is O(C L) blocks -- fine for dense visibility at tens of
    cameras; for very large C switch to the block-Jacobi preconditioner.

    Both BA preconditioners build from the PLAIN reprojection Jacobians;
    for a robustified problem the operator they approximate differs by the
    per-observation robust weights, which slows CG slightly but cannot
    change the solution (preconditioners only shape the search).
    """
    import numpy as np

    from ..ops.kkt import ldlt_factorize, ldlt_solve

    data = _obs_data(uv, weights)
    idx = _obs_indices(n_cameras, obs_cl)
    obs = np.asarray(obs_cl, dtype=np.int64)
    cam_ids = jnp.asarray(obs[:, 0], jnp.int32)
    lmk_ids = jnp.asarray(obs[:, 1], jnp.int32)
    pair_ids = jnp.asarray(obs[:, 0] * n_landmarks + obs[:, 1], jnp.int32)
    C, L = n_cameras, n_landmarks

    def prec_fn(x, lam):
        def one(row_idx, row_data):
            return jax.jacfwd(
                lambda v: _reprojection_residual(v, row_data)
            )(x[row_idx])  # (2, 9)

        J = jax.vmap(one)(idx, data)
        Jc, Jl = J[:, :, 0:6], J[:, :, 6:9]
        eye6 = jnp.eye(6, dtype=x.dtype)
        eye3 = jnp.eye(3, dtype=x.dtype)
        floor = jnp.asarray(1e-12, x.dtype)
        Hcc = jax.ops.segment_sum(
            jnp.einsum("koa,kob->kab", Jc, Jc), cam_ids, num_segments=C
        )
        # Gauge prior (camera-0 pose rows + scale row's t0/t1 parts) --
        # diagonal approximation, adequate for a preconditioner.
        aw2 = anchor_weight * anchor_weight
        Hcc = Hcc.at[0].add(aw2 * eye6)
        Hcc = Hcc.at[1, 0:3, 0:3].add(aw2 * eye3)
        Hcc = Hcc + (lam + floor) * eye6
        Hll = (
            jax.ops.segment_sum(
                jnp.einsum("koa,kob->kab", Jl, Jl), lmk_ids, num_segments=L
            )
            + (lam + floor) * eye3
        )
        W = jax.ops.segment_sum(
            jnp.einsum("koa,kob->kab", Jc, Jl), pair_ids,
            num_segments=C * L,
        ).reshape(C, L, 6, 3)
        lmk_fact, _ = jax.vmap(ldlt_factorize)(Hll)

        def hll_solve(v):  # (L, 3) -> (L, 3)
            return jax.vmap(ldlt_solve)(lmk_fact, v)

        # S = Hcc - W Hll^-1 W^T, dense (6C, 6C).
        Winv = jax.vmap(
            lambda Wl, f: jax.vmap(
                # rows of W[c,l] through the 3x3 solve: W[c,l] @ Hll[l]^-1
                # (Hll symmetric; ldlt_solve takes vector rhs)
                lambda Wcl: jax.vmap(lambda row: ldlt_solve(f, row))(Wcl)
            )(Wl),
            in_axes=(1, 0),
            out_axes=1,
        )(W, lmk_fact)  # (C, L, 6, 3)
        U = jnp.einsum("clax,mlex->came", Winv, W)  # (C, 6, C, 6)
        S = (
            jnp.zeros((C, 6, C, 6), x.dtype)
            .at[jnp.arange(C), :, jnp.arange(C), :]
            .add(Hcc)
            - U
        ).reshape(6 * C, 6 * C)
        S_fact, _ = ldlt_factorize(S)

        def apply(r):
            rc = r[: 6 * C]
            rl = r[6 * C :].reshape(L, 3)
            yl = hll_solve(rl)  # Hll^-1 rl
            rhs_c = rc - jnp.einsum("clab,lb->ca", W, yl).reshape(-1)
            zc = ldlt_solve(S_fact, rhs_c)
            rl2 = rl - jnp.einsum(
                "clab,ca->lb", W, zc.reshape(C, 6)
            )
            zl = hll_solve(rl2)
            return jnp.concatenate([zc, zl.reshape(-1)])

        return apply

    return prec_fn
