"""Bundle-adjustment family (models/bundle_adjustment.py).

The canonical large-scale NLS workload on the same machinery as every other
family: dense one-hot assembly for tiny scenes, matrix-free Jacobi-PCG for
large ones, hard gauge anchoring through the projected-CG equality path,
robust reprojection terms via residual.robustify. No reference analog
(kinematics-only test tree); gates follow the repo's convention of
convergence + oracle agreement rather than trajectory pinning.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mini_opt_tpu.models.bundle_adjustment import (
    make_ba_problem,
    make_synthetic_scene,
    solve_bundle_adjustment,
    solve_bundle_adjustment_large,
)
from mini_opt_tpu.nonlinear import evaluate_nonlinear_errors
from mini_opt_tpu.structs import termination_state_indicates_satisfied_tol
from mini_opt_tpu.utils.so3 import quat_conjugate, quat_exp, quat_log, quat_multiply


def _camera_errors(x_est, x_true, n_cameras):
    """(max translation err, max geodesic rotation err): rotation vectors
    near |w| = pi have two representatives, so raw parameter differences are
    meaningless there."""
    ce = np.asarray(x_est[: 6 * n_cameras]).reshape(n_cameras, 6)
    ct = np.asarray(x_true[: 6 * n_cameras]).reshape(n_cameras, 6)
    t_err = np.abs(ce[:, 0:3] - ct[:, 0:3]).max()
    geo = jax.vmap(
        lambda we, wt: jnp.linalg.norm(
            quat_log(
                quat_multiply(quat_conjugate(quat_exp(we)), quat_exp(wt))
            )
        )
    )(jnp.asarray(ce[:, 3:6]), jnp.asarray(ct[:, 3:6]))
    return t_err, float(jnp.max(geo))

C, L = 4, 12
NOISE = 1e-3


def _scene_and_start(seed=1, outlier_fraction=0.0, scene_seed=0):
    obs, uv, x_true, scale_ref = make_synthetic_scene(
        C, L, pixel_noise=NOISE, outlier_fraction=outlier_fraction,
        seed=scene_seed,
    )
    rng = np.random.default_rng(seed)
    x0 = np.asarray(x_true).copy()
    # Cameras 1.. and all landmarks perturbed; camera 0 stays at truth so the
    # gauge anchor matches the ground truth and absolute errors are readable.
    x0[6 : 6 * C] += rng.normal(0, 0.02, 6 * (C - 1))
    x0[6 * C :] += rng.normal(0, 0.05, len(x0) - 6 * C)
    return obs, uv, x_true, scale_ref, jnp.asarray(x0)


def test_ba_dense_recovers_structure():
    obs, uv, x_true, scale_ref, x0 = _scene_and_start()
    r = solve_bundle_adjustment(C, L, obs, uv, x0, scale_ref=scale_ref)
    assert termination_state_indicates_satisfied_tol(
        int(r.termination_state)
    ), int(r.termination_state)
    # Converged to the noise floor: f ~ 0.5 * K * 2 * NOISE^2.
    K = obs.shape[0]
    assert float(r.errors.f) < 4.0 * 0.5 * K * 2 * NOISE**2
    lm_err = np.abs(np.asarray(r.x[6 * C :]) - np.asarray(x_true[6 * C :])).max()
    t_err, r_err = _camera_errors(r.x, x_true, C)
    assert lm_err < 2e-2, lm_err
    assert t_err < 5e-2, t_err
    assert r_err < 2e-2, r_err


def test_ba_cg_matches_dense():
    obs, uv, x_true, scale_ref, x0 = _scene_and_start()
    rd = solve_bundle_adjustment(C, L, obs, uv, x0, scale_ref=scale_ref)
    rc = solve_bundle_adjustment_large(
        C, L, obs, uv, x0, scale_ref=scale_ref, cg_iterations=80
    )
    # Matrix-free reaches the dense path's cost; iterates agree up to the
    # soft-gauge slack (both are noise-floor solutions of the same problem).
    assert float(rc.errors.f) < 1.5 * float(rd.errors.f) + 1e-12
    dx = np.abs(np.asarray(rc.x) - np.asarray(rd.x)).max()
    assert dx < 5e-2, dx


def test_ba_hard_anchor_gauge_exact():
    obs, uv, x_true, scale_ref, x0 = _scene_and_start()
    r = solve_bundle_adjustment_large(
        C, L, obs, uv, x0, scale_ref=scale_ref, cg_iterations=80,
        hard_anchor=True,
    )
    # Camera 0 pinned to its initial pose through the projected-CG equality
    # path; the scale row holds ||t_1 - t_0|| at scale_ref.
    cam0 = np.abs(np.asarray(r.x[:6]) - np.asarray(x0[:6])).max()
    assert cam0 < 1e-5, cam0
    scale = abs(
        float(jnp.linalg.norm(r.x[6:9] - r.x[0:3])) - scale_ref
    )
    assert scale < 1e-4, scale
    assert float(r.errors.f) < 1e-3


def test_ba_robust_outliers():
    obs, uv, x_true, scale_ref, x0 = _scene_and_start(
        outlier_fraction=0.1, scene_seed=3
    )
    rp = solve_bundle_adjustment(C, L, obs, uv, x0, scale_ref=scale_ref)
    rr = solve_bundle_adjustment(
        C, L, obs, uv, x0, scale_ref=scale_ref, robust="cauchy",
        robust_delta=0.01,
    )
    lm_plain = np.abs(
        np.asarray(rp.x[6 * C :]) - np.asarray(x_true[6 * C :])
    ).max()
    lm_robust = np.abs(
        np.asarray(rr.x[6 * C :]) - np.asarray(x_true[6 * C :])
    ).max()
    assert lm_robust < 1.0, lm_robust
    assert lm_plain > 10.0 * lm_robust, (lm_plain, lm_robust)


def test_ba_large_scene_matrix_free():
    """A scene whose dense Hessian would be (816, 816): matrix-free CG only,
    no dense assembly, reaches the noise floor."""
    C8, L256 = 8, 256
    obs, uv, x_true, scale_ref = make_synthetic_scene(
        C8, L256, pixel_noise=NOISE, seed=5
    )
    rng = np.random.default_rng(6)
    x0 = np.asarray(x_true).copy()
    x0[6 : 6 * C8] += rng.normal(0, 0.01, 6 * (C8 - 1))
    x0[6 * C8 :] += rng.normal(0, 0.03, len(x0) - 6 * C8)
    r = solve_bundle_adjustment_large(
        C8, L256, obs, uv, jnp.asarray(x0), scale_ref=scale_ref,
        cg_iterations=60,
    )
    K = obs.shape[0]
    floor = 0.5 * K * 2 * NOISE**2
    assert float(r.errors.f) < 4.0 * floor, (float(r.errors.f), floor)
    lm_err = np.abs(
        np.asarray(r.x[6 * C8 :]) - np.asarray(x_true[6 * C8 :])
    ).max()
    assert lm_err < 5e-2, lm_err


def test_ba_cost_at_truth_is_noise_floor():
    obs, uv, x_true, scale_ref = make_synthetic_scene(C, L, pixel_noise=NOISE)
    prob = make_ba_problem(
        C, L, obs, uv, scale_ref=scale_ref, anchor_ref=x_true[0:6]
    )
    e = evaluate_nonlinear_errors(prob, x_true)
    K = obs.shape[0]
    assert float(e.f) < 3.0 * 0.5 * K * 2 * NOISE**2


def test_ba_sharded_matches_single_device():
    """Observation-partitioned distributed BA on the 8-device CPU mesh
    matches the single-device matrix-free trajectory."""
    from jax.sharding import Mesh

    from mini_opt_tpu.models.bundle_adjustment import (
        solve_bundle_adjustment_large_sharded,
    )

    obs, uv, x_true, scale_ref, x0 = _scene_and_start()
    mesh = Mesh(np.asarray(jax.devices("cpu"))[:8].reshape(8), ("mp",))
    rs = solve_bundle_adjustment_large_sharded(
        mesh, C, L, obs, uv, x0, scale_ref=scale_ref, cg_iterations=80
    )
    r1 = solve_bundle_adjustment_large(
        C, L, obs, uv, x0, scale_ref=scale_ref, cg_iterations=80
    )
    np.testing.assert_allclose(
        np.asarray(rs.x), np.asarray(r1.x), atol=1e-8
    )
    assert float(rs.errors.f) < 4.0 * 0.5 * obs.shape[0] * 2 * NOISE**2


def test_ba_block_preconditioner_beats_diag_at_small_budget():
    """The block-Jacobi preconditioner (6x6 camera / 3x3 landmark blocks)
    exploits BA's intra-block coupling: at a starved CG budget it reaches a
    lower cost than plain Jacobi on a sparse-visibility scene with a wide
    depth spread, and matches it once the budget is generous."""
    import dataclasses

    from mini_opt_tpu.models.bundle_adjustment import (
        _obs_data,
        _obs_indices,
        _reprojection_residual,
        default_ba_params,
        make_ba_block_preconditioner,
        make_ba_jacobi_preconditioner,
        make_ba_retraction,
    )
    from mini_opt_tpu.nonlinear import nls_solve
    from mini_opt_tpu.utils.so3 import quat_log as _ql  # noqa: F401

    C12, L400 = 12, 120
    rng = np.random.default_rng(0)
    # Ring cameras at radius 10 via the library's own scene generator, then
    # replace the landmarks with a wide depth spread and sparse visibility
    # (each landmark seen by 3 consecutive cameras).
    obs_full, _, x_scene, _ = make_synthetic_scene(C12, 1, seed=0)
    cams = np.array(x_scene[: 6 * C12]).reshape(C12, 6)
    cams[:, 0:3] *= 2.5  # radius 4 -> 10
    r_lm = rng.uniform(0.5, 8.0, L400)
    th = rng.uniform(0, 2 * np.pi, L400)
    ph = rng.uniform(-0.3, 0.3, L400)
    lmks = (
        np.stack(
            [r_lm * np.cos(th), r_lm * np.sin(th), r_lm * np.sin(ph)], axis=1
        )
        * 0.4
    )
    x_true = np.concatenate([cams.reshape(-1), lmks.reshape(-1)])
    obs = np.array(
        [[(l + c0) % C12, l] for l in range(L400) for c0 in range(3)]
    )
    xt = jnp.asarray(x_true)
    idx = _obs_indices(C12, obs)
    d0 = _obs_data(jnp.zeros((obs.shape[0], 2)), None)
    uv = np.array(
        jax.vmap(lambda i, row: _reprojection_residual(xt[i], row))(idx, d0)
    )
    uv += rng.normal(0, 1e-3, uv.shape)
    uv = jnp.asarray(uv)
    x0 = x_true.copy()
    x0[6 : 6 * C12] += rng.normal(0, 0.05, 6 * (C12 - 1))
    x0[6 * C12 :] += rng.normal(0, 0.2, len(x0) - 6 * C12)
    x0 = jnp.asarray(x0)
    scale_ref = float(np.linalg.norm(cams[1, 0:3] - cams[0, 0:3]))

    prob = make_ba_problem(
        C12, L400, obs, uv, scale_ref=scale_ref, anchor_ref=x0[0:6]
    )
    retr = make_ba_retraction(C12)
    diag_fn = make_ba_jacobi_preconditioner(C12, obs, uv)
    prec_fn = make_ba_block_preconditioner(C12, L400, obs, uv)
    params = dataclasses.replace(
        default_ba_params(jnp.float64), qp_solver="cg", cg_iterations=5
    )
    rd = nls_solve(prob, params, x0, retraction=retr,
                   cg_diag_preconditioner=diag_fn)
    rb = nls_solve(prob, params, x0, retraction=retr,
                   cg_preconditioner=prec_fn)
    assert float(rb.errors.f) < float(rd.errors.f), (
        float(rb.errors.f),
        float(rd.errors.f),
    )
    # And the combination guard: opaque applies cannot ride shard_map.
    import pytest as _pytest

    with _pytest.raises(ValueError):
        nls_solve(prob, params, x0, cg_preconditioner=prec_fn, axis_name="mp")


def test_ba_schur_preconditioner_exact_solve():
    """The Schur preconditioner applies (J^T J + lam I)^-1 exactly: with
    cg_iterations=2 the solve converges in fewer GN iterations than
    block-Jacobi at cg=10, to the same noise floor."""
    import dataclasses

    from mini_opt_tpu.models.bundle_adjustment import (
        default_ba_params,
        make_ba_block_preconditioner,
        make_ba_retraction,
        make_ba_schur_preconditioner,
    )
    from mini_opt_tpu.nonlinear import nls_solve

    obs, uv, x_true, scale_ref, x0 = _scene_and_start()
    prob = make_ba_problem(
        C, L, obs, uv, scale_ref=scale_ref, anchor_ref=x0[0:6]
    )
    retr = make_ba_retraction(C)
    schur = make_ba_schur_preconditioner(C, L, obs, uv)
    block = make_ba_block_preconditioner(C, L, obs, uv)
    ps = dataclasses.replace(
        default_ba_params(jnp.float64, max_iterations=12),
        qp_solver="cg", cg_iterations=2,
    )
    pb = dataclasses.replace(ps, cg_iterations=10)
    rs = nls_solve(prob, ps, x0, retraction=retr, cg_preconditioner=schur)
    rb = nls_solve(prob, pb, x0, retraction=retr, cg_preconditioner=block)
    K = obs.shape[0]
    floor = 0.5 * K * 2 * NOISE**2
    assert float(rs.errors.f) < 4.0 * floor, float(rs.errors.f)
    assert float(rs.errors.f) <= 1.05 * float(rb.errors.f) + 1e-12
    # On this benign tiny scene both converge in a handful of iterations;
    # the claim here is exactness at cg=2 (the 1.13s -> 0.14s on-chip win
    # at 16x2048 is recorded in bench_extras).
    assert int(rs.num_iterations) <= int(rb.num_iterations) + 1, (
        int(rs.num_iterations),
        int(rb.num_iterations),
    )


def test_ba_schur_sparse_matches_dense_apply():
    """The sparse-visibility Schur factory is numerically the SAME
    preconditioner as the dense one (both exact); their applies agree on
    random vectors to fp accuracy on a dense-visibility scene."""
    from mini_opt_tpu.models.bundle_adjustment import (
        make_ba_schur_preconditioner,
        make_ba_schur_preconditioner_sparse,
    )

    obs, uv, x_true, scale_ref, x0 = _scene_and_start()
    dense = make_ba_schur_preconditioner(C, L, obs, uv)(x0, 1e-4)
    sparse = make_ba_schur_preconditioner_sparse(C, L, obs, uv)(x0, 1e-4)
    rng = np.random.default_rng(7)
    for _ in range(3):
        r = jnp.asarray(rng.normal(size=(6 * C + 3 * L,)))
        np.testing.assert_allclose(
            np.asarray(sparse(r)), np.asarray(dense(r)), rtol=1e-9, atol=1e-9
        )


def test_ba_schur_sparse_visibility_end_to_end():
    """Sparse-visibility regime (each landmark seen by 4 of 10 ring
    cameras): the sparse Schur preconditioner solves to the noise floor at
    cg_iterations=2, with a pair count far below the dense C^2 L coupling
    work."""
    import dataclasses

    from mini_opt_tpu.models.bundle_adjustment import (
        default_ba_params,
        make_ba_retraction,
        make_ba_schur_preconditioner_sparse,
        make_synthetic_scene,
    )
    from mini_opt_tpu.nonlinear import nls_solve

    C10, L120, k = 10, 120, 4
    obs, uv, x_true, scale_ref = make_synthetic_scene(
        C10, L120, pixel_noise=NOISE, seed=2, cameras_per_landmark=k
    )
    K = obs.shape[0]
    assert K == L120 * k  # the visibility filter kept exactly k views each
    rng = np.random.default_rng(3)
    x0 = np.asarray(x_true).copy()
    x0[6 : 6 * C10] += rng.normal(0, 0.02, 6 * (C10 - 1))
    x0[6 * C10 :] += rng.normal(0, 0.05, len(x0) - 6 * C10)
    x0 = jnp.asarray(x0)

    prob = make_ba_problem(
        C10, L120, obs, uv, scale_ref=scale_ref, anchor_ref=x0[0:6]
    )
    prec = make_ba_schur_preconditioner_sparse(C10, L120, obs, uv)
    ps = dataclasses.replace(
        default_ba_params(jnp.float64, max_iterations=12),
        qp_solver="cg", cg_iterations=2,
    )
    rs = nls_solve(
        prob, ps, x0, retraction=make_ba_retraction(C10),
        cg_preconditioner=prec,
    )
    floor = 0.5 * K * 2 * NOISE**2
    assert float(rs.errors.f) < 4.0 * floor, (float(rs.errors.f), floor)
    # Sparse visibility leaves the ring weakly constrained (a converged
    # jacobi-200 reference lands at t_err 0.028 on the same flat valley);
    # gate the geometry loosely and the cost tightly.
    t_err, r_err = _camera_errors(rs.x, x_true, C10)
    assert t_err < 0.1 and r_err < 0.02, (t_err, r_err)
