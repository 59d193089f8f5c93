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
