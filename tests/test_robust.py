"""Robust loss kernels (residual.robustify): exact rho-equivalence, clean
gradients at zero residual, and outlier rejection on a pose graph."""

import jax
import jax.numpy as jnp
import numpy as np

from mini_opt_tpu import make_residual, robustify
from mini_opt_tpu.residual import _robust_rescale


def test_rescale_matches_rho_closed_form():
    """0.5||r~||^2 must equal rho(0.5||r||^2) exactly for both kinds."""
    rng = np.random.default_rng(0)
    delta = 0.7
    for _ in range(20):
        r = jnp.asarray(rng.normal(0, 2.0, 3))
        s = 0.5 * float(jnp.sum(r * r))
        a = np.sqrt(2 * s)
        # huber
        rh = _robust_rescale(r, "huber", delta)
        rho_h = s if a <= delta else delta * a - 0.5 * delta * delta
        np.testing.assert_allclose(0.5 * float(jnp.sum(rh * rh)), rho_h, rtol=1e-12)
        # cauchy
        rc = _robust_rescale(r, "cauchy", delta)
        rho_c = 0.5 * delta**2 * np.log1p(2 * s / delta**2)
        np.testing.assert_allclose(0.5 * float(jnp.sum(rc * rc)), rho_c, rtol=1e-12)


def test_identity_below_threshold_and_monotone_weight():
    r_small = jnp.asarray([0.1, -0.2, 0.05])
    out = _robust_rescale(r_small, "huber", 1.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(r_small))
    # Large residuals are shrunk, and more so as they grow.
    w1 = float(jnp.linalg.norm(_robust_rescale(jnp.asarray([3.0, 0.0]), "huber", 1.0))) / 3.0
    w2 = float(jnp.linalg.norm(_robust_rescale(jnp.asarray([10.0, 0.0]), "huber", 1.0))) / 10.0
    assert 1.0 > w1 > w2 > 0.0


def test_gradients_finite_at_zero_residual():
    """vjp AND jvp at r == 0 exactly (the quat_log norm-at-zero lesson)."""
    for kind in ("huber", "cauchy"):
        f = lambda r, k=kind: _robust_rescale(r, k, 0.5)
        z = jnp.zeros((3,))
        J = jax.jacrev(f)(z)
        assert np.isfinite(np.asarray(J)).all(), (kind, J)
        np.testing.assert_allclose(np.asarray(J), np.eye(3), atol=1e-6)
        Jf = jax.jacfwd(f)(z)
        assert np.isfinite(np.asarray(Jf)).all(), (kind, Jf)


def test_robustified_residual_in_solver():
    """A robustified Residual drops an outlier's influence: fitting a
    constant to samples with one gross outlier, huber lands near the
    inliers' mean; plain least squares is dragged."""
    from mini_opt_tpu.nonlinear import NLSParams, Problem, nls_solve

    samples = jnp.asarray([1.0, 1.1, 0.9, 1.05, 0.95, 50.0])

    def make(robust):
        res = [
            make_residual([0], lambda p, s=s: p - s, 1) for s in samples
        ]
        if robust:
            res = [robustify(r, kind="huber", delta=0.5) for r in res]
        return Problem(dimension=1, costs=tuple(res))

    params = NLSParams(max_iterations=30, max_qp_iterations=1,
                       relative_exit_tol=1e-13)
    x0 = jnp.zeros((1,))
    x_ls = float(jax.jit(lambda x: nls_solve(make(False), params, x).x[0])(x0))
    x_rb = float(jax.jit(lambda x: nls_solve(make(True), params, x).x[0])(x0))
    assert abs(x_ls - float(jnp.mean(samples))) < 1e-6  # LS = mean, dragged
    # Huber stationarity: 5 quadratic inliers (mean exactly 1.0) vs the
    # outlier's bounded linear pull delta -> x* = 1.0 + delta/5 = 1.1.
    assert abs(x_rb - 1.1) < 1e-3, x_rb


def test_pose_graph_outlier_loop_closure():
    """A grossly corrupted loop-closure edge: the quadratic solve is dragged
    far from ground truth; the cauchy-robust solve recovers it.

    Cauchy, not huber, is the demonstration kernel on purpose: huber's
    LINEAR tail still pays delta per unit of outlier residual, and on this
    graph a smooth ring deformation absorbing the outlier is genuinely
    cheaper than rejecting it (measured: huber cost 0.995 at the deformed
    config vs 1.111 at ground truth -- the solver is right, the kernel's
    influence just never vanishes). Cauchy's logarithmic tail saturates, so
    the outlier cannot pay for any deformation."""
    import sys

    sys.path.insert(0, "tests")
    from test_pose_graph import _circle_graph

    from mini_opt_tpu.models.pose_graph import (
        make_pose_graph_problem,
        default_pose_graph_params,
        pose_graph_retraction,
    )
    from mini_opt_tpu.nonlinear import nls_solve

    n = 40
    gt, edges, meas, x0 = _circle_graph(n, seed=7, noise=0.002, loop_every=4)
    meas_bad = meas.copy()
    meas_bad[-1, :2] += 4.0  # gross outlier on the last loop closure

    params = default_pose_graph_params(jnp.float64, max_iterations=60)
    w = jnp.ones((len(edges),))

    def solve(robust):
        problem = make_pose_graph_problem(
            n, edges, jnp.asarray(meas_bad), w,
            robust=("cauchy" if robust else None), robust_delta=0.2,
        )
        return nls_solve(
            problem, params, jnp.asarray(x0.ravel()),
            retraction=pose_graph_retraction,
        )

    x_ls = np.asarray(jax.jit(lambda: solve(False))().x).reshape(n, 3)
    x_rb = np.asarray(jax.jit(lambda: solve(True))().x).reshape(n, 3)
    err_ls = np.abs(x_ls[:, :2] - gt[:, :2]).max()
    err_rb = np.abs(x_rb[:, :2] - gt[:, :2]).max()
    assert err_ls > 3.0, err_ls  # quadratic is dragged by the outlier
    assert err_rb < 0.5, (err_ls, err_rb)  # cauchy rejects it
    # The rejected edge's RAW residual stays large at the robust solution
    # (the outlier is ignored, not absorbed).
    raw = make_pose_graph_problem(n, edges, jnp.asarray(meas_bad), w)
    rn = np.linalg.norm(
        np.asarray(raw.costs[0].error_vectors(jnp.asarray(x_rb.ravel()))),
        axis=1,
    )
    assert rn[-1] > 2.0, rn[-1]


def test_robust_cg_matches_dense():
    """The robust kernel works identically on the matrix-free path (the
    stop_gradient scales flow through jvp/vjp): cauchy-robust CG solve
    reaches the dense cauchy solve's minimum on the outlier graph."""
    import sys

    sys.path.insert(0, "tests")
    from test_pose_graph import _circle_graph

    from mini_opt_tpu.models.pose_graph import (
        solve_pose_graph,
        solve_pose_graph_large,
    )

    n = 40
    gt, edges, meas, x0 = _circle_graph(n, seed=7, noise=0.002, loop_every=4)
    meas_bad = meas.copy()
    meas_bad[-1, :2] += 4.0
    w = jnp.ones((len(edges),))
    rd = solve_pose_graph(
        n, edges, jnp.asarray(meas_bad), w, jnp.asarray(x0.ravel()),
        robust="cauchy", robust_delta=0.2,
    )
    rc = solve_pose_graph_large(
        n, edges, jnp.asarray(meas_bad), w, jnp.asarray(x0.ravel()),
        cg_iterations=200, robust="cauchy", robust_delta=0.2,
    )
    assert abs(float(rc.errors.f) - float(rd.errors.f)) < 1e-4 * (
        1.0 + float(rd.errors.f)
    ), (float(rc.errors.f), float(rd.errors.f))
    err = np.abs(
        np.asarray(rc.x).reshape(n, 3)[:, :2] - gt[:, :2]
    ).max()
    assert err < 0.5, err


def test_se3_robust_outlier():
    """Robust kernels through the SE(3) family's matrix-free path."""
    import sys

    sys.path.insert(0, "tests")
    from test_pose_graph3 import _helix_graph

    from mini_opt_tpu.models.pose_graph3 import solve_pose_graph3_large

    n = 36
    gt, edges, meas, x0 = _helix_graph(n, seed=2, noise=0.005, loop_every=6)
    meas_bad = meas.copy()
    meas_bad[-1, :3] += 3.0
    w = jnp.ones((len(edges),))
    r_ls = solve_pose_graph3_large(
        n, edges, jnp.asarray(meas_bad), w, jnp.asarray(x0.ravel()),
        cg_iterations=150,
    )
    r_rb = solve_pose_graph3_large(
        n, edges, jnp.asarray(meas_bad), w, jnp.asarray(x0.ravel()),
        cg_iterations=150, robust="cauchy", robust_delta=0.2,
    )
    e_ls = np.abs(np.asarray(r_ls.x).reshape(n, 6)[:, :3] - gt[:, :3]).max()
    e_rb = np.abs(np.asarray(r_rb.x).reshape(n, 6)[:, :3] - gt[:, :3]).max()
    assert e_ls > 2.0, e_ls
    assert e_rb < 0.4 * e_ls, (e_ls, e_rb)
