"""SE(3) pose-graph family: noisy 3-D odometry + loop closures recovered on
the dense path, the matrix-free CG path, and with the hard gauge anchor."""

import jax
import jax.numpy as jnp
import numpy as np

from mini_opt_tpu import termination_state_indicates_satisfied_tol
from mini_opt_tpu.models.pose_graph3 import (
    solve_pose_graph3,
    solve_pose_graph3_large,
)
from mini_opt_tpu.utils.so3 import (
    quat_conjugate,
    quat_exp,
    quat_log,
    quat_multiply,
    quat_rotate,
)


def _np(x):
    return np.asarray(x)


def _helix_graph(n, seed=0, noise=0.01, loop_every=8):
    """Ground-truth poses along a rising helix, tangent-aligned orientation;
    pose 0 = identity (the gauge). Returns (gt (n,6), edges, meas (E,6), x0)."""
    rng = np.random.default_rng(seed)
    th = np.linspace(0, 3 * np.pi, n)
    R_c, pitch = 5.0, 0.4
    ts = np.stack(
        [R_c * np.cos(th), R_c * np.sin(th), pitch * th], 1
    )
    # Orientation: yaw following the tangent + a slow roll.
    qs = []
    for k in range(n):
        yaw = np.array([0.0, 0.0, th[k] + np.pi / 2])
        roll = np.array([0.2 * np.sin(th[k]), 0.0, 0.0])
        q = quat_multiply(quat_exp(jnp.asarray(yaw)), quat_exp(jnp.asarray(roll)))
        qs.append(_np(q))
    qs = np.stack(qs)
    # Re-express in the pose-0 frame so gt[0] == identity.
    q0c = _np(quat_conjugate(jnp.asarray(qs[0])))
    t0 = ts[0].copy()
    gt = np.zeros((n, 6))
    for k in range(n):
        gt[k, :3] = _np(quat_rotate(jnp.asarray(q0c), jnp.asarray(ts[k] - t0)))
        qk = _np(quat_multiply(jnp.asarray(q0c), jnp.asarray(qs[k])))
        gt[k, 3:] = _np(quat_log(jnp.asarray(qk)))

    def rel(i, j):
        qi = quat_exp(jnp.asarray(gt[i, 3:]))
        qj = quat_exp(jnp.asarray(gt[j, 3:]))
        dt = quat_rotate(quat_conjugate(qi), jnp.asarray(gt[j, :3] - gt[i, :3]))
        dw = quat_log(quat_multiply(quat_conjugate(qi), qj))
        return np.concatenate([_np(dt), _np(dw)])

    edges, meas = [], []
    for i in range(n - 1):
        edges.append([i, i + 1])
        meas.append(rel(i, i + 1))
    for i in range(0, n - loop_every, loop_every):
        edges.append([i, i + loop_every])
        meas.append(rel(i, i + loop_every))
    meas = np.stack(meas) + rng.normal(0, noise, (len(edges), 6))

    # Dead-reckoned initial guess from the noisy odometry edges.
    x0 = np.zeros((n, 6))
    for k in range(n - 1):
        qk = quat_exp(jnp.asarray(x0[k, 3:]))
        dt, dw = meas[k, :3], meas[k, 3:]
        x0[k + 1, :3] = x0[k, :3] + _np(quat_rotate(qk, jnp.asarray(dt)))
        x0[k + 1, 3:] = _np(
            quat_log(quat_multiply(qk, quat_exp(jnp.asarray(dw))))
        )
    return gt, np.asarray(edges), meas, x0


def test_se3_pose_graph_dense():
    n = 40
    gt, edges, meas, x0 = _helix_graph(n, seed=0, noise=0.01)
    drift0 = np.abs(x0[:, :3] - gt[:, :3]).max()
    assert drift0 > 0.05  # odometry really drifts

    w = jnp.ones((len(edges),))
    res = solve_pose_graph3(
        n, edges, jnp.asarray(meas), w, jnp.asarray(x0.ravel())
    )
    assert bool(
        termination_state_indicates_satisfied_tol(res.termination_state)
    )
    sol = np.asarray(res.x).reshape(n, 6)
    driftf = np.abs(sol[:, :3] - gt[:, :3]).max()
    assert driftf < 0.5 * drift0, (drift0, driftf)
    # Rotation vectors stay renormalized (|w| <= pi).
    assert (np.linalg.norm(sol[:, 3:], axis=1) <= np.pi + 1e-9).all()


def test_se3_cg_matches_dense():
    n = 40
    gt, edges, meas, x0 = _helix_graph(n, seed=1, noise=0.01)
    w = jnp.ones((len(edges),))
    rd = solve_pose_graph3(
        n, edges, jnp.asarray(meas), w, jnp.asarray(x0.ravel())
    )
    rc = solve_pose_graph3_large(
        n, edges, jnp.asarray(meas), w, jnp.asarray(x0.ravel()),
        cg_iterations=200,
    )
    assert abs(float(rc.errors.f) - float(rd.errors.f)) < 1e-5 * (
        1.0 + float(rd.errors.f)
    )
    np.testing.assert_allclose(np.asarray(rc.x), np.asarray(rd.x), atol=1e-3)


def test_se3_hard_anchor():
    n = 36
    gt, edges, meas, x0 = _helix_graph(n, seed=2, noise=0.01)
    w = jnp.ones((len(edges),))
    res = solve_pose_graph3_large(
        n, edges, jnp.asarray(meas), w, jnp.asarray(x0.ravel()),
        cg_iterations=200, hard_anchor=True,
    )
    sol = np.asarray(res.x).reshape(n, 6)
    np.testing.assert_allclose(sol[0], 0.0, atol=1e-10)  # exact gauge
    driftf = np.abs(sol[:, :3] - gt[:, :3]).max()
    drift0 = np.abs(x0[:, :3] - gt[:, :3]).max()
    assert driftf < drift0


def test_se3_sharded_cg_matches_single_device():
    """Edge-partitioned SE(3) CG over an 8-device mesh reproduces the
    single-device matrix-free path (padding path exercised)."""
    from mini_opt_tpu.models.pose_graph3 import (
        solve_pose_graph3_large_sharded,
    )
    from mini_opt_tpu.parallel.batch import make_mesh

    assert len(jax.devices()) >= 8
    mesh = make_mesh({"mp": 8})
    n = 40
    gt, edges, meas, x0 = _helix_graph(n, seed=5, noise=0.01, loop_every=12)
    assert len(edges) % 8 != 0  # exercises zero-weight padding
    w = jnp.ones((len(edges),))
    r1 = solve_pose_graph3_large(
        n, edges, jnp.asarray(meas), w, jnp.asarray(x0.ravel()),
        cg_iterations=150,
    )
    r8 = solve_pose_graph3_large_sharded(
        mesh, n, edges, jnp.asarray(meas), w, jnp.asarray(x0.ravel()),
        cg_iterations=150,
    )
    assert int(r8.termination_state) == int(r1.termination_state)
    assert int(r8.num_iterations) == int(r1.num_iterations)
    np.testing.assert_allclose(
        float(r8.errors.f), float(r1.errors.f), rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(r8.x), np.asarray(r1.x), atol=1e-3)


def test_chordal3_short_polish_matches_long_descent():
    """SE(3) chordal init (R^9 rotation relaxation, SVD projection, linear
    positions) + a 3-GN polish reaches the long descent's optimum."""
    from mini_opt_tpu.models.pose_graph3 import (
        chordal_initialization3,
        default_pose_graph3_params,
        solve_pose_graph3_large,
    )

    n = 200
    gt, edges, meas, x0 = _helix_graph(n, seed=4, noise=0.01, loop_every=10)
    w = jnp.ones((len(edges),), jnp.float64)
    xc = chordal_initialization3(
        n, edges, jnp.asarray(meas), w, anchor_pose=jnp.asarray(x0[0]),
        cg_iterations=300,
    )
    # The init alone beats the odometry drift.
    xc_r = np.asarray(xc).reshape(n, 6)
    assert (
        np.abs(xc_r[:, :3] - gt[:, :3]).max()
        < 0.7 * np.abs(x0[:, :3] - gt[:, :3]).max()
    )
    p = default_pose_graph3_params(jnp.float64, max_iterations=3)
    r = solve_pose_graph3_large(
        n, edges, jnp.asarray(meas), w, xc, params=p, cg_iterations=150,
        hard_anchor=True,
    )
    r_long = solve_pose_graph3_large(
        n, edges, jnp.asarray(meas), w, jnp.asarray(x0.ravel()),
        cg_iterations=300, hard_anchor=True,
    )
    assert float(r.errors.f) <= 1.02 * float(r_long.errors.f) + 1e-12, (
        float(r.errors.f),
        float(r_long.errors.f),
    )


def test_sharded_tree_preconditioner_matches_single_device3():
    """SE(3) twin of the distributed tree-preconditioner gate: psum'd
    (N, 6, 6) tridiagonal assembly reproduces the single-device
    tree-preconditioned trajectory."""
    from mini_opt_tpu.models.pose_graph3 import (
        solve_pose_graph3_large,
        solve_pose_graph3_large_sharded,
    )
    from mini_opt_tpu.parallel.batch import make_mesh

    assert len(jax.devices()) >= 8
    mesh = make_mesh({"mp": 8})
    n = 40
    gt, edges, meas, x0 = _helix_graph(n, seed=3, noise=0.01, loop_every=10)
    w = jnp.ones((len(edges),))
    r1 = solve_pose_graph3_large(
        n, edges, jnp.asarray(meas), w, jnp.asarray(x0.ravel()),
        cg_iterations=20, preconditioner="tree",
    )
    r8 = solve_pose_graph3_large_sharded(
        mesh, n, edges, jnp.asarray(meas), w, jnp.asarray(x0.ravel()),
        cg_iterations=20, preconditioner="tree",
    )
    assert int(r8.termination_state) == int(r1.termination_state)
    assert int(r8.num_iterations) == int(r1.num_iterations)
    np.testing.assert_allclose(
        float(r8.errors.f), float(r1.errors.f), rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(r8.x), np.asarray(r1.x), atol=1e-3)
