"""Pose-graph model family: synthetic loop with odometry drift + loop
closures must be recovered to the ground truth."""

import jax
import jax.numpy as jnp
import numpy as np

from mini_opt_tpu.models.pose_graph import (
    default_pose_graph_params,
    make_pose_graph_problem,
    pose_graph_retraction,
    solve_pose_graph,
)
from mini_opt_tpu import termination_state_indicates_satisfied_tol
from mini_opt_tpu.nonlinear import nls_solve


def _square_loop(n_side=6, noise=0.03, seed=0):
    """Ground-truth poses around a square; noisy odometry + loop closure."""
    rng = np.random.default_rng(seed)
    poses = []
    x = y = th = 0.0
    n = 4 * n_side
    for k in range(n):
        poses.append((x, y, th))
        if (k + 1) % n_side == 0:
            th_next = th + np.pi / 2
        else:
            th_next = th
        x += np.cos(th)
        y += np.sin(th)
        th = th_next
    poses = np.asarray(poses)

    edges, meas = [], []
    for k in range(n - 1):
        i, j = k, k + 1
        edges.append((i, j))
        xi, yi, thi = poses[i]
        xj, yj, thj = poses[j]
        c, s = np.cos(thi), np.sin(thi)
        dx = c * (xj - xi) + s * (yj - yi) + rng.normal(0, noise)
        dy = -s * (xj - xi) + c * (yj - yi) + rng.normal(0, noise)
        dth = (thj - thi) + rng.normal(0, noise)
        meas.append((dx, dy, dth))
    # loop closure: last -> first (exact measurement, high weight)
    i, j = n - 1, 0
    xi, yi, thi = poses[i]
    xj, yj, thj = poses[j]
    c, s = np.cos(thi), np.sin(thi)
    edges.append((i, j))
    meas.append(
        (
            c * (xj - xi) + s * (yj - yi),
            -s * (xj - xi) + c * (yj - yi),
            thj - thi,
        )
    )
    weights = np.ones(len(edges))
    weights[-1] = 10.0
    return poses, np.asarray(edges), np.asarray(meas), weights


def _dead_reckon(n, meas):
    """Integrate odometry for the initial guess (drifts)."""
    x = np.zeros((n, 3))
    for k in range(n - 1):
        xi, yi, thi = x[k]
        dx, dy, dth = meas[k]
        c, s = np.cos(thi), np.sin(thi)
        x[k + 1] = (xi + c * dx - s * dy, yi + s * dx + c * dy, thi + dth)
    return x


def test_pose_graph_loop_closure():
    poses, edges, meas, w = _square_loop()
    n = len(poses)
    x0 = _dead_reckon(n, meas)
    drift0 = np.abs(x0[:, :2] - poses[:, :2]).max()
    assert drift0 > 0.05  # the guess really drifts

    res = solve_pose_graph(
        n,
        edges,
        jnp.asarray(meas),
        jnp.asarray(w),
        jnp.asarray(x0.ravel()),
    )
    assert bool(termination_state_indicates_satisfied_tol(res.termination_state))
    sol = np.asarray(res.x).reshape(n, 3)
    # The optimized trajectory must beat dead reckoning substantially and sit
    # near the ground truth (noise-limited).
    err = np.abs(sol[:, :2] - poses[:, :2]).max()
    assert err < drift0 * 0.8
    assert err < 0.25, err
    # headings wrapped
    assert (np.abs(sol[:, 2]) <= np.pi + 1e-9).all()


def test_pose_graph_vmapped_batch():
    """A batch of graphs with different noise realizations in one call."""
    poses, edges, meas0, w = _square_loop(n_side=4)
    n = len(poses)
    B = 8
    rng = np.random.default_rng(7)
    meas_b = np.stack([meas0 + rng.normal(0, 0.01, meas0.shape) for _ in range(B)])
    x0 = np.stack([_dead_reckon(n, m).ravel() for m in meas_b])

    params = default_pose_graph_params(jnp.float64, max_iterations=20)

    def one(meas, x0_one):
        problem = make_pose_graph_problem(
            n, edges, meas, jnp.asarray(w)
        )
        return nls_solve(
            problem, params, x0_one, retraction=pose_graph_retraction
        )

    res = jax.jit(jax.vmap(one))(jnp.asarray(meas_b), jnp.asarray(x0))
    ok = np.asarray(termination_state_indicates_satisfied_tol(res.termination_state))
    assert ok.all()
    sol = np.asarray(res.x).reshape(B, n, 3)
    err = np.abs(sol[:, :, :2] - poses[None, :, :2]).max(axis=(1, 2))
    assert (err < 0.3).all(), err
