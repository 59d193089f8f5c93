"""Example: SE(2) pose-graph optimization (SLAM-style loop closure).

A robot drives around a square recording noisy odometry; dead reckoning
drifts, a loop-closure edge pins the end to the start, and the pose-graph
solve recovers the trajectory. One BlockResidual holds every edge.

Run: python examples/pose_graph_slam.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mini_opt_tpu.models.pose_graph import solve_pose_graph


def main():
    rng = np.random.default_rng(0)
    n_side, noise = 8, 0.04
    n = 4 * n_side

    # Ground truth square trajectory.
    poses = []
    x = y = th = 0.0
    for k in range(n):
        poses.append((x, y, th))
        th_next = th + np.pi / 2 if (k + 1) % n_side == 0 else th
        x += np.cos(th)
        y += np.sin(th)
        th = th_next
    poses = np.asarray(poses)

    # Noisy odometry edges + one exact loop closure.
    edges, meas, weights = [], [], []
    for k in range(n):
        i, j = k, (k + 1) % n
        xi, yi, thi = poses[i]
        xj, yj, thj = poses[j]
        c, s = np.cos(thi), np.sin(thi)
        is_loop = j == 0
        eps = 0.0 if is_loop else noise
        edges.append((i, j))
        meas.append(
            (
                c * (xj - xi) + s * (yj - yi) + rng.normal(0, eps),
                -s * (xj - xi) + c * (yj - yi) + rng.normal(0, eps),
                (thj - thi) + rng.normal(0, eps),
            )
        )
        weights.append(10.0 if is_loop else 1.0)
    meas = np.asarray(meas)

    # Dead-reckoned initial guess.
    x0 = np.zeros((n, 3))
    for k in range(n - 1):
        xi, yi, thi = x0[k]
        dx, dy, dth = meas[k]
        c, s = np.cos(thi), np.sin(thi)
        x0[k + 1] = (xi + c * dx - s * dy, yi + s * dx + c * dy, thi + dth)

    res = solve_pose_graph(
        n, np.asarray(edges), jnp.asarray(meas), jnp.asarray(np.asarray(weights)),
        jnp.asarray(x0.ravel()),
    )
    sol = np.asarray(res.x).reshape(n, 3)

    drift = np.abs(x0[:, :2] - poses[:, :2]).max()
    err = np.abs(sol[:, :2] - poses[:, :2]).max()
    print(f"poses: {n}, edges: {len(edges)} (incl. 1 loop closure)")
    print(f"dead-reckoning max position error: {drift:.3f}")
    print(f"optimized max position error:      {err:.3f}")
    print(f"termination state: {int(res.termination_state)}, "
          f"iterations: {int(res.num_iterations)}")


if __name__ == "__main__":
    main()
