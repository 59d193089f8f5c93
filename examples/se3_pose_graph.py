"""Example: SE(3) pose-graph optimization with exact gauge fixing.

A 3-D trajectory (rising helix) with noisy 6-DoF odometry and periodic
loop-closure edges. Dead reckoning drifts; the matrix-free Gauss-Newton
solve (qp_solver="cg" under the hood -- the 6N x 6N Hessian is never built)
repairs the drift, with pose 0 pinned EXACTLY at the origin through the
projected-CG equality path (hard_anchor=True).

Run: python examples/se3_pose_graph.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mini_opt_tpu.models.pose_graph3 import solve_pose_graph3_large
from mini_opt_tpu.utils.so3 import (
    quat_conjugate,
    quat_exp,
    quat_log,
    quat_multiply,
    quat_rotate,
)


def build_graph(n=120, noise=0.015, loop_every=12, seed=0):
    """Ground truth + noisy relative measurements + dead-reckoned guess."""
    rng = np.random.default_rng(seed)
    th = np.linspace(0, 3 * np.pi, n)
    gt = np.zeros((n, 6))
    gt[:, 0] = 5.0 * (np.cos(th) - 1.0)
    gt[:, 1] = 5.0 * np.sin(th)
    gt[:, 2] = 0.4 * th
    gt[:, 5] = np.unwrap(th + np.pi / 2) - (th[0] + np.pi / 2)  # yaw - yaw0

    def pose_q(k):
        return quat_exp(jnp.asarray(gt[k, 3:]))

    def rel(i, j):
        qi, qj = pose_q(i), pose_q(j)
        dt = quat_rotate(quat_conjugate(qi), jnp.asarray(gt[j, :3] - gt[i, :3]))
        dw = quat_log(quat_multiply(quat_conjugate(qi), qj))
        return np.concatenate([np.asarray(dt), np.asarray(dw)])

    edges, meas = [], []
    for i in range(n - 1):
        edges.append([i, i + 1])
        meas.append(rel(i, i + 1))
    for i in range(0, n - loop_every, loop_every):
        edges.append([i, i + loop_every])
        meas.append(rel(i, i + loop_every))
    meas = np.stack(meas) + rng.normal(0, noise, (len(edges), 6))

    x0 = np.zeros((n, 6))
    for k in range(n - 1):
        qk = quat_exp(jnp.asarray(x0[k, 3:]))
        x0[k + 1, :3] = x0[k, :3] + np.asarray(
            quat_rotate(qk, jnp.asarray(meas[k, :3]))
        )
        x0[k + 1, 3:] = np.asarray(
            quat_log(quat_multiply(qk, quat_exp(jnp.asarray(meas[k, 3:]))))
        )
    return gt, np.asarray(edges), meas, x0


def main():
    n = 120
    gt, edges, meas, x0 = build_graph(n)
    drift0 = np.abs(x0[:, :3] - gt[:, :3]).max()
    print(f"{n} poses, {len(edges)} edges; dead-reckoned drift {drift0:.3f} m")

    res = solve_pose_graph3_large(
        n,
        edges,
        jnp.asarray(meas),
        jnp.ones((len(edges),)),
        jnp.asarray(x0.ravel()),
        cg_iterations=250,
        hard_anchor=True,
    )
    sol = np.asarray(res.x).reshape(n, 6)
    driftf = np.abs(sol[:, :3] - gt[:, :3]).max()
    print(
        f"solved: termination={int(res.termination_state)}, "
        f"{int(res.num_iterations)} Gauss-Newton iterations, "
        f"f = {float(res.errors.f):.5f}"
    )
    print(f"drift {drift0:.3f} -> {driftf:.3f} m; "
          f"gauge residual (pose 0) = {np.abs(sol[0]).max():.1e}")
    assert driftf < 0.6 * drift0 and np.abs(sol[0]).max() < 1e-10
    print("ok")


if __name__ == "__main__":
    main()
