"""Example: MEDIUM-N families through the generic blocked fused tier.

The register-class fused kernels stop at D = n + m_eq ~ 32 (the dense
LDL^T unroll is O(D^3) straight-line code).  Past that, the SAME
``fused_solve_batch`` call dispatches automatically to the blocked tier
(ops/pallas_blocked.py): the condensed KKT system lives as a stacked VMEM
tensor factored by a blocked batched LDL^T, so a dim-49 IK chain or a
16-pose SLAM graph gets a fused whole-solver kernel with NO handwritten
kernel and no API change.

Two medium-N families here:
  1. a 48-joint planar arm (dim 48 + 1 equality = D 49) with joint limits;
  2. 16-pose SE(2) graphs with an off-ring loop closure (dim 48), compiled
     from the same scalar-style builder the register tier uses.

Measured on-chip (STATUS round-5): 694.9k IK solves/s (25.1x the general
path), 3.52M graphs/s (27.4x) at cost parity.

Run: python examples/blocked_medium_n.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mini_opt_tpu import (
    REGISTER_KKT_MAX,
    family_from_problem,
    fused_solve_batch,
    fused_termination_status,
)
from mini_opt_tpu.models.pose_graph import scalar_pose_graph_builder
from mini_opt_tpu.ops.pallas_ik import planar_family


def main():
    smoke = os.environ.get("MINI_OPT_EXAMPLE_SMOKE") == "1"
    B = 128 if smoke else 1024
    rng = np.random.default_rng(0)

    # -- 1. 48-joint planar arm -------------------------------------------
    n = 48
    fam = planar_family(n, 0.4)
    assert fam.n + fam.m_eq > REGISTER_KKT_MAX  # -> blocked tier
    # Warm-start serving distribution (a reference pose per lane, target a
    # small task step away) -- cold folded starts at f32 leave the usual
    # chaotic redundant-chain tail (CLAUDE.md); serving re-solves warm.
    th_ref = np.clip(
        rng.uniform(0.02, 0.10, (B, n)) + rng.normal(0, 0.01, (B, n)),
        0.01, np.pi - 0.01,
    )
    th_ref[:, 0] = rng.uniform(-0.3, 0.3, B)
    phi0 = np.cumsum(th_ref, axis=1)
    eff0 = np.stack([0.4 * np.cos(phi0).sum(1), 0.4 * np.sin(phi0).sum(1)], 1)
    tgt = jnp.asarray(eff0 + rng.uniform(-0.05, 0.05, (B, 2)))
    x0 = jnp.asarray(th_ref)

    x, state = fused_solve_batch(
        fam, tgt, x0, max_iterations=6, qp_iterations=3, ls_iterations=2,
        return_state=True,
    )
    phi = np.cumsum(np.asarray(x), axis=1)
    eff = np.stack([0.4 * np.cos(phi).sum(1), 0.4 * np.sin(phi).sum(1)], 1)
    err = np.abs(eff - np.asarray(tgt)).max(1)
    status = np.asarray(fused_termination_status(state, f_tol=1e-8, eq_tol=1e-5))
    print(
        f"48-joint arm: {B} instances, effector err p50 "
        f"{np.median(err):.2e}, conv@1e-3 {(err < 1e-3).mean():.3f}"
    )
    assert (err < 1e-3).mean() > 0.9
    assert status.shape == (B,)

    # -- 2. 16-pose chain + off-ring closure ------------------------------
    N = 16
    edges = tuple((t, t + 1) for t in range(N - 1)) + ((4, 12),)
    builder = scalar_pose_graph_builder(N, edges)
    gfam = family_from_problem(builder, data_rows=3 * len(edges))
    assert gfam.n + gfam.m_eq > REGISTER_KKT_MAX  # -> blocked tier

    th_gt = np.cumsum(rng.uniform(-0.5, 0.5, (B, N)), axis=1)
    xy_gt = np.cumsum(np.stack([np.cos(th_gt), np.sin(th_gt)], -1) * 0.5, 1)
    poses = np.concatenate([xy_gt, th_gt[..., None]], -1)

    def edge_meas(pi, pj):
        c, s = np.cos(pi[..., 2]), np.sin(pi[..., 2])
        dx = pj[..., 0] - pi[..., 0]
        dy = pj[..., 1] - pi[..., 1]
        return np.stack(
            [c * dx + s * dy, -s * dx + c * dy, pj[..., 2] - pi[..., 2]], -1
        )

    meas = np.stack([edge_meas(poses[:, i], poses[:, j]) for i, j in edges], 1)
    meas += rng.normal(scale=0.02, size=meas.shape)
    data = jnp.asarray(meas.reshape(B, -1))
    x0g = poses + rng.normal(scale=0.08, size=poses.shape)
    x0g[:, 0] = 0.0
    x0g = jnp.asarray(x0g.reshape(B, 3 * N))

    xg, st = fused_solve_batch(
        gfam, data, x0g, max_iterations=5, qp_iterations=1, ls_iterations=2,
        return_state=True,
    )
    f_fin = np.asarray(st[:, 0])
    print(
        f"16-pose chain+closure: cost p50 {np.median(f_fin):.2e}, "
        f"p99 {np.quantile(f_fin, 0.99):.2e}"
    )
    assert np.isfinite(np.asarray(xg)).all()
    assert np.median(f_fin) < 0.05
    print("ok")


if __name__ == "__main__":
    main()
