"""A whole SE(2) pose graph as ONE fused Pallas kernel.

The round-3 compiler extension (static-index BlockResidual support in
ops/fused_auto.py) makes small pose graphs a register-class family: each of
the 1024 instances in a (8, 128) lane tile is a complete 4-pose square loop
with a loop closure, solved by the fused whole-solver SQP kernel -- the
serving pattern for fleets of small SLAM/odometry windows (e.g. sliding-
window smoothing across thousands of robots).

Run: python examples/fused_pose_graph.py  (CPU interpret mode works; on a
TPU the same code compiles to the Mosaic kernel.)
"""

import os
import sys

import jax

if jax.default_backend() != "tpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from mini_opt_tpu import family_from_problem, fused_solve_batch
from mini_opt_tpu.models.pose_graph import scalar_pose_graph_builder

EDGES = ((0, 1), (1, 2), (2, 3), (3, 0))
TRUE_MEAS = np.tile([1.0, 0.0, np.pi / 2], (4, 1))  # unit square, 90deg turns
TRUTH = np.array(
    [
        [0.0, 0.0, 0.0],
        [1.0, 0.0, np.pi / 2],
        [1.0, 1.0, np.pi],
        [0.0, 1.0, -np.pi / 2],
    ]
)


def main() -> None:
    smoke = os.environ.get("MINI_OPT_EXAMPLE_SMOKE") == "1"
    builder = scalar_pose_graph_builder(4, EDGES)
    family = family_from_problem(builder, data_rows=12)

    B = 1024
    rng = np.random.default_rng(0)
    data = (TRUE_MEAS.ravel() + rng.normal(0, 0.02, (B, 12))).astype(np.float32)
    x0 = (TRUTH.ravel() + rng.normal(0, 0.15, (B, 12))).astype(np.float32)

    x, state = fused_solve_batch(
        family,
        jnp.asarray(data),
        jnp.asarray(x0),
        max_iterations=2 if smoke else 8,
        qp_iterations=1,  # unconstrained: the inner QP is one Newton solve
        ls_iterations=1 if smoke else 2,
        barrier="mpc",
        return_state=True,
    )
    x, state = np.asarray(x), np.asarray(state)
    print(f"solved {B} pose graphs; terminal cost f: "
          f"median {np.median(state[:, 0]):.2e}, "
          f"p99 {np.quantile(state[:, 0], 0.99):.2e}")
    d = np.abs(x - TRUTH.ravel()).max(axis=1)
    print(f"max |x - truth| (noise floor ~0.05): "
          f"median {np.median(d):.3f}, p99 {np.quantile(d, 0.99):.3f}")
    print("first solved graph (x, y, theta per pose):")
    print(np.round(x[0].reshape(4, 3), 3))


if __name__ == "__main__":
    main()
