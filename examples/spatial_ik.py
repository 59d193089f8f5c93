"""Example: batched 3-D (spatial) inverse kinematics.

A chain of single-axis actuators with alternating z/y rotation axes must
reach 3-D targets: soft cost on effector (y, z), a nonlinear equality
constraint on effector x, and joint limits on the elbows. Solved two ways on
the same instances:

1. the general constrained SQP solver (`nls_solve`) over the SO(3)
   actuator-mask chain model, with the Mehrotra inner QP, and
2. the fused whole-solver Pallas kernel (`fused_spatial_ik_solve_batch`).

Run: python examples/spatial_ik.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mini_opt_tpu import fused_spatial_ik_solve_batch
from mini_opt_tpu.models.ik import (
    default_ik_params,
    make_spatial_chain,
    make_spatial_ik_problem,
    mod_pi_retraction,
)
from mini_opt_tpu.nonlinear import nls_solve
from mini_opt_tpu.structs import BarrierStrategy


def main():
    smoke = os.environ.get("MINI_OPT_EXAMPLE_SMOKE") == "1"
    n, B = 3, (64 if smoke else 512)
    chain = make_spatial_chain(n, dtype=jnp.float64)
    fkv = jax.vmap(lambda t: chain.update(t).translation)

    # Reachable targets: forward kinematics of random in-limit configurations.
    rng = np.random.default_rng(0)
    th_true = np.stack(
        [rng.uniform(-1.2, 1.2, B)]
        + [rng.uniform(0.25, 2.6, B) for _ in range(n - 1)],
        1,
    )
    targets = np.asarray(fkv(jnp.asarray(th_true)))
    x0 = th_true + rng.uniform(-0.25, 0.25, (B, n))
    x0[:, 1:] = np.clip(x0[:, 1:], 0.05, np.pi - 0.05)

    # --- general solver -------------------------------------------------
    params = dataclasses.replace(
        default_ik_params(jnp.float64, max_iterations=4 if smoke else 12, max_qp_iterations=6),
        qp_barrier_strategy=BarrierStrategy.PREDICTOR_CORRECTOR,
    )

    def one(t, x):
        return nls_solve(
            make_spatial_ik_problem(chain, t), params, x,
            retraction=mod_pi_retraction,
        ).x

    x_general = jax.jit(jax.vmap(one))(jnp.asarray(targets), jnp.asarray(x0))
    err_g = np.abs(np.asarray(fkv(x_general)) - targets).max(1)
    print(f"general solver:  {(err_g < 1e-3).mean():.1%} of {B} targets "
          f"reached (worst err {err_g.max():.2e})")

    # --- fused kernel ---------------------------------------------------
    x_fused = fused_spatial_ik_solve_batch(
        jnp.asarray(targets, jnp.float32),
        jnp.asarray(x0, jnp.float32),
        max_iterations=4 if smoke else 12,
    )
    err_f = np.abs(
        np.asarray(fkv(jnp.asarray(np.asarray(x_fused), jnp.float64))) - targets
    ).max(1)
    print(f"fused kernel:    {(err_f < 1e-3).mean():.1%} of {B} targets "
          f"reached (worst err {err_f.max():.2e})")


if __name__ == "__main__":
    main()
