"""Example: batched transform-chain inverse kinematics -- the flagship
workload. Thousands of independent IK instances (one target each) solve as a
single jitted, vmapped call; optionally sharded across a device mesh.

Run: python examples/batched_ik.py [batch]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import jax
import jax.numpy as jnp
import numpy as np

from mini_opt_tpu.models.ik import (
    default_ik_params,
    make_ik_problem,
    make_planar_chain,
    mod_pi_retraction,
)
from mini_opt_tpu.nonlinear import nls_solve


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    dtype = jnp.float32 if jax.default_backend() == "tpu" else jnp.float64

    chain = make_planar_chain(n_active=2, dtype=dtype)
    params = default_ik_params(dtype, max_iterations=12, max_qp_iterations=6)

    rng = np.random.default_rng(0)
    radius = rng.uniform(0.45, 0.75, B)
    angle = rng.uniform(0.25, 1.25, B)
    targets = jnp.asarray(
        np.stack([radius * np.cos(angle), radius * np.sin(angle)], axis=1), dtype
    )
    x0 = jnp.asarray(np.stack([angle - 0.3, np.full(B, 0.6)], axis=1), dtype)

    def one(t, x):
        problem = make_ik_problem(chain, t, with_joint_limits=True)
        return nls_solve(problem, params, x, retraction=mod_pi_retraction)

    res = jax.jit(jax.vmap(one))(targets, x0)

    final = jax.jit(jax.vmap(lambda x: chain.update(x).translation[:2]))(res.x)
    err = np.abs(np.asarray(final) - np.asarray(targets)).max(axis=1)
    states = np.asarray(res.termination_state)
    print(f"solved {B} IK instances:")
    print(f"  reached target (1e-3): {(err < 1e-3).mean():.1%}")
    print(f"  median error: {np.median(err):.2e}")
    print(f"  termination states: {np.bincount(states, minlength=7).tolist()}")
    print(f"  mean outer iterations: {np.asarray(res.num_iterations).mean():.1f}")


if __name__ == "__main__":
    main()
