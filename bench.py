"""Headline benchmark: batched transform-chain IK solves/s per chip.

North star (BASELINE.json): >= 10,000 batched transform-chain IK solves per
second per TPU v5e chip at solution parity with the reference's CPU solver
(its actuator-limit IK problem, nonlinear_test.cc:828-960: soft cost on
effector y, nonlinear equality on x, joint-limit box constraints, angle-wrap
retraction).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Parity is enforced before timing: instances must place the effector within
1e-3 of the target (the reference test's own acceptance gate).
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

NORTH_STAR = 10_000.0  # solves/s/chip (BASELINE.json)


def build_solver(B, n_active, dtype, max_iterations, max_qp_iterations, kkt_solver):
    from mini_opt_tpu.models.ik import (
        default_ik_params,
        make_ik_problem,
        make_planar_chain,
        mod_pi_retraction,
    )
    from mini_opt_tpu.nonlinear import nls_solve
    import dataclasses

    chain = make_planar_chain(n_active=n_active, dtype=dtype)
    params = default_ik_params(
        dtype, max_iterations=max_iterations, max_qp_iterations=max_qp_iterations
    )
    params = dataclasses.replace(params, kkt_solver=kkt_solver)

    def solve(targets, x0):
        def one(t, x):
            problem = make_ik_problem(chain, t, with_joint_limits=True)
            return nls_solve(problem, params, x, retraction=mod_pi_retraction).x

        return jax.vmap(one)(targets, x0)

    return chain, jax.jit(solve)


def make_instances(B, n_active, dtype, seed=0):
    """Reachable targets spread over the workspace; fixed elbow-up starts."""
    rng = np.random.default_rng(seed)
    reach = 0.4 * n_active
    radius = rng.uniform(0.55, 0.95, B) * reach
    angle = rng.uniform(0.25, 1.25, B)
    targets = np.stack([radius * np.cos(angle), radius * np.sin(angle)], axis=1)
    x0 = np.full((B, n_active), 0.3)
    return jnp.asarray(targets, dtype), jnp.asarray(x0, dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--n-active", type=int, default=2)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--qp-iters", type=int, default=5)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--kkt-solver", default="lu")
    ap.add_argument("--parity-tol", type=float, default=1e-3)
    args = ap.parse_args()

    dtype = jnp.dtype(args.dtype)
    B = args.batch
    chain, solve = build_solver(
        B, args.n_active, dtype, args.iters, args.qp_iters, args.kkt_solver
    )
    targets, x0 = make_instances(B, args.n_active, dtype)

    # Warmup / compile.
    out = solve(targets, x0)
    out.block_until_ready()

    # Parity gate: effector within tol of target (reference IK acceptance,
    # nonlinear_test.cc:946).
    final = jax.jit(jax.vmap(lambda x: chain.update(x).translation[:2]))(out)
    err = np.abs(np.asarray(final, np.float64) - np.asarray(targets, np.float64)).max(
        axis=1
    )
    parity = float((err < args.parity_tol).mean())
    if parity < 0.99:
        print(
            json.dumps(
                {
                    "metric": "batched_ik_solves_per_s_per_chip",
                    "value": 0.0,
                    "unit": "solves/s",
                    "vs_baseline": 0.0,
                    "error": f"parity only {parity:.3f} at tol {args.parity_tol}",
                }
            )
        )
        return 1

    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        solve(targets, x0).block_until_ready()
        times.append(time.perf_counter() - t0)
    best = min(times)
    solves_per_s = B / best

    print(
        json.dumps(
            {
                "metric": "batched_ik_solves_per_s_per_chip",
                "value": round(solves_per_s, 1),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_s / NORTH_STAR, 3),
            }
        )
    )
    print(
        f"# batch={B} parity={parity:.4f} best={best*1e3:.1f}ms "
        f"times_ms={[round(t*1e3,1) for t in times]} backend={jax.default_backend()}",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
