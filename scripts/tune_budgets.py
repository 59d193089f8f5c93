"""Run the serving-budget autotuner on the fused families (on-chip).

Automates the manual iteration-budget studies (ROADMAP round-2 table) with
``mini_opt_tpu.tuning.tune_serving_budget``: for each fused serving family,
walk the (outer, qp, ls) lattice down from a reference-strength anchor under
the family's own quality gate and print the converged minimum + margins as
one JSON row per family (recorded in STATUS.md).

Gates mirror the bench gates the families already serve under:
  * planar IK   -- effector |err|_inf <= 1e-3 for EVERY instance (bench.py
                   parity gate), anchor (10, 6, 2);
  * spatial IK  -- effector err <= 1e-3 for >= 99.8% (the distribution's
                   known irreducible chaotic tail is ~0.14%; STATUS round-2),
                   anchor (12, 6, 2);
  * pose graph  -- terminal cost < 1e-2 for EVERY lane (bench_extras
                   converged_frac_1e2 gate at the 0.02-noise floor),
                   anchor (10, 4, 2).

Usage: python scripts/tune_budgets.py [--only planar|spatial|pose_graph]
                                      [--batch 8192]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from mini_opt_tpu.tuning import budget_cost, parity_gate, tune_serving_budget

# Persistent compile cache: the tuner compiles one kernel per lattice point;
# reruns (and the final verification pass) must not re-pay remote compiles.
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def _emit(family: str, res, wall_s: float):
    print(
        json.dumps(
            {
                "metric": "tuned_serving_budget",
                "family": family,
                "budget": list(res.budget),
                "anchor": list(res.max_budget),
                "n_evaluations": res.n_evaluations,
                "cost_vs_anchor": round(
                    budget_cost(res.budget) / budget_cost(res.max_budget), 4
                ),
                "margin_at_budget": round(res.margin_at(res.budget), 6),
                "trace": [
                    {"budget": list(p.budget), "ok": p.ok, "margin": round(p.margin, 6)}
                    for p in res.trace
                ],
                "wall_s": round(wall_s, 1),
            }
        ),
        flush=True,
    )


def tune_planar(B: int):
    from bench import make_instances
    from mini_opt_tpu import family_from_problem, fused_solve_batch
    from mini_opt_tpu.models.ik import scalar_planar_ik_builder
    from mini_opt_tpu.ops.pallas_ik import _mod_pi

    family = family_from_problem(
        scalar_planar_ik_builder(2),
        data_rows=2,
        retract=lambda th: [_mod_pi(t) for t in th],
    )
    targets, x0 = make_instances(B, 2, jnp.float32, seed=3)
    L = 0.4

    def solve(outer, qp, ls):
        out = fused_solve_batch(
            family, targets, x0,
            max_iterations=outer, qp_iterations=qp, ls_iterations=ls,
        )
        return np.asarray(jax.block_until_ready(out))

    def effector_err(sol, ref):
        th = np.asarray(sol)
        px = L * (np.cos(th[:, 0]) + np.cos(th[:, 0] + th[:, 1]))
        py = L * (np.sin(th[:, 0]) + np.sin(th[:, 0] + th[:, 1]))
        t = np.asarray(targets)
        return np.maximum(np.abs(px - t[:, 0]), np.abs(py - t[:, 1]))

    t0 = time.time()
    res = tune_serving_budget(
        solve,
        parity_gate(1e-3, frac=1.0, metric=effector_err),
        max_budget=(10, 6, 2),
        min_budget=(1, 1, 0),
        verbose=True,
    )
    _emit("planar_ik", res, time.time() - t0)


def tune_spatial(B: int, n: int = 3):
    from mini_opt_tpu.models.ik import make_spatial_chain
    from mini_opt_tpu.ops.pallas_ik import fused_spatial_ik_solve_batch

    chain = make_spatial_chain(n, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    th_true = np.stack(
        [rng.uniform(-1.2, 1.2, B)]
        + [rng.uniform(0.25, 2.6, B) for _ in range(n - 1)],
        1,
    )
    fkv = jax.jit(jax.vmap(lambda t: chain.update(t).translation))
    targets = np.asarray(fkv(jnp.asarray(th_true)))
    x0 = th_true + rng.uniform(-0.25, 0.25, (B, n))
    x0[:, 1:] = np.clip(x0[:, 1:], 0.05, np.pi - 0.05)
    t32 = jnp.asarray(targets, jnp.float32)
    x32 = jnp.asarray(x0, jnp.float32)

    def solve(outer, qp, ls):
        out = fused_spatial_ik_solve_batch(
            t32, x32, max_iterations=outer, qp_iterations=qp, ls_iterations=ls,
        )
        return np.asarray(jax.block_until_ready(out))

    def effector_err(sol, ref):
        final = np.asarray(fkv(jnp.asarray(np.asarray(sol), jnp.float64)))
        return np.abs(final - targets).max(axis=1)

    t0 = time.time()
    res = tune_serving_budget(
        solve,
        parity_gate(1e-3, frac=0.998, metric=effector_err),
        max_budget=(12, 6, 2),
        min_budget=(1, 1, 0),
        verbose=True,
    )
    _emit("spatial_ik", res, time.time() - t0)


def tune_pose_graph(B: int, n_poses: int = 4):
    from mini_opt_tpu import family_from_problem
    from mini_opt_tpu.models.pose_graph import scalar_pose_graph_builder
    from mini_opt_tpu.ops.pallas_ik import fused_solve_batch

    N = n_poses
    edges = tuple((i, (i + 1) % N) for i in range(N))
    turn = 2 * np.pi / N
    meas = np.tile([1.0, 0.0, turn], (N, 1))
    th = np.arange(N) * turn
    pts = np.zeros((N, 2))
    for i in range(1, N):
        pts[i] = pts[i - 1] + [np.cos(th[i - 1]), np.sin(th[i - 1])]
    truth = np.column_stack([pts, np.where(th > np.pi, th - 2 * np.pi, th)])
    builder = scalar_pose_graph_builder(N, edges)
    fam = family_from_problem(builder, data_rows=3 * N)
    rng = np.random.default_rng(0)
    data = jnp.asarray(
        (meas.ravel() + rng.normal(0, 0.02, (B, 3 * N))).astype(np.float32)
    )
    x0 = jnp.asarray(
        (truth.ravel() + rng.normal(0, 0.15, (B, 3 * N))).astype(np.float32)
    )

    def solve(outer, qp, ls):
        _, state = fused_solve_batch(
            fam, data, x0,
            max_iterations=outer, qp_iterations=qp, ls_iterations=ls,
            return_state=True,
        )
        return np.asarray(jax.block_until_ready(state))[:, 0]  # terminal cost

    t0 = time.time()
    res = tune_serving_budget(
        solve,
        parity_gate(1e-2, frac=1.0, metric=lambda sol, ref: np.asarray(sol)),
        max_budget=(10, 4, 2),
        min_budget=(1, 1, 0),
        verbose=True,
    )
    _emit(f"pose_graph_n{N}", res, time.time() - t0)


def tune_mpc(B: int = 1024, horizon: int = 20, periods: int = 64):
    """Blocked MPC kernel (round-4 VERDICT item 7): tune the WARM per-period
    servo budget under the bench's stabilization gate (|theta_final| <= 0.05
    for every plant after ``periods`` periods from a cold-solved start) --
    the gate is absolute (what the fleet serves), not anchor-relative."""
    from mini_opt_tpu.models import mpc as mpc_model
    from mini_opt_tpu.ops.pallas_mpc import (
        cartpole_mpc_family,
        fused_mpc_servo_batch,
        fused_mpc_solve_batch,
    )

    fam = cartpole_mpc_family(horizon, 0.05)
    rng = np.random.default_rng(0)
    x0 = np.zeros((B, 4), np.float32)
    x0[:, 0] = rng.uniform(-0.5, 0.5, B)
    x0[:, 2] = rng.uniform(-0.35, 0.35, B)
    x0j = jnp.asarray(x0)
    z0 = jax.vmap(
        lambda x: mpc_model.initial_guess(mpc_model.CartPole(), x, horizon, 0.05)
    )(x0j)
    z1 = jax.block_until_ready(
        fused_mpc_solve_batch(
            fam, x0j, z0, max_iterations=8, qp_iterations=3, ls_iterations=2
        )
    )

    def solve(outer, qp, ls):
        xf, _, _ = fused_mpc_servo_batch(
            fam, x0j, z1, periods, max_iterations=outer, qp_iterations=qp,
            ls_iterations=ls,
        )
        return np.asarray(jax.block_until_ready(xf))[:, 2]  # theta_final

    t0 = time.time()
    res = tune_serving_budget(
        solve,
        parity_gate(0.05, frac=1.0, metric=lambda sol, ref: np.abs(sol)),
        max_budget=(4, 3, 2),
        min_budget=(1, 1, 0),
        verbose=True,
    )
    _emit(f"mpc_servo_T{horizon}", res, time.time() - t0)


def tune_pose_ring(B: int = 8192, n_poses: int = 16):
    """Blocked pose-ring kernel: (outer, ls) lattice (no inner-QP axis --
    the kernel is plain damped GN), gated on the bench's absolute noise-floor
    cost for every graph."""
    from mini_opt_tpu.ops.pallas_pose_ring import (
        pose_ring_family,
        pose_ring_solve_batch,
    )

    N = n_poses
    fam = pose_ring_family(N)
    turn = 2 * np.pi / N
    meas = np.tile([1.0, 0.0, turn], (N, 1))
    th = np.arange(N) * turn
    pts = np.zeros((N, 2))
    for i in range(1, N):
        pts[i] = pts[i - 1] + [np.cos(th[i - 1]), np.sin(th[i - 1])]
    truth = np.column_stack([pts, np.where(th > np.pi, th - 2 * np.pi, th)])
    rng = np.random.default_rng(0)
    data = jnp.asarray(
        (meas.ravel() + rng.normal(0, 0.02, (B, 3 * N))).astype(np.float32)
    )
    x0 = jnp.asarray(
        (truth.ravel() + rng.normal(0, 0.15, (B, 3 * N))).astype(np.float32)
    )

    def solve(outer, qp, ls):
        del qp  # no inner-QP axis in the GN ring kernel
        _, state = pose_ring_solve_batch(
            fam, data, x0, max_iterations=outer, ls_iterations=ls,
            return_state=True,
        )
        return np.asarray(jax.block_until_ready(state))[:, 0]

    t0 = time.time()
    res = tune_serving_budget(
        solve,
        parity_gate(
            2e-3 * N, frac=1.0, metric=lambda sol, ref: np.asarray(sol)
        ),
        max_budget=(10, 1, 2),
        min_budget=(1, 1, 0),
        verbose=True,
    )
    _emit(f"pose_ring_n{N}", res, time.time() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument(
        "--only",
        default=None,
        choices=[
            None, "planar", "spatial", "pose_graph", "mpc", "pose_ring",
        ],
    )
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    if args.only in (None, "planar"):
        tune_planar(args.batch)
    if args.only in (None, "spatial"):
        tune_spatial(args.batch)
    if args.only in (None, "pose_graph"):
        tune_pose_graph(args.batch)
    if args.only in (None, "mpc"):
        tune_mpc()
    if args.only in (None, "pose_ring"):
        tune_pose_ring(args.batch)


if __name__ == "__main__":
    main()
