"""Batch/distributed layer tests on the virtual 8-device CPU mesh.

The reference has no parallelism to mirror (SURVEY.md section 2.3); these
tests pin down the two scaling axes of the rebuild: sharded scenario batches
(dp) and psum-reduced residual partitioning within an instance (mp).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mini_opt_tpu.models.ik import (
    default_ik_params,
    make_ik_problem,
    make_planar_chain,
    make_waypoint_ik_problem,
    mod_pi_retraction,
    solve_ik_batch,
)
from mini_opt_tpu.nonlinear import NLSParams, Problem, nls_solve
from mini_opt_tpu.parallel.batch import make_mesh, shard_solve_batch, solve_batch
from jax.sharding import Mesh, PartitionSpec as P
from functools import partial


def _targets(b, seed=0):
    rng = np.random.default_rng(seed)
    angles = rng.uniform(0.3, 1.2, b)
    radius = rng.uniform(0.35, 0.75, b)
    return np.stack([radius * np.cos(angles), radius * np.sin(angles)], axis=1)


def test_solve_ik_batch_reaches_targets():
    B = 64
    targets = jnp.asarray(_targets(B))
    x0 = jnp.full((B, 2), 0.3, jnp.float64)
    chain = make_planar_chain(2, dtype=jnp.float64)
    params = default_ik_params(jnp.float64, max_iterations=30, max_qp_iterations=6)
    res = jax.jit(
        lambda t, x: solve_ik_batch(t, x, chain=chain, params=params)
    )(targets, x0)
    final = jax.vmap(lambda x: chain.update(x).translation[:2])(res.x)
    err = np.abs(np.asarray(final) - np.asarray(targets)).max(axis=1)
    assert (err < 1e-3).all(), f"{(err >= 1e-3).sum()} failed, max {err.max()}"


def test_shard_solve_batch_matches_unsharded():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh({"dp": 8})
    B = 32
    targets = jnp.asarray(_targets(B, seed=3))
    x0 = jnp.full((B, 2), 0.4, jnp.float64)
    chain = make_planar_chain(2, dtype=jnp.float64)
    params = default_ik_params(jnp.float64, max_iterations=10, max_qp_iterations=5)

    def problem_fn(target):
        return make_ik_problem(chain, target, with_joint_limits=True)

    res_plain = jax.jit(
        lambda x, t: solve_batch(problem_fn, params, x, t, retraction=mod_pi_retraction)
    )(x0, targets)
    res_shard = jax.jit(
        lambda x, t: shard_solve_batch(
            mesh, problem_fn, params, x, t, retraction=mod_pi_retraction
        )
    )(x0, targets)

    np.testing.assert_allclose(
        np.asarray(res_shard.x), np.asarray(res_plain.x), atol=1e-12
    )
    np.testing.assert_array_equal(
        np.asarray(res_shard.termination_state), np.asarray(res_plain.termination_state)
    )


def test_shard_fused_solve_batch_matches_unsharded():
    """The SERVING tier under shard_map (VERDICT round-2 item 2): the fused
    whole-solver Pallas kernel runs per-shard on a dp mesh and must agree
    with the single-device kernel call. Gate on convergence (not bitwise
    trajectories: per-shard padding changes the fp context of chaotic lanes,
    see CLAUDE.md)."""
    from mini_opt_tpu.models.ik import make_planar_chain as _mpc
    from mini_opt_tpu.ops.pallas_ik import (
        fused_solve_batch,
        fused_termination_status,
        planar_family,
    )
    from mini_opt_tpu.parallel.batch import shard_fused_solve_batch
    from mini_opt_tpu.structs import NLSTerminationState

    mesh = make_mesh({"dp": 8})
    B = 64
    rng = np.random.default_rng(11)
    angles = rng.uniform(0.3, 1.2, B)
    radius = rng.uniform(0.45, 0.75, B)
    targets = jnp.asarray(
        np.stack([radius * np.cos(angles), radius * np.sin(angles)], 1),
        jnp.float32,
    )
    x0 = jnp.asarray(
        np.stack([angles + rng.uniform(-0.2, 0.2, B), np.full(B, 1.2)], 1),
        jnp.float32,
    )
    family = planar_family(2, 0.4)

    x_plain, st_plain = fused_solve_batch(
        family, targets, x0, return_state=True
    )
    x_shard, st_shard = shard_fused_solve_batch(
        mesh, family, targets, x0, return_state=True
    )
    assert x_shard.shape == (B, 2) and st_shard.shape == (B, 3)

    chain = _mpc(2, dtype=jnp.float64)
    for x in (x_plain, x_shard):
        final = jax.vmap(lambda v: chain.update(v).translation[:2])(
            jnp.asarray(np.asarray(x), jnp.float64)
        )
        err = np.abs(np.asarray(final) - np.asarray(targets)).max(axis=1)
        assert (err < 1e-3).all(), f"worst {np.sort(err)[-4:]}"
    # Bulk bitwise agreement (chaotic lanes may flip with fp context).
    dx = np.abs(np.asarray(x_shard) - np.asarray(x_plain)).max(axis=1)
    assert np.quantile(dx, 0.9) < 1e-5, np.sort(dx)[-6:]
    # Per-lane status agrees across sharding.
    s_p = np.asarray(fused_termination_status(st_plain, f_tol=1e-5, eq_tol=1e-3))
    s_s = np.asarray(fused_termination_status(st_shard, f_tol=1e-5, eq_tol=1e-3))
    assert (s_p == int(NLSTerminationState.SATISFIED_ABSOLUTE_TOL)).all()
    np.testing.assert_array_equal(s_p, s_s)


def test_shard_nls_fused_qp_matches_unsharded():
    """qp_solver="pallas_fused" (the custom_vmap-dispatched fused QP kernel
    inside the general path) composes with shard_map on the dp mesh."""
    import dataclasses

    from mini_opt_tpu.structs import BarrierStrategy

    mesh = make_mesh({"dp": 8})
    B = 16
    rng = np.random.default_rng(7)
    angles = rng.uniform(0.3, 1.2, B)
    radius = rng.uniform(0.45, 0.75, B)
    targets = jnp.asarray(
        np.stack([radius * np.cos(angles), radius * np.sin(angles)], 1),
        jnp.float32,
    )
    x0 = jnp.asarray(np.stack([angles, np.full(B, 1.2)], 1), jnp.float32)
    chain = make_planar_chain(2, dtype=jnp.float32)
    params = dataclasses.replace(
        default_ik_params(jnp.float32, max_iterations=12, max_qp_iterations=4),
        qp_solver="pallas_fused",
        qp_barrier_strategy=BarrierStrategy.PREDICTOR_CORRECTOR,
        early_exit=False,
        record_history=False,
    )

    def problem_fn(target):
        return make_ik_problem(chain, target, with_joint_limits=True)

    res_plain = jax.jit(
        lambda x, t: solve_batch(problem_fn, params, x, t, retraction=mod_pi_retraction)
    )(x0, targets)
    res_shard = jax.jit(
        lambda x, t: shard_solve_batch(
            mesh, problem_fn, params, x, t, retraction=mod_pi_retraction
        )
    )(x0, targets)
    # Subject under test: composition with shard_map, i.e. shard == plain.
    # (Convergence of every lane at this budget is the fused-QP tests' job.)
    dx = np.abs(np.asarray(res_shard.x) - np.asarray(res_plain.x)).max(axis=1)
    assert np.quantile(dx, 0.9) < 1e-5, np.sort(dx)[-6:]
    final = jax.vmap(lambda x: chain.update(x).translation[:2])(res_shard.x)
    err = np.abs(np.asarray(final) - np.asarray(targets)).max(axis=1)
    assert (err < 1e-3).mean() >= 0.9, f"worst {np.sort(err)[-4:]}"


def test_distributed_residual_partition_matches_single_device():
    """An instance with W waypoint blocks partitioned over mp=8 must produce
    the same iterates as the single-device assembly (psum-reduced J^T J)."""
    mesh = make_mesh({"mp": 8})
    W = 16
    rng = np.random.default_rng(5)
    chain = make_planar_chain(2, dtype=jnp.float64)
    offsets = jnp.asarray(rng.uniform(-0.05, 0.05, (W, 3)))
    base_target = np.array([0.45, 0.55, 0.0])
    targets = jnp.asarray(base_target + rng.uniform(-0.02, 0.02, (W, 3)))
    weights = jnp.asarray(rng.uniform(0.5, 1.5, W))
    x0 = jnp.asarray([0.4, 0.3])
    params = default_ik_params(jnp.float64, max_iterations=15, max_qp_iterations=3)

    problem_full = make_waypoint_ik_problem(chain, offsets, targets, weights)
    res_full = jax.jit(
        lambda x: nls_solve(problem_full, params, x, retraction=mod_pi_retraction)
    )(x0)

    @partial(
        jax.shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=(None, P("mp"), P("mp"), P("mp")),
        out_specs=P(),
    )
    def run(x, off_local, tgt_local, w_local):
        problem = make_waypoint_ik_problem(chain, off_local, tgt_local, w_local)
        return nls_solve(
            problem, params, x, retraction=mod_pi_retraction, axis_name="mp"
        )

    res_dist = jax.jit(run)(x0, offsets, targets, weights)

    np.testing.assert_allclose(
        np.asarray(res_dist.x), np.asarray(res_full.x), atol=1e-9
    )
    assert int(res_dist.termination_state) == int(res_full.termination_state)
    assert int(res_dist.num_iterations) == int(res_full.num_iterations)


def test_graft_entry_compiles():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()
    ge.dryrun_multichip(8)


def test_shard_blocked_tier_matches_unsharded():
    """The GENERIC blocked tier (ops/pallas_blocked.py, auto-dispatched past
    REGISTER_KKT_MAX) under shard_map on the dp mesh == the single-device
    call (round-4 VERDICT item 5: blocked kernels on the distributed
    serving surface)."""
    from mini_opt_tpu.ops.pallas_ik import fused_solve_batch, planar_family
    from mini_opt_tpu.ops.pallas_blocked import REGISTER_KKT_MAX
    from mini_opt_tpu.parallel.batch import shard_fused_solve_batch

    mesh = make_mesh({"dp": 8})
    n, B = 40, 16
    family = planar_family(n, 0.4)
    assert family.n + family.m_eq > REGISTER_KKT_MAX
    rng = np.random.default_rng(13)
    targets = jnp.asarray(
        np.stack([rng.uniform(2.0, 6.0, B), rng.uniform(1.0, 4.0, B)], 1)
    )
    x0 = jnp.asarray(rng.uniform(0.05, 0.3, size=(B, n)))
    kw = dict(max_iterations=2, qp_iterations=1, ls_iterations=1)
    plain = fused_solve_batch(family, targets, x0, **kw)
    shard = shard_fused_solve_batch(mesh, family, targets, x0, **kw)
    # Per-device shards are 2 lanes of a 128-lane tile padded by edge
    # replication; real-lane results must agree exactly with the unsharded
    # call (identical per-lane register programs).
    np.testing.assert_allclose(
        np.asarray(shard), np.asarray(plain), atol=1e-10
    )


def test_shard_sparse_hinted_family_matches_unsharded():
    """A SPARSITY-HINTED compiled family (round-5 second session:
    FusedFamily.g_pattern assembly) through the same sharded dispatch ==
    unsharded -- the hints ride the distributed serving surface unchanged."""
    from mini_opt_tpu.models.pose_graph import scalar_pose_graph_builder
    from mini_opt_tpu.ops.fused_auto import family_from_problem
    from mini_opt_tpu.ops.pallas_ik import fused_solve_batch
    from mini_opt_tpu.ops.pallas_blocked import REGISTER_KKT_MAX
    from mini_opt_tpu.parallel.batch import shard_fused_solve_batch

    mesh = make_mesh({"dp": 8})
    N = 12
    edges = tuple((t, t + 1) for t in range(N - 1)) + ((2, 9),)
    builder = scalar_pose_graph_builder(N, edges)
    family = family_from_problem(builder, data_rows=3 * len(edges))
    assert family.n + family.m_eq > REGISTER_KKT_MAX
    assert family.g_pattern is not None

    rng = np.random.default_rng(17)
    B = 16
    meas = rng.normal(scale=0.3, size=(B, 3 * len(edges)))
    x0 = rng.normal(scale=0.5, size=(B, family.n))
    kw = dict(max_iterations=2, qp_iterations=1, ls_iterations=1)
    plain = fused_solve_batch(
        family, jnp.asarray(meas), jnp.asarray(x0), **kw
    )
    shard = shard_fused_solve_batch(
        mesh, family, jnp.asarray(meas), jnp.asarray(x0), **kw
    )
    np.testing.assert_allclose(
        np.asarray(shard), np.asarray(plain), atol=1e-10
    )


def test_shard_fused_mpc_matches_unsharded():
    """The blocked MPC kernel sharded over the plant fleet == unsharded."""
    from mini_opt_tpu.models import mpc
    from mini_opt_tpu.ops.pallas_mpc import (
        cartpole_mpc_family,
        fused_mpc_solve_batch,
    )
    from mini_opt_tpu.parallel.batch import shard_fused_mpc_solve_batch

    mesh = make_mesh({"dp": 8})
    T, dt = 3, 0.05
    fam = cartpole_mpc_family(T, dt)
    B = 16
    x0s = jax.random.uniform(
        jax.random.PRNGKey(7), (B, 4), minval=-0.3, maxval=0.3
    ).astype(jnp.float64)
    z0s = jax.vmap(lambda x: mpc.initial_guess(mpc.CartPole(), x, T, dt))(x0s)
    kw = dict(
        max_iterations=1, qp_iterations=1, ls_iterations=1,
        return_state=True, backend="xla",
    )
    z_plain, st_plain = fused_mpc_solve_batch(fam, x0s, z0s, **kw)
    z_shard, st_shard = shard_fused_mpc_solve_batch(mesh, fam, x0s, z0s, **kw)
    np.testing.assert_allclose(np.asarray(z_shard), np.asarray(z_plain), atol=1e-12)
    np.testing.assert_allclose(np.asarray(st_shard), np.asarray(st_plain), atol=1e-12)


def test_shard_pose_ring_matches_unsharded():
    """The blocked pose-ring kernel sharded over graph batches == unsharded."""
    from mini_opt_tpu.ops.pallas_pose_ring import (
        pose_ring_family,
        pose_ring_solve_batch,
    )
    from mini_opt_tpu.parallel.batch import shard_pose_ring_solve_batch

    N, B = 6, 16
    mesh = make_mesh({"dp": 8})
    fam = pose_ring_family(N)
    rng = np.random.default_rng(17)
    th = np.cumsum(rng.uniform(-0.4, 0.4, (B, N)), axis=1)
    data = np.zeros((B, 3 * N))
    for e in range(N):
        data[:, 3 * e] = 0.5 + rng.normal(scale=0.02, size=B)
        data[:, 3 * e + 2] = rng.uniform(-0.3, 0.3, B)
    x0 = rng.normal(scale=0.2, size=(B, 3 * N))
    kw = dict(max_iterations=3, ls_iterations=1, return_state=True, backend="xla")
    x_plain, st_plain = pose_ring_solve_batch(
        fam, jnp.asarray(data), jnp.asarray(x0), **kw
    )
    x_shard, st_shard = shard_pose_ring_solve_batch(
        mesh, fam, jnp.asarray(data), jnp.asarray(x0), **kw
    )
    np.testing.assert_allclose(np.asarray(x_shard), np.asarray(x_plain), atol=1e-12)
    np.testing.assert_allclose(np.asarray(st_shard), np.asarray(st_plain), atol=1e-12)
