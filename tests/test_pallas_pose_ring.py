"""Blocked pose-ring kernel (ops/pallas_pose_ring.py) vs its oracles.

The blocked tier for SE(2) pose-graph rings: block-tridiagonal-plus-border
(block-Thomas + Schur on pose 0) Gauss-Newton in O(N) register stages,
replacing the register class's O((3N)^3) dense LDL^T unroll that caps the
fused pose-graph family at N~8 (VERDICT round-3 weak #2).

Oracles:
  * one GN step == the dense solve of (J^T J) dx = -g assembled by
    linearize_and_fill_qp on the SAME make_pose_graph_problem instance
    (machine exact -- the bordered elimination is algebraically the dense
    solve);
  * full fixed-trip solves == nls_solve at matched budgets (Armijo tau 0.5);
  * Pallas (interpret) backend == XLA backend;
  * singular geometry surfaces through the flags channel, healthy lanes
    unaffected.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mini_opt_tpu.models.pose_graph import make_pose_graph_problem
from mini_opt_tpu.nonlinear import NLSParams, linearize_and_fill_qp, nls_solve
from mini_opt_tpu.ops.pallas_pose_ring import (
    pose_ring_family,
    pose_ring_solve_batch,
)
from mini_opt_tpu.structs import LineSearchStrategy

N = 8
FAM = pose_ring_family(N)
EDGES = tuple((i, (i + 1) % N) for i in range(N))


def _instances(B, seed=0, noise=0.15, dtype=jnp.float64):
    turn = 2 * np.pi / N
    meas = np.tile([1.0, 0.0, turn], (N, 1))
    th = np.arange(N) * turn
    pts = np.zeros((N, 2))
    for i in range(1, N):
        pts[i] = pts[i - 1] + [np.cos(th[i - 1]), np.sin(th[i - 1])]
    truth = np.column_stack([pts, np.where(th > np.pi, th - 2 * np.pi, th)])
    rng = np.random.default_rng(seed)
    data = meas.ravel() + rng.normal(0, 0.02, (B, 3 * N))
    x0 = truth.ravel() + rng.normal(0, noise, (B, 3 * N))
    return jnp.asarray(data, dtype), jnp.asarray(x0, dtype)


def _general_params(it, ls):
    return NLSParams(
        max_iterations=it,
        max_qp_iterations=1,
        max_line_search_iterations=ls,
        line_search_strategy=LineSearchStrategy.ARMIJO_BACKTRACK,
        armijo_search_tau=0.5,
        record_history=False,
        early_exit=False,
        kkt_solver="ldlt",
    )


def _general_solve(params):
    def gen(d, x):
        prob = make_pose_graph_problem(
            N, EDGES, d.reshape(N, 3), jnp.ones((N,)), anchor_weight=100.0
        )
        r = nls_solve(prob, params, x)
        return r.x, r.errors.f

    return jax.jit(jax.vmap(gen))


def test_gn_step_matches_dense_solve():
    """The bordered block-Thomas solve IS the dense normal-equation solve:
    one iteration at alpha = 1, lambda = 0 (NLSParams default) pinned to
    machine precision against jnp.linalg.solve on the one-hot-assembled G."""
    data, x0 = _instances(8)
    x1 = pose_ring_solve_batch(
        FAM, data, x0, max_iterations=1, ls_iterations=0, backend="xla"
    )

    def dense_step(d, x):
        prob = make_pose_graph_problem(
            N, EDGES, d.reshape(N, 3), jnp.ones((N,)), anchor_weight=100.0
        )
        qp, _ = linearize_and_fill_qp(prob, x, 0.0)
        return x + jnp.linalg.solve(qp.G, -qp.c)

    xd = jax.jit(jax.vmap(dense_step))(data, x0)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(xd), atol=1e-12)


def test_full_solve_matches_general_path():
    data, x0 = _instances(8)
    # Short budget: trajectory still deterministic -> near-bit-exact.
    xk = pose_ring_solve_batch(
        FAM, data, x0, max_iterations=2, ls_iterations=1, backend="xla"
    )
    xg, _ = _general_solve(_general_params(2, 1))(data, x0)
    np.testing.assert_allclose(np.asarray(xk), np.asarray(xg), atol=1e-12)

    # Converged budget: identical optima (flat-valley dz tolerated, costs
    # pinned tight).
    xk, st = pose_ring_solve_batch(
        FAM, data, x0, max_iterations=6, ls_iterations=2,
        return_state=True, backend="xla",
    )
    xg, fg = _general_solve(_general_params(6, 2))(data, x0)
    np.testing.assert_allclose(np.asarray(xk), np.asarray(xg), atol=2e-3)
    # Converged flat valley: iterates drift at ~1e-4 so costs agree to ~3e-4
    # relative, with the kernel's best-merit return never WORSE than the
    # general path beyond roundoff.
    np.testing.assert_allclose(
        np.asarray(st[:, 0]), np.asarray(fg), rtol=1e-3, atol=1e-8
    )
    assert (np.asarray(st[:, 0]) <= np.asarray(fg) + 1e-9).all()
    assert (np.asarray(st[:, 2]) == 0.0).all()


def test_pallas_backend_matches_xla():
    data, x0 = _instances(32, dtype=jnp.float32)
    kw = dict(max_iterations=2, ls_iterations=1, return_state=True)
    x_p, st_p = pose_ring_solve_batch(FAM, data, x0, backend="pallas", **kw)
    x_x, st_x = pose_ring_solve_batch(FAM, data, x0, backend="xla", **kw)
    np.testing.assert_allclose(np.asarray(x_p), np.asarray(x_x), atol=2e-4)
    np.testing.assert_allclose(np.asarray(st_p), np.asarray(st_x), atol=2e-4)


def test_singular_lane_flagged_and_contained():
    """All-identical poses with zero measurements leave the heading gauge
    free along the chain (the anchored system is still solvable) -- instead
    poison one lane with NaN data: flags fire, neighbors unaffected."""
    data, x0 = _instances(8, seed=3)
    data = data.at[5].set(jnp.nan)
    x, st = pose_ring_solve_batch(
        FAM, data, x0, max_iterations=2, ls_iterations=1,
        return_state=True, backend="xla",
    )
    st = np.asarray(st)
    ok = np.ones(8, bool)
    ok[5] = False
    assert np.isfinite(np.asarray(x)[ok]).all()
    assert st[5, 2] >= 1.0, st[5]  # factorization flag fired
    assert (st[ok, 2] == 0.0).all()


def test_larger_rings_converge():
    """N = 12 (beyond the register class's measured range): every lane
    reaches the noise-floor cost with clean flags.  N = 16 and N = 32 are
    exercised ON-CHIP (scripts/bench_extras.py --only pose_ring_16/32,
    converged_frac 1.0 recorded in STATUS): the XLA-CPU compile of the ring
    body is superlinear in N (N=16 >70 CPU-min, N=32 >an hour; the chip's
    Mosaic compiles the same bodies in ~5 s)."""
    for n in (12,):
        fam = pose_ring_family(n)
        turn = 2 * np.pi / n
        meas = np.tile([1.0, 0.0, turn], (n, 1))
        th = np.arange(n) * turn
        pts = np.zeros((n, 2))
        for i in range(1, n):
            pts[i] = pts[i - 1] + [np.cos(th[i - 1]), np.sin(th[i - 1])]
        truth = np.column_stack(
            [pts, np.where(th > np.pi, th - 2 * np.pi, th)]
        )
        rng = np.random.default_rng(n)
        B = 8
        data = jnp.asarray(meas.ravel() + rng.normal(0, 0.02, (B, 3 * n)))
        x0 = jnp.asarray(truth.ravel() + rng.normal(0, 0.1, (B, 3 * n)))
        x, st = pose_ring_solve_batch(
            fam, data, x0, max_iterations=6, ls_iterations=2,
            return_state=True, backend="xla",
        )
        st = np.asarray(st)
        # Noise floor: E edges x 3 dims x sigma^2/2 ~ 1e-3 * n; gate loose.
        assert (st[:, 0] < 2e-3 * n).all(), (n, st[:, 0])
        assert (st[:, 2] == 0.0).all(), (n, st[:, 2])
        assert np.isfinite(np.asarray(x)).all()


def test_models_wrapper_matches_kernel():
    """solve_pose_graph_rings (models/pose_graph.py) is the kernel plus
    (B, N, 3) shaping: results bit-identical to pose_ring_solve_batch."""
    from mini_opt_tpu.models.pose_graph import ring_edges, solve_pose_graph_rings

    assert ring_edges(N) == EDGES
    data, x0 = _instances(4, seed=3)
    kw = dict(max_iterations=2, ls_iterations=1, backend="xla")
    x_k, st_k = pose_ring_solve_batch(
        FAM, data, x0, return_state=True, **kw
    )
    x_w, st_w = solve_pose_graph_rings(
        data.reshape(4, N, 3), x0.reshape(4, N, 3), return_state=True, **kw
    )
    assert x_w.shape == (4, N, 3)
    np.testing.assert_array_equal(np.asarray(x_w).reshape(4, 3 * N), np.asarray(x_k))
    np.testing.assert_array_equal(np.asarray(st_w), np.asarray(st_k))
    x_only = solve_pose_graph_rings(data.reshape(4, N, 3), x0.reshape(4, N, 3), **kw)
    np.testing.assert_array_equal(np.asarray(x_only), np.asarray(x_w))


def _chain_closure_instances(B, n, closure, seed=0, dtype=jnp.float64):
    """Wandering chain ground truth + consistent closure measurement."""
    rng = np.random.default_rng(seed)
    th = np.cumsum(rng.uniform(-0.5, 0.5, (B, n)), axis=1)
    xy = np.cumsum(np.stack([np.cos(th), np.sin(th)], -1) * 0.8, axis=1)
    poses = np.concatenate([xy, th[..., None]], -1)  # (B, n, 3)
    edges = tuple((t, t + 1) for t in range(n - 1)) + (closure,)

    def edge_meas(pi, pj):
        c, s = np.cos(pi[..., 2]), np.sin(pi[..., 2])
        dx = pj[..., 0] - pi[..., 0]
        dy = pj[..., 1] - pi[..., 1]
        return np.stack(
            [c * dx + s * dy, -s * dx + c * dy, pj[..., 2] - pi[..., 2]], -1
        )

    meas = np.stack([edge_meas(poses[:, i], poses[:, j]) for (i, j) in edges], 1)
    meas += rng.normal(scale=0.02, size=meas.shape)
    x0 = poses + rng.normal(scale=0.1, size=poses.shape)
    x0[:, 0] = 0.0
    return (
        jnp.asarray(meas.reshape(B, 3 * n), dtype),
        jnp.asarray(x0.reshape(B, 3 * n), dtype),
        edges,
    )


def test_chain_with_offset_closure_matches_general_path():
    """Round-4 VERDICT item 3: a NON-ring topology -- odometry chain 0..9
    with the single closure (8, 3) -- through the generalized bordered
    block-Thomas (border = pose 3, TWO chain segments), pinned against the
    dense solve and against nls_solve on the same Problem."""
    Nc = 10
    closure = (8, 3)
    famc = pose_ring_family(Nc, closure=closure)
    data, x0, edges = _chain_closure_instances(8, Nc, closure, seed=3)

    # One GN step == the dense normal-equation solve (machine exact).
    x1 = pose_ring_solve_batch(
        famc, data, x0, max_iterations=1, ls_iterations=0, backend="xla"
    )

    def dense_step(d, x):
        prob = make_pose_graph_problem(
            Nc, edges, d.reshape(Nc, 3), jnp.ones((Nc,)), anchor_weight=100.0
        )
        qp, _ = linearize_and_fill_qp(prob, x, 0.0)
        return x + jnp.linalg.solve(qp.G, -qp.c)

    xd = jax.jit(jax.vmap(dense_step))(data, x0)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(xd), atol=1e-11)

    # Full fixed-trip solves == nls_solve at matched budgets.
    def gen_solve(params):
        def gen(d, x):
            prob = make_pose_graph_problem(
                Nc, edges, d.reshape(Nc, 3), jnp.ones((Nc,)),
                anchor_weight=100.0,
            )
            r = nls_solve(prob, params, x)
            return r.x, r.errors.f

        return jax.jit(jax.vmap(gen))

    xk = pose_ring_solve_batch(
        famc, data, x0, max_iterations=2, ls_iterations=1, backend="xla"
    )
    xg, _ = gen_solve(_general_params(2, 1))(data, x0)
    np.testing.assert_allclose(np.asarray(xk), np.asarray(xg), atol=1e-11)

    xk6, st = pose_ring_solve_batch(
        famc, data, x0, max_iterations=6, ls_iterations=2,
        return_state=True, backend="xla",
    )
    xg6, fg = gen_solve(_general_params(6, 2))(data, x0)
    np.testing.assert_allclose(
        np.asarray(st[:, 0]), np.asarray(fg), rtol=1e-3, atol=1e-8
    )
    assert (np.asarray(st[:, 2]) == 0.0).all()


def test_mid_chain_closure_border_cases():
    """Closure endpoint adjacent to the chain start/end and a tight inner
    loop: each topology's one-GN-step == dense (the Brow/Crow accumulation
    and empty/short segments are all exercised)."""
    Nc = 7
    for closure in ((6, 0), (5, 1), (4, 2), (6, 2)):
        famc = pose_ring_family(Nc, closure=closure)
        data, x0, edges = _chain_closure_instances(
            4, Nc, closure, seed=11 + closure[0]
        )
        x1 = pose_ring_solve_batch(
            famc, data, x0, max_iterations=1, ls_iterations=0, backend="xla"
        )

        def dense_step(d, x, _edges=edges):
            prob = make_pose_graph_problem(
                Nc, _edges, d.reshape(Nc, 3), jnp.ones((Nc,)),
                anchor_weight=100.0,
            )
            qp, _ = linearize_and_fill_qp(prob, x, 0.0)
            return x + jnp.linalg.solve(qp.G, -qp.c)

        xd = jax.jit(jax.vmap(dense_step))(data, x0)
        np.testing.assert_allclose(
            np.asarray(x1), np.asarray(xd), atol=1e-11,
            err_msg=f"closure={closure}",
        )


def test_serving_budget_regression_gate():
    """Standing distribution gate for the blocked pose-ring tier (round-4
    VERDICT item 7): fixed seeded ring distribution at the serving budget
    (6, 2) -- terminal cost stats and flags must stay in the recorded band."""
    data, x0 = _instances(64, seed=21)
    _, st = pose_ring_solve_batch(
        FAM, data, x0, max_iterations=6, ls_iterations=2,
        return_state=True, backend="xla",
    )
    st = np.asarray(st)
    noise_gate = 2e-3 * N
    # Recorded band (f64, N=8, budget 6/2, seed 21, B=64).
    assert (st[:, 0] < noise_gate).all(), st[:, 0].max()
    assert np.median(st[:, 0]) < 1e-3, np.median(st[:, 0])
    assert (st[:, 2] == 0.0).all()


def test_multi_closure_matches_general_path():
    """MULTI-closure graphs (round-4 VERDICT item 3, final part): ring
    closure PLUS an inner chord -- border set {0, 3, 8, 11}, three chain
    segments, dense 12x12 Schur on the borders.  One GN step pinned
    machine-exact against the dense normal-equation solve; full solves
    against nls_solve."""
    Nc = 12
    closures = ((11, 0), (3, 8))
    famc = pose_ring_family(Nc, closures=closures)
    assert famc.n_edges == Nc - 1 + 2

    rng = np.random.default_rng(5)
    B = 8
    th = np.cumsum(rng.uniform(-0.5, 0.5, (B, Nc)), axis=1)
    xy = np.cumsum(np.stack([np.cos(th), np.sin(th)], -1) * 0.8, axis=1)
    poses = np.concatenate([xy, th[..., None]], -1)
    edges = tuple((t, t + 1) for t in range(Nc - 1)) + closures

    def edge_meas(pi, pj):
        c, s = np.cos(pi[..., 2]), np.sin(pi[..., 2])
        dx = pj[..., 0] - pi[..., 0]
        dy = pj[..., 1] - pi[..., 1]
        return np.stack(
            [c * dx + s * dy, -s * dx + c * dy, pj[..., 2] - pi[..., 2]], -1
        )

    meas = np.stack([edge_meas(poses[:, i], poses[:, j]) for (i, j) in edges], 1)
    meas += rng.normal(scale=0.02, size=meas.shape)
    data = jnp.asarray(meas.reshape(B, 3 * len(edges)))
    x0n = poses + rng.normal(scale=0.1, size=poses.shape)
    x0n[:, 0] = 0.0
    x0 = jnp.asarray(x0n.reshape(B, 3 * Nc))

    x1 = pose_ring_solve_batch(
        famc, data, x0, max_iterations=1, ls_iterations=0, backend="xla"
    )

    def dense_step(d, x):
        prob = make_pose_graph_problem(
            Nc, edges, d.reshape(len(edges), 3), jnp.ones((len(edges),)),
            anchor_weight=100.0,
        )
        qp, _ = linearize_and_fill_qp(prob, x, 0.0)
        return x + jnp.linalg.solve(qp.G, -qp.c)

    xd = jax.jit(jax.vmap(dense_step))(data, x0)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(xd), atol=1e-11)

    # Full fixed-trip solves == nls_solve at matched budgets.
    def gen_solve(params):
        def gen(d, x):
            prob = make_pose_graph_problem(
                Nc, edges, d.reshape(len(edges), 3),
                jnp.ones((len(edges),)), anchor_weight=100.0,
            )
            r = nls_solve(prob, params, x)
            return r.x, r.errors.f

        return jax.jit(jax.vmap(gen))

    xk = pose_ring_solve_batch(
        famc, data, x0, max_iterations=2, ls_iterations=1, backend="xla"
    )
    xg, _ = gen_solve(_general_params(2, 1))(data, x0)
    np.testing.assert_allclose(np.asarray(xk), np.asarray(xg), atol=1e-11)

    _, st = pose_ring_solve_batch(
        famc, data, x0, max_iterations=6, ls_iterations=2,
        return_state=True, backend="xla",
    )
    _, fg = gen_solve(_general_params(6, 2))(data, x0)
    np.testing.assert_allclose(
        np.asarray(st[:, 0]), np.asarray(fg), rtol=1e-3, atol=1e-8
    )
    assert (np.asarray(st[:, 2]) == 0.0).all()


def test_three_closures_gn_step_matches_dense():
    """Three closures / five borders, including a shared-endpoint pair:
    the Schur assembly accumulates overlapping couplings correctly."""
    Nc = 14
    closures = ((13, 0), (4, 10), (0, 6))
    famc = pose_ring_family(Nc, closures=closures)
    rng = np.random.default_rng(9)
    B = 4
    th = np.cumsum(rng.uniform(-0.4, 0.4, (B, Nc)), axis=1)
    xy = np.cumsum(np.stack([np.cos(th), np.sin(th)], -1) * 0.7, axis=1)
    poses = np.concatenate([xy, th[..., None]], -1)
    edges = tuple((t, t + 1) for t in range(Nc - 1)) + closures

    def edge_meas(pi, pj):
        c, s = np.cos(pi[..., 2]), np.sin(pi[..., 2])
        dx = pj[..., 0] - pi[..., 0]
        dy = pj[..., 1] - pi[..., 1]
        return np.stack(
            [c * dx + s * dy, -s * dx + c * dy, pj[..., 2] - pi[..., 2]], -1
        )

    meas = np.stack([edge_meas(poses[:, i], poses[:, j]) for (i, j) in edges], 1)
    meas += rng.normal(scale=0.02, size=meas.shape)
    data = jnp.asarray(meas.reshape(B, 3 * len(edges)))
    x0n = poses + rng.normal(scale=0.08, size=poses.shape)
    x0 = jnp.asarray(x0n.reshape(B, 3 * Nc))

    x1 = pose_ring_solve_batch(
        famc, data, x0, max_iterations=1, ls_iterations=0, backend="xla"
    )

    def dense_step(d, x):
        prob = make_pose_graph_problem(
            Nc, edges, d.reshape(len(edges), 3), jnp.ones((len(edges),)),
            anchor_weight=100.0,
        )
        qp, _ = linearize_and_fill_qp(prob, x, 0.0)
        return x + jnp.linalg.solve(qp.G, -qp.c)

    xd = jax.jit(jax.vmap(dense_step))(data, x0)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(xd), atol=1e-11)
