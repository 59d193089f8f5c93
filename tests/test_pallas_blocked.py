"""Generic blocked fused tier (ops/pallas_blocked.py) vs its oracles.

The blocked tier must be algorithmically INVISIBLE: the same FusedFamily
run through the register kernel, the blocked kernel, or the general
``nls_solve`` path at matched fixed-trip budgets lands on the same states
(to dtype tolerance, on converged lanes -- chaotic unconverged lanes are
fp-context sensitive, see CLAUDE.md).  Oracle posture per the reference:
qp_test.cc:99-138 oracle-everything.
"""

import dataclasses

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from mini_opt_tpu.ops import kkt
from mini_opt_tpu.ops.pallas_blocked import (
    REGISTER_KKT_MAX,
    blocked_kkt_solve,
    blocked_solve_batch,
)
from mini_opt_tpu.ops.pallas_ik import (
    fused_solve_batch,
    fused_termination_status,
    planar_family,
)


def _quasi_definite_kkt(rng, B, n, m):
    """Random condensed-KKT-shaped systems: PD (1,1) block, equality rows,
    zero (2,2) block -- the matrix class qp.cc:275-316 factors."""
    A = rng.normal(size=(B, n, n))
    G = A @ np.swapaxes(A, 1, 2) + 2.0 * np.eye(n)
    Aeq = rng.normal(size=(B, m, n))
    D = n + m
    H = np.zeros((B, D, D))
    H[:, :n, :n] = G
    H[:, n:, :n] = Aeq
    H[:, :n, n:] = np.swapaxes(Aeq, 1, 2)
    return H


def test_blocked_kkt_solve_matches_ldlt():
    """The blocked batched LDL^T pinned against ops/kkt.py::ldlt (the
    round-4 VERDICT item-1 'done' criterion) at medium D, including
    indefinite quasi-definite KKT systems."""
    rng = np.random.default_rng(0)
    for n, m in ((44, 4), (88, 8)):
        D = n + m
        B = 150  # not a multiple of the 128-lane tile: exercises padding
        H = _quasi_definite_kkt(rng, B, n, m)
        rhs = rng.normal(size=(B, D))
        x = np.asarray(blocked_kkt_solve(jnp.asarray(H), jnp.asarray(rhs)))
        for i in (0, 7, B - 1):
            fact, ok = kkt.ldlt_factorize(jnp.asarray(H[i]))
            assert bool(ok)
            ref = np.asarray(kkt.ldlt_solve(fact, jnp.asarray(rhs[i])))
            scale = np.max(np.abs(ref)) + 1.0
            assert np.max(np.abs(x[i] - ref)) / scale < 1e-10, (n, m, i)


@pytest.mark.slow
def test_blocked_matches_register_kernel():
    """Same family, both tiers, matched budgets: converged lanes agree and
    the convergence fractions match (chaotic unconverged lanes may wrap
    differently; gate on convergence, not trajectories)."""
    rng = np.random.default_rng(1)
    n, B = 6, 256
    fam = planar_family(n, 0.4)
    reach = 0.4 * n
    radius = rng.uniform(0.3, 0.7, B) * reach
    ang = rng.uniform(0.2, 1.2, B)
    tgt = np.stack([radius * np.cos(ang), radius * np.sin(ang)], 1)
    x0 = rng.uniform(0.2, 2.4, size=(B, n))
    kw = dict(max_iterations=12, qp_iterations=4, ls_iterations=2)
    reg = np.asarray(
        fused_solve_batch(fam, jnp.asarray(tgt), jnp.asarray(x0), **kw)
    )
    blk = np.asarray(
        blocked_solve_batch(fam, jnp.asarray(tgt), jnp.asarray(x0), **kw)
    )

    def eff_err(th):
        phi = np.cumsum(th, axis=1)
        p = np.stack([0.4 * np.cos(phi).sum(1), 0.4 * np.sin(phi).sum(1)], 1)
        return np.abs(p - tgt).max(1)

    er, eb = eff_err(reg), eff_err(blk)
    conv = (er < 1e-6) & (eb < 1e-6)
    # Redundant 6-DOF chains trap a fraction of cold uniform starts in BOTH
    # tiers (CLAUDE.md round-2: constrained dead-ends); the parity claim is
    # about the converged bulk.
    assert conv.mean() > 0.75, conv.mean()
    d = np.abs(reg - blk)
    d = np.minimum(d, 2 * np.pi - d).max(axis=1)  # mod-2pi equivalent angles
    # A redundant chain has a manifold of solutions: an occasional lane can
    # converge to a DIFFERENT valid configuration under a different fp
    # schedule.  The bulk must agree exactly in the iterates.
    assert np.quantile(d[conv], 0.95) < 1e-6, np.sort(d[conv])[-4:]
    # Both tiers agree on which lanes converged (same failure set).
    assert abs((er < 1e-6).mean() - (eb < 1e-6).mean()) <= 2.0 / B


def _matched_params(iters, qp, ls):
    from mini_opt_tpu.models.ik import default_ik_params

    return dataclasses.replace(
        default_ik_params(jnp.float64, max_iterations=iters, max_qp_iterations=qp),
        max_line_search_iterations=ls,
        termination_kkt_tolerance=1e-14,
        absolute_exit_tol=1e-30,
        relative_exit_tol=0.0,
        absolute_first_derivative_tol=0.0,
        early_exit=False,
        kkt_solver="ldlt",
    )


@pytest.mark.slow
def test_blocked_dim49_ik_matches_general_solver():
    """A 48-joint planar chain (D = 49 condensed system) -- far past the
    register tier's cap, never hand-fused -- must land on nls_solve's states
    at matched fixed-trip budgets (nonlinear_test.cc oracle posture)."""
    from mini_opt_tpu.models.ik import (
        make_ik_problem,
        make_planar_chain,
        mod_pi_retraction,
    )
    from mini_opt_tpu.nonlinear import nls_solve
    from mini_opt_tpu.structs import BarrierStrategy

    n, B = 48, 24
    rng = np.random.default_rng(2)
    fam = planar_family(n, 0.4)
    assert fam.n + fam.m_eq > REGISTER_KKT_MAX
    reach = 0.4 * n
    radius = rng.uniform(0.35, 0.6, B) * reach
    ang = rng.uniform(0.3, 1.1, B)
    tgt = np.stack([radius * np.cos(ang), radius * np.sin(ang)], 1)
    x0 = np.clip(rng.uniform(0.02, 0.12, size=(B, n)), 0.02, None)
    x0[:, 0] = rng.uniform(-0.3, 0.3, B)

    iters, qp, ls = 6, 3, 2
    blk, state = blocked_solve_batch(
        fam, jnp.asarray(tgt), jnp.asarray(x0),
        max_iterations=iters, qp_iterations=qp, ls_iterations=ls,
        return_state=True,
    )
    blk = np.asarray(blk)

    params = dataclasses.replace(
        _matched_params(iters, qp, ls),
        qp_barrier_strategy=BarrierStrategy.PREDICTOR_CORRECTOR,
    )
    chain = make_planar_chain(n, dtype=jnp.float64)

    def one(t, x):
        problem = make_ik_problem(chain, t, with_joint_limits=True)
        return nls_solve(problem, params, x, retraction=mod_pi_retraction)

    res = jax.vmap(one)(jnp.asarray(tgt), jnp.asarray(x0))
    gen = np.asarray(res.x)

    phi_b = np.cumsum(blk, axis=1)
    eff_b = np.stack(
        [0.4 * np.cos(phi_b).sum(1), 0.4 * np.sin(phi_b).sum(1)], 1
    )
    phi_g = np.cumsum(gen, axis=1)
    eff_g = np.stack(
        [0.4 * np.cos(phi_g).sum(1), 0.4 * np.sin(phi_g).sum(1)], 1
    )
    err_b = np.abs(eff_b - tgt).max(1)
    err_g = np.abs(eff_g - tgt).max(1)
    # Redundant-chain targets at these budgets: both paths converge the bulk.
    conv = (err_b < 1e-5) & (err_g < 1e-5)
    assert conv.mean() >= 0.8, (conv.mean(), np.sort(err_b)[-4:], np.sort(err_g)[-4:])
    # A 48-DOF chain with a 2-D task has a 46-dim solution manifold: the
    # kernels match nls_solve's trajectory only to ~1e-4 per step (the
    # register tier's own state-parity tolerance), and on a redundant
    # manifold that drift is never pulled back -- so the oracle here is the
    # TASK OUTCOME (effector + feasibility), while exact-iterate parity is
    # pinned by the isolated-minimum pose-graph test below.  Iterates must
    # still be in the same basin (no wild wandering).
    d = np.abs(blk - gen)
    d = np.minimum(d, 2 * np.pi - d)
    assert np.median(d[conv]) < 0.05, np.median(d[conv])
    # Bounds respected by the blocked tier (joints 1.. in [0, pi]).
    assert (blk[:, 1:] >= -1e-9).all() and (blk[:, 1:] <= np.pi + 1e-9).all()
    # Per-lane status channel coheres with the measured errors (gates
    # matched to the 1e-5 effector criterion: f = 0.5 ry^2 < 5e-11,
    # eq = |rx| < 1e-5 on a converged lane).
    st = np.asarray(
        fused_termination_status(jnp.asarray(state), f_tol=1e-10, eq_tol=1e-5)
    )
    from mini_opt_tpu.structs import NLSTerminationState

    sat = st == int(NLSTerminationState.SATISFIED_ABSOLUTE_TOL)
    assert (sat & conv).sum() >= conv.sum() * 0.9, (sat.sum(), conv.sum())


def test_fused_solve_batch_dispatches_to_blocked():
    """Past REGISTER_KKT_MAX, fused_solve_batch must route to the blocked
    tier transparently (identical results to calling it directly)."""
    rng = np.random.default_rng(3)
    n, B = 40, 64
    fam = planar_family(n, 0.4)
    tgt = np.stack(
        [rng.uniform(2.0, 6.0, B), rng.uniform(1.0, 4.0, B)], 1
    )
    x0 = rng.uniform(0.05, 0.3, size=(B, n))
    kw = dict(max_iterations=4, qp_iterations=2, ls_iterations=1)
    via_dispatch = np.asarray(
        fused_solve_batch(fam, jnp.asarray(tgt), jnp.asarray(x0), **kw)
    )
    direct = np.asarray(
        blocked_solve_batch(fam, jnp.asarray(tgt), jnp.asarray(x0), **kw)
    )
    assert np.array_equal(via_dispatch, direct)


def test_blocked_flags_singular_factorization():
    """A lane whose Gauss-Newton system is exactly singular (zero Jacobian
    row via a zero-length chain... emulated by duplicate targets at the
    origin with x0 at a kinematic singularity) must raise the QP_INDEFINITE
    flag channel, not poison other lanes."""
    n, B = 40, 8
    fam = planar_family(n, 0.4)
    tgt = np.full((B, 2), 0.1)
    x0 = np.zeros((B, n))
    # Lane 0: fully stretched chain pointing at +x with the target ON the
    # x-axis: dpy/dth has sum(cos)!=0 so not singular -- instead make the
    # data non-finite to exercise containment.
    tgt[0] = np.nan
    x, state = blocked_solve_batch(
        fam, jnp.asarray(tgt), jnp.asarray(x0),
        max_iterations=3, qp_iterations=2, ls_iterations=1,
        return_state=True,
    )
    x = np.asarray(x)
    st = np.asarray(fused_termination_status(jnp.asarray(state)))
    from mini_opt_tpu.structs import NLSTerminationState

    # NaN lane is contained: reported failed, others finite and healthy.
    assert st[0] in (
        int(NLSTerminationState.MAX_LAMBDA),
        int(NLSTerminationState.QP_INDEFINITE),
    )
    assert np.isfinite(x[1:]).all()


@pytest.mark.slow
def test_blocked_pose_graph_16_chain_closure_matches_general():
    """A NEVER-hand-fused medium-N family: 16-pose SE(2) graph with a chain
    + one NON-ring loop closure (4, 12) -- dim 48, no handwritten kernel,
    compiled by family_from_problem and solved by the blocked tier; pinned
    against nls_solve on the same Problem (the round-4 VERDICT item-1
    arbitrary-family criterion; reference structure analog:
    residual.hpp:204-224 sparse scatter)."""
    from mini_opt_tpu.models.pose_graph import (
        make_pose_graph_problem,
        scalar_pose_graph_builder,
    )
    from mini_opt_tpu.nonlinear import nls_solve
    from mini_opt_tpu.ops.fused_auto import family_from_problem
    from mini_opt_tpu.structs import BarrierStrategy

    N = 16
    edges = tuple((t, t + 1) for t in range(N - 1)) + ((4, 12),)
    E = len(edges)
    builder = scalar_pose_graph_builder(N, edges)
    fam = family_from_problem(builder, data_rows=3 * E)
    assert fam.n == 3 * N and fam.n + fam.m_eq > REGISTER_KKT_MAX

    rng = np.random.default_rng(7)
    B = 32
    # Synthesize noisy odometry around a wiggly trajectory + the closure
    # measurement consistent with ground truth.
    th_gt = np.cumsum(rng.uniform(-0.5, 0.5, (B, N)), axis=1)
    xy_gt = np.cumsum(
        np.stack([np.cos(th_gt), np.sin(th_gt)], -1) * 0.5, axis=1
    )
    poses = np.concatenate([xy_gt, th_gt[..., None]], -1)  # (B, N, 3)

    def edge_meas(pi, pj):
        c, s = np.cos(pi[..., 2]), np.sin(pi[..., 2])
        dx = pj[..., 0] - pi[..., 0]
        dy = pj[..., 1] - pi[..., 1]
        return np.stack(
            [c * dx + s * dy, -s * dx + c * dy, pj[..., 2] - pi[..., 2]], -1
        )

    meas = np.stack(
        [edge_meas(poses[:, i], poses[:, j]) for (i, j) in edges], 1
    )  # (B, E, 3)
    meas += rng.normal(scale=0.03, size=meas.shape)
    data = meas.reshape(B, 3 * E)
    x0 = poses + rng.normal(scale=0.1, size=poses.shape)
    x0[:, 0] = 0.0  # anchor start
    x0 = x0.reshape(B, 3 * N)

    iters, qp, ls = 5, 1, 2
    blk = np.asarray(
        blocked_solve_batch(
            fam, jnp.asarray(data), jnp.asarray(x0),
            max_iterations=iters, qp_iterations=qp, ls_iterations=ls,
        )
    )

    params = dataclasses.replace(
        _matched_params(iters, qp, ls),
        qp_barrier_strategy=BarrierStrategy.PREDICTOR_CORRECTOR,
    )

    def one(d, x):
        return nls_solve(builder(d), params, x)

    res = jax.vmap(one)(jnp.asarray(data), jnp.asarray(x0))
    gen = np.asarray(res.x)
    scale = 1.0 + np.abs(gen).max()
    dev = np.abs(blk - gen).max() / scale
    assert dev < 1e-8, dev


def _pose_graph_instances(N, edges, B, seed, noise=0.1):
    """Noisy odometry batch for a pose-graph family (same synthesis as the
    16-pose oracle above): returns (data (B, 3E), x0 (B, 3N))."""
    rng = np.random.default_rng(seed)
    th_gt = np.cumsum(rng.uniform(-0.5, 0.5, (B, N)), axis=1)
    xy_gt = np.cumsum(
        np.stack([np.cos(th_gt), np.sin(th_gt)], -1) * 0.5, axis=1
    )
    poses = np.concatenate([xy_gt, th_gt[..., None]], -1)

    def edge_meas(pi, pj):
        c, s = np.cos(pi[..., 2]), np.sin(pi[..., 2])
        dx = pj[..., 0] - pi[..., 0]
        dy = pj[..., 1] - pi[..., 1]
        return np.stack(
            [c * dx + s * dy, -s * dx + c * dy, pj[..., 2] - pi[..., 2]], -1
        )

    meas = np.stack(
        [edge_meas(poses[:, i], poses[:, j]) for (i, j) in edges], 1
    )
    meas += rng.normal(scale=0.03, size=meas.shape)
    x0 = poses + rng.normal(scale=noise, size=poses.shape)
    x0[:, 0] = 0.0
    return meas.reshape(B, -1), x0.reshape(B, -1)


def test_sparse_assembly_matches_dense_bitexact():
    """The sparsity-hinted stacking (g_pattern / eq_patterns, the round-5
    program-size item) must be algorithmically INVISIBLE: the skipped cells
    are exact structural zeros, so the kernel with hints is bit-identical to
    the same kernel with the hints stripped (dense assembly)."""
    from mini_opt_tpu.models.pose_graph import scalar_pose_graph_builder
    from mini_opt_tpu.ops.fused_auto import family_from_problem

    N = 12
    edges = tuple((t, t + 1) for t in range(N - 1)) + ((2, 9),)
    builder = scalar_pose_graph_builder(N, edges)
    fam = family_from_problem(builder, data_rows=3 * len(edges))
    assert fam.g_pattern is not None and len(fam.g_pattern) < fam.n * (
        fam.n + 1
    ) // 2  # the hint is genuinely sparse for this family
    dense_fam = dataclasses.replace(fam, g_pattern=None, eq_patterns=None)

    data, x0 = _pose_graph_instances(N, edges, B=16, seed=11)
    kw = dict(max_iterations=3, qp_iterations=1, ls_iterations=1)
    sp, sp_state = blocked_solve_batch(
        fam, jnp.asarray(data), jnp.asarray(x0), return_state=True, **kw
    )
    de, de_state = blocked_solve_batch(
        dense_fam, jnp.asarray(data), jnp.asarray(x0), return_state=True, **kw
    )
    assert np.array_equal(np.asarray(sp), np.asarray(de))
    assert np.array_equal(np.asarray(sp_state), np.asarray(de_state))


def test_sparse_assembly_matches_dense_with_equalities():
    """Same invisibility claim on a family WITH equality rows (the chain-IK
    compiler output): exercises the eq_patterns branch of the stacking."""
    from mini_opt_tpu.models.ik import (
        make_planar_chain,
        scalar_chain_ik_builder,
    )
    from mini_opt_tpu.ops.fused_auto import family_from_problem

    n = 8
    chain = make_planar_chain(n, dtype=jnp.float64)
    builder = scalar_chain_ik_builder(chain)
    fam = family_from_problem(builder, data_rows=2)
    assert fam.m_eq >= 1 and fam.eq_patterns is not None
    dense_fam = dataclasses.replace(fam, g_pattern=None, eq_patterns=None)

    rng = np.random.default_rng(12)
    B = 16
    tgt = np.stack([rng.uniform(1.0, 2.5, B), rng.uniform(0.5, 2.0, B)], 1)
    x0 = rng.uniform(0.1, 0.5, size=(B, n))
    kw = dict(max_iterations=4, qp_iterations=2, ls_iterations=1)
    sp = np.asarray(
        blocked_solve_batch(fam, jnp.asarray(tgt), jnp.asarray(x0), **kw)
    )
    de = np.asarray(
        blocked_solve_batch(
            dense_fam, jnp.asarray(tgt), jnp.asarray(x0), **kw
        )
    )
    assert np.array_equal(sp, de)


def test_sparse_assembly_trace_size_reduction():
    """The point of the hints: the stacked-G trace at n = 120 (40-pose
    graph) must carry O(nnz) equations, not O(n^2).  Counted on the pure
    stacking functions (the same code the kernel runs), outside Pallas."""
    from mini_opt_tpu.models.pose_graph import scalar_pose_graph_builder
    from mini_opt_tpu.ops.fused_auto import family_from_problem
    from mini_opt_tpu.ops.pallas_blocked import _cat, _coalesced_row

    N = 40
    edges = tuple((t, t + 1) for t in range(N - 1)) + ((5, 34), (12, 27))
    fam = family_from_problem(
        scalar_pose_graph_builder(N, edges), data_rows=3 * len(edges)
    )
    n = fam.n
    g_cols = [set() for _ in range(n)]
    for a, b in fam.g_pattern:
        g_cols[a].add(b)
        g_cols[b].add(a)

    rng = np.random.default_rng(13)
    L = 128
    tri = {
        (i, j): jnp.asarray(rng.normal(size=(1, L)))
        for (i, j) in fam.g_pattern
    }
    zero = jnp.zeros((1, L))

    def reg(i, j):
        return tri.get((max(i, j), min(i, j)), zero)

    def stack_sparse():
        return jnp.stack(
            [
                _coalesced_row(g_cols[i], lambda j, _i=i: reg(_i, j), n, zero)
                for i in range(n)
            ]
        )

    def stack_dense():
        return jnp.stack([_cat([reg(i, j) for j in range(n)]) for i in range(n)])

    def operands(fn):
        # Program size is operand references, not equation count (one dense
        # row is a single 120-operand concatenate).
        return sum(len(e.invars) for e in jax.make_jaxpr(fn)().eqns)

    sp_ops = operands(stack_sparse)
    de_ops = operands(stack_dense)
    assert np.array_equal(np.asarray(stack_sparse()), np.asarray(stack_dense()))
    # 120 rows x ~9 nonzero cols vs 120 x 120 cells: at least a 5x cut.
    assert sp_ops * 5 < de_ops, (sp_ops, de_ops)


@pytest.mark.slow
def test_blocked_pose_graph_40_matches_general():
    """The new scale the sparsity hints buy: a 40-pose SE(2) graph (n = 120,
    D = 120 -- 2.5x the previous dim-49 record) through the generic blocked
    tier, pinned against nls_solve on the same Problem at matched budgets
    (isolated-minimum oracle posture of the 16-pose test above)."""
    from mini_opt_tpu.models.pose_graph import scalar_pose_graph_builder
    from mini_opt_tpu.nonlinear import nls_solve
    from mini_opt_tpu.ops.fused_auto import family_from_problem
    from mini_opt_tpu.structs import BarrierStrategy

    N = 40
    edges = tuple((t, t + 1) for t in range(N - 1)) + ((5, 34), (12, 27))
    builder = scalar_pose_graph_builder(N, edges)
    fam = family_from_problem(builder, data_rows=3 * len(edges))
    assert fam.n == 3 * N

    data, x0 = _pose_graph_instances(N, edges, B=8, seed=14)
    iters, qp, ls = 4, 1, 2
    blk = np.asarray(
        blocked_solve_batch(
            fam, jnp.asarray(data), jnp.asarray(x0),
            max_iterations=iters, qp_iterations=qp, ls_iterations=ls,
        )
    )

    params = dataclasses.replace(
        _matched_params(iters, qp, ls),
        qp_barrier_strategy=BarrierStrategy.PREDICTOR_CORRECTOR,
    )

    def one(d, x):
        return nls_solve(builder(d), params, x)

    res = jax.vmap(one)(jnp.asarray(data), jnp.asarray(x0))
    gen = np.asarray(res.x)
    scale = 1.0 + np.abs(gen).max()
    dev = np.abs(blk - gen).max() / scale
    assert dev < 1e-8, dev


def test_serving_wrappers_compose_with_blocked_dispatch():
    """fused_solve_refined / fused_solve_multi_start reach the blocked tier
    through the same fused_solve_batch dispatch (the serving wrappers are
    tier-agnostic)."""
    from mini_opt_tpu.ops.pallas_ik import (
        fused_solve_multi_start,
        fused_solve_refined,
    )

    rng = np.random.default_rng(4)
    n, B = 40, 64
    fam = planar_family(n, 0.4)
    tgt = jnp.asarray(
        np.stack([rng.uniform(2.0, 6.0, B), rng.uniform(1.0, 4.0, B)], 1)
    )
    x0 = jnp.asarray(rng.uniform(0.05, 0.3, size=(B, n)))
    kw = dict(max_iterations=2, qp_iterations=1, ls_iterations=1)

    def refine(d64, x64):
        return x64  # identity refiner: wrapper plumbing only

    xr = fused_solve_refined(fam, tgt, x0, refine, refine_k=8, **kw)
    assert xr.shape == (B, n) and np.isfinite(np.asarray(xr)).all()

    starts = jnp.stack([x0, x0 * 0.5], axis=1)  # (B, 2, n)
    xm = fused_solve_multi_start(fam, tgt, starts, **kw)
    assert xm.shape == (B, n) and np.isfinite(np.asarray(xm)).all()
