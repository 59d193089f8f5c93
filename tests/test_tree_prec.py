"""Spanning-chain block-tridiagonal preconditioner (ops/tree_prec.py).

Testing idioms per SURVEY.md §4: dense brute-force oracles for the
structured solve, and iteration-count-style regression gates (here: CG
budget needed to reach the converged cost) rather than wall-clock gates.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mini_opt_tpu.ops.tree_prec import (
    block_tridiag_apply,
    block_tridiag_factor,
    chain_block_hessian,
    make_chain_tree_preconditioner,
    spanning_chain_order,
)


def _random_block_tridiag(n, d, seed=0):
    """Random SPD block-tridiagonal matrix as (Hd, Hu) plus its dense form."""
    rng = np.random.default_rng(seed)
    Hu = rng.normal(size=(n - 1, d, d))
    Hd = np.zeros((n, d, d))
    for i in range(n):
        A = rng.normal(size=(d, d))
        Hd[i] = A @ A.T + (2.0 * d) * np.eye(d)  # diagonally dominant -> SPD
    dense = np.zeros((n * d, n * d))
    for i in range(n):
        dense[i * d:(i + 1) * d, i * d:(i + 1) * d] = Hd[i]
    for i in range(n - 1):
        dense[i * d:(i + 1) * d, (i + 1) * d:(i + 2) * d] = Hu[i]
        dense[(i + 1) * d:(i + 2) * d, i * d:(i + 1) * d] = Hu[i].T
    return jnp.asarray(Hd), jnp.asarray(Hu), dense


def test_factor_apply_matches_dense_solve():
    """Oracle: associative-scan substitution == dense solve of the same
    block-tridiagonal matrix, across block sizes (2: chordal stages, 3:
    SE(2), 6: SE(3)) and n=1 (degenerate single block)."""
    for n, d, seed in [(17, 3, 0), (9, 6, 1), (33, 2, 2), (1, 3, 3), (2, 4, 4)]:
        Hd, Hu, dense = _random_block_tridiag(n, d, seed)
        fact = block_tridiag_factor(Hd, Hu)
        assert bool(fact.ok)
        rng = np.random.default_rng(100 + seed)
        r = rng.normal(size=(n, d))
        x = block_tridiag_apply(fact, jnp.asarray(r))
        x_ref = np.linalg.solve(dense, r.ravel()).reshape(n, d)
        np.testing.assert_allclose(np.asarray(x), x_ref, atol=1e-10)


def test_factor_flags_indefinite_block():
    """A non-SPD diagonal block is reported through ok=False (status-code
    discipline: no exceptions inside jitted code)."""
    Hd, Hu, _ = _random_block_tridiag(5, 3, seed=5)
    Hd = Hd.at[3].set(-jnp.eye(3))
    fact = block_tridiag_factor(Hd, Hu)
    assert not bool(fact.ok)


def test_chain_block_hessian_matches_dense_blocks():
    """chain_block_hessian == the diagonal and superdiagonal blocks of the
    full Gauss-Newton Hessian J^T J of the edge set (loop-closure edges land
    only on the diagonal: their couplings are off-tridiagonal)."""
    from test_pose_graph import _circle_graph

    from mini_opt_tpu.models.pose_graph import (
        _edge_data,
        _edge_indices,
        _edge_residual,
    )

    n = 24
    gt, edges, meas, x0 = _circle_graph(n, seed=3, noise=0.02, loop_every=8)
    w = jnp.ones((len(edges),))
    data = _edge_data(jnp.asarray(meas), w)
    idx = jnp.asarray(np.asarray(_edge_indices(edges), np.int32))
    x = jnp.asarray(x0.ravel())

    Hd, Hu = chain_block_hessian(_edge_residual, x, idx, data, n, 3)

    def stacked(xx):
        return jax.vmap(lambda ri, rd: _edge_residual(xx[ri], rd))(
            idx, data
        ).ravel()

    J = jax.jacfwd(stacked)(x)
    H = J.T @ J
    for i in range(n):
        np.testing.assert_allclose(
            np.asarray(Hd[i]), np.asarray(H[3 * i:3 * i + 3, 3 * i:3 * i + 3]),
            atol=1e-12,
        )
    for i in range(n - 1):
        np.testing.assert_allclose(
            np.asarray(Hu[i]),
            np.asarray(H[3 * i:3 * i + 3, 3 * i + 3:3 * i + 6]),
            atol=1e-12,
        )


def test_chain_block_hessian_reversed_edge():
    """A chain edge stored as (i+1, i) lands its coupling transposed at the
    same superdiagonal slot."""
    from mini_opt_tpu.models.pose_graph import (
        _edge_data,
        _edge_indices,
        _edge_residual,
    )

    meas = jnp.asarray([[1.0, 0.2, 0.1], [0.9, -0.1, 0.05]])
    w = jnp.ones((2,))
    data = _edge_data(meas, w)
    fwd = jnp.asarray(np.asarray(_edge_indices([[0, 1], [1, 2]]), np.int32))
    _, Hu_f = chain_block_hessian(_edge_residual, jnp.zeros(9), fwd, data, 3, 3)

    # Same geometry with edge 1 stored reversed: residual of edge (2, 1)
    # measuring the inverse transform has the same J^T J structure only if
    # the measurement is inverted too; here we just check slot/transpose
    # bookkeeping with an explicitly reversed index row.
    rev = jnp.asarray(
        np.asarray(_edge_indices([[0, 1]]) + _edge_indices([[2, 1]]), np.int32)
    )
    x = jnp.zeros(9)

    def one(ri, rd):
        J = jax.jacfwd(lambda v: _edge_residual(v, rd))(x[ri])
        return J[:, :3], J[:, 3:]

    A1, B1 = one(rev[1], data[1])
    _, Hu_r = chain_block_hessian(_edge_residual, x, rev, data, 3, 3)
    np.testing.assert_allclose(
        np.asarray(Hu_r[1]), np.asarray((A1.T @ B1).T), atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(Hu_r[0]), np.asarray(Hu_f[0]), atol=1e-12)


def test_tree_preconditioner_cuts_cg_budget_se2():
    """The regression gate of the feature: on a 200-pose cycle graph the
    tree-preconditioned CG path reaches the Jacobi-600 converged cost with a
    10x smaller CG budget (60) in the same 5 outer iterations (measured
    f=0.0038082 both), while Jacobi at the same 60-iteration budget stalls
    at max_iterations with a ~7% worse cost (0.004088)."""
    from test_pose_graph import _circle_graph

    from mini_opt_tpu.models.pose_graph import (
        default_pose_graph_params,
        solve_pose_graph_large,
    )

    n = 200
    gt, edges, meas, x0 = _circle_graph(n, seed=4, noise=0.01, loop_every=10)
    w = jnp.ones((len(edges),))
    p = default_pose_graph_params(jnp.float64, max_iterations=40)

    kw = dict(params=p)
    r_ref = solve_pose_graph_large(
        n, edges, jnp.asarray(meas), w, jnp.asarray(x0.ravel()),
        cg_iterations=600, **kw,
    )
    r_tree = solve_pose_graph_large(
        n, edges, jnp.asarray(meas), w, jnp.asarray(x0.ravel()),
        cg_iterations=60, preconditioner="tree", **kw,
    )
    r_jac = solve_pose_graph_large(
        n, edges, jnp.asarray(meas), w, jnp.asarray(x0.ravel()),
        cg_iterations=60, **kw,
    )
    f_ref, f_tree, f_jac = (
        float(r_ref.errors.f), float(r_tree.errors.f), float(r_jac.errors.f)
    )
    assert f_tree <= f_ref * 1.001 + 1e-12, (f_tree, f_ref)
    assert int(r_tree.num_iterations) <= int(r_ref.num_iterations)
    assert f_jac > f_tree * 1.05, (f_jac, f_tree)
    np.testing.assert_allclose(np.asarray(r_tree.x), np.asarray(r_ref.x), atol=1e-3)


def test_tree_preconditioner_cuts_cg_budget_se3():
    """SE(3) twin (6x6 blocks) of the budget gate on a 60-pose helix."""
    from test_pose_graph3 import _helix_graph

    from mini_opt_tpu.models.pose_graph3 import (
        default_pose_graph3_params,
        solve_pose_graph3_large,
    )

    n = 60
    gt, edges, meas, x0 = _helix_graph(n, seed=1, noise=0.01, loop_every=12)
    w = jnp.ones((len(edges),))
    p = default_pose_graph3_params(jnp.float64, max_iterations=30)

    r_ref = solve_pose_graph3_large(
        n, edges, jnp.asarray(meas), w, jnp.asarray(x0.ravel()),
        params=p, cg_iterations=400,
    )
    r_tree = solve_pose_graph3_large(
        n, edges, jnp.asarray(meas), w, jnp.asarray(x0.ravel()),
        params=p, cg_iterations=25, preconditioner="tree",
    )
    f_ref, f_tree = float(r_ref.errors.f), float(r_tree.errors.f)
    assert f_tree <= f_ref * 1.01 + 1e-12, (f_tree, f_ref)
    np.testing.assert_allclose(np.asarray(r_tree.x), np.asarray(r_ref.x), atol=2e-3)


def test_spanning_chain_order_unit():
    """Host-side ordering rules: identity when the consecutive chain is
    present (even with loop closures), path recovery under scrambled
    labels, and leaf-start when block 0 is interior."""
    # Consecutive chain + loop closures -> identity, no permutation cost.
    pairs = [(i, i + 1) for i in range(9)] + [(0, 5), (2, 8)]
    np.testing.assert_array_equal(
        spanning_chain_order(np.asarray(pairs), 10), np.arange(10)
    )
    # Scrambled path whose block 0 is interior: start at the lowest-index
    # leaf (2) and walk the path unbroken to the other end.
    path = [3, 0, 4, 1, 2]
    edges = np.asarray([[path[k], path[k + 1]] for k in range(4)])
    np.testing.assert_array_equal(
        spanning_chain_order(edges, 5), path[::-1]
    )
    # Every consecutive position pair in the output is a graph edge
    # (full chain coverage) for a random scrambled path.
    rng = np.random.default_rng(7)
    lab = rng.permutation(40)
    edges = np.asarray([[lab[k], lab[k + 1]] for k in range(39)])
    perm = spanning_chain_order(edges, 40)
    eset = {tuple(sorted(e)) for e in edges.tolist()}
    for k in range(39):
        assert tuple(sorted((int(perm[k]), int(perm[k + 1])))) in eset
    # Two disconnected chains: both fully covered, laid out back to back.
    e2 = np.asarray([[0, 2], [2, 4], [1, 3], [3, 5]])
    perm2 = spanning_chain_order(e2, 6)
    s = {tuple(sorted(e)) for e in e2.tolist()}
    runs = [
        tuple(sorted((int(perm2[k]), int(perm2[k + 1])))) in s
        for k in range(5)
    ]
    assert sum(runs) == 4  # exactly one component boundary


def test_auto_order_exact_on_scrambled_tree_graph():
    """Oracle: on a PATH-graph pose graph with SCRAMBLED labels (spanning
    chain nowhere consecutive), ``order="auto"`` recovers the chain and the
    preconditioner solve equals the dense solve of the FULL damped Hessian
    (exactness on path graphs — the property the consecutive-order factor
    has on sequential SLAM layouts, now label-independent; branching trees
    are covered only along DFS first-child runs)."""
    from mini_opt_tpu.models.pose_graph import (
        _edge_data,
        _edge_indices,
        _edge_residual,
    )

    n = 23
    rng = np.random.default_rng(11)
    lab = rng.permutation(n)
    edges = [[int(lab[k]), int(lab[k + 1])] for k in range(n - 1)]
    meas = jnp.asarray(rng.normal(size=(n - 1, 3)) * 0.3 + jnp.asarray([1.0, 0, 0]))
    w = jnp.ones((n - 1,))
    data = _edge_data(meas, w)
    idx = jnp.asarray(np.asarray(_edge_indices(edges), np.int32))
    x = jnp.asarray(rng.normal(size=(3 * n,)) * 0.1)
    lam = 1e-3

    prec = make_chain_tree_preconditioner(
        _edge_residual, idx, data, n, 3, floor=0.0
    )
    apply = prec(x, jnp.asarray(lam))

    def stacked(xx):
        return jax.vmap(lambda ri, rd: _edge_residual(xx[ri], rd))(
            idx, data
        ).ravel()

    J = jax.jacfwd(stacked)(x)
    H = np.asarray(J.T @ J) + lam * np.eye(3 * n)
    r = rng.normal(size=(3 * n,))
    np.testing.assert_allclose(
        np.asarray(apply(jnp.asarray(r))), np.linalg.solve(H, r), atol=1e-9
    )


def test_scrambled_pose_graph_tree_budget():
    """End-to-end: a cycle graph whose pose labels are randomly permuted
    (so no consecutive odometry chain exists) still gets the tree
    preconditioner's budget cut through ``preconditioner="tree"`` — the
    auto-ordering is invisible to the caller."""
    from test_pose_graph import _circle_graph

    from mini_opt_tpu.models.pose_graph import (
        default_pose_graph_params,
        solve_pose_graph_large,
    )

    n = 120
    gt, edges, meas, x0 = _circle_graph(n, seed=6, noise=0.01, loop_every=10)
    rng = np.random.default_rng(13)
    lab = rng.permutation(n)
    edges_s = [[int(lab[i]), int(lab[j])] for i, j in edges]
    x0_s = np.zeros_like(np.asarray(x0))
    x0_s[lab] = np.asarray(x0)
    p = default_pose_graph_params(jnp.float64, max_iterations=40)

    r_ref = solve_pose_graph_large(
        n, edges_s, jnp.asarray(meas), jnp.ones((len(edges),)),
        jnp.asarray(x0_s.ravel()), params=p, cg_iterations=500,
    )
    r_tree = solve_pose_graph_large(
        n, edges_s, jnp.asarray(meas), jnp.ones((len(edges),)),
        jnp.asarray(x0_s.ravel()), params=p, cg_iterations=50,
        preconditioner="tree",
    )
    f_ref, f_tree = float(r_ref.errors.f), float(r_tree.errors.f)
    assert f_tree <= f_ref * 1.001 + 1e-12, (f_tree, f_ref)
    np.testing.assert_allclose(
        np.asarray(r_tree.x), np.asarray(r_ref.x), atol=1e-3
    )


def test_chordal_tree_preconditioner_budget_se2():
    """Chordal initialization under the tree preconditioner reproduces the
    plain-CG result at a 20x smaller budget (measured max diff 2e-13 at
    cg=60 vs cg=1200 on a 300-pose cycle graph)."""
    from test_pose_graph import _circle_graph

    from mini_opt_tpu.models.pose_graph import chordal_initialization

    n = 300
    gt, edges, meas, x0 = _circle_graph(n, seed=5, noise=0.01, loop_every=10)
    w = jnp.ones((len(edges),))
    xr = chordal_initialization(n, edges, jnp.asarray(meas), w,
                                cg_iterations=1200)
    xt = chordal_initialization(n, edges, jnp.asarray(meas), w,
                                cg_iterations=60, preconditioner="tree")
    np.testing.assert_allclose(np.asarray(xt), np.asarray(xr), atol=1e-9)


def test_chordal_tree_preconditioner_budget_se3():
    """SE(3) twin: 9x9-block rotation stage + 3x3-block position stage
    (measured max diff 3e-14 at cg=60 vs cg=800 on a 200-pose helix)."""
    from test_pose_graph3 import _helix_graph

    from mini_opt_tpu.models.pose_graph3 import chordal_initialization3

    n = 200
    gt, edges, meas, x0 = _helix_graph(n, seed=2, noise=0.01, loop_every=10)
    w = jnp.ones((len(edges),))
    xr = chordal_initialization3(n, edges, jnp.asarray(meas), w,
                                 cg_iterations=800)
    xt = chordal_initialization3(n, edges, jnp.asarray(meas), w,
                                 cg_iterations=60, preconditioner="tree")
    np.testing.assert_allclose(np.asarray(xt), np.asarray(xr), atol=1e-9)
