"""Generic fused QP interior-point kernel (ops/pallas_qp.py) vs the
reference-semantics qp_ip_solve, across constraint structures, plus the
custom_vmap dispatch contract and the nls_solve integration."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mini_opt_tpu.ops.pallas_qp import make_fused_qp_solver
from test_qp import random_pd_matrix


# The per-module jax.clear_caches() mitigation for the long-lived-process
# XLA-CPU compiler segfault now lives in conftest.py (round 3: the crash
# reproduced OUTSIDE this module, at test_nonlinear, so the fixture was
# promoted suite-wide).


def _random_batch(B, n, k, m_vars, seed=0):
    rng = np.random.default_rng(seed)
    m = len(m_vars)
    G = np.stack([random_pd_matrix(rng, n) for _ in range(B)])
    c = rng.standard_normal((B, n))
    A = rng.standard_normal((B, k, n)) if k else np.zeros((B, 0, n))
    b = rng.standard_normal((B, k)) * 0.3 if k else np.zeros((B, 0))
    ia = rng.choice([-1.0, 1.0], (B, m)) if m else np.zeros((B, 0))
    ib = rng.uniform(0.5, 2.0, (B, m)) if m else np.zeros((B, 0))
    return tuple(jnp.asarray(v) for v in (G, c, A, b, ia, ib))


def test_fused_qp_matches_reference_path_all_structures():
    """vmap of the fused solver (one Pallas launch for the whole inner loop)
    must match the per-instance qp_ip_solve fallback bit-tightly, for
    eq+box / box-only / eq-only structures."""
    B, n = 64, 5
    for k, ineq_var, has_eq_guess in (
        (2, (0, 2, 3), True),
        (0, (0, 2, 3), False),
        (2, (), True),
    ):
        args = _random_batch(B, n, k, ineq_var, seed=k + len(ineq_var))
        solve = make_fused_qp_solver(
            ineq_var, iterations=8, sigma=0.1, has_eq_guess=has_eq_guess
        )
        xs, ys = [], []
        for i in range(B):
            x1, y1 = solve(*(a[i] for a in args))
            xs.append(np.asarray(x1))
            ys.append(np.asarray(y1))
        xb, yb = jax.vmap(solve)(*args)
        np.testing.assert_allclose(np.asarray(xb), np.stack(xs), atol=1e-12)
        np.testing.assert_allclose(np.asarray(yb), np.stack(ys), atol=1e-12)


def test_fused_qp_mpc_matches_reference_path():
    B, n, k = 32, 4, 1
    ineq_var = (1, 3)
    args = _random_batch(B, n, k, ineq_var, seed=7)
    solve = make_fused_qp_solver(ineq_var, iterations=6, sigma=0.1, barrier="mpc")
    xs = [np.asarray(solve(*(a[i] for a in args))[0]) for i in range(B)]
    xb, _ = jax.vmap(solve)(*args)
    np.testing.assert_allclose(np.asarray(xb), np.stack(xs), atol=1e-11)


def test_fused_qp_solves_to_optimum():
    """Against the exact active-set oracle on box-constrained problems."""
    from test_qp import _active_set_oracle

    B, n, m = 32, 6, 3
    rng = np.random.default_rng(3)
    ineq_var = (0, 2, 4)
    Gs, cs, ias, ibs, x_exp = [], [], [], [], []
    for _ in range(B):
        G = random_pd_matrix(rng, n, scale=2.0)
        root = rng.uniform(-5.0, 5.0, n)
        c = -G @ root
        scale = rng.uniform(0.1, 0.9, m)
        bound = root[list(ineq_var)] * scale
        a = np.where(root[list(ineq_var)] < 0, 1.0, -1.0)
        b = np.where(root[list(ineq_var)] < 0, -bound, bound)
        Gs.append(G)
        cs.append(c)
        ias.append(a)
        ibs.append(b)
        x_exp.append(_active_set_oracle(G, c, np.asarray(ineq_var), a, b))
    solve = make_fused_qp_solver(
        ineq_var, iterations=25, sigma=0.1, has_eq_guess=False
    )
    xb, _ = jax.vmap(solve)(
        jnp.asarray(np.stack(Gs)),
        jnp.asarray(np.stack(cs)),
        jnp.zeros((B, 0, n)),
        jnp.zeros((B, 0)),
        jnp.asarray(np.stack(ias)),
        jnp.asarray(np.stack(ibs)),
    )
    np.testing.assert_allclose(np.asarray(xb), np.stack(x_exp), atol=5e-5)


def test_nls_solve_with_fused_qp_matches_default():
    """nls_solve(qp_solver='pallas_fused') reproduces the default engine on
    the flagship IK batch (fixed-trip matched config) and reaches targets."""
    from mini_opt_tpu.models.ik import (
        default_ik_params,
        make_planar_chain,
        solve_ik_batch,
    )

    chain = make_planar_chain(2, dtype=jnp.float64)
    # Modest iteration counts: the interpret-mode fused QP inside the outer
    # scan produces a large HLO; at 12 outer iterations the XLA *CPU*
    # compiler has been observed to segfault when this compiles late in a
    # long-lived suite process. 6 iterations pin the same equivalence.
    base = dataclasses.replace(
        default_ik_params(jnp.float64, max_iterations=6, max_qp_iterations=6),
        record_history=False,
        early_exit=False,
        parallel_line_search=True,
        termination_kkt_tolerance=1e-300,
        absolute_exit_tol=1e-30,
        relative_exit_tol=0.0,
        absolute_first_derivative_tol=0.0,
        kkt_solver="ldlt",
    )
    rng = np.random.default_rng(0)
    B = 64
    r = rng.uniform(0.45, 0.75, B)
    th = rng.uniform(0.25, 1.25, B)
    targets = jnp.asarray(np.stack([r * np.cos(th), r * np.sin(th)], 1))
    x0 = jnp.asarray(rng.uniform(0.2, 1.2, (B, 2)))

    res_d = solve_ik_batch(targets, x0, chain, base)
    res_f = solve_ik_batch(
        targets, x0, chain, dataclasses.replace(base, qp_solver="pallas_fused")
    )
    # Same algorithm, different LDLT operation order: most lanes agree to
    # machine precision; a minority amplify the ~1e-16 seeds through the
    # 10-iteration solve (measured: median 2e-16, p90 1.5e-7, max 7e-6).
    d = np.abs(np.asarray(res_f.x) - np.asarray(res_d.x)).max(1)
    assert np.median(d) < 1e-12, np.median(d)
    assert d.max() < 1e-3, d.max()
    # Both engines make the same progress (6 iterations is mid-solve for the
    # colder starts; the equivalence, not absolute convergence, is the gate).
    fk = jax.vmap(lambda x: chain.update(x).translation[:2])
    err_f = np.abs(np.asarray(fk(res_f.x)) - np.asarray(targets)).max(1)
    err_d = np.abs(np.asarray(fk(res_d.x)) - np.asarray(targets)).max(1)
    assert (err_f < 1e-3).mean() == (err_d < 1e-3).mean()
    assert (err_f < 1e-3).mean() > 0.8
