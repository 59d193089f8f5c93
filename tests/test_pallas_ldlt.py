"""Pallas lane-batched LDL^T kernel vs the jnp recurrence and LU oracle.

Runs in interpreter mode on CPU (the driver/bench exercise the compiled TPU
path); the jnp ``ldlt_factorize`` it must match is itself oracle-tested
against LU in test_qp.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mini_opt_tpu.ops import kkt as kkt_ops
from mini_opt_tpu.ops import pallas_ldlt


def _random_kkt_batch(B, N, K, seed=0, dtype=jnp.float64):
    """Quasi-definite condensed KKT systems: [[G_pd, A^T], [A, 0]]."""
    rng = np.random.default_rng(seed)
    D = N + K
    out = np.zeros((B, D, D))
    for b in range(B):
        G = np.eye(N) * 0.5
        for _ in range(3 * N):
            v = rng.standard_normal(N)
            G += np.outer(v, v) / N
        A = rng.standard_normal((K, N))
        out[b, :N, :N] = G
        out[b, N:, :N] = A
        out[b, :N, N:] = A.T
    return jnp.asarray(out, dtype)


@pytest.mark.parametrize("N,K", [(4, 0), (6, 2), (3, 1)])
def test_batched_factorize_matches_jnp(N, K):
    B = 200  # not a multiple of the lane block: exercises padding
    H = _random_kkt_batch(B, N, K)
    L, d, ok = pallas_ldlt._batched_factorize(H)
    assert bool(jnp.all(ok))
    L_ref, d_ref = jax.vmap(lambda h: kkt_ops.ldlt_factorize(h)[0])(H)
    np.testing.assert_allclose(np.asarray(L), np.asarray(L_ref), atol=1e-9)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), atol=1e-9)


def test_batched_solve_matches_lu():
    B, N, K = 130, 5, 2
    H = _random_kkt_batch(B, N, K, seed=3)
    rhs = jnp.asarray(np.random.default_rng(4).standard_normal((B, N + K)))
    (L, d), ok = pallas_ldlt.factorize(H[0]), None  # scalar path smoke
    L, d, ok = pallas_ldlt._batched_factorize(H)
    x = pallas_ldlt._batched_solve(L, d, rhs)
    x_ref = jnp.linalg.solve(H, rhs[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), atol=1e-8)


def test_custom_vmap_dispatch():
    """vmap of the scalar API must hit the batched kernel and agree with the
    scalar recurrence."""
    B, N, K = 64, 4, 1
    H = _random_kkt_batch(B, N, K, seed=7)

    def one(h):
        fact, ok = pallas_ldlt.factorize(h)
        rhs = jnp.arange(N + K, dtype=h.dtype)
        return pallas_ldlt.solve(fact, rhs), ok

    x_b, ok_b = jax.jit(jax.vmap(one))(H)
    assert bool(jnp.all(ok_b))
    for b in range(0, B, 17):
        fact, ok = kkt_ops.ldlt_factorize(H[b])
        x = kkt_ops.ldlt_solve(fact, jnp.arange(N + K, dtype=H.dtype))
        np.testing.assert_allclose(np.asarray(x_b[b]), np.asarray(x), atol=1e-9)


def test_ip_solver_with_pallas_kkt():
    """The interior-point solver with kkt_solver='pallas_ldlt' must match the
    'lu' path on a vmapped batch."""
    from mini_opt_tpu import QP, QPInteriorPointParams, qp_ip_solve

    rng = np.random.default_rng(11)
    B, n = 96, 6
    Gs, cs = [], []
    for _ in range(B):
        G = np.eye(n)
        for _ in range(3 * n):
            v = rng.standard_normal(n)
            G += np.outer(v, v) / n
        Gs.append(G)
        cs.append(rng.standard_normal(n))
    A = np.tile(rng.standard_normal((1, n)), (B, 1, 1))
    b = rng.standard_normal((B, 1))
    qp = QP(
        G=jnp.asarray(np.stack(Gs)),
        c=jnp.asarray(np.stack(cs)),
        A_eq=jnp.asarray(A),
        b_eq=jnp.asarray(b),
        ineq_var=jnp.tile(jnp.asarray([0, 2], jnp.int32), (B, 1)),
        ineq_a=jnp.ones((B, 2)),
        ineq_b=jnp.full((B, 2), 2.0),
    )

    def solve(qp_one, solver):
        params = QPInteriorPointParams(
            max_iterations=20, termination_kkt_tol=1e-10, kkt_solver=solver
        )
        return qp_ip_solve(qp_one, params)

    res_lu = jax.jit(jax.vmap(lambda q: solve(q, "lu")))(qp)
    res_pl = jax.jit(jax.vmap(lambda q: solve(q, "pallas_ldlt")))(qp)
    np.testing.assert_array_equal(
        np.asarray(res_pl.termination_state), np.asarray(res_lu.termination_state)
    )
    np.testing.assert_allclose(
        np.asarray(res_pl.x), np.asarray(res_lu.x), atol=1e-7
    )
