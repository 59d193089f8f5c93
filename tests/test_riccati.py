"""Riccati structured-KKT backend (ops/riccati.py).

Oracle strategy mirrors the suite's KKT approach: the structured solver must
reproduce the dense solve bit-for-bit-ish on systems that HAVE the stagewise
structure, reject systems that don't through the ``ok`` channel (the jittable
analog of the reference's FailedFactorization exception, qp.cc:303-307), and
leave the end-to-end MPC solutions unchanged when swapped in via the
``kkt_solver`` knob.
"""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from mini_opt_tpu.models import mpc
from mini_opt_tpu.ops import kkt as kkt_ops
from mini_opt_tpu.ops import riccati as rc


def _random_stagewise_system(rng, T, NX, NU, dtype=np.float64):
    """Dense (N+K)^2 saddle matrix with the LQR pattern: PD stage Hessian
    blocks, random defect blocks, near-identity transition blocks N_t."""
    N = T * (NX + NU)
    K = T * NX
    H = np.zeros((N + K, N + K), dtype)

    def u(t):
        return slice(t * NU, (t + 1) * NU)

    def x(t):
        return slice(T * NU + (t - 1) * NX, T * NU + t * NX)

    def e(t):
        return slice(N + t * NX, N + (t + 1) * NX)

    for t in range(T):
        Ru = rng.normal(size=(NU, NU))
        H[u(t), u(t)] = Ru @ Ru.T + 0.5 * np.eye(NU)
        Qx = rng.normal(size=(NX, NX))
        H[x(t + 1), x(t + 1)] = Qx @ Qx.T + 0.3 * np.eye(NX)
        H[e(t), u(t)] = rng.normal(size=(NX, NU))
        if t >= 1:
            H[e(t), x(t)] = rng.normal(size=(NX, NX))
        H[e(t), x(t + 1)] = np.eye(NX) + 0.2 * rng.normal(size=(NX, NX))
    H[:N, N:] = H[N:, :N].T
    return H


@pytest.mark.parametrize("T,NX,NU", [(1, 3, 1), (5, 4, 2), (12, 4, 1)])
def test_riccati_matches_dense_solve(T, NX, NU):
    rng = np.random.default_rng(7 + T)
    H = _random_stagewise_system(rng, T, NX, NU)
    rhs = rng.normal(size=(H.shape[0],))
    fact, ok = rc.riccati_factorize(jnp.asarray(H), T, NX, NU)
    assert bool(ok)
    sol = rc.riccati_solve(fact, jnp.asarray(rhs), T, NX, NU)
    ref = np.linalg.solve(H, rhs)
    np.testing.assert_allclose(np.asarray(sol), ref, rtol=0, atol=1e-10)


def test_riccati_vmaps_through_kkt_dispatch():
    rng = np.random.default_rng(3)
    T, NX, NU = 4, 3, 1
    name = rc.solver_name(T, NX, NU)
    assert kkt_ops.is_valid_solver(name)
    Hs = np.stack([_random_stagewise_system(rng, T, NX, NU) for _ in range(4)])
    rhss = rng.normal(size=(4, Hs.shape[-1]))

    def solve1(Hb, rb):
        f, okb = kkt_ops.kkt_factorize(Hb, name)
        return kkt_ops.kkt_solve(f, rb, name), okb

    sols, oks = jax.vmap(solve1)(jnp.asarray(Hs), jnp.asarray(rhss))
    assert bool(jnp.all(oks))
    ref = np.stack([np.linalg.solve(h, r) for h, r in zip(Hs, rhss)])
    np.testing.assert_allclose(np.asarray(sols), ref, rtol=0, atol=1e-10)


def test_riccati_rejects_off_pattern_mass():
    """Feeding a non-LQR matrix must surface as ok=False (the
    FAILED_FACTORIZATION channel), not silent garbage."""
    rng = np.random.default_rng(11)
    T, NX, NU = 3, 3, 1
    H = _random_stagewise_system(rng, T, NX, NU)
    bad = H.copy()
    bad[0, T * NU + 1] = 0.5  # u_0 <-> x_1 cross-Hessian: not stagewise
    bad[T * NU + 1, 0] = 0.5
    _, ok_good = rc.riccati_factorize(jnp.asarray(H), T, NX, NU)
    _, ok_bad = rc.riccati_factorize(jnp.asarray(bad), T, NX, NU)
    assert bool(ok_good) and not bool(ok_bad)


def test_mpc_solve_identical_under_riccati_kkt():
    """Full constrained MPC solve (box-saturated actuation + track limits):
    the structured backend must land on the same solution as the dense path
    to linear-solver noise."""
    cp = mpc.CartPole()
    x0 = jnp.asarray([0.3, 0.0, 0.6, 0.0])
    T, dt = 12, 0.05
    p_dense = mpc.default_mpc_params(jnp.float64)
    p_ric = mpc.default_mpc_params(jnp.float64, horizon=T)
    assert p_ric.kkt_solver == f"riccati:{T}:4:1"
    r1 = mpc.solve_mpc(cp, x0, T, dt, params=p_dense, u_max=4.0, p_max=1.5)
    r2 = mpc.solve_mpc(cp, x0, T, dt, params=p_ric, u_max=4.0, p_max=1.5)
    assert int(r1.termination_state) == int(r2.termination_state)
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x), atol=1e-8)
    # The saturated controls agree exactly at the bound.
    u1 = np.asarray(r1.x[:T])
    assert np.max(np.abs(u1)) <= 4.0 + 1e-9


def test_mpc_rollout_identical_under_riccati_kkt():
    cp = mpc.CartPole()
    x0 = jnp.asarray([0.2, 0.0, 0.4, 0.0])
    T, dt, n = 12, 0.05, 6
    pd = mpc.default_mpc_params(jnp.float64, early_exit=False)
    pr = mpc.default_mpc_params(jnp.float64, early_exit=False, horizon=T)
    s1, u1, m1, t1 = mpc.mpc_rollout(cp, x0, n, T, dt, params=pd)
    s2, u2, m2, t2 = mpc.mpc_rollout(cp, x0, n, T, dt, params=pr)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-8)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), atol=1e-8)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
