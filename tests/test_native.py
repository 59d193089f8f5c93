"""Native CPU runtime tests: the C++ solver must agree with the JAX solver on
the benchmark IK workload, and its forward kinematics must match the chain
model exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

native = pytest.importorskip("mini_opt_tpu.native")


def test_native_builds_and_fk_matches_chain():
    from mini_opt_tpu.models.ik import make_planar_chain

    theta = np.array([0.37, -0.21])
    xy, J = native.planar_fk(theta, link_len=0.4)

    chain = make_planar_chain(2, dtype=jnp.float64)
    st = chain.update(jnp.asarray(theta))
    np.testing.assert_allclose(xy, np.asarray(st.translation[:2]), atol=1e-12)
    np.testing.assert_allclose(
        J, np.asarray(st.translation_D_params[:2, :]), atol=1e-12
    )


def test_native_ik_matches_jax():
    from mini_opt_tpu.models.ik import (
        default_ik_params,
        make_planar_chain,
        solve_ik_batch,
    )

    rng = np.random.default_rng(0)
    B = 32
    angle = rng.uniform(0.3, 1.2, B)
    # Radii well inside the workspace: targets near the origin need theta1 at
    # the joint limit and are hard for BOTH implementations (and the
    # reference's own grid avoids them too).
    radius = rng.uniform(0.45, 0.75, B)
    targets = np.stack([radius * np.cos(angle), radius * np.sin(angle)], axis=1)
    x0 = np.full((B, 2), 0.3)

    x_nat, term, ok, inner = native.ik_solve_batch(targets, x0)
    # A couple of steep-angle targets may stall in either implementation.
    assert ok >= B - 2, f"only {ok}/{B} native solves converged: {term}"
    conv = np.isin(term, [1, 2, 3])

    # Both implementations must place the effector at the target.
    chain = make_planar_chain(2, dtype=jnp.float64)
    final_nat = jax.vmap(lambda x: chain.update(x).translation[:2])(
        jnp.asarray(x_nat)
    )
    err_nat = np.abs(np.asarray(final_nat) - targets).max(axis=1)
    assert err_nat[conv].max() < 1e-5, err_nat[conv].max()

    params = default_ik_params(jnp.float64, max_iterations=50, max_qp_iterations=10)
    res = solve_ik_batch(jnp.asarray(targets), jnp.asarray(x0), chain=chain, params=params)
    final_jax = jax.vmap(lambda x: chain.update(x).translation[:2])(res.x)
    err_jax = np.abs(np.asarray(final_jax) - targets).max(axis=1)
    assert np.median(err_jax) < 1e-5
    assert (err_jax < 1e-3).mean() >= (B - 2) / B, err_jax.max()


def test_native_ldlt_bench_runs():
    us = native.ldlt_us(10, reps=2000)
    assert 0 < us < 1000
