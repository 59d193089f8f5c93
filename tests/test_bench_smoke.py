"""Smoke test for bench.py's solver construction (keeps the bench from
rotting; the real-TPU runs are the driver's job)."""

import jax
import jax.numpy as jnp
import numpy as np


def test_bench_build_solver_and_instances():
    import bench

    dtype = jnp.float64
    solve, parity_fraction = bench.build_solver(
        2, dtype, max_iterations=10, max_qp_iterations=6,
        kkt_solver="lu", ls_iterations=2,
    )
    targets, x0 = bench.make_instances(256, 2, dtype)
    frac = float(parity_fraction(targets, x0))
    assert frac >= 0.99, frac
    out = solve(targets, x0)
    assert out.shape == (256, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_rotation_target_ik():
    """A solve whose cost uses the ROTATION derivative panels: pin the
    effector heading to a target angle (exercises rotation_D_params end to
    end, not just translation)."""
    from mini_opt_tpu import make_residual
    from mini_opt_tpu.models.ik import make_planar_chain, mod_pi_retraction
    from mini_opt_tpu.nonlinear import NLSParams, Problem, nls_solve
    from mini_opt_tpu.utils import so3

    chain = make_planar_chain(2, dtype=jnp.float64)
    heading_target = 1.1  # total effector rotation about z

    def heading_res(params):
        st = chain.update(params)
        # z component of the rotation log = accumulated planar angle
        w = so3.quat_log(st.rotation)
        return jnp.stack([w[2] - heading_target]), st.rotation_D_params[2:3, :]

    def y_cost(params):
        st = chain.update(params)
        return jnp.stack([st.translation[1] - 0.5]), st.translation_D_params[1:2, :]

    problem = Problem(
        dimension=2,
        costs=(make_residual([0, 1], lambda p: y_cost(p)[0], 1, jac=y_cost),),
        equality_constraints=(
            make_residual([0, 1], lambda p: heading_res(p)[0], 1, jac=heading_res),
        ),
    )
    params = NLSParams(
        max_iterations=30,
        max_qp_iterations=1,
        absolute_exit_tol=1e-10,
        lambda_initial=1e-3,
    )
    res = nls_solve(problem, params, jnp.asarray([0.4, 0.4]), retraction=mod_pi_retraction)
    x = np.asarray(res.x)
    # heading = th0 + th1 must hit the target (mod 2pi)
    assert abs(((x[0] + x[1]) - heading_target + np.pi) % (2 * np.pi) - np.pi) < 1e-3
    st = chain.update(res.x)
    assert abs(float(st.translation[1]) - 0.5) < 1e-3
