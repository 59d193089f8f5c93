"""Obstacle-avoiding IK: a nonlinear inequality the reference cannot express.

A redundant 3-link planar arm must put its effector on a target while keeping
its ELBOW (the joint-2 position) outside a circular keep-out zone placed
exactly where the unconstrained solution parks it. The keep-out is the
nonlinear inequality

    g(theta) = ||elbow_fk(theta_0, theta_1) - center||^2 - r^2 >= 0

which mini_opt explicitly does not support (its README lists nonlinear
inequality constraints as a non-feature; only diagonal linear box constraints
exist). `with_nonlinear_inequalities` (mini_opt_tpu/ineq.py) lifts g into a
slack equality + box bound, so the standard SQP machinery solves it — the
redundancy lets the solver move the elbow off the obstacle while holding the
effector on target.

A small proximal cost on the joints resolves the redundancy (without it the
GN Hessian is singular along the self-motion manifold and the line search
crawls — the same redundant-chain behavior documented for the fused tier,
cured there by fused_solve_proximal).

Run: python examples/obstacle_ik.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mini_opt_tpu import (  # noqa: E402
    InitialGuessMethod,
    make_planar_chain,
    make_residual,
    with_nonlinear_inequalities,
)
from mini_opt_tpu.models.ik import make_ik_problem, mod_pi_retraction  # noqa: E402
from mini_opt_tpu.nonlinear import NLSParams, Problem, nls_solve  # noqa: E402


def main():
    chain = make_planar_chain(n_active=3, link_length=0.4, dtype=jnp.float64)
    elbow = make_planar_chain(n_active=2, link_length=0.4, dtype=jnp.float64)
    target = jnp.array([0.9, 0.35])
    x_ref = jnp.array([0.2, 0.2, 0.2])

    base = make_ik_problem(chain, target, with_joint_limits=False)
    params = NLSParams(
        max_iterations=60,
        max_qp_iterations=10,
        max_line_search_iterations=5,
        relative_exit_tol=0.0,
        qp_initial_guess_method=InitialGuessMethod.NAIVE,
    )

    # Where does the unconstrained solve park the elbow?
    res0 = nls_solve(base, params, x_ref, retraction=mod_pi_retraction)
    elbow0 = elbow.update(res0.x[:2]).translation[:2]
    print("unconstrained elbow:", np.asarray(elbow0))

    # Keep-out disk centered exactly there.
    center = elbow0
    radius = 0.15

    def keep_out(p2):
        d = elbow.update(p2).translation[:2] - center
        return jnp.array([d @ d - radius * radius])

    # Proximal cost resolves the 3-DOF redundancy (1 soft + 1 hard task).
    prox = make_residual((0, 1, 2), lambda p: 0.05 * (p - x_ref), 3)
    regularized = Problem(
        dimension=3,
        costs=base.costs + (prox,),
        equality_constraints=base.equality_constraints,
    )
    aug = with_nonlinear_inequalities(
        regularized, (make_residual((0, 1), keep_out, 1),)
    )

    x0 = aug.initial_guess(x_ref)
    res = jax.jit(
        lambda x: nls_solve(
            aug.problem, params, x, retraction=aug.wrap_retraction(mod_pi_retraction)
        )
    )(x0)

    theta = aug.extract(res.x)
    eff = np.asarray(chain.update(theta).translation[:2])
    elb = np.asarray(elbow.update(theta[:2]).translation[:2])
    g = float(aug.constraint_values(res.x)[0])
    print("termination:", int(res.termination_state))
    print("joint angles:", np.asarray(theta))
    print("effector:", eff, "target:", np.asarray(target))
    print("elbow:", elb, f"keep-out margin g = {g:.5f} (active ~ 0)")
    assert abs(eff[0] - float(target[0])) < 1e-6, "hard equality (target x) violated"
    assert abs(eff[1] - float(target[1])) < 1e-2, "soft target y drifted"
    assert g >= -1e-6, "keep-out violated"
    assert float(jnp.linalg.norm(elb - np.asarray(center))) >= radius - 1e-6


if __name__ == "__main__":
    main()
