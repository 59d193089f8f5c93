"""Example: compile YOUR robot's IK straight into a fused whole-solver kernel.

Define an arbitrary kinematic chain with `ActuatorLink` 6-bit masks — the
reference's actuator model (transform_chains.hpp:124-153): any subset of
XYZ-euler angles and XYZ translation components per link can be an
optimized parameter, everything else folds into per-link constants. Here:

  link 0: revolute Z at the base
  link 1: revolute Y, mounted with a FIXED euler offset (0.2, ·, 0.1)
  link 2: PRISMATIC X (a linear extension joint)
  link 3: fixed, tilted end flange

`scalar_chain_ik_builder` turns that chain into the standard IK `Problem`
(soft cost on effector (y, z), equality on effector x, [0, pi] joint
limits), written in scalar style — so ONE description drives both tiers:

  * `nls_solve` / `solve_batch`: the general SQP path (telemetry,
    tolerances, f64 verification), and
  * `fused_nls_solve_batch`: the whole constrained solve compiled to a
    single Pallas kernel, ~1024 robots per VPU register tile.

Run: python examples/custom_robot_ik.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mini_opt_tpu import (
    NLSParams,
    fused_nls_solve_batch,
    nls_solve,
    scalar_chain_fk,
    scalar_chain_ik_builder,
)
from mini_opt_tpu.models.chains import ActuatorChain, ActuatorLink, Pose
from mini_opt_tpu.structs import BarrierStrategy
from mini_opt_tpu.utils import so3


def make_robot(dtype=jnp.float32) -> ActuatorChain:
    qi = so3.quat_identity(dtype)
    q_shoulder = so3.so3_from_euler_angles_xyz(
        jnp.asarray([0.2, 0.3, 0.1], dtype)
    ).q
    q_flange = so3.so3_from_euler_angles_xyz(jnp.asarray([0.0, 0.3, 0.0], dtype)).q
    return ActuatorChain(
        links=(
            # mask bits: (rx, ry, rz, tx, ty, tz)
            ActuatorLink.create(Pose(qi, jnp.zeros(3, dtype)), (0, 0, 1, 0, 0, 0)),
            ActuatorLink.create(
                Pose(q_shoulder, jnp.asarray([0.4, 0.0, 0.0], dtype)),
                (0, 1, 0, 0, 0, 0),
            ),
            ActuatorLink.create(
                Pose(qi, jnp.asarray([0.3, 0.0, 0.1], dtype)), (0, 0, 0, 1, 0, 0)
            ),
            ActuatorLink.create(
                Pose(q_flange, jnp.asarray([0.4, 0.0, 0.0], dtype)),
                (0, 0, 0, 0, 0, 0),
            ),
        )
    )


def main():
    smoke = os.environ.get("MINI_OPT_EXAMPLE_SMOKE") == "1"
    robot = make_robot()
    n = robot.total_active  # 3: base angle, shoulder angle, extension
    B = 256 if smoke else 1024

    # Reachable targets: forward kinematics of random joint states.
    rng = np.random.default_rng(0)
    q_true = np.column_stack(
        [rng.uniform(-0.6, 0.6, B), rng.uniform(0.15, 1.1, (B, 2))]
    ).astype(np.float32)
    targets = np.asarray(
        jax.vmap(lambda q: jnp.stack(scalar_chain_fk(robot, q)[1]))(
            jnp.asarray(q_true)
        ),
        np.float32,
    )
    q0 = np.clip(
        q_true + rng.uniform(-0.1, 0.1, (B, n)).astype(np.float32),
        [-10.0, 0.02, 0.02],
        [10.0, 3.1, 3.1],
    ).astype(np.float32)

    builder = scalar_chain_ik_builder(robot, target_dim=3)
    params = NLSParams(
        max_iterations=10,
        max_qp_iterations=3,
        max_line_search_iterations=1,
        equality_penalty_initial=0.01,
        lambda_initial=0.001,
        early_exit=False,
        relative_exit_tol=1e-6,
        absolute_exit_tol=1e-7,
        termination_kkt_tolerance=1e-5,
        qp_barrier_strategy=BarrierStrategy.PREDICTOR_CORRECTOR,
    )

    # Tier 1: the whole solve as ONE kernel over all B robots.
    qk = np.asarray(
        fused_nls_solve_batch(builder, jnp.asarray(targets), jnp.asarray(q0), params)
    )

    # Tier 2: the same Problem through the general path (sample).
    def one(t, q):
        return nls_solve(builder(t), params, q).x

    sel = np.arange(0, B, 16)
    qg = np.asarray(jax.vmap(one)(jnp.asarray(targets[sel]), jnp.asarray(q0[sel])))

    def eff_err(q, t):
        e = jax.vmap(lambda qi: jnp.stack(scalar_chain_fk(robot, qi)[1]))(
            jnp.asarray(q)
        )
        return np.abs(np.asarray(e) - t).max(axis=1)

    ek, eg = eff_err(qk, targets), eff_err(qg, targets[sel])
    print(f"fused kernel:  {B} robots, effector err max {ek.max():.2e} "
          f"(converged {np.mean(ek < 1e-3) * 100:.1f}%)")
    print(f"general path:  {len(sel)} sample, effector err max {eg.max():.2e}")
    assert ek.max() < 1e-3 and eg.max() < 1e-3
    print("both tiers agree: one chain description, one kernel, all robots.")

    # ---- redundant arm: proximal-point continuation ----------------------
    # Add a second revolute axis to the shoulder: now 4 DOF for a 3-D task.
    # Redundant chains have constrained dead-ends that trap a few percent
    # of warm starts in ANY plain Gauss-Newton solver; the damped-least-
    # squares proximal term + re-centering (fused_solve_proximal) is the
    # standard serving cure.
    from mini_opt_tpu import family_from_problem, fused_solve_proximal

    qi = so3.quat_identity(jnp.float32)
    arm = ActuatorChain(links=(
        robot.links[0],
        ActuatorLink.create(
            Pose(qi, jnp.asarray([0.4, 0.0, 0.0], jnp.float32)),
            (1, 1, 0, 0, 0, 0),  # x AND y revolute: the redundant DOF
        ),
        robot.links[2],
        robot.links[3],
    ))
    p4 = arm.total_active
    q_true4 = np.column_stack(
        [rng.uniform(-0.6, 0.6, B), rng.uniform(0.15, 1.1, (B, 3))]
    ).astype(np.float32)
    t4 = np.asarray(
        jax.vmap(lambda q: jnp.stack(scalar_chain_fk(arm, q)[1]))(
            jnp.asarray(q_true4)
        ), np.float32,
    )
    q04 = np.clip(
        q_true4 + rng.uniform(-0.1, 0.1, (B, p4)).astype(np.float32),
        [-10.0, 0.02, 0.02, 0.02], [10.0, 3.1, 3.1, 3.1],
    ).astype(np.float32)
    fam = family_from_problem(
        scalar_chain_ik_builder(arm, target_dim=3, prox_weight=0.05),
        data_rows=3 + p4,
    )
    q4 = np.asarray(fused_solve_proximal(
        fam, jnp.asarray(t4), jnp.asarray(q04), stages=4,
        max_iterations=10, qp_iterations=3, ls_iterations=1, barrier="mpc",
    ))
    e4 = np.abs(np.asarray(
        jax.vmap(lambda q: jnp.stack(scalar_chain_fk(arm, q)[1]))(
            jnp.asarray(q4)
        )
    ) - t4).max(axis=1)
    print(f"redundant arm: {B} robots via proximal continuation, "
          f"err max {e4.max():.2e} (converged {np.mean(e4 < 1e-3) * 100:.1f}%)")
    assert e4.max() < 1e-3


if __name__ == "__main__":
    main()
