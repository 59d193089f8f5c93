"""Example: cart-pole swing assist / disturbance rejection under MPC.

The reference library was written to drive a cart-pole MPC controller — its
problem statement (costs + nonlinear dynamics equality constraints + box
actuation limits on a small dense vector, nonlinear.hpp:11-32) is a direct
multiple-shooting transcription. This example runs that controller as one
jitted receding-horizon loop (models/mpc.py): solve the horizon problem,
apply the first control, step the plant, shift the solution as the next warm
start — then vmaps it over a fleet of plants with different initial pole
angles and hits every plant with a mid-run impulse.

Run: python examples/cartpole_mpc.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mini_opt_tpu.models import mpc


def main():
    cp = mpc.CartPole()
    smoke = os.environ.get("MINI_OPT_EXAMPLE_SMOKE") == "1"
    n_steps, horizon, dt = 60, 20, 0.05
    B = 4 if smoke else 16
    rng = np.random.default_rng(0)
    x_init = jnp.asarray(
        np.column_stack(
            [
                rng.uniform(-0.3, 0.3, B),  # cart position
                rng.uniform(-0.2, 0.2, B),  # cart velocity
                rng.uniform(-0.4, 0.4, B),  # pole angle (0 = upright)
                rng.uniform(-0.3, 0.3, B),  # pole rate
            ]
        ),
        jnp.float32,
    )
    # Impulse force on every plant at step 30 (after stabilization).
    dist = jnp.zeros((n_steps,), jnp.float32).at[30].set(7.0)

    @jax.jit
    def fleet(x0):
        def one(x):
            return mpc.mpc_rollout(
                cp, x, n_steps, horizon, dt, disturbance=dist, p_max=1.2
            )

        return jax.vmap(one)(x0)

    states, us, merits, terms = fleet(x_init)
    states, us = np.asarray(states), np.asarray(us)

    th0 = np.abs(states[:, 0, 2])
    th_pre = np.abs(states[:, 30, 2])  # just before the impulse
    th_kick = np.abs(states[:, 33, 2] - states[:, 30, 2])  # deflection
    th_end = np.abs(states[:, -1, 2])
    print(f"{B} plants x {n_steps} control periods, horizon {horizon}, "
          f"dim-{mpc.mpc_dimension(horizon)} problem per period")
    print(f"|theta| initial:        max {th0.max():.3f}")
    print(f"|theta| before impulse: max {th_pre.max():.4f}")
    print(f"impulse deflection:     max {th_kick.max():.4f}")
    print(f"|theta| final:          max {th_end.max():.4f}")
    print(f"|u| max {np.abs(us).max():.3f} (limit 10), "
          f"|p| max {np.abs(states[:, :, 0]).max():.3f} (track limit 1.2)")
    assert th_pre.max() < 0.05, "fleet must stabilize before the impulse"
    assert th_kick.max() > 0.01, "the impulse must visibly deflect the pole"
    assert th_end.max() < 0.05, "fleet must re-stabilize after the impulse"
    assert np.abs(us).max() <= 10.0 + 1e-5
    assert np.abs(states[:, :, 0]).max() <= 1.2 + 1e-5
    print("ok: every plant stabilizes, rejects the impulse, and respects "
          "actuation + track limits")


if __name__ == "__main__":
    main()
