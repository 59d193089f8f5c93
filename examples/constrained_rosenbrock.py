"""Example: box-constrained Rosenbrock, solved for a whole grid of starts in
one vmapped call, with full per-iteration telemetry.

Run: python examples/constrained_rosenbrock.py  (CPU or TPU)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mini_opt_tpu import Var, make_residual, nls_result_to_string
from mini_opt_tpu.nonlinear import NLSParams, Problem, nls_solve


def rosenbrock(xy):
    """h(x) with h^T h = (1-x)^2 + 100 (y - x^2)^2."""
    return jnp.stack([1.0 - xy[0], 10.0 * (xy[1] - xy[0] * xy[0])])


def main():
    problem = Problem(
        dimension=2,
        costs=(make_residual([0, 1], rosenbrock, dim=2),),
        # Constraints exclude the unconstrained optimum (1, 1):
        inequality_constraints=(Var(0) >= 1.2, Var(1) <= 0.5),
    )
    params = NLSParams(max_iterations=10, max_qp_iterations=10)

    # A grid of starts, solved as one batch.
    xs = np.linspace(-2.0, 14.0, 16)
    ys = np.linspace(-6.0, 10.0, 16)
    gx, gy = np.meshgrid(xs, ys)
    starts = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], axis=1))

    solve = jax.jit(jax.vmap(lambda x0: nls_solve(problem, params, x0)))
    res = solve(starts)

    x = np.asarray(res.x)
    print(f"{len(starts)} starts -> solution spread:")
    print("  mean:", x.mean(axis=0), " (constrained optimum is [1.2, 0.5])")
    print("  max |x - x*|:", np.abs(x - np.array([1.2, 0.5])).max())

    # Render one solve's full history.
    one = jax.tree.map(lambda a: a[0], res)
    print("\nFirst instance's solve history:")
    print(nls_result_to_string(one, use_color=True))


if __name__ == "__main__":
    main()
