"""Example: define your OWN fused whole-solver kernel with the FusedFamily DSL.

Problem family: fit a decaying exponential  y(t) = a * exp(b * t)  to three
noisy samples per instance, with physical bounds a >= 0, b <= 0.  Each
instance is tiny (2 variables), but there are tens of thousands of them --
exactly the shape the fused path is built for: the ENTIRE solver (SQP outer
loop, interior-point bound handling, line search) runs as one Pallas kernel,
with each VPU lane owning one instance.

The DSL contract (ops/pallas_ik.py:FusedFamily): write ``linearize`` and
``errors`` over *lists of lane registers* using elementwise jnp ops only; the
kernel generator handles everything else.  The same math written as a normal
``Problem`` runs on the general ``nls_solve`` path -- used here to check the
kernel's answers.

Run: python examples/custom_fused_family.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mini_opt_tpu import Var, make_residual
from mini_opt_tpu.models.ik import default_ik_params
from mini_opt_tpu.nonlinear import Problem, nls_solve
from mini_opt_tpu.ops.pallas_ik import FusedFamily, fused_solve_batch

_TIMES = (0.0, 1.0, 2.0)  # fixed sample times (static family constants)


def make_exp_fit_family():
    """r_k = a*exp(b*t_k) - y_k for the three sample times; bounds a>=0, b<=0."""
    ts = _TIMES

    def model(x, data):
        a, b = x
        es = [jnp.exp(b * t) for t in ts]  # exp(b t_k)
        ms = [a * e for e in es]  # model values
        rs = [m - y for m, y in zip(ms, data)]  # residuals
        return es, ms, rs

    def linearize(x, data):
        a, b = x
        es, ms, rs = model(x, data)
        f = 0.5 * sum(r * r for r in rs)
        # J rows: dr_k/da = exp(b t_k), dr_k/db = a t_k exp(b t_k) = t_k m_k
        ja = es
        jb = [t * m for t, m in zip(ts, ms)]
        g00 = sum(j * j for j in ja)
        g10 = sum(p * q for p, q in zip(jb, ja))
        g11 = sum(j * j for j in jb)
        c0 = sum(j * r for j, r in zip(ja, rs))
        c1 = sum(j * r for j, r in zip(jb, rs))
        return f, [], [], [[g00], [g10, g11]], [c0, c1]

    def errors(x, data):
        _, _, rs = model(x, data)
        return 0.5 * sum(r * r for r in rs), jnp.zeros_like(x[0])

    return FusedFamily(
        n=2,
        data_rows=len(ts),
        m_eq=0,
        linearize=linearize,
        errors=errors,
        lower=(0.0, None),  # a >= 0
        upper=(None, 0.0),  # b <= 0
    )


EXP_FAMILY = make_exp_fit_family()


def general_solver_reference(y_rows, x0_rows):
    """The same family as a normal Problem on the general nls_solve path."""
    params = default_ik_params(jnp.float32)

    def one(y, x0):
        def res(p):
            a, b = p[0], p[1]
            return jnp.stack(
                [a * jnp.exp(b * t) - y[k] for k, t in enumerate(_TIMES)]
            )

        problem = Problem(
            dimension=2,
            costs=(make_residual([0, 1], res, 3),),
            inequality_constraints=(Var(0) >= 0.0, Var(1) <= 0.0),
        )
        return nls_solve(problem, params, x0).x

    return jax.jit(jax.vmap(one))(y_rows, x0_rows)


def auto_compiled_family():
    """The SAME family again -- but compiled automatically from the Problem
    description by family_from_problem (no hand-written register code):
    residuals in scalar style, Jacobians via unrolled jvp, bounds from the
    Var DSL."""
    from mini_opt_tpu import family_from_problem

    def builder(data):
        def res(p):
            a, b = p[0], p[1]
            return jnp.stack(
                [a * jnp.exp(b * t) - data[k] for k, t in enumerate(_TIMES)]
            )

        return Problem(
            dimension=2,
            costs=(make_residual([0, 1], res, 3),),
            inequality_constraints=(Var(0) >= 0.0, Var(1) <= 0.0),
        )

    return family_from_problem(builder, data_rows=len(_TIMES))


def main():
    smoke = os.environ.get("MINI_OPT_EXAMPLE_SMOKE") == "1"
    B = 1024 if smoke else 8192
    rng = np.random.default_rng(0)
    a_true = rng.uniform(0.5, 3.0, B)
    b_true = rng.uniform(-2.0, -0.1, B)
    y = a_true[:, None] * np.exp(b_true[:, None] * np.asarray(_TIMES))
    y += rng.normal(0, 0.01, y.shape)

    x0 = np.tile(np.asarray([1.0, -1.0], np.float32), (B, 1))
    y32 = jnp.asarray(y, jnp.float32)

    x_fused = fused_solve_batch(
        EXP_FAMILY, y32, jnp.asarray(x0), max_iterations=8, qp_iterations=6
    )
    x_fused = np.asarray(jax.block_until_ready(x_fused))

    # Parameter recovery (noise-limited).
    a_err = np.abs(x_fused[:, 0] - a_true)
    b_err = np.abs(x_fused[:, 1] - b_true)
    print(f"fused kernel: {B} fits, a err p50/p99 = "
          f"{np.quantile(a_err, .5):.4f}/{np.quantile(a_err, .99):.4f}, "
          f"b err p50/p99 = {np.quantile(b_err, .5):.4f}/{np.quantile(b_err, .99):.4f}")

    # Cross-check a subset against the general solver.
    K = 256
    x_gen = np.asarray(general_solver_reference(y32[:K], jnp.asarray(x0[:K])))
    agree = np.abs(x_gen - x_fused[:K]).max()
    print(f"fused vs general solver on {K} instances: max |dx| = {agree:.2e}")
    assert agree < 1e-2

    # Same kernel, zero register code: compile the family straight from the
    # Problem description.
    x_auto = np.asarray(
        fused_solve_batch(
            auto_compiled_family(), y32, jnp.asarray(x0),
            max_iterations=8, qp_iterations=6,
        )
    )
    agree_auto = np.abs(x_auto - x_fused).max()
    print(f"auto-compiled vs handwritten family: max |dx| = {agree_auto:.2e}")
    assert agree_auto < 1e-3
    print("ok")


if __name__ == "__main__":
    main()
