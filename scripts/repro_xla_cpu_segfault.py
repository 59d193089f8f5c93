"""Standalone repro harness for the XLA-CPU ~80th-compile segfault.

Observed failure (ROADMAP "Environment issues"): the XLA *CPU* compiler
SIGSEGV/SIGABRTs inside ``backend_compile`` when the interpret-mode fused QP
kernel (ops/pallas_qp.py) is compiled late in a long-lived process that has
already performed ~80 compilations -- while every standalone or partial run
of the same test file passes. The mitigation in tests/test_pallas_qp.py is a
module-scoped ``jax.clear_caches()``.

This script recreates the trigger conditions deterministically:

1. compile ``--n-precompiles`` distinct solver-shaped programs (vmapped
   nls_solve at varying static shapes -- the kind of programs the suite
   compiles before reaching test_pallas_qp);
2. then compile + run the interpret-mode fused QP program that crashed.

Exit code 0 = no crash at this pressure level. A SIGSEGV/SIGABRT here is the
repro. Usage:

    JAX_PLATFORMS=cpu python scripts/repro_xla_cpu_segfault.py \
        --n-precompiles 80 [--clear-caches]

``--clear-caches`` applies the mitigation before step 2, which should always
pass; the A/B between the two modes is the bisection evidence.
"""

import argparse
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def precompile_pressure(n: int) -> None:
    """Compile n DISTINCT solver programs (unique static shapes/budgets) so
    the in-process LLVM JIT accumulates state like a long suite run."""
    from mini_opt_tpu import NLSParams, Problem, make_residual, nls_solve

    done = 0
    dim = 2
    while done < n:
        for iters in (2, 3, 4, 5, 6):
            if done >= n:
                break
            shift = 0.1 * done  # constant-folds differently per program

            def make(d=dim, s=shift):
                rosen = make_residual(
                    tuple(range(d)),
                    lambda v: jnp.concatenate(
                        [
                            jnp.stack(
                                [1.0 - v[i], 10.0 * (v[i + 1] - v[i] * v[i]) + s]
                            )
                            for i in range(d - 1)
                        ]
                    ),
                    dim=2 * (d - 1),
                )
                return Problem(dimension=d, costs=(rosen,))

            params = NLSParams(max_iterations=iters, max_qp_iterations=3)
            problem = make()
            x0 = jnp.zeros((4, dim))
            jax.jit(jax.vmap(lambda x: nls_solve(problem, params, x).x))(
                x0
            ).block_until_ready()
            done += 1
            if done % 10 == 0:
                print(f"  precompiled {done}/{n}", flush=True)
        dim = 2 + (dim - 1) % 5  # cycle dims 2..6 for shape diversity


def compile_fused_qp() -> None:
    """The program that crashed: interpret-mode fused QP via custom_vmap."""
    from mini_opt_tpu.ops.pallas_qp import make_fused_qp_solver

    rng = np.random.default_rng(0)
    B, n, k = 64, 4, 1
    A_ = rng.standard_normal((B, n, n))
    G = jnp.asarray(A_ @ np.transpose(A_, (0, 2, 1)) + 3.0 * np.eye(n))
    c = jnp.asarray(rng.standard_normal((B, n)))
    A = jnp.asarray(rng.standard_normal((B, k, n)))
    b = jnp.asarray(rng.standard_normal((B, k)) * 0.3)
    ia = jnp.asarray(rng.choice([-1.0, 1.0], (B, 2)))
    ib = jnp.asarray(rng.uniform(0.5, 2.0, (B, 2)))
    solver = make_fused_qp_solver((0, 1), 6, 0.1, "mpc", True)
    x, y = jax.jit(jax.vmap(solver))(G, c, A, b, ia, ib)
    assert bool(jnp.all(jnp.isfinite(x))), "fused QP produced non-finite x"
    print("fused QP compile+run ok", flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-precompiles", type=int, default=80)
    ap.add_argument("--clear-caches", action="store_true")
    args = ap.parse_args()
    sys.path.insert(0, ".")

    print(f"jax {jax.__version__}, backend {jax.default_backend()}", flush=True)
    precompile_pressure(args.n_precompiles)
    if args.clear_caches:
        print("applying mitigation: jax.clear_caches()", flush=True)
        jax.clear_caches()
    compile_fused_qp()
    print(
        f"NO CRASH at n={args.n_precompiles}, clear_caches={args.clear_caches}",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
