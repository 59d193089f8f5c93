"""Differential fuzzing: this framework vs the ACTUAL reference binary.

Generates seeded instances of the reference's own randomized test families,
solves every instance through BOTH solvers -- the unmodified reference
library (native/diff_fuzz.cc driving its public API) and this framework's
jitted/vmapped path -- and gates on agreement:

* random box-constrained QPs (the qp_test.cc:483-574 family): solution
  agreement to 5e-5 for both initial-guess methods, termination-state
  agreement, per-instance iteration counts, and the reference's own 4x
  warm-start gate holding on BOTH solvers;
* Rosenbrock 2D from the reference's 9 starts (nonlinear_test.cc:390-424):
  solutions pinned at (1, 1), termination + per-start iteration counts;
* box-constrained Himmelblau over the 30x30 grid (nonlinear_test.cc:597-665):
  per-start ROOT-BASIN agreement (same local optimum from the same start --
  the strongest algorithm-equivalence signal), solution deltas within basins,
  termination agreement, iteration-count p95s.

Instances travel through text files printed with %.17g so both sides consume
bit-identical doubles.  Usage::

    python scripts/diff_fuzz.py [--qp-n 1000] [--quick] [--out diff_fuzz.json]

Exits nonzero if any gate fails.  Records a JSON summary for STATUS.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from mini_opt_tpu import (  # noqa: E402
    NLSParams,
    Problem,
    nls_solve,
)
from mini_opt_tpu.qp import (  # noqa: E402
    QP,
    InitialGuessMethod,
    QPInteriorPointParams,
    Var,
    qp_ip_solve,
)
from mini_opt_tpu.residual import make_residual  # noqa: E402
from mini_opt_tpu.structs import (  # noqa: E402
    NLSTerminationState,
    termination_state_indicates_satisfied_tol,
)

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

HIMMELBLAU_ROOTS = np.array(
    [
        [3.0, 2.0],
        [-2.805118, 3.131312],
        [-3.779310, -3.283186],
        [3.584428, -1.848126],
    ]
)


def build_binary() -> str:
    """Compile native/diff_fuzz.cc against the unmodified reference sources
    (same recipe as native/build_reference_bench.sh)."""
    out = os.path.join(tempfile.gettempdir(), "diff_fuzz_bin")
    src = os.path.join(REPO, "native", "diff_fuzz.cc")
    if os.path.exists(out) and os.path.getmtime(out) > os.path.getmtime(src):
        return out
    import sysconfig

    site = sysconfig.get_paths()["purelib"]
    cmd = [
        "g++", "-O2", "-DNDEBUG", "-DEIGEN_NO_DEBUG", "-DFMT_HEADER_ONLY",
        "-std=c++17",
        "-I/root/reference/include",
        f"-I{site}/tensorflow/include",
        f"-I{site}/torch/include",
        "/root/reference/source/qp.cc",
        "/root/reference/source/nonlinear.cc",
        "/root/reference/source/residual.cc",
        "/root/reference/source/structs.cc",
        src,
        "-o", out,
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return out


def run_binary(binary: str, mode: str, text: str) -> str:
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write(text)
        in_path = f.name
    out_path = in_path + ".out"
    try:
        subprocess.run([binary, mode, in_path, out_path], check=True, timeout=600)
        with open(out_path) as f:
            return f.read()
    finally:
        os.unlink(in_path)
        if os.path.exists(out_path):
            os.unlink(out_path)


def _fmt(vals) -> str:
    return " ".join(f"{v:.17g}" for v in np.asarray(vals).ravel())


# ---------------------------------------------------------------------------
# QP family (qp_test.cc:483-574 distribution; tests/test_qp.py generator).
# ---------------------------------------------------------------------------


def random_pd_matrix(rng, n, scale=1.0):
    A = np.zeros((n, n))
    for _ in range(n * 3):
        v = rng.standard_normal(n)
        A += np.outer(v, v)
    return A * scale / n


def make_qp_instances(B: int, n: int = 8, m: int = 4, seed: int = 42):
    rng = np.random.default_rng(seed)
    Gs, cs, avs, aas, abs_ = [], [], [], [], []
    for _ in range(B):
        G = random_pd_matrix(rng, n, scale=2.0)
        root = rng.uniform(-20.0, 20.0, n)
        c = -G @ root
        v = np.sort(rng.permutation(n)[:m])
        scale = rng.uniform(0.1, 0.9, m)
        bound = root[v] * scale
        a = np.where(root[v] < 0, 1.0, -1.0)
        b = np.where(root[v] < 0, -bound, bound)
        Gs.append(G)
        cs.append(c)
        avs.append(v)
        aas.append(a)
        abs_.append(b)
    return (
        np.stack(Gs), np.stack(cs), np.stack(avs).astype(np.int32),
        np.stack(aas), np.stack(abs_),
    )


def fuzz_qp(binary: str, B: int) -> dict:
    n, m = 8, 4
    Gs, cs, avs, aas, abs_ = make_qp_instances(B, n, m)

    lines = [f"{B} {n} {m}"]
    for p in range(B):
        lines.append(_fmt(Gs[p]))
        lines.append(_fmt(cs[p]))
        for k in range(m):
            lines.append(f"{avs[p, k]} {aas[p, k]:.17g} {abs_[p, k]:.17g}")
    ref_out = run_binary(binary, "qp", "\n".join(lines) + "\n")

    ref = np.array([[float(v) for v in ln.split()] for ln in ref_out.splitlines()])
    assert ref.shape == (B, 2 * (2 + n)), ref.shape
    ref_term_w, ref_it_w = ref[:, 0].astype(int), ref[:, 1].astype(int)
    ref_x_w = ref[:, 2 : 2 + n]
    ref_term_n = ref[:, 2 + n].astype(int)
    ref_it_n = ref[:, 3 + n].astype(int)
    ref_x_n = ref[:, 4 + n :]

    qp = QP(
        G=jnp.asarray(Gs),
        c=jnp.asarray(cs),
        A_eq=jnp.zeros((B, 0, n)),
        b_eq=jnp.zeros((B, 0)),
        ineq_var=jnp.asarray(avs),
        ineq_a=jnp.asarray(aas),
        ineq_b=jnp.asarray(abs_),
    )

    def solve(qp_one, method):
        params = QPInteriorPointParams(
            max_iterations=30,
            termination_kkt_tol=1e-12,
            initial_guess_method=method,
        )
        return qp_ip_solve(qp_one, params)

    res_w = jax.jit(
        jax.vmap(lambda q: solve(q, InitialGuessMethod.SOLVE_EQUALITY_CONSTRAINED))
    )(qp)
    res_n = jax.jit(jax.vmap(lambda q: solve(q, InitialGuessMethod.NAIVE)))(qp)

    out = {}
    for tag, res, rx, rterm, rit in (
        ("warm", res_w, ref_x_w, ref_term_w, ref_it_w),
        ("naive", res_n, ref_x_n, ref_term_n, ref_it_n),
    ):
        dx = np.abs(np.asarray(res.x) - rx).max(axis=1)
        ours_it = np.asarray(res.num_iterations)
        ours_term = np.asarray(res.termination_state)
        term_agree = float((ours_term == rterm).mean())
        out[tag] = {
            "x_delta_max": float(dx.max()),
            "x_delta_p99": float(np.percentile(dx, 99)),
            "x_delta_median": float(np.median(dx)),
            "term_agree_frac": term_agree,
            "iters_ref_total": int(rit.sum()),
            "iters_ours_total": int(ours_it.sum()),
            "iters_identical_frac": float((ours_it == rit).mean()),
        }
    # The reference's own warm-start gate must hold on both solvers.
    out["warm_gate_ref"] = bool(ref_it_w.sum() * 4 < ref_it_n.sum())
    out["warm_gate_ours"] = bool(
        np.asarray(res_w.num_iterations).sum() * 4
        < np.asarray(res_n.num_iterations).sum()
    )
    out["n_instances"] = B
    out["pass"] = (
        out["warm"]["x_delta_max"] < 5e-5
        and out["naive"]["x_delta_max"] < 5e-5
        and out["warm_gate_ref"]
        and out["warm_gate_ours"]
    )
    return out


# ---------------------------------------------------------------------------
# Rosenbrock (nonlinear_test.cc:390-424).
# ---------------------------------------------------------------------------

ROSENBROCK_GUESSES = np.array(
    [
        [-5, -3], [10, 8], [-20, 3], [0, -5], [4, 0],
        [100, 50], [-35, 40], [1000, -50], [0.8, -0.3],
    ],
    dtype=np.float64,
)

SQRT_B = np.sqrt(100.0)


def _rosenbrock(xy):
    return jnp.stack([1.0 - xy[0], SQRT_B * (xy[1] - xy[0] * xy[0])])


def fuzz_rosenbrock(binary: str) -> dict:
    guesses = ROSENBROCK_GUESSES
    text = f"{len(guesses)}\n" + "\n".join(_fmt(g) for g in guesses) + "\n"
    ref = np.array(
        [[float(v) for v in ln.split()] for ln in run_binary(binary, "rosenbrock", text).splitlines()]
    )
    ref_term, ref_it, ref_x = ref[:, 0].astype(int), ref[:, 1].astype(int), ref[:, 3:]

    problem = Problem(dimension=2, costs=(make_residual([0, 1], _rosenbrock, 2),))
    params = NLSParams(max_iterations=5, max_qp_iterations=1)
    res = jax.jit(jax.vmap(lambda x0: nls_solve(problem, params, x0)))(
        jnp.asarray(guesses)
    )
    dx = np.abs(np.asarray(res.x) - ref_x).max(axis=1)
    ours_term = np.asarray(res.termination_state)
    ours_it = np.asarray(res.num_iterations)
    out = {
        "n_instances": len(guesses),
        "x_delta_max": float(dx.max()),
        "ref_all_at_optimum": bool((np.abs(ref_x - 1.0) < 1e-5).all()),
        "ours_all_at_optimum": bool(
            (np.abs(np.asarray(res.x) - 1.0) < 1e-5).all()
        ),
        "term_agree_frac": float((ours_term == ref_term).mean()),
        "iters_identical_frac": float((ours_it == ref_it).mean()),
        "iters_ref": ref_it.tolist(),
        "iters_ours": ours_it.tolist(),
    }
    out["pass"] = (
        out["x_delta_max"] < 5e-5
        and out["ref_all_at_optimum"]
        and out["ours_all_at_optimum"]
    )
    return out


# ---------------------------------------------------------------------------
# Himmelblau grid (nonlinear_test.cc:597-665).
# ---------------------------------------------------------------------------


def _himmelblau1(xy):
    return jnp.stack([xy[0] ** 2 + xy[1] - 11.0])


def _himmelblau2(xy):
    return jnp.stack([xy[0] + xy[1] ** 2 - 7.0])


def fuzz_himmelblau(binary: str, step: float = 0.3) -> dict:
    xs = np.arange(-4.5, 4.51, step)
    gx, gy = np.meshgrid(xs, xs)
    guesses = np.stack([gx.ravel(), gy.ravel()], axis=1)
    B = len(guesses)
    text = f"{B} -5.0\n" + "\n".join(_fmt(g) for g in guesses) + "\n"
    ref = np.array(
        [[float(v) for v in ln.split()] for ln in run_binary(binary, "himmelblau", text).splitlines()]
    )
    ref_term, ref_it, ref_qp_it, ref_x = (
        ref[:, 0].astype(int), ref[:, 1].astype(int), ref[:, 2].astype(int), ref[:, 3:],
    )

    problem = Problem(
        dimension=2,
        costs=(
            make_residual([0, 1], _himmelblau1, 1),
            make_residual([0, 1], _himmelblau2, 1),
        ),
        inequality_constraints=(
            Var(0) >= -5.0, Var(0) <= 5.0, Var(1) >= -5.0, Var(1) <= 5.0,
        ),
    )
    params = NLSParams(
        max_iterations=20,
        max_qp_iterations=10,
        relative_exit_tol=1e-12,
        absolute_first_derivative_tol=1e-8,
        termination_kkt_tolerance=1e-6,
    )
    res = jax.jit(jax.vmap(lambda x0: nls_solve(problem, params, x0)))(
        jnp.asarray(guesses)
    )
    ours_x = np.asarray(res.x)
    ours_it = np.asarray(res.num_iterations)
    ours_qp_it = np.asarray(res.iterations.qp_num_iterations).sum(axis=1)
    ok_ours = np.asarray(
        termination_state_indicates_satisfied_tol(res.termination_state)
    )
    ok_ref = np.isin(ref_term, [1, 2, 3])  # SATISFIED_* in reference order

    def basin(x):
        return np.argmin(
            np.linalg.norm(x[:, None, :] - HIMMELBLAU_ROOTS[None], axis=2), axis=1
        )

    b_ref, b_ours = basin(ref_x), basin(ours_x)
    same = b_ref == b_ours
    dx = np.abs(ours_x - ref_x).max(axis=1)
    out = {
        "n_instances": B,
        "ref_converged_frac": float(ok_ref.mean()),
        "ours_converged_frac": float(ok_ours.mean()),
        "basin_agree_frac": float(same.mean()),
        "x_delta_max_same_basin": float(dx[same].max()),
        "x_delta_p99_same_basin": float(np.percentile(dx[same], 99)),
        "term_agree_frac": float(
            (np.asarray(res.termination_state) == ref_term).mean()
        ),
        "iters_identical_frac": float((ours_it == ref_it).mean()),
        "iters_ref_p95": float(np.percentile(ref_it, 95)),
        "iters_ours_p95": float(np.percentile(ours_it, 95)),
        "qp_iters_ref_p95": float(np.percentile(ref_qp_it, 95)),
        "qp_iters_ours_p95": float(np.percentile(ours_qp_it, 95)),
    }
    out["pass"] = (
        out["ref_converged_frac"] == 1.0
        and out["ours_converged_frac"] == 1.0
        and out["basin_agree_frac"] >= 0.99
        and out["x_delta_max_same_basin"] < 5e-5
    )
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--qp-n", type=int, default=1000)
    ap.add_argument("--quick", action="store_true", help="small sizes (CI smoke)")
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--only", default=None, choices=[None, "qp", "rosenbrock", "himmelblau"]
    )
    args = ap.parse_args()

    binary = build_binary()
    results = {}
    if args.only in (None, "qp"):
        results["qp"] = fuzz_qp(binary, 50 if args.quick else args.qp_n)
        print(json.dumps({"qp": results["qp"]}, indent=2), flush=True)
    if args.only in (None, "rosenbrock"):
        results["rosenbrock"] = fuzz_rosenbrock(binary)
        print(json.dumps({"rosenbrock": results["rosenbrock"]}, indent=2), flush=True)
    if args.only in (None, "himmelblau"):
        results["himmelblau"] = fuzz_himmelblau(
            binary, step=1.0 if args.quick else 0.3
        )
        print(json.dumps({"himmelblau": results["himmelblau"]}, indent=2), flush=True)

    ok = all(r["pass"] for r in results.values())
    print(f"\ndiff_fuzz: {'PASS' if ok else 'FAIL'}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
