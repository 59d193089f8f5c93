"""Aux subsystem tests: serialization round trips (serialization.cc analog),
tracing collector (tracing.cc analog), warm-start checkpointing."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from mini_opt_tpu import make_residual
from mini_opt_tpu.nonlinear import NLSParams, Problem, nls_solve


def _solve_one():
    def rosenbrock(xy):
        return jnp.stack([1.0 - xy[0], 10.0 * (xy[1] - xy[0] * xy[0])])

    problem = Problem(dimension=2, costs=(make_residual([0, 1], rosenbrock, 2),))
    params = NLSParams(max_iterations=5, max_qp_iterations=1)
    return nls_solve(problem, params, jnp.asarray([-3.0, 2.0]))


def test_json_round_trip(tmp_path):
    from mini_opt_tpu.utils.serialization import (
        load_result_json,
        save_result_json,
    )

    res = _solve_one()
    path = str(tmp_path / "result.json")
    save_result_json(path, res)
    with open(path) as f:
        doc = json.load(f)
    assert doc["termination_state"] in ("SATISFIED_ABSOLUTE_TOL", "MAX_ITERATIONS")
    assert len(doc["iterations"]) == int(res.num_iterations)

    back = load_result_json(path)
    for a, b in zip(jax.tree.leaves(res), jax.tree.leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0, rtol=0)


def test_npz_round_trip_batched(tmp_path):
    from mini_opt_tpu.utils.serialization import load_result_npz, save_result_npz

    def rosenbrock(xy):
        return jnp.stack([1.0 - xy[0], 10.0 * (xy[1] - xy[0] * xy[0])])

    problem = Problem(dimension=2, costs=(make_residual([0, 1], rosenbrock, 2),))
    params = NLSParams(max_iterations=4, max_qp_iterations=1)
    x0 = jnp.asarray(np.random.default_rng(0).standard_normal((5, 2)))
    res = jax.vmap(lambda x: nls_solve(problem, params, x))(x0)

    path = str(tmp_path / "batch.npz")
    save_result_npz(path, res)
    back = load_result_npz(path)
    for a, b in zip(jax.tree.leaves(res), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trace_collector(tmp_path):
    from mini_opt_tpu.utils.tracing import annotate, scoped_trace, trace_collector

    trace_collector.clear()
    with scoped_trace("linearize"):
        with annotate("solve_kkt"):
            _ = jnp.ones(4).sum()
    doc = json.loads(trace_collector.get_trace_json())
    names = [e["name"] for e in doc["traceEvents"]]
    assert "linearize" in names and "solve_kkt" in names
    for e in doc["traceEvents"]:
        assert e["ph"] == "X" and e["dur"] >= 0 and "pid" in e and "tid" in e
    path = str(tmp_path / "trace.json")
    trace_collector.write(path)
    assert os.path.getsize(path) > 0


def test_solver_emits_phase_trace_events():
    """The solver itself is instrumented (nonlinear.cc:77,173,218,280,355,459
    wrap the six phases in scoped timers): a solve emits the phase events to
    the collector with no user wrapping, and the named_scope labels survive
    into the jaxpr so device profiles attribute ops to phases."""
    import jax

    from mini_opt_tpu import NLSParams, Problem, make_residual, nls_solve
    from mini_opt_tpu.utils.tracing import trace_collector

    rosen = make_residual(
        (0, 1),
        lambda xy: jnp.stack([1.0 - xy[0], 10.0 * (xy[1] - xy[0] * xy[0])]),
        dim=2,
    )
    problem = Problem(dimension=2, costs=(rosen,))
    params = NLSParams(max_iterations=5, max_qp_iterations=5)

    trace_collector.clear()
    res = nls_solve(problem, params, jnp.array([-1.0, 2.0]))
    assert bool(jnp.all(jnp.isfinite(res.x)))  # convergence not the point here
    doc = json.loads(trace_collector.get_trace_json())
    names = {e["name"] for e in doc["traceEvents"]}
    for phase in (
        "Solve",
        "LinearizeAndFillQP",
        "ComputeStepDirection",
        "SelectStepSize",
        "EvaluateNonlinearErrors",
        "ComputeQPCostDerivative",
        "QPInteriorPointSolve",
    ):
        assert phase in names, f"missing phase event {phase}: {sorted(names)}"

    # Under jit the phases are traced once; events still land.
    trace_collector.clear()
    jax.jit(lambda x: nls_solve(problem, params, x))(jnp.array([-1.0, 2.0]))
    names = {
        e["name"]
        for e in json.loads(trace_collector.get_trace_json())["traceEvents"]
    }
    assert "LinearizeAndFillQP" in names and "SelectStepSize" in names

    # named_scope labels survive lowering into HLO location metadata (the
    # attribution device profiles use); jaxpr's default printer hides the
    # name stack, so check the lowered text with debug info.
    hlo_text = (
        jax.jit(lambda x: nls_solve(problem, params, x))
        .lower(jnp.array([-1.0, 2.0]))
        .as_text(debug_info=True)
    )
    assert "LinearizeAndFillQP" in hlo_text
    assert "QPInteriorPointSolve" in hlo_text
    assert "SelectStepSize" in hlo_text


def test_warm_start_round_trip(tmp_path):
    from mini_opt_tpu import (
        QP,
        InitialGuessMethod,
        QPInteriorPointParams,
        Var,
        qp_ip_solve,
    )
    from mini_opt_tpu.utils.checkpoint import load_warm_start, save_warm_start

    rng = np.random.default_rng(0)
    G = np.eye(3) + 0.1
    c = rng.standard_normal(3)
    qp = QP.create(G, c, constraints=[Var(0) >= -5.0])
    res1 = qp_ip_solve(
        qp, QPInteriorPointParams(max_iterations=60, sigma=0.2)
    )
    from mini_opt_tpu import QPTerminationState

    assert int(res1.termination_state) == QPTerminationState.SATISFIED_KKT_TOL

    path = str(tmp_path / "warm.npz")
    save_warm_start(path, res1.x, res1.s, res1.y, res1.z)
    w = load_warm_start(path)

    # Resume mu from the iterate's own complementarity (qp.hpp:162-163);
    # restarting at initial_mu=1 would push the iterate back toward the
    # barrier's central path.
    params = QPInteriorPointParams(
        max_iterations=3,
        initial_guess_method=InitialGuessMethod.USER_PROVIDED,
        initialize_mu_with_complementarity=True,
    )
    res2 = qp_ip_solve(qp, params, x0=w["x"], s0=w["s"], y0=w["y"], z0=w["z"])
    # Warm-started from the converged iterate: immediately at the solution.
    np.testing.assert_allclose(np.asarray(res2.x), np.asarray(res1.x), atol=1e-6)


def test_orbax_pytree_checkpoint(tmp_path):
    pytest_orbax = __import__("pytest")
    pytest_orbax.importorskip("orbax.checkpoint")
    from mini_opt_tpu.utils.checkpoint import (
        load_pytree_orbax,
        save_pytree_orbax,
    )

    res = _solve_one()
    path = str(tmp_path / "ckpt")
    assert save_pytree_orbax(path, {"x": res.x, "it": res.num_iterations})
    back = load_pytree_orbax(path)
    np.testing.assert_array_equal(np.asarray(back["x"]), np.asarray(res.x))
    assert int(back["it"]) == int(res.num_iterations)


def test_nested_qp_telemetry_round_trip(tmp_path):
    """The NLS history embeds the COMPLETE per-QP-iteration records (the
    reference's NLSIteration.qp_outputs, structs.hpp:307), they render under
    include_qp=True (structs.cc:159-206), and they serialize through the
    discriminated-union JSON format (serialization.cc:79-124)."""
    from mini_opt_tpu.qp import Var
    from mini_opt_tpu.structs import QPSolverVariant, nls_result_to_string
    from mini_opt_tpu.utils.serialization import (
        load_result_json,
        save_result_json,
    )

    def rosenbrock(xy):
        return jnp.stack([1.0 - xy[0], 10.0 * (xy[1] - xy[0] * xy[0])])

    # Box constraints -> interior-point path with real QP iterations.
    problem = Problem(
        dimension=2,
        costs=(make_residual([0, 1], rosenbrock, 2),),
        inequality_constraints=(Var(0) >= -2.0, Var(1) <= 4.0),
    )
    params = NLSParams(max_iterations=6, max_qp_iterations=4)
    res = nls_solve(problem, params, jnp.asarray([-1.5, 2.0]))
    assert int(res.solver_variant) == QPSolverVariant.INTERIOR_POINT

    it = res.iterations
    n = int(res.num_iterations)
    assert it.qp_iterations.mu.shape == (6, 4)
    # Every executed outer iteration has its inner QP trajectory recorded:
    # mu values for executed QP iterations are positive, kkt errors decrease.
    for i in range(n):
        nq = int(it.qp_num_iterations[i])
        assert nq >= 1
        assert np.all(np.asarray(it.qp_iterations.mu[i, :nq]) > 0)
        k0 = float(it.qp_iterations.kkt_initial.r_dual[i, 0])
        kf = float(it.qp_iterations.kkt_final.r_dual[i, nq - 1])
        assert kf <= k0 * 1.01 + 1e-12
        # The summary scalar agrees with the nested record it summarizes.
        kkt_final_row = jax.tree.map(
            lambda a: a[i, nq - 1], it.qp_iterations.kkt_final
        )
        np.testing.assert_allclose(
            float(it.qp_kkt_final_max[i]), float(kkt_final_row.max()), rtol=1e-12
        )

    # Rendering includes the nested QP rows.
    text = nls_result_to_string(res, include_qp=True)
    assert "QP iteration 0" in text and "kkt initial" in text and "mu=" in text

    # JSON round trip preserves every nested value bit-exactly.
    path = str(tmp_path / "nested.json")
    save_result_json(path, res)
    with open(path) as f:
        doc = json.load(f)
    assert doc["solver_variant"] == "INTERIOR_POINT"
    row0 = doc["iterations"][0]
    assert "qp_outputs" in row0 and "qp_null_space_termination_state" not in row0
    assert len(row0["qp_outputs"]["iterations"]) == int(it.qp_num_iterations[0])
    for key in ("kkt_initial", "kkt_final", "mu", "alpha", "alpha_probe",
                "mu_affine"):
        assert key in row0["qp_outputs"]["iterations"][0]
    back = load_result_json(path)
    for a, b in zip(jax.tree.leaves(res), jax.tree.leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0, rtol=0)


def test_null_space_variant_serialization(tmp_path):
    """Equality-only problems serialize the null-space side of the variant
    (key presence discriminates, serialization.cc:79-91)."""
    from mini_opt_tpu.structs import QPSolverVariant
    from mini_opt_tpu.utils.serialization import (
        load_result_json,
        save_result_json,
    )

    def cost(xy):
        return jnp.stack([xy[0] - 2.0, xy[1] + 1.0])

    def eq(xy):
        return jnp.stack([xy[0] * xy[1] - 1.0])

    problem = Problem(
        dimension=2,
        costs=(make_residual([0, 1], cost, 2),),
        equality_constraints=(make_residual([0, 1], eq, 1),),
    )
    params = NLSParams(max_iterations=8)
    res = nls_solve(problem, params, jnp.asarray([1.5, 1.0]))
    assert int(res.solver_variant) == QPSolverVariant.NULL_SPACE

    path = str(tmp_path / "ns.json")
    save_result_json(path, res)
    with open(path) as f:
        doc = json.load(f)
    row0 = doc["iterations"][0]
    assert "qp_null_space_termination_state" in row0 and "qp_outputs" not in row0
    back = load_result_json(path)
    for a, b in zip(jax.tree.leaves(res), jax.tree.leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0, rtol=0)


def test_cg_path_result_round_trip_and_rendering(tmp_path):
    """NLSResult from the matrix-free CG path (equality-constrained) must
    serialize/deserialize exactly and render -- the CG path fills the same
    typed history rows as the dense paths (qp_num_iterations = cg_iterations,
    MAX_ITERATIONS termination for the inner 'QP')."""
    import jax

    from mini_opt_tpu import make_residual
    from mini_opt_tpu.nonlinear import NLSParams, Problem, nls_solve
    from mini_opt_tpu.structs import nls_result_to_string
    from mini_opt_tpu.utils.serialization import (
        load_result_json,
        save_result_json,
    )

    n = 6
    A = jnp.asarray(np.random.default_rng(0).normal(0, 1.0, (10, n)))
    b = jnp.asarray(np.random.default_rng(1).normal(0, 1.0, 10))
    C = jnp.ones((1, n))

    problem = Problem(
        dimension=n,
        costs=(make_residual(list(range(n)), lambda p: A @ p - b, 10),),
        equality_constraints=(
            make_residual(list(range(n)), lambda p: C @ p - 1.0, 1),
        ),
    )
    params = NLSParams(
        max_iterations=8, max_qp_iterations=1, qp_solver="cg", cg_iterations=30
    )
    res = jax.jit(lambda x: nls_solve(problem, params, x))(jnp.zeros((n,)))

    path = str(tmp_path / "cg_result.json")
    save_result_json(path, res)
    back = load_result_json(path)
    jax.tree.map(
        lambda a, c: np.testing.assert_array_equal(np.asarray(a), np.asarray(c)),
        res,
        back,
    )
    s = nls_result_to_string(res, include_qp=True)
    assert "term" in s.lower() or len(s) > 0
    # CG rows record the fixed inner-iteration count.
    ni = int(res.num_iterations)
    assert (np.asarray(res.iterations.qp_num_iterations)[:ni] == 30).all()
