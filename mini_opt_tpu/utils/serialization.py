"""Serialization of solver outputs: JSON + npz round trips.

Analog of the reference's opt-in nlohmann-json subsystem
(/root/reference/source/serialization.cc): the full solver output tree
(NLSResult including nested iteration/line-search/QP records) round-trips
through a human-readable JSON document with enum names as strings, and -- the
TPU-native addition -- through a compact ``.npz`` of the stacked history
arrays for offline analysis of entire solve *batches*.
"""

from __future__ import annotations

import json
from typing import Any, Dict

import jax
import numpy as np

from ..structs import (
    Errors,
    NLSIterationHistory,
    NLSResult,
    NLSTerminationState,
    OptimizerState,
    QPNullSpaceTerminationState,
    QPSolverVariant,
    QPTerminationState,
    StepSizeSelectionResult,
)


def _np(tree):
    return jax.tree.map(lambda a: np.asarray(a), tree)


def _kkt_row(k, i, j):
    return {
        "r_dual": float(k.r_dual[i, j]),
        "r_comp": float(k.r_comp[i, j]),
        "r_primal_eq": float(k.r_primal_eq[i, j]),
        "r_primal_ineq": float(k.r_primal_ineq[i, j]),
    }


def _qp_iterations_to_json(qh, i, n_qp):
    """Render the nested per-QP-iteration records of outer iteration ``i``
    (the information content of QPInteriorPointIteration,
    serialization.cc:98-124)."""
    return [
        {
            "kkt_initial": _kkt_row(qh.kkt_initial, i, j),
            "kkt_final": _kkt_row(qh.kkt_final, i, j),
            "mu": float(qh.mu[i, j]),
            "alpha": {
                "primal": float(qh.alpha.primal[i, j]),
                "dual": float(qh.alpha.dual[i, j]),
            },
            "alpha_probe": {
                "primal": float(qh.alpha_probe.primal[i, j]),
                "dual": float(qh.alpha_probe.dual[i, j]),
            },
            "mu_affine": float(qh.mu_affine[i, j]),
        }
        for j in range(n_qp)
    ]


def nls_result_to_json(result: NLSResult) -> Dict[str, Any]:
    """Render one (unbatched) NLSResult as a JSON-able dict; iteration rows
    are truncated to the executed count and enums become names (mirroring the
    readable format of serialization.cc:32-77)."""
    r = _np(result)
    n = int(r.num_iterations)
    it = r.iterations
    with_ev = it.qp_eigenvalues.min.shape[0] > 0
    variant = QPSolverVariant(int(getattr(r, "solver_variant", 0)))
    with_qp_hist = (
        variant == QPSolverVariant.INTERIOR_POINT
        and it.qp_iterations.mu.shape[-1] > 0
    )
    iterations = []
    for i in range(n):
        nsteps = int(it.line_search.num_steps[i])
        row_ev = (
            {
                "qp_eigenvalues": {
                    "min": float(it.qp_eigenvalues.min[i]),
                    "max": float(it.qp_eigenvalues.max[i]),
                    "abs_min": float(it.qp_eigenvalues.abs_min[i]),
                }
            }
            if with_ev
            else {}
        )
        iterations.append(
            {
                **row_ev,
                "iteration": i,
                "optimizer_state": OptimizerState(int(it.optimizer_state[i])).name,
                "lambda": float(it.lam[i]),
                "errors_initial": {
                    "f": float(it.errors_initial.f[i]),
                    "equality": float(it.errors_initial.equality[i]),
                },
                "directional_derivatives": {
                    "d_f": float(it.directional_derivatives.d_f[i]),
                    "d_equality": float(it.directional_derivatives.d_equality[i]),
                },
                "penalty": float(it.penalty[i]),
                "step_result": StepSizeSelectionResult(int(it.step_result[i])).name,
                # Discriminated union by key presence, mirroring the
                # reference's variant serializer (serialization.cc:79-91):
                # null-space iterations carry only the NS termination enum;
                # interior-point iterations carry the full qp_outputs tree.
                **(
                    {
                        "qp_null_space_termination_state": (
                            QPNullSpaceTerminationState(
                                int(it.qp_termination_state[i])
                            ).name
                        )
                    }
                    if variant == QPSolverVariant.NULL_SPACE
                    else {
                        "qp_outputs": {
                            "termination_state": QPTerminationState(
                                int(it.qp_termination_state[i])
                            ).name,
                            "num_iterations": int(it.qp_num_iterations[i]),
                            "kkt_final_max": float(it.qp_kkt_final_max[i]),
                            "iterations": (
                                _qp_iterations_to_json(
                                    it.qp_iterations,
                                    i,
                                    int(it.qp_num_iterations[i]),
                                )
                                if with_qp_hist
                                else []
                            ),
                        }
                    }
                ),
                "line_search_steps": [
                    {
                        "alpha": float(it.line_search.alpha[i, j]),
                        "f": float(it.line_search.f[i, j]),
                        "equality": float(it.line_search.equality[i, j]),
                    }
                    for j in range(nsteps)
                ],
            }
        )
    return {
        "termination_state": NLSTerminationState(int(r.termination_state)).name,
        "num_iterations": n,
        "x": r.x.tolist(),
        "errors": {"f": float(r.errors.f), "equality": float(r.errors.equality)},
        "solver_variant": variant.name,
        "iterations": iterations,
        "_shape": {
            "max_iterations": int(it.lam.shape[0]),
            "max_line_search_steps": int(it.line_search.alpha.shape[1]),
            "max_qp_iterations": int(it.qp_iterations.mu.shape[-1]),
            "dtype": str(r.x.dtype),
            "with_eigenvalues": bool(with_ev),
        },
    }


def nls_result_from_json(doc: Dict[str, Any]) -> NLSResult:
    """Inverse of nls_result_to_json: rebuilds the fixed-shape pytree (rows
    beyond num_iterations are zero, as the solver produces them)."""
    import jax.numpy as jnp

    shape = doc["_shape"]
    mi = shape["max_iterations"]
    ms = shape["max_line_search_steps"]
    mq = shape.get("max_qp_iterations", 0)
    dtype = jnp.dtype(shape["dtype"])
    variant = QPSolverVariant[doc.get("solver_variant", "INTERIOR_POINT")]
    hist = NLSIterationHistory.empty(
        mi,
        ms,
        dtype,
        with_eigenvalues=shape.get("with_eigenvalues", False),
        max_qp_iterations=mq,
    )
    hist = _np(hist)
    hist = jax.tree.map(lambda a: a.copy(), hist)
    for row in doc["iterations"]:
        i = row["iteration"]
        hist.optimizer_state[i] = OptimizerState[row["optimizer_state"]]
        hist.lam[i] = row["lambda"]
        hist.errors_initial.f[i] = row["errors_initial"]["f"]
        hist.errors_initial.equality[i] = row["errors_initial"]["equality"]
        hist.directional_derivatives.d_f[i] = row["directional_derivatives"]["d_f"]
        hist.directional_derivatives.d_equality[i] = row[
            "directional_derivatives"
        ]["d_equality"]
        hist.penalty[i] = row["penalty"]
        hist.step_result[i] = StepSizeSelectionResult[row["step_result"]]
        if "qp_null_space_termination_state" in row:
            hist.qp_termination_state[i] = QPNullSpaceTerminationState[
                row["qp_null_space_termination_state"]
            ]
        else:
            qp = row["qp_outputs"]
            hist.qp_termination_state[i] = QPTerminationState[
                qp["termination_state"]
            ]
            hist.qp_num_iterations[i] = qp["num_iterations"]
            hist.qp_kkt_final_max[i] = qp["kkt_final_max"]
            for j, q in enumerate(qp["iterations"]):
                for name in ("kkt_initial", "kkt_final"):
                    dst = getattr(hist.qp_iterations, name)
                    for f in ("r_dual", "r_comp", "r_primal_eq", "r_primal_ineq"):
                        getattr(dst, f)[i, j] = q[name][f]
                hist.qp_iterations.mu[i, j] = q["mu"]
                hist.qp_iterations.alpha.primal[i, j] = q["alpha"]["primal"]
                hist.qp_iterations.alpha.dual[i, j] = q["alpha"]["dual"]
                hist.qp_iterations.alpha_probe.primal[i, j] = q["alpha_probe"][
                    "primal"
                ]
                hist.qp_iterations.alpha_probe.dual[i, j] = q["alpha_probe"]["dual"]
                hist.qp_iterations.mu_affine[i, j] = q["mu_affine"]
        if "qp_eigenvalues" in row:
            hist.qp_eigenvalues.min[i] = row["qp_eigenvalues"]["min"]
            hist.qp_eigenvalues.max[i] = row["qp_eigenvalues"]["max"]
            hist.qp_eigenvalues.abs_min[i] = row["qp_eigenvalues"]["abs_min"]
        hist.line_search.num_steps[i] = len(row["line_search_steps"])
        for j, step in enumerate(row["line_search_steps"]):
            hist.line_search.alpha[i, j] = step["alpha"]
            hist.line_search.f[i, j] = step["f"]
            hist.line_search.equality[i, j] = step["equality"]

    to_jnp = lambda a: jnp.asarray(a)  # noqa: E731
    return NLSResult(
        termination_state=jnp.asarray(
            int(NLSTerminationState[doc["termination_state"]]), jnp.int32
        ),
        num_iterations=jnp.asarray(doc["num_iterations"], jnp.int32),
        x=jnp.asarray(doc["x"], dtype),
        errors=Errors(
            jnp.asarray(doc["errors"]["f"], dtype),
            jnp.asarray(doc["errors"]["equality"], dtype),
        ),
        iterations=jax.tree.map(to_jnp, hist),
        solver_variant=jnp.asarray(int(variant), jnp.int32),
    )


def save_result_json(path: str, result: NLSResult) -> None:
    with open(path, "w") as f:
        json.dump(nls_result_to_json(result), f, indent=1)


def load_result_json(path: str) -> NLSResult:
    with open(path) as f:
        return nls_result_from_json(json.load(f))


# ---------------------------------------------------------------------------
# Compact npz round-trip for whole (possibly batched) results.
# ---------------------------------------------------------------------------


def _template_treedef():
    return jax.tree.structure(
        NLSResult(
            termination_state=0,
            num_iterations=0,
            x=0,
            errors=Errors(0, 0),
            iterations=NLSIterationHistory.empty(0, 0),
            solver_variant=0,
        )
    )


def save_result_npz(path: str, result: NLSResult) -> None:
    """Save a (batched or unbatched) NLSResult pytree as one npz file.

    Leaves are stored under explicit ``leaf_{i}`` keys (flatten order) so the
    load path never depends on npz key enumeration order."""
    leaves, treedef = jax.tree.flatten(_np(result))
    named = {f"leaf_{i}": leaf for i, leaf in enumerate(leaves)}
    np.savez_compressed(
        path, __treedef__=np.frombuffer(str(treedef).encode(), np.uint8), **named
    )


def load_result_npz(path: str) -> NLSResult:
    import jax.numpy as jnp

    template = _template_treedef()
    with np.load(path) as data:
        stored = bytes(data["__treedef__"]).decode() if "__treedef__" in data else None
        if stored is not None and stored != str(template):
            raise ValueError(
                "npz treedef does not match the current NLSResult structure "
                f"(stored {stored!r})"
            )
        leaves = [data[f"leaf_{i}"] for i in range(template.num_leaves)]
    return jax.tree.unflatten(template, [jnp.asarray(l) for l in leaves])
