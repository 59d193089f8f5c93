"""Scenario-batch and pod-slice parallelism.

The reference is single-threaded (SURVEY.md section 2.3: no threading, no
distributed anything); scale in this framework comes from two axes instead:

* **Scenario/batch parallelism ("dp")**: thousands of independent problem
  instances vmapped per chip and sharded over a mesh axis with shard_map --
  the entire point of a TPU rebuild of a tiny dense solver.
* **Intra-instance partitioning ("mp")**: for large single instances, the
  residual blocks are partitioned across devices and the Gauss-Newton
  normal-equation assembly (J^T J, J^T r -- the scatter-add of
  residual.hpp:204-224) is psum-reduced over ICI; the condensed solve is
  replicated. See ``nls_solve(..., axis_name=...)``.

Collectives ride XLA (psum over ICI within a slice); there is no hand-written
communication backend, by design.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..nonlinear import NLSParams, Problem, nls_solve
from ..structs import NLSResult

ProblemFn = Callable[..., Problem]


def solve_batch(
    problem_fn: ProblemFn,
    params: NLSParams,
    x0_batch: jax.Array,
    data_batch=None,
    retraction=None,
    axis_name: Optional[str] = None,
) -> NLSResult:
    """Solve a batch of independent problem instances with one vmapped call.

    ``problem_fn(data_row) -> Problem`` builds the (statically identical)
    problem structure for one instance; per-instance data rides in closures
    over the traced ``data_row``. All leaves of the returned NLSResult gain a
    leading batch dimension.
    """

    def one(x0, data):
        problem = problem_fn(data) if data is not None else problem_fn()
        return nls_solve(
            problem, params, x0, retraction=retraction, axis_name=axis_name
        )

    if data_batch is None:
        return jax.vmap(lambda x0: one(x0, None))(x0_batch)
    return jax.vmap(one)(x0_batch, data_batch)


def shard_solve_batch(
    mesh: Mesh,
    problem_fn: ProblemFn,
    params: NLSParams,
    x0_batch: jax.Array,
    data_batch=None,
    batch_axis: str = "dp",
    retraction=None,
) -> NLSResult:
    """Shard the instance batch over ``mesh[batch_axis]`` and vmap locally.

    The batch dimension must divide the axis size. Each device solves its
    shard independently -- zero communication, linear scaling; this is the
    configuration behind the north-star metric (BASELINE.json).
    """
    spec = P(batch_axis)

    @partial(
        jax.shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=(spec, spec if data_batch is not None else None),
        out_specs=spec,
    )
    def run(x0_local, data_local):
        return solve_batch(
            problem_fn, params, x0_local, data_local, retraction=retraction
        )

    return run(x0_batch, data_batch)


def shard_solve_batch_2d(
    mesh: Mesh,
    problem_fn: ProblemFn,
    params: NLSParams,
    x0_batch: jax.Array,
    data_batch=None,
    shard_data=None,
    batch_axis: str = "dp",
    model_axis: str = "mp",
    retraction=None,
) -> NLSResult:
    """2-D parallel solve: instances sharded over ``batch_axis``; within each
    instance, cost residual blocks partitioned over ``model_axis``.

    ``problem_fn(data_row, shard_data_local) -> Problem`` receives the
    device-local slice of ``shard_data`` (leading axis sharded over
    ``model_axis``) and must build only the local partition of the cost
    terms; assembly is psum-reduced over ``model_axis`` inside the solver.
    Equality/inequality constraints must be replicated.
    """

    @partial(
        jax.shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=(P(batch_axis), P(batch_axis), P(model_axis)),
        out_specs=P(batch_axis),
    )
    def run(x0_local, data_local, shard_local):
        def one(x0, data):
            problem = problem_fn(data, shard_local)
            return nls_solve(
                problem, params, x0, retraction=retraction, axis_name=model_axis
            )

        return jax.vmap(one)(x0_local, data_local)

    return run(x0_batch, data_batch, shard_data)


def shard_fused_solve_batch(
    mesh: Mesh,
    family,
    data: jax.Array,  # (B, family.data_rows)
    x0: jax.Array,  # (B, family.n)
    batch_axis: str = "dp",
    **kernel_kwargs,
):
    """The SERVING tier sharded over ``mesh[batch_axis]``: each device runs
    the fused whole-solver Pallas kernel (ops/pallas_ik.py) on its local
    instance shard -- zero communication, linear scaling of the headline
    fused-kernel throughput across chips. ``kernel_kwargs`` are forwarded to
    :func:`fused_solve_batch` (budgets, barrier, ``return_state``, ...).

    The batch need not divide the axis size evenly at the kernel level (each
    shard pads itself to lane tiles), but it must divide it for shard_map's
    ``P(batch_axis)`` partitioning.
    """
    from ..ops.pallas_ik import fused_solve_batch

    spec = P(batch_axis)
    n_out = 1 + bool(kernel_kwargs.get("return_state")) + bool(
        kernel_kwargs.get("debug_history")
    )

    @partial(
        jax.shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=(spec, spec),
        out_specs=spec if n_out == 1 else (spec,) * n_out,
    )
    def run(d_local, x_local):
        return fused_solve_batch(family, d_local, x_local, **kernel_kwargs)

    return run(data, x0)


def shard_fused_mpc_solve_batch(
    mesh: Mesh,
    family,
    x_plant: jax.Array,  # (B, family.nx)
    z0: jax.Array,  # (B, family.dim)
    batch_axis: str = "dp",
    **kernel_kwargs,
):
    """The BLOCKED MPC tier sharded over ``mesh[batch_axis]``: each device
    runs ops/pallas_mpc.py::fused_mpc_solve_batch on its plant-fleet shard
    -- zero communication, linear scaling (round-4 VERDICT item 5: the
    blocked kernels join the distributed serving surface)."""
    from ..ops.pallas_mpc import fused_mpc_solve_batch

    spec = P(batch_axis)
    n_out = 1 + bool(kernel_kwargs.get("return_state")) + bool(
        kernel_kwargs.get("debug_history")
    )

    @partial(
        jax.shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=(spec, spec),
        out_specs=spec if n_out == 1 else (spec,) * n_out,
    )
    def run(x_local, z_local):
        return fused_mpc_solve_batch(family, x_local, z_local, **kernel_kwargs)

    return run(x_plant, z0)


def shard_fused_mpc_servo_batch(
    mesh: Mesh,
    family,
    x_plant: jax.Array,  # (B, family.nx)
    z0: jax.Array,  # (B, family.dim)
    periods: int,
    batch_axis: str = "dp",
    **kernel_kwargs,
):
    """The whole-servo-loop kernel (ops/pallas_mpc.py::fused_mpc_servo_batch)
    sharded over ``mesh[batch_axis]``.  Returns the same (x_final, z_final,
    stats) triple, each sharded on the batch axis."""
    from ..ops.pallas_mpc import fused_mpc_servo_batch

    spec = P(batch_axis)

    @partial(
        jax.shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=(spec, spec),
        out_specs=(spec, spec, spec),
    )
    def run(x_local, z_local):
        return fused_mpc_servo_batch(
            family, x_local, z_local, periods, **kernel_kwargs
        )

    return run(x_plant, z0)


def shard_pose_ring_solve_batch(
    mesh: Mesh,
    family,
    data: jax.Array,  # (B, 3N)
    x0: jax.Array,  # (B, 3N)
    batch_axis: str = "dp",
    **kernel_kwargs,
):
    """The blocked pose-ring tier (ops/pallas_pose_ring.py) sharded over
    ``mesh[batch_axis]`` -- batches of whole small SLAM graphs per device."""
    from ..ops.pallas_pose_ring import pose_ring_solve_batch

    spec = P(batch_axis)
    n_out = 1 + bool(kernel_kwargs.get("return_state"))

    @partial(
        jax.shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=(spec, spec),
        out_specs=spec if n_out == 1 else (spec,) * n_out,
    )
    def run(d_local, x_local):
        return pose_ring_solve_batch(family, d_local, x_local, **kernel_kwargs)

    return run(data, x0)


def make_mesh(axis_sizes: dict, devices=None) -> Mesh:
    """Build a Mesh over the available devices, e.g. make_mesh({'dp': 4,
    'mp': 2})."""
    devices = devices if devices is not None else jax.devices()
    import numpy as np

    names = tuple(axis_sizes.keys())
    shape = tuple(axis_sizes.values())
    n = int(np.prod(shape))
    assert n <= len(devices), f"mesh needs {n} devices, have {len(devices)}"
    return Mesh(np.asarray(devices[:n]).reshape(shape), names)


def batch_shard_result(result: NLSResult, mesh: Mesh, batch_axis: str = "dp"):
    """Convenience: apply a batch-axis sharding constraint to a result."""
    sharding = NamedSharding(mesh, P(batch_axis))
    return jax.lax.with_sharding_constraint(result, sharding)
