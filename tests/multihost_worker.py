"""Worker script for the two-process multi-host test (run by
test_multihost.py, one subprocess per simulated host)."""

import os
import sys

port, pid_str, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
process_id = int(pid_str)

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=process_id
)

import numpy as np
import jax.numpy as jnp
from functools import partial
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mini_opt_tpu.models.ik import (
    default_ik_params,
    make_ik_problem,
    make_planar_chain,
    mod_pi_retraction,
)
from mini_opt_tpu.nonlinear import nls_solve

assert len(jax.devices()) == 8, jax.devices()  # 2 processes x 4 local
mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("dp",))

B = 16
rng = np.random.default_rng(0)  # same seed on both hosts -> same global data
angle = rng.uniform(0.3, 1.2, B)
radius = rng.uniform(0.45, 0.75, B)
targets_np = np.stack([radius * np.cos(angle), radius * np.sin(angle)], axis=1)
x0_np = np.stack([angle - 0.3, np.full(B, 0.6)], axis=1)

sharding = NamedSharding(mesh, P("dp"))
targets = jax.make_array_from_callback(
    (B, 2), sharding, lambda idx: targets_np[idx]
)
x0 = jax.make_array_from_callback((B, 2), sharding, lambda idx: x0_np[idx])

chain = make_planar_chain(2, dtype=jnp.float64)
params = default_ik_params(jnp.float64, max_iterations=12, max_qp_iterations=6)


@partial(
    jax.shard_map,
    mesh=mesh,
    check_vma=False,
    in_specs=(P("dp"), P("dp")),
    out_specs=P("dp"),
)
def solve_shard(t_local, x_local):
    def one(t, x):
        problem = make_ik_problem(chain, t, with_joint_limits=True)
        x_sol = nls_solve(problem, params, x, retraction=mod_pi_retraction).x
        return chain.update(x_sol).translation[:2]

    return jax.vmap(one)(t_local, x_local)


final = jax.jit(solve_shard)(targets, x0)
# Each process checks ITS local shards against the global ground truth.
max_err = 0.0
for shard in final.addressable_shards:
    idx = shard.index
    err = np.abs(np.asarray(shard.data) - targets_np[idx]).max()
    max_err = max(max_err, float(err))

# Second stage: the SERVING tier across hosts -- the fused whole-solver
# Pallas kernel sharded over the same global dp mesh, with per-lane
# termination state read back (round-3 serving-tier sharding).
from mini_opt_tpu.ops.pallas_ik import fused_termination_status, planar_family
from mini_opt_tpu.parallel.batch import shard_fused_solve_batch
from mini_opt_tpu.structs import NLSTerminationState

tf32 = jax.make_array_from_callback(
    (B, 2),
    sharding,
    lambda idx: targets_np[idx].astype(np.float32),
)
x0f_np = np.stack([angle, np.full(B, 1.2)], axis=1).astype(np.float32)
x0f = jax.make_array_from_callback((B, 2), sharding, lambda idx: x0f_np[idx])
xs, state = jax.jit(
    lambda t, x: shard_fused_solve_batch(
        mesh, planar_family(2, 0.4), t, x, return_state=True
    )
)(tf32, x0f)
status = fused_termination_status(state, f_tol=1e-5, eq_tol=1e-3)
fused_ok = True
for shard in status.addressable_shards:
    ok = np.all(
        np.asarray(shard.data) == int(NLSTerminationState.SATISFIED_ABSOLUTE_TOL)
    )
    fused_ok = fused_ok and bool(ok)

with open(out_path, "w") as f:
    if max_err >= 1e-3:
        f.write(f"FAIL max_err={max_err}")
    elif not fused_ok:
        f.write("FAIL fused lane unconverged")
    else:
        f.write("OK")
