"""Multi-start robustification: targets that fail from a single cold start
(steep near-workspace-interior targets, the known hard family) must all
converge when solved from a small bank of starts with best-merit selection."""

import jax
import jax.numpy as jnp
import numpy as np

from mini_opt_tpu.models.ik import (
    default_ik_params,
    make_planar_chain,
    solve_ik_multi_start,
)

HARD_TARGETS = np.array(
    [
        [0.16128976, 0.41179699],
        [0.14030618, 0.34323918],
        [0.23415135, 0.30724872],
        [0.45, 0.6],
    ]
)


def test_multi_start_rescues_hard_targets():
    B = len(HARD_TARGETS)
    starts = np.array([[0.3, 0.3], [1.2, 0.5], [0.8, 2.2], [1.5, 2.8]])
    x0 = np.broadcast_to(starts[None], (B, len(starts), 2)).copy()

    chain = make_planar_chain(2, dtype=jnp.float64)
    params = default_ik_params(jnp.float64, max_iterations=30, max_qp_iterations=6)
    res = jax.jit(
        lambda t, x: solve_ik_multi_start(t, x, chain=chain, params=params)
    )(jnp.asarray(HARD_TARGETS), jnp.asarray(x0))

    final = jax.vmap(lambda x: chain.update(x).translation[:2])(res.x)
    err = np.abs(np.asarray(final) - HARD_TARGETS).max(axis=1)
    assert (err < 1e-3).all(), err
    # Result leaves have the per-instance (not per-start) shape.
    assert res.x.shape == (B, 2)
    assert res.termination_state.shape == (B,)
