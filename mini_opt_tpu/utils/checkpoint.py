"""Warm-start / resume surface.

The reference resumes through externally-provided iterates:
``InitialGuessMethod::USER_PROVIDED`` + ``SetVariables``/``variables()``
(qp.hpp:199-202) and persisted solver-output histories. Here the same surface
is pytrees of arrays: save/load (possibly batched) iterates with numpy, or --
when available -- orbax for sharded multi-host checkpoints of large solve
batches.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def save_warm_start(path: str, x, s=None, y=None, z=None) -> None:
    """Persist a (batched or unbatched) interior-point iterate; feed it back
    through qp_ip_solve(..., x0=..., s0=..., y0=..., z0=...) with
    InitialGuessMethod.USER_PROVIDED."""
    arrays: Dict[str, Any] = {"x": np.asarray(x)}
    for name, v in (("s", s), ("y", y), ("z", z)):
        if v is not None:
            arrays[name] = np.asarray(v)
    np.savez_compressed(path, **arrays)


def load_warm_start(path: str) -> Dict[str, jax.Array]:
    with np.load(path) as data:
        return {k: jnp.asarray(data[k]) for k in data.files}


def save_pytree_orbax(path: str, tree) -> bool:
    """Checkpoint any pytree with orbax (sharding-aware; use for multi-host
    batches). Returns False if orbax is unavailable."""
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        return False
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    return True


def load_pytree_orbax(path: str, template=None):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template) if template is not None else ckptr.restore(path)
