"""Fused IK kernel vs the general solver (interpret mode on CPU; the real-TPU
path is validated by bench.py's 1e-3 parity gate)."""

import jax
import jax.numpy as jnp
import numpy as np

from mini_opt_tpu.models.ik import make_planar_chain
from mini_opt_tpu.ops.pallas_ik import fused_ik_solve_batch


def _instances(B, seed=0):
    rng = np.random.default_rng(seed)
    L = 0.4
    radius = rng.uniform(0.55, 0.95, B) * 2 * L
    angle = rng.uniform(0.25, 1.25, B)
    tx, ty = radius * np.cos(angle), radius * np.sin(angle)
    r2 = tx**2 + ty**2
    c1 = np.clip((r2 - 2 * L * L) / (2 * L * L), -1.0, 1.0)
    th1 = np.arccos(c1)
    th0 = np.arctan2(ty, tx) - np.arctan2(L * np.sin(th1), L + L * np.cos(th1))
    x0 = np.stack([th0, th1], axis=1) + rng.uniform(-0.3, 0.3, (B, 2))
    x0[:, 1] = np.clip(x0[:, 1], 0.05, np.pi - 0.05)
    return np.stack([tx, ty], axis=1), x0


def test_fused_kernel_reaches_targets():
    B = 256
    targets, x0 = _instances(B)
    out = fused_ik_solve_batch(
        jnp.asarray(targets, jnp.float32), jnp.asarray(x0, jnp.float32)
    )
    assert out.shape == (B, 2)
    chain = make_planar_chain(2, dtype=jnp.float64)
    final = jax.vmap(lambda x: chain.update(x).translation[:2])(
        jnp.asarray(np.asarray(out), jnp.float64)
    )
    err = np.abs(np.asarray(final) - targets).max(axis=1)
    assert (err < 1e-3).mean() >= 0.995, (
        f"parity {(err < 1e-3).mean():.4f}, worst {np.sort(err)[-5:]}"
    )
    # joint limits respected
    th1 = np.asarray(out)[:, 1]
    assert (th1 >= -1e-5).all() and (th1 <= np.pi + 1e-5).all()


def test_fused_kernel_padding():
    """Batch not a multiple of the lane block."""
    B = 130
    targets, x0 = _instances(B, seed=3)
    out = fused_ik_solve_batch(
        jnp.asarray(targets, jnp.float32), jnp.asarray(x0, jnp.float32)
    )
    assert out.shape == (B, 2)
    assert np.isfinite(np.asarray(out)).all()
