"""The fused-family DSL: user-defined families compiled to whole-solver
kernels must agree with the general solver on the same problems.

Two custom families no built-in wrapper covers:
* box-constrained Rosenbrock -- m_eq=0, a one-sided (upper) bound, no
  retraction: exercises the pure-LM + interior-point bound path;
* minimum-norm 3-link reach -- m_eq=2 (effector x AND y as hard equality
  rows), two-sided bounds on joints 1..2: exercises the multi-row condensed
  KKT system, state-level against nls_solve's recorded history.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mini_opt_tpu import Var, make_residual
from mini_opt_tpu.models.ik import default_ik_params, mod_pi_retraction
from mini_opt_tpu.nonlinear import Problem, nls_solve
from mini_opt_tpu.ops.pallas_ik import FusedFamily, _PI, _mod_pi, fused_solve_batch


# ---------------------------------------------------------------------------
# Family 1: Rosenbrock with an upper bound on x0 (active at the solution).
#   r1 = b (x1 - x0^2), r2 = a - x0,  s.t. x0 <= ub
# ---------------------------------------------------------------------------

_B_ROSEN = 10.0
_UB = 0.5


def _make_rosen_family():
    b = _B_ROSEN

    def linearize(x, data):
        (a,) = data
        x0, x1 = x
        r1 = b * (x1 - x0 * x0)
        r2 = a - x0
        f = 0.5 * (r1 * r1 + r2 * r2)
        # J = [[-2 b x0, b], [-1, 0]]
        g00 = 4.0 * b * b * x0 * x0 + 1.0
        g10 = -2.0 * b * b * x0
        g11 = b * b * jnp.ones_like(x0)
        c0 = -2.0 * b * x0 * r1 - r2
        c1 = b * r1
        return f, [], [], [[g00], [g10, g11]], [c0, c1]

    def errors(x, data):
        (a,) = data
        x0, x1 = x
        r1 = b * (x1 - x0 * x0)
        r2 = a - x0
        return 0.5 * (r1 * r1 + r2 * r2), jnp.zeros_like(x0)

    return FusedFamily(
        n=2,
        data_rows=1,
        m_eq=0,
        linearize=linearize,
        errors=errors,
        lower=(None, None),
        upper=(_UB, None),
    )


_ROSEN_FAMILY = _make_rosen_family()


def _rosen_problem(a):
    def res(p):
        return jnp.stack([_B_ROSEN * (p[1] - p[0] * p[0]), a - p[0]])

    return Problem(
        dimension=2,
        costs=(make_residual([0, 1], res, 2),),
        inequality_constraints=(Var(0) <= _UB,),
    )


def test_custom_family_bounded_rosenbrock_matches_general_solver():
    """Both solvers must land on the same bound-active constrained minimum
    from a batch of starts (the kernel's initial QP guess differs from the
    general solver's NAIVE guess for m_eq=0, so the gate is the optimum, not
    the trajectory)."""
    B = 128
    rng = np.random.default_rng(11)
    a = rng.uniform(0.8, 1.2, B)
    x0 = np.stack([rng.uniform(-0.5, 0.45, B), rng.uniform(-0.5, 1.0, B)], 1)

    x_fused = fused_solve_batch(
        _ROSEN_FAMILY,
        jnp.asarray(a[:, None]),
        jnp.asarray(x0),
        max_iterations=20,
        qp_iterations=8,
        ls_iterations=4,
    )

    params = dataclasses.replace(
        default_ik_params(jnp.float64, max_iterations=40, max_qp_iterations=10),
        max_line_search_iterations=6,
    )

    def one(ai, xi):
        return nls_solve(_rosen_problem(ai), params, xi)

    res = jax.jit(jax.vmap(one))(jnp.asarray(a), jnp.asarray(x0))

    xf = np.asarray(x_fused)
    xg = np.asarray(res.x)
    # The bound must be active (unconstrained optimum x0 = a > ub).
    assert (xf[:, 0] < _UB + 1e-7).all()
    assert np.abs(xf[:, 0] - _UB).max() < 1e-5, np.abs(xf[:, 0] - _UB).max()
    err = np.abs(xf - xg).max(axis=1)
    frac = (err < 1e-5).mean()
    assert frac >= 0.98, (frac, np.sort(err)[-5:])


# ---------------------------------------------------------------------------
# Family 2: minimum-norm 3-link reach, m_eq = 2.
#   min 0.5 ||th||^2  s.t. effector == (tx, ty), th_1, th_2 in [0, pi]
# ---------------------------------------------------------------------------

_L = 0.4
_N = 3


def _make_reach_family():
    n = _N
    L = _L

    def fk(th):
        phis = []
        acc = None
        for i in range(n):
            acc = th[i] if acc is None else acc + th[i]
            phis.append(acc)
        c = [jnp.cos(p) for p in phis]
        s = [jnp.sin(p) for p in phis]
        px = L * sum(c)
        py = L * sum(s)
        jx, jy = [], []
        sx = sy = None
        for a in range(n - 1, -1, -1):
            sx = s[a] if sx is None else sx + s[a]
            sy = c[a] if sy is None else sy + c[a]
            jx.append(-L * sx)
            jy.append(L * sy)
        jx.reverse()
        jy.reverse()
        return px, py, jx, jy

    def linearize(th, tgt):
        tx, ty = tgt
        px, py, jx, jy = fk(th)
        f = 0.5 * sum(t * t for t in th)
        one = jnp.ones_like(th[0])
        zero = jnp.zeros_like(th[0])
        G = [[one if i == j else zero for j in range(i + 1)] for i in range(n)]
        c = list(th)
        return f, [px - tx, py - ty], [jx, jy], G, c

    def errors(th, tgt):
        tx, ty = tgt
        px, py, _, _ = fk(th)
        f = 0.5 * sum(t * t for t in th)
        return f, jnp.abs(px - tx) + jnp.abs(py - ty)

    return FusedFamily(
        n=n,
        data_rows=2,
        m_eq=2,
        linearize=linearize,
        errors=errors,
        lower=(None,) + (0.0,) * (n - 1),
        upper=(None,) + (_PI,) * (n - 1),
        retract=lambda th: [_mod_pi(t) for t in th],
    )


_REACH_FAMILY = _make_reach_family()


def _reach_problem(target):
    def reg(p):
        return p

    def x_eq(p):
        phis = jnp.cumsum(p)
        return jnp.stack([_L * jnp.sum(jnp.cos(phis)) - target[0]])

    def y_eq(p):
        phis = jnp.cumsum(p)
        return jnp.stack([_L * jnp.sum(jnp.sin(phis)) - target[1]])

    idx = list(range(_N))
    return Problem(
        dimension=_N,
        costs=(make_residual(idx, reg, _N),),
        equality_constraints=(
            make_residual(idx, x_eq, 1),
            make_residual(idx, y_eq, 1),
        ),
        inequality_constraints=tuple(
            c for i in range(1, _N) for c in (Var(i) >= 0.0, Var(i) <= np.pi)
        ),
    )


def _reach_instances(B, seed=0):
    rng = np.random.default_rng(seed)
    th_true = np.stack(
        [rng.uniform(-1.0, 1.0, B)]
        + [rng.uniform(0.3, 2.4, B) for _ in range(_N - 1)],
        1,
    )
    phis = np.cumsum(th_true, axis=1)
    targets = np.stack(
        [_L * np.cos(phis).sum(1), _L * np.sin(phis).sum(1)], 1
    )
    x0 = th_true + rng.uniform(-0.2, 0.2, (B, _N))
    x0[:, 1:] = np.clip(x0[:, 1:], 0.05, np.pi - 0.05)
    return targets, x0


@pytest.mark.slow
def test_custom_family_two_equality_rows_state_parity():
    """m_eq=2: the fused kernel's per-iteration (f, |eq|) trajectory must
    match nls_solve's recorded history on identical instances (both use the
    SOLVE_EQUALITY_CONSTRAINED initial guess and the 18.32 penalty, so the
    trajectories are directly comparable, as in the built-in IK parity
    test)."""
    B = 64
    iters, qp, ls = 10, 6, 2
    targets, x0 = _reach_instances(B, seed=21)

    x_fused, hist = fused_solve_batch(
        _REACH_FAMILY,
        jnp.asarray(targets),
        jnp.asarray(x0),
        max_iterations=iters,
        qp_iterations=qp,
        ls_iterations=ls,
        debug_history=True,
    )

    params = dataclasses.replace(
        default_ik_params(jnp.float64, max_iterations=iters, max_qp_iterations=qp),
        max_line_search_iterations=ls,
        termination_kkt_tolerance=1e-30,  # inner QP never early-stops
        absolute_exit_tol=1e-30,
        relative_exit_tol=0.0,
        absolute_first_derivative_tol=0.0,
        early_exit=False,
        record_history=True,
        kkt_solver="ldlt",
    )
    from mini_opt_tpu.structs import BarrierStrategy

    params = dataclasses.replace(
        params, qp_barrier_strategy=BarrierStrategy.PREDICTOR_CORRECTOR
    )

    def one(t, x):
        return nls_solve(
            _reach_problem(t), params, x, retraction=mod_pi_retraction
        )

    res = jax.jit(jax.vmap(one))(jnp.asarray(targets), jnp.asarray(x0))

    f_gen = np.asarray(res.iterations.errors_initial.f)
    e_gen = np.asarray(res.iterations.errors_initial.equality)
    f_fus = np.asarray(hist[:, :, 0])
    e_fus = np.asarray(hist[:, :, 1])
    scale = 1.0 + np.maximum(f_gen, e_gen)
    err = np.maximum(np.abs(f_fus - f_gen), np.abs(e_fus - e_gen)) / scale
    frac_tight = (err < 1e-8).mean()
    assert frac_tight >= 0.95, (frac_tight, np.sort(err.ravel())[-5:])

    # And the solves actually reach the targets with bounded joints.
    phis = np.cumsum(np.asarray(x_fused), axis=1)
    eff = np.stack([_L * np.cos(phis).sum(1), _L * np.sin(phis).sum(1)], 1)
    reach_err = np.abs(eff - targets).max(axis=1)
    assert (reach_err < 1e-6).mean() >= 0.95, np.sort(reach_err)[-5:]
    assert (np.asarray(x_fused)[:, 1:] > -1e-9).all()
    assert (np.asarray(x_fused)[:, 1:] < np.pi + 1e-9).all()
