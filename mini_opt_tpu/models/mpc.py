"""Model-predictive control family: cart-pole trajectory optimization.

The reference library was written to drive a cart-pole MPC controller (its
problem statement -- costs + nonlinear equality constraints + box inequality
constraints on a small dense variable vector, nonlinear.hpp:11-32 -- is
exactly a direct-transcription optimal-control problem). This module builds
that workload for the TPU framework:

* ``make_cartpole_mpc_problem``: direct multiple-shooting transcription of a
  horizon-T cart-pole swing-up/stabilization problem into a ``Problem`` --
  RK4 dynamics defects as nonlinear equality constraints (one Residual per
  step), quadratic state-tracking costs (one BlockResidual over the
  horizon), a control-effort cost, and actuation/track limits through the
  box-constraint DSL (Var(i) bounds, qp.hpp:77-92 semantics).
* ``mpc_rollout``: the receding-horizon servo loop as one ``lax.scan`` --
  solve, apply the first control, step the plant, SHIFT the solution one
  step as the next warm start (the USER_PROVIDED warm-start surface,
  qp.hpp:199-202) -- fully jitted, vmappable over a fleet of plants.

State layout: x = [cart position p, cart velocity v, pole angle theta
(0 = upright), pole rate w]; control u = horizontal force on the cart.
Decision vector z = [u_0..u_{T-1}, x_1..x_T] (dimension 5T).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..nonlinear import NLSParams, Problem, nls_solve
from ..qp import Var
from ..residual import BlockResidual, make_residual
from ..structs import LineSearchStrategy, NLSResult

NX = 4  # state dimension
NU = 1  # control dimension


@dataclasses.dataclass(frozen=True)
class CartPole:
    """Cart-pole plant constants (point-mass pole, frictionless)."""

    mass_cart: float = 1.0
    mass_pole: float = 0.1
    length: float = 0.5
    gravity: float = 9.81


def cartpole_xdot(cp: CartPole, state: jax.Array, u: jax.Array) -> jax.Array:
    """Continuous dynamics xdot = f(x, u); theta measured from UPRIGHT.

    From the cart-pole Lagrangian (M+m) p'' + m l th'' cos th
    - m l th'^2 sin th = u;  m l p'' cos th + m l^2 th'' - m g l sin th = 0.
    """
    m, M, length, g = cp.mass_pole, cp.mass_cart, cp.length, cp.gravity
    _, v, th, w = state[0], state[1], state[2], state[3]
    s, c = jnp.sin(th), jnp.cos(th)
    denom = M + m * s * s
    a = (u + m * s * (length * w * w - g * c)) / denom
    alpha = (g * s - a * c) / length
    return jnp.stack([v, a, w, alpha])


def rk4_step(cp: CartPole, state: jax.Array, u: jax.Array, dt: float) -> jax.Array:
    """One explicit RK4 step of the cart-pole dynamics."""
    k1 = cartpole_xdot(cp, state, u)
    k2 = cartpole_xdot(cp, state + 0.5 * dt * k1, u)
    k3 = cartpole_xdot(cp, state + 0.5 * dt * k2, u)
    k4 = cartpole_xdot(cp, state + dt * k3, u)
    return state + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)


# ---------------------------------------------------------------------------
# Decision-vector layout.
# ---------------------------------------------------------------------------


def mpc_dimension(horizon: int) -> int:
    return horizon * (NU + NX)


def u_index(t: int) -> int:
    """Global index of u_t, t in [0, T)."""
    return t


def x_indices(horizon: int, t: int) -> Tuple[int, ...]:
    """Global indices of state x_t, t in [1, T]."""
    base = horizon + NX * (t - 1)
    return tuple(range(base, base + NX))


def split_z(z: jax.Array, horizon: int) -> Tuple[jax.Array, jax.Array]:
    """z -> (controls (T,), states (T, NX) for t = 1..T)."""
    return z[:horizon], z[horizon:].reshape(horizon, NX)


# ---------------------------------------------------------------------------
# Transcription.
# ---------------------------------------------------------------------------


def make_cartpole_mpc_problem(
    cp: CartPole,
    x0: jax.Array,  # (NX,) current plant state; may be traced
    horizon: int,
    dt: float,
    u_max: float = 10.0,
    q: Tuple[float, float, float, float] = (1.0, 0.1, 10.0, 0.1),
    q_terminal: Tuple[float, float, float, float] = (10.0, 1.0, 100.0, 1.0),
    r_u: float = 0.01,
    goal: Optional[jax.Array] = None,
    p_max: Optional[float] = None,
) -> Problem:
    """Direct multiple-shooting transcription over ``horizon`` steps.

    Equality constraints: x_{t+1} - rk4(x_t, u_t) = 0 for t = 0..T-1 (the
    nonlinear g(x) == 0 slot of the problem statement, nonlinear.hpp:19).
    Costs: sqrt(q)*(x_t - goal) for t = 1..T-1, sqrt(q_terminal)*(x_T -
    goal), sqrt(r_u)*u. Box constraints: |u_t| <= u_max, and |p_t| <= p_max
    (track limits) when given.
    """
    T = int(horizon)
    dim = mpc_dimension(T)
    # All constants follow the plant state's dtype: under enabled x64, bare
    # jnp.zeros / jnp.asarray(tuple-of-floats) would be f64 and silently
    # promote an f32 solve (dtype-mismatched scan carries).
    dtype = jnp.asarray(x0).dtype
    goal_arr = jnp.zeros(NX, dtype) if goal is None else jnp.asarray(goal, dtype)

    # -- dynamics defects: one Residual per step ----------------------------
    eqs = []
    for t in range(T):
        xi_next = x_indices(T, t + 1)
        if t == 0:
            idx = (u_index(0),) + xi_next

            def defect0(zl, _x0=x0):
                return zl[1:] - rk4_step(cp, _x0.astype(zl.dtype), zl[0], dt)

            eqs.append(make_residual(idx, defect0, NX))
        else:
            idx = (u_index(t),) + x_indices(T, t) + xi_next

            def defect(zl):
                return zl[1 + NX :] - rk4_step(cp, zl[1 : 1 + NX], zl[0], dt)

            eqs.append(make_residual(idx, defect, NX))

    # -- state tracking: one homogeneous BlockResidual over t = 1..T --------
    w = jnp.concatenate(
        [
            jnp.tile(jnp.sqrt(jnp.asarray(q, dtype)), (T - 1, 1)),
            jnp.sqrt(jnp.asarray(q_terminal, dtype))[None, :],
        ]
    )  # (T, NX)
    data = jnp.concatenate([w, jnp.tile(goal_arr[None, :], (T, 1))], axis=1)
    indices = tuple(x_indices(T, t) for t in range(1, T + 1))

    def track(xl, row):
        return row[:NX] * (xl - row[NX:])

    track_cost = BlockResidual(fn=track, indices=indices, dim=NX, data=data)

    # -- control effort ------------------------------------------------------
    su = float(r_u) ** 0.5

    def effort(ul):
        return su * ul

    effort_cost = make_residual(tuple(range(T)), effort, T)

    # -- box constraints -----------------------------------------------------
    ineq = []
    for t in range(T):
        ineq += [Var(u_index(t)) >= -u_max, Var(u_index(t)) <= u_max]
    if p_max is not None:
        for t in range(1, T + 1):
            pi = x_indices(T, t)[0]
            ineq += [Var(pi) >= -p_max, Var(pi) <= p_max]

    return Problem(
        dimension=dim,
        costs=(track_cost, effort_cost),
        equality_constraints=tuple(eqs),
        inequality_constraints=tuple(ineq),
    )


def make_family_mpc_problem(fam, x0: jax.Array) -> Problem:
    """GENERIC direct multiple-shooting transcription for any
    ops/pallas_mpc.py::MPCFamily -- the general-path (``nls_solve``) twin of
    ``fused_mpc_solve_batch`` for user-dynamics families (the blocked-kernel
    oracle for plants beyond cart-pole, e.g. ``quadrotor_mpc_family``).

    Identical problem statement to ``make_cartpole_mpc_problem``
    (nonlinear.hpp:11-32: RK4 defects as equalities, sqrt(q) tracking rows,
    sqrt(r_u)*(u - u_ref) effort rows, u bounds through the Var DSL), with
    the dynamics, dimensions, and constants read off the family.  Decision
    layout matches the kernel: [u_0 .. u_{T-1} (nu each), x_1 .. x_T]."""
    from ..ops.pallas_mpc import _rk4

    T, nx, nu = fam.horizon, fam.nx, fam.nu
    dtype = jnp.asarray(x0).dtype
    x0 = jnp.asarray(x0, dtype)

    def u_idx(t):
        return tuple(range(t * nu, (t + 1) * nu))

    def x_idx(t):  # t in [1, T]
        base = T * nu + nx * (t - 1)
        return tuple(range(base, base + nx))

    eqs = []
    for t in range(T):
        if t == 0:
            idx = u_idx(0) + x_idx(1)

            def defect0(zl, _x0=x0):
                u = [zl[r] for r in range(nu)]
                xp = [_x0[i].astype(zl.dtype) for i in range(nx)]
                pred = _rk4(fam, xp, u)
                return jnp.stack([zl[nu + i] - pred[i] for i in range(nx)])

            eqs.append(make_residual(idx, defect0, nx))
        else:
            idx = u_idx(t) + x_idx(t) + x_idx(t + 1)

            def defect(zl):
                u = [zl[r] for r in range(nu)]
                xp = [zl[nu + i] for i in range(nx)]
                pred = _rk4(fam, xp, u)
                return jnp.stack(
                    [zl[nu + nx + i] - pred[i] for i in range(nx)]
                )

            eqs.append(make_residual(idx, defect, nx))

    w = jnp.concatenate(
        [
            jnp.tile(jnp.sqrt(jnp.asarray(fam.q, dtype)), (T - 1, 1)),
            jnp.sqrt(jnp.asarray(fam.q_terminal, dtype))[None, :],
        ]
    )  # (T, nx)
    goal_arr = jnp.asarray(fam.goal, dtype)
    data = jnp.concatenate([w, jnp.tile(goal_arr[None, :], (T, 1))], axis=1)
    indices = tuple(x_idx(t) for t in range(1, T + 1))

    def track(xl, row, _nx=nx):
        return row[:_nx] * (xl - row[_nx:])

    track_cost = BlockResidual(fn=track, indices=indices, dim=nx, data=data)

    su = [float(r) ** 0.5 for r in fam.r_u]
    uref = [float(r) for r in fam.u_ref]

    def effort(ul):
        return jnp.stack(
            [
                su[r] * (ul[t * nu + r] - uref[r])
                for t in range(T)
                for r in range(nu)
            ]
        )

    effort_cost = make_residual(tuple(range(T * nu)), effort, T * nu)

    ineq = []
    for t in range(T):
        for r in range(nu):
            ineq += [
                Var(t * nu + r) >= float(fam.u_min[r]),
                Var(t * nu + r) <= float(fam.u_max[r]),
            ]

    return Problem(
        dimension=fam.dim,
        costs=(track_cost, effort_cost),
        equality_constraints=tuple(eqs),
        inequality_constraints=tuple(ineq),
    )


def family_initial_guess(fam, x0: jax.Array) -> jax.Array:
    """Constant-state cold start for a generic MPCFamily: u = u_ref,
    x_t = x0 (see ``initial_guess`` for why constant beats a rollout)."""
    dtype = jnp.asarray(x0).dtype
    u = jnp.tile(jnp.asarray(fam.u_ref, dtype), (fam.horizon,))
    xs = jnp.tile(jnp.asarray(x0, dtype), (fam.horizon,))
    return jnp.concatenate([u, xs])


def family_rk4_step(fam, x: jax.Array, u: jax.Array) -> jax.Array:
    """One RK4 plant step of a generic family's dynamics (array in/out)."""
    from ..ops.pallas_mpc import _rk4

    xs = [x[i] for i in range(fam.nx)]
    us = [u[i] for i in range(fam.nu)]
    return jnp.stack(_rk4(fam, xs, us))


def riccati_kkt_solver(horizon: int) -> str:
    """KKT-solver name for the structured Riccati backend at this horizon.

    The MPC transcription's condensed interior-point system is an LQR saddle
    system; the Riccati backend (ops/riccati.py) eliminates it in T stages of
    (NX+NU)-sized algebra instead of the dense backends' O(dim) sequential
    factorization -- the structured fast path for this family. Pass the
    returned name as ``NLSParams.kkt_solver`` (``default_mpc_params(horizon=
    ...)`` does it for you)."""
    from ..ops.riccati import solver_name

    return solver_name(horizon, NX, NU)


def default_mpc_params(
    dtype=jnp.float32,
    max_iterations: int = 8,
    max_qp_iterations: int = 8,
    early_exit: bool = True,
    horizon: Optional[int] = None,
) -> NLSParams:
    """Solver configuration for the MPC family. f64 gets verification-grade
    tolerances; f32 the serving ladder. ``early_exit=False`` is the
    fixed-trip configuration for scans/batches (mpc_rollout forces it).
    Passing ``horizon`` selects the structured Riccati KKT backend (exact
    same solutions, T small stages instead of one dense factorization)."""
    f32 = dtype == jnp.float32
    kkt = riccati_kkt_solver(horizon) if horizon else "auto"
    return NLSParams(
        max_iterations=max_iterations,
        max_qp_iterations=max_qp_iterations,
        relative_exit_tol=1e-7 if f32 else 1e-12,
        absolute_first_derivative_tol=1e-6 if f32 else 1e-10,
        absolute_exit_tol=1e-8 if f32 else 1e-12,
        termination_kkt_tolerance=1e-5 if f32 else 1e-8,
        max_line_search_iterations=6,
        line_search_strategy=LineSearchStrategy.ARMIJO_BACKTRACK,
        armijo_search_tau=0.5,
        equality_penalty_initial=1.0,
        lambda_initial=1e-6,
        min_lambda=1e-12,
        lambda_failure_init=1e-3,
        early_exit=early_exit,
        kkt_solver=kkt,
    )


def serving_mpc_params(
    dtype=jnp.float32,
    horizon: int = 20,
    warm: Tuple[int, int, int] = (2, 2, 1),
):
    """(params, warm_params) for production receding-horizon serving: the
    full verification budget on the cold first period, a lean fixed-trip
    budget at steady state (Riccati KKT backend in both).

    Measured on-chip (256-plant cart-pole fleet, horizon 20, STATUS round-3
    ladder; every point stabilized_frac 1.0): warm (2,2,1) -> 55,465 control
    solves/s, (1,1,1) -> 181,138 (max transient state deviation vs the full
    budget 0.21 / 0.33 respectively; trajectory closeness pinned at f64 by
    tests/test_mpc.py). Pass both to ``mpc_rollout(_batch)``::

        params, warm_params = serving_mpc_params()
        mpc_rollout_batch(cp, x0, n, T, dt, params=params,
                          warm_params=warm_params)
    """
    params = default_mpc_params(dtype, early_exit=False, horizon=horizon)
    warm_params = dataclasses.replace(
        params,
        max_iterations=warm[0],
        max_qp_iterations=warm[1],
        max_line_search_iterations=warm[2],
    )
    return params, warm_params


def initial_guess(
    cp: CartPole, x0: jax.Array, horizon: int, dt: float
) -> jax.Array:
    """Constant-state cold start: u = 0, x_t = x0 for all t.

    Deliberately NOT the zero-control rollout: rolling the plant forward
    lets the pole fall across the horizon, and the tracking cost along that
    fallen trajectory creates a curved valley the SQP crawls through
    (measured: stabilization from theta=0.35 stalls at eq~0.2 after 25
    iterations from the rollout guess vs converging to 1e-12 in 6 from the
    constant guess). The constant guess keeps costs small and its defects
    (one-step drift) are killed in the first SQP step."""
    del cp, dt
    return jnp.concatenate(
        [jnp.zeros((horizon,), x0.dtype), jnp.tile(x0, horizon)]
    )


def solve_mpc(
    cp: CartPole,
    x0: jax.Array,
    horizon: int,
    dt: float,
    params: Optional[NLSParams] = None,
    z0: Optional[jax.Array] = None,
    **problem_kwargs,
) -> NLSResult:
    """Solve one trajectory-optimization instance."""
    if params is None:
        params = default_mpc_params(x0.dtype)
    if z0 is None:
        z0 = initial_guess(cp, x0, horizon, dt)
    problem = make_cartpole_mpc_problem(cp, x0, horizon, dt, **problem_kwargs)
    return nls_solve(problem, params, z0)


# ---------------------------------------------------------------------------
# Receding-horizon servo loop.
# ---------------------------------------------------------------------------


def shift_warm_start(
    cp: CartPole, z: jax.Array, horizon: int, dt: float
) -> jax.Array:
    """Shift a solved trajectory one control period: u_t <- u_{t+1} (last
    repeated), x_t <- x_{t+1}, new terminal state integrated from the last
    shifted pair. The standard MPC warm start."""
    u, X = split_z(z, horizon)
    u_next = jnp.concatenate([u[1:], u[-1:]])
    x_term = rk4_step(cp, X[-1], u_next[-1], dt)
    X_next = jnp.concatenate([X[1:], x_term[None, :]])
    return jnp.concatenate([u_next, X_next.reshape(-1)])


def mpc_rollout(
    cp: CartPole,
    x_init: jax.Array,  # (NX,)
    n_steps: int,
    horizon: int,
    dt: float,
    params: Optional[NLSParams] = None,
    disturbance: Optional[jax.Array] = None,  # (n_steps,) extra force on plant
    warm_params: Optional[NLSParams] = None,
    **problem_kwargs,
):
    """Receding-horizon control for ``n_steps`` periods as one lax.scan.

    Each period: solve the horizon problem from the current plant state
    (warm-started with the previous solution shifted one step), apply u_0 to
    the plant (plus optional disturbance force), advance. Fixed-trip solver
    budgets (early_exit is forced off: a while_loop under scan+vmap would run
    max-trip anyway, and fixed trips keep the program shape static).

    ``warm_params``: optional LEANER budget for periods 1..n-1. The cold
    first period (furthest from a solution) runs with ``params`` outside the
    scan; subsequent periods start from the shifted previous solution, which
    is already near-optimal, so a much smaller fixed-trip budget holds the
    same control quality at a fraction of the steady-state period time
    (measured on-chip in scripts/bench_extras.py mpc_riccati_warm).

    Returns (states (n_steps+1, NX), controls (n_steps,), solve_merit
    (n_steps,), term_states (n_steps,) int32).
    """
    if params is None:
        params = default_mpc_params(x_init.dtype, early_exit=False)
    if params.early_exit is not False:
        params = dataclasses.replace(params, early_exit=False)
    dist = (
        jnp.zeros((n_steps,), x_init.dtype) if disturbance is None else disturbance
    )

    def period(prm, x_plant, z_warm, d):
        problem = make_cartpole_mpc_problem(
            cp, x_plant, horizon, dt, **problem_kwargs
        )
        res = nls_solve(problem, prm, z_warm)
        u0 = res.x[0]
        x_next = rk4_step(cp, x_plant, u0 + d, dt)
        z_next = shift_warm_start(cp, res.x, horizon, dt)
        merit = res.errors.f + res.errors.equality
        return x_next, z_next, (u0, x_next, merit, res.termination_state)

    z0 = initial_guess(cp, x_init, horizon, dt)
    if warm_params is None:
        def body(carry, d):
            x_next, z_next, out = period(params, carry[0], carry[1], d)
            return (x_next, z_next), out

        (_, _), (us, xs, merits, terms) = jax.lax.scan(
            body, (x_init, z0), dist, length=n_steps
        )
    else:
        if warm_params.early_exit is not False:
            warm_params = dataclasses.replace(warm_params, early_exit=False)
        # Cold first period at the full budget, steady state at the lean one.
        x1, z1, out0 = period(params, x_init, z0, dist[0])

        def body(carry, d):
            x_next, z_next, out = period(warm_params, carry[0], carry[1], d)
            return (x_next, z_next), out

        (_, _), (us_w, xs_w, merits_w, terms_w) = jax.lax.scan(
            body, (x1, z1), dist[1:], length=n_steps - 1
        )
        us = jnp.concatenate([out0[0][None], us_w])
        xs = jnp.concatenate([out0[1][None], xs_w])
        merits = jnp.concatenate([out0[2][None], merits_w])
        terms = jnp.concatenate([out0[3][None], terms_w])
    states = jnp.concatenate([x_init[None, :], xs])
    return states, us, merits, terms


# ---------------------------------------------------------------------------
# Differentiable MPC: the solve as an implicit policy.
# ---------------------------------------------------------------------------


def linearized_dynamics(
    cp: CartPole, x_op: jax.Array, u_op: jax.Array, dt: float
) -> Tuple[jax.Array, jax.Array]:
    """(A, B) of the DISCRETE dynamics x+ = rk4(x, u) at an operating point."""
    A = jax.jacfwd(lambda x: rk4_step(cp, x, u_op, dt))(x_op)
    B = jax.jacfwd(lambda u: rk4_step(cp, x_op, u, dt))(jnp.asarray(u_op))
    return A, B.reshape(NX, NU)


def finite_horizon_lqr_gain(
    cp: CartPole,
    horizon: int,
    dt: float,
    q: Tuple[float, float, float, float] = (1.0, 0.1, 10.0, 0.1),
    q_terminal: Tuple[float, float, float, float] = (10.0, 1.0, 100.0, 1.0),
    r_u: float = 0.01,
) -> jax.Array:
    """First-period feedback gain K_0 of the finite-horizon LQR matching the
    MPC transcription at the upright equilibrium: u_0* = -K_0 @ x_0 for the
    problem min sum_{t=1}^{T-1} x_t'Qx_t + x_T'Q_T x_T + sum_t r u_t^2 with
    x+ = A x + B u (the rk4 dynamics linearized at the origin).

    The uniform 0.5 factor of the least-squares form cancels from the argmin,
    so K matches the 0.5*||r||^2 convention of the transcription. Used as an
    independent oracle for the implicit-differentiation feedback gain
    (du_0/dx_0 of the MPC solve at the equilibrium must equal -K_0)."""
    A, B = linearized_dynamics(
        cp, jnp.zeros((NX,)), jnp.zeros(()), dt
    )
    Q = jnp.diag(jnp.asarray(q, A.dtype))
    R = jnp.asarray([[r_u]], A.dtype)
    P = jnp.diag(jnp.asarray(q_terminal, A.dtype))
    K = None
    for t in range(horizon - 1, -1, -1):
        K = jnp.linalg.solve(R + B.T @ P @ B, B.T @ P @ A)  # (NU, NX)
        Qt = Q if t >= 1 else jnp.zeros_like(Q)
        P = Qt + A.T @ P @ (A - B @ K)
    return K


def make_implicit_mpc_solver(
    cp: CartPole,
    horizon: int,
    dt: float,
    params: Optional[NLSParams] = None,
    active_tol: float = 1.0e-6,
    **problem_kwargs,
):
    """``solve(x_plant, z0) -> z*`` differentiable in the PLANT STATE through
    the KKT conditions at the solution (implicit.py machinery: exact at a
    converged point, one linear solve in the backward pass regardless of the
    forward iteration count, active-set handling for saturated actuation).

    This makes the MPC policy ``u_0(x_plant)`` a differentiable function:
    ``jax.jacrev`` of it is the local feedback gain, and losses on closed-loop
    behavior can be trained through the controller (the "differentiable MPC"
    pattern, cf. Amos et al. 2018 -- here obtained from the framework's
    generic implicit-diff layer rather than a bespoke LQR backward pass)."""
    from ..implicit import make_implicit_solver

    if params is None:
        params = default_mpc_params(jnp.float64)

    def problem_fn(x_plant):
        return make_cartpole_mpc_problem(
            cp, x_plant, horizon, dt, **problem_kwargs
        )

    return make_implicit_solver(problem_fn, params, active_tol=active_tol)


def mpc_feedback_gain(
    cp: CartPole,
    x_op: jax.Array,  # (NX,) plant state to linearize the policy at
    horizon: int,
    dt: float,
    params: Optional[NLSParams] = None,
    **problem_kwargs,
) -> jax.Array:
    """du_0/dx_plant of the MPC policy at ``x_op``, shape (NX,): the local
    feedback gain the receding-horizon controller realizes. At the upright
    equilibrium this equals -K_0 of :func:`finite_horizon_lqr_gain`; away
    from it (or with active actuation limits) it is the exact derivative of
    the branch the solver landed on."""
    solve = make_implicit_mpc_solver(
        cp, horizon, dt, params=params, **problem_kwargs
    )
    z0 = initial_guess(cp, x_op, horizon, dt)

    def u0(x):
        return solve(x, z0)[u_index(0)]

    return jax.jacrev(u0)(x_op)


def fused_mpc_rollout_batch(
    cp: CartPole,
    x_init: jax.Array,  # (B, NX)
    n_steps: int,
    horizon: int,
    dt: float,
    budget: Tuple[int, int, int] = (2, 2, 1),
    cold_budget: Optional[Tuple[int, int, int]] = (8, 3, 2),
    disturbance: Optional[jax.Array] = None,  # (n_steps,)
    backend: str = "pallas",
    u_max: float = 10.0,
    q: Tuple[float, float, float, float] = (1.0, 0.1, 10.0, 0.1),
    q_terminal: Tuple[float, float, float, float] = (10.0, 1.0, 100.0, 1.0),
    r_u: float = 0.01,
):
    """Receding-horizon control of a plant fleet on the BLOCKED fused kernel.

    The general-path twin is ``mpc_rollout_batch`` (vmapped nls_solve per
    period); here every period solves the WHOLE fleet with one
    ``fused_mpc_solve_batch`` kernel call (ops/pallas_mpc.py) -- the medium-N
    blocked tier: stagewise linearization, register-Riccati interior point,
    and line search fused into a single launch instead of the general path's
    hundreds of small XLA ops per period.  Same warm-start discipline: the
    cold first period runs ``cold_budget`` (a second kernel specialization),
    steady state runs the lean ``budget``; solutions shift one step between
    periods (the USER_PROVIDED warm-start surface, qp.hpp:199-202).

    Returns (states (n_steps+1, B, NX), controls (n_steps, B),
    state (B, 3) = per-lane (f, |eq|_1, flags) of the LAST period's solve,
    for fused_termination_status).
    """
    from ..ops.pallas_mpc import cartpole_mpc_family, fused_mpc_solve_batch

    B = x_init.shape[0]
    fam = cartpole_mpc_family(
        horizon, float(dt), u_max=float(u_max), q=tuple(q),
        q_terminal=tuple(q_terminal), r_u=float(r_u),
        mass_cart=cp.mass_cart, mass_pole=cp.mass_pole,
        length=cp.length, gravity=cp.gravity,
    )
    dist = (
        jnp.zeros((n_steps,), x_init.dtype) if disturbance is None else disturbance
    )
    shift = jax.vmap(lambda z: shift_warm_start(cp, z, horizon, dt))
    step = jax.vmap(lambda x, u: rk4_step(cp, x, u, dt))

    def period(x, z_warm, d, bud):
        z, state = fused_mpc_solve_batch(
            fam, x, z_warm,
            max_iterations=bud[0], qp_iterations=bud[1], ls_iterations=bud[2],
            return_state=True, backend=backend,
        )
        u0 = z[:, 0]
        x_next = step(x, u0 + d)
        return x_next, shift(z), u0, state

    z0 = jax.vmap(lambda x: initial_guess(cp, x, horizon, dt))(x_init)
    x1, z1, u0_0, state0 = period(
        x_init, z0, dist[0], cold_budget if cold_budget else budget
    )

    def body(carry, d):
        x, z = carry
        x_next, z_next, u0, state = period(x, z, d, budget)
        return (x_next, z_next), (u0, x_next, state)

    (_, _), (us_w, xs_w, states_w) = jax.lax.scan(
        body, (x1, z1), dist[1:], length=n_steps - 1
    )
    us = jnp.concatenate([u0_0[None], us_w])
    xs = jnp.concatenate([x1[None], xs_w])
    states = jnp.concatenate([x_init[None], xs])
    final_state = jax.tree.map(lambda a: a[-1], states_w) if n_steps > 1 else state0
    return states, us, final_state


def mpc_rollout_batch(
    cp: CartPole,
    x_init: jax.Array,  # (B, NX)
    n_steps: int,
    horizon: int,
    dt: float,
    params: Optional[NLSParams] = None,
    warm_params: Optional[NLSParams] = None,
    **problem_kwargs,
):
    """A fleet of independent plants, one jitted vmap."""
    if params is None:
        params = default_mpc_params(x_init.dtype, early_exit=False)

    def one(x0):
        return mpc_rollout(
            cp, x0, n_steps, horizon, dt, params=params,
            warm_params=warm_params, **problem_kwargs
        )

    return jax.vmap(one)(x_init)
