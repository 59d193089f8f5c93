"""Flagship workload: batched transform-chain inverse kinematics.

This is the problem family behind the repo's headline benchmark
(BASELINE.json north star: >= 10k batched transform-chain IK solves/s per
chip at solution parity with the reference). It reproduces the reference's
actuator-limit IK test problem (nonlinear_test.cc:828-960): a planar chain of
Z-rotation actuators whose effector must reach a target, with a nonlinear
equality constraint on x, a soft cost on y, and optional joint-limit box
constraints -- then scales it the TPU way: one jitted solve vmapped over
thousands of per-instance targets, sharded over a device mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..nonlinear import NLSParams, Problem, nls_solve
from ..qp import Var
from ..residual import BlockResidual, make_residual
from ..structs import LineSearchStrategy, NLSResult
from ..utils import so3
from .chains import ActuatorChain, ActuatorLink, Pose


def make_planar_chain(
    n_active: int = 2, link_length: float = 0.4, dtype=jnp.float32
) -> ActuatorChain:
    """A chain of ``n_active`` Z-rotation actuators plus a fixed end link
    (the reference's two-angle chain for n_active=2,
    nonlinear_test.cc:832-838)."""
    mask = (0, 0, 1, 0, 0, 0)
    off = (0, 0, 0, 0, 0, 0)
    qi = so3.quat_identity(dtype)
    links = [ActuatorLink.create(Pose(qi, jnp.zeros(3, dtype)), mask)]
    for _ in range(n_active - 1):
        links.append(
            ActuatorLink.create(
                Pose(qi, jnp.asarray([link_length, 0.0, 0.0], dtype)), mask
            )
        )
    links.append(
        ActuatorLink.create(Pose(qi, jnp.asarray([link_length, 0.0, 0.0], dtype)), off)
    )
    return ActuatorChain(links=tuple(links))


def mod_pi_retraction(x, dx, alpha):
    """Angle-wrapping retraction (nonlinear_test.cc:869-874)."""
    return so3.mod_pi(x + dx * alpha)


def make_spatial_chain(
    n_active: int = 3, link_length: float = 0.4, dtype=jnp.float32
) -> ActuatorChain:
    """A 3-D chain of ``n_active`` single-axis actuators with ALTERNATING
    rotation axes (z, y, z, y, ...) plus a fixed end link -- the non-planar
    sibling of make_planar_chain, exercising the full SO(3) actuator-mask
    machinery (the reference's masked-Euler links,
    transform_chains.cc:94-158) instead of planar Z-rotations only."""
    mask_z = (0, 0, 1, 0, 0, 0)
    mask_y = (0, 1, 0, 0, 0, 0)
    off = (0, 0, 0, 0, 0, 0)
    qi = so3.quat_identity(dtype)
    links = [ActuatorLink.create(Pose(qi, jnp.zeros(3, dtype)), mask_z)]
    for a in range(1, n_active):
        links.append(
            ActuatorLink.create(
                Pose(qi, jnp.asarray([link_length, 0.0, 0.0], dtype)),
                mask_y if a % 2 else mask_z,
            )
        )
    links.append(
        ActuatorLink.create(Pose(qi, jnp.asarray([link_length, 0.0, 0.0], dtype)), off)
    )
    return ActuatorChain(links=tuple(links))


def make_spatial_ik_problem(
    chain: ActuatorChain,
    target_xyz: jax.Array,
    with_joint_limits: bool = True,
    joint_limit: float = 3.14159265,
) -> Problem:
    """Spatial analog of make_ik_problem: soft cost pins effector (y, z),
    equality constraint pins effector x, box limits on the non-leading
    joints."""
    P = chain.total_active

    def yz_res(params):
        st = chain.update(params)
        return (
            st.translation[1:3] - target_xyz[1:3],
            st.translation_D_params[1:3, :],
        )

    def x_eq(params):
        st = chain.update(params)
        return jnp.stack([st.translation[0] - target_xyz[0]]), st.translation_D_params[
            0:1, :
        ]

    ineq = ()
    if with_joint_limits:
        ineq = tuple(
            c for i in range(1, P) for c in (Var(i) >= 0.0, Var(i) <= joint_limit)
        )
    idx = list(range(P))
    return Problem(
        dimension=P,
        costs=(make_residual(idx, lambda p: yz_res(p)[0], 2, jac=yz_res),),
        equality_constraints=(
            make_residual(idx, lambda p: x_eq(p)[0], 1, jac=x_eq),
        ),
        inequality_constraints=ineq,
    )


def make_ik_problem(
    chain: ActuatorChain,
    target_xy: jax.Array,
    with_joint_limits: bool = True,
    joint_limit: float = 3.14159265,
) -> Problem:
    """The reference IK problem for one instance: soft cost pins effector y,
    equality constraint pins effector x, optional joint-limit box constraints
    on every non-leading joint. ``target_xy`` may be traced (vmap over
    targets)."""
    P = chain.total_active

    def y_res(params):
        st = chain.update(params)
        return jnp.stack([st.translation[1] - target_xy[1]]), st.translation_D_params[
            1:2, :
        ]

    def x_eq(params):
        st = chain.update(params)
        return jnp.stack([st.translation[0] - target_xy[0]]), st.translation_D_params[
            0:1, :
        ]

    ineq = ()
    if with_joint_limits:
        ineq = tuple(
            c for i in range(1, P) for c in (Var(i) >= 0.0, Var(i) <= joint_limit)
        )
    idx = list(range(P))
    return Problem(
        dimension=P,
        costs=(make_residual(idx, lambda p: y_res(p)[0], 1, jac=y_res),),
        equality_constraints=(
            make_residual(idx, lambda p: x_eq(p)[0], 1, jac=x_eq),
        ),
        inequality_constraints=ineq,
    )


def make_waypoint_ik_problem(
    chain: ActuatorChain,
    offsets: jax.Array,  # (W, 3) effector-frame waypoint offsets
    targets: jax.Array,  # (W, 3) world-frame targets
    weights: jax.Array,  # (W,)
) -> Problem:
    """Large-instance variant: W waypoint-matching residual blocks, each
    pulling an effector-frame offset point to a world target. Built as ONE
    BlockResidual so the blocks can be partitioned across a mesh axis (pass
    the device-local slices + axis_name to nls_solve)."""
    P = chain.total_active
    W = targets.shape[0]
    data = jnp.concatenate(
        [offsets, targets, weights[:, None]], axis=1
    )  # (W, 7)

    def one_waypoint(params, row):
        st = chain.update(params)
        offset, target, w = row[:3], row[3:6], row[6]
        pt = so3.quat_rotate(st.rotation, offset) + st.translation
        return w * (pt - target)

    indices = tuple(tuple(range(P)) for _ in range(W))
    return Problem(
        dimension=P,
        costs=(BlockResidual(fn=one_waypoint, indices=indices, dim=3, data=data),),
    )


def default_ik_params(
    dtype=jnp.float32,
    max_iterations: int = 12,
    max_qp_iterations: int = 6,
) -> NLSParams:
    """Practical tolerances for the f32 TPU throughput path; the f64
    verification path uses the tighter reference tolerances in tests."""
    f32 = dtype == jnp.float32
    return NLSParams(
        max_iterations=max_iterations,
        max_qp_iterations=max_qp_iterations,
        relative_exit_tol=1e-6 if f32 else 1e-12,
        absolute_first_derivative_tol=1e-6 if f32 else 1e-10,
        absolute_exit_tol=1e-7 if f32 else 1e-9,
        termination_kkt_tolerance=1e-5 if f32 else 1e-6,
        max_line_search_iterations=10,
        equality_penalty_initial=0.01,
        line_search_strategy=LineSearchStrategy.ARMIJO_BACKTRACK,
        lambda_failure_init=0.001,
        armijo_search_tau=0.5,
        lambda_initial=0.001,
        min_lambda=1e-9,
        # "auto" resolves at trace time: ldlt on TPU (lu_factor's lowering
        # crashes the TPU compiler when nested in solver loops; CLAUDE.md),
        # lu elsewhere.
        kkt_solver="auto",
    )


def solve_ik_batch(
    targets: jax.Array,  # (B, 2)
    x0: jax.Array,  # (B, P)
    chain: Optional[ActuatorChain] = None,
    params: Optional[NLSParams] = None,
    with_joint_limits: bool = True,
) -> NLSResult:
    """Solve B independent IK instances in one vmapped call."""
    dtype = x0.dtype
    if chain is None:
        chain = make_planar_chain(n_active=x0.shape[-1], dtype=dtype)
    if params is None:
        params = default_ik_params(dtype)

    def one(target, x0_one):
        problem = make_ik_problem(chain, target, with_joint_limits)
        return nls_solve(problem, params, x0_one, retraction=mod_pi_retraction)

    return jax.vmap(one)(targets, x0)


def solve_ik_multi_start(
    targets: jax.Array,  # (B, 2)
    x0: jax.Array,  # (B, S, P): S starts per instance
    chain: Optional[ActuatorChain] = None,
    params: Optional[NLSParams] = None,
    with_joint_limits: bool = True,
) -> NLSResult:
    """Multi-start robustification: solve every instance from S starts (all
    B*S solves batched together -- on TPU extra starts are nearly free) and
    keep, per instance, the start with the lowest merit. The standard cure
    for the basin-of-attraction failures hard targets cause from a single
    cold start."""
    B, S, P = x0.shape
    dtype = x0.dtype
    if chain is None:
        chain = make_planar_chain(n_active=P, dtype=dtype)
    if params is None:
        params = default_ik_params(dtype)

    targets_rep = jnp.repeat(targets, S, axis=0)  # (B*S, 2)
    res = solve_ik_batch(
        targets_rep, x0.reshape(B * S, P), chain, params, with_joint_limits
    )
    res = jax.tree.map(lambda a: a.reshape((B, S) + a.shape[1:]), res)
    merit = res.errors.f + res.errors.equality  # (B, S)
    best = jnp.argmin(merit, axis=1)
    return jax.tree.map(lambda a: a[jnp.arange(B), best], res)


def scalar_planar_ik_builder(n_active: int, link_len: float = 0.4):
    """The planar IK problem as a SCALAR-STYLE ``problem_builder`` for
    ``family_from_problem`` (ops/fused_auto.py): identical problem to
    ``make_ik_problem`` (reference nonlinear_test.cc:828-960 -- soft cost on
    effector y, equality on effector x, [0, pi] limits on joints 1..n-1) but
    with the forward kinematics written as static Python indexing +
    elementwise jnp ops, so the SAME ``Problem`` drives ``nls_solve`` and
    compiles to a fused whole-solver Pallas kernel.

    Returns ``builder(data) -> Problem`` with ``data = (tx, ty)``.
    """
    L = link_len
    n = n_active
    idx = list(range(n))

    def builder(data):
        tx, ty = data[0], data[1]

        def effector(p):
            acc = None
            px = None
            py = None
            for i in range(n):
                acc = p[i] if acc is None else acc + p[i]
                cx = L * jnp.cos(acc)
                sy = L * jnp.sin(acc)
                px = cx if px is None else px + cx
                py = sy if py is None else py + sy
            return px, py

        def y_res(p):
            return jnp.stack([effector(p)[1] - ty])

        def x_eq(p):
            return jnp.stack([effector(p)[0] - tx])

        ineq = tuple(
            c
            for i in range(1, n)
            for c in (Var(i) >= 0.0, Var(i) <= 3.14159265)
        )
        return Problem(
            dimension=n,
            costs=(make_residual(idx, y_res, 1),),
            equality_constraints=(make_residual(idx, x_eq, 1),),
            inequality_constraints=ineq,
        )

    return builder


def _c_neg(a):
    return -a


def _c_mul(a, b):
    """Constant-folding multiply: python-float identities stay floats, exact
    0/1 factors vanish — keeps the generated register code (and therefore the
    Mosaic kernel) free of dead ops from inactive mask bits."""
    if isinstance(a, float):
        if a == 0.0:
            return 0.0
        if a == 1.0:
            return b
        if isinstance(b, float):
            return a * b
    if isinstance(b, float):
        if b == 0.0:
            return 0.0
        if b == 1.0:
            return a
    return a * b


def _c_add(a, b):
    if isinstance(a, float) and a == 0.0:
        return b
    if isinstance(b, float) and b == 0.0:
        return a
    return a + b


def _m3_mul(A, B):
    """3x3 product of nested-list matrices whose entries are python floats
    or register arrays. ``None`` stands for the identity."""
    if A is None:
        return B
    if B is None:
        return A
    return [
        [
            _c_add(
                _c_add(_c_mul(A[i][0], B[0][j]), _c_mul(A[i][1], B[1][j])),
                _c_mul(A[i][2], B[2][j]),
            )
            for j in range(3)
        ]
        for i in range(3)
    ]


def _axis_rot(angle, axis):
    """Rx/Ry/Rz as an entry list; float angles fold to float entries, exact
    zero folds to identity (None)."""
    import math

    if isinstance(angle, float):
        if angle == 0.0:
            return None
        c, s = math.cos(angle), math.sin(angle)
    else:
        c, s = jnp.cos(angle), jnp.sin(angle)
    if axis == 0:
        return [[1.0, 0.0, 0.0], [0.0, c, _c_neg(s)], [0.0, s, c]]
    if axis == 1:
        return [[c, 0.0, s], [0.0, 1.0, 0.0], [_c_neg(s), 0.0, c]]
    return [[c, _c_neg(s), 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]]


def scalar_chain_fk(chain: ActuatorChain, p):
    """Forward kinematics of ANY ActuatorChain in SCALAR STYLE: static Python
    indexing of ``p`` plus elementwise ops only — no matmul, scan, or
    shape-dependent code — so the same function serves the general path
    (``p`` a (P,) vector) and the fused-kernel compiler (``p`` a (P, 8, 128)
    register stack; ops/fused_auto.py).

    The per-link mask/base-pose structure (transform_chains.hpp:124-153) is
    burned in at trace time: inactive euler angles and translations fold to
    python-float constants (link poses are concrete at build time), so a
    planar chain generates exactly the cos/sin accumulation the handwritten
    planar family uses, while arbitrary SO(3) masks generate the minimal set
    of register 3x3 products. Returns ``(R, t)``: a 3x3 nested list (or
    ``None`` for identity) and a 3-list, entries floats or registers.

    Link constants are read through wholesale ``np.asarray`` (never jnp
    indexing): under an enclosing trace, slicing even a concrete array
    stages to a tracer (omnistaging), while numpy conversion of concrete
    closure data stays eager.
    """
    import numpy as np

    R = None  # accumulated rotation (None == identity)
    t = [0.0, 0.0, 0.0]
    pos = 0
    for link in chain.links:
        rot_xyz = np.asarray(link.rotation_xyz, np.float64)
        trans = np.asarray(link.translation, np.float64)
        # --- link rotation ------------------------------------------------
        if link.active_rotation_count == 0:
            # Mirror ActuatorLink.compute: use the stored quaternion
            # directly (the euler decomposition may sit at a singularity).
            qw, qx, qy, qz = np.asarray(link.rotation, np.float64)
            Rq = np.array(
                [
                    [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qw * qz),
                     2 * (qx * qz + qw * qy)],
                    [2 * (qx * qy + qw * qz), 1 - 2 * (qx * qx + qz * qz),
                     2 * (qy * qz - qw * qx)],
                    [2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx),
                     1 - 2 * (qx * qx + qy * qy)],
                ]
            )
            if np.array_equal(Rq, np.eye(3)):
                R_link = None
            else:
                R_link = [[float(Rq[i, j]) for j in range(3)] for i in range(3)]
        else:
            R_link = None
            for axis in range(3):
                if link.active[axis]:
                    ang = p[pos]
                    pos += 1
                else:
                    ang = float(rot_xyz[axis])
                R_link = _m3_mul(R_link, _axis_rot(ang, axis))
        # --- link translation ----------------------------------------------
        tl = []
        for axis in range(3):
            if link.active[axis + 3]:
                tl.append(p[pos])
                pos += 1
            else:
                tl.append(float(trans[axis]))
        # --- compose: t += R @ tl; R = R @ R_link ---------------------------
        if R is None:
            t = [_c_add(t[i], tl[i]) for i in range(3)]
        else:
            t = [
                _c_add(
                    t[i],
                    _c_add(
                        _c_add(_c_mul(R[i][0], tl[0]), _c_mul(R[i][1], tl[1])),
                        _c_mul(R[i][2], tl[2]),
                    ),
                )
                for i in range(3)
            ]
        R = _m3_mul(R, R_link)
    return R, t


def scalar_chain_ik_builder(
    chain: ActuatorChain,
    target_dim: int = 2,
    with_joint_limits: bool = True,
    joint_limit: float = 3.14159265,
    prox_weight: float = 0.0,
):
    """The IK problem of an ARBITRARY ActuatorChain as a scalar-style
    ``problem_builder`` for ``family_from_problem`` (ops/fused_auto.py):
    the generalization of ``scalar_planar_ik_builder`` from planar
    Z-rotation chains to any 6-bit actuator-mask layout, via
    ``scalar_chain_fk``. The SAME returned ``Problem`` drives ``nls_solve``
    and compiles to a fused whole-solver Pallas kernel.

    ``target_dim=2`` mirrors ``make_ik_problem`` (soft y cost, x equality);
    ``target_dim=3`` mirrors ``make_spatial_ik_problem`` (soft (y, z) cost,
    x equality). ``data = target`` of that length.

    ``prox_weight > 0`` appends the damped-least-squares proximal cost
    ``sqrt(prox_weight) * (x - x_ref)`` with ``x_ref`` carried as P extra
    data rows (``data = concat(target, x_ref)``). On REDUNDANT chains
    (more DOF than task constraints) the unregularized Gauss-Newton
    landscape has constrained dead-ends that trap ~2% of warm starts (both
    solver tiers); the proximal term makes the subproblem well-posed. The
    serving recipe is proximal-POINT continuation: keep the term on and
    RE-CENTER ``x_ref`` at each stage's result (``fused_solve_proximal``) —
    the regularization bias shrinks geometrically with the stage count
    (tests/test_fused_auto.py pins this on a 4-DOF chain).
    """
    assert target_dim in (2, 3)
    P = chain.total_active
    idx = list(range(P))
    sqrt_w = float(prox_weight) ** 0.5
    expected_rows = target_dim + (P if prox_weight > 0.0 else 0)

    def builder(data):
        # Static out-of-bounds indices are silently CLAMPED by jnp on the
        # general path, so a missing x_ref block would read the last target
        # row instead of failing -- check the data length loudly.
        if len(data) < expected_rows:
            raise ValueError(
                f"builder expects {expected_rows} data rows "
                f"({target_dim} target"
                + (f" + {P} x_ref (prox_weight > 0)" if prox_weight > 0 else "")
                + f"), got {len(data)}"
            )
        def soft_res(p):
            _, t = scalar_chain_fk(chain, p)
            if target_dim == 2:
                return jnp.stack([t[1] - data[1]])
            return jnp.stack([t[1] - data[1], t[2] - data[2]])

        def x_eq(p):
            _, t = scalar_chain_fk(chain, p)
            return jnp.stack([t[0] - data[0]])

        costs = [make_residual(idx, soft_res, target_dim - 1)]
        if prox_weight > 0.0:

            def prox_res(p):
                return jnp.stack(
                    [sqrt_w * (p[i] - data[target_dim + i]) for i in range(P)]
                )

            costs.append(make_residual(idx, prox_res, P))

        ineq = ()
        if with_joint_limits:
            ineq = tuple(
                c
                for i in range(1, P)
                for c in (Var(i) >= 0.0, Var(i) <= joint_limit)
            )
        return Problem(
            dimension=P,
            costs=tuple(costs),
            equality_constraints=(make_residual(idx, x_eq, 1),),
            inequality_constraints=ineq,
        )

    return builder


_CHAIN_BUILDER_CACHE: dict = {}


def fused_chain_ik_solve(
    chain: ActuatorChain,
    targets: jax.Array,  # (B, 2) or (B, 3)
    x0: jax.Array,  # (B, P)
    params: Optional[NLSParams] = None,
    with_joint_limits: bool = True,
    joint_limit: float = 3.14159265,
    prox_weight: float = 0.0,
    prox_stages: int = 4,
):
    """One-call fused-kernel IK for ANY ActuatorChain.

    Builds (and caches, per chain object) the scalar-style IK problem via
    ``scalar_chain_ik_builder``, compiles it to a whole-solver Pallas
    kernel, and solves all B instances. ``targets.shape[1]`` selects the
    planar (2) or spatial (3) cost structure. ``prox_weight > 0`` runs
    ``prox_stages`` re-centered proximal stages (the redundant-chain cure;
    see ``fused_solve_proximal``). Defaults to the Mehrotra serving budget
    (10/3/1); pass ``params`` to override budgets (``fused_nls_solve_batch``
    semantics: fixed trips, tolerance knobs ignored).

    Reuse the SAME chain object across calls — the kernel cache is keyed on
    it (a rebuilt chain recompiles).
    """
    import dataclasses

    from ..ops.fused_auto import fused_nls_solve_batch
    from ..structs import BarrierStrategy

    target_dim = int(targets.shape[1])
    key = (
        id(chain), target_dim, with_joint_limits, float(joint_limit),
        float(prox_weight),
    )
    if key not in _CHAIN_BUILDER_CACHE:
        _CHAIN_BUILDER_CACHE[key] = (
            chain,  # strong ref: keeps id() valid for the cache lifetime
            scalar_chain_ik_builder(
                chain, target_dim=target_dim,
                with_joint_limits=with_joint_limits,
                joint_limit=joint_limit, prox_weight=prox_weight,
            ),
        )
    builder = _CHAIN_BUILDER_CACHE[key][1]
    if params is None:
        params = dataclasses.replace(
            default_ik_params(x0.dtype, max_iterations=10, max_qp_iterations=3),
            max_line_search_iterations=1,
            qp_barrier_strategy=BarrierStrategy.PREDICTOR_CORRECTOR,
            early_exit=False,
        )
    if prox_weight <= 0.0:
        return fused_nls_solve_batch(builder, targets, x0, params)
    x = x0
    for _ in range(prox_stages):
        d = jnp.concatenate([targets, x], axis=1)
        x = fused_nls_solve_batch(builder, d, x, params)
    return x


def make_spatial_refine_fn(
    n_active: int = 3,
    link_length: float = 0.4,
    max_iterations: int = 12,
    qp_iterations: int = 6,
):
    """f64 general-path re-solver for ``ops.pallas_ik.fused_solve_refined``
    on the spatial family: the same problems through ``nls_solve`` with
    SO(3) actuator masks and the Mehrotra inner QP (the configuration that
    converges every spatial instance in f64,
    tests/test_pallas_ik.py::test_general_solver_spatial_chain_mpc).
    Signature matches refine_fn: (targets (K, 3) f64, x0 (K, n) f64) ->
    (K, n) f64."""
    import dataclasses

    from ..nonlinear import nls_solve
    from ..structs import BarrierStrategy

    chain = make_spatial_chain(n_active, link_length, dtype=jnp.float64)
    params = dataclasses.replace(
        default_ik_params(jnp.float64, max_iterations, qp_iterations),
        qp_barrier_strategy=BarrierStrategy.PREDICTOR_CORRECTOR,
    )

    def refine(targets, x0):
        def one(t, x):
            return nls_solve(
                make_spatial_ik_problem(chain, t), params, x,
                retraction=mod_pi_retraction,
            ).x

        return jax.vmap(one)(targets, x0)

    return refine
