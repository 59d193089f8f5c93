"""Generic lane-batched fused QP interior-point kernel.

The ``batched tiny linalg`` hard part of SURVEY.md section 7: thousands of
independent small dense QPs (N variables, K equality rows, M diagonal box
rows) solved per step. Composed from XLA ops (qp.py::qp_ip_solve under vmap),
each interior-point iteration costs ~10 kernel launches; for N <= ~8 that is
pure dispatch overhead. This kernel runs the ENTIRE fixed-trip interior-point
loop -- equality-constrained initial guess, condensed-KKT assembly, unrolled
LDL^T, fraction-to-boundary, complementarity or Mehrotra barrier schedule --
as straight-line code over sublane-packed (8, 128) register tiles, one
pallas_call for the whole solve.

Exposed through :func:`make_fused_qp_solver`, which returns a
``jax.custom_batching.custom_vmap`` function: called on ONE instance it runs
the reference-semantics ``qp_ip_solve``; under ``vmap`` it dispatches the
whole batch to this kernel. ``nls_solve(params.qp_solver="pallas_fused")``
uses it as the step-direction engine of the batched throughput path.

Semantics mirror qp.py::qp_ip_solve with ``early_exit=False`` and tiny
termination tolerance (runs all iterations -- the fixed-trip configuration
batched TPU execution wants anyway). Mathematical provenance: the condensed
system derivation of /root/reference/source/qp.cc:228-364 and the schedules
of qp.cc:140-201.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .pallas_ik import _interpret, _ldlt_apply, _ldlt_factor_unrolled


def _make_qp_kernel(N, K, ineq_var, iterations, sigma, barrier, has_eq_guess):
    """Build the kernel for static structure (N, K, static box-row variable
    indices) and static schedule config. Ref signature adapts to structure:
    (G, c, [A_eq, b_eq], [ia, ib], x_out, [y_out])."""
    M = len(ineq_var)
    D = N + K

    def kernel(*refs):
        it_refs = iter(refs)
        G_ref = next(it_refs)
        c_ref = next(it_refs)
        Aeq_ref = next(it_refs) if K > 0 else None
        beq_ref = next(it_refs) if K > 0 else None
        ia_ref = next(it_refs) if M > 0 else None
        ib_ref = next(it_refs) if M > 0 else None
        x_ref = next(it_refs)
        y_ref = next(it_refs) if K > 0 else None

        G = [[G_ref[i, j, 0] for j in range(N)] for i in range(N)]
        c = [c_ref[i, 0] for i in range(N)]
        A = [[Aeq_ref[k, j, 0] for j in range(N)] for k in range(K)]
        b = [beq_ref[k, 0] for k in range(K)]
        ia = [ia_ref[m, 0] for m in range(M)]
        ib = [ib_ref[m, 0] for m in range(M)]
        one = jnp.ones_like(c[0])
        zero = jnp.zeros_like(c[0])

        def assemble(sig):
            """Condensed (N+K)x(N+K) lower triangle; sig[m] = a_m^2 z/s."""
            H = [[zero] * D for _ in range(D)]
            for i in range(N):
                for j in range(i + 1):
                    H[i][j] = G[i][j] if i >= j else G[j][i]
            for m in range(M):
                v = ineq_var[m]
                H[v][v] = H[v][v] + sig[m]
            for k in range(K):
                for j in range(N):
                    H[N + k][j] = A[k][j]
            return H

        # --- initial guess (qp.cc:439-482) ------------------------------
        if has_eq_guess:
            H0 = assemble([zero] * M)
            rhs0 = [-c[i] for i in range(N)] + [-b[k] for k in range(K)]
            sol = _ldlt_apply(*_ldlt_factor_unrolled(H0), rhs0)
            x = sol[:N]
            y = [-sol[N + k] for k in range(K)]
        else:
            x = [zero] * N
            y = [zero] * K
        # Clamp into the feasible half-lines, then s = max(1e-9, ax+b), z=1/s.
        for m in range(M):
            v = ineq_var[m]
            t = ia[m] * x[v] + ib[m]
            x[v] = x[v] + jnp.where(t < 0.0, -t / ia[m], zero)
        s = [jnp.maximum(1e-9, ia[m] * x[ineq_var[m]] + ib[m]) for m in range(M)]
        z = [1.0 / v for v in s]

        mu = one
        tau = 0.995
        for _ in range(iterations):
            # KKT residuals (qp.cc:391-420).
            r_d = []
            for i in range(N):
                acc = c[i]
                for j in range(N):
                    acc = acc + (G[i][j] if i >= j else G[j][i]) * x[j]
                for k in range(K):
                    acc = acc - A[k][i] * y[k]
                r_d.append(acc)
            for m in range(M):
                r_d[ineq_var[m]] = r_d[ineq_var[m]] - ia[m] * z[m]
            r_pe = []
            for k in range(K):
                acc = b[k]
                for j in range(N):
                    acc = acc + A[k][j] * x[j]
                r_pe.append(acc)
            r_pi = [ia[m] * x[ineq_var[m]] + ib[m] - s[m] for m in range(M)]
            r_c = [s[m] * z[m] for m in range(M)]
            zs = [z[m] / s[m] for m in range(M)]

            H = assemble([ia[m] * ia[m] * zs[m] for m in range(M)])
            Lf, df = _ldlt_factor_unrolled(H)

            def solve_step(mu_v, corr):
                """Elimination + condensed solve + back-substitution
                (qp.cc:318-364)."""
                r_aug = list(r_d)
                for m in range(M):
                    v = ineq_var[m]
                    r_aug[v] = r_aug[v] + ia[m] * (
                        zs[m] * r_pi[m] + (r_c[m] + corr[m] - mu_v) / s[m]
                    )
                rhs = [-v_ for v_ in r_aug] + [-r for r in r_pe]
                sol = _ldlt_apply(Lf, df, rhs)
                dx_v = sol[:N]
                dy_v = [-sol[N + k] for k in range(K)]
                ds_v = [ia[m] * dx_v[ineq_var[m]] + r_pi[m] for m in range(M)]
                dz_v = [
                    -zs[m] * ds_v[m] - (r_c[m] + corr[m] - mu_v) / s[m]
                    for m in range(M)
                ]
                return dx_v, dy_v, ds_v, dz_v

            def ftb(vs, dvs, tau_v):
                alpha = one
                for v_, dv in zip(vs, dvs):
                    blocking = (v_ + dv <= 0.0) & (jnp.abs(dv) > 0.0)
                    cand = -tau_v * v_ / jnp.where(blocking, dv, one)
                    alpha = jnp.minimum(alpha, jnp.where(blocking, cand, one))
                return alpha

            zeros_c = [zero] * M
            if M == 0:
                dx, dy, ds, dz = solve_step(zero, zeros_c)
            elif barrier == "mpc":
                dxa, dya, dsa, dza = solve_step(zero, zeros_c)
                ap_a = ftb(s, dsa, 1.0)
                ad_a = ftb(z, dza, 1.0)
                mu_aff = zero
                for m in range(M):
                    mu_aff = mu_aff + (s[m] + ap_a * dsa[m]) * (
                        z[m] + ad_a * dza[m]
                    )
                mu_aff = jnp.maximum(mu_aff / M, 0.0)
                mu_used = (mu_aff / mu) ** 3 * mu
                corr = [dsa[m] * dza[m] for m in range(M)]
                dx, dy, ds, dz = solve_step(mu_used, corr)
            else:
                dx, dy, ds, dz = solve_step(mu, zeros_c)

            if M > 0:
                ap = ftb(s, ds, tau)
                ad = ftb(z, dz, tau)
            else:
                ap = ad = one
            x = [x[i] + ap * dx[i] for i in range(N)]
            s = [s[m] + ap * ds[m] for m in range(M)]
            y = [y[k] + ad * dy[k] for k in range(K)]
            z = [z[m] + ad * dz[m] for m in range(M)]
            if M > 0:
                comp = sum(s[m] * z[m] for m in range(M)) / M
                mu = sigma * comp

        for i in range(N):
            x_ref[i, 0] = x[i]
        for k in range(K):
            y_ref[k, 0] = y[k]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("ineq_var", "iterations", "sigma", "barrier", "has_eq_guess"),
)
def _fused_qp_batch(
    G, c, A_eq, b_eq, ia, ib, *, ineq_var, iterations, sigma, barrier,
    has_eq_guess,
):
    """Batched implementation: G (B,N,N), c (B,N), A_eq (B,K,N), b_eq (B,K),
    ia/ib (B,M). Returns x (B,N), y (B,K)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N = c.shape
    K = b_eq.shape[1]
    M = len(ineq_var)
    tile = 8 * 128
    b_pad = -(-B // tile) * tile
    grid = b_pad // tile

    def pack(arr, pad_value):
        """(B, d0[, d1]) -> (d0[, d1], grid, 8, 128)."""
        pad = [(0, b_pad - B)] + [(0, 0)] * (arr.ndim - 1)
        p = jnp.pad(arr, pad, constant_values=pad_value)
        p = jnp.moveaxis(p, 0, -1)
        return p.reshape(p.shape[:-1] + (grid, 8, 128))

    # Pad lanes with benign identity problems so padded lanes stay finite.
    eyeG = jnp.eye(N, dtype=G.dtype)
    padmask = (jnp.arange(b_pad) < B)[:, None, None]
    G_p = jnp.where(padmask, jnp.pad(G, [(0, b_pad - B), (0, 0), (0, 0)]), eyeG[None])
    G_p = jnp.moveaxis(G_p, 0, -1).reshape(N, N, grid, 8, 128)

    inputs = [G_p, pack(c, 0.0)]
    in_specs = [
        pl.BlockSpec((N, N, 1, 8, 128), lambda i: (0, 0, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((N, 1, 8, 128), lambda i: (0, i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if K > 0:
        inputs += [pack(A_eq, 0.0), pack(b_eq, 0.0)]
        in_specs += [
            pl.BlockSpec((K, N, 1, 8, 128), lambda i: (0, 0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 1, 8, 128), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    if M > 0:
        inputs += [pack(ia, 1.0), pack(ib, 1.0)]
        in_specs += [
            pl.BlockSpec((M, 1, 8, 128), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, 1, 8, 128), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]

    out_specs = [
        pl.BlockSpec((N, 1, 8, 128), lambda i: (0, i, 0, 0),
                     memory_space=pltpu.VMEM)
    ]
    out_shapes = [jax.ShapeDtypeStruct((N, grid, 8, 128), G.dtype)]
    if K > 0:
        out_specs.append(
            pl.BlockSpec((K, 1, 8, 128), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shapes.append(jax.ShapeDtypeStruct((K, grid, 8, 128), G.dtype))

    kernel = _make_qp_kernel(
        N, K, ineq_var, iterations, sigma, barrier, has_eq_guess
    )
    res = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs if K > 0 else out_specs[0],
        out_shape=out_shapes if K > 0 else out_shapes[0],
        interpret=_interpret(),
    )(*inputs)

    if K > 0:
        x_p, y_p = res
        y = jnp.moveaxis(y_p.reshape(K, b_pad), -1, 0)[:B]
    else:
        x_p = res
        y = jnp.zeros((B, 0), G.dtype)
    x = jnp.moveaxis(x_p.reshape(N, b_pad), -1, 0)[:B]
    return x, y


@functools.lru_cache(maxsize=64)
def make_fused_qp_solver(
    ineq_var: tuple,
    iterations: int,
    sigma: float = 0.1,
    barrier: str = "complementarity",
    has_eq_guess: bool = True,
):
    """Build ``solve(G, c, A_eq, b_eq, ia, ib) -> (x, y)`` with static box-row
    variable indices. Unbatched calls run the reference-semantics
    ``qp_ip_solve``; under ``vmap`` the whole batch goes to the fused Pallas
    kernel (one launch for the entire inner loop)."""
    from jax import custom_batching

    from ..qp import QP, QPInteriorPointParams, qp_ip_solve
    from ..structs import BarrierStrategy, InitialGuessMethod

    @custom_batching.custom_vmap
    def solve(G, c, A_eq, b_eq, ia, ib):
        qp = QP(
            G=G,
            c=c,
            A_eq=A_eq,
            b_eq=b_eq,
            ineq_var=jnp.asarray(ineq_var, jnp.int32),
            ineq_a=ia,
            ineq_b=ib,
        )
        params = QPInteriorPointParams(
            max_iterations=iterations,
            sigma=sigma,
            termination_kkt_tol=1e-300,
            termination_complementarity_tol=1e-300,
            barrier_strategy=(
                BarrierStrategy.PREDICTOR_CORRECTOR
                if barrier == "mpc"
                else BarrierStrategy.COMPLEMENTARITY
            ),
            initial_guess_method=(
                InitialGuessMethod.SOLVE_EQUALITY_CONSTRAINED
                if has_eq_guess
                else InitialGuessMethod.NAIVE
            ),
            kkt_solver="ldlt",
            record_history=False,
            early_exit=False,
        )
        res = qp_ip_solve(qp, params)
        return res.x, res.y

    @solve.def_vmap
    def _solve_vmap(axis_size, in_batched, G, c, A_eq, b_eq, ia, ib):
        def bcast(v, batched):
            return v if batched else jnp.broadcast_to(v, (axis_size,) + v.shape)

        G, c, A_eq, b_eq, ia, ib = (
            bcast(v, bb)
            for v, bb in zip((G, c, A_eq, b_eq, ia, ib), in_batched)
        )
        x, y = _fused_qp_batch(
            G, c, A_eq, b_eq, ia, ib,
            ineq_var=ineq_var, iterations=iterations, sigma=sigma,
            barrier=barrier, has_eq_guess=has_eq_guess,
        )
        return (x, y), (True, True)

    return solve
