"""Secondary on-chip measurements: the spatial fused IK family and the
large-N CG pose graph. Prints one JSON line each (chained-scan timing, same
methodology as bench.py)."""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import functools

import jax.numpy as jnp
import numpy as np


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def warm_tunnel(max_wait_s=900):
    """First device->host fetch behind a watchdog: a cold tunnel transfer
    can take minutes (CLAUDE.md, observed 276-471s). Running it once up
    front on a daemon thread with progress logs means every later fetch in
    the benches is warm, and a stuck tunnel is diagnosed instead of looking
    like a hang."""
    import threading

    out = {}

    def work():
        out["v"] = float(np.asarray(jnp.zeros(())))

    t = threading.Thread(target=work, daemon=True)
    t0 = time.time()
    t.start()
    while t.is_alive() and time.time() - t0 < max_wait_s:
        t.join(30)
        if t.is_alive():
            log(f"cold-tunnel warmup fetch pending ({time.time()-t0:.0f}s)...")
    if "v" not in out:
        log(f"WARNING: warmup fetch did not complete in {max_wait_s}s")
    else:
        log(f"tunnel warm ({time.time()-t0:.1f}s)")


def chained_time(solve, x0_like, K, repeats=3):
    """Chained-dependency timing (bench.py methodology)."""

    @functools.partial(jax.jit, static_argnames=("k",))
    def chained(x0, k):
        def body(x, _):
            return solve(x), None

        out, _ = jax.lax.scan(body, x0, None, length=k)
        return out

    np.asarray(chained(x0_like, 1))
    np.asarray(chained(x0_like, K))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(chained(x0_like, 1))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(chained(x0_like, K))
        tk = time.perf_counter() - t0
        times.append((tk - t1) / (K - 1))
    return float(np.median(times))


def spatial_bench(B=8192, n=3):
    from mini_opt_tpu.models.ik import make_spatial_chain
    from mini_opt_tpu.ops.pallas_ik import fused_spatial_ik_solve_batch

    chain = make_spatial_chain(n, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    th_true = np.stack(
        [rng.uniform(-1.2, 1.2, B)]
        + [rng.uniform(0.25, 2.6, B) for _ in range(n - 1)],
        1,
    )
    fkv = jax.vmap(lambda t: chain.update(t).translation)
    targets = np.asarray(fkv(jnp.asarray(th_true)))
    x0 = th_true + rng.uniform(-0.25, 0.25, (B, n))
    x0[:, 1:] = np.clip(x0[:, 1:], 0.05, np.pi - 0.05)
    t32 = jnp.asarray(targets, jnp.float32)

    def solve(x):
        # qp_iterations=2: the Mehrotra inner QP is converged at 2 iterations
        # on this family -- identical failure count to qp=6 over 3x8192
        # instances (35, the distribution's irreducible chaotic tail) at
        # 1.9x the throughput (measured).
        return fused_spatial_ik_solve_batch(
            t32, x, max_iterations=12, qp_iterations=2, ls_iterations=2
        )

    x32 = jnp.asarray(x0, jnp.float32)
    t0 = time.time()
    out = solve(x32)
    out.block_until_ready()
    log(f"spatial compile+run {time.time()-t0:.1f}s")
    per_batch = chained_time(solve, x32, K=129)
    # Parity on device.
    final = fkv(jnp.asarray(out, jnp.float64))
    err = jnp.max(jnp.abs(final - jnp.asarray(targets)), axis=1)
    parity = float(np.asarray(jnp.mean((err < 1e-3).astype(jnp.float32))))
    print(
        json.dumps(
            {
                "metric": "spatial_ik_solves_per_s_per_chip",
                "value": round(B / per_batch, 1),
                "unit": "solves/s",
                "batch": B,
                "n_joints": n,
                "parity": round(parity, 4),
            }
        ),
        flush=True,
    )


def auto_chain_bench(B=8192):
    """A chain family NO kernel was ever handwritten for (z-rot,
    y-rot-with-euler-offsets, prismatic-x, tilted flange), compiled to a
    fused whole-solver kernel straight from its ActuatorChain via
    scalar_chain_ik_builder + family_from_problem — measures whether the
    compiler's output runs at handwritten-kernel speed."""
    from mini_opt_tpu import family_from_problem
    from mini_opt_tpu.models.chains import ActuatorChain, ActuatorLink, Pose
    from mini_opt_tpu.models.ik import scalar_chain_fk, scalar_chain_ik_builder
    from mini_opt_tpu.ops.pallas_ik import fused_solve_batch
    from mini_opt_tpu.utils import so3

    qi = so3.quat_identity(jnp.float32)
    q_off = so3.so3_from_euler_angles_xyz(jnp.asarray([0.2, 0.3, 0.1], jnp.float32)).q
    q_tilt = so3.so3_from_euler_angles_xyz(jnp.asarray([0.0, 0.3, 0.0], jnp.float32)).q
    chain = ActuatorChain(links=(
        ActuatorLink.create(Pose(qi, jnp.zeros(3, jnp.float32)), (0, 0, 1, 0, 0, 0)),
        ActuatorLink.create(
            Pose(q_off, jnp.asarray([0.4, 0, 0], jnp.float32)), (0, 1, 0, 0, 0, 0)
        ),
        ActuatorLink.create(
            Pose(qi, jnp.asarray([0.3, 0, 0.1], jnp.float32)), (0, 0, 0, 1, 0, 0)
        ),
        ActuatorLink.create(
            Pose(q_tilt, jnp.asarray([0.4, 0, 0], jnp.float32)), (0, 0, 0, 0, 0, 0)
        ),
    ))
    rng = np.random.default_rng(0)
    x_true = np.column_stack(
        [rng.uniform(-0.6, 0.6, B), rng.uniform(0.15, 1.1, (B, 2))]
    ).astype(np.float32)
    fkv = jax.vmap(lambda x: jnp.stack(scalar_chain_fk(chain, x)[1]))
    targets = np.asarray(fkv(jnp.asarray(x_true)), np.float32)
    x0 = np.clip(
        x_true + rng.uniform(-0.1, 0.1, (B, 3)).astype(np.float32),
        [-10.0, 0.02, 0.02], [10.0, 3.1, 3.1],
    ).astype(np.float32)
    fam = family_from_problem(scalar_chain_ik_builder(chain, target_dim=3),
                              data_rows=3)
    t32 = jnp.asarray(targets)

    def solve(x):
        return fused_solve_batch(
            fam, t32, x, max_iterations=6, qp_iterations=2, ls_iterations=1,
            barrier="mpc",
        )

    x32 = jnp.asarray(x0)
    t0 = time.time()
    out = solve(x32)
    out.block_until_ready()
    log(f"auto_chain compile+run {time.time()-t0:.1f}s")
    per_batch = chained_time(solve, x32, K=129)
    err = jnp.max(jnp.abs(fkv(out) - t32), axis=1)
    parity = float(np.asarray(jnp.mean((err < 1e-3).astype(jnp.float32))))
    print(
        json.dumps(
            {
                "metric": "auto_compiled_chain_ik_solves_per_s_per_chip",
                "value": round(B / per_batch, 1),
                "unit": "solves/s",
                "batch": B,
                "n_joints": 3,
                "family": "z-rot / y-rot+euler-offset / prismatic-x",
                "parity": round(parity, 4),
            }
        ),
        flush=True,
    )


def pose_graph_bench(n_poses=1200):
    sys.path.insert(0, "/root/repo/tests")
    from test_pose_graph import _circle_graph

    from mini_opt_tpu.models.pose_graph import (
        default_pose_graph_params,
        solve_pose_graph_large,
    )

    from mini_opt_tpu.models.pose_graph import chordal_initialization

    gt, edges, meas, x0 = _circle_graph(n_poses, seed=1, noise=0.01, loop_every=10)
    w = jnp.ones((len(edges),), jnp.float32)
    meas32 = jnp.asarray(meas, jnp.float32)
    anchor = jnp.asarray(x0[0], jnp.float32)
    # Chordal pipeline (two linear solves + 3-GN polish): 1.5s on-chip vs
    # 11.8s for the plain 100-GN descent at cg=600, at slightly BETTER
    # quality (f 0.01907 vs 0.0191, drift 1.32 vs 1.65) -- ~19x fewer
    # Hessian-vector products.
    p = default_pose_graph_params(jnp.float32, max_iterations=3)

    @jax.jit
    def pipeline(x00):
        xc = chordal_initialization(
            n_poses, edges, meas32, w, anchor_pose=x00, cg_iterations=1200
        )
        return solve_pose_graph_large(
            n_poses, edges, meas32, w, xc, params=p, cg_iterations=300
        )

    t0 = time.time()
    res = pipeline(anchor)
    np.asarray(res.x)  # host readback closes the timing (CLAUDE.md quirk)
    compile_s = time.time() - t0
    t0 = time.time()
    res2 = pipeline(anchor + 1e-6)
    np.asarray(res2.x)
    warm_s = time.time() - t0
    xf = np.asarray(res.x).reshape(n_poses, 3)
    drift0 = float(np.abs(x0 - gt)[:, :2].max())
    driftf = float(np.abs(xf - gt)[:, :2].max())
    print(
        json.dumps(
            {
                "metric": "pose_graph_1200_solve_s_on_chip",
                "value": round(warm_s, 2),
                "unit": "s",
                "method": "chordal_init+3gn_polish",
                "compile_s": round(compile_s, 1),
                "f_final": round(float(res.errors.f), 4),
                "drift_before": round(drift0, 2),
                "drift_after": round(driftf, 3),
                "dtype": "float32",
            }
        ),
        flush=True,
    )

    # Spanning-chain tree preconditioner: same pipeline at the CG budgets the
    # f64 regression tests pinned as equivalent (chordal 1200 -> 200, polish
    # 300 -> 100; tests/test_tree_prec.py). Measures whether the factor's
    # sequential scan + log-depth substitutions beat the saved Hvp sweeps
    # on-chip.
    @jax.jit
    def pipeline_tree(x00):
        xc = chordal_initialization(
            n_poses, edges, meas32, w, anchor_pose=x00, cg_iterations=200,
            preconditioner="tree",
        )
        return solve_pose_graph_large(
            n_poses, edges, meas32, w, xc, params=p, cg_iterations=100,
            preconditioner="tree",
        )

    t0 = time.time()
    rt = pipeline_tree(anchor)
    np.asarray(rt.x)
    compile_t = time.time() - t0
    t0 = time.time()
    rt2 = pipeline_tree(anchor + 1e-6)
    np.asarray(rt2.x)
    warm_t = time.time() - t0
    xft = np.asarray(rt.x).reshape(n_poses, 3)
    print(
        json.dumps(
            {
                "metric": "pose_graph_1200_tree_prec_solve_s_on_chip",
                "value": round(warm_t, 2),
                "unit": "s",
                "method": "chordal(tree,cg=200)+3gn_polish(tree,cg=100)",
                "compile_s": round(compile_t, 1),
                "f_final": round(float(rt.errors.f), 4),
                "drift_after": round(float(np.abs(xft - gt)[:, :2].max()), 3),
                "vs_jacobi_budget_s": round(warm_s, 2),
                "dtype": "float32",
            }
        ),
        flush=True,
    )


def pose_graph_scale_bench(n_poses=10000):
    """Scale point: a 10k-pose SE(2) graph (30k variables, ~11k edges)
    solved matrix-free on one chip — ~80x beyond what the reference's dense
    (N, N) Hessian could represent (README.md:35-38 is dense-only; 30k^2
    doubles = 7.2 GB). Chordal init + GN polish, both under the
    spanning-chain tree preconditioner. Budgets pinned against an f64
    high-budget solve of the same graph (cg 3000/800, 6 GN): optimum
    f = 0.15001, drift 3.39 — the f32 budgets below reproduce both to 4
    digits (measured on CPU)."""
    sys.path.insert(0, "/root/repo/tests")
    from test_pose_graph import _circle_graph

    from mini_opt_tpu.models.pose_graph import (
        chordal_initialization,
        default_pose_graph_params,
        solve_pose_graph_large,
    )

    gt, edges, meas, x0 = _circle_graph(n_poses, seed=7, noise=0.01,
                                        loop_every=10)
    w = jnp.ones((len(edges),), jnp.float32)
    meas32 = jnp.asarray(meas, jnp.float32)
    anchor = jnp.asarray(x0[0], jnp.float32)
    p = default_pose_graph_params(jnp.float32, max_iterations=3)

    @jax.jit
    def pipeline(a0):
        xc = chordal_initialization(
            n_poses, edges, meas32, w, anchor_pose=a0, cg_iterations=1200,
            preconditioner="tree",
        )
        return solve_pose_graph_large(
            n_poses, edges, meas32, w, xc, params=p, cg_iterations=400,
            preconditioner="tree",
        )

    t0 = time.time()
    res = pipeline(anchor)
    np.asarray(res.x)
    compile_s = time.time() - t0
    t0 = time.time()
    res2 = pipeline(anchor + 1e-6)
    np.asarray(res2.x)
    warm_s = time.time() - t0
    xf = np.asarray(res.x).reshape(n_poses, 3)
    print(
        json.dumps(
            {
                "metric": f"pose_graph_{n_poses}_solve_s_on_chip",
                "value": round(warm_s, 2),
                "unit": "s",
                "method": "chordal(tree)+3gn_polish(tree), matrix-free",
                "compile_s": round(compile_s, 1),
                "n_poses": n_poses,
                "variables": 3 * n_poses,
                "edges": int(len(edges)),
                "f_final": round(float(res.errors.f), 4),
                "drift_before": round(float(np.abs(x0 - gt)[:, :2].max()), 2),
                "drift_after": round(float(np.abs(xf - gt)[:, :2].max()), 3),
                "dtype": "float32",
            }
        ),
        flush=True,
    )


def pose_graph3_bench(n_poses=400):
    """SE(3) family on-chip: 6-DoF helix graph, matrix-free, exact gauge."""
    sys.path.insert(0, "/root/repo/tests")
    from test_pose_graph3 import _helix_graph

    from mini_opt_tpu.models.pose_graph3 import (
        chordal_initialization3,
        default_pose_graph3_params,
        solve_pose_graph3_large,
    )

    gt, edges, meas, x0 = _helix_graph(n_poses, seed=4, noise=0.01, loop_every=10)
    w = jnp.ones((len(edges),), jnp.float32)
    meas32 = jnp.asarray(meas, jnp.float32)
    anchor = jnp.asarray(x0[0], jnp.float32)
    # Chordal pipeline (R^9 rotation relaxation + linear positions + 3-GN
    # polish): reaches the same optimum as the 13-GN descent at ~3.7x fewer
    # Hessian-vector products (see chordal_initialization3).
    p = default_pose_graph3_params(jnp.float32, max_iterations=3)

    @jax.jit
    def pipeline(a0):
        xc = chordal_initialization3(
            n_poses, edges, meas32, w, anchor_pose=a0, cg_iterations=300
        )
        return solve_pose_graph3_large(
            n_poses, edges, meas32, w, xc, params=p, cg_iterations=150,
            hard_anchor=True,
        )

    t0 = time.time()
    res = pipeline(anchor)
    np.asarray(res.x)  # host readback closes the timing (CLAUDE.md quirk)
    compile_s = time.time() - t0
    t0 = time.time()
    res2 = pipeline(anchor + 1e-6)
    np.asarray(res2.x)
    warm_s = time.time() - t0
    xf = np.asarray(res.x).reshape(n_poses, 6)
    drift0 = float(np.abs(x0 - gt)[:, :3].max())
    driftf = float(np.abs(xf - gt)[:, :3].max())
    print(
        json.dumps(
            {
                "metric": "pose_graph3_se3_400_solve_s_on_chip",
                "value": round(warm_s, 2),
                "unit": "s",
                "method": "chordal_init+3gn_polish",
                "compile_s": round(compile_s, 1),
                "f_final": round(float(res.errors.f), 4),
                "drift_before": round(drift0, 2),
                "drift_after": round(driftf, 3),
                "gauge_residual": float(np.abs(xf[0]).max()),
                "dtype": "float32",
            }
        ),
        flush=True,
    )

    # SE(3) tree-preconditioner variant (soft anchor: the tree factor wants
    # the gauge prior inside its block 0). Budgets from the f64 regression
    # gates (tests/test_tree_prec.py): chordal 300 -> 80, polish 150 -> 50.
    @jax.jit
    def pipeline_tree(a0):
        xc = chordal_initialization3(
            n_poses, edges, meas32, w, anchor_pose=a0, cg_iterations=80,
            preconditioner="tree",
        )
        return solve_pose_graph3_large(
            n_poses, edges, meas32, w, xc, params=p, cg_iterations=50,
            preconditioner="tree",
        )

    t0 = time.time()
    rt = pipeline_tree(anchor)
    np.asarray(rt.x)
    compile_t = time.time() - t0
    t0 = time.time()
    rt2 = pipeline_tree(anchor + 1e-6)
    np.asarray(rt2.x)
    warm_t = time.time() - t0
    xft = np.asarray(rt.x).reshape(n_poses, 6)
    print(
        json.dumps(
            {
                "metric": "pose_graph3_se3_400_tree_prec_solve_s_on_chip",
                "value": round(warm_t, 2),
                "unit": "s",
                "method": "chordal3(tree,cg=80)+3gn_polish(tree,cg=50)",
                "compile_s": round(compile_t, 1),
                "f_final": round(float(rt.errors.f), 4),
                "drift_after": round(float(np.abs(xft - gt)[:, :3].max()), 3),
                "vs_plain_budget_s": round(warm_s, 2),
                "dtype": "float32",
            }
        ),
        flush=True,
    )





def fused_pose_graph_bench(B=8192, n_poses=4):
    """The fused SE(2) pose-graph family on-chip: B complete n-pose
    loop-closure ring graphs per call through the BlockResidual-compiled
    kernel (round 3). Chained timing feeds each call's solution back as the
    next warm start (identical fixed-trip work; the data stays constant).
    n_poses scales the register count 3N and the unrolled LDLT O(N^3) --
    the crossover study vs the general path (ROADMAP round-4)."""
    from mini_opt_tpu import family_from_problem
    from mini_opt_tpu.models.pose_graph import scalar_pose_graph_builder
    from mini_opt_tpu.ops.pallas_ik import fused_solve_batch

    N = n_poses
    edges = tuple((i, (i + 1) % N) for i in range(N))
    turn = 2 * np.pi / N
    meas = np.tile([1.0, 0.0, turn], (N, 1))  # regular N-gon, unit sides
    th = np.arange(N) * turn
    # Pose i sits at the partial polygon sum with heading i*turn.
    pts = np.zeros((N, 2))
    for i in range(1, N):
        pts[i] = pts[i - 1] + [np.cos(th[i - 1]), np.sin(th[i - 1])]
    truth = np.column_stack([pts, np.where(th > np.pi, th - 2 * np.pi, th)])
    builder = scalar_pose_graph_builder(N, edges)
    fam = family_from_problem(builder, data_rows=3 * N)
    rng = np.random.default_rng(0)
    data = jnp.asarray(
        (meas.ravel() + rng.normal(0, 0.02, (B, 3 * N))).astype(np.float32)
    )
    x0 = jnp.asarray(
        (truth.ravel() + rng.normal(0, 0.15, (B, 3 * N))).astype(np.float32)
    )

    def solve(x):
        return fused_solve_batch(
            fam, data, x, max_iterations=6, qp_iterations=1, ls_iterations=2,
            barrier="mpc",
        )

    t0 = time.time()
    out = solve(x0)
    out.block_until_ready()
    log(f"fused_pose_graph compile+run {time.time()-t0:.1f}s")
    # K large enough that the chain dwarfs the +-10ms tunnel transfer noise
    # (a K=65 chain measured NEGATIVE time at this kernel's ~0.05 ms/batch;
    # see CLAUDE.md round-2 notes -- K scales inversely with per-batch time).
    per_batch = chained_time(solve, x0, K=2049)
    # Quality: terminal cost at the noise floor for (nearly) every lane.
    _, state = fused_solve_batch(
        fam, data, x0, max_iterations=6, qp_iterations=1, ls_iterations=2,
        barrier="mpc", return_state=True,
    )
    f_fin = np.asarray(state[:, 0])
    print(
        json.dumps(
            {
                "metric": "fused_pose_graph_solves_per_s_per_chip",
                "value": round(B / per_batch, 1),
                "unit": "graphs/s",
                "batch": B,
                "poses": N,
                "edges": len(edges),
                "per_batch_ms": round(per_batch * 1e3, 3),
                "cost_median": float(np.median(f_fin)),
                "cost_p99": float(np.quantile(f_fin, 0.99)),
                "converged_frac_1e2": float(np.mean(f_fin < 1e-2)),
                "dtype": "float32",
            }
        ),
        flush=True,
    )


def mpc_bench(
    B=256,
    n_steps_chain=17,
    horizon=20,
    dt=0.05,
    structured=False,
    iters=None,
    qp_iters=None,
    ls_iters=None,
    warm=None,  # (iters, qp_iters, ls_iters) lean budget for periods 1..n-1
):
    """MPC family on-chip: a fleet of B cart-pole plants under jitted
    receding-horizon control (solve -> apply u_0 -> step plant -> shift warm
    start, models/mpc.py). Each control period solves a dim-100 problem (20
    controls + 80 states, 80 dynamics-defect equality rows, 40 actuation
    bounds) at the fixed-trip serving budget. The rollout scan is inherently
    chained (each period consumes the previous period's plant state and warm
    start), so per-period time is the K-vs-1-step difference (bench.py
    methodology; block_until_ready is unreliable through the tunnel)."""
    import functools as _ft

    from mini_opt_tpu.models import mpc

    cp = mpc.CartPole()
    rng = np.random.default_rng(0)
    x_init = jnp.asarray(
        np.column_stack(
            [
                rng.uniform(-0.2, 0.2, B),
                rng.uniform(-0.2, 0.2, B),
                rng.uniform(-0.35, 0.35, B),
                rng.uniform(-0.2, 0.2, B),
            ]
        ),
        jnp.float32,
    )

    import dataclasses as _dc

    params = mpc.default_mpc_params(
        jnp.float32, early_exit=False, horizon=horizon if structured else None
    )
    if iters is not None:
        params = _dc.replace(params, max_iterations=iters)
    if qp_iters is not None:
        params = _dc.replace(params, max_qp_iterations=qp_iters)
    if ls_iters is not None:
        params = _dc.replace(params, max_line_search_iterations=ls_iters)
    warm_params = None
    if warm is not None:
        warm_params = _dc.replace(
            params,
            max_iterations=warm[0],
            max_qp_iterations=warm[1],
            max_line_search_iterations=warm[2],
        )

    @_ft.partial(jax.jit, static_argnames=("k",))
    def fleet(x0, k):
        return mpc.mpc_rollout_batch(
            cp, x0, k, horizon, dt, params=params, warm_params=warm_params
        )

    t0 = time.time()
    s1 = np.asarray(fleet(x_init, 1)[0])
    log(f"mpc fleet k=1 compile+run {time.time()-t0:.1f}s")
    t0 = time.time()
    sK = np.asarray(fleet(x_init, n_steps_chain)[0])
    log(f"mpc fleet k={n_steps_chain} compile+run {time.time()-t0:.1f}s")
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fleet(x_init, 1)[0])
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(fleet(x_init, n_steps_chain)[0])
        tk = time.perf_counter() - t0
        times.append((tk - t1) / (n_steps_chain - 1))
    per_period = float(np.median(times))

    # Control quality on a longer horizon: the whole fleet must stabilize.
    states, us, _, _ = fleet(x_init, 30)
    theta_final = np.abs(np.asarray(states)[:, -1, 2])
    stabilized = float(np.mean(theta_final < 0.05))
    print(
        json.dumps(
            {
                "metric": "mpc_control_solves_per_s_per_chip",
                "kkt_solver": params.kkt_solver,
                "budget": [
                    params.max_iterations,
                    params.max_qp_iterations,
                    params.max_line_search_iterations,
                ],
                "warm_budget": list(warm) if warm is not None else None,
                "value": round(B / per_period, 1),
                "unit": "solves/s",
                "fleet": B,
                "horizon": horizon,
                "problem_dim": mpc.mpc_dimension(horizon),
                "period_ms": round(per_period * 1e3, 3),
                "control_rate_hz_per_plant": round(1.0 / per_period, 1),
                "stabilized_frac": round(stabilized, 4),
                "u_max_violation": float(
                    max(0.0, np.abs(np.asarray(us)).max() - 10.0)
                ),
                "dtype": "float32",
            }
        ),
        flush=True,
    )


def mpc_fused_bench(
    B=1024,
    n_steps_chain=17,
    horizon=20,
    dt=0.05,
    budget=(2, 2, 1),
    cold_budget=(8, 3, 2),
):
    """The BLOCKED fused MPC tier on-chip (ops/pallas_mpc.py, VERDICT
    round-3 item 1): every control period solves the whole fleet's dim-100
    horizon problems with ONE Pallas kernel launch (stagewise RK4
    linearization + register-Riccati Mehrotra interior point + Armijo line
    search fused), vs the general path's hundreds of small XLA ops per
    period (mpc_bench / mpc_riccati rows). Same rollout methodology:
    K-vs-1-period chained difference, stabilization gate on a 30-period
    rollout."""
    import functools as _ft

    from mini_opt_tpu.models import mpc

    cp = mpc.CartPole()
    rng = np.random.default_rng(0)
    x_init = jnp.asarray(
        np.column_stack(
            [
                rng.uniform(-0.2, 0.2, B),
                rng.uniform(-0.2, 0.2, B),
                rng.uniform(-0.35, 0.35, B),
                rng.uniform(-0.2, 0.2, B),
            ]
        ),
        jnp.float32,
    )

    @_ft.partial(jax.jit, static_argnames=("k",))
    def fleet(x0, k):
        return mpc.fused_mpc_rollout_batch(
            cp, x0, k, horizon, dt, budget=budget, cold_budget=cold_budget
        )

    t0 = time.time()
    np.asarray(fleet(x_init, 1)[0])
    log(f"mpc_fused k=1 compile+run {time.time()-t0:.1f}s")
    t0 = time.time()
    np.asarray(fleet(x_init, n_steps_chain)[0])
    log(f"mpc_fused k={n_steps_chain} compile+run {time.time()-t0:.1f}s")
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fleet(x_init, 1)[0])
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(fleet(x_init, n_steps_chain)[0])
        tk = time.perf_counter() - t0
        times.append((tk - t1) / (n_steps_chain - 1))
    per_period = float(np.median(times))

    states, us, final_state = fleet(x_init, 30)
    theta_final = np.abs(np.asarray(states)[-1, :, 2])
    stabilized = float(np.mean(theta_final < 0.05))
    st = np.asarray(final_state)
    print(
        json.dumps(
            {
                "metric": "mpc_fused_control_solves_per_s_per_chip",
                "budget": list(budget),
                "cold_budget": list(cold_budget),
                "value": round(B / per_period, 1),
                "unit": "solves/s",
                "fleet": B,
                "horizon": horizon,
                "problem_dim": mpc.mpc_dimension(horizon),
                "period_ms": round(per_period * 1e3, 3),
                "control_rate_hz_per_plant": round(1.0 / per_period, 1),
                "stabilized_frac": round(stabilized, 4),
                "theta_final_max": float(theta_final.max()),
                "u_max_violation": float(
                    max(0.0, np.abs(np.asarray(us)).max() - 10.0)
                ),
                "eq_l1_max_last_period": float(st[:, 1].max()),
                "flags_nonzero": int((st[:, 2] != 0).sum()),
                "dtype": "float32",
            }
        ),
        flush=True,
    )


def mpc_servo_bench(
    # K=513: the fused servo period is ~0.1-0.5 ms/period at batch 1024, so
    # a K=17 chain (<10 ms) drowns in the +-10 ms tunnel transfer noise
    # (first run measured NEGATIVE time); the chain must total >= ~100 ms
    # (CLAUDE.md chained-timing rule: K scales inversely with per-step time).
    B=1024,
    n_steps_chain=513,
    horizon=20,
    dt=0.05,
    budget=(1, 1, 1),
    cold_budget=(8, 3, 2),
    gate_periods=30,
):
    """The fully-fused servo tier: the ENTIRE receding-horizon loop (solve +
    plant step + warm-start shift, K periods) in ONE kernel launch
    (ops/pallas_mpc.py::fused_mpc_servo_batch) -- no per-period launches, no
    per-period (B, 5T) pack/unpack. Timing = servo(K) vs servo(1) kernel
    difference; quality = the same 30-period stabilization gate as
    mpc_bench/mpc_fused."""
    from mini_opt_tpu.models import mpc
    from mini_opt_tpu.ops.pallas_mpc import (
        cartpole_mpc_family,
        fused_mpc_servo_batch,
        fused_mpc_solve_batch,
    )

    cp = mpc.CartPole()
    fam = cartpole_mpc_family(horizon, float(dt))
    rng = np.random.default_rng(0)
    x_init = jnp.asarray(
        np.column_stack(
            [
                rng.uniform(-0.2, 0.2, B),
                rng.uniform(-0.2, 0.2, B),
                rng.uniform(-0.35, 0.35, B),
                rng.uniform(-0.2, 0.2, B),
            ]
        ),
        jnp.float32,
    )

    @jax.jit
    def cold(x0):
        z0 = jax.vmap(lambda x: mpc.initial_guess(cp, x, horizon, dt))(x0)
        z = fused_mpc_solve_batch(
            fam, x0, z0, max_iterations=cold_budget[0],
            qp_iterations=cold_budget[1], ls_iterations=cold_budget[2],
        )
        u0 = z[:, 0]
        x1 = jax.vmap(lambda x, u: mpc.rk4_step(cp, x, u, dt))(x0, u0)
        z1 = jax.vmap(lambda zz: mpc.shift_warm_start(cp, zz, horizon, dt))(z)
        return x1, z1

    def servo(x, z, k):
        return fused_mpc_servo_batch(
            fam, x, z, k, max_iterations=budget[0], qp_iterations=budget[1],
            ls_iterations=budget[2],
        )

    t0 = time.time()
    x1, z1 = jax.block_until_ready(cold(x_init))
    log(f"servo cold solve compile+run {time.time()-t0:.1f}s")
    t0 = time.time()
    np.asarray(servo(x1, z1, 1)[0])
    log(f"servo k=1 compile+run {time.time()-t0:.1f}s")
    t0 = time.time()
    np.asarray(servo(x1, z1, n_steps_chain)[0])
    log(f"servo k={n_steps_chain} compile+run {time.time()-t0:.1f}s")
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(servo(x1, z1, 1)[0])
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(servo(x1, z1, n_steps_chain)[0])
        tk = time.perf_counter() - t0
        times.append((tk - t1) / (n_steps_chain - 1))
    per_period = float(np.median(times))

    xf, zf, stats = servo(x1, z1, gate_periods - 1)
    xf, stats = np.asarray(xf), np.asarray(stats)
    theta_final = np.abs(xf[:, 2])
    stabilized = float(np.mean(theta_final < 0.05))
    print(
        json.dumps(
            {
                "metric": "mpc_servo_control_solves_per_s_per_chip",
                "budget": list(budget),
                "cold_budget": list(cold_budget),
                "value": round(B / per_period, 1),
                "unit": "solves/s",
                "fleet": B,
                "horizon": horizon,
                "problem_dim": mpc.mpc_dimension(horizon),
                "period_ms": round(per_period * 1e3, 4),
                "control_rate_hz_per_plant": round(1.0 / per_period, 1),
                "gate_periods": gate_periods,
                "stabilized_frac": round(stabilized, 4),
                "theta_final_max": float(theta_final.max()),
                "u_max_violation": float(max(0.0, stats[:, 3].max() - 10.0)),
                "eq_l1_max_last_period": float(stats[:, 1].max()),
                "flags_nonzero": int((stats[:, 2] != 0).sum()),
                "dtype": "float32",
            }
        ),
        flush=True,
    )


def pose_ring_bench(B=8192, n_poses=16, iters=6, ls=2, general_B=1024):
    """The BLOCKED pose-ring kernel at N beyond the register class
    (ops/pallas_pose_ring.py: block-Thomas + border elimination, O(N) register
    stages vs the fused family's O((3N)^3) LDLT unroll). Measures the kernel
    AND the general path on the same instance distribution at the same
    budget/quality -- the VERDICT round-3 'fused pose graphs at N=16 beating
    the general path' gate."""
    from mini_opt_tpu.models.pose_graph import make_pose_graph_problem
    from mini_opt_tpu.nonlinear import NLSParams, nls_solve
    from mini_opt_tpu.ops.pallas_pose_ring import (
        pose_ring_family,
        pose_ring_solve_batch,
    )
    from mini_opt_tpu.structs import LineSearchStrategy

    n = n_poses
    fam = pose_ring_family(n)
    edges = tuple((i, (i + 1) % n) for i in range(n))
    turn = 2 * np.pi / n
    meas = np.tile([1.0, 0.0, turn], (n, 1))
    th = np.arange(n) * turn
    pts = np.zeros((n, 2))
    for i in range(1, n):
        pts[i] = pts[i - 1] + [np.cos(th[i - 1]), np.sin(th[i - 1])]
    truth = np.column_stack([pts, np.where(th > np.pi, th - 2 * np.pi, th)])
    rng = np.random.default_rng(0)
    data = jnp.asarray(
        (meas.ravel() + rng.normal(0, 0.02, (B, 3 * n))).astype(np.float32)
    )
    x0 = jnp.asarray(
        (truth.ravel() + rng.normal(0, 0.15, (B, 3 * n))).astype(np.float32)
    )

    def solve(x):
        return pose_ring_solve_batch(
            fam, data, x, max_iterations=iters, ls_iterations=ls
        )

    t0 = time.time()
    out = solve(x0)
    out.block_until_ready()
    log(f"pose_ring N={n} compile+run {time.time()-t0:.1f}s")
    per_batch = chained_time(solve, x0, K=513)
    _, state = pose_ring_solve_batch(
        fam, data, x0, max_iterations=iters, ls_iterations=ls, return_state=True
    )
    f_fin = np.asarray(state[:, 0])
    flags = np.asarray(state[:, 2])

    # General path, same distribution/budget, smaller batch (it is ~2-3
    # orders slower per instance; general_B keeps the run bounded).
    params = NLSParams(
        max_iterations=iters, max_qp_iterations=1,
        max_line_search_iterations=ls,
        line_search_strategy=LineSearchStrategy.ARMIJO_BACKTRACK,
        armijo_search_tau=0.5, record_history=False, early_exit=False,
    )

    def gen_solve(d_b, x_b):
        def one(d, x):
            prob = make_pose_graph_problem(
                n, edges, d.reshape(n, 3),
                jnp.ones((n,), jnp.float32), anchor_weight=100.0,
            )
            r = nls_solve(prob, params, x)
            return r.x, r.errors.f

        return jax.vmap(one)(d_b, x_b)

    dg, xg = data[:general_B], x0[:general_B]
    t0 = time.time()
    gen_jit = jax.jit(gen_solve)
    _, fg = jax.block_until_ready(gen_jit(dg, xg))
    log(f"general N={n} compile+run {time.time()-t0:.1f}s")
    per_batch_gen = chained_time(lambda x: gen_jit(dg, x)[0], xg, K=9)
    fg = np.asarray(fg)
    noise_gate = 2e-3 * n
    print(
        json.dumps(
            {
                "metric": "pose_ring_blocked_graphs_per_s_per_chip",
                "value": round(B / per_batch, 1),
                "unit": "graphs/s",
                "batch": B,
                "poses": n,
                "iters": [iters, ls],
                "per_batch_ms": round(per_batch * 1e3, 3),
                "cost_median": float(np.median(f_fin)),
                "cost_p99": float(np.quantile(f_fin, 0.99)),
                "converged_frac": float(np.mean(f_fin < noise_gate)),
                "flags_nonzero": int((flags != 0).sum()),
                "general_graphs_per_s": round(general_B / per_batch_gen, 1),
                "general_batch": general_B,
                "general_cost_median": float(np.median(fg)),
                "speedup_vs_general": round(
                    (B / per_batch) / (general_B / per_batch_gen), 1
                ),
                "dtype": "float32",
            }
        ),
        flush=True,
    )


def blocked_ik_bench(n=48, B=8192, iters=6, qp=2, ls=1, general_B=512):
    """The GENERIC blocked fused tier (ops/pallas_blocked.py) on a dim-49
    condensed system no kernel was ever handwritten for: a 48-joint planar
    chain, dispatched automatically by fused_solve_batch past
    REGISTER_KKT_MAX.  Measures the kernel AND the general path (nls_solve
    on make_ik_problem) on the same warm-start distribution at the same
    budget -- the round-4 VERDICT item-1 '>= 10x the general path at
    parity' gate."""
    import dataclasses

    from mini_opt_tpu.models.ik import (
        default_ik_params,
        make_ik_problem,
        make_planar_chain,
        mod_pi_retraction,
    )
    from mini_opt_tpu.nonlinear import nls_solve
    from mini_opt_tpu.ops.pallas_ik import fused_solve_batch, planar_family
    from mini_opt_tpu.structs import BarrierStrategy

    fam = planar_family(n, 0.4)
    rng = np.random.default_rng(0)
    # Warm-start serving distribution: a smooth reference arm pose per lane
    # plus a small perturbation; targets at the reference effector plus a
    # task-step offset (the receding-target serving pattern).
    th_ref = np.clip(
        rng.uniform(0.02, 0.10, (B, n)) + rng.normal(0, 0.01, (B, n)),
        0.01, np.pi - 0.01,
    )
    th_ref[:, 0] = rng.uniform(-0.3, 0.3, B)
    phi = np.cumsum(th_ref, axis=1)
    eff = np.stack([0.4 * np.cos(phi).sum(1), 0.4 * np.sin(phi).sum(1)], 1)
    tgt = eff + rng.uniform(-0.05, 0.05, (B, 2))
    data = jnp.asarray(tgt.astype(np.float32))
    x0 = jnp.asarray(th_ref.astype(np.float32))

    def solve(x):
        return fused_solve_batch(
            fam, data, x, max_iterations=iters, qp_iterations=qp,
            ls_iterations=ls,
        )

    t0 = time.time()
    out = jax.block_until_ready(solve(x0))
    log(f"blocked ik{n} compile+run {time.time()-t0:.1f}s")
    per_batch = chained_time(solve, x0, K=65)
    xk = np.asarray(out)
    phik = np.cumsum(xk, axis=1)
    effk = np.stack(
        [0.4 * np.cos(phik).sum(1), 0.4 * np.sin(phik).sum(1)], 1
    )
    err_k = np.abs(effk - tgt).max(1)

    params = dataclasses.replace(
        default_ik_params(jnp.float32, max_iterations=iters,
                          max_qp_iterations=qp),
        max_line_search_iterations=ls,
        termination_kkt_tolerance=1e-12,
        absolute_exit_tol=1e-30,
        relative_exit_tol=0.0,
        absolute_first_derivative_tol=0.0,
        early_exit=False,
        record_history=False,
        qp_barrier_strategy=BarrierStrategy.PREDICTOR_CORRECTOR,
    )
    chain = make_planar_chain(n, dtype=jnp.float32)

    def gen_solve(t_b, x_b):
        def one(t, x):
            problem = make_ik_problem(chain, t, with_joint_limits=True)
            return nls_solve(
                problem, params, x, retraction=mod_pi_retraction
            ).x

        return jax.vmap(one)(t_b, x_b)

    # The XLA-TPU compiler's memory_space_assignment pass is program/buffer
    # shape sensitive at this dim (CLAUDE.md: Check failed memory_space ==
    # existing_required_assignment; observed on the dim-48 general-path
    # program at batch 512) -- walk the batch down until a shape compiles.
    gen_row = {"general_crashed": True}
    for gb in (general_B, general_B // 2, general_B // 4, general_B // 8):
        if gb < 16:
            break
        try:
            dg, xg = data[:gb], x0[:gb]
            gen_jit = jax.jit(gen_solve)
            t0 = time.time()
            xgen = jax.block_until_ready(gen_jit(dg, xg))
            log(f"general ik{n} B={gb} compile+run {time.time()-t0:.1f}s")
            per_batch_gen = chained_time(lambda x: gen_jit(dg, x), xg, K=9)
            xg_np = np.asarray(xgen)
            phig = np.cumsum(xg_np, axis=1)
            effg = np.stack(
                [0.4 * np.cos(phig).sum(1), 0.4 * np.sin(phig).sum(1)], 1
            )
            err_g = np.abs(effg - tgt[:gb]).max(1)
            gen_row = {
                "general_solves_per_s": round(gb / per_batch_gen, 1),
                "general_batch": gb,
                "general_conv_1e3": float(np.mean(err_g < 1e-3)),
                "speedup_vs_general": round(
                    (B / per_batch) / (gb / per_batch_gen), 1
                ),
            }
            break
        except Exception as e:  # XlaRuntimeError from the remote compiler
            log(f"general ik{n} B={gb} failed to compile: {type(e).__name__}")
    print(
        json.dumps(
            {
                "metric": "blocked_ik48_solves_per_s_per_chip",
                "value": round(B / per_batch, 1),
                "unit": "solves/s",
                "batch": B,
                "joints": n,
                "iters": [iters, qp, ls],
                "per_batch_ms": round(per_batch * 1e3, 3),
                "conv_1e3": float(np.mean(err_k < 1e-3)),
                "err_p50": float(np.median(err_k)),
                **gen_row,
                "dtype": "float32",
            }
        ),
        flush=True,
    )


def blocked_pose16_bench(
    N=16, B=8192, iters=5, ls=2, general_B=512, closures=((4, 12),)
):
    """A NEVER-hand-fused dim-48 family through the generic blocked tier:
    16-pose SE(2) graphs with a chain + one OFF-ring closure (4, 12),
    compiled by family_from_problem (no handwritten kernel exists for this
    topology in the register or pose-ring tiers at this dim) and dispatched
    to ops/pallas_blocked.py.  General path on the same instances/budget.
    ``N``/``closures`` scale it: the round-5 sparsity-hinted assembly
    (FusedFamily.g_pattern) makes N = 40 (D = 120) traceable -- O(nnz)
    stacking statements instead of O(n^2)."""
    from mini_opt_tpu.models.pose_graph import (
        make_pose_graph_problem,
        scalar_pose_graph_builder,
    )
    from mini_opt_tpu.nonlinear import NLSParams, nls_solve
    from mini_opt_tpu.ops.fused_auto import family_from_problem
    from mini_opt_tpu.ops.pallas_ik import fused_solve_batch
    from mini_opt_tpu.structs import BarrierStrategy, LineSearchStrategy

    edges = tuple((t, t + 1) for t in range(N - 1)) + tuple(closures)
    E = len(edges)
    builder = scalar_pose_graph_builder(N, edges)
    fam = family_from_problem(builder, data_rows=3 * E)

    rng = np.random.default_rng(0)
    th_gt = np.cumsum(rng.uniform(-0.5, 0.5, (B, N)), axis=1)
    xy_gt = np.cumsum(
        np.stack([np.cos(th_gt), np.sin(th_gt)], -1) * 0.5, axis=1
    )
    poses = np.concatenate([xy_gt, th_gt[..., None]], -1)

    def edge_meas(pi, pj):
        c, s = np.cos(pi[..., 2]), np.sin(pi[..., 2])
        dx = pj[..., 0] - pi[..., 0]
        dy = pj[..., 1] - pi[..., 1]
        return np.stack(
            [c * dx + s * dy, -s * dx + c * dy, pj[..., 2] - pi[..., 2]], -1
        )

    meas = np.stack(
        [edge_meas(poses[:, i], poses[:, j]) for (i, j) in edges], 1
    )
    meas += rng.normal(scale=0.02, size=meas.shape)
    data = jnp.asarray(meas.reshape(B, 3 * E).astype(np.float32))
    x0n = poses + rng.normal(scale=0.08, size=poses.shape)
    x0n[:, 0] = 0.0
    x0 = jnp.asarray(x0n.reshape(B, 3 * N).astype(np.float32))

    def solve(x):
        return fused_solve_batch(
            fam, data, x, max_iterations=iters, qp_iterations=1,
            ls_iterations=ls,
        )

    t0 = time.time()
    jax.block_until_ready(solve(x0))
    log(f"blocked pose{N} compile+run {time.time()-t0:.1f}s")
    per_batch = chained_time(solve, x0, K=65)
    _, state = fused_solve_batch(
        fam, data, x0, max_iterations=iters, qp_iterations=1,
        ls_iterations=ls, return_state=True,
    )
    f_fin = np.asarray(state[:, 0])

    params = NLSParams(
        max_iterations=iters, max_qp_iterations=1,
        max_line_search_iterations=ls,
        line_search_strategy=LineSearchStrategy.ARMIJO_BACKTRACK,
        armijo_search_tau=0.5, record_history=False, early_exit=False,
        qp_barrier_strategy=BarrierStrategy.PREDICTOR_CORRECTOR,
    )

    def gen_solve(d_b, x_b):
        def one(d, x):
            r = nls_solve(builder(d), params, x)
            return r.x, r.errors.f

        return jax.vmap(one)(d_b, x_b)

    dg, xg = data[:general_B], x0[:general_B]
    gen_jit = jax.jit(gen_solve)
    t0 = time.time()
    _, fg = jax.block_until_ready(gen_jit(dg, xg))
    log(f"general pose{N} compile+run {time.time()-t0:.1f}s")
    per_batch_gen = chained_time(lambda x: gen_jit(dg, x)[0], xg, K=9)
    fg = np.asarray(fg)
    print(
        json.dumps(
            {
                "metric": f"blocked_pose{N}_chain_closure_graphs_per_s_per_chip",
                "value": round(B / per_batch, 1),
                "unit": "graphs/s",
                "batch": B,
                "poses": N,
                "closure": [list(c) for c in closures],
                "iters": [iters, 1, ls],
                "per_batch_ms": round(per_batch * 1e3, 3),
                "cost_median": float(np.median(f_fin)),
                "cost_p99": float(np.quantile(f_fin, 0.99)),
                "general_graphs_per_s": round(general_B / per_batch_gen, 1),
                "general_cost_median": float(np.median(fg)),
                "speedup_vs_general": round(
                    (B / per_batch) / (general_B / per_batch_gen), 1
                ),
                "dtype": "float32",
            }
        ),
        flush=True,
    )


def mpc_quadrotor_bench(B=1024, horizon=12, dt=0.05, periods=64,
                        budget=(2, 1, 1), cold=(8, 3, 2)):
    """The generalized blocked MPC kernel's SECOND plant on-chip: planar
    quadrotor (nx=6, nu=2) servo loop -- cold solve at a verification
    budget, then the whole receding-horizon loop in one fused launch
    (fused_mpc_servo_batch).  Stabilization gate: hover recovered."""
    from mini_opt_tpu.models import mpc as mpc_model
    from mini_opt_tpu.ops.pallas_mpc import (
        fused_mpc_servo_batch,
        fused_mpc_solve_batch,
        quadrotor_mpc_family,
    )

    fam = quadrotor_mpc_family(horizon, float(dt))
    rng = np.random.default_rng(0)
    x0 = np.zeros((B, 6), np.float32)
    x0[:, 0] = rng.uniform(-0.4, 0.4, B)
    x0[:, 1] = rng.uniform(-0.4, 0.4, B)
    x0[:, 2] = rng.uniform(-0.25, 0.25, B)
    x0j = jnp.asarray(x0)
    z0 = jax.vmap(lambda x: mpc_model.family_initial_guess(fam, x))(x0j)

    t0 = time.time()
    z1 = jax.block_until_ready(
        fused_mpc_solve_batch(
            fam, x0j, z0, max_iterations=cold[0], qp_iterations=cold[1],
            ls_iterations=cold[2],
        )
    )
    log(f"quadrotor cold solve compile+run {time.time()-t0:.1f}s")

    def servo(x, z):
        xf, zf, stats = fused_mpc_servo_batch(
            fam, x, z, periods, max_iterations=budget[0],
            qp_iterations=budget[1], ls_iterations=budget[2],
        )
        return xf, zf, stats

    t0 = time.time()
    xf, zf, stats = jax.block_until_ready(servo(x0j, z1))
    wall = time.time() - t0
    log(f"quadrotor servo compile+first-run {wall:.1f}s")
    # Chained timing over the servo launch (x feeds back).
    def chained(x, k):
        def body(carry, _):
            xc, zc = carry
            xn, zn, _ = servo(xc, zc)
            return (xn, zn), ()

        (xl, _), _ = jax.lax.scan(body, (x, z1), None, length=k)
        return xl

    cj = jax.jit(chained, static_argnames=("k",))
    for K in (1, 5):
        t0 = time.time()
        jax.block_until_ready(cj(x0j, K))
        if K == 1:
            t_one = time.time() - t0
        else:
            t_k = time.time() - t0
    per_launch = max(t_k - t_one, 1e-9) / 4
    xf = np.asarray(xf)
    stats = np.asarray(stats)
    hover = (
        (np.abs(xf[:, :2]) < 0.1).all(axis=1)
        & (np.abs(xf[:, 2]) < 0.05)
    )
    print(
        json.dumps(
            {
                "metric": "mpc_quadrotor_control_solves_per_s_per_chip",
                "value": round(B * periods / per_launch, 1),
                "unit": "control solves/s",
                "batch": B,
                "horizon": horizon,
                "nx": 6,
                "nu": 2,
                "periods": periods,
                "budget": list(budget),
                "per_period_us": round(per_launch / periods * 1e6, 2),
                "hover_frac": float(hover.mean()),
                "flags_nonzero": int((stats[:, 2] != 0).sum()),
                "dtype": "float32",
            }
        ),
        flush=True,
    )



def pose_ring_chain_closure_bench(N=16, B=8192, iters=5, ls=2,
                                  closure=(12, 4), closures=None,
                                  general_B=1024):
    """The GENERALIZED bordered block-Thomas kernel on a NON-ring topology
    (round-4 VERDICT item 3): odometry chain + off-ring closure, border =
    min(closure), two chain segments.  Same O(N) register stages as the
    canonical ring; general path on the same instances for the speedup."""
    from mini_opt_tpu.models.pose_graph import make_pose_graph_problem
    from mini_opt_tpu.nonlinear import NLSParams, nls_solve
    from mini_opt_tpu.ops.pallas_pose_ring import (
        pose_ring_family,
        pose_ring_solve_batch,
    )
    from mini_opt_tpu.structs import LineSearchStrategy

    if closures is not None:
        fam = pose_ring_family(N, closures=closures)
        edges = tuple((t, t + 1) for t in range(N - 1)) + tuple(closures)
    else:
        fam = pose_ring_family(N, closure=closure)
        edges = tuple((t, t + 1) for t in range(N - 1)) + (closure,)
    rng = np.random.default_rng(0)
    th_gt = np.cumsum(rng.uniform(-0.5, 0.5, (B, N)), axis=1)
    xy_gt = np.cumsum(
        np.stack([np.cos(th_gt), np.sin(th_gt)], -1) * 0.5, axis=1
    )
    poses = np.concatenate([xy_gt, th_gt[..., None]], -1)

    def edge_meas(pi, pj):
        c, s_ = np.cos(pi[..., 2]), np.sin(pi[..., 2])
        dx = pj[..., 0] - pi[..., 0]
        dy = pj[..., 1] - pi[..., 1]
        return np.stack(
            [c * dx + s_ * dy, -s_ * dx + c * dy, pj[..., 2] - pi[..., 2]], -1
        )

    meas = np.stack(
        [edge_meas(poses[:, i], poses[:, j]) for (i, j) in edges], 1
    )
    meas += rng.normal(scale=0.02, size=meas.shape)
    E = len(edges)
    data = jnp.asarray(meas.reshape(B, 3 * E).astype(np.float32))
    x0n = poses + rng.normal(scale=0.08, size=poses.shape)
    x0n[:, 0] = 0.0
    x0 = jnp.asarray(x0n.reshape(B, 3 * N).astype(np.float32))

    def solve(x):
        return pose_ring_solve_batch(
            fam, data, x, max_iterations=iters, ls_iterations=ls
        )

    t0 = time.time()
    jax.block_until_ready(solve(x0))
    log(f"pose_ring chain+closure N={N} compile+run {time.time()-t0:.1f}s")
    per_batch = chained_time(solve, x0, K=513)
    _, state = pose_ring_solve_batch(
        fam, data, x0, max_iterations=iters, ls_iterations=ls,
        return_state=True,
    )
    f_fin = np.asarray(state[:, 0])
    flags = np.asarray(state[:, 2])

    params = NLSParams(
        max_iterations=iters, max_qp_iterations=1,
        max_line_search_iterations=ls,
        line_search_strategy=LineSearchStrategy.ARMIJO_BACKTRACK,
        armijo_search_tau=0.5, record_history=False, early_exit=False,
    )

    def gen_solve(d_b, x_b):
        def one(d, x):
            prob = make_pose_graph_problem(
                N, edges, d.reshape(len(edges), 3),
                jnp.ones((len(edges),), jnp.float32), anchor_weight=100.0,
            )
            r = nls_solve(prob, params, x)
            return r.x, r.errors.f

        return jax.vmap(one)(d_b, x_b)

    dg, xg = data[:general_B], x0[:general_B]
    gen_jit = jax.jit(gen_solve)
    t0 = time.time()
    _, fg = jax.block_until_ready(gen_jit(dg, xg))
    log(f"general chain+closure N={N} compile+run {time.time()-t0:.1f}s")
    per_batch_gen = chained_time(lambda x: gen_jit(dg, x)[0], xg, K=9)
    fg = np.asarray(fg)
    print(
        json.dumps(
            {
                "metric": (
                    "pose_ring_multi_closure_graphs_per_s_per_chip"
                    if closures is not None
                    else "pose_ring_chain_closure_graphs_per_s_per_chip"
                ),
                "value": round(B / per_batch, 1),
                "unit": "graphs/s",
                "batch": B,
                "poses": N,
                "closure": (
                    [list(c) for c in closures]
                    if closures is not None
                    else list(closure)
                ),
                "iters": [iters, ls],
                "per_batch_ms": round(per_batch * 1e3, 3),
                "cost_median": float(np.median(f_fin)),
                "cost_p99": float(np.quantile(f_fin, 0.99)),
                "flags_nonzero": int((flags != 0).sum()),
                "general_graphs_per_s": round(general_B / per_batch_gen, 1),
                "general_cost_median": float(np.median(fg)),
                "speedup_vs_general": round(
                    (B / per_batch) / (general_B / per_batch_gen), 1
                ),
                "dtype": "float32",
            }
        ),
        flush=True,
    )


def long_chain_bench(L=512, B=1024):
    """Long-axis scaling (SURVEY.md §5): batched forward passes over an
    L-link chain, lax.scan (O(L) depth) vs lax.associative_scan (O(log L)
    depth), chained-scan timing on-chip."""
    from mini_opt_tpu.models.chains import Pose, compute_chain
    from mini_opt_tpu.utils import so3

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(0, 0.3, (B, L, 3)), jnp.float32)
    t = jnp.asarray(rng.normal(0, 1.0, (B, L, 3)), jnp.float32)
    quat = jax.vmap(jax.vmap(so3.quat_exp))(w)

    results = {}
    for label, assoc in (("scan", False), ("associative", True)):

        def fwd(wq, wt, _assoc=assoc):
            def one(q1, t1):
                buf = compute_chain(
                    Pose(rotation=q1, translation=t1),
                    use_associative_scan=_assoc,
                    unroll=False,
                )
                return buf.i_t_end[0]

            return jax.vmap(one)(wq, wt)

        # Chain on the translation input so iterations depend on each other.
        @functools.partial(jax.jit, static_argnames=("k",))
        def chained(wt, k, _fwd=fwd):
            def body(tt, _):
                out = _fwd(quat, tt)  # (B, 3)
                return tt + 1e-6 * out[:, None, :], None

            tt, _ = jax.lax.scan(body, wt, None, length=k)
            return tt

        np.asarray(chained(t, 1))
        K = 513  # large K: per-iteration cost is small vs per-call overhead
        np.asarray(chained(t, K))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(chained(t, 1))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(chained(t, K))
            tk = time.perf_counter() - t0
            ts.append((tk - t1) / (K - 1))
        results[label] = float(np.median(ts))

    print(
        json.dumps(
            {
                "metric": f"chain_L{L}_fwd_pass_ms",
                "scan_ms": round(results["scan"] * 1e3, 3),
                "associative_ms": round(results["associative"] * 1e3, 3),
                "speedup": round(results["scan"] / results["associative"], 2),
                "batch": B,
                "links": L,
                "unit": "ms/batch",
            }
        ),
        flush=True,
    )


def bundle_adjustment_bench(C=16, L=2048):
    """Matrix-free bundle adjustment on-chip: C cameras x L landmarks, every
    camera sees every landmark (C*L observations, 6C+3L variables); the dense
    Hessian would be (6C+3L)^2 ~ 39M entries -- never materialized."""
    import dataclasses

    from mini_opt_tpu.models.bundle_adjustment import (
        default_ba_params,
        make_ba_problem,
        make_ba_retraction,
        make_ba_schur_preconditioner,
        make_synthetic_scene,
    )
    from mini_opt_tpu.nonlinear import nls_solve

    obs, uv, x_true, scale_ref = make_synthetic_scene(C, L, pixel_noise=1e-3)
    rng = np.random.default_rng(1)
    x0 = np.asarray(x_true).copy()
    x0[6 : 6 * C] += rng.normal(0, 0.01, 6 * (C - 1))
    x0[6 * C :] += rng.normal(0, 0.03, len(x0) - 6 * C)
    uv32 = jnp.asarray(uv, jnp.float32)
    x032 = jnp.asarray(x0, jnp.float32)
    params = dataclasses.replace(
        default_ba_params(jnp.float32, max_iterations=20),
        absolute_exit_tol=1e-8,
        relative_exit_tol=1e-6,
    )

    # EXACT Schur-complement preconditioner (the textbook BA
    # factorization): landmark 3x3 blocks eliminate in closed form, the
    # dense 96x96 reduced camera system factors directly, CG converges in
    # ~1 iteration and GN in ~5 (vs 20 with block-Jacobi at cg=10 --
    # measured 1.13s -> 0.14s on-chip).
    params = dataclasses.replace(params, qp_solver="cg", cg_iterations=2)
    prob = make_ba_problem(
        C, L, obs, uv32, scale_ref=scale_ref, anchor_ref=x032[0:6]
    )
    prec_fn = make_ba_schur_preconditioner(C, L, obs, uv32)
    retr = make_ba_retraction(C)

    @jax.jit
    def run_jit(x00):
        return nls_solve(
            prob, params, x00, retraction=retr, cg_preconditioner=prec_fn
        )

    def run():
        return run_jit(x032)

    t0 = time.time()
    r = run()
    jax.block_until_ready(r.x)
    compile_s = time.time() - t0
    t0 = time.time()
    r = run()
    f_final = float(np.asarray(r.errors.f))  # readback closes the timing
    solve_s = time.time() - t0
    lm_err = float(
        np.max(np.abs(np.asarray(r.x[6 * C :]) - np.asarray(x_true[6 * C :])))
    )
    print(
        json.dumps(
            {
                "metric": "bundle_adjustment_matrix_free_solve_s_on_chip",
                "value": round(solve_s, 2),
                "unit": "s",
                "compile_s": round(compile_s, 1),
                "cameras": C,
                "landmarks": L,
                "observations": int(obs.shape[0]),
                "variables": 6 * C + 3 * L,
                "f_final": round(f_final, 5),
                "max_landmark_err": round(lm_err, 5),
                "dtype": "float32",
            }
        ),
        flush=True,
    )


def bundle_adjustment_sparse_bench(C=64, L=8192, k=4):
    """Sparse-visibility BA on-chip: each landmark seen by k of the C
    cameras (realistic large-scene visibility). The sparse exact-Schur
    preconditioner never materializes the (C, L, 6, 3) coupling W — the
    dense factory at this size would need ~75 GB for W's einsums."""
    import dataclasses

    from mini_opt_tpu.models.bundle_adjustment import (
        default_ba_params,
        make_ba_problem,
        make_ba_retraction,
        make_ba_schur_preconditioner_sparse,
        make_synthetic_scene,
    )
    from mini_opt_tpu.nonlinear import nls_solve

    obs, uv, x_true, scale_ref = make_synthetic_scene(
        C, L, pixel_noise=1e-3, cameras_per_landmark=k
    )
    rng = np.random.default_rng(2)
    x0 = np.asarray(x_true).copy()
    x0[6 : 6 * C] += rng.normal(0, 0.01, 6 * (C - 1))
    x0[6 * C :] += rng.normal(0, 0.03, len(x0) - 6 * C)
    uv32 = jnp.asarray(uv, jnp.float32)
    x032 = jnp.asarray(x0, jnp.float32)
    params = dataclasses.replace(
        default_ba_params(jnp.float32, max_iterations=20),
        absolute_exit_tol=1e-8,
        relative_exit_tol=1e-6,
        qp_solver="cg",
        cg_iterations=2,
    )
    prob = make_ba_problem(
        C, L, obs, uv32, scale_ref=scale_ref, anchor_ref=x032[0:6]
    )
    prec_fn = make_ba_schur_preconditioner_sparse(C, L, obs, uv32)
    retr = make_ba_retraction(C)

    @jax.jit
    def run_jit(x00):
        return nls_solve(
            prob, params, x00, retraction=retr, cg_preconditioner=prec_fn
        )

    t0 = time.time()
    r = run_jit(x032)
    jax.block_until_ready(r.x)
    compile_s = time.time() - t0
    t0 = time.time()
    r = run_jit(x032)
    f_final = float(np.asarray(r.errors.f))  # readback closes the timing
    solve_s = time.time() - t0
    lm_err = float(
        np.max(np.abs(np.asarray(r.x[6 * C :]) - np.asarray(x_true[6 * C :])))
    )
    print(
        json.dumps(
            {
                "metric": "bundle_adjustment_sparse_schur_solve_s_on_chip",
                "value": round(solve_s, 2),
                "unit": "s",
                "compile_s": round(compile_s, 1),
                "cameras": C,
                "landmarks": L,
                "cameras_per_landmark": k,
                "observations": int(obs.shape[0]),
                "variables": 6 * C + 3 * L,
                "f_final": round(f_final, 5),
                "max_landmark_err": round(lm_err, 5),
                "dtype": "float32",
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--only", nargs="*", default=None,
        help="subset of bench names (spatial, auto_chain, pose_graph, "
        "pose_graph_scale, pose_graph3, long_chain, ba, ba_sparse, mpc)",
    )
    a = ap.parse_args()
    benches = {
        "spatial": spatial_bench,
        "auto_chain": auto_chain_bench,
        "pose_graph_scale": pose_graph_scale_bench,
        "pose_graph": pose_graph_bench,
        "pose_graph3": pose_graph3_bench,
        "long_chain": lambda: long_chain_bench(L=512),
        "ba": bundle_adjustment_bench,
        "ba_sparse": bundle_adjustment_sparse_bench,
        "fused_pose_graph": fused_pose_graph_bench,
        "fused_pose_graph_6": lambda: fused_pose_graph_bench(n_poses=6),
        "fused_pose_graph_8": lambda: fused_pose_graph_bench(n_poses=8),
        # Blocked (block-Thomas) ring kernel beyond the register class.
        "pose_ring_16": pose_ring_bench,
        # Non-ring closure through the generalized bordered block-Thomas.
        "pose_ring_chain_closure": pose_ring_chain_closure_bench,
        "pose_ring_multi_closure": lambda: pose_ring_chain_closure_bench(
            closures=((15, 0), (4, 11))
        ),
        "pose_ring_32": lambda: pose_ring_bench(n_poses=32, general_B=512),
        "pose_ring_8": lambda: pose_ring_bench(n_poses=8),
        "mpc": mpc_bench,
        "mpc_riccati": lambda: mpc_bench(structured=True),
        # The blocked fused tier (ops/pallas_mpc.py): whole fleet per kernel
        # launch. Fleet sizes bracket the padding (1024 = one register tile).
        "mpc_fused": mpc_fused_bench,
        # Round-5: the GENERIC blocked tier (ops/pallas_blocked.py) and the
        # generalized MPC kernel's second plant.
        "blocked_ik48": blocked_ik_bench,
        "blocked_pose16": blocked_pose16_bench,
        # Round-5 second session: the sparsity-hinted assembly scale point
        # (n = 120, D = 120 -- 2.5x the dim-49 record; VMEM ~15 MB).
        "blocked_pose40": lambda: blocked_pose16_bench(
            N=40, closures=((5, 34), (12, 27)), general_B=256
        ),
        "blocked_pose36": lambda: blocked_pose16_bench(
            N=36, closures=((5, 30), (12, 24)), general_B=256
        ),
        "mpc_quadrotor": mpc_quadrotor_bench,
        "mpc_fused_8192": lambda: mpc_fused_bench(B=8192),
        "mpc_fused_111": lambda: mpc_fused_bench(budget=(1, 1, 1)),
        # Whole servo loop in one launch (solve+step+shift x K periods).
        "mpc_servo": mpc_servo_bench,
        # Tuned budgets (scripts/tune_budgets.py round-5 on-chip rows).
        "mpc_servo_110": lambda: mpc_servo_bench(budget=(1, 1, 0), n_steps_chain=4097),
        "pose_ring_16_tuned": lambda: pose_ring_bench(
            n_poses=16, iters=2, ls=0
        ),
        "mpc_servo_221": lambda: mpc_servo_bench(budget=(2, 2, 1)),
        "mpc_servo_8192": lambda: mpc_servo_bench(B=8192),
        # Budget study (VERDICT round-2 item 1b): warm-started receding
        # horizon needs far fewer fixed trips than the 8/8/6 default; the
        # stabilized_frac + u_max_violation fields gate each point.
        "mpc_riccati_553": lambda: mpc_bench(
            structured=True, iters=5, qp_iters=5, ls_iters=3
        ),
        "mpc_riccati_443": lambda: mpc_bench(
            structured=True, iters=4, qp_iters=4, ls_iters=3
        ),
        "mpc_riccati_342": lambda: mpc_bench(
            structured=True, iters=3, qp_iters=4, ls_iters=2
        ),
        # Warm-budget rollout: full 8/8/6 on the cold first period, lean
        # steady state (the chained-difference timing measures exactly the
        # steady-state period).
        "mpc_riccati_warm": lambda: mpc_bench(
            structured=True, warm=(3, 3, 2)
        ),
        "mpc_riccati_warm221": lambda: mpc_bench(
            structured=True, warm=(2, 2, 1)
        ),
    }
    log(f"backend={jax.default_backend()}")
    warm_tunnel()
    for name, fn in benches.items():
        if a.only is None or name in a.only:
            fn()
