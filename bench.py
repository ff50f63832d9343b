"""Benchmark: batched warm-started Scotty-MPC resolves (solves/s/chip).

The BASELINE.json north-star workload: a fleet of receding-horizon
bicycle MPC controllers tracking the Scotty path (horizon N=30,
steering-angle bounds, warm-started resolves with sliding references) —
the exact loop of the reference's TrackingMPC test
(/root/reference/test/bicycle_test.cpp:266-360), but with B scenario
lanes vmapped per chip and the whole closed-loop simulation fused into a
single jitted lax.scan over ticks.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": "solves/s", "vs_baseline": ...}

vs_baseline is against the single-threaded C++ reference estimate in
BASELINE.md (1000 warm-started resolves/s; the reference cannot be built
in this zero-egress image — see BASELINE.md for the derivation).

Hardening (round 2): the remote-TPU ("axon") tunnel can fail with
transient FAILED_PRECONDITION backend errors mid-run, which killed the
round-1 driver capture. The bench is now a two-process harness:

  parent  — no jax import; probes the backend, then walks an attempt
            ladder of child subprocesses: full TPU config -> TPU retry
            -> TPU without the Pallas backward -> TPU at B=1024 -> CPU
            (honestly labeled). A dead/hung child never takes the
            harness down; the final JSON always prints, carrying an
            "error" field if every rung failed.
  child   — the actual measurement (``--child``). Uses a persistent XLA
            compile cache so re-runs skip the 8-600 s cold compile,
            retries once in-process on jax.errors.JaxRuntimeError, runs
            a live-device Pallas-vs-scan kernel parity preflight, and
            enforces hard accuracy gates (tracking error, success rate,
            mean iterations, kernel residual) so a fast-but-wrong config
            exits non-zero instead of printing a happy number.
"""

import dataclasses
import json
import os
import subprocess
import sys
import time

BASELINE_SOLVES_PER_S = 1000.0  # single-threaded C++ reference estimate (BASELINE.md)
# Default the persistent compile cache to a home-dir path: /tmp is wiped
# between sessions, which cost two rounds their pre-seeded caches.
COMPILE_CACHE_DIR = os.environ.get(
    "ALTRO_BENCH_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "jax_cache_altro_bench"),
)

# Hard accuracy gates: the bench FAILS (exit code 3) when the measured
# run violates these, so a fast-but-wrong config cannot produce a green
# JSON. Values chosen against the known-good flagship run (closed-loop
# error 0.4855, success 98.78%, mean iterations 1.44) and the reference
# artifact (/root/reference/test/scotty_mpc.json: error 0.485).
GATE_MAX_TRACKING_ERR = 0.5
# Raised round 5 (0.985 -> 0.995, VERDICT r4 item 1) for the default
# two-tier-rescue headline, measured 99.62% @ 3.03M (R=10, with the
# batched rollout kernel). With the rescue disabled
# (ALTRO_BENCH_RESCUE=0, the fast operating point: 98.55% @ 4.30M) the
# round-4 gate applies. Full Pareto in docs/PERF.md.
GATE_MIN_SUCCESS = 0.995  # full-solver mode with the default lane rescue
GATE_MIN_SUCCESS_NO_RESCUE = 0.985
GATE_MAX_MEAN_ITERS = 2.0
GATE_MAX_KERNEL_DK = 1e-3  # max |K_pallas - K_scan| on the live-device probe

EXIT_GATE_FAILURE = 3  # accuracy gates failed — NOT an infra error; do not retry


def pick_platform() -> str:
    """Probe the TPU backend in a subprocess (its init can hang if the
    tunnel is down); fall back to CPU."""
    forced = os.environ.get("ALTRO_BENCH_PLATFORM")
    if forced:
        return forced
    try:
        probe = subprocess.run(
            [sys.executable, "-c", "import jax; assert jax.devices()[0].platform != 'cpu'"],
            timeout=150,
            capture_output=True,
        )
        if probe.returncode == 0:
            return "tpu"
    except subprocess.TimeoutExpired:
        pass
    return "cpu"


def _kernel_parity_preflight(jax, jnp, N, n, m, dtype):
    """Run the fused Pallas backward against the vmapped scan on the live
    device and return the max gain residuals (VERDICT r1 item 3: the f64
    test suite exercises the kernel only in interpret mode on CPU; this
    is the on-hardware check, recorded in the bench JSON)."""
    import numpy as np

    from altro_tpu.ops.pallas_riccati import BATCH_TILE, riccati_backward_pallas
    from altro_tpu.tvlqr import tvlqr_backward

    Bp = BATCH_TILE
    rng = np.random.default_rng(1)
    A = jnp.asarray(
        np.tile(np.eye(n), (Bp, N, 1, 1)) + 0.05 * rng.standard_normal((Bp, N, n, n)),
        dtype,
    )
    Bm = jnp.asarray(0.3 * rng.standard_normal((Bp, N, n, m)), dtype)
    f = jnp.asarray(0.01 * rng.standard_normal((Bp, N, n)), dtype)
    lxx = jnp.asarray(np.tile(np.eye(n), (Bp, N + 1, 1, 1)), dtype)
    luu = jnp.asarray(np.tile(np.eye(m), (Bp, N, 1, 1)), dtype)
    lux = jnp.zeros((Bp, N, m, n), dtype)
    lx = jnp.asarray(rng.standard_normal((Bp, N + 1, n)), dtype)
    lu = jnp.asarray(rng.standard_normal((Bp, N, m)), dtype)
    reg = jnp.zeros((Bp,), dtype)

    out = jax.jit(lambda *a: riccati_backward_pallas(*a[:8], reg=a[8]))(
        A, Bm, f, lxx, luu, lux, lx, lu, reg
    )
    ref = jax.jit(jax.vmap(lambda *a: tvlqr_backward(*a)))(
        A, Bm, f, lxx, luu, lux, lx, lu
    )
    jax.block_until_ready((out, ref))
    return {
        "kernel_parity_max_dK": float(jnp.max(jnp.abs(out.K - ref.K))),
        "kernel_parity_max_dd": float(jnp.max(jnp.abs(out.d - ref.d))),
        "kernel_parity_ok": bool(jnp.all(out.ok) & jnp.all(ref.ok)),
    }


def child_main():
    platform = os.environ.get("ALTRO_BENCH_PLATFORM") or pick_platform()
    if platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    # Persistent compile cache: the flagship 200-tick program cold-compiles
    # in 8-600 s; pre-seeded cache turns that into seconds on re-runs.
    jax.config.update("jax_compilation_cache_dir", COMPILE_CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from altro_tpu.cones import Cone
    from altro_tpu.io.scotty import load_scotty, synthetic_scotty
    from altro_tpu.models.bicycle import bicycle_continuous
    from altro_tpu.models.integrators import midpoint
    from altro_tpu.options import SolverOptions
    from altro_tpu.parallel.batch import batch_init_state
    from altro_tpu.problem import ConstraintSpec, Problem, lqr_cost_from_reference
    from altro_tpu.solver import solve

    dtype = jnp.float32
    N, n, m = 30, 4, 2
    # B=2048 is the measured throughput sweet spot with the fused Pallas
    # backward (which scales sublinearly in batch): 1.051M solves/s vs
    # 989k at B=1024 and 993k at B=4096, identical accuracy (docs/PERF.md).
    B = int(os.environ.get("ALTRO_BENCH_BATCH", "2048"))
    NSIM = int(os.environ.get("ALTRO_BENCH_TICKS", "200"))

    try:
        ref = load_scotty()
    except FileNotFoundError:
        ref = synthetic_scotty(N=500)
    h = float(np.float32(ref.tf / ref.N))

    Qd = np.full(n, 1e-2)
    Rd = np.full(m, 1e-3)
    cost0 = lqr_cost_from_reference(
        jnp.asarray(np.tile(Qd, (N + 1, 1)), dtype),
        jnp.asarray(np.tile(Rd, (N + 1, 1)), dtype),
        jnp.asarray(ref.x[: N + 1], dtype),
        jnp.asarray(ref.u[: N + 1], dtype),
    )
    delta_max = 60 * np.pi / 180.0
    steering = ConstraintSpec(
        fn=lambda x, u, k: jnp.stack([x[3] - delta_max, -delta_max - x[3]]),
        cone=Cone.NEGATIVE_ORTHANT, dim=2, active=jnp.ones(N + 1, bool),
        label="steering bound", diag_hessian=True,  # rows are +-e3
        affine=True,
    )
    dyn = midpoint(bicycle_continuous())
    from altro_tpu.models.tile_steps import bicycle_cols, midpoint_cols

    problem = Problem(
        N=N, n=n, m=m, dynamics=dyn, dynamics_jac=None, constraints=(steering,),
        cost=cost0, h=jnp.full(N, h, dtype), x0=jnp.asarray(ref.x[0], dtype),
        # column-form tile step: lets solve_tiled run the line-search
        # trial grid as one Pallas program (ops/pallas_rollout_tiled.py)
        dynamics_cols=midpoint_cols(bicycle_cols()),
    )
    rti = os.environ.get("ALTRO_BENCH_RTI") == "1"
    warm_rho = os.environ.get("ALTRO_BENCH_WARM_RHO", "1") == "1"
    par_ls = os.environ.get("ALTRO_BENCH_PAR_LS", "1") == "1"
    use_pallas = (
        platform == "tpu" and os.environ.get("ALTRO_BENCH_PALLAS_BWD", "1") == "1"
    )
    opts = SolverOptions(
        iterations_max=1 if rti else int(os.environ.get("ALTRO_BENCH_ITERS", "10")),
        use_backtracking_linesearch=True,
        tol_stationarity=1e-3,
        tol_primal_feasibility=1e-3,
        throw_errors=False,
        rti_mode=rti,
        penalty_warm_start=warm_rho,
        penalty_warm_start_decay=float(os.environ.get("ALTRO_BENCH_WARM_RHO_DECAY", "1.0")),
        parallel_linesearch=par_ls,
        ls_phase_split=par_ls
        and os.environ.get("ALTRO_BENCH_PHASE_SPLIT", "1") == "1",
        ls_try_cubic_first=not par_ls,
        ls_parallel_width=int(os.environ.get("ALTRO_BENCH_PAR_LS_WIDTH", "8")),
        # One grid block only: deeper backtracks (beta^8..beta^24, the
        # robust library default) would make EVERY tick pay extra
        # sequential merit evaluations whenever any of the B lanes
        # exhausts block 0 — and the ~1% of lane-ticks that do exhaust
        # it are better served here by failing fast (per-lane isolation;
        # closed-loop error is unchanged, see docs/PERF.md).
        ls_max_iters=int(os.environ.get("ALTRO_BENCH_LS_ITERS", "8" if par_ls else "25")),
        # Armijo slack knob (SolverOptions.ls_armijo_slack). Measured on
        # this workload: 1e-6 moves success only 98.55% -> 98.58%
        # (no-rescue) / 99.62% -> 99.65% @ 2.91M (rescue R=10, kernel
        # era) — the residual failures are genuine non-descent at stiff
        # conic knots (benign RTI-like fallbacks), not roundoff — so
        # exact Armijo stays the default here. (Contrast: on the rocket
        # SOC and quadrotor rows the same knob removed a 24-30%
        # rounding-tie failure tail — docs/PERF.md round 5 cont.)
        ls_armijo_slack=float(os.environ.get("ALTRO_BENCH_ARMIJO_SLACK", "0.0")),
        # Line-search failure recovery (SolverOptions.ls_failure_recovery):
        # failed lanes escalate reg and keep iterating instead of
        # aborting. Default OFF for the headline: the measured frontier
        # (docs/PERF.md round 4) is 98.54% @ 2.98M (off), 98.68% @ 2.75M
        # (cap=1), 98.93% @ 2.28M (unlimited) — the residual tail is
        # proven f32 non-descent (no merit-decreasing trial exists), so
        # buying 0.1-0.4% success with 8-23% throughput is a deployment
        # choice, not a default.
        ls_failure_recovery=os.environ.get("ALTRO_BENCH_LS_RECOVERY", "0") == "1",
        ls_recovery_max_fails=int(os.environ.get("ALTRO_BENCH_LS_RECOVERY_CAP", "2")),
        # widened final-step acceptance: failing lanes carry the best
        # merit-decreasing trial instead of freezing at alpha = 0, so
        # recovery iterations make real progress (docs/PERF.md round 4)
        ls_best_decrease_fallback=os.environ.get("ALTRO_BENCH_LS_FALLBACK", "1") == "1",
        # Armijo-only acceptance (skip the strong-Wolfe curvature test on
        # the full step and with it the two sequential dphi-completion
        # scans per iteration) — see SolverOptions.ls_armijo_only.
        # Default ON for the full solver: +10% throughput at identical
        # closed-loop error (0.4855) and HIGHER resolve success (98.75%
        # vs 98.51%). Default OFF in RTI mode, where the dphi scan fuses
        # into the completion for free and removing it measured ~3%
        # SLOWER (layout/fusion change), docs/PERF.md.
        ls_armijo_only=(rti or (par_ls and os.environ.get("ALTRO_BENCH_PHASE_SPLIT", "1") == "1"))
        and os.environ.get("ALTRO_BENCH_ARMIJO_ONLY", "0" if rti else "1") == "1",
        # Grid trials carry (phi, states) only; accepted payload rebuilt
        # knot-parallel post-selection (SolverOptions.ls_grid_x_only).
        ls_grid_x_only=os.environ.get("ALTRO_BENCH_GRID_X_ONLY", "1") == "1",
        # Batch-fused Pallas backward pass (ops/fused_backward.py):
        # +8.5% on this flagship workload (911.6k -> 989.0k resolves/s
        # back-to-back, identical closed-loop error/success); +29% on
        # the n=12 quadrotor config in bench_all.py (143k -> 185k).
        pallas_backward=use_pallas,
    )

    # Two-tier failed-lane rescue (round 5): after the standard-budget
    # resolve, lanes whose status != SUCCESS are re-solved from their
    # carried (post-main) state at the big budget the round-4 frontier
    # study proved sufficient (iterations_max=40-class, unlimited
    # recovery, best-decrease fallback -> 99.84%). The rescue is gated
    # per tick on a SCALAR any-lane-failed predicate via lax.cond:
    # failures cluster in ~16% of ticks (the per-lane dump shows
    # 168/200 ticks have ZERO failures and 99.6% of failures sit in 20
    # ticks), so 84% of ticks pay nothing. Healthy lanes keep their
    # main-solve state bit-for-bit (per-lane merge); rescued lanes
    # carry the rescued state forward, which also kills the observed
    # failure cascades (P(fail t+1 | fail t) = 17% in the dump).
    # Reference oracle being chased: 200/200 resolves converge
    # (bicycle_test.cpp:302-337) at an 80-iteration f64 budget.
    rescue = (not rti) and os.environ.get("ALTRO_BENCH_RESCUE", "1") == "1"
    # R=10 default (round-5 kernel-era Pareto, docs/PERF.md): 99.62% @
    # 3.03M — same success as the pre-kernel R=8 default at 1.57x its
    # throughput, with more gate margin than kernel-era R=8 (99.56%).
    rescue_iters = int(os.environ.get("ALTRO_BENCH_RESCUE_ITERS", "10"))
    # Penalty boost on rescue entry: failed lanes are mostly pinned at
    # f32-stationary points of the CURRENT merit landscape (the round-4
    # fallback probe proved no merit-decreasing trial exists there); the
    # unlock is dual/penalty reshaping, so the rescue enters with
    # rho *= boost instead of waiting for stat < sqrt(tol) triggers.
    rescue_boost = float(os.environ.get("ALTRO_BENCH_RESCUE_RHO_BOOST", "1"))
    # Recovery cap inside the rescue: 0 = unlimited (the default —
    # measured BEST: grinding recovery iterations are productive, a
    # cap=3 run lost 0.36% success for only +6% throughput). rho_boost
    # > 1 is catastrophic (over-penalized rescues destabilize the
    # closed loop to 82.5% success / 7.0 tracking error) — keep it 1.
    rescue_cap = int(os.environ.get("ALTRO_BENCH_RESCUE_CAP", "0"))
    # Line-search depth inside the rescue. The obstacle-workload lesson
    # (stuck lanes need alpha below beta^7) does NOT transfer here:
    # R=5 + 2 blocks measured 99.50% @ 1.69M vs the R=8 + 1 block
    # default's 99.62% @ 1.93M — on the Scotty tail, extra ITERATIONS
    # (dual/penalty reshaping) beat extra grid DEPTH per iteration.
    rescue_ls = int(os.environ.get("ALTRO_BENCH_RESCUE_LS_ITERS", "8"))
    opts_rescue = opts.replace(
        iterations_max=rescue_iters,
        ls_max_iters=rescue_ls,
        ls_failure_recovery=True,
        ls_recovery_max_fails=rescue_cap,
        ls_best_decrease_fallback=True,
        penalty_warm_start=True,
        penalty_warm_start_decay=rescue_boost,
    )

    # Sliding tracking windows (shared across lanes), precomputed on host
    xw = np.stack([ref.x[t : t + N + 1] for t in range(NSIM + 1)])  # [NSIM+1, N+1, n]
    qs = jnp.asarray(-(Qd[None, None, :] * xw), dtype)
    cs_ = 0.5 * np.sum(Qd[None, None, :] * xw * xw, axis=2)
    c_u = 0.5 * float(ref.u[0] @ (Rd * ref.u[0]))
    cs_[:, :N] += c_u
    cs = jnp.asarray(cs_, dtype)

    # Per-lane perturbed initial conditions
    key = jax.random.PRNGKey(0)
    x_true0 = jnp.asarray(ref.x[0], dtype)[None, :] + 0.02 * jax.random.normal(
        key, (B, n), dtype
    )
    states0 = batch_init_state(problem, B)
    states0 = dataclasses.replace(
        states0,
        u=jnp.tile(jnp.asarray([ref.u[0][0], 0.0], dtype), (B, N, 1)),
        x=jnp.tile(jnp.asarray(ref.x[: N + 1], dtype), (B, 1, 1)),
    )

    def resolve_one(x0, q, c, state):
        cost = dataclasses.replace(problem.cost, q=q, c=c)
        prob = dataclasses.replace(problem, x0=x0, cost=cost)
        new_state, stats = solve(prob, state, opts)
        return new_state, stats

    xw_dev = jnp.asarray(xw, dtype)

    # Tile-resident closed loop (the round-3 lever, docs/PERF.md): the
    # solver state lives in lane-tile layout for the WHOLE 200-tick scan —
    # solve_tiled keeps every per-iteration consumer on that layout, so
    # the batch-major <-> lane-tile operand relayout that dominated the
    # round-1/2 profile is paid exactly once (at t=0). The sliding cost
    # windows stay UNBATCHED (shared across lanes) instead of being
    # broadcast to [B, ...] as the vmapped path requires.
    from altro_tpu import tile_solver as tsv

    use_tiled = (
        use_pallas
        and os.environ.get("ALTRO_BENCH_TILED", "1") == "1"
        and B % 1024 == 0
        and tsv.supported_options(opts)
    )

    if use_tiled:
        from altro_tpu.ops.tile_iter import tile_vmap

        prob_axes = dataclasses.replace(
            problem,
            cost=dataclasses.replace(
                problem.cost, Q=False, R=False, q=False, r=False, c=False
            ),
            h=False, x0=True, A=False, B=False, f_aff=False,
            constraints=tuple(
                dataclasses.replace(s_, active=False)
                for s_ in problem.constraints
            ),
        )
        dyn_tiled = tile_vmap(
            lambda xk, uk: dyn(xk, uk, jnp.asarray(h, dtype), 0), (True, True)
        )
        xw0_t = jnp.asarray(xw[:, 0], dtype)  # [NSIM+1, n]

        def tick_tiled(carry, t):
            x_true_t, st_t = carry
            prob_t = dataclasses.replace(
                problem,
                cost=dataclasses.replace(problem.cost, q=qs[t], c=cs[t]),
                x0=x_true_t,
            )
            if rescue:
                from altro_tpu.rescue import solve_tiled_with_rescue

                st_t, stats = solve_tiled_with_rescue(
                    prob_t, prob_axes, st_t, opts, opts_rescue)
            else:
                st_t, stats = tsv.solve_tiled(prob_t, prob_axes, st_t, opts)
            u0 = st_t.u[:, 0]
            x_true_t = dyn_tiled(x_true_t, u0)
            st_t = tsv.shift_trajectory_tiled(st_t)
            diff = x_true_t - xw0_t[t + 1][None, :, None, None]
            err = jnp.sqrt(jnp.sum(diff * diff, axis=1))
            return (x_true_t, st_t), (stats.iterations, err, stats.status)

        @jax.jit
        def run(x_true, states):
            x_true_t = tsv.batch_to_tiles(x_true)
            st_t = tsv.state_to_tiles(states)
            (x_true_t, st_t), (iters, errs, statuses) = jax.lax.scan(
                tick_tiled, (x_true_t, st_t), jnp.arange(NSIM)
            )
            return (
                tsv.tiles_to_batch(x_true_t),
                tsv.state_from_tiles(st_t),
                iters, errs, statuses,
            )

    else:

        def resolve_one_rescue(x0, q, c, state):
            cost = dataclasses.replace(problem.cost, q=q, c=c)
            prob = dataclasses.replace(problem, x0=x0, cost=cost)
            return solve(prob, state, opts_rescue)

        def tick(carry, t):
            from altro_tpu.mpc import shift_trajectory

            x_true, states = carry
            q_t = jnp.broadcast_to(qs[t], (B,) + qs[t].shape)
            c_t = jnp.broadcast_to(cs[t], (B,) + cs[t].shape)
            states, stats = jax.vmap(resolve_one)(x_true, q_t, c_t, states)
            if rescue:
                failed = stats.status != 0

                def do_rescue(st_in):
                    st_r, stats_r = jax.vmap(resolve_one_rescue)(
                        x_true, q_t, c_t, st_in)
                    st_m = jax.tree.map(
                        lambda r, m: jnp.where(
                            failed.reshape((B,) + (1,) * (r.ndim - 1)), r, m),
                        st_r, st_in)
                    iters_m = stats.iterations + jnp.where(
                        failed, stats_r.iterations, 0)
                    status_m = jnp.where(failed, stats_r.status, stats.status)
                    return st_m, iters_m, status_m

                def no_rescue(st_in):
                    return st_in, stats.iterations, stats.status

                states, iters_t, status_t = jax.lax.cond(
                    jnp.any(failed), do_rescue, no_rescue, states)
                stats = dataclasses.replace(
                    stats, iterations=iters_t, status=status_t)
            u0 = states.u[:, 0]
            x_true = jax.vmap(lambda x, u: dyn(x, u, jnp.asarray(h, dtype), 0))(x_true, u0)
            states = jax.vmap(shift_trajectory)(states)
            err = jnp.linalg.norm(x_true - xw_dev[t + 1, 0][None, :], axis=1)
            return (x_true, states), (stats.iterations, err, stats.status)

        @jax.jit
        def run(x_true, states):
            (x_true, states), (iters, errs, statuses) = jax.lax.scan(
                tick, (x_true, states), jnp.arange(NSIM)
            )
            return x_true, states, iters, errs, statuses

    # Live-device kernel parity preflight (only meaningful when the fused
    # Pallas backward is actually in the measured path).
    preflight = None
    if use_pallas:
        preflight = _kernel_parity_preflight(jax, jnp, N, n, m, dtype)

    # Warm-up/compile + timed run, with one in-process retry on transient
    # backend errors (the remote-TPU tunnel occasionally drops a call with
    # FAILED_PRECONDITION; the backend usually recovers within seconds).
    last_exc = None
    for attempt in range(2):
        try:
            t0 = time.perf_counter()
            jax.block_until_ready(run(x_true0, states0))
            compile_s = time.perf_counter() - t0

            t0 = time.perf_counter()
            x_true, states, iters, errs, statuses = jax.block_until_ready(
                run(x_true0, states0)
            )
            elapsed = time.perf_counter() - t0
            last_exc = None
            break
        except jax.errors.JaxRuntimeError as e:  # transient tunnel/backend error
            last_exc = e
            print(f"bench: attempt {attempt} failed: {e}", file=sys.stderr)
            time.sleep(10.0)
    if last_exc is not None:
        raise last_exc

    dump = os.environ.get("ALTRO_BENCH_DUMP")
    if dump:
        # per-lane-tick arrays for offline analysis (docs/PERF.md
        # line-search failure post-mortem)
        np.savez_compressed(
            dump,
            # [NSIM, B] in both layouts (tiled arrays flatten in lane order)
            iterations=np.asarray(iters).reshape(NSIM, -1),
            tracking_error=np.asarray(errs).reshape(NSIM, -1),
            status=np.asarray(statuses).reshape(NSIM, -1),
        )

    total_solves = B * NSIM
    solves_per_s = total_solves / elapsed
    mean_iters = float(jnp.mean(iters))
    mean_err = float(jnp.mean(errs))
    success = float(jnp.mean(statuses == 0))
    per_tick_ms = elapsed / NSIM * 1e3

    # Hard accuracy gates: fail loudly rather than report a fast-but-wrong
    # number. (RTI mode has no convergence contract — success is reported
    # as null and not gated, matching docs/PERF.md.)
    gate_failures = []
    if mean_err > GATE_MAX_TRACKING_ERR:
        gate_failures.append(
            f"mean_tracking_error {mean_err:.4f} > {GATE_MAX_TRACKING_ERR}"
        )
    if mean_iters > GATE_MAX_MEAN_ITERS:
        gate_failures.append(f"mean_iterations {mean_iters:.3f} > {GATE_MAX_MEAN_ITERS}")
    min_success = GATE_MIN_SUCCESS if rescue else GATE_MIN_SUCCESS_NO_RESCUE
    if not rti and success < min_success:
        gate_failures.append(f"success_rate {success:.4f} < {min_success}")
    if preflight is not None:
        if not preflight["kernel_parity_ok"]:
            gate_failures.append("kernel parity preflight: backward pass reported failure")
        if preflight["kernel_parity_max_dK"] > GATE_MAX_KERNEL_DK:
            gate_failures.append(
                f"kernel parity max|dK| {preflight['kernel_parity_max_dK']:.2e}"
                f" > {GATE_MAX_KERNEL_DK}"
            )

    result = {
        "metric": "scotty_mpc_rti_resolves_per_s_per_chip"
        if rti
        else "scotty_mpc_warm_resolves_per_s_per_chip",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / BASELINE_SOLVES_PER_S, 3),
        "platform": platform,
        "batch": B,
        "ticks": NSIM,
        "horizon": N,
        "batch_resolve_latency_ms": round(per_tick_ms, 3),
        "mean_iterations": round(mean_iters, 3),
        "mean_tracking_error": round(mean_err, 4),
        "success_rate": None if rti else round(success, 4),
        "compile_s": round(compile_s, 1),
        "gates_passed": not gate_failures,
        "rescue": (
            {"iters": rescue_iters, "cap": rescue_cap} if rescue else None
        ),
    }
    if preflight is not None:
        result.update(preflight)
    if gate_failures:
        result["error"] = "accuracy gates failed: " + "; ".join(gate_failures)
        print(json.dumps(result))
        sys.exit(EXIT_GATE_FAILURE)
    print(json.dumps(result))


def _last_json_line(text: str):
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def parent_main() -> int:
    platform = pick_platform()
    rungs = []
    if platform != "cpu":
        rungs += [
            ("tpu", {}),
            ("tpu-retry", {}),
            ("tpu-no-tiled", {"ALTRO_BENCH_TILED": "0"}),
            ("tpu-no-pallas", {"ALTRO_BENCH_PALLAS_BWD": "0",
                               "ALTRO_BENCH_TILED": "0"}),
            ("tpu-b1024", {"ALTRO_BENCH_BATCH": "1024"}),
        ]
    rungs.append(
        (
            "cpu",
            {
                "ALTRO_BENCH_PLATFORM": "cpu",
                "ALTRO_BENCH_BATCH": os.environ.get("ALTRO_BENCH_CPU_BATCH", "64"),
                "ALTRO_BENCH_TICKS": os.environ.get("ALTRO_BENCH_CPU_TICKS", "25"),
            },
        )
    )

    attempts = []
    for name, overrides in rungs:
        env = dict(os.environ)
        env.update(overrides)
        env.setdefault("ALTRO_BENCH_PLATFORM", "cpu" if name == "cpu" else "tpu")
        timeout = float(
            os.environ.get(
                "ALTRO_BENCH_ATTEMPT_TIMEOUT", "1500" if name != "cpu" else "2400"
            )
        )
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child"],
                env=env,
                capture_output=True,
                text=True,
                timeout=timeout,
            )
        except subprocess.TimeoutExpired:
            attempts.append({"rung": name, "outcome": "timeout",
                             "seconds": round(time.time() - t0, 1)})
            continue
        sys.stderr.write(proc.stderr[-2000:])
        result = _last_json_line(proc.stdout)
        if proc.returncode == 0 and result is not None:
            if attempts:
                result["degraded_from"] = attempts
            print(json.dumps(result))
            return 0
        if proc.returncode == EXIT_GATE_FAILURE and result is not None:
            # Accuracy failure, not infra: surface it, do NOT mask it by
            # falling back to a degraded config.
            if attempts:
                result["degraded_from"] = attempts
            print(json.dumps(result))
            return 1
        attempts.append(
            {
                "rung": name,
                "outcome": f"rc={proc.returncode}",
                "seconds": round(time.time() - t0, 1),
                "stderr_tail": proc.stderr[-300:],
            }
        )
    print(
        json.dumps(
            {
                "metric": "scotty_mpc_warm_resolves_per_s_per_chip",
                "value": 0.0,
                "unit": "solves/s",
                "vs_baseline": 0.0,
                "error": "all bench attempts failed",
                "attempts": attempts,
            }
        )
    )
    return 1


if __name__ == "__main__":
    if "--child" in sys.argv:
        child_main()
    else:
        sys.exit(parent_main())
