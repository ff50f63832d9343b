"""All BASELINE.json benchmark configs, one JSON line each.

Configs (BASELINE.json "configs"):
  1. double integrator, goal constraint, N=100 — cold-solve latency
  2. pendulum swing-up (nonlinear + torque bounds, full AL stack)
  3. kinematic bicycle path tracking with steering bounds (Scotty window)
  4. scotty long horizon: full-trajectory solve, N=500
  5. scotty receding-horizon MPC, batched warm-started resolves
     (the headline — same as bench.py)

Usage: python scripts/bench_all.py            (TPU if reachable)
       ALTRO_BENCH_PLATFORM=cpu python scripts/bench_all.py
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import pick_platform


def main():
    platform = pick_platform()
    if platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from altro_tpu.cones import Cone
    from altro_tpu.io.scotty import load_scotty, synthetic_scotty
    from altro_tpu.models.bicycle import bicycle_continuous
    from altro_tpu.models.double_integrator import double_integrator_dynamics
    from altro_tpu.models.integrators import midpoint
    from altro_tpu.models.pendulum import pendulum_continuous
    from altro_tpu.options import SolverOptions
    from altro_tpu.problem import ConstraintSpec, Problem, lqr_cost_from_reference
    from altro_tpu.profiling import time_fn
    from altro_tpu.solver import init_state, solve

    dtype = jnp.float32
    f32opts = SolverOptions(
        iterations_max=30, tol_stationarity=1e-3, tol_primal_feasibility=1e-3,
        throw_errors=False,
    )
    results = []

    def run(name, problem, state, opts, extra=None):
        fn = jax.jit(lambda s: solve(problem, s, opts))
        stats = time_fn(fn, state, iters=5)
        _, st = jax.block_until_ready(fn(state))

        # DEVICE time via chained-jit differencing (round 5): a single
        # remote-TPU dispatch carries a fixed ~21-24 ms per-call
        # overhead at these program sizes, so p50_ms overstates the
        # on-device solve latency; (t3 - t1)/2 isolates it
        # (docs/PERF.md round-5 methodology).
        import time as _trn

        def chain(K):
            def f(s):
                tot = jnp.asarray(0.0, problem.x0.dtype)
                for i in range(K):
                    p_i = dataclasses.replace(
                        problem, x0=problem.x0 + i * 1e-6)
                    _s, t_i = solve(p_i, s, opts)
                    tot = tot + t_i.objective_value
                return tot
            return jax.jit(f)

        def best_of(f, s, reps=5):
            jax.block_until_ready(f(s))
            b = float("inf")
            for _ in range(reps):
                t0 = _trn.perf_counter()
                jax.block_until_ready(f(s))
                b = min(b, _trn.perf_counter() - t0)
            return b

        t1 = best_of(chain(1), state)
        t3 = best_of(chain(3), state)
        row = {
            "config": name,
            "platform": platform,
            "p50_ms": round(stats["p50_ms"], 3),
            "device_ms": round((t3 - t1) / 2 * 1e3, 3),
            "iterations": int(st.iterations),
            "status": int(st.status),
            "feasibility": float(st.primal_feasibility),
        }
        row.update(extra or {})
        results.append(row)
        print(json.dumps(row), flush=True)

    # 1. Double integrator, goal constraint, N=100
    N, dim = 100, 2
    n, m = 2 * dim, dim
    xf = jnp.zeros(n)
    goal = ConstraintSpec(
        fn=lambda x, u, k: x - xf, cone=Cone.ZERO, dim=n,
        active=jnp.zeros(N + 1, bool).at[N].set(True), label="goal",
    )
    problem = Problem(
        N=N, n=n, m=m, dynamics=double_integrator_dynamics(dim), dynamics_jac=None,
        constraints=(goal,),
        cost=lqr_cost_from_reference(
            jnp.ones((N + 1, n), dtype), jnp.full((N + 1, m), 1e-2, dtype),
            jnp.zeros((N + 1, n), dtype), jnp.zeros((N + 1, m), dtype),
        ),
        h=jnp.full(N, 0.05, dtype), x0=jnp.asarray([1.0, 2.0, 0.0, 0.0], dtype),
    )
    run("double_integrator_goal_N100", problem, init_state(problem),
        dataclasses.replace(f32opts, penalty_scaling=100.0))

    # 2. Pendulum swing-up with torque bounds
    N = 50
    n, m = 2, 1
    xf = np.array([np.pi, 0.0])
    Qd = np.concatenate([np.full((N, n), 1e-2), np.full((1, n), 1.0)])
    torque = ConstraintSpec(
        fn=lambda x, u, k: jnp.concatenate([u - 8.0, -8.0 - u]),
        cone=Cone.NEGATIVE_ORTHANT, dim=2 * m,
        active=jnp.ones(N + 1, bool).at[N].set(False), label="torque bound",
    )
    problem = Problem(
        N=N, n=n, m=m, dynamics=midpoint(pendulum_continuous()), dynamics_jac=None,
        constraints=(torque,),
        cost=lqr_cost_from_reference(
            jnp.asarray(Qd, dtype), jnp.full((N + 1, m), 1e-3, dtype),
            jnp.asarray(np.tile(xf, (N + 1, 1)), dtype), jnp.zeros((N + 1, m), dtype),
        ),
        h=jnp.full(N, np.float32(3.0 / N), dtype), x0=jnp.zeros(n, dtype),
    )
    state = init_state(problem)
    state = dataclasses.replace(state, u=jnp.full_like(state.u, 0.1))
    run("pendulum_swingup_bounded", problem, state, f32opts)

    # 3/4. Bicycle Scotty tracking, window N=30 and long-horizon N=500
    try:
        ref = load_scotty()
    except FileNotFoundError:
        ref = synthetic_scotty()
    h = float(np.float32(ref.tf / ref.N))
    delta_max = np.deg2rad(60.0)
    # NOTE: scotty.json is a position-only reference (delta == 0 rows), and
    # its sharp corners demand >60 deg steering over a full-horizon solve —
    # the steering-bounded long-horizon problem is infeasible as posed (the
    # reference never solves it either; it only runs N=30 windows). The
    # long-horizon config is therefore unconstrained tracking.
    for name, N in (("bicycle_scotty_window_N30", 30), ("scotty_long_horizon_N500", 500)):
        steering = ConstraintSpec(
            fn=lambda x, u, k: jnp.stack([x[3] - delta_max, -delta_max - x[3]]),
            cone=Cone.NEGATIVE_ORTHANT, dim=2, active=jnp.ones(N + 1, bool),
            label="steering",
        )
        from altro_tpu.models.tile_steps import bicycle_tile, midpoint_tile

        problem = Problem(
            N=N, n=4, m=2, dynamics=midpoint(bicycle_continuous()), dynamics_jac=None,
            constraints=(steering,) if N <= 100 else (),
            cost=lqr_cost_from_reference(
                jnp.full((N + 1, 4), 1e-2, dtype), jnp.full((N + 1, 2), 1e-3, dtype),
                jnp.asarray(ref.x[: N + 1], dtype), jnp.asarray(ref.u[: N + 1], dtype),
            ),
            h=jnp.full(N, h, dtype), x0=jnp.asarray(ref.x[0], dtype),
            # packed trial-rollout kernel for the unconstrained N=500 row
            # (the constrained N=30 row keeps the scan grid automatically)
            dynamics_tile=midpoint_tile(bicycle_tile()),
        )
        state = init_state(problem)
        state = dataclasses.replace(
            state,
            u=jnp.tile(jnp.asarray([ref.u[0][0], 0.0], dtype), (N, 1)),
            x=jnp.asarray(ref.x[: N + 1], dtype),
        )
        # The N=500 full-horizon problem does not converge to tolerance for
        # ANY solver of this family (the position-only reference is
        # dynamically inconsistent; objective decreases but stationarity
        # plateaus, in f64 too). The long-horizon config therefore measures
        # fixed-iteration throughput: 20 AL-iLQR iterations at N=500.
        opts_i = dataclasses.replace(
            f32opts,
            use_backtracking_linesearch=True,
            iterations_max=20 if N > 100 else 30,
            symmetrize_ctg=N > 100,
            # Long horizon: merit rollouts dominate (docs/PERF.md); the
            # phase-split grid search keeps the N=500 rollout dynamics-only.
            parallel_linesearch=N > 100,
            ls_phase_split=N > 100,
            ls_try_cubic_first=N <= 100,
            # Armijo-only acceptance drops the two sequential 500-step
            # dphi completion scans per iteration: 129 -> 78 ms at a
            # slightly LOWER 20-iteration objective (8574 vs 8595) —
            # same trade the headline bench made (docs/PERF.md).
            ls_armijo_only=N > 100,
            # 3 grid blocks (alpha down to beta^23): the N=500 f32 solve
            # needs steps below beta^7 once the position-only reference's
            # inconsistency dominates; a single solve pays extra blocks
            # only on the iterations that actually exhaust block 0 (unlike
            # the B=1024 batched rows, where any lane exhausting block 0
            # makes every lane pay — docs/PERF.md).
            ls_max_iters=24 if N > 100 else 25,
        )
        extra = {"note": "fixed-20-iteration long-horizon throughput"} if N > 100 else None
        run(name, problem, state, opts_i, extra)

    # 4b. Small-batch warm-resolve latency through the AOT export path
    # (VERDICT r2 item 3: the reference's defining deployment is a ~1 kHz
    # single-controller warm-started loop, bicycle_test.cpp:302-342; the
    # batched story is proven, this row proves/bounds the B=1 story).
    # Three numbers per batch size:
    #   p50_call_ms      — full host-blocking round trip per resolve via
    #                      the serialized jax.export artifact (no tracing)
    #   chained_call_ms  — amortized per-resolve time of a 100-deep chain
    #                      of resolves enqueued back-to-back (state feeds
    #                      the next call), i.e. the device-side controller
    #                      -loop rate without per-call host sync
    #   dispatch_floor_ms— host-blocking round trip of a trivial jitted
    #                      add on the same state pytree: the transport
    #                      floor that bounds p50_call_ms from below.
    if os.environ.get("ALTRO_BENCH_LATENCY", "1") == "1":
        import time as _t

        from altro_tpu.export import (
            export_mpc_server,
            make_serving_fn,
            state_to_arrays,
        )
        from altro_tpu.mpc import shift_trajectory as _shift

        Nl = 30
        steering = ConstraintSpec(
            fn=lambda x, u, k: jnp.stack([x[3] - delta_max, -delta_max - x[3]]),
            cone=Cone.NEGATIVE_ORTHANT, dim=2, active=jnp.ones(Nl + 1, bool),
            label="steering", diag_hessian=True,
        )
        lat_problem = Problem(
            N=Nl, n=4, m=2, dynamics=midpoint(bicycle_continuous()),
            dynamics_jac=None, constraints=(steering,),
            cost=lqr_cost_from_reference(
                jnp.full((Nl + 1, 4), 1e-2, dtype),
                jnp.full((Nl + 1, 2), 1e-3, dtype),
                jnp.asarray(ref.x[: Nl + 1], dtype),
                jnp.asarray(ref.u[: Nl + 1], dtype),
            ),
            h=jnp.full(Nl, h, dtype), x0=jnp.asarray(ref.x[0], dtype),
        )
        lat_opts = dataclasses.replace(
            f32opts, iterations_max=10, use_backtracking_linesearch=True,
            penalty_warm_start=True, parallel_linesearch=True,
            ls_phase_split=True, ls_armijo_only=True, ls_grid_x_only=True,
            ls_max_iters=8,
        )
        for Bl in (None, 8):
            tag = "B1" if Bl is None else f"B{Bl}"
            art = export_mpc_server(lat_problem, lat_opts, batch=Bl,
                                    platforms=(platform,))
            serving = jax.jit(art.call)
            # warm-started inputs: a converged state after a few prior ticks
            st = init_state(lat_problem)
            st = dataclasses.replace(
                st,
                u=jnp.tile(jnp.asarray([ref.u[0][0], 0.0], dtype), (Nl, 1)),
                x=jnp.asarray(ref.x[: Nl + 1], dtype),
            )
            st_arrays = state_to_arrays(st)
            xm = jnp.asarray(ref.x[1], dtype)
            xr = jnp.asarray(ref.x[1 : Nl + 2], dtype)
            ur = jnp.asarray(ref.u[1 : Nl + 2], dtype)
            if Bl is not None:
                tile = lambda a: jnp.broadcast_to(a, (Bl,) + a.shape)
                st_arrays = {k: tile(v) for k, v in st_arrays.items()}
                xm, xr, ur = tile(xm), tile(xr), tile(ur)
            # converge the warm start (2 prior resolves)
            for _ in range(2):
                _, st_arrays, _ = jax.block_until_ready(
                    serving(xm, xr, ur, st_arrays))
            # blocking per-call p50/p90
            times = []
            for _ in range(60):
                t0 = _t.perf_counter()
                u0, st2, lstats = jax.block_until_ready(
                    serving(xm, xr, ur, st_arrays))
                times.append((_t.perf_counter() - t0) * 1e3)
            times = np.sort(np.asarray(times))
            # chained (device-side loop): state feeds the next resolve,
            # one host sync at the end
            CH = 100
            t0 = _t.perf_counter()
            st_c = st_arrays
            for _ in range(CH):
                u0, st_c, lstats = serving(xm, xr, ur, st_c)
            jax.block_until_ready((u0, st_c))
            chained_ms = (_t.perf_counter() - t0) / CH * 1e3
            # transport floor: trivial jitted add over the same pytree
            floor_fn = jax.jit(
                lambda a, s: (a + 1.0, {k: v + 1.0 for k, v in s.items()}))
            jax.block_until_ready(floor_fn(xm, st_arrays))
            ftimes = []
            for _ in range(60):
                t0 = _t.perf_counter()
                jax.block_until_ready(floor_fn(xm, st_arrays))
                ftimes.append((_t.perf_counter() - t0) * 1e3)
            ftimes = np.sort(np.asarray(ftimes))
            row = {
                "config": f"mpc_latency_aot_{tag}",
                "platform": platform,
                "p50_call_ms": round(float(times[len(times) // 2]), 3),
                "p90_call_ms": round(float(times[int(len(times) * 0.9)]), 3),
                "chained_call_ms": round(chained_ms, 3),
                "dispatch_floor_p50_ms": round(float(ftimes[len(ftimes) // 2]), 3),
                "iterations": int(np.max(np.asarray(lstats["iterations"]))),
            }
            results.append(row)
            print(json.dumps(row), flush=True)

    # 5. Batched quadrotor waypoint resolves (n=12, m=4: bigger blocks)
    from altro_tpu.models.quadrotor import quadrotor_continuous
    from altro_tpu.models.integrators import rk4
    from altro_tpu.parallel.batch import batch_init_state, vmap_solve

    N, n, m = 30, 12, 4
    Bq = int(os.environ.get("ALTRO_BENCH_QUAD_BATCH", "1024"))
    hover = 0.5 * 9.81 / 4.0
    xf = np.zeros(n)
    xf[:3] = [1.0, 0.0, 1.0]
    Qd = np.tile(
        np.concatenate([np.full(3, 1.0), np.full(3, 0.1), np.full(6, 0.1)]), (N + 1, 1)
    )
    Qd[N] *= 10
    from altro_tpu.models.tile_steps import (
        quadrotor_cols,
        quadrotor_tile,
        rk4_cols,
        rk4_tile,
    )

    qproblem = Problem(
        N=N, n=n, m=m, dynamics=rk4(quadrotor_continuous()), dynamics_jac=None,
        constraints=(),
        cost=lqr_cost_from_reference(
            jnp.asarray(Qd, dtype), jnp.full((N + 1, m), 1e-2, dtype),
            jnp.asarray(np.tile(xf, (N + 1, 1)), dtype),
            jnp.full((N + 1, m), hover, dtype),
        ),
        h=jnp.full(N, 0.05, dtype), x0=jnp.zeros(n, dtype),
        # packed trial-rollout kernel on the B=1 latency row; the batched
        # rows fall back through the custom_vmap rule automatically
        dynamics_tile=rk4_tile(quadrotor_tile()),
        # batched tiled rollout kernel on the tile-resident MPC rows
        dynamics_cols=rk4_cols(quadrotor_cols()),
    )
    # Parallel-grid line search: 2678 -> 4710 solves/s at identical mean
    # objective vs the sequential Wolfe search (lockstep straggler cost
    # under vmap); phase-split doubles it again by keeping the grid
    # rollouts dynamics-only — the RK4-quadrotor Jacobian work moves to
    # one knot-parallel completion at the accepted step (docs/PERF.md).
    # iterations_max=15 lets cold lanes CONVERGE (TPU f32: p50 11
    # iterations, ~95% of lanes reach the 1e-3 tolerances; a handful
    # stall at the f32 stationarity floor ~2e-3).
    quad_tiled = (
        platform == "tpu"
        and os.environ.get("ALTRO_BENCH_QUAD_TILED", "1") == "1"
        and Bq % 1024 == 0
    )
    qopts = dataclasses.replace(
        f32opts, iterations_max=15, rti_mode=False,
        use_backtracking_linesearch=True, parallel_linesearch=True,
        ls_phase_split=True, ls_try_cubic_first=False, ls_max_iters=8,
        penalty_warm_start=True,
        # Armijo-only acceptance: required by the tile-resident runner
        # (and measured equal-accuracy on the bicycle headline); the
        # waypoint sidecars below (success, final dist) gate it here.
        ls_armijo_only=quad_tiled,
        # Relative-KKT stationarity: the quadrotor's cost scale (terminal
        # Q ~ 10, duals ~ 20) puts the f32 absolute-residual floor near
        # 2e-3 > tol_stationarity — well-solved lanes would otherwise
        # burn to iterations_max and (under vmap) make EVERY lane pay.
        tol_stationarity_rel=1e-5,
        # Batch-fused Pallas backward: 2x the vmapped scan at these
        # n=12 blocks (ops/fused_backward.py).
        pallas_backward=True,
        # A/B knob for the batched rollout kernel on this row
        pallas_rollout_tiled=os.environ.get(
            "ALTRO_BENCH_QUAD_ROLLOUT_KERNEL", "1") == "1",
        # Explicit Armijo accept tolerance (the rocket-row lesson,
        # docs/PERF.md round 5 cont.): near the f32 stationarity floor
        # the accept margin is below rounding resolution, so kernel-vs-
        # scan transcendental ULP differences flip ties; the slack makes
        # acceptance implementation-independent.
        ls_armijo_slack=float(os.environ.get(
            "ALTRO_BENCH_QUAD_SLACK", "1e-6")),
    )
    # Closed-loop waypoint MPC, fused into one jitted lax.scan over ticks
    # (same methodology as the headline bicycle workload — per-dispatch
    # host timing through the remote-TPU tunnel adds ~20 ms/call and
    # understates the rate ~8x, docs/PERF.md). Each lane flies its
    # quadrotor through a square of waypoints; the waypoint (so the cost's
    # linear terms) switches every WAYP ticks, the resolve is warm-started
    # from the shifted previous solution.
    from altro_tpu.mpc import shift_trajectory

    QNSIM, WAYP = 100, 25
    qdyn = qproblem.dynamics
    waypoints = np.zeros((4, n))
    waypoints[:, :3] = [[1.0, 0.0, 1.0], [1.0, 1.0, 1.5], [0.0, 1.0, 1.0],
                        [0.0, 0.0, 0.5]]
    # Linear cost terms per waypoint: q = -Q xref, c = 0.5 xref'Q xref + cu
    c_u = 0.5 * float(np.full(m, hover) @ (np.full(m, 1e-2) * np.full(m, hover)))
    q_wp = jnp.asarray(-(Qd[None, :, :] * waypoints[:, None, :]), dtype)
    c_wp_ = 0.5 * np.sum(Qd[None, :, :] * waypoints[:, None, :] ** 2, axis=2)
    c_wp_[:, :N] += c_u
    c_wp = jnp.asarray(c_wp_, dtype)
    wp_idx = jnp.asarray((np.arange(QNSIM) // WAYP) % 4, jnp.int32)

    key = jax.random.PRNGKey(1)
    qx0 = 0.05 * jax.random.normal(key, (Bq, n), dtype)
    qstates = batch_init_state(qproblem, Bq)
    qstates = dataclasses.replace(qstates, u=jnp.full((Bq, N, m), hover, dtype))

    from altro_tpu.solver import solve as S_solve

    def qresolve(x0, q, c, state):
        cost = dataclasses.replace(qproblem.cost, q=q, c=c)
        prob = dataclasses.replace(qproblem, x0=x0, cost=cost)
        return S_solve(prob, state, qopts)

    if quad_tiled:
        # Tile-resident runner (altro_tpu.tile_solver): state stays in
        # lane-tile layout across all ticks; waypoint cost terms stay
        # unbatched (shared across lanes). Same structure as bench.py's
        # headline loop.
        from altro_tpu import tile_solver as _tsv
        from altro_tpu.ops.tile_iter import tile_vmap as _tile_vmap

        q_axes = dataclasses.replace(
            qproblem,
            cost=dataclasses.replace(qproblem.cost, Q=False, R=False,
                                     q=False, r=False, c=False),
            h=False, x0=True, A=False, B=False, f_aff=False,
            constraints=(),
        )
        qdyn_tiled = _tile_vmap(
            lambda xk, uk: qdyn(xk, uk, jnp.asarray(0.05, dtype), 0),
            (True, True))

        def qtick(carry, t):
            x_true_t, st_t = carry
            prob_t = dataclasses.replace(
                qproblem,
                cost=dataclasses.replace(
                    qproblem.cost, q=q_wp[wp_idx[t]], c=c_wp[wp_idx[t]]),
                x0=x_true_t)
            st_t, stats = _tsv.solve_tiled(prob_t, q_axes, st_t, qopts)
            u0 = st_t.u[:, 0]
            x_true_t = qdyn_tiled(x_true_t, u0)
            st_t = _tsv.shift_trajectory_tiled(st_t)
            return (x_true_t, st_t), (stats.iterations, stats.status)

        @jax.jit
        def qrun(x_true, states):
            x_true_t = _tsv.batch_to_tiles(x_true)
            st_t = _tsv.state_to_tiles(states)
            (x_true_t, st_t), (iters, statuses) = jax.lax.scan(
                qtick, (x_true_t, st_t), jnp.arange(QNSIM))
            return (_tsv.tiles_to_batch(x_true_t),
                    _tsv.state_from_tiles(st_t), iters, statuses)

    else:
        def qtick(carry, t):
            x_true, states = carry
            q_t = jnp.broadcast_to(q_wp[wp_idx[t]], (Bq, N + 1, n))
            c_t = jnp.broadcast_to(c_wp[wp_idx[t]], (Bq, N + 1))
            states, stats = jax.vmap(qresolve)(x_true, q_t, c_t, states)
            u0 = states.u[:, 0]
            x_true = jax.vmap(lambda x, u: qdyn(x, u, jnp.asarray(0.05, dtype), 0))(
                x_true, u0)
            states = jax.vmap(shift_trajectory)(states)
            return (x_true, states), (stats.iterations, stats.status)

        @jax.jit
        def qrun(x_true, states):
            (x_true, states), (iters, statuses) = jax.lax.scan(
                qtick, (x_true, states), jnp.arange(QNSIM))
            return x_true, states, iters, statuses

    import time as _time

    out = jax.block_until_ready(qrun(qx0, qstates))
    t0 = _time.perf_counter()
    x_true_f, _, qiters, qstatuses = jax.block_until_ready(qrun(qx0, qstates))
    q_elapsed = _time.perf_counter() - t0
    final_wp = waypoints[int(np.asarray(wp_idx)[-1])]
    final_dist = float(jnp.mean(jnp.linalg.norm(
        x_true_f[:, :3] - jnp.asarray(final_wp[:3], dtype)[None, :], axis=1)))
    row = {
        "config": f"quadrotor_waypoint_mpc_B{Bq}" + ("_tiled" if quad_tiled else ""),
        "platform": platform,
        "solves_per_s": round(Bq * QNSIM / q_elapsed, 1),
        "batch_resolve_latency_ms": round(q_elapsed / QNSIM * 1e3, 3),
        "ticks": QNSIM,
        "mean_iterations": round(float(jnp.mean(qiters)), 2),
        "success_rate": round(float(jnp.mean(qstatuses == 0)), 4),
        "mean_final_waypoint_dist": round(final_dist, 4),
    }
    results.append(row)
    print(json.dumps(row), flush=True)

    # 5b. Quadrotor-class SINGLE-LANE warm-resolve latency (n=12, m=4).
    # Proves the packed latency kernel's G=2 row-group path (n > 8) on
    # device — VERDICT r3 item 6: packed_supported accepts n=12/m=4 and
    # the interpret-mode parity test covers it, but no bench row showed
    # a quadrotor B=1 solve actually dispatching the kernel on hardware.
    # Methodology mirrors the B=1 bicycle row: a 100-deep device-side
    # closed-loop chain (resolve -> apply u0 -> shift), one host sync at
    # the end, measured back-to-back with the kernel ON vs OFF (scan).
    if os.environ.get("ALTRO_BENCH_QUAD_LATENCY", "1") == "1" and platform == "tpu":
        import time as _tq

        qlat_row = {"config": "quadrotor_latency_B1", "platform": platform}
        for kernel_on in (True, False):
            qlopts = dataclasses.replace(
                qopts, pallas_backward=False, ls_armijo_only=True,
                pallas_latency_backward=kernel_on,
            )
            ql_state = init_state(qproblem)
            ql_state = dataclasses.replace(
                ql_state, u=jnp.full((N, m), hover, dtype))

            def qlat_tick(carry, t):
                x_true, st = carry
                cost = dataclasses.replace(
                    qproblem.cost, q=q_wp[wp_idx[t]], c=c_wp[wp_idx[t]])
                prob = dataclasses.replace(qproblem, x0=x_true, cost=cost)
                st, stats = S_solve(prob, st, qlopts)
                u0 = st.u[0]
                x_true = qdyn(x_true, u0, jnp.asarray(0.05, dtype), 0)
                st = shift_trajectory(st)
                return (x_true, st), stats.iterations

            @jax.jit
            def qlat_run(x0, st):
                (xf_, st), iters = jax.lax.scan(
                    qlat_tick, (x0, st), jnp.arange(QNSIM))
                return xf_, st, iters

            x0_1 = qx0[0]
            out = jax.block_until_ready(qlat_run(x0_1, ql_state))
            t0 = _tq.perf_counter()
            xf_1, _, ql_iters = jax.block_until_ready(qlat_run(x0_1, ql_state))
            per_tick_ms = (_tq.perf_counter() - t0) / QNSIM * 1e3
            tag = "packed_kernel" if kernel_on else "scan"
            qlat_row[f"chained_call_ms_{tag}"] = round(per_tick_ms, 3)
            qlat_row[f"mean_iterations_{tag}"] = round(
                float(jnp.mean(ql_iters)), 2)
        qlat_row["final_waypoint_dist"] = round(float(jnp.linalg.norm(
            np.asarray(xf_1)[:3] - final_wp[:3])), 4)
        results.append(qlat_row)
        print(json.dumps(qlat_row), flush=True)

    # 7. Obstacle-constrained batched bicycle MPC (round-5 VERDICT item
    # 5; BASELINE.json configs[2] names "steering/accel bounds +
    # obstacle constraints"). A circular obstacle sits ON the Scotty
    # path, so every lane must swerve: the obstacle inequality
    #   r^2 - (px-cx)^2 - (py-cy)^2 <= 0
    # is NONLINEAR with a dense (rank-1, non-diagonal) Gauss-Newton AL
    # Hessian — this row exercises the dense expansion path
    # (solver._cost_expansions_and_cost) and general constraint
    # machinery (reference knotpoint_data.cpp:155-178) at batch scale,
    # which no other row does. Gates: resolve success, obstacle
    # clearance of the driven trajectory, bounded tracking error.
    if os.environ.get("ALTRO_BENCH_OBSTACLE", "1") == "1":
        import time as _to

        from altro_tpu.mpc import shift_trajectory as _shift_o
        from altro_tpu.parallel.batch import batch_init_state as _binit
        from altro_tpu.solver import solve as _solve_o

        No = 30
        Bo = int(os.environ.get("ALTRO_BENCH_OBSTACLE_BATCH", "1024"))
        ONSIM = int(os.environ.get("ALTRO_BENCH_OBSTACLE_TICKS", "60"))
        Qd_o = np.full(4, 1e-2)
        Rd_o = np.full(2, 1e-3)
        # obstacle centered ON the reference path ~25 ticks in
        t_obs = 25
        c_obs = np.asarray(ref.x[t_obs + No // 2][:2], np.float64)
        r_obs = float(os.environ.get("ALTRO_BENCH_OBSTACLE_R", "0.75"))

        def _obs_fn(x, u, k):
            dx_ = x[0] - c_obs[0]
            dy_ = x[1] - c_obs[1]
            return jnp.stack([r_obs * r_obs - dx_ * dx_ - dy_ * dy_])

        obs_spec = ConstraintSpec(
            fn=_obs_fn, cone=Cone.NEGATIVE_ORTHANT, dim=1,
            active=jnp.ones(No + 1, bool), label="obstacle")
        steer_o = ConstraintSpec(
            fn=lambda x, u, k: jnp.stack(
                [x[3] - delta_max, -delta_max - x[3]]),
            cone=Cone.NEGATIVE_ORTHANT, dim=2,
            active=jnp.ones(No + 1, bool), label="steering")
        # input bounds: speed in [0, 8] (reference speed 6.31 m/s) +
        # steering rate within +-1.5 rad/s (u = [v, delta_dot])
        v_max, sr_max = 8.0, 1.5
        accel_o = ConstraintSpec(
            fn=lambda x, u, k: jnp.stack(
                [u[0] - v_max, -u[0], u[1] - sr_max, -sr_max - u[1]]),
            cone=Cone.NEGATIVE_ORTHANT, dim=4,
            active=jnp.ones(No + 1, bool).at[No].set(False),
            label="input bounds")
        o_problem = Problem(
            N=No, n=4, m=2, dynamics=midpoint(bicycle_continuous()),
            dynamics_jac=None,
            constraints=(steer_o, accel_o, obs_spec),
            cost=lqr_cost_from_reference(
                jnp.asarray(np.tile(Qd_o, (No + 1, 1)), dtype),
                jnp.asarray(np.tile(Rd_o, (No + 1, 1)), dtype),
                jnp.asarray(ref.x[: No + 1], dtype),
                jnp.asarray(ref.u[: No + 1], dtype)),
            h=jnp.full(No, h, dtype), x0=jnp.asarray(ref.x[0], dtype))
        # Config measured round 5 (success sweep in docs/PERF.md):
        # deeper backtracking (3 grid blocks — the near-boundary steps
        # need alpha below beta^7; one block was the biggest lever,
        # 50% -> 82%), penalty decay 0.5 (an ever-ratcheting warm rho
        # ill-conditions the ticks after the obstacle passes), budget
        # 25. The residual ~14% stationarity plateau (~3e-2 with
        # feasibility ~1e-5 and correct tracking/clearance) is the
        # Gauss-Newton AL Hessian dropping the constraint-curvature
        # term nabla^2 c * lambda on this NONCONVEX constraint — the
        # reference's GN Hessian has the identical structure
        # (knotpoint_data.cpp:549-570), so this is a shared method
        # limitation, not an implementation gap; full Wolfe line
        # search measured WORSE (74.6%) than the Armijo grid here.
        o_opts = dataclasses.replace(
            f32opts,
            iterations_max=int(os.environ.get("ALTRO_BENCH_OBSTACLE_ITERS",
                                              "25")),
            use_backtracking_linesearch=True,
            penalty_warm_start=True,
            penalty_warm_start_decay=0.5,
            parallel_linesearch=True,
            ls_phase_split=True, ls_try_cubic_first=False,
            ls_armijo_only=True, ls_max_iters=24,
            ls_failure_recovery=True, ls_recovery_max_fails=0,
            ls_best_decrease_fallback=True,
            # Relative-KKT stationarity: near the active obstacle the AL
            # penalty escalates rho and the gradient scale with it, so
            # the f32 absolute-residual floor sits above 1e-3 (same
            # failure mode as the quadrotor's, see qopts above).
            tol_stationarity_rel=1e-5,
            pallas_backward=(platform == "tpu"))
        # sliding tracking windows (bench.py methodology)
        xw_o = np.stack([ref.x[t : t + No + 1] for t in range(ONSIM + 1)])
        qs_o = jnp.asarray(-(Qd_o[None, None, :] * xw_o), dtype)
        cs_o_ = 0.5 * np.sum(Qd_o[None, None, :] * xw_o * xw_o, axis=2)
        cs_o_[:, :No] += 0.5 * float(ref.u[0] @ (Rd_o * ref.u[0]))
        cs_o = jnp.asarray(cs_o_, dtype)
        xw0_dev = jnp.asarray(xw_o[:, 0, :2], dtype)  # [ONSIM+1, 2]
        key_o = jax.random.PRNGKey(7)
        ox0 = jnp.asarray(ref.x[0], dtype)[None, :] + 0.02 * jax.random.normal(
            key_o, (Bo, 4), dtype)
        o_states = _binit(o_problem, Bo)
        o_states = dataclasses.replace(
            o_states,
            u=jnp.tile(jnp.asarray([ref.u[0][0], 0.0], dtype), (Bo, No, 1)),
            x=jnp.tile(jnp.asarray(ref.x[: No + 1], dtype), (Bo, 1, 1)))
        o_dyn = o_problem.dynamics

        def o_resolve(x0, q, c, st):
            cost = dataclasses.replace(o_problem.cost, q=q, c=c)
            prob = dataclasses.replace(o_problem, x0=x0, cost=cost)
            return _solve_o(prob, st, o_opts)

        def o_tick(carry, t):
            x_true, states = carry
            q_t = jnp.broadcast_to(qs_o[t], (Bo,) + qs_o[t].shape)
            c_t = jnp.broadcast_to(cs_o[t], (Bo,) + cs_o[t].shape)
            states, stats = jax.vmap(o_resolve)(x_true, q_t, c_t, states)
            u0 = states.u[:, 0]
            x_true = jax.vmap(
                lambda x, u: o_dyn(x, u, jnp.asarray(h, dtype), 0))(x_true, u0)
            states = jax.vmap(_shift_o)(states)
            dist = jnp.sqrt(
                (x_true[:, 0] - c_obs[0]) ** 2
                + (x_true[:, 1] - c_obs[1]) ** 2)
            err = jnp.linalg.norm(
                x_true[:, :2] - xw0_dev[t + 1][None], axis=1)
            return (x_true, states), (stats.status, dist, err)

        @jax.jit
        def o_run(x_true, states):
            (x_true, states), outs = jax.lax.scan(
                o_tick, (x_true, states), jnp.arange(ONSIM))
            return (x_true, states) + outs

        jax.block_until_ready(o_run(ox0, o_states))
        t0 = _to.perf_counter()
        _, _, o_status, o_dist, o_err = jax.block_until_ready(
            o_run(ox0, o_states))
        o_elapsed = _to.perf_counter() - t0
        min_clear = float(jnp.min(o_dist)) - r_obs
        row = {
            "config": f"bicycle_obstacle_mpc_B{Bo}",
            "platform": platform,
            "solves_per_s": round(Bo * ONSIM / o_elapsed, 1),
            "batch_resolve_latency_ms": round(o_elapsed / ONSIM * 1e3, 3),
            "ticks": ONSIM,
            "success_rate": round(float(jnp.mean(o_status == 0)), 4),
            "min_obstacle_clearance": round(min_clear, 4),
            "mean_tracking_error": round(float(jnp.mean(o_err)), 4),
            "obstacle_radius": r_obs,
            # gates: the behavioral contract (clearance + tracking) is
            # primary; the convergence gate sits at the measured f32
            # envelope of the GN method on a nonconvex constraint (see
            # the config note above — ~86% at this budget, plateau
            # shared with the reference's GN Hessian structure)
            # measured 80.5% at B=1024 / 86% at B=256; gate at 0.75
            # leaves run-to-run margin
            "gates_passed": bool(
                min_clear > -0.1
                and float(jnp.mean(o_status == 0)) > 0.75
                and float(jnp.mean(o_err)) < 2.0),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    # 8. Batched SOC rocket landing through vmap(solve) (round-5 VERDICT
    # item 6): the tile-resident fast path does not cover SOC groups, so
    # batched conic workloads take the vmapped scan path — this row pins
    # that fallback's throughput honestly (gap quantified in
    # docs/PERF.md) and proves batched conic solves at scale beyond
    # correctness tests. Reference: SOC machinery cones.cpp:13-123.
    if os.environ.get("ALTRO_BENCH_ROCKET", "1") == "1":
        import time as _tr

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                        "examples"))
        from rocket_landing import build_problem as _rocket_build

        Br = int(os.environ.get("ALTRO_BENCH_ROCKET_BATCH", "1024"))
        r_problem, r_hover = _rocket_build(dtype=dtype)
        # Round-5 continuation sweep (scripts/proto_rocket_tiled.py, TPU,
        # 120-iteration budget, B=1024):
        #   sequential backtracking, slack 0 (old shipped row): 124.7/s @ 75.7%
        #   grid LS, slack 0, vmap(solve):                     2608.7/s @ 76.6%
        #   grid LS, slack 0, solve_tiled:                     3833.3/s @ 71.7%
        #   sequential backtracking, slack 1e-6:               4399.7/s @ 100%
        #   grid LS, slack 1e-6, vmap(solve):                 14733.5/s @ 100%
        #   grid LS, slack 1e-6, solve_tiled:                 19768.2/s @ 100%
        # Two compounding fixes: (1) the grid LS removes the sequential
        # search's lockstep-straggler cost under batching; (2) the
        # Armijo slack removes the f32 accept-test rounding tie that WAS
        # the 24-30% failure tail (and its wasted grind iterations) —
        # full diagnosis in docs/PERF.md round 5 (cont.).
        # ls_armijo_slack=1e-6: near stationarity this workload's Armijo
        # margin (c1*alpha*|dphi0| ~ 4e-10 relative to phi0) is below f32
        # rounding resolution — the accept test degenerates to a
        # summation-order coin flip, which is where BOTH the old 75.7%
        # and the tiled 71.7% ceilings came from. The explicit relative
        # slack resolves the tie deterministically: 100% success both
        # paths at a 40-iteration budget (docs/PERF.md round 5 cont.).
        r_opts = SolverOptions(
            iterations_max=120, penalty_initial=10.0, penalty_scaling=10.0,
            tol_stationarity=1e-3, tol_primal_feasibility=1e-3,
            tol_stationarity_rel=1e-5, ls_armijo_slack=1e-6,
            use_backtracking_linesearch=True, parallel_linesearch=True,
            ls_phase_split=True, ls_grid_x_only=True, ls_armijo_only=True,
            throw_errors=False)
        kr, kv = jax.random.split(jax.random.PRNGKey(0))
        rx0 = r_problem.x0[None, :] + jnp.concatenate(
            [2.0 * jax.random.normal(kr, (Br, 3), dtype),
             0.5 * jax.random.normal(kv, (Br, 3), dtype)], axis=1)
        from altro_tpu.parallel.batch import batch_init_state as _rbinit

        r_states = _rbinit(r_problem, Br)
        r_states = dataclasses.replace(
            r_states, u=jnp.tile(r_hover, (Br, r_problem.N, 1)))

        @jax.jit
        def r_batch(x0s, states):
            return jax.vmap(lambda x0, s: solve(
                dataclasses.replace(r_problem, x0=x0), s, r_opts))(
                    x0s, states)

        jax.block_until_ready(r_batch(rx0, r_states))
        t0 = _tr.perf_counter()
        r_st, r_stats = jax.block_until_ready(r_batch(rx0, r_states))
        r_elapsed = _tr.perf_counter() - t0
        touchdown = float(jnp.mean(jnp.linalg.norm(
            r_st.x[:, r_problem.N, :3], axis=1)))
        row = {
            "config": f"rocket_soc_batched_B{Br}",
            "platform": platform,
            "solves_per_s": round(Br / r_elapsed, 1),
            "success_rate": round(float(jnp.mean(r_stats.status == 0)), 4),
            "mean_iterations": round(float(jnp.mean(r_stats.iterations)), 1),
            "mean_touchdown_m": round(touchdown, 5),
            "note": "grid-LS vmap(solve) + Armijo slack 1e-6; 118x the "
                    "round-5 sequential-LS row at 100% vs 75.7% success "
                    "(see sweep comment)",
        }
        results.append(row)
        print(json.dumps(row), flush=True)

        if os.environ.get("ALTRO_BENCH_ROCKET_TILED", "1") == "1" and (
                platform == "tpu" and Br % 1024 == 0):
            from altro_tpu import tile_solver as _rtsv

            r_axes = dataclasses.replace(
                jax.tree.map(lambda _: False, r_problem), x0=True)
            r_prob_t = _rtsv.tile_problem(
                dataclasses.replace(r_problem, x0=rx0), r_axes)
            r_st_t = _rtsv.state_to_tiles(r_states)
            rt_run = jax.jit(
                lambda s: _rtsv.solve_tiled(r_prob_t, r_axes, s, r_opts))
            jax.block_until_ready(rt_run(r_st_t))
            t0 = _tr.perf_counter()
            rt_st, rt_stats = jax.block_until_ready(rt_run(r_st_t))
            rt_elapsed = _tr.perf_counter() - t0
            rt_stats_b = _rtsv.stats_from_tiles(rt_stats)
            rt_x = _rtsv.tiles_to_batch(rt_st.x)
            row = {
                "config": f"rocket_soc_tiled_B{Br}",
                "platform": platform,
                "solves_per_s": round(Br / rt_elapsed, 1),
                "success_rate": round(
                    float(jnp.mean(rt_stats_b.status == 0)), 4),
                "mean_iterations": round(
                    float(jnp.mean(rt_stats_b.iterations)), 1),
                "mean_touchdown_m": round(float(jnp.mean(jnp.linalg.norm(
                    rt_x[:, r_problem.N, :3], axis=1))), 5),
                "note": "tile-resident solve on the SOC workload (dense "
                        "AL Hessians + conic projections through "
                        "tile_vmap; rollout kernel ineligible for SOC, "
                        "scan grid in-loop)",
            }
            results.append(row)
            print(json.dumps(row), flush=True)

    # 9. Second closed-loop gated workload (round-5 VERDICT item 9):
    # batched pendulum swing-up MPC with the SAME f32/armijo-only/
    # phase-split shortcuts as the headline, gated on terminal swing-up
    # success — pins those shortcuts on a second, dynamically different
    # closed loop (limit-cycle nonlinearity vs path tracking). The f64
    # tick-trace oracle twin lives in tests/test_pendulum_mpc_trace.py.
    if os.environ.get("ALTRO_BENCH_PENDULUM_MPC", "1") == "1":
        import time as _tp

        from altro_tpu.mpc import shift_trajectory as _shift_p
        from altro_tpu.parallel.batch import batch_init_state as _pbinit

        Np, np_, mp_ = 30, 2, 1
        Bp = int(os.environ.get("ALTRO_BENCH_PENDULUM_BATCH", "1024"))
        PNSIM = 80
        hp = 0.06
        xf_p = np.array([np.pi, 0.0])
        Qp = np.tile(np.full(np_, 1e-1), (Np + 1, 1))
        Qp[Np] *= 100.0
        torque_p = ConstraintSpec(
            fn=lambda x, u, k: jnp.concatenate([u - 6.0, -6.0 - u]),
            cone=Cone.NEGATIVE_ORTHANT, dim=2,
            active=jnp.ones(Np + 1, bool).at[Np].set(False),
            label="torque bound", diag_hessian=True, affine=True)
        from altro_tpu.models.tile_steps import midpoint_cols, pendulum_cols

        p_problem = Problem(
            N=Np, n=np_, m=mp_, dynamics=midpoint(pendulum_continuous()),
            dynamics_jac=None, constraints=(torque_p,),
            cost=lqr_cost_from_reference(
                jnp.asarray(Qp, dtype), jnp.full((Np + 1, mp_), 1e-3, dtype),
                jnp.asarray(np.tile(xf_p, (Np + 1, 1)), dtype),
                jnp.zeros((Np + 1, mp_), dtype)),
            h=jnp.full(Np, hp, dtype), x0=jnp.zeros(np_, dtype),
            # batched tiled rollout kernel on the tile-resident path
            dynamics_cols=midpoint_cols(pendulum_cols()))
        p_opts = dataclasses.replace(
            f32opts, iterations_max=10, use_backtracking_linesearch=True,
            penalty_warm_start=True, parallel_linesearch=True,
            ls_phase_split=True, ls_try_cubic_first=False,
            ls_armijo_only=True, ls_max_iters=8,
            ls_failure_recovery=True, ls_recovery_max_fails=0,
            ls_best_decrease_fallback=True,
            pallas_backward=(platform == "tpu"))
        key_p = jax.random.PRNGKey(3)
        px0 = 0.05 * jax.random.normal(key_p, (Bp, np_), dtype)
        p_states = _pbinit(p_problem, Bp)
        p_states = dataclasses.replace(
            p_states, u=jnp.full((Bp, Np, mp_), 0.1, dtype))
        p_dyn = p_problem.dynamics
        pend_tiled = (
            platform == "tpu"
            and os.environ.get("ALTRO_BENCH_PENDULUM_TILED", "1") == "1"
            and Bp % 1024 == 0)

        if pend_tiled:
            # Tile-resident runner + batched rollout kernel (round-5
            # cont.): same structure as the headline/quadrotor loops;
            # the vmap path below stays available via
            # ALTRO_BENCH_PENDULUM_TILED=0.
            from altro_tpu import tile_solver as _ptsv
            from altro_tpu.ops.tile_iter import tile_vmap as _p_tile_vmap

            p_axes = dataclasses.replace(
                p_problem,
                cost=dataclasses.replace(p_problem.cost, Q=False, R=False,
                                         q=False, r=False, c=False),
                h=False, x0=True, A=False, B=False, f_aff=False,
                constraints=(dataclasses.replace(torque_p, active=False),))
            p_dyn_tiled = _p_tile_vmap(
                lambda xk, uk: p_dyn(xk, uk, jnp.asarray(hp, dtype), 0),
                (True, True))

            def p_tick_t(carry, t):
                x_true_t, st_t = carry
                prob_t = dataclasses.replace(p_problem, x0=x_true_t)
                st_t, stats = _ptsv.solve_tiled(prob_t, p_axes, st_t, p_opts)
                u0 = st_t.u[:, 0]
                x_true_t = p_dyn_tiled(x_true_t, u0)
                st_t = _ptsv.shift_trajectory_tiled(st_t)
                return (x_true_t, st_t), (stats.status, stats.iterations)

            @jax.jit
            def p_run(x_true, states):
                x_true_t = _ptsv.batch_to_tiles(x_true)
                st_t = _ptsv.state_to_tiles(states)
                (x_true_t, st_t), outs = jax.lax.scan(
                    p_tick_t, (x_true_t, st_t), jnp.arange(PNSIM))
                return (_ptsv.tiles_to_batch(x_true_t), st_t) + tuple(
                    _ptsv.tiles_to_batch(
                        jnp.swapaxes(o, 0, 1)).swapaxes(0, 1)
                    for o in outs)
        else:
            def p_resolve(x0, st):
                prob = dataclasses.replace(p_problem, x0=x0)
                return solve(prob, st, p_opts)

            def p_tick(carry, t):
                x_true, states = carry
                states, stats = jax.vmap(p_resolve)(x_true, states)
                u0 = states.u[:, 0]
                x_true = jax.vmap(
                    lambda x, u: p_dyn(x, u, jnp.asarray(hp, dtype), 0))(
                        x_true, u0)
                states = jax.vmap(_shift_p)(states)
                return (x_true, states), (stats.status, stats.iterations)

            @jax.jit
            def p_run(x_true, states):
                (x_true, states), outs = jax.lax.scan(
                    p_tick, (x_true, states), jnp.arange(PNSIM))
                return (x_true, states) + outs

        jax.block_until_ready(p_run(px0, p_states))
        t0 = _tp.perf_counter()
        px_f, _, p_status, p_iters = jax.block_until_ready(
            p_run(px0, p_states))
        p_elapsed = _tp.perf_counter() - t0
        up_err = jnp.sqrt(
            (jnp.mod(px_f[:, 0], 2 * np.pi) - np.pi) ** 2
            + 0.1 * px_f[:, 1] ** 2)
        swung_up = float(jnp.mean((up_err < 0.3).astype(jnp.float32)))
        row = {
            "config": f"pendulum_swingup_mpc_B{Bp}",
            "platform": platform,
            "solves_per_s": round(Bp * PNSIM / p_elapsed, 1),
            "ticks": PNSIM,
            "success_rate": round(float(jnp.mean(p_status == 0)), 4),
            "mean_iterations": round(float(jnp.mean(p_iters)), 2),
            "swingup_rate": round(swung_up, 4),
            "gates_passed": bool(
                swung_up > 0.95
                and float(jnp.mean(p_status == 0)) > 0.90),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    # 10. Headline batched MPC — delegate to bench.py's measurement body
    # (child_main, same process: reuses this process's device client and
    # the persistent compile cache; the two-process retry ladder lives in
    # bench.parent_main and is only needed for unattended driver capture)
    import bench

    bench.child_main()


if __name__ == "__main__":
    main()
