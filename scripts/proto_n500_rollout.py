"""N=500 single-solve measurement: packed backward + packed ROLLOUT.

Measures the scotty_long_horizon_N500 configuration (20 fixed AL-iLQR
iterations, single lane, armijo-only phase-split grid) in three
back-to-back variants on the same process/device:

  scan      — packed backward OFF, rollout kernel OFF (round-2 state)
  backward  — packed backward ON (round-3 state, ~79 ms)
  both      — packed backward ON + packed trial-rollout kernel ON
              (round-4 target: <= 50 ms)

Usage: python scripts/proto_n500_rollout.py [reps]
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import pick_platform


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    platform = pick_platform()
    if platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/jax_cache_altro_proto"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from altro_tpu.io.scotty import load_scotty, synthetic_scotty
    from altro_tpu.models.bicycle import bicycle_continuous
    from altro_tpu.models.integrators import midpoint
    from altro_tpu.models.tile_steps import bicycle_tile, midpoint_tile
    from altro_tpu.options import SolverOptions
    from altro_tpu.problem import Problem, lqr_cost_from_reference
    from altro_tpu.solver import init_state, solve

    dtype = jnp.float32
    N = 500
    try:
        ref = load_scotty()
    except FileNotFoundError:
        ref = synthetic_scotty(N=500)
    h = float(np.float32(ref.tf / ref.N))
    problem = Problem(
        N=N, n=4, m=2, dynamics=midpoint(bicycle_continuous()),
        dynamics_jac=None, constraints=(),
        cost=lqr_cost_from_reference(
            jnp.full((N + 1, 4), 1e-2, dtype),
            jnp.full((N + 1, 2), 1e-3, dtype),
            jnp.asarray(ref.x[: N + 1], dtype),
            jnp.asarray(ref.u[: N + 1], dtype)),
        h=jnp.full(N, h, dtype), x0=jnp.asarray(ref.x[0], dtype),
        dynamics_tile=midpoint_tile(bicycle_tile()))
    def make_state(prob):
        st = init_state(prob)
        return dataclasses.replace(
            st,
            u=jnp.tile(jnp.asarray([ref.u[0][0], 0.0], dtype), (N, 1)),
            x=jnp.asarray(ref.x[: N + 1], dtype))
    base = dict(
        iterations_max=20, tol_stationarity=1e-3,
        tol_primal_feasibility=1e-3, throw_errors=False,
        use_backtracking_linesearch=True, symmetrize_ctg=True,
        parallel_linesearch=True, ls_phase_split=True,
        ls_try_cubic_first=False, ls_armijo_only=True, ls_max_iters=24)

    # Constrained variant (round-5 VERDICT item 2): steering-angle bound
    # riding the packed kernels through the affine AL-term hook
    # (ConstraintSpec.affine; ops/pallas_rollout.py). The reference pays
    # zero structural cost for constraints in its solve loop
    # (solver.cpp:285-316); the "both_bound" row pins this path's cost.
    from altro_tpu.cones import Cone
    from altro_tpu.problem import ConstraintSpec

    delta_max = 60 * np.pi / 180.0
    steering = ConstraintSpec(
        fn=lambda x, u, k: jnp.stack([x[3] - delta_max, -delta_max - x[3]]),
        cone=Cone.NEGATIVE_ORTHANT, dim=2, active=jnp.ones(N + 1, bool),
        label="steering bound", diag_hessian=True, affine=True)
    problem_con = dataclasses.replace(problem, constraints=(steering,))

    variants = [
        ("scan", dict(pallas_latency_backward=False, pallas_rollout=False)),
        ("backward", dict(pallas_latency_backward=True,
                          pallas_rollout=False)),
        ("both", dict(pallas_latency_backward=True, pallas_rollout=True)),
        ("both_bound", dict(pallas_latency_backward=True,
                            pallas_rollout=True)),
        ("scan_bound", dict(pallas_latency_backward=False,
                            pallas_rollout=False)),
    ]
    for label, kw in variants:
        prob = problem_con if label.endswith("_bound") else problem
        opts = SolverOptions(**base, **kw)
        # close over problem/opts exactly like scripts/bench_all.run —
        # problem data bakes into the program as constants; passing the
        # pytree as an argument instead streams it through the remote
        # tunnel EVERY call and dominates the measurement (~60 ms at
        # N=500 — measured round 4)
        fn = jax.jit(lambda s, _p=prob, _o=opts: solve(_p, s, _o))
        state0 = make_state(prob)
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(state0))
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            s, t = jax.block_until_ready(fn(state0))
            ts.append(time.perf_counter() - t0)
        ts = np.sort(np.asarray(ts))

        # DEVICE time via chaining (round 5): a single remote-TPU
        # ("axon") dispatch carries a fixed ~21-24 ms per-call overhead
        # for programs of this size, independent of the computation (a
        # K-chained jit costs overhead + K * device_time). Differencing
        # chained variants isolates the on-device solve time — the
        # number a local-attached deployment would see per solve.
        def chain(K, _p=prob, _o=opts):
            def f(s):
                tot = jnp.asarray(0.0, dtype)
                for i in range(K):
                    p_i = dataclasses.replace(_p, x0=_p.x0 + i * 1e-6)
                    s2, t_i = solve(p_i, s, _o)
                    tot = tot + t_i.objective_value
                return tot
            return jax.jit(f)

        def best_of(f, s, n=5):
            jax.block_until_ready(f(s))
            b = float("inf")
            for _ in range(n):
                t0 = time.perf_counter()
                jax.block_until_ready(f(s))
                b = min(b, time.perf_counter() - t0)
            return b

        t1 = best_of(chain(1), state0)
        t3 = best_of(chain(3), state0)
        device_ms = (t3 - t1) / 2 * 1e3

        print(json.dumps({
            "variant": label,
            "platform": platform,
            "p50_ms": round(float(ts[len(ts) // 2]) * 1e3, 2),
            "min_ms": round(float(ts[0]) * 1e3, 2),
            "device_ms": round(device_ms, 2),
            "objective": round(float(t.objective_value), 2),
            "merit": round(float(t.merit_value), 2),
            "iterations": int(t.iterations),
            "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
