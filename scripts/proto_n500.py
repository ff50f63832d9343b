"""N=500 long-horizon single-solve attack (VERDICT r3 item 4).

Measures the scotty_long_horizon_N500 bench row (20 fixed AL-iLQR
iterations, single lane) under candidate levers:

  * scan unroll factor sweep (ALTRO_SCAN_UNROLL) — amortizes XLA
    while-loop trip overhead over more tiny step bodies;
  * component attribution: backward-pass-only and rollout-only loops at
    the same unroll, to show what the sequential chain is made of.

Usage: python scripts/proto_n500.py [UNROLL ...]   (default sweep)
Each unroll value runs in-process; fresh closures force a re-trace so
the env-read unroll factor takes effect.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import pick_platform


def main():
    sweep = [int(a) for a in sys.argv[1:]] or [5, 10, 20, 25]
    platform = pick_platform()
    if platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_cache_altro_proto"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from altro_tpu.io.scotty import load_scotty, synthetic_scotty
    from altro_tpu.models.bicycle import bicycle_continuous
    from altro_tpu.models.integrators import midpoint
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
            jnp.full((N + 1, 4), 1e-2, dtype), jnp.full((N + 1, 2), 1e-3, dtype),
            jnp.asarray(ref.x[: N + 1], dtype), jnp.asarray(ref.u[: N + 1], dtype),
        ),
        h=jnp.full(N, h, dtype), x0=jnp.asarray(ref.x[0], dtype),
    )
    state0 = init_state(problem)
    state0 = dataclasses.replace(
        state0,
        u=jnp.tile(jnp.asarray([ref.u[0][0], 0.0], dtype), (N, 1)),
        x=jnp.asarray(ref.x[: N + 1], dtype),
    )
    opts = SolverOptions(
        iterations_max=20, tol_stationarity=1e-3, tol_primal_feasibility=1e-3,
        throw_errors=False, use_backtracking_linesearch=True,
        symmetrize_ctg=True, parallel_linesearch=True, ls_phase_split=True,
        ls_try_cubic_first=False, ls_max_iters=24,
    )

    def timeit(fn, *args, reps=5):
        jax.block_until_ready(fn(*args))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1e3

    results = []
    for unroll in sweep:
        os.environ["ALTRO_SCAN_UNROLL"] = str(unroll)

        # full solve (fresh closure -> fresh trace -> env re-read)
        full = jax.jit(lambda s, _u=unroll: solve(problem, s, opts))
        t_full = timeit(full, state0)

        # attribution: 20 backward passes alone / 20 grid rollouts alone
        from altro_tpu.solver import (
            _cost_expansions_and_cost,
            dynamics_expansions,
            merit_rollout_phi_x,
        )
        from altro_tpu.tvlqr import tvlqr_backward

        def bw_only(s, _u=unroll):
            lx, lu, lxx, luu, lux, phi0 = _cost_expansions_and_cost(
                problem, s.x, s.u, s.z, s.rho)
            A, B = dynamics_expansions(problem, s.x, s.u)
            f0 = jnp.zeros_like(A[..., 0])

            def it(c, _):
                g = tvlqr_backward(A, B, f0, lxx, luu, lux, lx * (1 + 1e-12 * c),
                                   lu, 0.0, symmetrize=True)
                return c + 1e-12 * g.delta_V[0], g.K[0, 0, 0]

            c, ks = jax.lax.scan(it, jnp.asarray(0.0, dtype), None, length=20)
            return c + jnp.sum(ks)

        def roll_only(s, _u=unroll):
            alphas = 0.5 ** jnp.arange(8, dtype=dtype)

            def it(c, _):
                phis, xs = jax.vmap(
                    lambda a: merit_rollout_phi_x(
                        problem, s.x, s.u, s.K, s.d, s.z, s.rho,
                        a * (1 + 1e-12 * c), problem.x0)
                )(alphas)
                return c + 1e-12 * jnp.sum(phis), xs[0, 0, 0]

            c, xs = jax.lax.scan(it, jnp.asarray(0.0, dtype), None, length=20)
            return c + jnp.sum(xs)

        t_bw = timeit(jax.jit(bw_only), state0)
        t_roll = timeit(jax.jit(roll_only), state0)
        results.append({
            "unroll": unroll, "full_solve_ms": round(t_full, 2),
            "bw20_ms": round(t_bw, 2), "grid_rollouts20_ms": round(t_roll, 2),
        })
        print(json.dumps(results[-1]), flush=True)

    # ---- backward-pass variants at the default unroll ------------------
    os.environ["ALTRO_SCAN_UNROLL"] = "5"
    from altro_tpu.solver import (
        _cost_expansions_and_cost as _cec,
        _cost_expansions_and_cost_diag as _cecd,
        dynamics_expansions as _dyn,
    )
    from altro_tpu.tvlqr import tvlqr_backward as _bw
    from altro_tpu.tvlqr import tvlqr_backward_associative as _bwa

    def make_bw20(kind):
        def fn(s):
            if kind.startswith("diag"):
                lx, lu, lxx, luu, lux, _ = _cecd(problem, s.x, s.u, s.z, s.rho)
            else:
                lx, lu, lxx, luu, lux, _ = _cec(problem, s.x, s.u, s.z, s.rho)
            A, B = _dyn(problem, s.x, s.u)
            f0 = jnp.zeros_like(A[..., 0])

            def it(c, _):
                lxc = lx * (1 + 1e-12 * c)
                if kind == "assoc":
                    g = _bwa(A, B, f0, lxx, luu, lux, lxc, lu, 0.0)
                else:
                    g = _bw(A, B, f0, lxx, luu, lux, lxc, lu, 0.0,
                            symmetrize=kind.endswith("sym"))
                return c + 1e-12 * g.delta_V[0], g.K[0, 0, 0]

            c, ks = jax.lax.scan(it, jnp.asarray(0.0, dtype), None, length=20)
            return c + jnp.sum(ks)

        return jax.jit(fn)

    variants = {}
    for kind in ("dense_sym", "dense_nosym", "diag_sym", "diag_nosym", "assoc"):
        variants[f"bw20_{kind}_ms"] = round(timeit(make_bw20(kind), state0), 2)
        print(json.dumps({kind: variants[f"bw20_{kind}_ms"]}), flush=True)

    print(json.dumps({"platform": platform, "N": N, "results": results,
                      "bw_variants": variants}))


if __name__ == "__main__":
    main()
