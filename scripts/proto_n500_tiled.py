"""N=500 long-horizon solves through the tile-resident batched path.

The serial per-lane N=500 row costs ~197 ms for ONE solve (20 fixed
iterations). The tiled path runs 1024 lanes whose per-knot kernel cost
is nearly flat in batch — so (a) BATCHED long-horizon solves should be
dramatically cheaper per solve, and (b) even a SINGLE solve padded to a
tile may beat the serial scan if the tiled iteration's sequential chain
is cheaper than 500 XLA scan steps. Quality guard: the tiled kernel now
supports in-kernel cost-to-go symmetrization (the long-horizon f32
stabilizer); lane 0 carries the unperturbed problem so its objective is
directly comparable to the serial row's.

Usage: python scripts/proto_n500_tiled.py
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# The compile fix that landed this row (round 4): the default scan
# unroll of 5-6 multiplies every sequential body at N=500 and pushed
# the cold compile past 30 minutes through the remote toolchain;
# unroll=1 is runtime-neutral here and compiles in minutes.
os.environ.setdefault("ALTRO_SCAN_UNROLL", "1")

from bench import pick_platform


def main():
    platform = pick_platform()
    if platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_cache_altro_proto"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from altro_tpu import tile_solver as tsv
    from altro_tpu.io.scotty import load_scotty, synthetic_scotty
    from altro_tpu.models.bicycle import bicycle_continuous
    from altro_tpu.models.integrators import midpoint
    from altro_tpu.options import SolverOptions
    from altro_tpu.parallel.batch import batch_init_state
    from altro_tpu.problem import Problem, lqr_cost_from_reference
    from altro_tpu.solver import total_cost

    dtype = jnp.float32
    N, B = 500, 1024
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
    rng = np.random.default_rng(0)
    # lane 0 unperturbed (comparable to the single-solve row); others jittered
    pert = 0.01 * rng.standard_normal((B, 4))
    pert[0] = 0.0
    x0b = jnp.asarray(ref.x[0][None, :] + pert, dtype)
    states = batch_init_state(problem, B)
    states = dataclasses.replace(
        states,
        u=jnp.tile(jnp.asarray([ref.u[0][0], 0.0], dtype), (B, N, 1)),
        x=jnp.tile(jnp.asarray(ref.x[: N + 1], dtype), (B, 1, 1)),
        z=(),
    )
    prob_axes = dataclasses.replace(
        problem,
        cost=dataclasses.replace(problem.cost, Q=False, R=False, q=False,
                                 r=False, c=False),
        h=False, x0=True, A=False, B=False, f_aff=False, constraints=(),
    )

    st_t0 = tsv.state_to_tiles(states)
    x0_t = tsv.batch_to_tiles(x0b)
    prob_t = dataclasses.replace(problem, x0=x0_t)

    def timeit(fn, *args, reps=3):
        out = jax.block_until_ready(fn(*args))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1e3, out

    for sym in (True, False):
        opts = SolverOptions(
            iterations_max=20, tol_stationarity=1e-3,
            tol_primal_feasibility=1e-3, throw_errors=False,
            use_backtracking_linesearch=True, parallel_linesearch=True,
            ls_phase_split=True, ls_try_cubic_first=False,
            ls_armijo_only=True, ls_grid_x_only=True,
            ls_max_iters=int(os.environ.get("N500_LS_ITERS", "8")),
            symmetrize_ctg=sym,
        )
        run = jax.jit(lambda s: tsv.solve_tiled(prob_t, prob_axes, s, opts))
        ms, (st_t, stats_t) = timeit(run, st_t0)
        st = tsv.state_from_tiles(st_t)
        stats = tsv.stats_from_tiles(stats_t)
        obj0 = float(total_cost(problem, st.x[0], st.u[0]))
        objs = jax.vmap(lambda x, u: total_cost(problem, x, u))(st.x, st.u)
        print(json.dumps({
            "cfg": f"tiled_B1024_sym={sym}",
            "batch_ms": round(ms, 1),
            "per_solve_us": round(ms * 1e3 / B, 1),
            "lane0_objective": round(obj0, 2),
            "mean_objective": round(float(jnp.mean(objs)), 2),
            "mean_iters": round(float(jnp.mean(stats.iterations)), 2),
        }), flush=True)


if __name__ == "__main__":
    main()
