"""Two-tier failed-lane rescue for batched MPC resolves.

After a standard-budget batched resolve, lanes whose status is not
SUCCESS are re-solved from their carried (post-solve) state at a bigger
budget (more iterations, unlimited line-search recovery, best-decrease
fallback) — gated on a SCALAR any-lane-failed predicate via `lax.cond`,
so ticks with no failures pay nothing. Healthy lanes keep their primary
state bit-for-bit (per-lane merge); rescued lanes carry the rescued
state forward, which also kills closed-loop failure cascades.

Measured on the headline Scotty workload (B=2048, 200 ticks, TPU v5e;
docs/PERF.md round 5 + cont.): 98.55% -> 99.62% per-resolve success at
3.03M resolves/s (rescue budget 10, unlimited recovery, batched
rollout kernel era; the tail saturates at ~99.65% by budget 12).
Failures
cluster per tick (168/200 ticks have none), which is what makes the
cond gating effective; per-lane compaction does NOT apply (the hard
ticks fail on most or all lanes at once — see the PERF analysis).

Reference oracle being chased: the C++ reference converges 200/200
resolves on its single-lane f64 MPC trace at an 80-iteration budget
(/root/reference/test/bicycle_test.cpp:302-337).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from altro_tpu.options import SolverOptions
from altro_tpu.problem import Problem
from altro_tpu.solver import SolverState, SolveStats, solve

__all__ = ["rescue_options", "solve_tiled_with_rescue", "vmap_solve_with_rescue"]


def rescue_options(opts: SolverOptions,
                   iterations_max: int = 10,
                   recovery_max_fails: int = 0) -> SolverOptions:
    """The measured-best second-tier options derived from the primary
    ones: bigger budget, unlimited line-search failure recovery,
    widened final-step acceptance, penalty warm-started from the failed
    lane's escalated rho. (Deeper per-iteration grids and penalty
    boosts both measured WORSE — docs/PERF.md round 5.)"""
    return opts.replace(
        iterations_max=iterations_max,
        ls_failure_recovery=True,
        ls_recovery_max_fails=recovery_max_fails,
        ls_best_decrease_fallback=True,
        penalty_warm_start=True,
    )


def solve_tiled_with_rescue(
    problem_t: Problem,
    prob_axes: Problem,
    state_t: SolverState,
    opts: SolverOptions,
    opts_rescue: SolverOptions,
) -> Tuple[SolverState, SolveStats]:
    """Tile-resident batched solve + conditional failed-lane rescue.

    Same signature/layout contract as `tile_solver.solve_tiled`; the
    returned stats merge the rescue per lane (iterations are summed for
    rescued lanes, statuses/state taken from the rescue).
    """
    from altro_tpu import tile_solver as tsv

    st_t, stats = tsv.solve_tiled(problem_t, prob_axes, state_t, opts)
    failed = stats.status != 0

    def do_rescue(st_in):
        st_r, stats_r = tsv.solve_tiled(
            problem_t, prob_axes, st_in, opts_rescue)
        st_m = jax.tree.map(
            lambda r, m: tsv._lane_where(failed, r, m)
            if r.ndim >= 3 else jnp.where(failed, r, m),
            st_r, st_in)
        stats_m = jax.tree.map(
            lambda r, m: jnp.where(failed, r, m), stats_r, stats)
        stats_m = dataclasses.replace(
            stats_m,
            iterations=stats.iterations + jnp.where(
                failed, stats_r.iterations, 0))
        return st_m, stats_m

    def no_rescue(st_in):
        return st_in, stats

    return jax.lax.cond(jnp.any(failed), do_rescue, no_rescue, st_t)


def vmap_solve_with_rescue(
    problem: Problem,
    x0_batch: jnp.ndarray,
    state_batch: SolverState,
    opts: SolverOptions,
    opts_rescue: SolverOptions,
) -> Tuple[SolverState, SolveStats]:
    """Batch-major twin: `jax.vmap(solve)` + conditional lane rescue.

    `problem` holds shared (unbatched) data; per-lane initial states
    ride x0_batch [B, n] and state_batch (leaves [B, ...]).
    """
    B = x0_batch.shape[0]

    def one(x0, st, o):
        return solve(dataclasses.replace(problem, x0=x0), st, o)

    states, stats = jax.vmap(lambda x0, st: one(x0, st, opts))(
        x0_batch, state_batch)
    failed = stats.status != 0

    def do_rescue(st_in):
        st_r, stats_r = jax.vmap(lambda x0, st: one(x0, st, opts_rescue))(
            x0_batch, st_in)
        st_m = jax.tree.map(
            lambda r, m: jnp.where(
                failed.reshape((B,) + (1,) * (r.ndim - 1)), r, m),
            st_r, st_in)
        stats_m = jax.tree.map(
            lambda r, m: jnp.where(failed, r, m), stats_r, stats)
        stats_m = dataclasses.replace(
            stats_m,
            iterations=stats.iterations + jnp.where(
                failed, stats_r.iterations, 0))
        return st_m, stats_m

    def no_rescue(st_in):
        return st_in, stats

    return jax.lax.cond(jnp.any(failed), do_rescue, no_rescue, states)
