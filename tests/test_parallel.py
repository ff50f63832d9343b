"""Batch/vmap and mesh-sharding equivalence tests.

What the reference never needed (single-threaded CPU) and the TPU design
must guarantee: batch-of-1 == unbatched, vmapped lanes == per-lane
solves, and an 8-virtual-device shard_map == the single-device vmap.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from altro_tpu.options import SolverOptions
from altro_tpu.parallel.batch import batch_init_state, batched_tracking_solver, vmap_solve
from altro_tpu.parallel.mesh import make_mesh, sharded_tracking_solver
from altro_tpu.solver import init_state, solve
from altro_tpu.status import SolveStatus

from test_solver_double_integrator import goal_constraint, make_problem, NX


def di_problem():
    return make_problem([1.0, 2.0, 0.0, 0.0], (goal_constraint(np.zeros(NX)),))


OPTS = SolverOptions(penalty_scaling=100.0)


def x0_batch(batch):
    base = jnp.asarray([1.0, 2.0, 0.0, 0.0])
    deltas = jnp.linspace(-0.5, 0.5, batch)[:, None] * jnp.asarray([1.0, -1.0, 0.0, 0.0])
    return base[None, :] + deltas


def test_vmap_matches_single():
    problem = di_problem()
    batch = 4
    x0s = x0_batch(batch)
    runner = vmap_solve(problem, OPTS)
    states = batch_init_state(problem, batch)
    out_states, out_stats = runner(x0s, states)

    solve_one = jax.jit(
        lambda x0: solve(
            dataclasses.replace(problem, x0=x0),
            init_state(dataclasses.replace(problem, x0=x0)),
            OPTS,
        )
    )
    for i in range(batch):
        st_i, stats_i = solve_one(x0s[i])
        assert int(out_stats.status[i]) == int(stats_i.status) == SolveStatus.SUCCESS
        assert int(out_stats.iterations[i]) == int(stats_i.iterations)
        np.testing.assert_allclose(out_states.x[i], st_i.x, atol=1e-9)
        np.testing.assert_allclose(out_states.u[i], st_i.u, atol=1e-9)


def test_sharded_matches_vmap():
    assert jax.device_count() >= 8, "conftest should provide 8 virtual devices"
    problem = di_problem()
    batch = 8
    x0s = x0_batch(batch)
    q = jnp.broadcast_to(problem.cost.q, (batch,) + problem.cost.q.shape)
    c = jnp.broadcast_to(problem.cost.c, (batch,) + problem.cost.c.shape)
    states = batch_init_state(problem, batch)

    mesh = make_mesh(8)
    sharded = sharded_tracking_solver(problem, mesh, OPTS)
    u0_s, state_s, stats_s, agg = sharded(x0s, q, c, states)

    runner = batched_tracking_solver(problem, OPTS)
    u0_v, state_v, stats_v = runner(x0s, q, c, states)

    np.testing.assert_allclose(np.asarray(u0_s), np.asarray(u0_v), atol=1e-9)
    np.testing.assert_allclose(np.asarray(state_s.x), np.asarray(state_v.x), atol=1e-9)
    np.testing.assert_array_equal(np.asarray(stats_s.status), np.asarray(stats_v.status))
    assert int(agg["num_success"]) == batch
    assert float(agg["max_feasibility"]) < 1e-4


def test_failed_lane_does_not_poison_batch():
    """A lane with an absurd initial state must not break the others."""
    problem = di_problem()
    batch = 4
    x0s = x0_batch(batch).at[2].set(jnp.asarray([1e8, 1e8, 1e8, 1e8]))
    runner = vmap_solve(problem, OPTS)
    states = batch_init_state(problem, batch)
    out_states, out_stats = runner(x0s, states)
    for i in [0, 1, 3]:
        assert int(out_stats.status[i]) == SolveStatus.SUCCESS
        assert bool(jnp.all(jnp.isfinite(out_states.x[i])))
