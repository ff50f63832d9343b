"""Tile-resident expansion+backward boundary (ops/tiled_backward.py).

Runs the batched custom_vmap rule through the Pallas interpreter on CPU
(ops/tiled_backward._FORCE_INTERPRET) and checks it against the plain
per-lane solver path — same accepted iterates, iteration counts, and
statuses to f32 tolerance — plus the diagonal expansion fast path and
the fallback conditions.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import altro_tpu.ops.tiled_backward as tbk
from altro_tpu.cones import Cone
from altro_tpu.io.scotty import synthetic_scotty
from altro_tpu.models.bicycle import bicycle_continuous
from altro_tpu.models.integrators import midpoint
from altro_tpu.options import SolverOptions
from altro_tpu.parallel.batch import batch_init_state
from altro_tpu.problem import ConstraintSpec, Problem, lqr_cost_from_reference
from altro_tpu.solver import solve

B = 1024  # one lane tile
N, NX, NU = 6, 4, 2


@pytest.fixture(scope="module")
def problem():
    dtype = jnp.float32
    ref = synthetic_scotty(N=100)
    h = float(np.float32(ref.tf / ref.N))
    cost = lqr_cost_from_reference(
        jnp.asarray(np.full((N + 1, NX), 1e-2), dtype),
        jnp.asarray(np.full((N + 1, NU), 1e-3), dtype),
        jnp.asarray(ref.x[: N + 1], dtype),
        jnp.asarray(ref.u[: N + 1], dtype),
    )
    delta_max = 60 * np.pi / 180.0
    steering = ConstraintSpec(
        fn=lambda x, u, k: jnp.stack([x[3] - delta_max, -delta_max - x[3]]),
        cone=Cone.NEGATIVE_ORTHANT, dim=2, active=jnp.ones(N + 1, bool),
        label="steer", diag_hessian=True,
    )
    return Problem(
        N=N, n=NX, m=NU, dynamics=midpoint(bicycle_continuous()),
        dynamics_jac=None, constraints=(steering,), cost=cost,
        h=jnp.full(N, h, dtype), x0=jnp.asarray(ref.x[0], dtype),
    ), ref


def _batched_solve(problem, ref, opts):
    dtype = jnp.float32
    states0 = batch_init_state(problem, B)
    key = jax.random.PRNGKey(0)
    x0s = jnp.asarray(ref.x[0], dtype)[None] + 0.02 * jax.random.normal(
        key, (B, NX), dtype
    )
    q = jnp.broadcast_to(problem.cost.q, (B,) + problem.cost.q.shape)
    c = jnp.broadcast_to(problem.cost.c, (B,) + problem.cost.c.shape)

    def one(x0, qi, ci, st):
        cost = dataclasses.replace(problem.cost, q=qi, c=ci)
        prob = dataclasses.replace(problem, x0=x0, cost=cost)
        return solve(prob, st, opts)

    return jax.jit(jax.vmap(one))(x0s, q, c, states0)


BASE = dict(
    iterations_max=4, use_backtracking_linesearch=True,
    parallel_linesearch=True, ls_phase_split=True, ls_try_cubic_first=False,
    ls_max_iters=8, tol_stationarity=1e-3, tol_primal_feasibility=1e-3,
    throw_errors=False, penalty_warm_start=True,
)


@pytest.fixture(scope="module")
def solved(problem):
    """Solve the batch once per variant (plain / tiled / tiled+diag)."""
    problem, ref = problem
    tbk._FORCE_INTERPRET = True
    try:
        out = {
            "plain": _batched_solve(problem, ref, SolverOptions(**BASE)),
            "tiled": _batched_solve(
                problem, ref,
                SolverOptions(**BASE, pallas_backward=True,
                              pallas_tile_resident=True),
            ),
            "diag": _batched_solve(
                problem, ref,
                SolverOptions(**BASE, pallas_backward=True,
                              pallas_tile_resident=True, diag_expansion=True),
            ),
        }
    finally:
        tbk._FORCE_INTERPRET = False
    return out


def test_tiled_boundary_matches_plain_path(solved):
    s_ref, st_ref = solved["plain"]
    s_t, st_t = solved["tiled"]
    assert bool(jnp.all(st_ref.iterations == st_t.iterations))
    assert bool(jnp.all(st_ref.status == st_t.status))
    np.testing.assert_allclose(np.asarray(s_ref.u), np.asarray(s_t.u), atol=2e-5)
    np.testing.assert_allclose(np.asarray(s_ref.x), np.asarray(s_t.x), atol=2e-5)


def test_tiled_diag_expansion_matches_dense(solved):
    s_d, st_d = solved["diag"]
    s_t, st_t = solved["tiled"]
    assert bool(jnp.all(st_d.iterations == st_t.iterations))
    np.testing.assert_allclose(np.asarray(s_d.u), np.asarray(s_t.u), atol=2e-5)


def test_unbatched_path_is_plain_solver(problem):
    """Per-lane (unbatched) boundary == the non-Pallas solver, bitwise."""
    problem, ref = problem
    from altro_tpu.solver import init_state

    st0 = init_state(problem)
    sA, stA = solve(problem, st0, SolverOptions(**BASE))
    sB, stB = solve(
        problem, st0,
        SolverOptions(**BASE, pallas_backward=True, pallas_tile_resident=True),
    )
    assert int(stA.iterations) == int(stB.iterations)
    assert float(jnp.max(jnp.abs(sA.u - sB.u))) == 0.0


def test_fallback_on_non_tile_batch(problem):
    """Batch not a multiple of 1024 -> vmapped per-lane fallback (still
    correct)."""
    problem, ref = problem
    dtype = jnp.float32
    Bs = 8
    states0 = batch_init_state(problem, Bs)
    x0s = jnp.tile(jnp.asarray(ref.x[0], dtype), (Bs, 1))
    opts = SolverOptions(**BASE, pallas_backward=True, pallas_tile_resident=True)

    def one(x0, st):
        return solve(dataclasses.replace(problem, x0=x0), st, opts)

    s, st = jax.jit(jax.vmap(one))(x0s, states0)
    assert bool(jnp.all(jnp.isfinite(s.u)))
