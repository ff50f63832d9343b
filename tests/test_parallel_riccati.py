"""Associative-scan Riccati / rollout vs. the serial lax.scan versions.

The parallel-in-time construction is validated against the serial
recursion at every horizon length the reference tests use (SURVEY §7.4:
"validate against serial scan at every horizon length used in tests"),
including cross terms lux, linear terms, and affine dynamics offsets.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from altro_tpu.options import SolverOptions
from altro_tpu.solver import init_state, solve
from altro_tpu.status import SolveStatus
from altro_tpu.tvlqr import (
    tvlqr_backward,
    tvlqr_backward_associative,
    tvlqr_forward,
    tvlqr_forward_associative,
)

from test_tvlqr import double_integrator_problem


def random_lqr(N, n, m, seed=0, with_cross=True, with_affine=True):
    rng = np.random.default_rng(seed)
    A = np.tile(np.eye(n), (N, 1, 1)) + 0.05 * rng.standard_normal((N, n, n))
    B = 0.3 * rng.standard_normal((N, n, m))
    f = 0.1 * rng.standard_normal((N, n)) if with_affine else np.zeros((N, n))
    Qs = []
    for k in range(N + 1):
        W = rng.standard_normal((n, n))
        Qs.append(W @ W.T / n + np.eye(n))
    lxx = np.stack(Qs)
    Rs = []
    for k in range(N):
        W = rng.standard_normal((m, m))
        Rs.append(W @ W.T / m + np.eye(m))
    luu = np.stack(Rs)
    lux = 0.05 * rng.standard_normal((N, m, n)) if with_cross else np.zeros((N, m, n))
    lx = rng.standard_normal((N + 1, n))
    lu = rng.standard_normal((N, m))
    return tuple(jnp.asarray(a) for a in (A, B, f, lxx, luu, lux, lx, lu))


@pytest.mark.parametrize("N", [1, 2, 3, 10, 50])
def test_backward_equivalence(N):
    args = random_lqr(N, n=4, m=2, seed=N)
    gs = tvlqr_backward(*args)
    gp = tvlqr_backward_associative(*args)
    assert bool(gs.ok) and bool(gp.ok)
    np.testing.assert_allclose(gp.P, np.asarray(gs.P), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(gp.p, np.asarray(gs.p), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(gp.K, np.asarray(gs.K), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(gp.d, np.asarray(gs.d), rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(gp.delta_V, np.asarray(gs.delta_V), rtol=1e-8, atol=1e-9)


def test_backward_golden_double_integrator():
    A, B, f, lxx, luu, lux, lx, lu, x0 = double_integrator_problem()
    gp = tvlqr_backward_associative(A, B, f, lxx, luu, lux, lx, lu)
    gs = tvlqr_backward(A, B, f, lxx, luu, lux, lx, lu)
    np.testing.assert_allclose(gp.K, np.asarray(gs.K), atol=1e-9)
    np.testing.assert_allclose(gp.d, np.asarray(gs.d), atol=1e-9)


def test_forward_equivalence():
    args = random_lqr(20, n=4, m=2, seed=7)
    g = tvlqr_backward(*args)
    A, B, f = args[:3]
    x0 = jnp.asarray(np.random.default_rng(1).standard_normal(4))
    xs, us, ys = tvlqr_forward(A, B, f, g.K, g.d, g.P, g.p, x0)
    xp, up, yp = tvlqr_forward_associative(A, B, f, g.K, g.d, g.P, g.p, x0)
    np.testing.assert_allclose(xp, np.asarray(xs), rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(up, np.asarray(us), rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(yp, np.asarray(ys), rtol=1e-10, atol=1e-10)


def test_solver_with_parallel_riccati():
    """Full goal-constrained double-integrator solve with the parallel
    backward pass reproduces the serial solve's 3-iteration oracle."""
    from test_solver_double_integrator import NX, goal_constraint, make_problem

    problem = make_problem([1.0, 2.0, 0.0, 0.0], (goal_constraint(np.zeros(NX)),))
    opts = SolverOptions(penalty_scaling=100.0, parallel_riccati=True)
    state, stats = solve(problem, init_state(problem), opts)
    assert int(stats.status) == SolveStatus.SUCCESS
    assert int(stats.iterations) == 3
    assert float(jnp.linalg.norm(state.x[-1])) < 1e-4
