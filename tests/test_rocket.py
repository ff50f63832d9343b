"""Rocket soft landing (examples/rocket_landing.py): three simultaneous
SOC groups + a terminal ZERO cone, end to end.

The reference exercises its SECOND_ORDER_CONE machinery on a single
control-norm bound (test/double_integrator_test.cpp:377-492); this pins
the composed case the ALTRO papers' rocket demos use: thrust pointing
cone + thrust ball + glide slope simultaneously active, exact touchdown.
"""

import dataclasses
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

from rocket_landing import build_problem  # noqa: E402

from altro_tpu.options import SolverOptions
from altro_tpu.solver import init_state, solve
from altro_tpu.status import SolveStatus

THETA_MAX_DEG = 25.0
GAMMA_DEG = 45.0


def _solve(N=40, tf=6.0):
    problem, hover = build_problem(N=N, tf=tf, dtype=jnp.float64)
    opts = SolverOptions(
        iterations_max=60, penalty_initial=10.0, penalty_scaling=10.0,
        use_backtracking_linesearch=True, throw_errors=False,
    )
    state = init_state(problem)
    state = dataclasses.replace(state, u=jnp.tile(hover, (problem.N, 1)))
    new_state, stats = jax.jit(lambda s: solve(problem, s, opts))(state)
    return problem, new_state, stats


def test_rocket_landing_converges():
    problem, state, stats = _solve()
    assert int(stats.status) == SolveStatus.SUCCESS
    assert float(stats.primal_feasibility) < 1e-4
    # exact touchdown (terminal ZERO cone); 1e-4 is the reference's own
    # goal-constraint accuracy style (double_integrator_test.cpp:254)
    xN = np.asarray(state.x[problem.N])
    assert np.linalg.norm(xN[:3]) < 1e-4
    assert np.linalg.norm(xN[3:]) < 1e-4


def test_rocket_cones_satisfied_and_active():
    problem, state, stats = _solve()
    u = np.asarray(state.u)
    x = np.asarray(state.x)
    tan_th = np.tan(np.deg2rad(THETA_MAX_DEG))
    tan_ga = np.tan(np.deg2rad(GAMMA_DEG))
    tol = 1e-4
    # thrust pointing cone, magnitude ball, min thrust
    assert np.all(np.linalg.norm(u[:, :2], axis=1) <= tan_th * u[:, 2] + tol)
    assert np.all(np.linalg.norm(u, axis=1) <= 20.0 + tol)
    assert np.all(u[:, 2] >= 2.0 - tol)
    # glide slope along the whole descent
    assert np.all(np.linalg.norm(x[:, :2], axis=1) <= tan_ga * x[:, 2] + tol)
    # the pointing cone is ACTIVE somewhere (the problem is actually
    # constrained, not an unconstrained solve wearing cones)
    ratio = np.linalg.norm(u[:, :2], axis=1) / (tan_th * u[:, 2])
    assert ratio.max() > 0.999


def test_rocket_warm_restart_one_iteration():
    """A re-solve from the converged state terminates immediately."""
    problem, state, stats = _solve()
    opts = SolverOptions(
        iterations_max=60, penalty_initial=10.0, penalty_scaling=10.0,
        use_backtracking_linesearch=True, throw_errors=False,
        penalty_warm_start=True,
    )
    _, stats2 = jax.jit(lambda s: solve(problem, s, opts))(state)
    assert int(stats2.status) == SolveStatus.SUCCESS
    assert int(stats2.iterations) <= 2
