"""The wired status surface (round-5 VERDICT item 7).

The reference DECLARES SolveStatus::MaxObjectiveExceeded /
StateOutOfBounds / InputOutOfBounds (typedefs.hpp:22-24) and
AltroOptions::max_state_value / max_input_value
(solver_options.hpp:28-29) but never assigns/reads them; its
MeritFunctionGradientTooSmall early-out (solver.cpp:242-245) is treated
as benign by the loop (solver.cpp:451) and never reaches stats.status.
Here every one of those statuses is real and observable, and the
backward-pass fail knot (tvlqr.cpp:162-164's error message) is a
first-class stat (SolveStats.bp_fail_index).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from altro_tpu.models.double_integrator import double_integrator_dynamics
from altro_tpu.options import SolverOptions
from altro_tpu.problem import DiagonalCost, Problem
from altro_tpu.solver import init_state, solve
from altro_tpu.status import SolveStatus

N, DIM = 10, 2
NX, NU = 2 * DIM, DIM
H = 0.5


def make_problem(x0=(1.0, 2.0, 0.0, 0.0), r=1e-2):
    cost = DiagonalCost(
        Q=jnp.ones((N + 1, NX)),
        R=jnp.full((N + 1, NU), r),
        q=jnp.zeros((N + 1, NX)),
        r=jnp.zeros((N + 1, NU)),
        c=jnp.zeros(N + 1),
    )
    return Problem(
        N=N, n=NX, m=NU,
        dynamics=double_integrator_dynamics(DIM), dynamics_jac=None,
        constraints=(),
        cost=cost, h=jnp.full(N, H), x0=jnp.asarray(x0),
    )


def test_merit_gradient_too_small_status():
    """A lane pinned at |dphi0| < tol_meritfun_gradient keeps iterating
    (reference solver.cpp:451 loop semantics) and ends with the
    MERIT_FUN_GRADIENT_TOO_SMALL status instead of a bare
    MAX_ITERATIONS."""
    problem = make_problem()
    opts = SolverOptions(
        iterations_max=3,
        tol_meritfun_gradient=1e10,  # every gradient counts as too small
        tol_stationarity=1e-12,      # and nothing converges
        throw_errors=False,
    )
    _, stats = solve(problem, init_state(problem), opts)
    assert int(stats.status) == SolveStatus.MERIT_FUN_GRADIENT_TOO_SMALL
    # benign: the loop was NOT aborted by it
    assert int(stats.iterations) == 3
    assert float(stats.alpha) == 0.0


def test_merit_gradient_status_clears_on_real_step():
    """Not sticky: a solve whose later iterations take real steps must
    not report MFGTS from an early grad-small iteration."""
    problem = make_problem()
    opts = SolverOptions(iterations_max=10, throw_errors=False)
    _, stats = solve(problem, init_state(problem), opts)
    assert int(stats.status) in (
        SolveStatus.SUCCESS, SolveStatus.MAX_ITERATIONS
    )


def test_max_objective_exceeded():
    problem = make_problem()
    opts = SolverOptions(
        iterations_max=10, max_objective_value=1e-6,
        tol_stationarity=0.0, throw_errors=False
    )
    _, stats = solve(problem, init_state(problem), opts)
    assert int(stats.status) == SolveStatus.MAX_OBJECTIVE_EXCEEDED
    assert int(stats.iterations) == 1  # stops immediately


def test_state_out_of_bounds():
    problem = make_problem()
    opts = SolverOptions(
        iterations_max=10, max_state_value=0.5,
        tol_stationarity=0.0, throw_errors=False
    )
    _, stats = solve(problem, init_state(problem), opts)
    assert int(stats.status) == SolveStatus.STATE_OUT_OF_BOUNDS
    assert int(stats.iterations) == 1


def test_input_out_of_bounds():
    problem = make_problem()
    opts = SolverOptions(
        iterations_max=10, max_input_value=1e-7,
        tol_stationarity=0.0, throw_errors=False
    )
    _, stats = solve(problem, init_state(problem), opts)
    assert int(stats.status) == SolveStatus.INPUT_OUT_OF_BOUNDS
    assert int(stats.iterations) == 1


def test_guards_off_by_default():
    """inf defaults compile the guards out: same solve as before."""
    problem = make_problem()
    _, stats = solve(problem, init_state(problem),
                     SolverOptions(iterations_max=10, throw_errors=False))
    assert int(stats.status) == SolveStatus.SUCCESS


def test_bp_fail_index_ok_is_N():
    problem = make_problem()
    _, stats = solve(problem, init_state(problem),
                     SolverOptions(iterations_max=3, throw_errors=False))
    assert int(stats.bp_fail_index) == N


def test_bp_fail_index_reports_failing_knot():
    """Indefinite Quu (negative R) with retries disabled: the backward
    pass fails, the status is BACKWARD_PASS_FAILED, and bp_fail_index
    reports the smallest failing knot (0: every knot's Quu is
    indefinite). The reference reports the same knot in its thrown
    message (tvlqr.cpp:162-164)."""
    problem = make_problem(r=-1.0)
    opts = SolverOptions(
        iterations_max=5, reg_initial=0.0, reg_max_retries=0,
        throw_errors=False,
    )
    _, stats = solve(problem, init_state(problem), opts)
    assert int(stats.status) == SolveStatus.BACKWARD_PASS_FAILED
    assert int(stats.bp_fail_index) == 0


def test_api_merit_gradient_too_small_is_benign():
    """throw_errors must NOT raise on MERIT_FUN_GRADIENT_TOO_SMALL
    (reference solver.cpp:451 returns NoError through it)."""
    from altro_tpu.api import ALTROSolver

    solver = ALTROSolver(N)
    solver.set_dimension(NX, NU)
    solver.set_time_step(H)
    dyn = double_integrator_dynamics(DIM)
    solver.set_explicit_dynamics(lambda x, u, h, k: dyn(x, u, h, k))
    solver.set_lqr_cost(
        np.ones(NX), np.full(NU, 1e-2), np.zeros(NX), np.zeros(NU)
    )
    solver.set_initial_state([1.0, 2.0, 0.0, 0.0])
    solver.initialize()
    solver.set_options(SolverOptions(
        iterations_max=2, tol_meritfun_gradient=1e10,
        tol_stationarity=1e-12, throw_errors=True,
    ))
    status = solver.solve()  # must not raise
    assert status == SolveStatus.MERIT_FUN_GRADIENT_TOO_SMALL
