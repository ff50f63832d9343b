"""End-to-end double integrator solves.

Oracles re-hosted from /root/reference/test/double_integrator_test.cpp:
goal-constrained converges in EXACTLY 3 iterations to dist < 1e-4;
inequality control bounds in 5 (saturated at -u_bnd); SOC control bound
in 9 (saturated in norm). These pin the full AL-iLQR loop: merit values,
line search trial counts, and the adaptive dual/penalty triggers.
"""

import jax.numpy as jnp
import numpy as np

from altro_tpu.cones import Cone
from altro_tpu.models.double_integrator import double_integrator_dynamics
from altro_tpu.options import SolverOptions
from altro_tpu.problem import ConstraintSpec, DiagonalCost, Problem
from altro_tpu.solver import init_state, solve, total_cost
from altro_tpu.status import SolveStatus

N, DIM = 10, 2
NX, NU = 2 * DIM, DIM
H = 0.5  # tf=5, N=10


def make_problem(x0, constraints=()):
    cost = DiagonalCost(
        Q=jnp.ones((N + 1, NX)),
        R=jnp.full((N + 1, NU), 1e-2),
        q=jnp.zeros((N + 1, NX)),
        r=jnp.zeros((N + 1, NU)),
        c=jnp.zeros(N + 1),
    )
    return Problem(
        N=N, n=NX, m=NU,
        dynamics=double_integrator_dynamics(DIM), dynamics_jac=None,
        constraints=constraints,
        cost=cost, h=jnp.full(N, H), x0=jnp.asarray(x0),
    )


def goal_constraint(xf):
    xf = jnp.asarray(xf)
    active = jnp.zeros(N + 1, bool).at[N].set(True)
    return ConstraintSpec(
        fn=lambda x, u, k: x - xf, cone=Cone.ZERO, dim=NX, active=active,
        label="goal",
    )


def control_bounds(u_bnd):
    active = jnp.ones(N + 1, bool).at[N].set(False)
    return ConstraintSpec(
        fn=lambda x, u, k: jnp.concatenate([u - u_bnd, -u_bnd - u]),
        cone=Cone.NEGATIVE_ORTHANT, dim=2 * NU, active=active,
        label="control bounds",
    )


def soc_control_bound(u_bnd):
    active = jnp.ones(N + 1, bool).at[N].set(False)
    return ConstraintSpec(
        fn=lambda x, u, k: jnp.concatenate([u, jnp.full((1,), u_bnd)]),
        cone=Cone.SECOND_ORDER, dim=NU + 1, active=active,
        label="soc bound",
    )


def test_dynamics_golden():
    """double_integrator_test.cpp:35-67."""
    dyn = double_integrator_dynamics(DIM)
    x = jnp.asarray([0.1, 0.2, 0.3, 0.4])
    u = jnp.asarray([10.1, -20.4])
    xn = dyn(x, u, 0.01, 0)
    expected = [0.10350500000000001, 0.20298000000000002, 0.40099999999999997, 0.19600000000000004]
    np.testing.assert_allclose(xn, expected, atol=1e-8)


def test_unconstrained():
    """double_integrator_test.cpp:69-168: progress toward goal in <= 3 iters."""
    x0 = [1.0, 2.0, 0.0, 0.0]
    problem = make_problem(x0)
    state, stats = solve(problem, init_state(problem), SolverOptions(iterations_max=3))
    assert int(stats.status) == SolveStatus.SUCCESS
    dist = float(jnp.linalg.norm(state.x[N]))
    assert dist < np.linalg.norm(x0)
    assert dist > 1e-3


def test_goal_constraint():
    """double_integrator_test.cpp:170-256: dist < 1e-4 in exactly 3 iters."""
    x0 = [1.0, 2.0, 0.0, 0.0]
    problem = make_problem(x0, (goal_constraint(np.zeros(NX)),))
    opts = SolverOptions(penalty_scaling=100.0)
    state, stats = solve(problem, init_state(problem), opts)
    assert int(stats.status) == SolveStatus.SUCCESS
    assert float(jnp.linalg.norm(state.x[N])) < 1e-4
    assert int(stats.iterations) == 3


def test_control_bounds():
    """double_integrator_test.cpp:258-375: saturation at -u_bnd, 5 iters."""
    x0 = [2.0, 2.0, 0.0, 0.0]
    problem = make_problem(x0, (goal_constraint(np.zeros(NX)), control_bounds(1.0)))
    opts = SolverOptions(penalty_initial=100.0, penalty_scaling=100.0)
    state, stats = solve(problem, init_state(problem), opts)
    assert int(stats.status) == SolveStatus.SUCCESS
    assert float(jnp.linalg.norm(state.x[N])) < 1e-4
    np.testing.assert_allclose(state.u[0], [-1.0, -1.0], atol=1e-4)
    assert int(stats.iterations) == 5


def test_soc_control_bound():
    """double_integrator_test.cpp:377-492: ||u0|| == u_bnd to 1e-2, 9 iters."""
    x0 = [2.0, 2.0, 0.0, 0.0]
    problem = make_problem(x0, (goal_constraint(np.zeros(NX)), soc_control_bound(1.0)))
    opts = SolverOptions(penalty_initial=1.0, penalty_scaling=100.0)
    state, stats = solve(problem, init_state(problem), opts)
    assert int(stats.status) == SolveStatus.SUCCESS
    assert float(jnp.linalg.norm(state.x[N])) < 1e-4
    np.testing.assert_allclose(float(jnp.linalg.norm(state.u[0])), 1.0, atol=1e-2)
    assert int(stats.iterations) == 9


def test_relative_stationarity_tolerance():
    """SolverOptions.tol_stationarity_rel (no reference analog).

    With a large cost scale in f32, the max-norm KKT residual has a
    roundoff floor proportional to the gradient scale, so a small
    absolute tolerance can never be met even at the exact optimum; the
    relative criterion accepts. Default (0.0) must preserve the
    absolute-only behavior (the exact-iteration oracles above pin that).
    """
    x0 = [1.0, 2.0, 0.0, 0.0]
    scale = 1e4
    cost = DiagonalCost(
        Q=jnp.full((N + 1, NX), scale, jnp.float32),
        R=jnp.full((N + 1, NU), 1e-2 * scale, jnp.float32),
        q=jnp.zeros((N + 1, NX), jnp.float32),
        r=jnp.zeros((N + 1, NU), jnp.float32),
        c=jnp.zeros(N + 1, jnp.float32),
    )
    problem = Problem(
        N=N, n=NX, m=NU,
        dynamics=double_integrator_dynamics(DIM), dynamics_jac=None,
        constraints=(),
        cost=cost, h=jnp.full(N, H, jnp.float32),
        x0=jnp.asarray(x0, jnp.float32),
    )
    # Absolute-only: the f32 residual floor (~ eps * scale) sits far
    # above 1e-3, so the solve exhausts iterations_max. The reported
    # status is MERIT_FUN_GRADIENT_TOO_SMALL when the final iteration's
    # merit gradient sat below tol_meritfun_gradient (the LQR step has
    # long since converged numerically — exactly why it can't progress),
    # else MAX_ITERATIONS.
    abs_opts = SolverOptions(
        iterations_max=15, tol_stationarity=1e-3, throw_errors=False
    )
    _, stats_abs = solve(problem, init_state(problem), abs_opts)
    assert int(stats_abs.status) in (
        SolveStatus.MAX_ITERATIONS,
        SolveStatus.MERIT_FUN_GRADIENT_TOO_SMALL,
    )
    assert int(stats_abs.iterations) == 15
    assert float(stats_abs.stationarity) > 1e-3

    # Relative criterion: same problem converges (LQR: one iteration).
    rel_opts = SolverOptions(
        iterations_max=15, tol_stationarity=1e-3, tol_stationarity_rel=1e-5,
        throw_errors=False,
    )
    _, stats_rel = solve(problem, init_state(problem), rel_opts)
    assert int(stats_rel.status) == SolveStatus.SUCCESS
    assert int(stats_rel.iterations) <= 3
