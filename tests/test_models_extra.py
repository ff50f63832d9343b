"""End-to-end solves on the extra models (cartpole, quadrotor) and the
iteration-callback hook."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from altro_tpu.models.cartpole import cartpole_continuous
from altro_tpu.models.integrators import midpoint, rk4
from altro_tpu.models.quadrotor import quadrotor_continuous
from altro_tpu.options import SolverOptions
from altro_tpu.problem import Problem, lqr_cost_from_reference
from altro_tpu.solver import init_state, solve
from altro_tpu.status import SolveStatus


def test_quadrotor_waypoint():
    """Hover -> waypoint with the 12-state quadrotor."""
    N, n, m = 40, 12, 4
    f = quadrotor_continuous()
    hover = 0.5 * 9.81 / 4.0  # thrust per rotor at hover (mass 0.5)
    xf = np.zeros(n)
    xf[:3] = [1.0, 0.0, 1.0]
    Qd = np.tile(np.concatenate([np.full(3, 1.0), np.full(3, 0.1), np.full(6, 0.1)]), (N + 1, 1))
    Qd[N] *= 10
    cost = lqr_cost_from_reference(
        jnp.asarray(Qd), jnp.full((N + 1, m), 1e-2),
        jnp.tile(jnp.asarray(xf), (N + 1, 1)), jnp.full((N + 1, m), hover),
    )
    problem = Problem(
        N=N, n=n, m=m, dynamics=rk4(f), dynamics_jac=None, constraints=(),
        cost=cost, h=jnp.full(N, 0.05), x0=jnp.zeros(n),
    )
    state = init_state(problem)
    state = dataclasses.replace(state, u=jnp.full((N, m), hover))
    state, stats = solve(
        problem, state, SolverOptions(iterations_max=60, tol_stationarity=1e-3)
    )
    assert int(stats.status) == SolveStatus.SUCCESS
    pos_err = float(jnp.linalg.norm(state.x[-1, :3] - jnp.asarray(xf[:3])))
    assert pos_err < 0.2
    assert bool(jnp.all(jnp.isfinite(state.x)))


def test_cartpole_swing_up():
    N, n, m = 100, 4, 1
    f = cartpole_continuous()
    xf = np.array([0.0, np.pi, 0.0, 0.0])
    Qd = np.tile(np.full(n, 1e-2), (N + 1, 1))
    Qd[N] = [10.0, 400.0, 10.0, 10.0]
    cost = lqr_cost_from_reference(
        jnp.asarray(Qd), jnp.full((N + 1, m), 1e-3),
        jnp.tile(jnp.asarray(xf), (N + 1, 1)), jnp.zeros((N + 1, m)),
    )
    problem = Problem(
        N=N, n=n, m=m, dynamics=rk4(f), dynamics_jac=None, constraints=(),
        cost=cost, h=jnp.full(N, 0.05), x0=jnp.zeros(n),
    )
    state = init_state(problem)
    state = dataclasses.replace(state, u=jnp.full((N, m), 0.2))
    state, stats = solve(
        problem, state,
        SolverOptions(iterations_max=300, use_backtracking_linesearch=True),
    )
    # Underactuated swing-up converges slowly; the solution is what counts
    theta_N = float(state.x[-1, 1])
    assert abs(theta_N - np.pi) < 0.05
    assert abs(float(state.x[-1, 0])) < 0.1
    assert bool(jnp.all(jnp.isfinite(state.x)))


def test_iteration_callback():
    from test_solver_double_integrator import goal_constraint, make_problem, NX

    seen = []

    def cb(it, phi, stat, feas, alpha, rho):
        seen.append((int(it), float(phi)))

    problem = make_problem([1.0, 2.0, 0.0, 0.0], (goal_constraint(np.zeros(NX)),))
    opts = SolverOptions(penalty_scaling=100.0, iteration_callback=cb)
    state, stats = solve(problem, init_state(problem), opts)
    assert int(stats.status) == SolveStatus.SUCCESS
    assert len(seen) == int(stats.iterations) == 3
    assert [s[0] for s in seen] == [0, 1, 2]


def test_quadrotor_analytic_jacobians_match_autodiff():
    """quadrotor_jacobians (hand-derived, scalar-form) equals jacfwd of
    the model to roundoff — an independent oracle for the scalar-form
    rewrite of the dynamics (the TPU-dense formulation, see module doc)."""
    import jax

    from altro_tpu.models.quadrotor import quadrotor_jacobians

    f = quadrotor_continuous()
    jac = quadrotor_jacobians()
    key = jax.random.PRNGKey(7)
    for _ in range(10):
        k1, k2, key = jax.random.split(key, 3)
        x = 0.7 * jax.random.normal(k1, (12,))
        u = 2.4 + 0.5 * jax.random.normal(k2, (4,))
        Aa, Ba = jac(x, u)
        Aj = jax.jacfwd(f)(x, u)
        Bj = jax.jacfwd(f, argnums=1)(x, u)
        np.testing.assert_allclose(np.asarray(Aa), np.asarray(Aj), rtol=0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(Ba), np.asarray(Bj), rtol=0, atol=1e-12)
