"""Pendulum swing-up tests.

Oracles from /root/reference/test/pendulum_test.cpp (midpoint dynamics
goldens; unconstrained terminal-state golden to 1e-5 in <= 10 iterations;
goal-constrained dist < 1e-4 in <= 10) and the staged AL progression from
/root/reference/src/altro/solver/test/alilqr_test.cpp (merit golden,
constraint violation shrinking per dual/penalty round).

The reference stores timesteps as float32 (SetTimeStep(float h)); h here
is float64(float32(tf/N)) to match goldens bit-for-bit.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from altro_tpu.cones import Cone
from altro_tpu.linesearch import LineSearchOptions, wolfe_line_search
from altro_tpu.models.integrators import midpoint
from altro_tpu.models.pendulum import pendulum_continuous
from altro_tpu.options import SolverOptions
from altro_tpu.problem import ConstraintSpec, Problem, lqr_cost_from_reference
from altro_tpu.solver import (
    al_expansions,
    al_total_cost,
    init_state,
    merit_function,
    open_loop_rollout,
    solve,
)
from altro_tpu.status import SolveStatus
from altro_tpu.tvlqr import tvlqr_backward


def f32(x):
    return float(np.float32(x))


def make_problem(N, tf, constraints=(), q_term_weight=1.0):
    n, m = 2, 1
    h = f32(tf / N)
    xf = np.array([np.pi, 0.0])
    Qd = np.concatenate([np.full((N, n), 1e-2), np.full((1, n), q_term_weight)])
    Rd = np.full((N + 1, m), 1e-3)
    cost = lqr_cost_from_reference(Qd, Rd, np.tile(xf, (N + 1, 1)), np.zeros((N + 1, m)))
    dyn = midpoint(pendulum_continuous())
    return Problem(
        N=N, n=n, m=m, dynamics=dyn, dynamics_jac=None, constraints=constraints,
        cost=cost, h=jnp.full(N, h), x0=jnp.zeros(n),
    )


def goal_constraint(N, xf):
    xf = jnp.asarray(xf)
    active = jnp.zeros(N + 1, bool).at[N].set(True)
    # Reference formulation: c = xf - x with Jacobian -I (pendulum_test.cpp:160-172)
    return ConstraintSpec(
        fn=lambda x, u, k: xf - x, cone=Cone.ZERO, dim=2, active=active, label="goal"
    )


def test_midpoint_dynamics_golden():
    """pendulum_test.cpp:14-43."""
    dyn = midpoint(pendulum_continuous())
    x = jnp.asarray([0.1, -0.4])
    u = jnp.asarray([1.34])
    h = f32(0.05)
    xn = dyn(x, u, h, 0)
    np.testing.assert_allclose(
        xn, [0.08445158545673655, -0.21395149094594346], atol=1e-6
    )
    Jx = jax.jacfwd(dyn, argnums=0)(x, u, h, 0)
    Ju = jax.jacfwd(dyn, argnums=1)(x, u, h, 0)
    J = np.hstack([np.asarray(Jx), np.asarray(Ju)])
    J_expected = np.array(
        [
            [0.9755975228465564, 0.0495, 0.005000000000000001],
            [-0.967268640223389, 0.9557742592228808, 0.198],
        ]
    )
    np.testing.assert_allclose(J, J_expected, atol=1e-6)


def test_unconstrained_swing_up():
    """pendulum_test.cpp:45-115: terminal-state golden, <= 10 iterations."""
    problem = make_problem(N=50, tf=3.0)
    state = init_state(problem)
    state = dataclasses.replace(state, u=jnp.full_like(state.u, 0.1))
    state, stats = solve(problem, state, SolverOptions(iterations_max=20))
    assert int(stats.status) == SolveStatus.SUCCESS
    xN_expected = [3.12099917161669, 0.0011966258762942175]
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(state.x[-1]) - xN_expected), 0, atol=1e-5
    )
    assert int(stats.iterations) <= 10


def test_goal_constrained_swing_up():
    """pendulum_test.cpp:117-203: dist < 1e-4 in <= 10 iterations."""
    N = 20
    problem = make_problem(N=N, tf=2.0, constraints=(goal_constraint(N, [np.pi, 0.0]),))
    state = init_state(problem)
    state = dataclasses.replace(state, u=jnp.full_like(state.u, 0.1))
    state, stats = solve(problem, state, SolverOptions(iterations_max=100))
    assert int(stats.status) == SolveStatus.SUCCESS
    dist = float(jnp.linalg.norm(state.x[-1] - jnp.asarray([np.pi, 0.0])))
    assert dist < 1e-4
    assert int(stats.iterations) <= 10


class TestStagedAL:
    """alilqr_test.cpp: drive inner iLQR rounds and AL updates manually."""

    def inner_round(self, problem, x, u, z, rho, iters=6):
        ls_opts = LineSearchOptions(c1=1e-4, c2=0.1, try_cubic_first=True)

        @jax.jit
        def step(x, u, z, rho):
            """One full inner iteration, jitted (compiled once, reused
            across all iterations and AL rounds)."""
            A, B, lx, lu, lxx, luu, lux = al_expansions(problem, x, u, z, rho)
            gains = tvlqr_backward(
                A, B, jnp.zeros_like(lx[:-1]), lxx, luu, lux, lx, lu
            )

            def merit_full(alpha):
                out = merit_function(
                    problem, x, u, gains.K, gains.d, gains.P, gains.p, z, rho,
                    alpha, problem.x0, True,
                )
                return out.phi, out.dphi

            phi0, dphi0 = merit_full(0.0)
            res = wolfe_line_search(
                merit_full, lambda a: merit_full(a)[0], phi0, dphi0, 1.0, ls_opts
            )
            m = merit_function(
                problem, x, u, gains.K, gains.d, gains.P, gains.p, z, rho,
                res.alpha, problem.x0, True,
            )
            return gains.ok, dphi0, m

        m = None
        for _ in range(iters):
            ok, dphi0, m_new = step(x, u, z, rho)
            assert bool(ok)
            if abs(float(dphi0)) < 1e-8:
                break  # converged: the trial step is discarded, as before
            m = m_new
            x, u = m.x, m.u
        return x, u, m

    def test_staged_rounds(self):
        N = 20
        problem = make_problem(N=N, tf=2.0, constraints=(goal_constraint(N, [np.pi, 0.0]),))
        xf = jnp.asarray([np.pi, 0.0])
        u = jnp.full((N, 1), 0.1)
        x = open_loop_rollout(problem, u)
        z = problem.init_duals()
        rho = jnp.asarray(1.0)

        # Initial merit golden (alilqr_test.cpp:119-123)
        phi0 = al_total_cost(problem, x, u, z, rho)
        np.testing.assert_allclose(float(phi0), 10.632455092693577, atol=1e-3)

        # Round 1: 6 inner iterations -> viol golden (alilqr_test.cpp:138-153)
        x, u, m = self.inner_round(problem, x, u, z, rho)
        dist0 = float(jnp.linalg.norm(x[-1] - xf))
        np.testing.assert_allclose(dist0, 0.04186387, atol=1e-3)

        # Dual + penalty update, round 2 -> viol < viol0 / 5
        z = tuple(
            jnp.where(spec.active[:, None], zp, zj)
            for spec, zp, zj in zip(problem.constraints, m.zproj, z)
        )
        rho = rho * 10.0
        x, u, m = self.inner_round(problem, x, u, z, rho)
        dist1 = float(jnp.linalg.norm(x[-1] - xf))
        assert dist1 < dist0 / 5

        # Dual update + penalty x100, round 3 -> viol < 1e-4
        z = tuple(
            jnp.where(spec.active[:, None], zp, zj)
            for spec, zp, zj in zip(problem.constraints, m.zproj, z)
        )
        rho = rho * 100.0
        x, u, m = self.inner_round(problem, x, u, z, rho)
        dist2 = float(jnp.linalg.norm(x[-1] - xf))
        assert dist2 < 1e-4
