"""Auxiliary subsystems: implicit dynamics, checkpoint/resume, profiling,
determinism (the reference's missing aux surface, SURVEY §5)."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from altro_tpu.checkpoint import load_state, save_state
from altro_tpu.implicit import implicit_dynamics, implicit_midpoint_residual
from altro_tpu.models.integrators import midpoint
from altro_tpu.models.pendulum import pendulum_continuous
from altro_tpu.options import SolverOptions
from altro_tpu.problem import Problem, lqr_cost_from_reference
from altro_tpu.profiling import benchmark_solves
from altro_tpu.solver import init_state, solve
from altro_tpu.status import SolveStatus


class TestImplicitDynamics:
    def test_newton_converges_to_residual_zero(self):
        f = pendulum_continuous()
        step, jac = implicit_dynamics(implicit_midpoint_residual(f))
        x = jnp.asarray([0.3, -0.2])
        u = jnp.asarray([0.5])
        x2 = step(x, u, 0.05, 0)
        r = x2 - x - 0.05 * f(0.5 * (x + x2), u)
        assert float(jnp.abs(r).max()) < 1e-12

    def test_ift_jacobian_matches_finite_diff(self):
        f = pendulum_continuous()
        step, jac = implicit_dynamics(implicit_midpoint_residual(f))
        x = jnp.asarray([0.3, -0.2])
        u = jnp.asarray([0.5])
        J = np.asarray(jac(x, u, 0.05, 0))
        eps = 1e-7
        for i in range(2):
            dx = jnp.zeros(2).at[i].set(eps)
            fd = (np.asarray(step(x + dx, u, 0.05, 0)) - np.asarray(step(x - dx, u, 0.05, 0))) / (2 * eps)
            np.testing.assert_allclose(J[:, i], fd, atol=1e-6)
        du = jnp.asarray([eps])
        fd = (np.asarray(step(x, u + du, 0.05, 0)) - np.asarray(step(x, u - du, 0.05, 0))) / (2 * eps)
        np.testing.assert_allclose(J[:, 2], fd, atol=1e-6)

    def test_solve_with_implicit_dynamics(self):
        """Pendulum swing-up through the implicit midpoint rule."""
        N, n, m = 30, 2, 1
        f = pendulum_continuous()
        step, jac = implicit_dynamics(implicit_midpoint_residual(f))
        xf = np.array([np.pi, 0.0])
        Qd = np.concatenate([np.full((N, n), 1e-2), np.full((1, n), 1.0)])
        Rd = np.full((N + 1, m), 1e-3)
        cost = lqr_cost_from_reference(Qd, Rd, np.tile(xf, (N + 1, 1)), np.zeros((N + 1, m)))
        problem = Problem(
            N=N, n=n, m=m, dynamics=step, dynamics_jac=jac, constraints=(),
            cost=cost, h=jnp.full(N, 0.1), x0=jnp.zeros(n),
        )
        state = init_state(problem)
        state = dataclasses.replace(state, u=jnp.full_like(state.u, 0.1))
        state, stats = solve(problem, state, SolverOptions(iterations_max=30))
        assert int(stats.status) == SolveStatus.SUCCESS
        assert abs(float(state.x[-1, 0]) - np.pi) < 0.2


def _small_solved_state():
    from test_solver_double_integrator import goal_constraint, make_problem, NX

    problem = make_problem([1.0, 2.0, 0.0, 0.0], (goal_constraint(np.zeros(NX)),))
    opts = SolverOptions(penalty_scaling=100.0)
    state, stats = solve(problem, init_state(problem), opts)
    return problem, state, opts


class TestCheckpoint:
    def test_roundtrip_and_resume(self, tmp_path):
        problem, state, opts = _small_solved_state()
        path = str(tmp_path / "state.npz")
        save_state(path, state)
        restored = load_state(path)
        for f_ in ["x", "u", "y", "K", "d", "P", "p"]:
            np.testing.assert_array_equal(
                np.asarray(getattr(restored, f_)), np.asarray(getattr(state, f_))
            )
        # Resuming from the checkpoint warm-starts identically to resuming
        # from the in-memory state.
        s1, st1 = solve(problem, restored, opts)
        s2, st2 = solve(problem, state, opts)
        assert int(st1.iterations) == int(st2.iterations)
        np.testing.assert_allclose(np.asarray(s1.x), np.asarray(s2.x), atol=0)


class TestDeterminism:
    def test_bitwise_identical_reruns(self):
        problem, _, opts = _small_solved_state()
        s1, _ = solve(problem, init_state(problem), opts)
        s2, _ = solve(problem, init_state(problem), opts)
        np.testing.assert_array_equal(np.asarray(s1.x), np.asarray(s2.x))
        np.testing.assert_array_equal(np.asarray(s1.u), np.asarray(s2.u))


class TestProfiling:
    def test_benchmark_harness(self):
        problem, state, opts = _small_solved_state()
        fn = jax.jit(lambda s: solve(problem, s, opts))
        stats = benchmark_solves(fn, state, batch=1, iters=3)
        assert stats["p50_ms"] > 0
        assert stats["solves_per_s"] > 0
