"""Native full AL-iLQR solver vs. the reference iteration-count oracles.

The dependency-free C++ engine (native/altro_solver_native.cpp) must
reproduce the same exact behavior as the JAX solver on the
double-integrator suite: goal-constrained in 3 iterations, inequality
control bounds in 5 (double_integrator_test.cpp:255,374).
"""

import numpy as np
import pytest

from altro_tpu import native
from altro_tpu.cones import Cone

pytestmark = pytest.mark.skipif(not native.is_available(), reason="no C++ toolchain")

N, DIM = 10, 2
NX, NU = 2 * DIM, DIM
H = 0.5


def dyn(x, u, h, k):
    b = h * h / 2.0
    return np.concatenate([x[:DIM] + x[DIM:] * h + u * b, x[DIM:] + u * h])


def jac(x, u, h, k):
    b = h * h / 2.0
    J = np.zeros((NX, NX + NU))
    J[:NX, :NX] = np.eye(NX)
    for i in range(DIM):
        J[i, DIM + i] = h
        J[i, NX + i] = b
        J[DIM + i, NX + i] = h
    return J


def cost_arrays():
    Qd = np.ones((N + 1, NX))
    Rd = np.full((N + 1, NU), 1e-2)
    q = np.zeros((N + 1, NX))
    r = np.zeros((N + 1, NU))
    c = np.zeros(N + 1)
    return Qd, Rd, q, r, c


def goal_constraint():
    from altro_tpu.native.solver import NativeConstraint

    active = np.zeros(N + 1, bool)
    active[N] = True
    return NativeConstraint(
        fn=lambda x, u, k: x,
        jac=lambda x, u, k: np.hstack([np.eye(NX), np.zeros((NX, NU))]),
        cone=Cone.ZERO, dim=NX, active=active,
    )


def bound_constraint(u_bnd=1.0):
    from altro_tpu.native.solver import NativeConstraint

    active = np.ones(N + 1, bool)
    active[N] = False
    Jc = np.zeros((2 * NU, NX + NU))
    Jc[:NU, NX:] = np.eye(NU)
    Jc[NU:, NX:] = -np.eye(NU)
    return NativeConstraint(
        fn=lambda x, u, k: np.concatenate([u - u_bnd, -u_bnd - u]),
        jac=lambda x, u, k: Jc,
        cone=Cone.NEGATIVE_ORTHANT, dim=2 * NU, active=active,
    )


def test_native_goal_constrained_3_iterations():
    from altro_tpu.native.solver import solve_native

    x, u, stats = solve_native(
        NX, NU, N, dyn, jac, *cost_arrays(), np.full(N, H),
        np.array([1.0, 2.0, 0.0, 0.0]),
        constraints=[goal_constraint()],
        penalty_scaling=100.0,
    )
    assert stats.status == 0
    assert stats.iterations == 3
    assert np.linalg.norm(x[N]) < 1e-4


def test_native_control_bounds_5_iterations():
    from altro_tpu.native.solver import solve_native

    x, u, stats = solve_native(
        NX, NU, N, dyn, jac, *cost_arrays(), np.full(N, H),
        np.array([2.0, 2.0, 0.0, 0.0]),
        constraints=[goal_constraint(), bound_constraint(1.0)],
        penalty_initial=100.0, penalty_scaling=100.0,
    )
    assert stats.status == 0
    assert stats.iterations == 5
    assert np.linalg.norm(x[N]) < 1e-4
    np.testing.assert_allclose(u[0], [-1.0, -1.0], atol=1e-4)


def test_native_matches_jax_solution():
    """Native and JAX solvers agree on the solution trajectory."""
    import dataclasses

    import jax.numpy as jnp

    from altro_tpu.native.solver import solve_native
    from altro_tpu.options import SolverOptions
    from altro_tpu.solver import init_state, solve

    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_solver_double_integrator import goal_constraint as jgoal, make_problem

    xn, un, stats_n = solve_native(
        NX, NU, N, dyn, jac, *cost_arrays(), np.full(N, H),
        np.array([1.0, 2.0, 0.0, 0.0]),
        constraints=[goal_constraint()], penalty_scaling=100.0,
    )
    problem = make_problem([1.0, 2.0, 0.0, 0.0], (jgoal(np.zeros(NX)),))
    state, stats_j = solve(problem, init_state(problem),
                           SolverOptions(penalty_scaling=100.0))
    assert stats_n.iterations == int(stats_j.iterations) == 3
    np.testing.assert_allclose(xn, np.asarray(state.x), atol=1e-8)
    np.testing.assert_allclose(un, np.asarray(state.u), atol=1e-8)
