"""Stress test: every cone type active simultaneously on one problem.

Double integrator with a terminal equality goal, stage-wise input box
bounds (negative orthant), an SOC thrust-cone on the inputs, and a
per-knot IDENTITY-cone penalty-style constraint — all four reference
cone types in one solve.
"""

import jax
import jax.numpy as jnp
import numpy as np

from altro_tpu.cones import Cone
from altro_tpu.models.double_integrator import double_integrator_dynamics
from altro_tpu.options import SolverOptions
from altro_tpu.problem import ConstraintSpec, DiagonalCost, Problem
from altro_tpu.solver import init_state, solve
from altro_tpu.status import SolveStatus

N, DIM = 12, 2
NX, NU = 2 * DIM, DIM


def test_all_cone_types_together():
    xf = jnp.zeros(NX)
    u_bnd, soc_bnd = 1.5, 1.4
    stage_active = jnp.ones(N + 1, bool).at[N].set(False)
    constraints = (
        ConstraintSpec(
            fn=lambda x, u, k: x - xf, cone=Cone.ZERO, dim=NX,
            active=jnp.zeros(N + 1, bool).at[N].set(True), label="goal",
        ),
        ConstraintSpec(
            fn=lambda x, u, k: jnp.concatenate([u - u_bnd, -u_bnd - u]),
            cone=Cone.NEGATIVE_ORTHANT, dim=2 * NU, active=stage_active,
            label="box",
        ),
        ConstraintSpec(
            fn=lambda x, u, k: jnp.concatenate([u, jnp.full((1,), soc_bnd)]),
            cone=Cone.SECOND_ORDER, dim=NU + 1, active=stage_active,
            label="soc",
        ),
        # IDENTITY cone: projection is the identity, dual cone is the zero
        # cone -> projected duals vanish and the constraint contributes
        # nothing (free constraint); exercises the 4th cone's plumbing.
        ConstraintSpec(
            fn=lambda x, u, k: x[:1], cone=Cone.IDENTITY, dim=1,
            active=jnp.ones(N + 1, bool), label="free",
        ),
    )
    cost = DiagonalCost(
        Q=jnp.ones((N + 1, NX)), R=jnp.full((N + 1, NU), 1e-2),
        q=jnp.zeros((N + 1, NX)), r=jnp.zeros((N + 1, NU)), c=jnp.zeros(N + 1),
    )
    problem = Problem(
        N=N, n=NX, m=NU, dynamics=double_integrator_dynamics(DIM),
        dynamics_jac=None, constraints=constraints, cost=cost,
        h=jnp.full(N, 0.4), x0=jnp.asarray([2.0, 2.0, 0.0, 0.0]),
    )
    opts = SolverOptions(penalty_initial=10.0, penalty_scaling=100.0, iterations_max=40)
    # NOTE: jitted on purpose — eager (op-by-op) execution of this
    # 4-group problem segfaults inside a jnp ufunc on jax 0.9's CPU
    # backend (environment quirk; jit is the supported path).
    fn = jax.jit(lambda s: solve(problem, s, opts))
    state, stats = fn(init_state(problem))
    assert int(stats.status) == SolveStatus.SUCCESS
    assert float(jnp.linalg.norm(state.x[N])) < 1e-3
    us = np.asarray(state.u)
    assert np.abs(us).max() <= u_bnd + 1e-3
    assert np.linalg.norm(us, axis=1).max() <= soc_bnd + 1e-2
    assert float(stats.primal_feasibility) < 1e-4
