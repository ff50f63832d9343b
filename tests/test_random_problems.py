"""Property-style tests: random problems must satisfy KKT conditions at
the reported solution (beyond the reference's golden-value oracles)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from altro_tpu.cones import Cone
from altro_tpu.options import SolverOptions
from altro_tpu.problem import ConstraintSpec, DiagonalCost, Problem
from altro_tpu.solver import init_state, solve
from altro_tpu.status import SolveStatus


def random_problem(seed, N=12, n=4, m=2, constrained=True):
    rng = np.random.default_rng(seed)
    A = np.eye(n) + 0.1 * rng.standard_normal((n, n))
    B = 0.5 * rng.standard_normal((n, m))
    Aj, Bj = jnp.asarray(A), jnp.asarray(B)

    def dyn(x, u, h, k):
        return Aj @ x + Bj @ u

    cost = DiagonalCost(
        Q=jnp.asarray(rng.uniform(0.5, 2.0, (N + 1, n))),
        R=jnp.asarray(rng.uniform(0.05, 0.2, (N + 1, m))),
        q=jnp.asarray(0.1 * rng.standard_normal((N + 1, n))),
        r=jnp.asarray(0.1 * rng.standard_normal((N + 1, m))),
        c=jnp.zeros(N + 1),
    )
    constraints = ()
    if constrained:
        xf = jnp.asarray(rng.uniform(-0.5, 0.5, n))
        constraints = (
            ConstraintSpec(
                fn=lambda x, u, k: x - xf, cone=Cone.ZERO, dim=n,
                active=jnp.zeros(N + 1, bool).at[N].set(True), label="goal",
            ),
        )
    x0 = rng.standard_normal(n)
    return Problem(
        N=N, n=n, m=m, dynamics=dyn, dynamics_jac=None, constraints=constraints,
        cost=cost, h=jnp.full(N, 0.1), x0=jnp.asarray(x0),
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("constrained", [False, True])
def test_kkt_at_solution(seed, constrained):
    problem = random_problem(seed, constrained=constrained)
    opts = SolverOptions(penalty_scaling=100.0, iterations_max=50)
    state, stats = solve(problem, init_state(problem), opts)
    assert int(stats.status) == SolveStatus.SUCCESS
    # KKT: stationarity + primal feasibility at the reported tolerances
    assert float(stats.stationarity) < opts.tol_stationarity
    assert float(stats.primal_feasibility) < opts.tol_primal_feasibility
    # Dynamic feasibility: the trajectory satisfies the dynamics exactly
    # (closed-loop rollout by construction)
    xs, us = state.x, state.u
    for k in range(problem.N):
        np.testing.assert_allclose(
            np.asarray(problem.dyn_step(k, xs[k], us[k])), np.asarray(xs[k + 1]),
            atol=1e-10,
        )
    if constrained:
        np.testing.assert_allclose(
            np.asarray(xs[-1]),
            np.asarray(problem.constraints[0].fn(xs[-1] * 0, None, 0) * -1),
            atol=2e-4,
        )
