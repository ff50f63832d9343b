"""Two-tier failed-lane rescue (altro_tpu/rescue.py).

Contract: healthy lanes keep their primary-solve state BIT-FOR-BIT;
failed lanes are re-solved at the rescue budget and take the rescued
state/status; a batch with zero failures takes the no-rescue branch
(identical output). The bench headline uses the tiled variant
(docs/PERF.md round 5: 98.56% -> 99.62% at B=2048).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from altro_tpu.cones import Cone
from altro_tpu.models.integrators import midpoint
from altro_tpu.models.pendulum import pendulum_continuous
from altro_tpu.options import SolverOptions
from altro_tpu.parallel.batch import batch_init_state
from altro_tpu.problem import ConstraintSpec, Problem, lqr_cost_from_reference
from altro_tpu.rescue import rescue_options, vmap_solve_with_rescue
from altro_tpu.solver import solve
from altro_tpu.status import SolveStatus

N, NX, NU = 30, 2, 1
B = 8


def _problem():
    xf = np.array([np.pi, 0.0])
    Qd = np.tile(np.full(NX, 1e-1), (N + 1, 1))
    Qd[N] *= 100.0
    torque = ConstraintSpec(
        fn=lambda x, u, k: jnp.concatenate([u - 6.0, -6.0 - u]),
        cone=Cone.NEGATIVE_ORTHANT, dim=2,
        active=jnp.ones(N + 1, bool).at[N].set(False),
        label="torque", diag_hessian=True, affine=True)
    return Problem(
        N=N, n=NX, m=NU, dynamics=midpoint(pendulum_continuous()),
        dynamics_jac=None, constraints=(torque,),
        cost=lqr_cost_from_reference(
            jnp.asarray(Qd), jnp.full((N + 1, NU), 1e-3),
            jnp.asarray(np.tile(xf, (N + 1, 1))),
            jnp.zeros((N + 1, NU))),
        h=jnp.full(N, 0.06), x0=jnp.zeros(NX))


def _batch(problem):
    # half the lanes sit AT the upright equilibrium with zero torque
    # (converge immediately), half at the hard hanging state with a
    # poor guess (need many more iterations than the small budget)
    easy = np.tile([np.pi, 0.0], (B // 2, 1))
    hard = np.tile([0.0, 0.0], (B // 2, 1))
    x0b = jnp.asarray(np.concatenate([easy, hard]), problem.x0.dtype)
    states = batch_init_state(problem, B)
    u0 = np.concatenate([
        np.zeros((B // 2, N, NU)), np.full((B // 2, N, NU), 0.1)])
    states = dataclasses.replace(
        states, u=jnp.asarray(u0, problem.x0.dtype))
    return x0b, states


OPTS = SolverOptions(
    iterations_max=3, tol_stationarity=1e-3, tol_primal_feasibility=1e-3,
    throw_errors=False, use_backtracking_linesearch=True,
    parallel_linesearch=True, ls_phase_split=True, ls_try_cubic_first=False,
    ls_armijo_only=True, ls_max_iters=8)


def test_rescue_fixes_hard_lanes_keeps_easy_bitwise():
    problem = _problem()
    x0b, states = _batch(problem)
    opts_rescue = rescue_options(OPTS, iterations_max=40)

    # primary-only run (for the bitwise contract on healthy lanes)
    def one(x0, st):
        return solve(dataclasses.replace(problem, x0=x0), st, OPTS)

    st_p, stats_p = jax.jit(jax.vmap(one))(x0b, states)
    failed_p = np.asarray(stats_p.status) != 0
    assert failed_p[B // 2:].all(), "hard lanes must fail at budget 3"
    assert not failed_p[: B // 2].any(), "easy lanes must converge"

    st_r, stats_r = jax.jit(
        lambda x0, st: vmap_solve_with_rescue(
            problem, x0, st, OPTS, opts_rescue)
    )(x0b, states)

    # failed lanes got rescued
    assert (np.asarray(stats_r.status)[B // 2:]
            == int(SolveStatus.SUCCESS)).all(), (
        f"rescue failed: {np.asarray(stats_r.status)}")
    # rescued lanes' iteration count includes both tiers
    assert (np.asarray(stats_r.iterations)[B // 2:] > 3).all()
    # healthy lanes: state bit-for-bit identical to the primary solve
    for name in ("x", "u", "y", "K", "d", "P", "p", "rho", "reg"):
        a = np.asarray(getattr(st_r, name))[: B // 2]
        b = np.asarray(getattr(st_p, name))[: B // 2]
        np.testing.assert_array_equal(a, b, err_msg=name)
    np.testing.assert_array_equal(
        np.asarray(stats_r.iterations)[: B // 2],
        np.asarray(stats_p.iterations)[: B // 2])


def test_rescue_noop_when_all_converge():
    problem = _problem()
    x0b, states = _batch(problem)
    # big primary budget: everything converges, rescue must not alter
    opts = OPTS.replace(iterations_max=40, ls_failure_recovery=True,
                        ls_recovery_max_fails=0,
                        ls_best_decrease_fallback=True)
    opts_rescue = rescue_options(opts, iterations_max=40)

    def one(x0, st):
        return solve(dataclasses.replace(problem, x0=x0), st, opts)

    st_p, stats_p = jax.jit(jax.vmap(one))(x0b, states)
    assert (np.asarray(stats_p.status) == 0).all()
    st_r, stats_r = jax.jit(
        lambda x0, st: vmap_solve_with_rescue(
            problem, x0, st, opts, opts_rescue)
    )(x0b, states)
    np.testing.assert_array_equal(
        np.asarray(st_r.u), np.asarray(st_p.u))
    np.testing.assert_array_equal(
        np.asarray(stats_r.iterations), np.asarray(stats_p.iterations))
