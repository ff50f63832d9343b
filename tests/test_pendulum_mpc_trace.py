"""Pendulum swing-up closed-loop MPC: f64 oracle vs f32 headline
shortcuts (round-5 VERDICT item 9).

The Scotty bicycle trace (tests/test_bicycle.py) is the only closed-loop
workload pinning the f32 / Armijo-only / phase-split shortcuts; this adds
a second, dynamically different one (limit-cycle swing-up vs path
tracking). The f64 run with the same options is the oracle; the f32 run
must match it tick-for-tick within f32 closed-loop tolerance and reach
the upright state. Mirrors the structure of
tests/test_bicycle.py::test_scotty_mpc_closed_loop. Bench twin:
scripts/bench_all.py `pendulum_swingup_mpc` (gated row).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from altro_tpu.cones import Cone
from altro_tpu.models.integrators import midpoint
from altro_tpu.models.pendulum import pendulum_continuous
from altro_tpu.mpc import shift_trajectory
from altro_tpu.options import SolverOptions
from altro_tpu.problem import ConstraintSpec, Problem, lqr_cost_from_reference
from altro_tpu.solver import init_state, solve
from altro_tpu.status import SolveStatus

N, NX, NU = 30, 2, 1
NSIM = 80
H = 0.06
XF = np.array([np.pi, 0.0])


def _build(dtype):
    Qd = np.tile(np.full(NX, 1e-1), (N + 1, 1))
    Qd[N] *= 100.0
    torque = ConstraintSpec(
        fn=lambda x, u, k: jnp.concatenate([u - 6.0, -6.0 - u]),
        cone=Cone.NEGATIVE_ORTHANT, dim=2,
        active=jnp.ones(N + 1, bool).at[N].set(False),
        label="torque bound", diag_hessian=True, affine=True)
    problem = Problem(
        N=N, n=NX, m=NU, dynamics=midpoint(pendulum_continuous()),
        dynamics_jac=None, constraints=(torque,),
        cost=lqr_cost_from_reference(
            jnp.asarray(Qd, dtype), jnp.full((N + 1, NU), 1e-3, dtype),
            jnp.asarray(np.tile(XF, (N + 1, 1)), dtype),
            jnp.zeros((N + 1, NU), dtype)),
        h=jnp.full(N, H, dtype), x0=jnp.zeros(NX, dtype))
    state = init_state(problem)
    state = dataclasses.replace(
        state, u=jnp.full((N, NU), jnp.asarray(0.1, dtype)))
    return problem, state


def _run_trace(dtype):
    """Closed-loop trace with the HEADLINE shortcut options (f32
    Armijo-only phase-split parallel grid + recovery)."""
    problem, state = _build(dtype)
    opts = SolverOptions(
        iterations_max=10, tol_stationarity=1e-3,
        tol_primal_feasibility=1e-3, throw_errors=False,
        use_backtracking_linesearch=True, penalty_warm_start=True,
        parallel_linesearch=True, ls_phase_split=True,
        ls_try_cubic_first=False, ls_armijo_only=True, ls_max_iters=8,
        ls_failure_recovery=True, ls_recovery_max_fails=0,
        ls_best_decrease_fallback=True)
    solve_jit = jax.jit(solve, static_argnames=("opts",))
    dyn = midpoint(pendulum_continuous())
    x = jnp.zeros(NX, dtype)
    xs, iters, statuses = [], [], []
    for t in range(NSIM):
        prob = dataclasses.replace(problem, x0=x)
        state, stats = solve_jit(prob, state, opts)
        iters.append(int(stats.iterations))
        statuses.append(int(stats.status))
        u0 = state.u[0]
        x = dyn(x, u0, jnp.asarray(H, dtype), 0)
        xs.append(np.asarray(x, np.float64))
        state = shift_trajectory(state)
    return np.asarray(xs), np.asarray(iters), np.asarray(statuses)


def test_pendulum_mpc_f32_matches_f64_oracle():
    xs64, it64, st64 = _run_trace(jnp.float64)
    xs32, it32, st32 = _run_trace(jnp.float32)

    # oracle sanity: the f64 loop swings up and holds
    up_err64 = np.abs(np.mod(xs64[-1, 0], 2 * np.pi) - np.pi)
    assert up_err64 < 0.1, f"f64 oracle failed swing-up: {xs64[-1]}"
    assert np.mean(st64 == SolveStatus.SUCCESS) > 0.9

    # f32 with the Armijo-only/phase-split shortcuts follows the oracle
    # tick-for-tick within f32 closed-loop tolerance
    err = np.abs(xs32 - xs64).max(axis=1)
    assert err.max() < 5e-2, f"max tick divergence {err.max():.2e}"
    up_err32 = np.abs(np.mod(xs32[-1, 0], 2 * np.pi) - np.pi)
    assert up_err32 < 0.1
    assert np.mean(st32 == SolveStatus.SUCCESS) > 0.9
    # iteration traces agree on nearly every tick (ties may flip)
    assert np.mean(it32 == it64) > 0.9, (
        f"iteration-trace agreement {np.mean(it32 == it64):.2f}")
