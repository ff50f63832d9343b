"""Real-time-iteration mode: one full-step iteration per resolve.

Closed-loop MPC quality must match the full line-search solver on the
warm-started Scotty workload (where resolves take ~1 iteration anyway).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from altro_tpu.models.bicycle import bicycle_continuous
from altro_tpu.models.integrators import midpoint
from altro_tpu.mpc import set_initial_state, shift_trajectory, update_linear_costs
from altro_tpu.options import SolverOptions
from altro_tpu.solver import solve

from test_bicycle import f32, make_scotty_problem, scotty_or_skip


def closed_loop(opts, Nsim=60):
    ref = scotty_or_skip()
    N, n = 30, 4
    h = f32(ref.tf / ref.N)
    problem, state, u0 = make_scotty_problem(ref, N)
    solve_jit = jax.jit(solve, static_argnames=("opts",))
    dyn = midpoint(bicycle_continuous())
    Qd = np.full(n, 1e-2)
    c_u = 0.5 * float(u0 @ (jnp.full(2, 1e-3) * u0))
    x_sim = [np.asarray(ref.x[0])]
    errs = []
    for t in range(Nsim):
        state, stats = solve_jit(problem, state, opts)
        u_now = np.asarray(state.u[0])
        x_next = np.asarray(dyn(jnp.asarray(x_sim[-1]), jnp.asarray(u_now), h, 0))
        x_sim.append(x_next)
        errs.append(np.linalg.norm(x_next - ref.x[t + 1]))
        window = ref.x[t + 1 : t + N + 2]
        q_new = -(Qd[None, :] * window)
        c_new = 0.5 * np.sum(Qd[None, :] * window * window, axis=1)
        c_new[:N] += c_u
        problem = update_linear_costs(problem, q=q_new, c=c_new)
        problem = set_initial_state(problem, x_next)
        state = shift_trajectory(state)
    return np.asarray(errs)


def test_rti_matches_full_solver_quality():
    full = SolverOptions(iterations_max=80, use_backtracking_linesearch=True)
    rti = SolverOptions(iterations_max=1, rti_mode=True, throw_errors=False)
    errs_full = closed_loop(full)
    errs_rti = closed_loop(rti)
    # RTI closed-loop tracking stays within 20% of the converged solver
    assert errs_rti.mean() < errs_full.mean() * 1.2 + 1e-3
    assert np.isfinite(errs_rti).all()
