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
    iters = []
    for t in range(Nsim):
        state, stats = solve_jit(problem, state, opts)
        iters.append(int(stats.iterations))
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
    return np.asarray(errs), np.asarray(iters)


def test_rti_matches_full_solver_quality():
    full = SolverOptions(iterations_max=80, use_backtracking_linesearch=True)
    rti = SolverOptions(iterations_max=1, rti_mode=True, throw_errors=False)
    errs_full, _ = closed_loop(full)
    errs_rti, _ = closed_loop(rti)
    # RTI closed-loop tracking stays within 20% of the converged solver
    assert errs_rti.mean() < errs_full.mean() * 1.2 + 1e-3
    assert np.isfinite(errs_rti).all()


def test_penalty_warm_start_cuts_iterations_at_equal_quality():
    """Carrying rho across warm-started resolves (penalty_warm_start)
    removes the per-resolve re-escalation rounds: strictly fewer total
    iterations over the closed loop, no loss of tracking quality."""
    base = SolverOptions(iterations_max=80, use_backtracking_linesearch=True)
    warm = base.replace(penalty_warm_start=True)
    errs_reset, iters_reset = closed_loop(base)
    errs_warm, iters_warm = closed_loop(warm)
    assert iters_warm.sum() < iters_reset.sum()
    assert errs_warm.mean() < errs_reset.mean() * 1.05 + 1e-3
    assert np.isfinite(errs_warm).all()


def test_rti_x_only_split_matches_payload_split():
    """RTI with ls_grid_x_only (scan emits phi + states; payload rebuilt
    knot-parallel) produces identical iterates to the payload-carrying
    phase-split RTI step."""
    import numpy as np

    ref = scotty_or_skip()
    problem, state0, _ = make_scotty_problem(ref, 30)
    base = SolverOptions(
        iterations_max=1, rti_mode=True, ls_phase_split=True,
        throw_errors=False,
    )
    s_ref, st_ref = jax.jit(solve, static_argnames=("opts",))(
        problem, state0, base.replace(ls_grid_x_only=False)
    )
    s_new, st_new = jax.jit(solve, static_argnames=("opts",))(
        problem, state0, base.replace(ls_grid_x_only=True)
    )
    np.testing.assert_allclose(np.asarray(s_new.u), np.asarray(s_ref.u),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(s_new.x), np.asarray(s_ref.x),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(float(st_new.merit_value),
                               float(st_ref.merit_value), rtol=1e-12)
