"""Receding-horizon MPC layer.

The reference's MPC API is three mutating calls on the solver
(UpdateLinearCosts / SetInitialState / ShiftTrajectory,
/root/reference/src/altro/altro_solver.cpp:266-293) followed by a
warm-started Solve. Here every piece is a pure function on the
(Problem, SolverState) pytrees, so a whole warm-started resolve is one
jitted call — and `vmap` of that call batches thousands of MPC scenarios
(perturbed initial states / references) per chip.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from altro_tpu.options import SolverOptions
from altro_tpu.problem import DiagonalCost, Problem, lqr_cost_from_reference
from altro_tpu.solver import SolverState, solve

__all__ = [
    "shift_trajectory",
    "set_initial_state",
    "update_linear_costs",
    "update_tracking_window",
    "mpc_step",
]


def shift_trajectory(state: SolverState) -> SolverState:
    """Shift x, u one step forward (warm start for the next resolve).

    Parity: altro_solver.cpp:283-293 (x_[k] = x_[k+1] for k < N;
    u_[k] = u_[k+1] for k < N-1; the tail entries keep their values).
    Duals/gains are intentionally NOT shifted, matching the reference.
    """
    x = state.x.at[:-1].set(state.x[1:])
    u = state.u.at[:-1].set(state.u[1:])
    return dataclasses.replace(state, x=x, u=u)


def set_initial_state(problem: Problem, x0) -> Problem:
    """Functional SetInitialState (altro_solver.cpp:177-190)."""
    return dataclasses.replace(problem, x0=jnp.asarray(x0, problem.x0.dtype))


def update_linear_costs(
    problem: Problem,
    q: Optional[jnp.ndarray] = None,
    r: Optional[jnp.ndarray] = None,
    c: Optional[jnp.ndarray] = None,
) -> Problem:
    """Replace the linear cost terms (the MPC reference-sliding update).

    Parity: UpdateLinearCosts (altro_solver.cpp:266-281,
    knotpoint_data.cpp:193-224) — only valid for diagonal/quadratic
    costs; Q, R stay fixed while q, r, c slide with the reference.
    Arguments are full stacked arrays ([N+1, n] / [N+1, m] / [N+1]).
    """
    cost = problem.cost
    kw = {}
    if q is not None:
        kw["q"] = jnp.asarray(q, cost.q.dtype)
    if r is not None:
        kw["r"] = jnp.asarray(r, cost.r.dtype)
    if c is not None:
        kw["c"] = jnp.asarray(c, cost.c.dtype)
    return dataclasses.replace(problem, cost=dataclasses.replace(cost, **kw))


def update_tracking_window(
    problem: Problem,
    x_ref_window: jnp.ndarray,
    u_ref_window: Optional[jnp.ndarray] = None,
) -> Problem:
    """Point the LQR tracking cost at a new reference window.

    Rebuilds (q, r, c) from the diagonal weights exactly as SetLQRCost
    (altro_solver.cpp:138-172). x_ref_window: [N+1, n];
    u_ref_window: [N+1, m] (terminal row's input term excluded from c).
    """
    cost = problem.cost
    if not isinstance(cost, DiagonalCost):
        raise TypeError("update_tracking_window requires a DiagonalCost")
    if u_ref_window is None:
        u_ref_window = jnp.zeros_like(cost.r)
    new = lqr_cost_from_reference(cost.Q, cost.R, x_ref_window, u_ref_window)
    return dataclasses.replace(problem, cost=new)


def mpc_step(
    problem: Problem,
    state: SolverState,
    x_measured: jnp.ndarray,
    x_ref_window: jnp.ndarray,
    u_ref_window: Optional[jnp.ndarray] = None,
    opts: SolverOptions = SolverOptions(),
) -> Tuple[jnp.ndarray, SolverState, "SolveStats"]:
    """One full warm-started MPC tick as a single pure function:

      problem' = slide reference window + set measured initial state
      state'   = shift_trajectory(state)
      solve(problem', state') -> control u_0

    Jit this (static opts) and `vmap` it over batched scenarios.
    """
    problem = update_tracking_window(problem, x_ref_window, u_ref_window)
    problem = set_initial_state(problem, x_measured)
    state = shift_trajectory(state)
    new_state, stats = solve(problem, state, opts)
    return new_state.u[0], new_state, stats
