"""Batched solves: vmap whole AL-iLQR solves over scenario lanes.

The reference's MPC use case re-solves the same problem structure with
perturbed initial states / references (bicycle_test.cpp:302-337) — one
scenario at a time, single thread. Here the whole fused solve is a pure
function of (Problem, SolverState), so a batch of scenarios is one
`vmap`: every per-knot matmul in the Riccati scan and the merit rollouts
becomes a batched GEMM on the MXU, and per-lane `lax.while_loop`
iteration counts mask independently (a diverged lane cannot poison the
batch — its status is reported per lane).
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp

from altro_tpu.options import SolverOptions
from altro_tpu.problem import DiagonalCost, Problem
from altro_tpu.solver import SolverState, init_state, solve

__all__ = ["batch_init_state", "vmap_solve", "batched_tracking_solver"]


def batch_init_state(problem: Problem, batch: int) -> SolverState:
    """SolverState with a leading scenario axis [B, ...]."""
    s = init_state(problem)
    return jax.tree.map(lambda a: jnp.broadcast_to(a, (batch,) + a.shape), s)


def vmap_solve(problem: Problem, opts: SolverOptions = SolverOptions()):
    """vmapped solve over (x0 batch, state batch); problem is shared.

    Returns a jitted function (x0: [B, n], state: [B, ...]) ->
    (state', stats) with per-lane stats/status.
    """

    def one(x0, state):
        return solve(dataclasses.replace(problem, x0=x0), state, opts)

    return jax.jit(jax.vmap(one))


def batched_tracking_solver(problem: Problem, opts: SolverOptions = SolverOptions()):
    """The batched-MPC workhorse: each lane has its own initial state and
    its own tracking reference (linear cost terms q, c slide per lane;
    Q, R stay shared). Returns a jitted function

        (x0: [B, n], q: [B, N+1, n], c: [B, N+1], state_batch) ->
        (u0: [B, m], state', stats)

    — one warm-started resolve per lane per call.
    """
    if not isinstance(problem.cost, DiagonalCost):
        raise TypeError("batched_tracking_solver requires a DiagonalCost")

    def one(x0, q, c, state):
        cost = dataclasses.replace(problem.cost, q=q, c=c)
        prob = dataclasses.replace(problem, x0=x0, cost=cost)
        new_state, stats = solve(prob, state, opts)
        return new_state.u[0], new_state, stats

    return jax.jit(jax.vmap(one))
