"""Packed trial-rollout kernel (ops/pallas_rollout.py) + tile-step
protocol (models/tile_steps.py).

Parity chain: tile steps == per-lane dynamics under vmap; the kernel
(interpret mode) == the portable scan == vmapped merit_rollout_phi_x;
an end-to-end solve through the merit_grid hook matches the plain grid
path; batched (vmapped) solves fall back to the scan through the
custom_vmap rule. Reference capability matched: the forward pass /
merit rollout chain, solver.cpp:237-258 + tvlqr.cpp:208-244.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from altro_tpu.io.scotty import synthetic_scotty
from altro_tpu.models.bicycle import bicycle_continuous
from altro_tpu.models.double_integrator import double_integrator_dynamics
from altro_tpu.models.integrators import midpoint, rk4
from altro_tpu.models.pendulum import pendulum_continuous
from altro_tpu.models.quadrotor import quadrotor_continuous
from altro_tpu.models.tile_steps import (
    bicycle_tile,
    double_integrator_tile,
    midpoint_tile,
    pendulum_tile,
    quadrotor_tile,
    rk4_tile,
)
from altro_tpu.options import SolverOptions
from altro_tpu.ops.pallas_rollout import (
    _pallas_rollout,
    _scan_rollout,
    make_trial_grid_rollout,
    rollout_supported,
)
from altro_tpu.problem import Problem, lqr_cost_from_reference
from altro_tpu.solver import init_state, merit_rollout_phi_x, solve

F32 = jnp.float32


ZOO = [
    ("bicycle", 4, 2,
     lambda: midpoint(bicycle_continuous()),
     lambda: midpoint_tile(bicycle_tile()), 0.1),
    ("pendulum", 2, 1,
     lambda: midpoint(pendulum_continuous()),
     lambda: midpoint_tile(pendulum_tile()), 0.06),
    ("double_integrator", 4, 2,
     lambda: double_integrator_dynamics(2),
     lambda: double_integrator_tile(2), 0.1),
    ("quadrotor", 12, 4,
     lambda: rk4(quadrotor_continuous()),
     lambda: rk4_tile(quadrotor_tile()), 0.05),
]


@pytest.mark.parametrize("name,n,m,make_lane,make_tile,h", ZOO)
def test_tile_step_matches_lane_dynamics(name, n, m, make_lane, make_tile, h):
    rng = np.random.default_rng(0)
    lane = make_lane()
    tile = make_tile()
    x = jnp.asarray(0.3 * rng.standard_normal((8, n)), F32)
    u = jnp.asarray(1.0 + 0.3 * rng.standard_normal((8, m)), F32)
    ref = jax.vmap(lambda xi, ui: lane(xi, ui, h, 0))(x, u)
    got = tile(x, u, jnp.full((8, 1), h, F32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-6, rtol=1e-5)
    assert rollout_supported(n, m)


def _bicycle_fixture(N=60):
    ref = synthetic_scotty(N=500)
    cost = lqr_cost_from_reference(
        jnp.full((N + 1, 4), 1e-2, F32), jnp.full((N + 1, 2), 1e-3, F32),
        jnp.asarray(ref.x[: N + 1], F32), jnp.asarray(ref.u[: N + 1], F32))
    h = jnp.full((N,), float(np.float32(ref.tf / ref.N)), F32)
    problem = Problem(
        N=N, n=4, m=2, dynamics=midpoint(bicycle_continuous()),
        dynamics_jac=None, constraints=(), cost=cost, h=h,
        x0=jnp.asarray(ref.x[0], F32))
    rng = np.random.default_rng(1)
    xref = jnp.asarray(ref.x[: N + 1], F32)
    uref = jnp.asarray(ref.u[:N] + 0.01 * rng.standard_normal((N, 2)), F32)
    K = jnp.asarray(0.1 * rng.standard_normal((N, 2, 4)), F32)
    d = jnp.asarray(0.05 * rng.standard_normal((N, 2)), F32)
    return problem, xref, uref, K, d


ALPHAS = jnp.asarray([1.0, 0.5, 0.25, 0.125, 0.0625, 0.03125, 0.015625,
                      0.0078125], F32)


def test_kernel_matches_merit_oracle_interpret():
    problem, xref, uref, K, d = _bicycle_fixture()
    cost = problem.cost
    step_tile = midpoint_tile(bicycle_tile())
    phi_ref, x_ref = jax.vmap(
        lambda a: merit_rollout_phi_x(problem, xref, uref, K, d, (), 1.0, a,
                                      problem.x0)
    )(ALPHAS)
    args = (step_tile, ALPHAS, problem.x0, xref, uref, K, d,
            cost.Q, cost.q, cost.R, cost.r, cost.c, problem.h)
    phi_s, x_s = _scan_rollout(*args)
    phi_k, x_k = _pallas_rollout(*args, interpret=True)
    scale = float(jnp.max(jnp.abs(phi_ref)))
    for nm, (p, x) in [("scan", (phi_s, x_s)), ("kernel", (phi_k, x_k))]:
        assert float(jnp.max(jnp.abs(p - phi_ref))) < 2e-5 * max(scale, 1.0), nm
        assert float(jnp.max(jnp.abs(x - x_ref))) < 1e-5, nm


def test_solve_through_merit_grid_matches_plain_grid():
    """End-to-end: a solve with dynamics_tile set (merit_grid hook, scan
    fallback on CPU) matches the plain grid path's iterates."""
    problem, xref, uref, K, d = _bicycle_fixture()
    tile_problem = dataclasses.replace(
        problem, dynamics_tile=midpoint_tile(bicycle_tile()))
    opts = SolverOptions(
        iterations_max=12, use_backtracking_linesearch=True,
        parallel_linesearch=True, ls_phase_split=True,
        ls_try_cubic_first=False, ls_armijo_only=True, ls_max_iters=8,
        throw_errors=False)
    st = init_state(problem)
    st = dataclasses.replace(st, u=uref, x=xref)
    s0, t0 = solve(problem, st, opts)
    s1, t1 = solve(tile_problem, st, opts)
    assert int(t0.status) == int(t1.status)
    assert int(t0.iterations) == int(t1.iterations)
    np.testing.assert_allclose(np.asarray(s0.u), np.asarray(s1.u), atol=5e-5)


def test_batched_solve_falls_back_to_scan():
    """vmapped solves must not try to batch the Pallas kernel: the
    custom_vmap rule routes to the portable scan."""
    problem, xref, uref, K, d = _bicycle_fixture(N=30)
    tile_problem = dataclasses.replace(
        problem, dynamics_tile=midpoint_tile(bicycle_tile()))
    opts = SolverOptions(
        iterations_max=6, use_backtracking_linesearch=True,
        parallel_linesearch=True, ls_phase_split=True,
        ls_try_cubic_first=False, ls_armijo_only=True, ls_max_iters=8,
        throw_errors=False)
    B = 4
    x0b = jnp.asarray(
        np.asarray(problem.x0)[None, :]
        + 0.01 * np.random.default_rng(2).standard_normal((B, 4)), F32)
    st = init_state(problem)
    st = dataclasses.replace(
        st, u=uref[:30], x=xref[:31])
    stb = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), st)

    def resolve(x0i, sti):
        return solve(dataclasses.replace(tile_problem, x0=x0i), sti, opts)

    sb, tb = jax.vmap(resolve)(x0b, stb)
    assert np.asarray(tb.status).shape == (B,)
    assert bool(jnp.all(jnp.isfinite(sb.u)))


def test_ls_failure_recovery():
    """SolverOptions.ls_failure_recovery: a solve that aborts
    LINE_SEARCH_FAILED with the reference semantics keeps iterating
    (escalated reg, alpha=0 carry) and makes real progress instead."""
    from altro_tpu.problem import DiagonalCost

    N, n, m = 50, 2, 1
    xf = jnp.asarray([np.pi, 0.0])
    Q = jnp.tile(jnp.asarray([1e-2, 1e-2]), (N + 1, 1)).at[N].set(
        jnp.asarray([100.0, 100.0]))
    R = jnp.full((N + 1, m), 1e-3)
    cost = DiagonalCost(
        Q=Q, R=R, q=-Q * xf[None, :], r=jnp.zeros((N + 1, m)),
        c=0.5 * jnp.sum(Q * xf[None, :] ** 2, axis=1))
    problem = Problem(
        N=N, n=n, m=m, dynamics=midpoint(pendulum_continuous()),
        dynamics_jac=None, constraints=(), cost=cost,
        h=jnp.full(N, 0.06), x0=jnp.zeros(n))
    st = init_state(problem)
    st = dataclasses.replace(st, u=jnp.full((N, m), 0.1))
    # ls_max_iters=1/width=1: only the full step is tried, which fails
    # Armijo at iteration 1 on this problem — deterministic failure.
    base = dict(
        iterations_max=30, use_backtracking_linesearch=True,
        parallel_linesearch=True, ls_phase_split=True,
        ls_try_cubic_first=False, ls_armijo_only=True,
        ls_max_iters=1, ls_parallel_width=1, throw_errors=False)
    _, t_abort = solve(problem, st, SolverOptions(**base))
    # unlimited recovery (ls_recovery_max_fails=0): the lane grinds on
    # and makes real progress
    _, t_rec = solve(
        problem, st,
        SolverOptions(ls_failure_recovery=True, ls_recovery_max_fails=0,
                      **base))
    assert int(t_abort.status) == 8  # LINE_SEARCH_FAILED
    assert int(t_abort.iterations) == 1
    assert int(t_rec.status) != 8
    assert int(t_rec.iterations) > 5
    assert float(t_rec.objective_value) < 0.1 * float(t_abort.objective_value)
    # capped recovery: this scenario fails every iteration, so the lane
    # stops as LINE_SEARCH_FAILED after cap+1 failures instead of
    # grinding the whole budget
    _, t_cap = solve(
        problem, st,
        SolverOptions(ls_failure_recovery=True, ls_recovery_max_fails=2,
                      **base))
    assert int(t_cap.status) == 8
    assert 1 < int(t_cap.iterations) <= 4


def _steering_spec(N, delta_max=0.6):
    from altro_tpu.cones import Cone
    from altro_tpu.problem import ConstraintSpec

    return ConstraintSpec(
        fn=lambda x, u, k: jnp.stack([x[3] - delta_max, -delta_max - x[3]]),
        cone=Cone.NEGATIVE_ORTHANT, dim=2,
        active=jnp.ones(N + 1, bool),
        label="steering bound", diag_hessian=True, affine=True,
    )


def _accel_spec(N, a_max=1.5):
    from altro_tpu.cones import Cone
    from altro_tpu.problem import ConstraintSpec

    # input bound, inactive on the second half of the horizon (exercises
    # the active-mask zeroing)
    active = jnp.arange(N + 1) < (N // 2)
    return ConstraintSpec(
        fn=lambda x, u, k: jnp.stack([u[0] - a_max, -a_max - u[0]]),
        cone=Cone.NEGATIVE_ORTHANT, dim=2, active=active,
        label="accel bound", diag_hessian=True, affine=True,
    )


def test_affine_stacks_reproduce_constraints():
    from altro_tpu.ops.pallas_rollout import affine_constraint_stacks

    problem, xref, uref, K, d = _bicycle_fixture(N=20)
    problem = dataclasses.replace(
        problem, constraints=(_steering_spec(20), _accel_spec(20)))
    ax, au, g, act = affine_constraint_stacks(problem)
    assert ax.shape == (21, 4, 4) and au.shape == (21, 4, 2)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(4), F32)
    u = jnp.asarray(rng.standard_normal(2), F32)
    for k in (0, 7, 20):
        want = jnp.concatenate(
            [spec.fn(x, u, k) for spec in problem.constraints])
        got = ax[k] @ x + au[k] @ u + g[k]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)


def test_constrained_kernel_matches_merit_oracle_interpret():
    """The in-kernel AL term (affine NEGATIVE_ORTHANT groups) matches
    the scan fallback AND the vmapped merit_rollout_phi_x oracle with
    nonzero duals and penalty (round-5 VERDICT item 2)."""
    from altro_tpu.ops.pallas_rollout import affine_constraint_stacks

    problem, xref, uref, K, d = _bicycle_fixture()
    N = problem.N
    # tight bound so the constraint is ACTIVE along the trial rollouts
    specs = (_steering_spec(N, delta_max=0.01), _accel_spec(N, a_max=0.05))
    problem = dataclasses.replace(problem, constraints=specs)
    rng = np.random.default_rng(4)
    z = tuple(
        jnp.asarray(0.1 * rng.standard_normal((N + 1, s.dim)), F32)
        for s in specs)
    rho = jnp.asarray(2.5, F32)
    cost = problem.cost
    step_tile = midpoint_tile(bicycle_tile())

    phi_ref, x_ref = jax.vmap(
        lambda a: merit_rollout_phi_x(problem, xref, uref, K, d, z, rho, a,
                                      problem.x0)
    )(ALPHAS)

    ax, au, g, act = affine_constraint_stacks(problem)
    con = (rho * ax * act[..., None], rho * au * act[..., None],
           (jnp.concatenate(z, axis=1) - rho * g) * act,
           1.0 / (2.0 * rho))
    args = (step_tile, ALPHAS, problem.x0, xref, uref, K, d,
            cost.Q, cost.q, cost.R, cost.r, cost.c, problem.h)
    phi_s, x_s = _scan_rollout(*args, con=con)
    phi_k, x_k = _pallas_rollout(*args, con=con, interpret=True)
    # the AL term must actually bite (otherwise this tests nothing)
    phi_unc, _ = _scan_rollout(*args)
    assert float(jnp.min(phi_s - phi_unc)) > 1e-3
    scale = float(jnp.max(jnp.abs(phi_ref)))
    for nm, (p, x) in [("scan", (phi_s, x_s)), ("kernel", (phi_k, x_k))]:
        assert float(jnp.max(jnp.abs(p - phi_ref))) < 2e-5 * max(scale, 1.0), nm
        assert float(jnp.max(jnp.abs(x - x_ref))) < 1e-5, nm


def test_constrained_solve_through_merit_grid_matches_plain_grid():
    """End-to-end CONSTRAINED solve with dynamics_tile set: the
    merit_grid hook now fires for affine NEGATIVE_ORTHANT groups
    (solver.py gate) and must reproduce the plain grid path's
    iterates."""
    problem, xref, uref, K, d = _bicycle_fixture()
    problem = dataclasses.replace(
        problem, constraints=(_steering_spec(problem.N, delta_max=0.05),))
    tile_problem = dataclasses.replace(
        problem, dynamics_tile=midpoint_tile(bicycle_tile()))
    opts = SolverOptions(
        iterations_max=12, use_backtracking_linesearch=True,
        parallel_linesearch=True, ls_phase_split=True,
        ls_try_cubic_first=False, ls_armijo_only=True, ls_max_iters=8,
        throw_errors=False)
    st = init_state(problem)
    st = dataclasses.replace(st, u=uref, x=xref)
    s0, t0 = solve(problem, st, opts)
    s1, t1 = solve(tile_problem, st, opts)
    assert int(t0.status) == int(t1.status)
    assert int(t0.iterations) == int(t1.iterations)
    np.testing.assert_allclose(np.asarray(s0.u), np.asarray(s1.u), atol=5e-5)
    # the constraint must have been active at some point for this to be
    # a meaningful constrained test
    assert float(jnp.max(jnp.abs(np.asarray(s1.x)[:, 3]))) > 0.04
