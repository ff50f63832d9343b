"""Parallel-grid backtracking line search (linesearch.parallel_backtracking_search).

Accepted-step parity with the sequential backtracking mode
(ls_try_cubic_first=False) on analytic merit functions and through whole
solves, plus the failure paths.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from altro_tpu.cones import Cone
from altro_tpu.linesearch import (
    LineSearchOptions,
    parallel_backtracking_search,
    wolfe_line_search,
)
from altro_tpu.models.double_integrator import double_integrator_dynamics
from altro_tpu.options import SolverOptions
from altro_tpu.problem import ConstraintSpec, Problem, lqr_cost_from_reference
from altro_tpu.solver import init_state, solve
from altro_tpu.status import LineSearchCode


def _quadratic_merit(argmin):
    def merit(alpha):
        phi = 0.5 * (alpha - argmin) ** 2
        return phi, (alpha - argmin), ()

    return merit


def _run_both(merit, phi0, dphi0, **kw):
    seq_opts = LineSearchOptions(use_backtracking=True, try_cubic_first=False, **kw)
    seq = wolfe_line_search(merit, None, phi0, dphi0, 1.0, seq_opts, aux0=())
    par = parallel_backtracking_search(merit, phi0, dphi0, 1.0, seq_opts, aux0=())
    return seq, par


def test_accepts_full_step_like_sequential():
    merit = _quadratic_merit(1.0)  # alpha=1 is the exact minimizer
    seq, par = _run_both(merit, 0.5, -1.0)
    assert float(par.alpha) == float(seq.alpha) == 1.0
    assert int(par.code) == int(seq.code) == int(LineSearchCode.MINIMUM_FOUND)
    assert int(par.n_iters) == int(seq.n_iters) == 1


def test_backtracks_to_same_step_and_count():
    # Minimizer at 0.18: alpha=1 fails Armijo, grid accepts at the same
    # trial the sequential loop does.
    merit = _quadratic_merit(0.18)
    phi0, dphi0 = float(merit(0.0)[0]), float(merit(0.0)[1])
    seq, par = _run_both(merit, phi0, dphi0)
    assert float(par.alpha) == float(seq.alpha)
    assert int(par.n_iters) == int(seq.n_iters)
    assert int(par.code) == int(seq.code) == int(LineSearchCode.MINIMUM_FOUND)


def test_not_descent_direction():
    merit = _quadratic_merit(-1.0)
    phi0, dphi0 = float(merit(0.0)[0]), float(merit(0.0)[1])
    assert dphi0 > 0
    seq, par = _run_both(merit, phi0, dphi0)
    assert int(par.code) == int(seq.code) == int(LineSearchCode.NOT_DESCENT_DIRECTION)
    assert float(par.alpha) == float(seq.alpha) == 0.0


def test_exhaustion_fails_like_sequential():
    # Merit increases for every trial: no grid point passes Armijo.
    def merit(alpha):
        return 1.0 + alpha, jnp.asarray(1.0), ()

    par = parallel_backtracking_search(
        merit, 1.0, -1.0, 1.0, LineSearchOptions(max_iters=6), aux0=(), width=6
    )
    assert int(par.code) == int(LineSearchCode.NO_ERROR)
    assert int(par.n_iters) == 6


def test_deep_backtrack_crosses_block_boundary():
    """A merit with huge curvature needs alpha ~ beta^10 — deeper than one
    8-wide block; the blocked search must find the same step the
    sequential search does."""
    # phi(a) = phi0 + d0*a + 0.5*C*a^2 with C >> |d0|: acceptable steps
    # are a < 2*(c1-1)*d0/C ~ 2e-3 -> first passing beta^k is k=9.
    d0, C = -1.0, 1000.0

    def merit(alpha):
        phi = 1.0 + d0 * alpha + 0.5 * C * alpha**2
        return phi, d0 + C * alpha, ()

    seq_opts = LineSearchOptions(use_backtracking=True, try_cubic_first=False)
    seq = wolfe_line_search(merit, None, 1.0, d0, 1.0, seq_opts, aux0=())
    par = parallel_backtracking_search(merit, 1.0, d0, 1.0, seq_opts, aux0=(), width=8)
    assert int(seq.code) == int(LineSearchCode.MINIMUM_FOUND)
    assert float(par.alpha) == float(seq.alpha)
    assert int(par.n_iters) == int(seq.n_iters)
    assert int(par.code) == int(LineSearchCode.MINIMUM_FOUND)


def _bounded_di_problem(N=10):
    dtype = jnp.float64
    n, m = 4, 2
    dyn = double_integrator_dynamics()
    xref = jnp.tile(jnp.asarray([1.0, 1.0, 0.0, 0.0], dtype), (N + 1, 1))
    uref = jnp.zeros((N + 1, m), dtype)
    cost = lqr_cost_from_reference(
        jnp.tile(jnp.asarray([1.0, 1.0, 0.1, 0.1], dtype), (N + 1, 1)),
        jnp.tile(jnp.asarray([1e-2, 1e-2], dtype), (N + 1, 1)),
        xref, uref,
    )
    ub = 0.5
    bound = ConstraintSpec(
        fn=lambda x, u, k: jnp.concatenate([u - ub, -ub - u]),
        cone=Cone.NEGATIVE_ORTHANT, dim=2 * m,
        active=jnp.arange(N + 1) < N, label="ubound",
    )
    return Problem(
        N=N, n=n, m=m, dynamics=dyn, dynamics_jac=None, constraints=(bound,),
        cost=cost, h=jnp.full(N, 0.1, dtype), x0=jnp.zeros(n, dtype),
    )


def test_whole_solve_parity_with_sequential_backtracking():
    """Same iterates, iteration counts, and stats through a full
    constraint-active AL-iLQR solve."""
    problem = _bounded_di_problem()
    base = SolverOptions(
        iterations_max=60, use_backtracking_linesearch=True,
        ls_try_cubic_first=False, throw_errors=False,
    )
    par_opts = base.replace(parallel_linesearch=True)
    s_seq, st_seq = jax.jit(solve, static_argnums=2)(problem, init_state(problem), base)
    s_par, st_par = jax.jit(solve, static_argnums=2)(problem, init_state(problem), par_opts)
    assert int(st_par.iterations) == int(st_seq.iterations)
    assert int(st_par.status) == int(st_seq.status)
    np.testing.assert_allclose(np.asarray(s_par.u), np.asarray(s_seq.u), rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(s_par.x), np.asarray(s_seq.x), rtol=0, atol=1e-12)
    assert int(st_par.ls_iterations) == int(st_seq.ls_iterations)
    # control saturates at the bound (the 5-iteration oracle problem family)
    assert np.max(np.abs(np.asarray(s_par.u))) <= 0.5 + 1e-4


def test_armijo_slack_accepts_roundoff_level_steps():
    """With ls_armijo_slack, a step whose merit 'increase' is at the
    roundoff level of phi0 is accepted; exact Armijo rejects it."""
    phi0 = 1.0e4

    def merit(alpha):
        # phi increases by 1e-3 at every trial: 1e-7 relative to phi0.
        # dphi small enough that the strong-Wolfe curvature test passes.
        return phi0 + 1e-3, jnp.asarray(-0.5), ()

    exact = LineSearchOptions(use_backtracking=True, try_cubic_first=False)
    slack = exact._replace(armijo_slack=1e-6)
    for search in (
        lambda o: wolfe_line_search(merit, None, phi0, -1.0, 1.0, o, aux0=()),
        lambda o: parallel_backtracking_search(merit, phi0, -1.0, 1.0, o, aux0=()),
    ):
        rej = search(exact)
        acc = search(slack)
        assert int(rej.code) != int(LineSearchCode.MINIMUM_FOUND)
        assert int(acc.code) == int(LineSearchCode.MINIMUM_FOUND)
        assert float(acc.alpha) == 1.0


def test_requires_backtracking_mode():
    problem = _bounded_di_problem(N=4)
    bad = SolverOptions(parallel_linesearch=True, use_backtracking_linesearch=False)
    try:
        solve(problem, init_state(problem), bad)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "use_backtracking_linesearch" in str(e)


def test_phase_split_whole_solve_parity():
    """ls_phase_split changes the evaluation schedule, not the result:
    identical iterates, counts, and stats vs the fused parallel search
    through a constraint-active solve."""
    problem = _bounded_di_problem()
    base = SolverOptions(
        iterations_max=60, use_backtracking_linesearch=True,
        ls_try_cubic_first=False, throw_errors=False, parallel_linesearch=True,
    )
    # ls_max_iters=25 exercises the multi-block path; 8 (== width) the
    # single-block merged-completion path the bench uses.
    for ls_iters in (25, 8):
        b = base.replace(ls_max_iters=ls_iters)
        split_opts = b.replace(ls_phase_split=True)
        s_par, st_par = jax.jit(solve, static_argnums=2)(problem, init_state(problem), b)
        s_spl, st_spl = jax.jit(solve, static_argnums=2)(problem, init_state(problem), split_opts)
        assert int(st_spl.iterations) == int(st_par.iterations)
        assert int(st_spl.status) == int(st_par.status)
        assert int(st_spl.ls_iterations) == int(st_par.ls_iterations)
        np.testing.assert_allclose(np.asarray(s_spl.u), np.asarray(s_par.u), rtol=0, atol=1e-10)
        np.testing.assert_allclose(np.asarray(s_spl.x), np.asarray(s_par.x), rtol=0, atol=1e-10)
        np.testing.assert_allclose(
            float(st_spl.stationarity), float(st_par.stationarity), rtol=1e-8, atol=1e-12
        )


def test_phase_split_light_rollout_matches_merit_function():
    """merit_rollout_light's phi/trajectory equal merit_function's, and
    complete_merit_payload reconstructs the same expansions and dphi."""
    from altro_tpu.solver import (
        al_expansions,
        complete_merit_payload,
        merit_function,
        merit_rollout_light,
        open_loop_rollout,
    )
    from altro_tpu.solver import backward_adaptive

    problem = _bounded_di_problem()
    state = init_state(problem)
    x = open_loop_rollout(problem, state.u)
    A, B, lx, lu, lxx, luu, lux = al_expansions(problem, x, state.u, state.z, state.rho)
    gains, _ = backward_adaptive(
        SolverOptions(), A, B, lxx, luu, lux, lx, lu, jnp.asarray(0.0, x.dtype)
    )
    for alpha in (1.0, 0.25):
        full = merit_function(
            problem, x, state.u, gains.K, gains.d, gains.P, gains.p,
            state.z, state.rho, alpha, problem.x0, with_derivative=True,
        )
        light = merit_rollout_light(
            problem, x, state.u, gains.K, gains.d, gains.P, gains.p,
            state.z, state.rho, alpha, problem.x0,
        )
        np.testing.assert_allclose(float(light.phi), float(full.phi), rtol=0, atol=0)
        np.testing.assert_array_equal(np.asarray(light.x), np.asarray(full.x))
        np.testing.assert_array_equal(np.asarray(light.u), np.asarray(full.u))
        np.testing.assert_array_equal(np.asarray(light.y), np.asarray(full.y))
        dphi, rec = complete_merit_payload(
            problem, light, gains.K, gains.d, state.z, state.rho
        )
        np.testing.assert_allclose(float(dphi), float(full.dphi), rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(np.asarray(rec.A), np.asarray(full.A), rtol=0, atol=1e-14)
        np.testing.assert_allclose(np.asarray(rec.lx), np.asarray(full.lx), rtol=0, atol=1e-14)
        np.testing.assert_allclose(np.asarray(rec.lu), np.asarray(full.lu), rtol=0, atol=1e-14)


def test_armijo_only_converges_and_skips_dphi():
    """ls_armijo_only: same constraint-active solve converges to the same
    solution quality with the dphi completions skipped (stats.dphi NaN)."""
    problem = _bounded_di_problem()
    base = SolverOptions(
        iterations_max=60, use_backtracking_linesearch=True,
        ls_try_cubic_first=False, throw_errors=False, parallel_linesearch=True,
        ls_phase_split=True,
    )
    s_ref, st_ref = jax.jit(solve, static_argnums=2)(problem, init_state(problem), base)
    ao = base.replace(ls_armijo_only=True)
    s_ao, st_ao = jax.jit(solve, static_argnums=2)(problem, init_state(problem), ao)
    assert int(st_ao.status) == 0  # SUCCESS
    assert np.isnan(float(st_ao.dphi))
    assert not np.isnan(float(st_ref.dphi))
    # Same stationary point (the accepted-step schedule may differ when a
    # full step passes Armijo but not curvature; here it converges to the
    # same solution)
    np.testing.assert_allclose(np.asarray(s_ao.u), np.asarray(s_ref.u), rtol=0, atol=1e-6)
    assert float(st_ao.stationarity) < 1e-4
    assert np.max(np.abs(np.asarray(s_ao.u))) <= 0.5 + 1e-4


def test_armijo_only_requires_phase_split():
    problem = _bounded_di_problem(N=4)
    bad = SolverOptions(
        parallel_linesearch=True, use_backtracking_linesearch=True,
        ls_armijo_only=True,
    )
    try:
        solve(problem, init_state(problem), bad)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "ls_phase_split" in str(e)


def test_armijo_only_rti_mode():
    """RTI + ls_armijo_only: identical iterates to plain RTI (RTI never
    consumes dphi), with the payload's dphi reconstruction skipped."""
    problem = _bounded_di_problem()
    rti = SolverOptions(
        iterations_max=1, rti_mode=True, throw_errors=False,
        ls_phase_split=True,
    )
    s_ref, st_ref = jax.jit(solve, static_argnums=2)(problem, init_state(problem), rti)
    s_ao, st_ao = jax.jit(solve, static_argnums=2)(
        problem, init_state(problem), rti.replace(ls_armijo_only=True)
    )
    np.testing.assert_array_equal(np.asarray(s_ao.u), np.asarray(s_ref.u))
    np.testing.assert_array_equal(np.asarray(s_ao.x), np.asarray(s_ref.x))
    assert np.isnan(float(st_ao.dphi))


def test_grid_x_only_matches_full_payload_grid():
    """ls_grid_x_only (trials carry phi + states only; payload rebuilt
    knot-parallel post-selection) reproduces the payload-carrying grid
    exactly: same iterates, same stats, both with and without the
    strong-Wolfe first trial."""
    problem = _bounded_di_problem()
    for armijo_only in (False, True):
        base = SolverOptions(
            parallel_linesearch=True, use_backtracking_linesearch=True,
            ls_phase_split=True, ls_armijo_only=armijo_only,
            throw_errors=False,
        )
        s_ref, st_ref = jax.jit(solve, static_argnums=2)(
            problem, init_state(problem), base.replace(ls_grid_x_only=False)
        )
        s_new, st_new = jax.jit(solve, static_argnums=2)(
            problem, init_state(problem), base.replace(ls_grid_x_only=True)
        )
        np.testing.assert_allclose(
            np.asarray(s_new.u), np.asarray(s_ref.u), rtol=0, atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(s_new.x), np.asarray(s_ref.x), rtol=0, atol=1e-12
        )
        np.testing.assert_array_equal(
            np.asarray(st_new.iterations), np.asarray(st_ref.iterations)
        )
        np.testing.assert_array_equal(
            np.asarray(st_new.status), np.asarray(st_ref.status)
        )
        np.testing.assert_allclose(
            float(st_new.merit_value), float(st_ref.merit_value), rtol=1e-12
        )
