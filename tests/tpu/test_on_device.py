"""On-device (real TPU) regression subset — VERDICT r2 item 6.

The 182-test correctness suite runs f64 on CPU (with Pallas kernels in
interpret mode); the only on-hardware executions used to be bench runs.
These tests give a one-command on-device check:

    ALTRO_TPU_TESTS=1 python -m pytest tests/ -q -n 0

Covers: fused-kernel parity vs the scan on device, the tiled
(lane-tile, zero-relayout) kernel incl. the diagonal fast path, one
batched closed-loop MPC tick at headline shapes, and a heterogeneous
per-knot-dims solve — all in f32 on the real backend.
"""

import dataclasses

import numpy as np
import pytest

pytestmark = pytest.mark.tpu

N, n, m = 30, 4, 2


def _rand_lqr_operands(jnp, B):
    rng = np.random.default_rng(1)
    A = jnp.asarray(
        np.tile(np.eye(n), (B, N, 1, 1)) + 0.05 * rng.standard_normal((B, N, n, n)),
        jnp.float32)
    Bm = jnp.asarray(0.3 * rng.standard_normal((B, N, n, m)), jnp.float32)
    f = jnp.zeros((B, N, n), jnp.float32)
    lxx = jnp.asarray(np.tile(np.eye(n), (B, N + 1, 1, 1)), jnp.float32)
    luu = jnp.asarray(np.tile(np.eye(m), (B, N, 1, 1)), jnp.float32)
    lux = jnp.zeros((B, N, m, n), jnp.float32)
    lx = jnp.asarray(rng.standard_normal((B, N + 1, n)), jnp.float32)
    lu = jnp.asarray(rng.standard_normal((B, N, m)), jnp.float32)
    return A, Bm, f, lxx, luu, lux, lx, lu


def test_device_is_tpu():
    import jax

    assert jax.devices()[0].platform != "cpu", jax.devices()


def test_fused_kernel_parity_vs_scan():
    import jax
    import jax.numpy as jnp

    from altro_tpu.ops.pallas_riccati import BATCH_TILE, riccati_backward_pallas
    from altro_tpu.tvlqr import tvlqr_backward

    A, Bm, f, lxx, luu, lux, lx, lu = _rand_lqr_operands(jnp, BATCH_TILE)
    out = jax.jit(
        lambda *a: riccati_backward_pallas(*a, reg=0.0)
    )(A, Bm, f, lxx, luu, lux, lx, lu)
    ref = jax.jit(jax.vmap(lambda *a: tvlqr_backward(*a)))(
        A, Bm, f, lxx, luu, lux, lx, lu)
    assert bool(jnp.all(out.ok)) and bool(jnp.all(ref.ok))
    assert float(jnp.max(jnp.abs(out.K - ref.K))) < 1e-3
    assert float(jnp.max(jnp.abs(out.d - ref.d))) < 1e-3
    assert float(jnp.max(jnp.abs(out.P - ref.P))) < 1e-2


@pytest.mark.parametrize("diag", [False, True])
def test_tiled_kernel_parity_vs_scan(diag):
    import jax
    import jax.numpy as jnp

    from altro_tpu.ops.pallas_riccati import (
        BATCH_TILE,
        batch_to_tiles,
        riccati_backward_pallas_tiled,
        tiles_to_batch,
    )
    from altro_tpu.tvlqr import tvlqr_backward

    A, Bm, f, lxx, luu, lux, lx, lu = _rand_lqr_operands(jnp, BATCH_TILE)
    if diag:
        lxx_in = batch_to_tiles(jnp.ones((BATCH_TILE, N + 1, n), jnp.float32))
        luu_in = batch_to_tiles(jnp.ones((BATCH_TILE, N, m), jnp.float32))
    else:
        lxx_in, luu_in = batch_to_tiles(lxx), batch_to_tiles(luu)
    reg_t = jnp.zeros((1, 8, 128), jnp.float32)
    out = jax.jit(
        lambda *a: riccati_backward_pallas_tiled(*a, reg_t, lux=None,
                                                 diag_cost=diag)
    )(batch_to_tiles(A), batch_to_tiles(Bm), lxx_in, luu_in,
      batch_to_tiles(lx), batch_to_tiles(lu))
    ref = jax.jit(jax.vmap(lambda *a: tvlqr_backward(*a)))(
        A, Bm, f, lxx, luu, jnp.zeros_like(lux), lx, lu)
    K, d = tiles_to_batch(out.K), tiles_to_batch(out.d)
    assert bool(jnp.all(tiles_to_batch(out.ok)))
    assert float(jnp.max(jnp.abs(K - ref.K))) < 1e-3
    assert float(jnp.max(jnp.abs(d - ref.d))) < 1e-3


def _bicycle_problem(jnp):
    from altro_tpu.cones import Cone
    from altro_tpu.io.scotty import load_scotty, synthetic_scotty
    from altro_tpu.models.bicycle import bicycle_continuous
    from altro_tpu.models.integrators import midpoint
    from altro_tpu.problem import ConstraintSpec, Problem, lqr_cost_from_reference

    dtype = jnp.float32
    try:
        ref = load_scotty()
    except FileNotFoundError:
        ref = synthetic_scotty(N=500)
    h = float(np.float32(ref.tf / ref.N))
    cost0 = lqr_cost_from_reference(
        jnp.asarray(np.tile(np.full(n, 1e-2), (N + 1, 1)), dtype),
        jnp.asarray(np.tile(np.full(m, 1e-3), (N + 1, 1)), dtype),
        jnp.asarray(ref.x[: N + 1], dtype),
        jnp.asarray(ref.u[: N + 1], dtype),
    )
    delta_max = 60 * np.pi / 180.0
    steering = ConstraintSpec(
        fn=lambda x, u, k: jnp.stack([x[3] - delta_max, -delta_max - x[3]]),
        cone=Cone.NEGATIVE_ORTHANT, dim=2,
        active=jnp.ones(N + 1, bool), label="steering bound",
        diag_hessian=True,
    )
    problem = Problem(
        N=N, n=n, m=m, dynamics=midpoint(bicycle_continuous()),
        dynamics_jac=None, constraints=(steering,), cost=cost0,
        h=jnp.full(N, h, dtype), x0=jnp.asarray(ref.x[0], dtype),
    )
    return problem, ref


def test_batched_closed_loop_tick():
    """One warm-started batched resolve + shift at headline shapes
    (B = 1024, fused Pallas backward, phase-split x-only grid search)."""
    import jax
    import jax.numpy as jnp

    from altro_tpu.mpc import shift_trajectory
    from altro_tpu.options import SolverOptions
    from altro_tpu.parallel.batch import batch_init_state
    from altro_tpu.solver import solve
    from altro_tpu.status import SolveStatus

    B = 1024
    problem, ref = _bicycle_problem(jnp)
    opts = SolverOptions(
        iterations_max=10, use_backtracking_linesearch=True,
        tol_stationarity=1e-3, tol_primal_feasibility=1e-3,
        throw_errors=False, penalty_warm_start=True,
        parallel_linesearch=True, ls_phase_split=True, ls_armijo_only=True,
        ls_grid_x_only=True, ls_max_iters=8, pallas_backward=True,
    )
    key = jax.random.PRNGKey(0)
    x0 = jnp.asarray(ref.x[0], jnp.float32)[None, :] + 0.02 * jax.random.normal(
        key, (B, n), jnp.float32)
    states = batch_init_state(problem, B)
    states = dataclasses.replace(
        states,
        u=jnp.tile(jnp.asarray([ref.u[0][0], 0.0], jnp.float32), (B, N, 1)),
        x=jnp.tile(jnp.asarray(ref.x[: N + 1], jnp.float32), (B, 1, 1)),
    )

    @jax.jit
    def tick(x0, states):
        def resolve(x0i, st):
            prob = dataclasses.replace(problem, x0=x0i)
            return solve(prob, st, opts)

        states, stats = jax.vmap(resolve)(x0, states)
        states = jax.vmap(shift_trajectory)(states)
        return states, stats

    states, stats = jax.block_until_ready(tick(x0, states))
    success = float(jnp.mean(stats.status == int(SolveStatus.SUCCESS)))
    assert success > 0.95, f"resolve success {success}"
    assert bool(jnp.all(jnp.isfinite(states.x)))
    assert float(jnp.mean(stats.iterations)) < 5.0


def test_hetero_dims_solve_on_device():
    """Heterogeneous per-knot dims through the public API, f32 on device."""
    import jax.numpy as jnp

    from altro_tpu.api import ALTROSolver
    from altro_tpu.status import SolveStatus

    Nh, H = 10, 0.1

    def dyn_a(x, u, hh, k):
        p, v = x[0], x[1]
        return jnp.stack([p + v * hh + 0.5 * u[0] * hh * hh, v + u[0] * hh])

    def dyn_t(x, u, hh, k):
        p, v = x[0], x[1]
        return jnp.stack(
            [p + v * hh + 0.5 * u[0] * hh * hh, v + u[0] * hh, p * hh])

    def dyn_b(x, u, hh, k):
        p, v, s = x[0], x[1], x[2]
        return jnp.stack(
            [p + v * hh + 0.5 * u[0] * hh * hh,
             v + (u[0] - u[1] * v) * hh, s + p * hh])

    s = ALTROSolver(Nh)
    s.set_dimension(2, 1, 0, 5)
    s.set_dimension(3, 2, 5, Nh + 1)
    s.set_time_step(H)
    s.set_explicit_dynamics(dyn_a, k_start=0, k_stop=4)
    s.set_explicit_dynamics(dyn_t, k_start=4, k_stop=5)
    s.set_explicit_dynamics(dyn_b, k_start=5, k_stop=Nh)
    s.set_lqr_cost([1.0, 1.0], [0.1], [1.0, 0.0], [0.0], 0, 5)
    s.set_lqr_cost([1.0, 1.0, 0.5], [0.1, 0.1], [1.0, 0.0, 0.0],
                   [0.0, 0.0], 5, Nh + 1)
    s.set_initial_state([0.0, 0.0])
    s.initialize()
    s.solve()
    assert s.get_status() == SolveStatus.SUCCESS
    xN = np.asarray(s.get_state(Nh))
    # f64 CPU golden for this problem (x64 API run in this repo):
    # xN = [0.24266399, 0.18839072, 0.09557635]
    np.testing.assert_allclose(
        xN, [0.24266399, 0.18839072, 0.09557635], atol=2e-4)


def test_tiled_solve_quadrotor_parity_on_device():
    """n=12/m=4 tiled solve vs vmap(solve) on the real device (the
    quadrotor waypoint bench path; too slow for interpret mode on CPU)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from altro_tpu import tile_solver
    from altro_tpu.models.integrators import rk4
    from altro_tpu.models.quadrotor import quadrotor_continuous
    from altro_tpu.options import SolverOptions
    from altro_tpu.parallel.batch import batch_init_state
    from altro_tpu.problem import Problem, lqr_cost_from_reference
    from altro_tpu.solver import solve

    B, Nq, nq, mq = 1024, 10, 12, 4
    hover = 0.5 * 9.81 / 4.0
    xf = np.zeros(nq)
    xf[:3] = [1.0, 0.0, 1.0]
    Qd = np.tile(np.concatenate(
        [np.full(3, 1.0), np.full(3, 0.1), np.full(6, 0.1)]), (Nq + 1, 1))
    problem = Problem(
        N=Nq, n=nq, m=mq, dynamics=rk4(quadrotor_continuous()),
        dynamics_jac=None, constraints=(),
        cost=lqr_cost_from_reference(
            jnp.asarray(Qd, jnp.float32), jnp.full((Nq + 1, mq), 1e-2, jnp.float32),
            jnp.asarray(np.tile(xf, (Nq + 1, 1)), jnp.float32),
            jnp.full((Nq + 1, mq), hover, jnp.float32),
        ),
        h=jnp.full(Nq, 0.05, jnp.float32), x0=jnp.zeros(nq, jnp.float32),
    )
    rng = np.random.default_rng(2)
    x0b = jnp.asarray(0.05 * rng.standard_normal((B, nq)), jnp.float32)
    states = batch_init_state(problem, B)
    states = dataclasses.replace(states, u=jnp.full((B, Nq, mq), hover, jnp.float32))
    opts = SolverOptions(
        iterations_max=3, tol_stationarity=1e-3, tol_primal_feasibility=1e-3,
        throw_errors=False, use_backtracking_linesearch=True,
        penalty_warm_start=True, parallel_linesearch=True, ls_phase_split=True,
        ls_armijo_only=True, ls_grid_x_only=True, ls_max_iters=8,
        pallas_backward=True, tol_stationarity_rel=1e-5,
    )

    def resolve(x0i, st):
        return solve(dataclasses.replace(problem, x0=x0i), st, opts)

    sv, tv = jax.jit(jax.vmap(resolve))(x0b, states)

    prob_t = dataclasses.replace(problem, x0=tile_solver.batch_to_tiles(x0b))
    prob_axes = dataclasses.replace(
        problem,
        cost=dataclasses.replace(problem.cost, Q=False, R=False, q=False,
                                 r=False, c=False),
        h=False, x0=True, A=False, B=False, f_aff=False, constraints=(),
    )
    st_t, tt_t = jax.jit(
        lambda s: tile_solver.solve_tiled(prob_t, prob_axes, s, opts)
    )(tile_solver.state_to_tiles(states))
    st = tile_solver.state_from_tiles(st_t)
    tt = tile_solver.stats_from_tiles(tt_t)

    du = jnp.max(jnp.abs(sv.u - st.u).reshape(B, -1), axis=1)
    frac = float(jnp.mean((du < 2e-3).astype(jnp.float32)))
    assert frac > 0.999, f"u agreement {frac}"
    agree = float(jnp.mean((tv.iterations == tt.iterations).astype(jnp.float32)))
    assert agree > 0.99, f"iterations agreement {agree}"


@pytest.mark.parametrize("nl,ml", [(4, 2), (12, 4)])
def test_packed_latency_kernel_parity_on_device(nl, ml):
    """Single-lane packed latency kernel (ops/pallas_packed.py) compiled
    on the real device matches the scan at N=120 (chunked grid). The
    (12, 4) case exercises the G=2 row-group layout (quadrotor-class
    blocks) — the tightly-packed unaligned lane layout the module
    docstring flags as Mosaic-fragile, previously validated only in
    interpreter mode (ADVICE r3)."""
    import jax
    import jax.numpy as jnp

    from altro_tpu.ops.pallas_packed import (
        packed_supported,
        riccati_backward_pallas_packed,
    )
    from altro_tpu.tvlqr import tvlqr_backward

    assert packed_supported(nl, ml)
    Nl = 120
    rng = np.random.default_rng(3)
    A = jnp.asarray(
        np.tile(np.eye(nl), (Nl, 1, 1)) + 0.02 * rng.standard_normal((Nl, nl, nl)),
        jnp.float32)
    Bm = jnp.asarray(0.2 * rng.standard_normal((Nl, nl, ml)), jnp.float32)
    fz = jnp.zeros((Nl, nl), jnp.float32)
    lxx = jnp.asarray(np.tile(np.eye(nl) * 0.01, (Nl + 1, 1, 1)), jnp.float32)
    luu = jnp.asarray(np.tile(np.eye(ml) * 0.001, (Nl, 1, 1)), jnp.float32)
    lx = jnp.asarray(0.1 * rng.standard_normal((Nl + 1, nl)), jnp.float32)
    lu = jnp.asarray(0.01 * rng.standard_normal((Nl, ml)), jnp.float32)

    ref = tvlqr_backward(A, Bm, fz, lxx, luu, None, lx, lu, reg=0.0,
                         symmetrize=True)
    got = riccati_backward_pallas_packed(A, Bm, lxx, luu, lx, lu, reg=0.0,
                                         symmetrize=True)
    assert bool(got.ok)
    scale = float(jnp.max(jnp.abs(ref.K)))
    assert float(jnp.max(jnp.abs(got.K - ref.K))) <= 1e-3 * max(scale, 1.0)
    assert float(jnp.max(jnp.abs(got.d - ref.d))) <= 1e-3
    assert float(jnp.max(jnp.abs(got.P - ref.P))) <= 1e-2


def test_trial_rollout_kernel_parity_on_device():
    """Packed trial-rollout kernel (ops/pallas_rollout.py) compiled on
    the real device matches the portable scan grid (bicycle tile step
    in-kernel).

    Horizon and tolerances are deliberate: Mosaic's transcendental
    implementations (sin/cos/tan) differ from XLA's by a few ULP, and a
    sequential nonlinear rollout amplifies that seed difference
    exponentially (measured on this fixture: ~4e-6 per knot growing at
    ~e^0.15/knot — 0.57 absolute by knot 90 even with STABILIZING
    gains). A 30-step horizon keeps the amplification bounded so the
    check is about kernel correctness, not transcendental ULP parity;
    interpret-mode tests cover exact per-step math at N=120
    (tests/test_pallas_rollout.py, same implementations both sides)."""
    import jax
    import jax.numpy as jnp

    from altro_tpu.io.scotty import load_scotty, synthetic_scotty
    from altro_tpu.models.bicycle import bicycle_continuous
    from altro_tpu.models.integrators import midpoint
    from altro_tpu.models.tile_steps import bicycle_tile, midpoint_tile
    from altro_tpu.ops.pallas_rollout import _pallas_rollout, _scan_rollout
    from altro_tpu.problem import lqr_cost_from_reference

    Nl = 30
    try:
        ref = load_scotty()
    except FileNotFoundError:
        ref = synthetic_scotty(N=500)
    cost = lqr_cost_from_reference(
        jnp.full((Nl + 1, 4), 1e-2, jnp.float32),
        jnp.full((Nl + 1, 2), 1e-3, jnp.float32),
        jnp.asarray(ref.x[: Nl + 1], jnp.float32),
        jnp.asarray(ref.u[: Nl + 1], jnp.float32))
    rng = np.random.default_rng(5)
    xref = jnp.asarray(ref.x[: Nl + 1], jnp.float32)
    uref = jnp.asarray(ref.u[:Nl] + 0.01 * rng.standard_normal((Nl, 2)),
                       jnp.float32)
    h = jnp.full((Nl,), float(np.float32(ref.tf / ref.N)), jnp.float32)
    # STABILIZING gains from a real backward pass (production shape).
    # Random gains make the 120-step closed loop chaotic and amplify the
    # legitimate ULP differences between Mosaic's and XLA's
    # transcendental implementations into O(1) phi divergence — that
    # failure mode is about the fixture, not the kernel.
    from altro_tpu.problem import Problem
    from altro_tpu.solver import (
        _cost_expansions_and_cost,
        dynamics_expansions,
    )
    from altro_tpu.tvlqr import tvlqr_backward

    problem = Problem(
        N=Nl, n=4, m=2, dynamics=midpoint(bicycle_continuous()),
        dynamics_jac=None, constraints=(), cost=cost, h=h,
        x0=jnp.asarray(ref.x[0], jnp.float32))
    xfull = jnp.concatenate([xref[:Nl], xref[Nl][None]], axis=0)
    lx, lu, lxx, luu, lux, _ = _cost_expansions_and_cost(
        problem, xfull, uref, (), jnp.asarray(1.0, jnp.float32))
    A, Bm = dynamics_expansions(problem, xfull, uref)
    g = tvlqr_backward(A, Bm, jnp.zeros_like(lx[:Nl]), lxx, luu, lux,
                       lx, lu, reg=0.0, symmetrize=True)
    K, d = g.K, g.d
    alphas = jnp.asarray([1.0, 0.5, 0.25, 0.125, 0.0625, 0.03125,
                          0.015625, 0.0078125], jnp.float32)
    x0 = jnp.asarray(ref.x[0], jnp.float32)
    step_tile = midpoint_tile(bicycle_tile())
    args = (step_tile, alphas, x0, xref, uref, K, d,
            cost.Q, cost.q, cost.R, cost.r, cost.c, h)
    phi_s, x_s = _scan_rollout(*args)
    phi_k, x_k = _pallas_rollout(*args)
    scale = float(jnp.max(jnp.abs(phi_s)))
    # tolerance covers the bounded 30-step ULP amplification (docstring)
    assert float(jnp.max(jnp.abs(phi_k - phi_s))) < 2e-3 * max(scale, 1.0)
    assert float(jnp.max(jnp.abs(x_k - x_s))) < 2e-3


def test_trial_rollout_kernel_constrained_parity_on_device():
    """Round 5: the in-kernel affine AL constraint term (bounds riding
    the packed rollout kernel) compiled on the REAL device matches the
    portable scan grid, with active bounds and nonzero duals. Same
    N=30/stabilizing-gain fixture discipline as the unconstrained
    on-device test above."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from altro_tpu.cones import Cone
    from altro_tpu.io.scotty import load_scotty, synthetic_scotty
    from altro_tpu.models.bicycle import bicycle_continuous
    from altro_tpu.models.integrators import midpoint
    from altro_tpu.models.tile_steps import bicycle_tile, midpoint_tile
    from altro_tpu.ops.pallas_rollout import (
        _pallas_rollout,
        _scan_rollout,
        affine_constraint_stacks,
    )
    from altro_tpu.problem import (
        ConstraintSpec,
        Problem,
        lqr_cost_from_reference,
    )
    from altro_tpu.solver import (
        _cost_expansions_and_cost,
        dynamics_expansions,
    )
    from altro_tpu.tvlqr import tvlqr_backward

    Nl = 30
    try:
        ref = load_scotty()
    except FileNotFoundError:
        ref = synthetic_scotty(N=500)
    cost = lqr_cost_from_reference(
        jnp.full((Nl + 1, 4), 1e-2, jnp.float32),
        jnp.full((Nl + 1, 2), 1e-3, jnp.float32),
        jnp.asarray(ref.x[: Nl + 1], jnp.float32),
        jnp.asarray(ref.u[: Nl + 1], jnp.float32))
    rng = np.random.default_rng(6)
    xref = jnp.asarray(ref.x[: Nl + 1], jnp.float32)
    uref = jnp.asarray(ref.u[:Nl] + 0.01 * rng.standard_normal((Nl, 2)),
                       jnp.float32)
    h = jnp.full((Nl,), float(np.float32(ref.tf / ref.N)), jnp.float32)
    # tight bound so the AL term is ACTIVE along the rollouts
    steering = ConstraintSpec(
        fn=lambda x, u, k: jnp.stack([x[3] - 0.01, -0.01 - x[3]]),
        cone=Cone.NEGATIVE_ORTHANT, dim=2,
        active=jnp.ones(Nl + 1, bool), label="steering",
        diag_hessian=True, affine=True)
    problem = Problem(
        N=Nl, n=4, m=2, dynamics=midpoint(bicycle_continuous()),
        dynamics_jac=None, constraints=(steering,), cost=cost, h=h,
        x0=jnp.asarray(ref.x[0], jnp.float32))
    z = (jnp.asarray(0.1 * rng.standard_normal((Nl + 1, 2)), jnp.float32),)
    rho = jnp.asarray(2.5, jnp.float32)
    xfull = jnp.concatenate([xref[:Nl], xref[Nl][None]], axis=0)
    lx, lu, lxx, luu, lux, _ = _cost_expansions_and_cost(
        problem, xfull, uref, z, rho)
    A, Bm = dynamics_expansions(problem, xfull, uref)
    g = tvlqr_backward(A, Bm, jnp.zeros_like(lx[:Nl]), lxx, luu, lux,
                       lx, lu, reg=0.0, symmetrize=True)
    alphas = jnp.asarray([1.0, 0.5, 0.25, 0.125, 0.0625, 0.03125,
                          0.015625, 0.0078125], jnp.float32)
    ax, au, gg, act = affine_constraint_stacks(problem)
    con = (rho * ax * act[..., None], rho * au * act[..., None],
           (jnp.concatenate(z, axis=1) - rho * gg) * act,
           1.0 / (2.0 * rho))
    args = (midpoint_tile(bicycle_tile()), alphas,
            jnp.asarray(ref.x[0], jnp.float32), xref, uref, g.K, g.d,
            cost.Q, cost.q, cost.R, cost.r, cost.c, h)
    phi_s, x_s = _scan_rollout(*args, con=con)
    phi_k, x_k = _pallas_rollout(*args, con=con)
    # the AL term must bite
    phi_u, _ = _scan_rollout(*args)
    assert float(jnp.min(phi_s - phi_u)) > 1e-3
    scale = float(jnp.max(jnp.abs(phi_s)))
    assert float(jnp.max(jnp.abs(phi_k - phi_s))) < 2e-3 * max(scale, 1.0)
    assert float(jnp.max(jnp.abs(x_k - x_s))) < 2e-3


def test_batched_tiled_rollout_kernel_parity_on_device():
    """Round 5 (cont.): the BATCHED tiled trial-rollout kernel
    (ops/pallas_rollout_tiled.py) compiled on the REAL device matches
    the tiled XLA scan grid at one-lane-tile batch, with an active
    affine bound, nonzero duals and per-lane penalties. Same N=30 /
    stabilizing-gain fixture discipline as the packed-kernel tests
    (Mosaic-vs-XLA transcendental ULP amplification bounds the
    tolerance, see test_trial_rollout_kernel_parity_on_device)."""
    import jax.numpy as jnp

    from altro_tpu.cones import Cone
    from altro_tpu.io.scotty import load_scotty, synthetic_scotty
    from altro_tpu.models.bicycle import bicycle_continuous
    from altro_tpu.models.integrators import midpoint
    from altro_tpu.models.tile_steps import bicycle_cols, midpoint_cols
    from altro_tpu.ops import tile_iter as ti
    from altro_tpu.ops.pallas_riccati import batch_to_tiles
    from altro_tpu.ops.pallas_rollout_tiled import rollout_grid_pallas_tiled
    from altro_tpu.problem import (
        ConstraintSpec,
        Problem,
        lqr_cost_from_reference,
    )
    from altro_tpu.solver import _cost_expansions_and_cost, dynamics_expansions
    from altro_tpu.tvlqr import tvlqr_backward

    Nl, B = 30, 1024
    try:
        ref = load_scotty()
    except FileNotFoundError:
        ref = synthetic_scotty(N=500)
    cost = lqr_cost_from_reference(
        jnp.full((Nl + 1, 4), 1e-2, jnp.float32),
        jnp.full((Nl + 1, 2), 1e-3, jnp.float32),
        jnp.asarray(ref.x[: Nl + 1], jnp.float32),
        jnp.asarray(ref.u[: Nl + 1], jnp.float32))
    rng = np.random.default_rng(9)
    xref = jnp.asarray(ref.x[: Nl + 1], jnp.float32)
    uref = jnp.asarray(ref.u[:Nl] + 0.01 * rng.standard_normal((Nl, 2)),
                       jnp.float32)
    h = jnp.full((Nl,), float(np.float32(ref.tf / ref.N)), jnp.float32)
    steering = ConstraintSpec(
        fn=lambda x, u, k: jnp.stack([x[3] - 0.01, -0.01 - x[3]]),
        cone=Cone.NEGATIVE_ORTHANT, dim=2,
        active=jnp.ones(Nl + 1, bool), label="steering",
        diag_hessian=True, affine=True)
    problem = Problem(
        N=Nl, n=4, m=2, dynamics=midpoint(bicycle_continuous()),
        dynamics_jac=None, constraints=(steering,), cost=cost, h=h,
        x0=jnp.asarray(ref.x[0], jnp.float32),
        dynamics_cols=midpoint_cols(bicycle_cols()))
    z1 = (jnp.asarray(0.1 * rng.standard_normal((Nl + 1, 2)), jnp.float32),)
    rho1 = jnp.asarray(2.5, jnp.float32)
    xfull = jnp.concatenate([xref[:Nl], xref[Nl][None]], axis=0)
    lx, lu, lxx, luu, lux, _ = _cost_expansions_and_cost(
        problem, xfull, uref, z1, rho1)
    A, Bm = dynamics_expansions(problem, xfull, uref)
    g = tvlqr_backward(A, Bm, jnp.zeros_like(lx[:Nl]), lxx, luu, lux,
                       lx, lu, reg=0.0, symmetrize=True)
    alphas = jnp.asarray([1.0, 0.5, 0.25, 0.125, 0.0625, 0.03125,
                          0.015625, 0.0078125], jnp.float32)

    # batch: tile the single-lane fixture with per-lane x0/dual jitter
    x_t = batch_to_tiles(jnp.broadcast_to(xfull, (B,) + xfull.shape))
    u_t = batch_to_tiles(jnp.broadcast_to(uref, (B,) + uref.shape))
    K_t = batch_to_tiles(jnp.broadcast_to(g.K, (B,) + g.K.shape))
    d_t = batch_to_tiles(jnp.broadcast_to(g.d, (B,) + g.d.shape))
    zb = jnp.asarray(
        np.abs(rng.standard_normal((B, Nl + 1, 2))), jnp.float32)
    z_t = (batch_to_tiles(zb),)
    rho_t = batch_to_tiles(
        jnp.asarray(1.0 + 4.0 * rng.random((B, 1)), jnp.float32))[:, 0]
    x0b = jnp.asarray(
        np.asarray(ref.x[0])[None] + 0.01 * rng.standard_normal((B, 4)),
        jnp.float32)
    x0_t = batch_to_tiles(x0b)

    prob_axes = dataclasses.replace(
        problem,
        cost=dataclasses.replace(cost, Q=False, R=False, q=False, r=False,
                                 c=False),
        h=False, x0=True, A=False, B=False, f_aff=False,
        constraints=(dataclasses.replace(steering, active=False),))
    problem_t = dataclasses.replace(problem, x0=x0_t)
    ta = ti.TileArgs(problem_t, prob_axes, (True,))

    import jax

    phi_s, xs_s = jax.jit(
        lambda: ti.rollout_grid_tiled(
            ta, x_t, u_t, K_t, d_t, z_t, rho_t, alphas, x0_t))()
    phi_k, xs_k = jax.jit(
        lambda: rollout_grid_pallas_tiled(
            ta, x_t, u_t, K_t, d_t, z_t, rho_t, alphas, x0_t))()
    scale = float(jnp.max(jnp.abs(phi_s)))
    assert float(jnp.max(jnp.abs(phi_k - phi_s))) < 2e-3 * max(scale, 1.0)
    assert float(jnp.max(jnp.abs(xs_k - xs_s))) < 2e-3
