"""Pallas batched Riccati kernel vs. the vmapped scan kernel.

Runs in interpreter mode on the CPU test backend; the compiled path is
exercised on real TPU hardware by scripts/ and bench runs (validated at
1.2e-6 max deviation, with throughput parity vs the XLA scan at
reference scale — see BASELINE.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from altro_tpu.ops.pallas_riccati import (
    BATCH_TILE,
    batch_to_tiles,
    riccati_backward_pallas,
    riccati_backward_pallas_tiled,
    tiles_to_batch,
)
from altro_tpu.tvlqr import tvlqr_backward


def make_batch(Bsz, N, n=4, m=2, seed=0):
    rng = np.random.default_rng(seed)
    A = np.tile(np.eye(n, dtype=np.float32), (Bsz, N, 1, 1)) + 0.02 * rng.standard_normal(
        (Bsz, N, n, n)
    ).astype(np.float32)
    B = 0.3 * rng.standard_normal((Bsz, N, n, m)).astype(np.float32)
    f = 0.05 * rng.standard_normal((Bsz, N, n)).astype(np.float32)

    def spd(count, d):
        W = rng.standard_normal((Bsz, count, d, d)).astype(np.float32)
        return np.einsum("bkij,bklj->bkil", W, W) / d + np.eye(d, dtype=np.float32)

    lxx = spd(N + 1, n)
    luu = spd(N, m)
    lux = 0.02 * rng.standard_normal((Bsz, N, m, n)).astype(np.float32)
    lx = rng.standard_normal((Bsz, N + 1, n)).astype(np.float32)
    lu = rng.standard_normal((Bsz, N, m)).astype(np.float32)
    return A, B, f, lxx, luu, lux, lx, lu


def test_matches_vmapped_scan():
    args = make_batch(BATCH_TILE, N=8)
    out = riccati_backward_pallas(*args, interpret=True)
    ref = jax.vmap(tvlqr_backward)(*(jnp.asarray(a) for a in args))
    assert bool(out.ok.all()) and bool(ref.ok.all())
    np.testing.assert_allclose(out.K, np.asarray(ref.K), atol=2e-5)
    np.testing.assert_allclose(out.d, np.asarray(ref.d), atol=2e-5)
    np.testing.assert_allclose(out.P, np.asarray(ref.P), atol=2e-4)
    np.testing.assert_allclose(out.p, np.asarray(ref.p), atol=2e-4)
    np.testing.assert_allclose(out.delta_V, np.asarray(ref.delta_V), rtol=2e-4, atol=2e-4)


def test_per_lane_failure_flags():
    args = list(make_batch(BATCH_TILE, N=6))
    luu = args[4].copy()
    luu[3, 2] = -10.0 * np.eye(2, dtype=np.float32)  # break lane 3 at knot 2
    luu[3, 4] = -10.0 * np.eye(2, dtype=np.float32)  # ... and at knot 4
    args[4] = luu
    out = riccati_backward_pallas(*args, interpret=True)
    ok = np.asarray(out.ok)
    fail = np.asarray(out.fail_index)
    assert not ok[3]
    assert ok[[0, 1, 2, 4]].all()
    assert fail[3] == 2  # smallest failing knot (tvlqr_backward semantics)
    assert (fail[[0, 1, 2, 4]] == 6).all()


def test_rejects_partial_tile():
    args = make_batch(BATCH_TILE // 2, N=4)
    with pytest.raises(ValueError):
        riccati_backward_pallas(*args, interpret=True)


def test_per_lane_reg_array():
    args = make_batch(BATCH_TILE, N=5)
    reg = np.zeros(BATCH_TILE, np.float32)
    reg[7] = 0.5
    out = riccati_backward_pallas(*args, reg=jnp.asarray(reg), interpret=True)
    ref_lane = tvlqr_backward(*(jnp.asarray(a[7]) for a in args), reg=0.5)
    ref0 = tvlqr_backward(*(jnp.asarray(a[7]) for a in args), reg=0.0)
    np.testing.assert_allclose(out.K[7], np.asarray(ref_lane.K), atol=2e-5)
    assert float(jnp.max(jnp.abs(ref_lane.K - ref0.K))) > 1e-3  # reg matters


def test_custom_vmap_dispatch_matches_scan():
    """vmapping tvlqr_backward_fused routes through the Pallas kernel."""
    from altro_tpu.ops import fused_backward

    args = make_batch(BATCH_TILE, N=6)
    jargs = tuple(jnp.asarray(a) for a in args)
    reg = jnp.zeros(BATCH_TILE, jnp.float32)
    ref = jax.vmap(tvlqr_backward)(*jargs, reg)
    fused_backward._FORCE_INTERPRET = True
    try:
        out = jax.vmap(fused_backward.tvlqr_backward_fused)(*jargs, reg)
    finally:
        fused_backward._FORCE_INTERPRET = False
    np.testing.assert_allclose(out.K, np.asarray(ref.K), atol=2e-5)
    np.testing.assert_allclose(out.d, np.asarray(ref.d), atol=2e-5)
    np.testing.assert_allclose(out.P, np.asarray(ref.P), atol=2e-4)
    assert bool(out.ok.all())
    assert (np.asarray(out.fail_index) == 6).all()
    # unbatched call IS the serial scan
    one = fused_backward.tvlqr_backward_fused(*(a[0] for a in jargs),
                                              jnp.float32(0.0))
    ref1 = tvlqr_backward(*(a[0] for a in jargs), jnp.float32(0.0))
    np.testing.assert_allclose(one.K, np.asarray(ref1.K), rtol=1e-6)


def test_custom_vmap_fallback_small_batch():
    """Non-1024 batches fall back to the vmapped scan (identical results)."""
    from altro_tpu.ops.fused_backward import tvlqr_backward_fused

    args = make_batch(8, N=5)
    jargs = tuple(jnp.asarray(a) for a in args)
    reg = jnp.zeros(8, jnp.float32)
    out = jax.vmap(tvlqr_backward_fused)(*jargs, reg)
    ref = jax.vmap(tvlqr_backward)(*jargs, reg)
    np.testing.assert_allclose(out.K, np.asarray(ref.K), rtol=1e-6)


def test_solver_pallas_backward_option():
    """Batched solve with pallas_backward routes the backward pass through
    the fused kernel (forced interpret on CPU) and matches the default."""
    import dataclasses

    from altro_tpu.models.double_integrator import double_integrator_dynamics
    from altro_tpu.options import SolverOptions
    from altro_tpu.ops import fused_backward
    from altro_tpu.parallel.batch import batch_init_state
    from altro_tpu.problem import Problem, lqr_cost_from_reference
    from altro_tpu.solver import solve

    N, n, m = 6, 4, 2
    dtype = jnp.float32
    dyn, jac = double_integrator_dynamics(), None
    xf = jnp.asarray([1.0, 1.0, 0.0, 0.0], dtype)
    cost = lqr_cost_from_reference(
        jnp.full((N + 1, n), 1.0, dtype), jnp.full((N + 1, m), 1e-2, dtype),
        jnp.tile(xf, (N + 1, 1)), jnp.zeros((N + 1, m), dtype),
    )
    problem = Problem(N=N, n=n, m=m, dynamics=dyn, dynamics_jac=jac,
                      constraints=(), cost=cost, h=jnp.full(N, 0.1, dtype),
                      x0=jnp.zeros(n, dtype))
    opts = SolverOptions(iterations_max=5, use_backtracking_linesearch=True,
                         throw_errors=False, tol_stationarity=1e-3,
                         tol_primal_feasibility=1e-3)

    B = BATCH_TILE
    states = batch_init_state(problem, B)
    x0s = jnp.zeros((B, n), dtype).at[:, 0].set(
        jnp.linspace(-0.1, 0.1, B, dtype=dtype))

    def run(o):
        def one(x0, s):
            return solve(dataclasses.replace(problem, x0=x0), s, o)
        return jax.vmap(one)(x0s, states)

    ref_state, ref_stats = run(opts)
    fused_backward._FORCE_INTERPRET = True
    try:
        out_state, out_stats = run(opts.replace(pallas_backward=True))
    finally:
        fused_backward._FORCE_INTERPRET = False
    np.testing.assert_allclose(np.asarray(out_state.u), np.asarray(ref_state.u),
                               atol=5e-5)
    np.testing.assert_array_equal(np.asarray(out_stats.iterations),
                                  np.asarray(ref_stats.iterations))


def test_multi_tile_batch():
    """bt > 1 (batch = 2 x 1024): the scratch carry re-initializes at each
    tile's first grid step and the dV/flags accumulator blocks flush
    correctly at the tile boundary — the default bench batch (2048)
    exercises exactly this path."""
    args = make_batch(2 * BATCH_TILE, N=4)
    out = riccati_backward_pallas(*args, interpret=True)
    ref = jax.vmap(tvlqr_backward)(*(jnp.asarray(a) for a in args))
    assert bool(out.ok.all()) and bool(ref.ok.all())
    np.testing.assert_allclose(out.K, np.asarray(ref.K), atol=2e-5)
    np.testing.assert_allclose(out.P, np.asarray(ref.P), atol=2e-4)
    np.testing.assert_allclose(out.delta_V, np.asarray(ref.delta_V),
                               rtol=2e-4, atol=2e-4)
    # lanes in the second tile must not inherit the first tile's carry:
    # compare tile 1 against a standalone run of just that tile
    tile1 = tuple(a[BATCH_TILE:] for a in args)
    solo = riccati_backward_pallas(*tile1, interpret=True)
    np.testing.assert_array_equal(np.asarray(out.K[BATCH_TILE:]),
                                  np.asarray(solo.K))


def test_tiled_symmetrize_matches_scan_symmetrize():
    """In-kernel cost-to-go symmetrization (long-horizon f32 stabilizer)
    vs tvlqr_backward(symmetrize=True)."""
    from altro_tpu.ops.pallas_riccati import (
        batch_to_tiles,
        riccati_backward_pallas_tiled,
        tiles_to_batch,
    )

    A, B, f, lxx, luu, lux, lx, lu = make_batch(BATCH_TILE, N=8)
    reg_t = jnp.zeros((1, 8, 128), jnp.float32)
    out = riccati_backward_pallas_tiled(
        batch_to_tiles(jnp.asarray(A)), batch_to_tiles(jnp.asarray(B)),
        batch_to_tiles(jnp.asarray(lxx)), batch_to_tiles(jnp.asarray(luu)),
        batch_to_tiles(jnp.asarray(lx)), batch_to_tiles(jnp.asarray(lu)),
        reg_t, lux=batch_to_tiles(jnp.asarray(lux)), symmetrize=True,
        interpret=True)
    ref = jax.vmap(lambda *a: tvlqr_backward(*a, symmetrize=True))(
        *(jnp.asarray(a) for a in (A, B, np.zeros_like(f), lxx, luu, lux, lx, lu)))
    assert bool(tiles_to_batch(out.ok).all()) and bool(ref.ok.all())
    np.testing.assert_allclose(tiles_to_batch(out.K), np.asarray(ref.K), atol=2e-5)
    np.testing.assert_allclose(tiles_to_batch(out.P), np.asarray(ref.P), atol=2e-4)


def test_tiled_kernel_chunked_interpret(monkeypatch):
    """Chunked-grid coverage in interpret mode (round 5): C=2 at N=4 is
    small enough to compile quickly and exercises the chunk indexing
    (inner reversed loop, register-carry across knots, scratch carry
    across grid steps, fail_index arithmetic). The production-size
    chunked path is covered on hardware (tests/tpu/test_on_device.py)."""
    monkeypatch.setenv("ALTRO_TILED_CHUNK", "2")
    N, n, m = 4, 3, 2
    rng = np.random.default_rng(11)
    Bsz = BATCH_TILE
    A = jnp.asarray(np.tile(np.eye(n), (Bsz, N, 1, 1))
                    + 0.05 * rng.standard_normal((Bsz, N, n, n)), jnp.float32)
    Bm = jnp.asarray(0.3 * rng.standard_normal((Bsz, N, n, m)), jnp.float32)
    lxxd = jnp.asarray(
        np.abs(rng.standard_normal((Bsz, N + 1, n))) + 0.1, jnp.float32)
    luud = jnp.asarray(
        np.abs(rng.standard_normal((Bsz, N, m))) + 0.1, jnp.float32)
    lx = jnp.asarray(rng.standard_normal((Bsz, N + 1, n)), jnp.float32)
    lu = jnp.asarray(rng.standard_normal((Bsz, N, m)), jnp.float32)
    At = batch_to_tiles(A)
    Bt_ = batch_to_tiles(Bm)
    out = riccati_backward_pallas_tiled(
        At, Bt_, batch_to_tiles(lxxd), batch_to_tiles(luud),
        batch_to_tiles(lx), batch_to_tiles(lu),
        jnp.zeros((1, 8, 128), jnp.float32), lux=None, diag_cost=True,
        interpret=True)
    ref = jax.vmap(lambda *a: tvlqr_backward(*a))(
        A, Bm, jnp.zeros((Bsz, N, n), jnp.float32), lxxd, luud, None,
        lx, lu)
    np.testing.assert_allclose(
        np.asarray(tiles_to_batch(out.K)), np.asarray(ref.K),
        atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(tiles_to_batch(out.P)), np.asarray(ref.P),
        atol=5e-4, rtol=1e-4)
    assert bool(jnp.all(tiles_to_batch(out.ok[:, None])[:, 0]))
