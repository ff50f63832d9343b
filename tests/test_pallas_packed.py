"""Packed single-lane latency Riccati kernel vs. the scan reference.

Runs in interpreter mode on the CPU test backend; the compiled path is
exercised on real TPU hardware by the @pytest.mark.tpu test in
tests/tpu/test_on_device.py and the scripts/proto_n500.py measurements
(docs/PERF.md). Contract under test: ops/pallas_packed matches
tvlqr.tvlqr_backward (== reference tvlqr.cpp:124-191) on unbatched
operands, including symmetrization, diagonal costs, the affine term,
and the Cholesky failure bookkeeping.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from altro_tpu.ops.pallas_packed import riccati_backward_pallas_packed
from altro_tpu.tvlqr import tvlqr_backward


def make_problem(N, n=4, m=2, seed=0):
    rng = np.random.default_rng(seed)
    A = (np.tile(np.eye(n, dtype=np.float32), (N, 1, 1))
         + 0.05 * rng.standard_normal((N, n, n)).astype(np.float32))
    B = 0.2 * rng.standard_normal((N, n, m)).astype(np.float32)
    f = 0.02 * rng.standard_normal((N, n)).astype(np.float32)

    def spd(count, d):
        W = rng.standard_normal((count, d, d)).astype(np.float32)
        return np.einsum("kij,klj->kil", W, W) / d + np.eye(d, dtype=np.float32)

    lxx = spd(N + 1, n)
    luu = spd(N, m)
    lux = 0.05 * rng.standard_normal((N, m, n)).astype(np.float32)
    lx = rng.standard_normal((N + 1, n)).astype(np.float32)
    lu = rng.standard_normal((N, m)).astype(np.float32)
    return A, B, f, lxx, luu, lux, lx, lu


def assert_gains_close(out, ref, atol=5e-5):
    np.testing.assert_allclose(out.K, np.asarray(ref.K), atol=atol)
    np.testing.assert_allclose(out.d, np.asarray(ref.d), atol=atol)
    np.testing.assert_allclose(out.P, np.asarray(ref.P), atol=10 * atol)
    np.testing.assert_allclose(out.p, np.asarray(ref.p), atol=10 * atol)
    np.testing.assert_allclose(out.delta_V, np.asarray(ref.delta_V),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("symmetrize", [False, True])
def test_matches_scan(symmetrize):
    A, B, f, lxx, luu, lux, lx, lu = make_problem(N=40)
    ref = tvlqr_backward(A, B, f, lxx, luu, lux, lx, lu, reg=0.01,
                         symmetrize=symmetrize)
    out = riccati_backward_pallas_packed(
        A, B, lxx, luu, lx, lu, reg=0.01, lux=lux, f=f,
        symmetrize=symmetrize, interpret=True)
    assert bool(ref.ok) and bool(out.ok)
    assert int(out.fail_index) == int(ref.fail_index) == 40
    assert_gains_close(out, ref)


def test_no_lux_no_f():
    A, B, f, lxx, luu, lux, lx, lu = make_problem(N=25, seed=3)
    fz = jnp.zeros_like(jnp.asarray(f))
    ref = tvlqr_backward(A, B, fz, lxx, luu, None, lx, lu, reg=0.0,
                         symmetrize=True)
    out = riccati_backward_pallas_packed(
        A, B, lxx, luu, lx, lu, reg=0.0, symmetrize=True, interpret=True)
    assert_gains_close(out, ref)


def test_diagonal_costs():
    A, B, f, _, _, _, lx, lu = make_problem(N=30, seed=5)
    rng = np.random.default_rng(7)
    lxx = (np.abs(rng.standard_normal((31, 4))) + 0.5).astype(np.float32)
    luu = (np.abs(rng.standard_normal((30, 2))) + 0.5).astype(np.float32)
    fz = jnp.zeros((30, 4), jnp.float32)
    ref = tvlqr_backward(A, B, fz, lxx, luu, None, lx, lu, reg=0.01,
                         symmetrize=True)
    out = riccati_backward_pallas_packed(
        A, B, lxx, luu, lx, lu, reg=0.01, symmetrize=True, interpret=True)
    assert_gains_close(out, ref)


def test_failure_bookkeeping():
    A, B, _, lxx, luu, _, lx, lu = make_problem(N=20, seed=11)
    luu = luu.copy()
    luu[7] = -5.0 * np.eye(2, dtype=np.float32)
    luu[13] = np.diag([-2.0, 1.0]).astype(np.float32)
    fz = jnp.zeros((20, 4), jnp.float32)
    ref = tvlqr_backward(A, B, fz, lxx, luu, None, lx, lu, reg=0.0)
    out = riccati_backward_pallas_packed(
        A, B, lxx, luu, lx, lu, reg=0.0, symmetrize=False, interpret=True)
    assert not bool(ref.ok) and not bool(out.ok)
    assert int(out.fail_index) == int(ref.fail_index) == 7
    # failed knots emit exactly zero gains, recursion continues (P = Qxx)
    assert float(jnp.abs(out.K[7]).max()) == 0.0
    assert float(jnp.abs(out.d[13]).max()) == 0.0
    np.testing.assert_allclose(out.K, np.asarray(ref.K), atol=5e-5)
    np.testing.assert_allclose(out.P, np.asarray(ref.P), atol=2e-4)


def test_quadrotor_blocks_n12_m4():
    # n = 12 exercises the two-row-group (G=2) path end to end
    A, B, f, lxx, luu, lux, lx, lu = make_problem(N=20, n=12, m=4, seed=17)
    ref = tvlqr_backward(A, B, f, lxx, luu, lux, lx, lu, reg=0.01,
                         symmetrize=True)
    out = riccati_backward_pallas_packed(
        A, B, lxx, luu, lx, lu, reg=0.01, lux=lux, f=f, symmetrize=True,
        interpret=True)
    assert bool(ref.ok) and bool(out.ok)
    assert_gains_close(out, ref)


def test_rejects_oversize_blocks():
    A = jnp.zeros((4, 20, 20), jnp.float32)
    B = jnp.zeros((4, 20, 8), jnp.float32)
    lxx = jnp.zeros((5, 20, 20), jnp.float32)
    luu = jnp.zeros((4, 8, 8), jnp.float32)
    lx = jnp.zeros((5, 20), jnp.float32)
    lu = jnp.zeros((4, 8), jnp.float32)
    with pytest.raises(ValueError, match="packed"):
        riccati_backward_pallas_packed(A, B, lxx, luu, lx, lu, interpret=True)


def test_pendulum_shapes_n2_m1():
    # n=2, m=1 exercises the single-control Cholesky degenerate case
    A, B, f, lxx, luu, lux, lx, lu = make_problem(N=15, n=2, m=1, seed=13)
    ref = tvlqr_backward(A, B, f, lxx, luu, lux, lx, lu, reg=0.001,
                         symmetrize=True)
    out = riccati_backward_pallas_packed(
        A, B, lxx, luu, lx, lu, reg=0.001, lux=lux, f=f, symmetrize=True,
        interpret=True)
    assert_gains_close(out, ref)


def test_solver_dispatch_interpret(monkeypatch):
    """pallas_latency_backward routes an unbatched TPU-eligible solve
    through the packed kernel; solution identical to the scan path."""
    import dataclasses

    from altro_tpu.models.double_integrator import double_integrator_dynamics
    from altro_tpu.options import SolverOptions
    from altro_tpu.ops import packed_backward
    from altro_tpu.problem import Problem, lqr_cost_from_reference
    from altro_tpu.solver import init_state, solve

    N, n, m = 10, 4, 2
    xref = jnp.zeros((N + 1, n), jnp.float32)
    uref = jnp.zeros((N + 1, m), jnp.float32)
    problem = Problem(
        N=N, n=n, m=m, dynamics=double_integrator_dynamics(2),
        dynamics_jac=None, constraints=(),
        cost=lqr_cost_from_reference(
            jnp.full((N + 1, n), 1.0, jnp.float32),
            jnp.full((N + 1, m), 0.1, jnp.float32), xref, uref),
        h=jnp.full(N, 0.1, jnp.float32),
        x0=jnp.asarray([1.0, -0.5, 0.2, 0.1], jnp.float32),
    )
    state = init_state(problem)
    base = SolverOptions(throw_errors=False, verbose=0)
    ref = solve(problem, state,
                dataclasses.replace(base, pallas_latency_backward=False))
    monkeypatch.setattr(packed_backward, "_FORCE_INTERPRET", True)
    got = solve(problem, state,
                dataclasses.replace(base, pallas_latency_backward=True))
    assert int(ref[1].iterations) == int(got[1].iterations)
    np.testing.assert_allclose(np.asarray(got[0].x), np.asarray(ref[0].x),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[0].u), np.asarray(ref[0].u),
                               atol=1e-5)
