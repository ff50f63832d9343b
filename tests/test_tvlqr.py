"""TVLQR kernel tests.

Goldens re-hosted from /root/reference/src/tvlqr/test/tvlqr_test.cpp
(double integrator, N=10, h=0.01, diagonal costs), plus batch/vmap
equivalence and failure-semantics tests the reference lacks.
"""

import jax
import jax.numpy as jnp
import numpy as np

from altro_tpu.tvlqr import tvlqr_backward, tvlqr_forward


def double_integrator_problem(dtype=jnp.float64):
    """The tvlqr_test.cpp problem: 2D double integrator, N=10."""
    N, dim = 10, 2
    n, m = 2 * dim, dim
    h = 0.01

    # Discrete double-integrator A, B (exact; test_utils.cpp:18-41)
    A1 = np.eye(n)
    B1 = np.zeros((n, m))
    b = h * h / 2
    for i in range(dim):
        A1[i, i + dim] = h
        B1[i, i] = b
        B1[i + dim, i] = h
    # Affine term: the reference packs f = dynamics at the equilibrium
    # point xeq=[1,2,0,0], ueq=0 (tvlqr_test.cpp:52).
    xeq = np.array([1.0, 2.0, 0.0, 0.0])
    f1 = A1 @ xeq

    Qd = np.full(n, 1.1)
    Rd = np.full(m, 0.1)
    Qfd = Qd * 100
    qk = np.full(n, 0.01)
    rk = np.full(m, 0.001)

    A = jnp.asarray(np.tile(A1, (N, 1, 1)), dtype)
    B = jnp.asarray(np.tile(B1, (N, 1, 1)), dtype)
    f = jnp.asarray(np.tile(f1, (N, 1)), dtype)
    lxx = jnp.asarray(np.concatenate([np.tile(np.diag(Qd), (N, 1, 1)), np.diag(Qfd)[None]]), dtype)
    luu = jnp.asarray(np.tile(np.diag(Rd), (N, 1, 1)), dtype)
    lux = jnp.zeros((N, m, n), dtype)
    lx = jnp.asarray(np.tile(qk, (N + 1, 1)), dtype)
    lu = jnp.asarray(np.tile(rk, (N, 1)), dtype)
    x0 = jnp.asarray([10.5, -20.5, -4.0, 5.0], dtype)
    return A, B, f, lxx, luu, lux, lx, lu, x0


K0_EXPECTED = np.array(
    [
        [0.7753129718046554, 0.0, 5.840445640045901, 0.0],
        [0.0, 0.7753129718046554, 0.0, 5.840445640045901],
    ]
)
D0_EXPECTED = np.array([-7.634078625343007, -15.256221385516275])
XN_EXPECTED = np.array(
    [20.165445369740308, -0.13732391651279308, -2.3724421496097037, 2.3113121303468707]
)
YN_EXPECTED = np.array(
    [2218.2089906714345, -15.09563081640724, -260.9586364570674, 254.2543343381558]
)


class TestBackwardPass:
    def test_golden_gains(self):
        A, B, f, lxx, luu, lux, lx, lu, x0 = double_integrator_problem()
        gains = jax.jit(tvlqr_backward)(A, B, f, lxx, luu, lux, lx, lu)
        assert bool(gains.ok)
        assert int(gains.fail_index) == A.shape[0]
        np.testing.assert_allclose(gains.K[0], K0_EXPECTED, atol=1e-6)
        np.testing.assert_allclose(gains.d[0], D0_EXPECTED, atol=1e-6)

    def test_golden_rollout(self):
        A, B, f, lxx, luu, lux, lx, lu, x0 = double_integrator_problem()
        gains = tvlqr_backward(A, B, f, lxx, luu, lux, lx, lu)
        x, u, y = jax.jit(tvlqr_forward)(A, B, f, gains.K, gains.d, gains.P, gains.p, x0)
        np.testing.assert_allclose(np.abs(x[-1] - XN_EXPECTED).max(), 0, atol=1e-6)
        np.testing.assert_allclose(np.abs(y[-1] - YN_EXPECTED).max(), 0, atol=1e-5)

    def test_terminal_cost_to_go(self):
        A, B, f, lxx, luu, lux, lx, lu, x0 = double_integrator_problem()
        gains = tvlqr_backward(A, B, f, lxx, luu, lux, lx, lu)
        np.testing.assert_allclose(gains.P[-1], lxx[-1], atol=0)
        np.testing.assert_allclose(gains.p[-1], lx[-1], atol=0)

    def test_cholesky_failure_flags_lane(self):
        A, B, f, lxx, luu, lux, lx, lu, x0 = double_integrator_problem()
        # Make Quu indefinite at knot 3 with a large negative input cost.
        luu_bad = luu.at[3].set(-10.0 * jnp.eye(2))
        gains = tvlqr_backward(A, B, f, lxx, luu_bad, lux, lx, lu)
        assert not bool(gains.ok)
        assert int(gains.fail_index) == 3
        # Outputs remain finite (failed knot gets zero gains).
        for leaf in [gains.K, gains.d, gains.P, gains.p]:
            assert bool(jnp.all(jnp.isfinite(leaf)))

    def test_regularization_recovers_failure(self):
        A, B, f, lxx, luu, lux, lx, lu, x0 = double_integrator_problem()
        luu_bad = luu.at[3].set(-10.0 * jnp.eye(2))
        assert not bool(tvlqr_backward(A, B, f, lxx, luu_bad, lux, lx, lu).ok)
        assert bool(tvlqr_backward(A, B, f, lxx, luu_bad, lux, lx, lu, reg=20.0).ok)

    def test_vmap_batch_equivalence(self):
        A, B, f, lxx, luu, lux, lx, lu, x0 = double_integrator_problem()
        batch = 4
        # Perturb lx across the batch.
        lx_b = jnp.stack([lx * (1.0 + 0.1 * i) for i in range(batch)])

        def solve_one(lx_i):
            g = tvlqr_backward(A, B, f, lxx, luu, lux, lx_i, lu)
            return tvlqr_forward(A, B, f, g.K, g.d, g.P, g.p, x0)

        xb, ub, yb = jax.vmap(solve_one)(lx_b)
        for i in range(batch):
            xi, ui, yi = solve_one(lx_b[i])
            np.testing.assert_allclose(xb[i], xi, atol=1e-10)
            np.testing.assert_allclose(ub[i], ui, atol=1e-10)
            np.testing.assert_allclose(yb[i], yi, atol=1e-10)

    def test_f32_tolerance_ladder(self):
        """The f32 performance configuration matches f64 to batch-friendly tol."""
        args64 = double_integrator_problem(jnp.float64)
        args32 = double_integrator_problem(jnp.float32)
        g64 = tvlqr_backward(*args64[:8])
        g32 = tvlqr_backward(*args32[:8])
        np.testing.assert_allclose(g32.K[0], np.asarray(g64.K[0]), rtol=2e-3, atol=1e-4)
        np.testing.assert_allclose(g32.d[0], np.asarray(g64.d[0]), rtol=2e-3, atol=1e-4)


class TestDiagonalFastPath:
    """Diagonal-cost fast path (reference is_diag, tvlqr.cpp:85-89,125-128):
    lxx/luu passed as diagonals with lux=None must reproduce the dense call."""

    def test_diag_equals_dense(self):
        import numpy as np

        rng = np.random.default_rng(3)
        N, n, m = 20, 4, 2
        A = jnp.asarray(np.tile(np.eye(n), (N, 1, 1)) + 0.05 * rng.standard_normal((N, n, n)))
        B = jnp.asarray(0.3 * rng.standard_normal((N, n, m)))
        f = jnp.asarray(0.01 * rng.standard_normal((N, n)))
        lxxd = jnp.asarray(0.5 + rng.random((N + 1, n)))
        luud = jnp.asarray(0.5 + rng.random((N, m)))
        lx = jnp.asarray(rng.standard_normal((N + 1, n)))
        lu = jnp.asarray(rng.standard_normal((N, m)))
        dense = tvlqr_backward(
            A, B, f, jax.vmap(jnp.diag)(lxxd), jax.vmap(jnp.diag)(luud),
            jnp.zeros((N, m, n)), lx, lu)
        diag = tvlqr_backward(A, B, f, lxxd, luud, None, lx, lu)
        np.testing.assert_allclose(diag.K, dense.K, atol=1e-12)
        np.testing.assert_allclose(diag.d, dense.d, atol=1e-12)
        np.testing.assert_allclose(diag.P, dense.P, atol=1e-12)
        np.testing.assert_allclose(diag.delta_V, dense.delta_V, atol=1e-12)
        assert bool(diag.ok)

    def test_solver_diag_mode_matches_dense(self):
        """End-to-end: an eligible problem (diagonal cost + diag_hessian
        bound constraint) solved with diag_expansion on vs off gives the
        same iterates and stats (f64)."""
        import dataclasses

        import numpy as np

        from altro_tpu.cones import Cone
        from altro_tpu.models.double_integrator import double_integrator_dynamics
        from altro_tpu.options import SolverOptions
        from altro_tpu.problem import ConstraintSpec, Problem, lqr_cost_from_reference
        from altro_tpu.solver import init_state, solve

        N, dim = 10, 2
        n, m = 2 * dim, dim
        bound = ConstraintSpec(
            fn=lambda x, u, k: jnp.concatenate([u - 0.5, -0.5 - u]),
            cone=Cone.NEGATIVE_ORTHANT, dim=2 * m,
            active=jnp.ones(N + 1, bool).at[N].set(False),
            label="control bound", diag_hessian=True,
        )
        problem = Problem(
            N=N, n=n, m=m, dynamics=double_integrator_dynamics(dim),
            dynamics_jac=None, constraints=(bound,),
            cost=lqr_cost_from_reference(
                jnp.ones((N + 1, n)), jnp.full((N + 1, m), 1e-2),
                jnp.zeros((N + 1, n)), jnp.zeros((N + 1, m)),
            ),
            h=jnp.full(N, 0.1), x0=jnp.asarray([1.0, 2.0, 0.0, 0.0]),
        )
        state = init_state(problem)
        opts_on = SolverOptions(iterations_max=30, throw_errors=False,
                                diag_expansion=True)
        opts_off = dataclasses.replace(opts_on, diag_expansion=False)
        s_on, t_on = jax.jit(lambda s: solve(problem, s, opts_on))(state)
        s_off, t_off = jax.jit(lambda s: solve(problem, s, opts_off))(state)
        assert int(t_on.iterations) == int(t_off.iterations)
        assert int(t_on.status) == int(t_off.status)
        np.testing.assert_allclose(s_on.x, s_off.x, atol=1e-10)
        np.testing.assert_allclose(s_on.u, s_off.u, atol=1e-10)
        np.testing.assert_allclose(s_on.K, s_off.K, atol=1e-10)
