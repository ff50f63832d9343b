"""Merit function goldens.

Re-hosts the MeritFunTest oracle from
/root/reference/src/altro/solver/test/solver_impl_test.cpp:186-271:
double integrator with LINEAR dynamics (including the affine term) and a
prescribed reference trajectory; phi/dphi at alpha in {0, 1} plus a
finite-difference derivative check.
"""

import jax.numpy as jnp
import numpy as np

from altro_tpu.problem import DiagonalCost, Problem
from altro_tpu.solver import al_expansions, merit_function, stationarity
from altro_tpu.tvlqr import tvlqr_backward, tvlqr_forward


def make_problem():
    N, dim = 10, 2
    n, m = 2 * dim, dim
    h = 0.01

    A1 = np.eye(n)
    B1 = np.zeros((n, m))
    b = h * h / 2
    for i in range(dim):
        A1[i, i + dim] = h
        B1[i, i] = b
        B1[i + dim, i] = h
    xeq = np.array([1.0, 2.0, 0.0, 0.0])
    f1 = A1 @ xeq  # affine term = dynamics at equilibrium (solver_impl_test.cpp:40)

    Qd = np.full(n, 1.1)
    Rd = np.full(m, 0.1)
    q = np.full(n, 0.01)
    r = np.full(m, 0.001)
    cost = DiagonalCost(
        Q=jnp.asarray(np.concatenate([np.tile(Qd, (N, 1)), (Qd * 100)[None]])),
        R=jnp.asarray(np.tile(Rd, (N + 1, 1))),
        q=jnp.asarray(np.tile(q, (N + 1, 1))),
        r=jnp.asarray(np.tile(r, (N + 1, 1))),
        c=jnp.zeros(N + 1),
    )
    x0 = jnp.asarray([10.5, -20.5, -4.0, 5.0])
    problem = Problem(
        N=N, n=n, m=m,
        dynamics=None, dynamics_jac=None, constraints=(),
        cost=cost, h=jnp.full(N, h), x0=x0,
        A=jnp.asarray(np.tile(A1, (N, 1, 1))),
        B=jnp.asarray(np.tile(B1, (N, 1, 1))),
        f_aff=jnp.asarray(np.tile(f1, (N, 1))),
    )

    # Reference trajectory: linear interpolation x0 -> xf (solver_impl_test.cpp:196-207)
    xf = np.array([-1.0, 2.0, 0.0, 0.0])
    x0_np = np.asarray(x0)
    theta = np.arange(N) / N
    xref = np.concatenate([x0_np[None] + (xf - x0_np)[None] * theta[:, None], xf[None]])
    uref = np.tile(theta[:, None], (1, m))
    return problem, jnp.asarray(xref), jnp.asarray(uref)


def test_merit_goldens():
    problem, xref, uref = make_problem()
    rho = jnp.asarray(1.0)

    A, B, lx, lu, lxx, luu, lux = al_expansions(problem, xref, uref, (), rho)
    gains = tvlqr_backward(A, B, jnp.zeros_like(lx[:-1]), lxx, luu, lux, lx, lu)
    assert bool(gains.ok)

    def merit(alpha, deriv=True):
        return merit_function(
            problem, xref, uref, gains.K, gains.d, gains.P, gains.p, (), rho,
            alpha, problem.x0, with_derivative=deriv,
        )

    m1 = merit(1.0)
    np.testing.assert_allclose(float(m1.phi), 25992.822836536347, rtol=1e-6)
    np.testing.assert_allclose(float(m1.dphi), -43.52330058003784, rtol=1e-6)

    # Finite-difference derivative check (solver_impl_test.cpp:248-255)
    eps = 1e-6
    m1e = merit(1.0 + eps, deriv=False)
    dphi_fd = (float(m1e.phi) - float(m1.phi)) / eps
    assert abs(float(m1.dphi) - dphi_fd) / abs(float(m1.dphi)) < 1e-6

    m0 = merit(0.0)
    np.testing.assert_allclose(float(m0.phi), 26039.092492842017, rtol=1e-6)
    np.testing.assert_allclose(float(m0.dphi), -49.01601203132092, rtol=1e-6)


def test_tvlqr_through_expansions():
    """LQR-seeded expansions reproduce the TVLQR goldens and near-zero
    stationarity after a linear rollout (solver_impl_test.cpp:110-155)."""
    problem, xref, uref = make_problem()
    # Pure-LQR path: gradients are the linear cost terms at zero trajectory,
    # and the affine dynamics term is active (Initialize() seeding,
    # knotpoint_data.cpp:389-396).
    zeros_x = jnp.zeros_like(xref)
    zeros_u = jnp.zeros_like(uref)
    A, B, lx, lu, lxx, luu, lux = al_expansions(problem, zeros_x, zeros_u, (), 1.0)
    gains = tvlqr_backward(A, B, problem.f_aff, lxx, luu, lux, lx, lu)

    K0 = np.array(
        [
            [0.7753129718046554, 0.0, 5.840445640045901, 0.0],
            [0.0, 0.7753129718046554, 0.0, 5.840445640045901],
        ]
    )
    d0 = np.array([-7.634078625343007, -15.256221385516275])
    np.testing.assert_allclose(gains.K[0], K0, atol=1e-6)
    np.testing.assert_allclose(gains.d[0], d0, atol=1e-6)

    x, u, y = tvlqr_forward(
        problem.A, problem.B, problem.f_aff, gains.K, gains.d, gains.P, gains.p, problem.x0
    )
    xN = np.array([20.165445369740308, -0.13732391651279308, -2.3724421496097037, 2.3113121303468707])
    yN = np.array([2218.2089906714345, -15.09563081640724, -260.9586364570674, 254.2543343381558])
    np.testing.assert_allclose(np.abs(np.asarray(x[-1]) - xN).max(), 0, atol=1e-6)
    np.testing.assert_allclose(np.abs(np.asarray(y[-1]) - yN).max(), 0, atol=1e-5)

    # Stationarity of the LQR solution is ~0 (solver_impl_test.cpp:151-154)
    A2, B2, lx2, lu2, _, _, _ = al_expansions(problem, x, u, (), 1.0)
    stat = stationarity(A2, B2, lx2, lu2, y)
    assert float(stat) < 1e-9
