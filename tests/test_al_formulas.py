"""AL cost/gradient/Hessian closed-form oracles.

Re-hosts the KnotPointConstraintTest fixture
(/root/reference/src/altro/solver/test/knotpoint_data_test.cpp:130-500):
obstacle + input-sum constraint at x=[2,2,2], u=[10,10], rho=1.2, with
golden AL values for the INEQUALITY cone and the SOC in all three regions.
"""

import jax.numpy as jnp
import numpy as np

from altro_tpu import al
from altro_tpu.cones import Cone
from altro_tpu.problem import ConstraintSpec, DiagonalCost, Problem

N, n, m, p = 1, 3, 2, 3
RHO = 1.2
X = jnp.asarray([2.0, 2.0, 2.0])
U = jnp.asarray([10.0, 10.0])
C1 = jnp.asarray([1.0, 2.0, 3.0])
C2 = jnp.asarray([4.0, 4.0, 4.0])
C_EXPECTED = np.array([-1.0, -8.0, 20.0])


def con_fn(x, u, k):
    return jnp.stack(
        [
            1.0 - jnp.sum((x - C1) ** 2),
            4.0 - jnp.sum((x - C2) ** 2),
            u[0] + u[1],
        ]
    )


def make_problem(cone):
    spec = ConstraintSpec(
        fn=con_fn, cone=cone, dim=p, active=jnp.ones(N + 1, bool), label="c"
    )
    cost = DiagonalCost(
        Q=jnp.ones((N + 1, n)), R=jnp.ones((N + 1, m)),
        q=jnp.zeros((N + 1, n)), r=jnp.zeros((N + 1, m)), c=jnp.zeros(N + 1),
    )
    return Problem(
        N=N, n=n, m=m, dynamics=lambda x, u, h, k: x, dynamics_jac=None,
        constraints=(spec,), cost=cost, h=jnp.full(N, 0.1), x0=jnp.zeros(n),
    )


def al_parts(problem, z):
    """(al-only cost, constraint-only lx/lu, constraint-only lxx/luu/lux)."""
    zr = (jnp.asarray(z),)
    k = 0
    cost_total, convals, _ = al.al_cost(problem, k, X, U, zr, RHO, terminal=False)
    orig = problem.cost.stage_value(k, X, U)
    lx, lu = al.al_grad(problem, k, X, U, zr, RHO, terminal=False)
    olx, olu = problem.cost.stage_grad(k, X, U)
    lxx, luu, lux = al.al_hess(problem, k, X, U, zr, RHO, terminal=False)
    oxx, ouu, oux = problem.cost.stage_hess(k, X, U)
    return (
        float(cost_total - orig),
        np.asarray(convals[0]),
        np.asarray(lx - olx),
        np.asarray(lu - olu),
        np.asarray(lxx - oxx),
        np.asarray(luu - ouu),
        np.asarray(lux - oux),
    )


def test_inequality():
    """knotpoint_data_test.cpp:233-288."""
    problem = make_problem(Cone.NEGATIVE_ORTHANT)
    z = np.array([-1.0, 4.0, 10.1])
    alcost, c, lx, lu, lxx, luu, lux = al_parts(problem, z)
    np.testing.assert_allclose(c, C_EXPECTED, atol=1e-6)
    z_tilde = np.minimum(z - RHO * C_EXPECTED, 0.0)
    np.testing.assert_allclose(alcost, z_tilde @ z_tilde / (2 * RHO), atol=1e-10)
    np.testing.assert_allclose(lx, np.zeros(n), atol=1e-10)
    np.testing.assert_allclose(lu, [13.9, 13.9], atol=1e-10)
    np.testing.assert_allclose(lxx, np.zeros((n, n)), atol=1e-12)
    np.testing.assert_allclose(lux, np.zeros((m, n)), atol=1e-12)
    np.testing.assert_allclose(luu, np.full((m, m), 1.2), atol=1e-10)


def test_soc_out_of_cone():
    """knotpoint_data_test.cpp:346-405."""
    problem = make_problem(Cone.SECOND_ORDER)
    z = np.array([-1.0, 4.0, 30.0])
    alcost, c, lx, lu, lxx, luu, lux = al_parts(problem, z)
    np.testing.assert_allclose(alcost, 80.04534293850527, atol=1e-10)
    np.testing.assert_allclose(
        lx, [-38.910476877919685, -39.19870263257094, -39.4869283872222], atol=1e-10
    )
    np.testing.assert_allclose(lu, [-9.800735254367721, -9.800735254367721], atol=1e-10)
    hess_expected = np.array(
        [
            [13.121659323998685, 9.632047409257103, 6.142435494515529, 2.3820953755839365, 2.3820953755839365],
            [9.632047409257108, 9.600915640264486, 9.569783871271873, 2.399740526514188, 2.399740526514188],
            [6.142435494515531, 9.569783871271868, 12.997132248028219, 2.417385677444439, 2.417385677444439],
            [2.382095375583937, 2.3997405265141882, 2.4173856774444396, 0.6, 0.6],
            [2.382095375583937, 2.3997405265141882, 2.4173856774444396, 0.6, 0.6],
        ]
    )
    np.testing.assert_allclose(lxx, hess_expected[:n, :n], atol=1e-6)
    np.testing.assert_allclose(luu, hess_expected[n:, n:], atol=1e-6)
    np.testing.assert_allclose(lux, hess_expected[n:, :n], atol=1e-6)


def test_soc_below_cone():
    """knotpoint_data_test.cpp:407-462: projected dual vanishes."""
    problem = make_problem(Cone.SECOND_ORDER)
    z = np.array([-1.0, 4.0, 10.1])
    alcost, c, lx, lu, lxx, luu, lux = al_parts(problem, z)
    z_bar = z - RHO * C_EXPECTED
    assert np.linalg.norm(z_bar[:-1]) < -z_bar[-1]
    np.testing.assert_allclose(alcost, 0.0, atol=1e-10)
    np.testing.assert_allclose(lx, np.zeros(n), atol=1e-10)
    np.testing.assert_allclose(lu, np.zeros(m), atol=1e-10)
    np.testing.assert_allclose(lxx, np.zeros((n, n)), atol=1e-6)
    np.testing.assert_allclose(luu, np.zeros((m, m)), atol=1e-6)


def test_soc_in_cone():
    """knotpoint_data_test.cpp:464-500: projection is identity."""
    problem = make_problem(Cone.SECOND_ORDER)
    z = np.array([-1.0, 4.0, 100.0])
    alcost, c, lx, lu, lxx, luu, lux = al_parts(problem, z)
    z_bar = z - RHO * C_EXPECTED
    assert np.linalg.norm(z_bar[:-1]) < z_bar[-1]
    np.testing.assert_allclose(alcost, 2483.75, atol=1e-10)


def test_exact_al_hessian_matches_finite_differences():
    """al_hess_exact (SolverOptions.exact_al_hessian): the full-Newton
    AL Hessian must match central finite differences of al_grad through
    an ACTIVE nonconvex obstacle constraint — including the curvature
    term sum_e lambda_e * nabla^2 c_e that the Gauss-Newton al_hess
    (reference knotpoint_data.cpp:549-570) drops by construction."""
    import jax

    problem = make_problem(Cone.NEGATIVE_ORTHANT)
    z = (jnp.asarray([-0.7, -0.3, 0.1]),)
    rho = jnp.asarray(RHO)
    x = jnp.asarray([1.5, 1.8, 2.5])  # obstacle constraints active-ish
    u = jnp.asarray([3.0, -2.0])

    lxx_ex, luu_ex, lux_ex = al.al_hess_exact(
        problem, 0, x, u, z, rho, terminal=False)
    lxx_gn, luu_gn, lux_gn = al.al_hess(
        problem, 0, x, u, z, rho, terminal=False)

    def gx(xx):
        return al.al_grad(problem, 0, xx, u, z, rho, terminal=False)[0]

    def gu(uu):
        return al.al_grad(problem, 0, x, uu, z, rho, terminal=False)[1]

    eps = 1e-6
    eye_n = np.eye(3)
    fd_xx = np.stack([
        (np.asarray(gx(x + eps * eye_n[i])) - np.asarray(gx(x - eps * eye_n[i])))
        / (2 * eps) for i in range(3)])
    eye_m = np.eye(2)
    fd_uu = np.stack([
        (np.asarray(gu(u + eps * eye_m[i])) - np.asarray(gu(u - eps * eye_m[i])))
        / (2 * eps) for i in range(2)])
    np.testing.assert_allclose(np.asarray(lxx_ex), fd_xx, atol=1e-6)
    np.testing.assert_allclose(np.asarray(luu_ex), fd_uu, atol=1e-6)
    # the curvature term must actually differ from GN here (otherwise
    # this test pins nothing)
    assert float(np.abs(np.asarray(lxx_ex) - np.asarray(lxx_gn)).max()) > 0.1
    # ... and GN + sum(lambda_e * hess c_e) == exact for this quadratic
    # constraint (hess c_1 = hess c_2 = -2 I on x; c_3 linear)
    cval = con_fn(x, u, 0)
    zp = jnp.minimum(z[0] - rho * cval, 0.0)
    lam = -np.asarray(zp)  # multiplier estimates
    corr = (lam[0] + lam[1]) * (-2.0) * np.eye(3)
    np.testing.assert_allclose(
        np.asarray(lxx_gn) + corr, np.asarray(lxx_ex), atol=1e-4)
