"""Cone projection unit tests.

Golden values re-hosted from the reference suite
(/root/reference/src/altro/solver/test/cones_test.cpp), plus vmap/batch
equivalence and autodiff cross-checks the reference does not have.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from altro_tpu.cones import (
    Cone,
    cone_is_linear,
    dual_cone,
    project,
    project_hessian,
    project_jacobian,
)

X = np.array([0.1, -0.5, 0.2, 0.0])
B = np.array([10.0, 20.0, -30.0, 40.0])
MAG = np.linalg.norm(X)

ALL_CONES = [Cone.ZERO, Cone.IDENTITY, Cone.NEGATIVE_ORTHANT, Cone.SECOND_ORDER]


def soc_point(scale):
    x = X.copy()
    x[-1] = MAG * scale
    return jnp.asarray(x)


class TestProjection:
    def test_equality(self):
        px = project(Cone.ZERO, jnp.asarray(X))
        np.testing.assert_allclose(px, np.zeros(4), atol=1e-10)

    def test_inequality(self):
        px = project(Cone.NEGATIVE_ORTHANT, jnp.asarray(X))
        np.testing.assert_allclose(px, [0.0, -0.5, 0.0, 0.0], atol=1e-10)

    def test_identity(self):
        px = project(Cone.IDENTITY, jnp.asarray(X))
        np.testing.assert_allclose(px, X, atol=1e-10)

    def test_soc_in_cone(self):
        x = soc_point(1.1)
        np.testing.assert_allclose(project(Cone.SECOND_ORDER, x), x, atol=1e-10)

    def test_soc_below_cone(self):
        x = soc_point(-1.1)
        np.testing.assert_allclose(project(Cone.SECOND_ORDER, x), np.zeros(4), atol=1e-10)

    def test_soc_outside_cone(self):
        x = soc_point(0.9)
        expected = [0.095, -0.475, 0.19, 0.5203364296299079]
        np.testing.assert_allclose(project(Cone.SECOND_ORDER, x), expected, atol=1e-10)

    def test_soc_zero_vector_part(self):
        # a == 0 edge: in cone if s >= 0, below cone if s < 0; no NaNs.
        x = jnp.array([0.0, 0.0, 0.0, 0.5])
        np.testing.assert_allclose(project(Cone.SECOND_ORDER, x), x, atol=1e-12)
        x = jnp.array([0.0, 0.0, 0.0, -0.5])
        np.testing.assert_allclose(project(Cone.SECOND_ORDER, x), np.zeros(4), atol=1e-12)


class TestJacobian:
    def test_equality(self):
        np.testing.assert_allclose(
            project_jacobian(Cone.ZERO, jnp.asarray(X)), np.zeros((4, 4)), atol=1e-10
        )

    def test_identity(self):
        np.testing.assert_allclose(
            project_jacobian(Cone.IDENTITY, jnp.asarray(X)), np.eye(4), atol=1e-10
        )

    def test_inequality(self):
        np.testing.assert_allclose(
            project_jacobian(Cone.NEGATIVE_ORTHANT, jnp.asarray(X)),
            np.diag([0.0, 1.0, 0.0, 1.0]),
            atol=1e-10,
        )

    def test_soc_in_cone(self):
        np.testing.assert_allclose(
            project_jacobian(Cone.SECOND_ORDER, soc_point(1.1)), np.eye(4), atol=1e-10
        )

    def test_soc_below_cone(self):
        np.testing.assert_allclose(
            project_jacobian(Cone.SECOND_ORDER, soc_point(-1.1)), np.zeros((4, 4)), atol=1e-10
        )

    def test_soc_outside_cone(self):
        expected = np.array(
            [
                [0.9349999999999999, 0.07499999999999998, -0.029999999999999995, 0.09128709291752768],
                [0.07499999999999998, 0.5750000000000001, 0.14999999999999997, -0.4564354645876384],
                [-0.029999999999999995, 0.14999999999999997, 0.89, 0.18257418583505536],
                [0.09128709291752768, -0.45643546458763834, 0.18257418583505536, 0.5],
            ]
        )
        np.testing.assert_allclose(
            project_jacobian(Cone.SECOND_ORDER, soc_point(0.9)), expected, atol=1e-10
        )

    @pytest.mark.parametrize("scale", [1.1, -1.1, 0.9])
    def test_soc_jacobian_matches_autodiff(self, scale):
        x = soc_point(scale)
        jac_ad = jax.jacfwd(lambda z: project(Cone.SECOND_ORDER, z))(x)
        np.testing.assert_allclose(
            project_jacobian(Cone.SECOND_ORDER, x), jac_ad, atol=1e-10
        )


class TestHessian:
    @pytest.mark.parametrize("cone", [Cone.ZERO, Cone.IDENTITY, Cone.NEGATIVE_ORTHANT])
    def test_linear_cones_zero(self, cone):
        np.testing.assert_allclose(
            project_hessian(cone, jnp.asarray(X), jnp.asarray(B)), np.zeros((4, 4)), atol=1e-10
        )

    @pytest.mark.parametrize("scale", [1.1, -1.1])
    def test_soc_in_below_zero(self, scale):
        np.testing.assert_allclose(
            project_hessian(Cone.SECOND_ORDER, soc_point(scale), jnp.asarray(B)),
            np.zeros((4, 4)),
            atol=1e-10,
        )

    def test_soc_outside(self):
        expected = np.array(
            [
                [52.54767592811069, 21.83580619450183, -5.434322477800736, 13.69306393762915],
                [21.83580619450183, 2.3358061945018775, 6.1716123890036805, -4.564354645876377],
                [-5.434322477800736, 6.1716123890036805, 63.146192211409584, -18.257418583505533],
                [13.69306393762915, -4.564354645876377, -18.257418583505533, 0.0],
            ]
        )
        hess = project_hessian(Cone.SECOND_ORDER, soc_point(0.9), jnp.asarray(B))
        np.testing.assert_allclose(hess, expected, atol=1e-10)
        np.testing.assert_allclose(hess, hess.T, atol=1e-10)

    def test_soc_hessian_matches_autodiff(self):
        x = soc_point(0.9)
        b = jnp.asarray(B)
        hess_ad = jax.jacfwd(lambda z: project_jacobian(Cone.SECOND_ORDER, z).T @ b)(x)
        np.testing.assert_allclose(
            project_hessian(Cone.SECOND_ORDER, x, b), hess_ad, atol=1e-9
        )


class TestStructure:
    def test_dual_cones(self):
        assert dual_cone(Cone.ZERO) is Cone.IDENTITY
        assert dual_cone(Cone.IDENTITY) is Cone.ZERO
        assert dual_cone(Cone.NEGATIVE_ORTHANT) is Cone.NEGATIVE_ORTHANT
        assert dual_cone(Cone.SECOND_ORDER) is Cone.SECOND_ORDER

    def test_linearity(self):
        assert cone_is_linear(Cone.ZERO)
        assert cone_is_linear(Cone.IDENTITY)
        assert cone_is_linear(Cone.NEGATIVE_ORTHANT)
        assert not cone_is_linear(Cone.SECOND_ORDER)

    @pytest.mark.parametrize("cone", ALL_CONES)
    def test_vmap_batch_equivalence(self, cone):
        """Batched projection == per-row projection (batch-of-1 invariant)."""
        key = jax.random.PRNGKey(0)
        xs = jax.random.normal(key, (16, 4))
        batched = jax.vmap(lambda x: project(cone, x))(xs)
        rows = jnp.stack([project(cone, xs[i]) for i in range(16)])
        np.testing.assert_allclose(batched, rows, atol=1e-12)

    @pytest.mark.parametrize("cone", ALL_CONES)
    def test_jit(self, cone):
        f = jax.jit(lambda x: project(cone, x))
        np.testing.assert_allclose(f(jnp.asarray(X)), project(cone, jnp.asarray(X)), atol=1e-12)
