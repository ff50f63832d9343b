"""Native C++ TVLQR kernel vs. the JAX kernel and reference goldens."""

import numpy as np
import pytest

from altro_tpu import native
from test_tvlqr import (
    D0_EXPECTED,
    K0_EXPECTED,
    XN_EXPECTED,
    YN_EXPECTED,
    double_integrator_problem,
)

pytestmark = pytest.mark.skipif(not native.is_available(), reason="no C++ toolchain")


def test_native_tvlqr_goldens():
    A, B, f, lxx, luu, lux, lx, lu, x0 = map(np.asarray, double_integrator_problem())
    K, d, P, p, dV, ok, fail = native.tvlqr_backward(A, B, f, lxx, luu, lux, lx, lu)
    assert ok and fail == A.shape[0]
    np.testing.assert_allclose(K[0], K0_EXPECTED, atol=1e-6)
    np.testing.assert_allclose(d[0], D0_EXPECTED, atol=1e-6)
    x, u, y = native.tvlqr_forward(A, B, f, K, d, P, p, x0)
    np.testing.assert_allclose(np.abs(x[-1] - XN_EXPECTED).max(), 0, atol=1e-6)
    np.testing.assert_allclose(np.abs(y[-1] - YN_EXPECTED).max(), 0, atol=1e-5)


def test_native_matches_jax_bitlevel():
    from altro_tpu.tvlqr import tvlqr_backward as jx_backward

    A, B, f, lxx, luu, lux, lx, lu, x0 = double_integrator_problem()
    g = jx_backward(A, B, f, lxx, luu, lux, lx, lu)
    K, d, P, p, dV, ok, _ = native.tvlqr_backward(
        *(np.asarray(a) for a in (A, B, f, lxx, luu, lux, lx, lu))
    )
    np.testing.assert_allclose(K, np.asarray(g.K), atol=1e-12)
    np.testing.assert_allclose(d, np.asarray(g.d), atol=1e-12)
    np.testing.assert_allclose(P, np.asarray(g.P), atol=1e-9)
    np.testing.assert_allclose(dV, np.asarray(g.delta_V), atol=1e-10)


def test_native_cholesky_failure_reports_knot():
    A, B, f, lxx, luu, lux, lx, lu, x0 = map(np.asarray, double_integrator_problem())
    luu = luu.copy()
    luu[3] = -10.0 * np.eye(2)
    *_, ok, fail = native.tvlqr_backward(A, B, f, lxx, luu, lux, lx, lu)
    assert not ok and fail == 3


def test_native_cubic_argmin():
    x_min, ok = native.cubic_argmin(0.0, 0.0, -1.0, 1.0, 0.0, 2.0)
    assert ok
    np.testing.assert_allclose(x_min, 0.5773502691896257, atol=1e-10)
    _, ok = native.cubic_argmin(0.0, 0.0, -1.0, 1.0, -3.0, -10.0)
    assert not ok
