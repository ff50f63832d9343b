"""Line-search unit tests on analytic merit functions.

Oracles re-hosted from /root/reference/src/linesearch/test/linesearch_tests.cpp
(iteration counts, exact alpha, status codes) — these assume
try_cubic_first = False (the reference class default; the solver turns it
on, solver.cpp:248).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from altro_tpu.linesearch import (
    LineSearchOptions,
    cubic_argmin,
    cubic_fit,
    wolfe_line_search,
)
from altro_tpu.status import LineSearchCode


def run_ls(phi_fn, dphi_fn, c1=1e-4, c2=0.9, use_backtracking=False, try_cubic=False):
    opts = LineSearchOptions(c1=c1, c2=c2, try_cubic_first=try_cubic,
                             use_backtracking=use_backtracking)
    phi0 = phi_fn(jnp.asarray(0.0))
    dphi0 = dphi_fn(jnp.asarray(0.0))
    full = lambda a: (phi_fn(a), dphi_fn(a))
    value = lambda a: phi_fn(a)
    return wolfe_line_search(full, value, phi0, dphi0, 1.0, opts)


class TestCubicSpline:
    def test_constant_no_min(self):
        spline, ok = cubic_fit(0.0, 1.2, 0.0, 1.0, 1.2, 0.0)
        assert bool(ok)
        _, found = cubic_argmin(spline)
        assert not bool(found)

    def test_linear_no_min(self):
        spline, ok = cubic_fit(0.0, 0.0, 1.0, 1.0, 1.0, 1.0)
        assert bool(ok)
        _, found = cubic_argmin(spline)
        assert not bool(found)

    def test_positive_quadratic(self):
        center, off, slope = 0.5, 0.2, 1.0
        spline, ok = cubic_fit(center - off, 0.0, -slope, center + off, 0.0, slope)
        assert bool(ok)
        x_min, found = cubic_argmin(spline)
        assert bool(found)
        np.testing.assert_allclose(float(x_min), center, atol=1e-12)

    def test_negative_quadratic_no_min(self):
        center, off, slope = 0.5, 0.2, 1.0
        spline, ok = cubic_fit(center - off, 0.0, slope, center + off, 0.0, -slope)
        _, found = cubic_argmin(spline)
        assert not bool(found)

    def test_cubic(self):
        spline, ok = cubic_fit(0.0, 0.0, -1.0, 1.0, 0.0, 2.0)
        x_min, found = cubic_argmin(spline)
        assert bool(found)
        np.testing.assert_allclose(float(x_min), 0.5773502691896257, atol=1e-10)

    def test_cubic_no_min(self):
        spline, ok = cubic_fit(0.0, 0.0, -1.0, 1.0, -3.0, -10.0)
        _, found = cubic_argmin(spline)
        assert not bool(found)

    def test_same_point_invalid(self):
        _, ok = cubic_fit(0.5, 1.0, 0.0, 0.5, 1.0, 0.0)
        assert not bool(ok)


class TestWolfe:
    """linesearch_tests.cpp:134-271 (quadratic and cubic merit oracles)."""

    def quad(self, a, c):
        return (lambda x: a * (x - c) ** 2, lambda x: 2 * a * (x - c))

    def cubic(self, c):
        return (
            lambda x: (x - c) ** 2 - (x - c) ** 3,
            lambda x: 2 * (x - c) - 3 * (x - c) ** 2,
        )

    def test_quadratic_single_iter(self):
        res = run_ls(*self.quad(1.0, 1.0))
        assert int(res.n_iters) == 1
        np.testing.assert_allclose(float(res.alpha), 1.0, atol=0)
        assert int(res.code) == LineSearchCode.MINIMUM_FOUND

    def test_quadratic_off_center_loose(self):
        res = run_ls(*self.quad(1.0, 1.1))
        assert int(res.n_iters) == 1
        np.testing.assert_allclose(float(res.alpha), 1.0, atol=0)
        assert int(res.code) == LineSearchCode.MINIMUM_FOUND

    def test_quadratic_tight_curvature(self):
        res = run_ls(*self.quad(1.0, 1.1), c2=0.01)
        assert int(res.n_iters) == 3
        np.testing.assert_allclose(float(res.alpha), 1.1, rtol=1e-10)
        assert int(res.code) == LineSearchCode.MINIMUM_FOUND

    def test_quadratic_overshoot(self):
        res = run_ls(*self.quad(1.0, 0.8), c2=0.1)
        np.testing.assert_allclose(float(res.alpha), 0.8, rtol=1e-10)
        assert int(res.code) == LineSearchCode.MINIMUM_FOUND

    def test_hit_max_alpha(self):
        res = run_ls(*self.quad(-1.0, -0.1), c2=0.9)
        np.testing.assert_allclose(float(res.alpha), 2.0, atol=0)
        assert int(res.code) == LineSearchCode.HIT_MAX_STEPSIZE
        assert int(res.n_iters) == 3

    def test_cubic_single_iter(self):
        res = run_ls(*self.cubic(1.0))
        assert int(res.n_iters) == 1
        np.testing.assert_allclose(float(res.alpha), 1.0, atol=0)

    @pytest.mark.parametrize(
        "c,c2,expected_iters",
        [(1.2, 1e-3, 3), (1.8, 0.01, 4), (0.8, 0.01, 2), (0.01, 0.01, 2)],
    )
    def test_cubic_cases(self, c, c2, expected_iters):
        res = run_ls(*self.cubic(c), c2=c2)
        assert int(res.n_iters) == expected_iters
        np.testing.assert_allclose(float(res.alpha), c, atol=1e-6)
        assert int(res.code) == LineSearchCode.MINIMUM_FOUND

    def test_not_descent_direction(self):
        res = run_ls(lambda x: (x + 1.0) ** 2, lambda x: 2 * (x + 1.0))
        assert int(res.code) == LineSearchCode.NOT_DESCENT_DIRECTION
        assert float(res.alpha) == 0.0
        assert int(res.n_iters) == 0

    def test_backtracking(self):
        # First trial alpha=1 fails Armijo on a sharp quadratic, then the
        # backtracking stage halves from 0.5 until sufficient decrease.
        phi = lambda x: 100.0 * (x - 0.01) ** 2
        dphi = lambda x: 200.0 * (x - 0.01)
        res = run_ls(phi, dphi, use_backtracking=True)
        assert int(res.code) == LineSearchCode.MINIMUM_FOUND
        assert float(res.alpha) <= 0.5
        assert float(phi(res.alpha)) <= float(phi(jnp.asarray(0.0)))
