"""Unrolled small-matrix kernels (ops/smallmat.py).

These are the scalar-unrolled replacements for XLA's per-element tiny
linalg dispatch in the Riccati hot loops (docs/PERF.md optimization
history; reference analog: Eigen's fixed-size LLT in tvlqr.cpp:155-167).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from altro_tpu.ops.smallmat import lu_solve_small, mm, mtm, mtv, mv, psd_solve_small


@pytest.mark.parametrize("m", [1, 2, 3, 4, 6, 8])
def test_psd_solve_matches_numpy(m):
    rng = np.random.default_rng(m)
    S = rng.standard_normal((m, m))
    M = S @ S.T + m * np.eye(m)
    R = rng.standard_normal((m, 3))
    X, ok = psd_solve_small(jnp.asarray(M), jnp.asarray(R))
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(X), np.linalg.solve(M, R),
                               rtol=1e-9, atol=1e-9)


def test_psd_solve_flags_indefinite():
    M = jnp.asarray([[1.0, 0.0], [0.0, -1.0]])
    _, ok = psd_solve_small(M, jnp.ones((2, 1)))
    assert not bool(ok)


@pytest.mark.parametrize("m", [1, 2, 4, 6, 8])
def test_lu_solve_matches_numpy(m):
    rng = np.random.default_rng(10 + m)
    for _ in range(10):
        M = rng.standard_normal((m, m))
        R = rng.standard_normal((m, 2))
        X = lu_solve_small(jnp.asarray(M), jnp.asarray(R))
        np.testing.assert_allclose(np.asarray(X), np.linalg.solve(M, R),
                                   rtol=1e-8, atol=1e-8)
    v = rng.standard_normal(m)
    M = rng.standard_normal((m, m))
    np.testing.assert_allclose(
        np.asarray(lu_solve_small(jnp.asarray(M), jnp.asarray(v))),
        np.linalg.solve(M, v), rtol=1e-8, atol=1e-8)


def test_lu_solve_requires_pivoting():
    """Zero leading pivot: unpivoted elimination would produce inf/nan."""
    M = np.array([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 2.0]])
    R = np.array([[1.0], [2.0], [3.0]])
    X = lu_solve_small(jnp.asarray(M), jnp.asarray(R))
    np.testing.assert_allclose(np.asarray(X), np.linalg.solve(M, R),
                               rtol=1e-12, atol=1e-12)


def test_lu_solve_under_vmap_and_jit():
    rng = np.random.default_rng(7)
    M = jnp.asarray(rng.standard_normal((64, 4, 4)) + 3 * np.eye(4))
    R = jnp.asarray(rng.standard_normal((64, 4, 2)))
    X = jax.jit(jax.vmap(lu_solve_small))(M, R)
    np.testing.assert_allclose(
        np.asarray(X), np.linalg.solve(np.asarray(M), np.asarray(R)),
        rtol=1e-7, atol=1e-8)


def test_mm_family_matches_dense():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((4, 3))
    b = rng.standard_normal((3, 5))
    x3 = rng.standard_normal(3)
    x4 = rng.standard_normal(4)
    np.testing.assert_allclose(np.asarray(mm(jnp.asarray(a), jnp.asarray(b))), a @ b, atol=1e-12)
    np.testing.assert_allclose(np.asarray(mtm(jnp.asarray(a.T), jnp.asarray(b))), a @ b, atol=1e-12)
    np.testing.assert_allclose(np.asarray(mv(jnp.asarray(a), jnp.asarray(x3))), a @ x3, atol=1e-12)
    np.testing.assert_allclose(np.asarray(mtv(jnp.asarray(a), jnp.asarray(x4))), a.T @ x4, atol=1e-12)
