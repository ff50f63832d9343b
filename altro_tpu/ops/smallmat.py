"""Unrolled small-matrix factorizations for the Riccati hot loop.

XLA's batched `cholesky`/`triangular_solve` on tiny (m <= 8) matrices
dispatches real linalg kernels per step of the Riccati scan — profiled at
~10x the cost of the surrounding math for the reference-sized problems
(m=1..2). These helpers unroll the factorization into scalar ops at trace
time (static m), so under `vmap`/`scan` they fuse into the surrounding
elementwise work on the VPU with no library calls.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["psd_solve_small", "lu_solve_small", "mm", "mtm", "mv", "mtv", "UNROLL_LIMIT"]

UNROLL_LIMIT = 8
_MM_LIMIT = 16


def mm(a, b):
    """a @ b for small static trailing dims as broadcast-multiply-reduce
    (elementwise ops fuse into surrounding work; no per-element GEMM
    dispatch). a: [..., i, k], b: [..., k, j]."""
    if a.shape[-1] <= _MM_LIMIT and a.shape[-2] <= _MM_LIMIT and b.shape[-1] <= _MM_LIMIT:
        return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)
    return a @ b


def mtm(a, b):
    """a^T @ b (transpose on the last two dims of a)."""
    if a.shape[-1] <= _MM_LIMIT and a.shape[-2] <= _MM_LIMIT and b.shape[-1] <= _MM_LIMIT:
        return jnp.sum(a[..., :, :, None] * b[..., :, None, :], axis=-3)
    return jnp.swapaxes(a, -1, -2) @ b


def mv(M, x):
    """M @ x for small matrices. M: [..., i, j], x: [..., j]."""
    if M.shape[-1] <= _MM_LIMIT and M.shape[-2] <= _MM_LIMIT:
        return jnp.sum(M * x[..., None, :], axis=-1)
    return jnp.einsum("...ij,...j->...i", M, x)


def mtv(M, x):
    """M^T @ x. M: [..., i, j], x: [..., i]."""
    if M.shape[-1] <= _MM_LIMIT and M.shape[-2] <= _MM_LIMIT:
        return jnp.sum(M * x[..., :, None], axis=-2)
    return jnp.einsum("...ij,...i->...j", M, x)


def _chol_unrolled(M, m: int):
    """Lower Cholesky of symmetric M [m, m] as scalar ops.

    Returns (L as list-of-lists of scalars, ok: all pivots positive/finite).
    """
    L = [[None] * m for _ in range(m)]
    ok = None
    for j in range(m):
        diag = M[j, j]
        for k in range(j):
            diag = diag - L[j][k] * L[j][k]
        pos = jnp.logical_and(diag > 0.0, jnp.isfinite(diag))
        ok = pos if ok is None else jnp.logical_and(ok, pos)
        ljj = jnp.sqrt(jnp.where(pos, diag, 1.0))
        L[j][j] = ljj
        inv_ljj = 1.0 / ljj
        for i in range(j + 1, m):
            s = M[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_ljj
    return L, ok


def _chol_solve_unrolled(L, rhs, m: int):
    """Solve (L L^T) X = rhs for rhs [m, k] given unrolled L."""
    rows = [rhs[i] for i in range(m)]
    # Forward substitution: L y = rhs
    for i in range(m):
        s = rows[i]
        for k in range(i):
            s = s - L[i][k] * rows[k]
        rows[i] = s / L[i][i]
    # Back substitution: L^T x = y
    for i in reversed(range(m)):
        s = rows[i]
        for k in range(i + 1, m):
            s = s - L[k][i] * rows[k]
        rows[i] = s / L[i][i]
    return jnp.stack(rows, axis=0)


def psd_solve_small(M, rhs):
    """Solve M X = rhs for SPD M [m, m], rhs [m, k] or [m].

    Unrolled when m <= UNROLL_LIMIT (static shape); falls back to
    jax.scipy Cholesky otherwise. Returns (X, ok) where ok is False when
    a pivot was non-positive/non-finite (X is then garbage-but-finite;
    callers mask).
    """
    m = M.shape[-1]
    vec = rhs.ndim == 1
    rhs2 = rhs[:, None] if vec else rhs
    if m <= UNROLL_LIMIT:
        L, ok = _chol_unrolled(M, m)
        X = _chol_solve_unrolled(L, rhs2, m)
    else:
        import jax

        chol = jnp.linalg.cholesky(M)
        ok = jnp.all(jnp.isfinite(chol))
        chol = jnp.where(ok, chol, jnp.eye(m, dtype=M.dtype))
        y = jax.scipy.linalg.solve_triangular(chol, rhs2, lower=True)
        X = jax.scipy.linalg.solve_triangular(chol.T, y, lower=False)
    return (X[:, 0] if vec else X), ok


def lu_solve_small(M, rhs):
    """Solve M X = rhs for GENERAL square M [m, m], rhs [m, k] or [m],
    via trace-time-unrolled Gaussian elimination with partial pivoting
    (branchless: the pivot row is selected with one-hot blends, so the
    whole solve fuses into surrounding VPU work under vmap/scan — the
    same rationale as psd_solve_small; XLA's batched LU on tiny matrices
    dispatches per-element library kernels instead).

    Falls back to jnp.linalg.solve above UNROLL_LIMIT. No ok flag: like
    jnp.linalg.solve, a singular M produces inf/nan.
    """
    m = M.shape[-1]
    vec = rhs.ndim == 1
    rhs2 = rhs[:, None] if vec else rhs
    if m > UNROLL_LIMIT:
        X = jnp.linalg.solve(M, rhs2)
        return X[:, 0] if vec else X

    # Augmented rows as lists of scalar/row values
    rows = [jnp.concatenate([M[i], rhs2[i]], axis=0) for i in range(m)]
    for col in range(m):
        # partial pivot: pick the remaining row with max |entry| in `col`
        cand = jnp.stack([rows[r][col] for r in range(col, m)])
        piv = jnp.argmax(jnp.abs(cand))  # index into rows[col:]
        # branchless swap rows[col] <-> rows[col + piv]
        sel = [piv == (r - col) for r in range(col, m)]
        pivot_row = rows[col]
        for r in range(col, m):
            pivot_row = jnp.where(sel[r - col], rows[r], pivot_row)
        for r in range(col + 1, m):
            # row r receives the old rows[col] if it was chosen as pivot
            rows[r] = jnp.where(sel[r - col], rows[col], rows[r])
        rows[col] = pivot_row
        inv_p = 1.0 / rows[col][col]
        for r in range(col + 1, m):
            rows[r] = rows[r] - (rows[r][col] * inv_p) * rows[col]
    # back substitution
    xs = [None] * m
    for i in reversed(range(m)):
        s = rows[i][m:]
        for k2 in range(i + 1, m):
            s = s - rows[i][k2] * xs[k2]
        xs[i] = s / rows[i][i]
    X = jnp.stack(xs, axis=0)
    return X[:, 0] if vec else X
