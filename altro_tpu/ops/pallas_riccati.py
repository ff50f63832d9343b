"""Pallas TPU kernel: fused batched Riccati backward pass.

The BASELINE.json north star asks for Pallas kernels for the per-knot
block factorizations (Quu Cholesky + gain solves). This kernel goes
further and fuses the ENTIRE backward pass for a 1024-lane batch into a
single kernel launch:

  * layout: every matrix entry is an (8, 128) float32 tile of batch
    lanes — [N, n, n, 8, 128] — so all per-knot algebra (small GEMMs,
    the unrolled Cholesky, the gain solves) runs as full-width VPU ops
    with zero library calls and zero HBM round-trips between knots;
  * the horizon recursion runs as an in-kernel fori_loop with the
    cost-to-go carry (P, p) resident in VMEM scratch;
  * Cholesky failure is tracked per lane (an (8, 128) flag tile), so a
    diverged lane cannot poison the batch — same contract as
    `tvlqr_backward`.

For the reference-scale problems (n=4, m=2, N=30, B=1024) all operands
fit in VMEM (~11 MB); larger batches are processed in 1024-lane chunks
via `lax.map`. This is the standalone building block for a natively
batched solver path; the vmapped solver keeps using the scan kernel
(vmap of a pallas_call would grid over single lanes and defeat the
layout).

Kernel structure follows /opt/skills/guides/pallas_guide.md; the math is
the recursion of altro_tpu.tvlqr.tvlqr_backward (== reference
tvlqr.cpp:124-191).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["riccati_backward_pallas", "BATCH_TILE"]

SUB, LANE = 8, 128
BATCH_TILE = SUB * LANE  # 1024 lanes per kernel invocation


def _kernel(n, m, N, reg, A_ref, B_ref, f_ref, lxx_ref, luu_ref, lux_ref,
            lx_ref, lu_ref, K_ref, d_ref, P_ref, p_ref, dV_ref, ok_ref,
            Pc, pc):
    """All refs hold (8,128) tiles per matrix entry:
    A:[N,n,n,8,128] B:[N,n,m,...] f:[N,n] lxx:[N+1,n,n] luu:[N,m,m]
    lux:[N,m,n] lx:[N+1,n] lu:[N,m] -> K:[N,m,n] d:[N,m] P:[N+1,n,n]
    p:[N+1,n] dV:[2] ok:[1]; scratch Pc:[n,n,8,128], pc:[n,8,128].
    """
    # Terminal cost-to-go
    for i in range(n):
        for j in range(n):
            Pc[i, j] = lxx_ref[N, i, j]
            P_ref[N, i, j] = lxx_ref[N, i, j]
        pc[i] = lx_ref[N, i]
        p_ref[N, i] = lx_ref[N, i]
    dV_ref[0] = jnp.zeros((SUB, LANE), jnp.float32)
    dV_ref[1] = jnp.zeros((SUB, LANE), jnp.float32)
    ok_ref[0] = jnp.ones((SUB, LANE), jnp.float32)

    def body(idx, _):
        k = N - 1 - idx
        a = [[A_ref[k, i, j] for j in range(n)] for i in range(n)]
        b = [[B_ref[k, i, j] for j in range(m)] for i in range(n)]
        fv = [f_ref[k, i] for i in range(n)]
        Pn = [[Pc[i, j] for j in range(n)] for i in range(n)]
        pn = [pc[i] for i in range(n)]

        # AtP = A^T P', BtP = B^T P'
        AtP = [[sum(a[l][i] * Pn[l][j] for l in range(n)) for j in range(n)]
               for i in range(n)]
        BtP = [[sum(b[l][i] * Pn[l][j] for l in range(n)) for j in range(n)]
               for i in range(m)]
        Qxx = [[lxx_ref[k, i, j] + sum(AtP[i][l] * a[l][j] for l in range(n))
                for j in range(n)] for i in range(n)]
        Quu = [[luu_ref[k, i, j] + sum(BtP[i][l] * b[l][j] for l in range(n))
                for j in range(m)] for i in range(m)]
        Qux = [[lux_ref[k, i, j] + sum(BtP[i][l] * a[l][j] for l in range(n))
                for j in range(n)] for i in range(m)]
        t = [sum(Pn[i][l] * fv[l] for l in range(n)) + pn[i] for i in range(n)]
        Qx = [lx_ref[k, i] + sum(a[l][i] * t[l] for l in range(n)) for i in range(n)]
        Qu = [lu_ref[k, i] + sum(b[l][i] * t[l] for l in range(n)) for i in range(m)]

        # Unrolled Cholesky of Quu + reg I, per lane
        L = [[None] * m for _ in range(m)]
        ok = ok_ref[0]
        for j in range(m):
            diag = Quu[j][j] + reg
            for kk in range(j):
                diag = diag - L[j][kk] * L[j][kk]
            pos = (diag > 0.0).astype(jnp.float32)
            ok = ok * pos
            ljj = jnp.sqrt(jnp.maximum(diag, 1e-30))
            L[j][j] = ljj
            inv = 1.0 / ljj
            for i in range(j + 1, m):
                s = Quu[i][j] if i >= j else Quu[j][i]
                for kk in range(j):
                    s = s - L[i][kk] * L[j][kk]
                L[i][j] = s * inv
        ok_ref[0] = ok

        # Solve (L L^T) [K | d] = [Qux | -Qu]
        def chol_solve(cols):
            # cols: list over m of [8,128] rows (one RHS)
            y = list(cols)
            for i in range(m):
                s = y[i]
                for kk in range(i):
                    s = s - L[i][kk] * y[kk]
                y[i] = s / L[i][i]
            for i in reversed(range(m)):
                s = y[i]
                for kk in range(i + 1, m):
                    s = s - L[kk][i] * y[kk]
                y[i] = s / L[i][i]
            return y

        Kk = [[None] * n for _ in range(m)]
        for j in range(n):
            col = chol_solve([Qux[i][j] for i in range(m)])
            for i in range(m):
                Kk[i][j] = col[i] * ok
        dk = chol_solve([-Qu[i] for i in range(m)])
        dk = [dk[i] * ok for i in range(m)]

        for i in range(m):
            for j in range(n):
                K_ref[k, i, j] = Kk[i][j]
            d_ref[k, i] = dk[i]

        # Cost-to-go update
        QuuK = [[sum(Quu[i][l] * Kk[l][j] for l in range(m)) for j in range(n)]
                for i in range(m)]
        KtQux = [[sum(Kk[l][i] * Qux[l][j] for l in range(m)) for j in range(n)]
                 for i in range(n)]
        for i in range(n):
            for j in range(n):
                Pk = (Qxx[i][j]
                      + sum(QuuK[l][i] * Kk[l][j] for l in range(m))
                      - KtQux[i][j] - KtQux[j][i])
                Pc[i, j] = Pk
                P_ref[k, i, j] = Pk
        for i in range(n):
            pk = (Qx[i]
                  - sum(QuuK[l][i] * dk[l] for l in range(m))
                  - sum(Kk[l][i] * Qu[l] for l in range(m))
                  + sum(Qux[l][i] * dk[l] for l in range(m)))
            pc[i] = pk
            p_ref[k, i] = pk

        # Expected decrease
        dV_ref[0] = dV_ref[0] + sum(dk[i] * Qu[i] for i in range(m))
        dV_ref[1] = dV_ref[1] + 0.5 * sum(
            dk[i] * sum(Quu[i][l] * dk[l] for l in range(m)) for i in range(m)
        )
        return 0

    jax.lax.fori_loop(0, N, body, 0)


class PallasGains(NamedTuple):
    K: jnp.ndarray  # [B, N, m, n]
    d: jnp.ndarray  # [B, N, m]
    P: jnp.ndarray  # [B, N+1, n, n]
    p: jnp.ndarray  # [B, N+1, n]
    delta_V: jnp.ndarray  # [B, 2]
    ok: jnp.ndarray  # [B] bool


def _to_tiles(x, lead):
    """[B, ...rest] -> [...rest, 8, 128] with B = 1024."""
    rest = x.shape[1:]
    return jnp.transpose(
        x.reshape((SUB, LANE) + rest), tuple(range(2, 2 + len(rest))) + (0, 1)
    )


def _from_tiles(x):
    """[...rest, 8, 128] -> [B, ...rest]."""
    nd = x.ndim
    return jnp.transpose(x, (nd - 2, nd - 1) + tuple(range(nd - 2))).reshape(
        (BATCH_TILE,) + x.shape[:-2]
    )


@functools.partial(jax.jit, static_argnames=("interpret", "reg"))
def _run_tile(A, B, f, lxx, luu, lux, lx, lu, reg=0.0, interpret=False):
    Bsz, N = A.shape[0], A.shape[1]
    n, m = A.shape[2], B.shape[3]
    assert Bsz == BATCH_TILE
    tiles = [_to_tiles(a, 1) for a in (A, B, f, lxx, luu, lux, lx, lu)]
    out_shapes = (
        jax.ShapeDtypeStruct((N, m, n, SUB, LANE), jnp.float32),   # K
        jax.ShapeDtypeStruct((N, m, SUB, LANE), jnp.float32),      # d
        jax.ShapeDtypeStruct((N + 1, n, n, SUB, LANE), jnp.float32),  # P
        jax.ShapeDtypeStruct((N + 1, n, SUB, LANE), jnp.float32),  # p
        jax.ShapeDtypeStruct((2, SUB, LANE), jnp.float32),         # dV
        jax.ShapeDtypeStruct((1, SUB, LANE), jnp.float32),         # ok
    )
    kern = functools.partial(_kernel, n, m, N, float(reg))
    outs = pl.pallas_call(
        kern,
        out_shape=out_shapes,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 6),
        scratch_shapes=[
            pltpu.VMEM((n, n, SUB, LANE), jnp.float32),
            pltpu.VMEM((n, SUB, LANE), jnp.float32),
        ],
        interpret=interpret,
    )(*tiles)
    K, d, P, p, dV, ok = outs
    return (
        _from_tiles(K),
        _from_tiles(d),
        _from_tiles(P),
        _from_tiles(p),
        _from_tiles(dV),
        _from_tiles(ok)[:, 0] > 0.5,
    )


def riccati_backward_pallas(A, B, f, lxx, luu, lux, lx, lu, reg=0.0,
                            interpret=False) -> PallasGains:
    """Fused batched Riccati backward pass.

    Args (float32, batch-leading):
      A: [B, N, n, n], B: [B, N, n, m], f: [B, N, n],
      lxx: [B, N+1, n, n], luu: [B, N, m, m], lux: [B, N, m, n],
      lx: [B, N+1, n], lu: [B, N, m]; B must be a multiple of 1024.

    Returns PallasGains matching `jax.vmap(tvlqr_backward)` (K, d, P, p,
    delta_V, ok) to float32 accuracy.
    """
    Bsz = A.shape[0]
    if Bsz % BATCH_TILE != 0:
        raise ValueError(f"batch {Bsz} must be a multiple of {BATCH_TILE}")
    args = tuple(jnp.asarray(a, jnp.float32) for a in (A, B, f, lxx, luu, lux, lx, lu))
    reg = float(reg)
    if Bsz == BATCH_TILE:
        K, d, P, p, dV, ok = _run_tile(*args, reg=reg, interpret=interpret)
    else:
        chunks = tuple(a.reshape((Bsz // BATCH_TILE, BATCH_TILE) + a.shape[1:]) for a in args)
        K, d, P, p, dV, ok = jax.lax.map(
            lambda c: _run_tile(*c, reg=reg, interpret=interpret), chunks
        )
        K, d, P, p, dV, ok = (
            x.reshape((Bsz,) + x.shape[2:]) for x in (K, d, P, p, dV, ok)
        )
    return PallasGains(K, d, P, p, dV, ok)
