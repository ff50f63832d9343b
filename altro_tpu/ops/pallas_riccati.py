"""Pallas TPU kernel: fused batched Riccati backward pass.

The BASELINE.json north star asks for Pallas kernels for the per-knot
block factorizations (Quu Cholesky + gain solves). This kernel goes
further and fuses the ENTIRE backward pass for a batch of lanes into a
single kernel launch:

  * layout: every matrix entry is an (8, 128) float32 tile of batch
    lanes — so all per-knot algebra (small GEMMs, the unrolled Cholesky,
    the gain solves) runs as full-width VPU ops with zero library calls;
  * the horizon recursion runs as a sequential grid over knots with the
    cost-to-go carry (P, p) resident in VMEM scratch; per-knot operand
    blocks stream HBM→VMEM (auto double-buffered by the Pallas TPU
    pipeline), so VMEM use is O(n^2 * tile) independent of N — this is
    what lets the kernel scale past the reference's n=4 blocks to the
    quadrotor's n=12 (the whole-horizon-resident layout exceeds the
    16 MB scoped-VMEM budget there);
  * Cholesky failure is tracked per lane (an (8, 128) flag tile), so a
    diverged lane cannot poison the batch — same contract as
    `tvlqr_backward`.

Batches larger than one 1024-lane tile run as a second (sequential)
grid dimension; the carry scratch re-initializes at knot 0 of each tile.

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
BATCH_TILE = SUB * LANE  # 1024 lanes per batch tile


def _kernel(n, m, N, A_ref, B_ref, f_ref, lxx_ref, luu_ref, lux_ref,
            lx_ref, lu_ref, lxxT_ref, lxT_ref, reg_ref,
            K_ref, d_ref, P_ref, p_ref, dV_ref, flags_ref, Pc, pc):
    """One grid step = one knot (k = N-1-program_id(1)) of one batch tile.

    Streamed refs hold that knot's blocks of (8,128) lane tiles:
    A:[1,1,n,n,8,128] B:[1,1,n,m,...] f:[1,1,n] lxx:[1,1,n,n] luu:[1,1,m,m]
    lux:[1,1,m,n] lx:[1,1,n] lu:[1,1,m]; lxxT/lxT are the terminal cost
    blocks and reg the per-lane Quu regularization (constant across the
    grid). Outputs: K:[1,1,m,n] d:[1,1,m] P:[1,1,n,n] p:[1,1,n] (knots
    0..N-1; the caller appends P_N = lxx_N), dV:[1,2], flags:[1,2]
    (= [ok, smallest failing knot]; accumulated in place, constant block
    index). Scratch carry: Pc:[n,n,8,128], pc:[n,8,128] — persists across
    the sequential grid, re-initialized at each tile's first step.
    """
    step = pl.program_id(1)

    @pl.when(step == 0)
    def _init():
        for i in range(n):
            for j in range(n):
                Pc[i, j] = lxxT_ref[0, 0, i, j]
            pc[i] = lxT_ref[0, 0, i]
        dV_ref[0, 0] = jnp.zeros((SUB, LANE), jnp.float32)
        dV_ref[0, 1] = jnp.zeros((SUB, LANE), jnp.float32)
        flags_ref[0, 0] = jnp.ones((SUB, LANE), jnp.float32)
        flags_ref[0, 1] = jnp.full((SUB, LANE), float(N), jnp.float32)

    a = [[A_ref[0, 0, i, j] for j in range(n)] for i in range(n)]
    b = [[B_ref[0, 0, i, j] for j in range(m)] for i in range(n)]
    fv = [f_ref[0, 0, i] for i in range(n)]
    Pn = [[Pc[i, j] for j in range(n)] for i in range(n)]
    pn = [pc[i] for i in range(n)]

    # AtP = A^T P', BtP = B^T P'
    AtP = [[sum(a[l][i] * Pn[l][j] for l in range(n)) for j in range(n)]
           for i in range(n)]
    BtP = [[sum(b[l][i] * Pn[l][j] for l in range(n)) for j in range(n)]
           for i in range(m)]
    Qxx = [[lxx_ref[0, 0, i, j] + sum(AtP[i][l] * a[l][j] for l in range(n))
            for j in range(n)] for i in range(n)]
    Quu = [[luu_ref[0, 0, i, j] + sum(BtP[i][l] * b[l][j] for l in range(n))
            for j in range(m)] for i in range(m)]
    Qux = [[lux_ref[0, 0, i, j] + sum(BtP[i][l] * a[l][j] for l in range(n))
            for j in range(n)] for i in range(m)]
    t = [sum(Pn[i][l] * fv[l] for l in range(n)) + pn[i] for i in range(n)]
    Qx = [lx_ref[0, 0, i] + sum(a[l][i] * t[l] for l in range(n)) for i in range(n)]
    Qu = [lu_ref[0, 0, i] + sum(b[l][i] * t[l] for l in range(n)) for i in range(m)]

    # Unrolled Cholesky of Quu + reg I, per lane
    reg = reg_ref[0, 0]
    L = [[None] * m for _ in range(m)]
    ok_knot = jnp.ones((SUB, LANE), jnp.float32)
    for j in range(m):
        diag = Quu[j][j] + reg
        for kk in range(j):
            diag = diag - L[j][kk] * L[j][kk]
        pos = (diag > 0.0).astype(jnp.float32)
        ok_knot = ok_knot * pos
        ljj = jnp.sqrt(jnp.maximum(diag, 1e-30))
        L[j][j] = ljj
        inv = 1.0 / ljj
        for i in range(j + 1, m):
            s = Quu[i][j]
            for kk in range(j):
                s = s - L[i][kk] * L[j][kk]
            L[i][j] = s * inv
    flags_ref[0, 0] = flags_ref[0, 0] * ok_knot
    # smallest failing knot: backward order visits decreasing k, so the
    # last overwrite wins (== the min); N when no failure
    k_f = (N - 1 - step).astype(jnp.float32)
    flags_ref[0, 1] = jnp.where(ok_knot < 0.5, k_f, flags_ref[0, 1])
    # per-knot select, NOT a multiply: the guarded factorization of a
    # failed Quu can overflow to inf and 0*inf = NaN would poison the
    # carry for every remaining knot; where() selects 0 cleanly and the
    # recursion continues with P = Qxx — same semantics as the scan
    # (tvlqr.py: K_k = where(ok_k, sol, 0)), so failed-lane histories and
    # fail_index match it exactly
    okb = ok_knot > 0.5

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
            Kk[i][j] = jnp.where(okb, col[i], 0.0)
    dk = chol_solve([-Qu[i] for i in range(m)])
    dk = [jnp.where(okb, dk[i], 0.0) for i in range(m)]

    for i in range(m):
        for j in range(n):
            K_ref[0, 0, i, j] = Kk[i][j]
        d_ref[0, 0, i] = dk[i]

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
            P_ref[0, 0, i, j] = Pk
    for i in range(n):
        pk = (Qx[i]
              - sum(QuuK[l][i] * dk[l] for l in range(m))
              - sum(Kk[l][i] * Qu[l] for l in range(m))
              + sum(Qux[l][i] * dk[l] for l in range(m)))
        pc[i] = pk
        p_ref[0, 0, i] = pk

    # Expected decrease
    dV_ref[0, 0] = dV_ref[0, 0] + sum(dk[i] * Qu[i] for i in range(m))
    dV_ref[0, 1] = dV_ref[0, 1] + 0.5 * sum(
        dk[i] * sum(Quu[i][l] * dk[l] for l in range(m)) for i in range(m)
    )


class PallasGains(NamedTuple):
    K: jnp.ndarray  # [B, N, m, n]
    d: jnp.ndarray  # [B, N, m]
    P: jnp.ndarray  # [B, N+1, n, n]
    p: jnp.ndarray  # [B, N+1, n]
    delta_V: jnp.ndarray  # [B, 2]
    ok: jnp.ndarray  # [B] bool
    fail_index: jnp.ndarray  # [B] int32: smallest failing knot, N if ok


def _to_tiles(x):
    """[B, *rest] -> [Bt, *rest, 8, 128]."""
    rest = x.shape[1:]
    bt = x.shape[0] // BATCH_TILE
    x = x.reshape((bt, SUB, LANE) + rest)
    perm = (0,) + tuple(range(3, 3 + len(rest))) + (1, 2)
    return jnp.transpose(x, perm)


def _from_tiles(x):
    """[Bt, *rest, 8, 128] -> [B, *rest]."""
    nd = x.ndim
    perm = (0, nd - 2, nd - 1) + tuple(range(1, nd - 2))
    return jnp.transpose(x, perm).reshape(
        (x.shape[0] * BATCH_TILE,) + x.shape[1:-2]
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run(A, B, f, lxx, luu, lux, lx, lu, reg, interpret=False):
    Bsz, N = A.shape[0], A.shape[1]
    n, m = A.shape[2], B.shape[3]
    bt = Bsz // BATCH_TILE
    lxxT, lxT = lxx[:, N:], lx[:, N:]
    reg_b = jnp.broadcast_to(jnp.asarray(reg, jnp.float32), (Bsz,))[:, None]
    tiles = [
        _to_tiles(x)
        for x in (A, B, f, lxx[:, :N], luu, lux, lx[:, :N], lu, lxxT, lxT,
                  reg_b)
    ]

    def knot_spec(*blk):
        # streamed per-knot block: index (b, N-1-s) of a [Bt, N, ...] stack
        return pl.BlockSpec(
            (1, 1) + blk, lambda b, s: (b, N - 1 - s) + (0,) * len(blk)
        )

    def const_spec(*blk):
        # terminal / accumulator block: constant index, stays VMEM-resident
        return pl.BlockSpec(
            (1, 1) + blk, lambda b, s: (b, 0) + (0,) * len(blk)
        )

    T = (SUB, LANE)
    in_specs = [
        knot_spec(n, n, *T), knot_spec(n, m, *T), knot_spec(n, *T),
        knot_spec(n, n, *T), knot_spec(m, m, *T), knot_spec(m, n, *T),
        knot_spec(n, *T), knot_spec(m, *T),
        const_spec(n, n, *T), const_spec(n, *T), const_spec(*T),
    ]
    out_specs = (
        knot_spec(m, n, *T), knot_spec(m, *T),
        knot_spec(n, n, *T), knot_spec(n, *T),
        pl.BlockSpec((1, 2) + T, lambda b, s: (b, 0, 0, 0)),   # dV
        pl.BlockSpec((1, 2) + T, lambda b, s: (b, 0, 0, 0)),   # flags
    )
    out_shapes = (
        jax.ShapeDtypeStruct((bt, N, m, n) + T, jnp.float32),      # K
        jax.ShapeDtypeStruct((bt, N, m) + T, jnp.float32),         # d
        jax.ShapeDtypeStruct((bt, N, n, n) + T, jnp.float32),      # P (0..N-1)
        jax.ShapeDtypeStruct((bt, N, n) + T, jnp.float32),         # p (0..N-1)
        jax.ShapeDtypeStruct((bt, 2) + T, jnp.float32),            # dV
        jax.ShapeDtypeStruct((bt, 2) + T, jnp.float32),            # flags
    )
    kern = functools.partial(_kernel, n, m, N)
    outs = pl.pallas_call(
        kern,
        grid=(bt, N),
        out_shape=out_shapes,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((n, n, SUB, LANE), jnp.float32),
            pltpu.VMEM((n, SUB, LANE), jnp.float32),
        ],
        # both grid dims carry state in scratch (the Riccati recursion
        # along knots; the re-init boundary along batch tiles)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        interpret=interpret,
    )(*tiles)
    K, d, P, p, dV, flags = (_from_tiles(x) for x in outs)
    P = jnp.concatenate([P, lxxT], axis=1)
    p = jnp.concatenate([p, lxT], axis=1)
    return (K, d, P, p, dV, flags[:, 0] > 0.5,
            flags[:, 1].astype(jnp.int32))


def riccati_backward_pallas(A, B, f, lxx, luu, lux, lx, lu, reg=0.0,
                            interpret=False) -> PallasGains:
    """Fused batched Riccati backward pass.

    Args (float32, batch-leading):
      A: [B, N, n, n], B: [B, N, n, m], f: [B, N, n],
      lxx: [B, N+1, n, n], luu: [B, N, m, m], lux: [B, N, m, n],
      lx: [B, N+1, n], lu: [B, N, m]; B must be a multiple of 1024.
      reg: Quu diagonal regularization — scalar or per-lane [B].

    Returns PallasGains matching `jax.vmap(tvlqr_backward)` (K, d, P, p,
    delta_V, ok, fail_index) to float32 accuracy.
    """
    Bsz = A.shape[0]
    if Bsz % BATCH_TILE != 0:
        raise ValueError(f"batch {Bsz} must be a multiple of {BATCH_TILE}")
    args = tuple(jnp.asarray(a, jnp.float32) for a in (A, B, f, lxx, luu, lux, lx, lu))
    return PallasGains(*_run(*args, jnp.asarray(reg, jnp.float32),
                             interpret=interpret))
