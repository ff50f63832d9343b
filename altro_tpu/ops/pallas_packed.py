"""Pallas TPU kernel: packed single-lane Riccati backward pass (latency).

The batched kernel (ops/pallas_riccati.py) spends one (8, 128) tile of
BATCH LANES per matrix entry — ideal at B >= 1024, but a single solve
(the reference's defining ~1 kHz MPC deployment, bicycle_test.cpp:302-342,
and the bench_all `scotty_long_horizon_N500` row) would use 1/1024 of
every tile and pay a ~232 KB HBM stream per knot. At B = 1 the XLA scan
path is bound by op-granularity latency instead: ~30 tiny VPU ops per
knot, each paying full issue overhead, ~10 us/knot (docs/PERF.md N=500
attribution — the backward is ~50% of the 197 ms solve).

This kernel is the latency design point between the two:

  * every per-knot operand (A, B, their transposes, cost blocks) is
    PACKED into one (8, 128) f32 tile — sublanes are matrix rows,
    8-lane fields are matrices — so a knot streams 4 KB, not 232 KB;
  * all small-matrix algebra runs on packed blocks with row-major
    broadcast matmuls: C = sum_k M1[:, k:k+1] * M2[k:k+1, :] — k
    multiply-adds of full-width VPU ops per product, no library calls,
    no per-op XLA dispatch;
  * the horizon recursion is a sequential grid over knot CHUNKS with the
    cost-to-go carry (P, p) resident in VMEM scratch (and in registers
    within a chunk), so the whole N-step chain is ONE kernel program —
    the ~10 us/knot XLA op latency collapses to VPU issue latency, and
    chunking (several knots per grid step, unrolled) amortizes the
    per-grid-step pipeline overhead that dominates at 1 knot/step
    (measured 6.2 -> ~2 us/knot at chunk=10, docs/PERF.md);
  * in-kernel transposed products are avoided: A^T/B^T/lux^T are
    packed as separate lane fields (transposing [N, n, n] is trivial
    for XLA at these sizes), and the gain solve runs twice — once left
    (rows of K) and once right (columns of K^T from Qux^T, which uses
    P⁺'s symmetry: Qux^T = lux^T + A^T(P⁺B)) — so the P/p updates are
    pure row-major products:  P = Qxx + K^T(Quu K) - K^T Qux - Qux^T K.

Mosaic layout rules learned the hard way (kept as working notes):
sublane-concat of slices with different lane offsets and (1, 1)
broadcasts from non-zero lane offsets both fail to lower — rows/columns
are assembled with one-hot masked sums and every scalar is normalized
to a replicated layout via a masked full reduce (`_scalar`).

Limits: n <= 8 and m <= 8 (matrix rows live in sublanes) — covers the
reference problem zoo (bicycle n=4, double integrator, pendulum,
cartpole); the quadrotor's n=12 stays on the batched kernel / scan.
Single lane only — batches belong on ops/pallas_riccati.py.

Math matches altro_tpu.tvlqr.tvlqr_backward (== reference
tvlqr.cpp:124-191), including the Cholesky failure contract (failed
knots emit K = d = 0; fail_index = smallest failing knot). Kernel
structure follows /opt/skills/guides/pallas_guide.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from altro_tpu.tvlqr import TVLQRGains

__all__ = ["riccati_backward_pallas_packed"]

SUB, LANE = 8, 128

# Lane-field offsets inside the packed (8, 128) operand tile. All are
# multiples of 8 so slices stay aligned.
_A, _B, _AT, _BT = 0, 8, 16, 24
_LXX, _LUU, _LUXT, _LX, _LU, _LUX, _F = 32, 40, 48, 56, 64, 72, 80
_REG = 88  # terminal tile only: scalar reg at [0, _REG]

# Output tile fields.
_OK, _OD, _OP, _OPV = 0, 8, 16, 24


def _mm(m1, m2, k):
    """Row-major small matmul on packed blocks: (rows, k) @ (k, cols).
    m1[:, j:j+1] lane-broadcasts, m2[j:j+1, :] sublane-broadcasts; each
    term is one full-width VPU multiply(-add)."""
    acc = m1[:, 0:1] * m2[0:1, :]
    for j in range(1, k):
        acc = acc + m1[:, j : j + 1] * m2[j : j + 1, :]
    return acc


def _row_onehot(i):
    """(SUB, 1) f32 mask selecting sublane i. Mosaic-friendly row/column
    assembly: scattered pieces are summed through one-hot masks instead
    of concatenated (tpu.concatenate requires matching lane offsets)."""
    io = jax.lax.broadcasted_iota(jnp.int32, (SUB, 1), 0)
    return (io == i).astype(jnp.float32)


def _lane_onehot(j, w):
    io = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    return (io == j).astype(jnp.float32)


def _scalar(M, i, j):
    """(1, 1) extract of M[i, j] via a masked full reduce. Mosaic gives
    reduce results a canonical (replicated) layout, so the value can be
    broadcast anywhere — a plain (1, 1) slice inherits its source's lane
    offset and 'vector.broadcast' refuses non-zero input offsets."""
    r, c = M.shape
    mask = ((jax.lax.broadcasted_iota(jnp.int32, (r, c), 0) == i)
            & (jax.lax.broadcasted_iota(jnp.int32, (r, c), 1) == j))
    return jnp.sum(jnp.where(mask, M, 0.0), axis=(0, 1), keepdims=True)


def _transpose_small(M, rows, cols):
    """Entry-wise transpose of the live (rows, cols) corner of a packed
    block via one-hot placement; at most 64 (1, 1) extracts + fmas —
    cheap next to the surrounding matmuls."""
    acc = jnp.zeros((SUB, rows), jnp.float32)
    for i in range(rows):
        for j in range(cols):
            acc = acc + _scalar(M, i, j) * (
                _row_onehot(j) * _lane_onehot(i, rows))
    return acc


def _knot_body(n, m, symmetrize, with_f, reg, blk, Pn, pn):
    """One Riccati step on a packed knot tile. Returns the per-knot
    outputs and the updated carry."""
    a = blk[:, _A : _A + n]           # (8, n); rows >= n are zero
    b = blk[:, _B : _B + m]
    at = blk[:, _AT : _AT + n]
    bt = blk[:, _BT : _BT + n]        # B^T: rows 0..m-1
    lxx = blk[:, _LXX : _LXX + n]
    luu = blk[:, _LUU : _LUU + m]
    luxt = blk[:, _LUXT : _LUXT + m]  # lux^T: (n, m)
    lux = blk[:, _LUX : _LUX + n]     # (m, n)
    lx = blk[:, _LX : _LX + 1]        # (n, 1)
    lu = blk[:, _LU : _LU + 1]        # (m, 1)

    if with_f:
        fv = blk[:, _F : _F + 1]
        t = _mm(Pn, fv, n) + pn       # P⁺f + p⁺, (n, 1)
    else:
        t = pn

    PA = _mm(Pn, a, n)                # P⁺A, (n, n)
    PB = _mm(Pn, b, n)                # P⁺B, (n, m)
    Qxx = lxx + _mm(at, PA, n)
    Quu = luu + _mm(bt, PB, n)        # (m, m)
    Qux = lux + _mm(bt, PA, n)        # (m, n)
    QuxT = luxt + _mm(at, PB, n)      # (n, m), P⁺ symmetric
    Qx = lx + _mm(at, t, n)           # (n, 1)
    Qu = lu + _mm(bt, t, n)           # (m, 1)

    # Unrolled Cholesky of Quu + reg I on replicated (1, 1) entries.
    e = _scalar
    L = [[None] * m for _ in range(m)]
    ok = jnp.ones((1, 1), jnp.float32)
    for j in range(m):
        diag = e(Quu, j, j) + reg
        for kk in range(j):
            diag = diag - L[j][kk] * L[j][kk]
        ok = ok * (diag > 0.0).astype(jnp.float32)
        ljj = jnp.sqrt(jnp.maximum(diag, 1e-30))
        L[j][j] = ljj
        inv = 1.0 / ljj
        for i in range(j + 1, m):
            s = e(Quu, i, j)
            for kk in range(j):
                s = s - L[i][kk] * L[j][kk]
            L[i][j] = s * inv
    okb = ok > 0.5

    def subst(pieces):
        """Solve (L L^T) X = rhs for a list of row-or-column pieces
        (each indexed by the Quu row via list position)."""
        y = list(pieces)
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

    Krows = subst([Qux[i : i + 1, :] for i in range(m)])
    K = jnp.where(
        okb, sum(_row_onehot(i) * Krows[i] for i in range(m)), 0.0)
    drows = subst([-_scalar(Qu, i, 0) for i in range(m)])
    d = jnp.where(
        okb, sum(_row_onehot(i) * drows[i] for i in range(m)), 0.0)
    KTcols = subst([QuxT[:, i : i + 1] for i in range(m)])
    KT = jnp.where(
        okb, sum(KTcols[i] * _lane_onehot(i, m) for i in range(m)), 0.0)

    # Cost-to-go update, all row-major products.
    QuuK = _mm(Quu, K, m)             # (m, n)
    Pk = Qxx + _mm(KT, QuuK, m) - _mm(KT, Qux, m) - _mm(QuxT, K, m)
    if symmetrize:
        Pk = 0.5 * (Pk + _transpose_small(Pk, n, n))
    Quud = _mm(Quu, d, m)             # (m, 1)
    pk = Qx - _mm(KT, Quud, m) - _mm(KT, Qu, m) + _mm(QuxT, d, m)

    dQu = jnp.sum(d * Qu, axis=0, keepdims=True)[:, 0:1]       # (1, 1)
    dQuud = 0.5 * jnp.sum(d * Quud, axis=0, keepdims=True)[:, 0:1]
    return K, d, Pk, pk, okb, ok, dQu, dQuud


def _kernel(n, m, N, C, symmetrize, with_f, op_ref, term_ref,
            out_ref, acc_ref, P_scr, p_scr, dv_scr, fl_scr):
    """One grid step = one chunk of C knots, processed backward. The
    operand/output stacks arrive knot-REVERSED (index i = knot N-1-i),
    so chunk s covers knots N-1-sC .. N-C-sC at inner offsets 0..C-1.
    Within a chunk the (P, p) carry stays in registers; scratch carries
    it across grid steps."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        P_scr[:, :n] = term_ref[0, :, _LXX : _LXX + n]
        p_scr[:, :] = term_ref[0, :, _LX : _LX + 1]
        dv_scr[:, :] = jnp.zeros((SUB, 2), jnp.float32)
        fl_scr[:, 0:1] = jnp.ones((SUB, 1), jnp.float32)
        fl_scr[:, 1:2] = jnp.full((SUB, 1), float(N), jnp.float32)

    reg = _scalar(term_ref[0], 0, _REG)
    Pn = P_scr[:, :n]
    pn = p_scr[:, :]
    dv0 = dv_scr[:, 0:1]
    dv1 = dv_scr[:, 1:2]
    ok_run = _scalar(fl_scr[:, :], 0, 0)
    fail = _scalar(fl_scr[:, :], 0, 1)

    for c in range(C):
        blk = op_ref[0, c]
        K, d, Pk, pk, okb, ok, dQu, dQuud = _knot_body(
            n, m, symmetrize, with_f, reg, blk, Pn, pn)
        # smallest failing knot: backward order visits decreasing k, so
        # the last overwrite wins (== the min); N when no failure.
        k_f = (N - 1 - step * C - c).astype(jnp.float32)
        ok_run = ok_run * ok
        fail = jnp.where(okb, fail, k_f)
        dv0 = dv0 + jnp.broadcast_to(dQu, (SUB, 1))
        dv1 = dv1 + jnp.broadcast_to(dQuud, (SUB, 1))
        out_ref[0, c, :, _OK : _OK + n] = K
        out_ref[0, c, :, _OD : _OD + 1] = d
        out_ref[0, c, :, _OP : _OP + n] = Pk
        out_ref[0, c, :, _OPV : _OPV + 1] = pk
        Pn, pn = Pk, pk

    P_scr[:, :n] = Pn
    p_scr[:, :] = pn
    dv_scr[:, 0:1] = dv0
    dv_scr[:, 1:2] = dv1
    fl_scr[:, 0:1] = jnp.broadcast_to(ok_run, (SUB, 1))
    fl_scr[:, 1:2] = jnp.broadcast_to(fail, (SUB, 1))

    @pl.when(step == N // C - 1)
    def _final():
        acc_ref[:, 0:2] = dv_scr[:, :]
        acc_ref[:, 2:4] = fl_scr[:, :]


def _pack_operands(A, B, f, lxx, luu, lux, lx, lu, reg):
    """Pack per-knot operands into [N, 8, 128] lane-field tiles plus the
    [1, 8, 128] terminal/reg tile."""
    N, n, _ = A.shape
    m = B.shape[2]
    f32 = jnp.float32
    packed = jnp.zeros((N, SUB, LANE), f32)
    packed = packed.at[:, :n, _A : _A + n].set(A.astype(f32))
    packed = packed.at[:, :n, _B : _B + m].set(B.astype(f32))
    packed = packed.at[:, :n, _AT : _AT + n].set(
        jnp.swapaxes(A, 1, 2).astype(f32))
    packed = packed.at[:, :m, _BT : _BT + n].set(
        jnp.swapaxes(B, 1, 2).astype(f32))
    lxxd = lxx if lxx.ndim == 3 else jax.vmap(jnp.diag)(lxx)
    luud = luu if luu.ndim == 3 else jax.vmap(jnp.diag)(luu)
    packed = packed.at[:, :n, _LXX : _LXX + n].set(lxxd[:N].astype(f32))
    packed = packed.at[:, :m, _LUU : _LUU + m].set(luud.astype(f32))
    if lux is not None:
        packed = packed.at[:, :m, _LUX : _LUX + n].set(lux.astype(f32))
        packed = packed.at[:, :n, _LUXT : _LUXT + m].set(
            jnp.swapaxes(lux, 1, 2).astype(f32))
    packed = packed.at[:, :n, _LX].set(lx[:N].astype(f32))
    packed = packed.at[:, :m, _LU].set(lu.astype(f32))
    with_f = f is not None
    if with_f:
        packed = packed.at[:, :n, _F].set(f.astype(f32))
    term = jnp.zeros((1, SUB, LANE), f32)
    term = term.at[0, :n, _LXX : _LXX + n].set(lxxd[N].astype(f32))
    term = term.at[0, :n, _LX].set(lx[N].astype(f32))
    term = term.at[0, 0, _REG].set(jnp.asarray(reg, f32))
    return packed, term, with_f


def _pick_chunk(N: int) -> int:
    """Largest chunk size dividing N: amortizes per-grid-step pipeline
    overhead (dominant at 1 knot/step) against unrolled body size."""
    for c in (10, 8, 5, 4, 2):
        if N % c == 0:
            return c
    return 1


@functools.partial(
    jax.jit, static_argnames=("symmetrize", "interpret", "chunk"))
def riccati_backward_pallas_packed(A, B, lxx, luu, lx, lu, reg=0.0,
                                   lux=None, f=None, symmetrize=True,
                                   interpret=False,
                                   chunk=None) -> TVLQRGains:
    """Single-lane fused Riccati backward (latency kernel).

    Same contract as tvlqr.tvlqr_backward on unbatched operands
    (diagonal lxx/luu accepted and expanded at pack time). f32;
    requires n <= 8, m <= 8. See the module docstring for the design.
    """
    N, n, _ = A.shape
    m = B.shape[2]
    if n > SUB or m > SUB:
        raise ValueError(
            f"packed latency kernel supports n, m <= {SUB}; got n={n}, "
            f"m={m} (use the batched kernel or the scan)")
    C = _pick_chunk(N) if chunk is None else chunk
    if N % C != 0:
        raise ValueError(f"chunk {C} must divide N={N}")
    dtype = A.dtype
    packed, term, with_f = _pack_operands(A, B, f, lxx, luu, lux, lx, lu, reg)
    # knot-reverse so chunk blocks stream contiguously in recursion order
    packed_rev = packed[::-1].reshape(N // C, C, SUB, LANE)

    kern = functools.partial(_kernel, n, m, N, C, symmetrize, with_f)
    out, acc = pl.pallas_call(
        kern,
        grid=(N // C,),
        in_specs=[
            pl.BlockSpec((1, C, SUB, LANE), lambda s: (s, 0, 0, 0)),
            pl.BlockSpec((1, SUB, LANE), lambda s: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, C, SUB, LANE), lambda s: (s, 0, 0, 0)),
            pl.BlockSpec((SUB, 4), lambda s: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N // C, C, SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((SUB, 4), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((SUB, SUB), jnp.float32),   # P carry
            pltpu.VMEM((SUB, 1), jnp.float32),     # p carry
            pltpu.VMEM((SUB, 2), jnp.float32),     # delta_V accumulators
            pltpu.VMEM((SUB, 2), jnp.float32),     # ok / fail_index
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(packed_rev, term)

    out = out.reshape(N, SUB, LANE)[::-1]
    K = out[:, :m, _OK : _OK + n].astype(dtype)
    d = out[:, :m, _OD].astype(dtype)
    lxxd = lxx if lxx.ndim == 3 else jax.vmap(jnp.diag)(lxx)
    P = jnp.concatenate(
        [out[:, :n, _OP : _OP + n], lxxd[None, -1]], axis=0).astype(dtype)
    p = jnp.concatenate(
        [out[:, :n, _OPV], lx[None, -1]], axis=0).astype(dtype)
    delta_V = acc[0, 0:2].astype(dtype)
    ok = acc[0, 2] > 0.5
    fail_index = acc[0, 3].astype(jnp.int32)
    return TVLQRGains(K=K, d=d, P=P, p=p, delta_V=delta_V, ok=ok,
                      fail_index=fail_index)
