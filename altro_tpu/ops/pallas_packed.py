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
    lane fields are matrices — so a knot streams 4 KB, not 232 KB;
  * all small-matrix algebra runs on packed blocks with row-major
    broadcast matmuls: C = sum_k M1[:, k:k+1] * M2[k:k+1, :] — k
    multiply-adds of full-width VPU ops per product, no library calls,
    no per-op XLA dispatch;
  * matrices taller than the 8 sublanes are split into ROW GROUPS of 8
    laid side by side in lanes (G = ceil(n/8) <= 2), and every product
    distributes over the groups — this covers the quadrotor's n = 12
    blocks in the same kernel (the packed fields must fit one 128-lane
    tile; n=12/m=4 uses 121 lanes);
  * the horizon recursion is a sequential grid over knot CHUNKS with
    the cost-to-go carry (P, p) resident in VMEM scratch (and in
    registers within a chunk), so the whole N-step chain is ONE kernel
    program — the ~10 us/knot XLA op latency collapses to VPU issue
    latency, and chunking (several knots per grid step, unrolled)
    amortizes the per-grid-step pipeline overhead that dominates at
    1 knot/step (measured 6.2 -> 3.9 us/knot at chunk=10, docs/PERF.md);
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

Limits: m <= 8 (the Cholesky runs in one row group) and the packed
fields must fit 128 lanes (`packed_supported(n, m)`): every model in
the repo zoo qualifies (bicycle n=4, double integrator, pendulum,
cartpole, quadrotor n=12). Single lane only — batches belong on
ops/pallas_riccati.py.

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

__all__ = ["riccati_backward_pallas_packed", "packed_supported"]

SUB, LANE = 8, 128


def _groups(rows: int) -> int:
    return -(-rows // SUB)


def _field_offsets(n: int, m: int):
    """Lane offsets of the packed operand fields. G = 1 keeps the
    original 8-aligned layout; G > 1 packs tightly (alignment padding
    would overflow the tile at n = 12)."""
    G = _groups(n)
    if G == 1:
        offs = {"A": 0, "B": 8, "AT": 16, "BT": 24, "LXX": 32, "LUU": 40,
                "LUXT": 48, "LX": 56, "LU": 64, "LUX": 72, "F": 80,
                "REG": 88}
        return offs, G, 96
    widths = [("A", G * n), ("B", G * m), ("AT", G * n), ("BT", n),
              ("LXX", G * n), ("LUU", m), ("LUXT", G * m), ("LUX", n),
              ("LX", G), ("LU", 1), ("F", G), ("REG", 1)]
    offs, cur = {}, 0
    for k, w in widths:
        offs[k] = cur
        cur += w
    return offs, G, cur


def _out_offsets(n: int, G: int):
    if G == 1:
        return {"K": 0, "D": 8, "P": 16, "PV": 24}
    return {"K": 0, "D": n, "P": n + 1, "PV": n + 1 + G * n}


def packed_supported(n: int, m: int) -> bool:
    """True when (n, m) blocks fit the packed single-tile layout."""
    if m > SUB:
        return False
    _, _, used = _field_offsets(n, m)
    return used <= LANE


def _row_g(Ng, j):
    """Row j of a row-grouped matrix (list of (8, C) blocks)."""
    return Ng[j // SUB][j % SUB : j % SUB + 1, :]


def _mm_g(Mg, Ng, k):
    """Row-major grouped matmul: (R, k) @ (k, C) with both operands as
    row-group lists. Each term is one full-width VPU multiply(-add):
    M's column lane-broadcasts, N's row sublane-broadcasts."""
    out = []
    for g in range(len(Mg)):
        acc = Mg[g][:, 0:1] * _row_g(Ng, 0)
        for j in range(1, k):
            acc = acc + Mg[g][:, j : j + 1] * _row_g(Ng, j)
        out.append(acc)
    return out


def _gadd(Xg, Yg):
    return [x + y for x, y in zip(Xg, Yg)]


def _gsub(Xg, Yg):
    return [x - y for x, y in zip(Xg, Yg)]


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


def _knot_body(n, m, G, offs, symmetrize, with_f, with_lux, reg, blk, Png,
               png):
    """One Riccati step on a packed knot tile. Returns the per-knot
    outputs and the updated (grouped) carry."""

    def fld(name, rows, cols):
        off = offs[name]
        return [blk[:, off + g * cols : off + (g + 1) * cols]
                for g in range(_groups(rows))]

    a = fld("A", n, n)                # grouped (n, n); pad rows are zero
    b = fld("B", n, m)
    at = fld("AT", n, n)
    bt = fld("BT", m, n)              # (m, n): single group
    lxx = fld("LXX", n, n)
    luu = fld("LUU", m, m)
    lxv = fld("LX", n, 1)
    luv = fld("LU", m, 1)

    if with_f:
        fv = fld("F", n, 1)
        t = _gadd(_mm_g(Png, fv, n), png)   # P⁺f + p⁺, grouped (n, 1)
    else:
        # iLQR expansions are defect-free (f == 0): t = p⁺ and the
        # grouped P⁺f product is statically elided (~n MACs/knot saved)
        t = png

    PA = _mm_g(Png, a, n)             # P⁺A, grouped (n, n)
    PB = _mm_g(Png, b, n)             # P⁺B, grouped (n, m)
    Qxx = _gadd(lxx, _mm_g(at, PA, n))
    Quu = luu[0] + _mm_g(bt, PB, n)[0]        # (m, m)
    Qux = _mm_g(bt, PA, n)[0]                 # (m, n)
    QuxT = _mm_g(at, PB, n)                   # (n, m), P⁺ symmetric
    if with_lux:
        Qux = fld("LUX", m, n)[0] + Qux
        QuxT = _gadd(fld("LUXT", n, m), QuxT)
    Qx = _gadd(lxv, _mm_g(at, t, n))          # grouped (n, 1)
    Qu = luv[0] + _mm_g(bt, t, n)[0]          # (m, 1)

    e = _scalar
    if m == 2:
        # Closed-form 2x2 SPD solve (round 5): (Quu + reg I)^-1 via the
        # adjugate — replaces the unrolled Cholesky + three triangular
        # substitution passes with 4 scalar extracts and row-broadcast
        # MACs (shorter dependency chains, ~25% fewer scalar ops/knot).
        # PD check equivalent to the Cholesky pivots: q00 > 0 and
        # det > 0 (Sylvester), plus the same finite bound (Mosaic has no
        # isfinite lowering; 3e38 < f32 max).
        q00 = e(Quu, 0, 0) + reg
        q11 = e(Quu, 1, 1) + reg
        q01 = e(Quu, 0, 1)
        det = q00 * q11 - q01 * q01
        ok = (
            ((q00 > 0.0) & (q00 < 3e38)).astype(jnp.float32)
            * ((det > 0.0) & (det < 3e38)).astype(jnp.float32)
            * ((q11 < 3e38) & (q01 > -3e38) & (q01 < 3e38)).astype(
                jnp.float32)
        )
        okb = ok > 0.5
        idet = 1.0 / jnp.where(okb, det, 1.0)
        i00 = q11 * idet
        i01 = -q01 * idet
        i11 = q00 * idet
        r0 = Qux[0:1, :]
        r1 = Qux[1:2, :]
        K = jnp.where(
            okb,
            _row_onehot(0) * (i00 * r0 + i01 * r1)
            + _row_onehot(1) * (i01 * r0 + i11 * r1),
            0.0,
        )
        qu0 = e(Qu, 0, 0)
        qu1 = e(Qu, 1, 0)
        d = jnp.where(
            okb,
            _row_onehot(0) * (-(i00 * qu0 + i01 * qu1))
            + _row_onehot(1) * (-(i01 * qu0 + i11 * qu1)),
            0.0,
        )
        # KT = QuxT (Quu+reg)^-1 column-assembled per group
        KT = [
            jnp.where(
                okb,
                (Qg[:, 0:1] * i00 + Qg[:, 1:2] * i01) * _lane_onehot(0, m)
                + (Qg[:, 0:1] * i01 + Qg[:, 1:2] * i11) * _lane_onehot(1, m),
                0.0,
            )
            for Qg in QuxT
        ]
    else:
        # Unrolled Cholesky of Quu + reg I on replicated (1, 1) entries.
        L = [[None] * m for _ in range(m)]
        ok = jnp.ones((1, 1), jnp.float32)
        for j in range(m):
            diag = e(Quu, j, j) + reg
            for kk in range(j):
                diag = diag - L[j][kk] * L[j][kk]
            # mirror the scan's _chol_unrolled check: positive AND finite.
            # An f32 overflow to +inf in Quu passes a bare (diag > 0) and
            # would mark a NaN-contaminated knot ok; jnp.isfinite doesn't
            # lower in Mosaic, so bound from above instead (3e38 < f32 max).
            ok = ok * ((diag > 0.0) & (diag < 3e38)).astype(jnp.float32)
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
            """Solve (L L^T) X = rhs; each RHS piece is a group list
            (indexed by the Quu row via list position)."""
            y = [list(p) for p in pieces]
            for i in range(m):
                for kk in range(i):
                    y[i] = [yi - L[i][kk] * yk for yi, yk in zip(y[i], y[kk])]
                y[i] = [yi / L[i][i] for yi in y[i]]
            for i in reversed(range(m)):
                for kk in range(i + 1, m):
                    y[i] = [yi - L[kk][i] * yk for yi, yk in zip(y[i], y[kk])]
                y[i] = [yi / L[i][i] for yi in y[i]]
            return y

        Krows = subst([[Qux[i : i + 1, :]] for i in range(m)])
        K = jnp.where(
            okb, sum(_row_onehot(i) * Krows[i][0] for i in range(m)), 0.0)
        drows = subst([[-_scalar(Qu, i, 0)] for i in range(m)])
        d = jnp.where(
            okb, sum(_row_onehot(i) * drows[i][0] for i in range(m)), 0.0)
        KTcols = subst([[Qg[:, i : i + 1] for Qg in QuxT] for i in range(m)])
        KT = [jnp.where(
            okb, sum(KTcols[i][g] * _lane_onehot(i, m) for i in range(m)), 0.0)
            for g in range(G)]             # grouped (n, m)

    # Cost-to-go update via the Cholesky identity (round 4): since
    # (Quu + reg I) K = Qux and (Quu + reg I) d = -Qu exactly (K, d are
    # the substitutions above), the reference form
    #   P = Qxx + K'QuuK - K'Qux - Qux'K
    #   p = Qx  + K'Quu d - K'Qu - ... (tvlqr.cpp:150-160)
    # collapses ALGEBRAICALLY to
    #   P = Qxx - Qux'K - reg K'K
    #   p = Qx  + Qux'd + reg K'd
    # dropping four grouped products and the explicit transpose-based
    # re-symmetrization: Qux'K == K'(Quu+reg)K is symmetric by value, so
    # the only asymmetry left is single-product rounding (vs the large
    # cancellation asymmetries of the expanded form that `symmetrize`
    # existed to fix). ~25% fewer VPU ops per knot; exact same math
    # (kernel parity tests unchanged). `symmetrize` is accepted for ABI
    # compatibility; the update is always symmetric-by-construction now.
    del symmetrize
    Pk = _gsub(_gsub(Qxx, _mm_g(QuxT, [K], m)),
               [reg * kk for kk in _mm_g(KT, [K], m)])
    pk = _gadd(_gadd(Qx, _mm_g(QuxT, [d], m)),
               [reg * kd for kd in _mm_g(KT, [d], m)])

    dQu = jnp.sum(d * Qu, axis=0, keepdims=True)[:, 0:1]       # (1, 1)
    dd = jnp.sum(d * d, axis=0, keepdims=True)[:, 0:1]
    dQuud = -0.5 * (dQu + reg * dd)
    return K, d, Pk, pk, okb, ok, dQu, dQuud


def _kernel(n, m, N, C, G, offs, oofs, symmetrize, with_f, with_lux, op_ref,
            term_ref, out_ref, acc_ref, P_scr, p_scr, dv_scr, fl_scr):
    """One grid step = one chunk of C knots, processed backward. The
    operand/output stacks arrive knot-REVERSED (index i = knot N-1-i),
    so chunk s covers knots N-1-sC .. N-C-sC at inner offsets 0..C-1.
    Within a chunk the (P, p) carry stays in registers; scratch carries
    it across grid steps (P group g at lanes [g*n, (g+1)*n), p group g
    at lane g)."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        for g in range(G):
            P_scr[:, g * n : (g + 1) * n] = term_ref[
                0, :, offs["LXX"] + g * n : offs["LXX"] + (g + 1) * n]
            p_scr[:, g : g + 1] = term_ref[
                0, :, offs["LX"] + g : offs["LX"] + g + 1]
        dv_scr[:, :] = jnp.zeros((SUB, 2), jnp.float32)
        fl_scr[:, 0:1] = jnp.ones((SUB, 1), jnp.float32)
        fl_scr[:, 1:2] = jnp.full((SUB, 1), float(N), jnp.float32)

    reg = _scalar(term_ref[0], 0, offs["REG"])
    Pn = [P_scr[:, g * n : (g + 1) * n] for g in range(G)]
    pn = [p_scr[:, g : g + 1] for g in range(G)]
    dv0 = dv_scr[:, 0:1]
    dv1 = dv_scr[:, 1:2]
    ok_run = _scalar(fl_scr[:, :], 0, 0)
    fail = _scalar(fl_scr[:, :], 0, 1)

    for c in range(C):
        blk = op_ref[0, c]
        K, d, Pk, pk, okb, ok, dQu, dQuud = _knot_body(
            n, m, G, offs, symmetrize, with_f, with_lux, reg, blk, Pn, pn)
        # smallest failing knot: backward order visits decreasing k, so
        # the last overwrite wins (== the min); N when no failure.
        k_f = (N - 1 - step * C - c).astype(jnp.float32)
        ok_run = ok_run * ok
        fail = jnp.where(okb, fail, k_f)
        dv0 = dv0 + jnp.broadcast_to(dQu, (SUB, 1))
        dv1 = dv1 + jnp.broadcast_to(dQuud, (SUB, 1))
        out_ref[0, c, :, oofs["K"] : oofs["K"] + n] = K
        out_ref[0, c, :, oofs["D"] : oofs["D"] + 1] = d
        for g in range(G):
            out_ref[0, c, :,
                    oofs["P"] + g * n : oofs["P"] + (g + 1) * n] = Pk[g]
            out_ref[0, c, :,
                    oofs["PV"] + g : oofs["PV"] + g + 1] = pk[g]
        Pn, pn = Pk, pk

    for g in range(G):
        P_scr[:, g * n : (g + 1) * n] = Pn[g]
        p_scr[:, g : g + 1] = pn[g]
    dv_scr[:, 0:1] = dv0
    dv_scr[:, 1:2] = dv1
    fl_scr[:, 0:1] = jnp.broadcast_to(ok_run, (SUB, 1))
    fl_scr[:, 1:2] = jnp.broadcast_to(fail, (SUB, 1))

    @pl.when(step == N // C - 1)
    def _final():
        acc_ref[:, 0:2] = dv_scr[:, :]
        acc_ref[:, 2:4] = fl_scr[:, :]


def _set_grouped(packed, off, M):
    """Scatter a [N, R, C] stack into row-group lane fields."""
    R, Cw = M.shape[1], M.shape[2]
    for g in range(_groups(R)):
        r0, r1 = g * SUB, min(R, (g + 1) * SUB)
        packed = packed.at[:, : r1 - r0,
                           off + g * Cw : off + g * Cw + Cw].set(M[:, r0:r1])
    return packed


def _pack_operands(A, B, f, lxx, luu, lux, lx, lu, reg, offs):
    """Pack per-knot operands into [N, 8, 128] lane-field tiles plus the
    [1, 8, 128] terminal/reg tile."""
    N, n, _ = A.shape
    m = B.shape[2]
    f32 = jnp.float32
    packed = jnp.zeros((N, SUB, LANE), f32)
    packed = _set_grouped(packed, offs["A"], A.astype(f32))
    packed = _set_grouped(packed, offs["B"], B.astype(f32))
    packed = _set_grouped(packed, offs["AT"],
                          jnp.swapaxes(A, 1, 2).astype(f32))
    packed = _set_grouped(packed, offs["BT"],
                          jnp.swapaxes(B, 1, 2).astype(f32))
    lxxd = lxx if lxx.ndim == 3 else jax.vmap(jnp.diag)(lxx)
    luud = luu if luu.ndim == 3 else jax.vmap(jnp.diag)(luu)
    packed = _set_grouped(packed, offs["LXX"], lxxd[:N].astype(f32))
    packed = _set_grouped(packed, offs["LUU"], luud.astype(f32))
    if lux is not None:
        packed = _set_grouped(packed, offs["LUX"], lux.astype(f32))
        packed = _set_grouped(packed, offs["LUXT"],
                              jnp.swapaxes(lux, 1, 2).astype(f32))
    packed = _set_grouped(packed, offs["LX"], lx[:N, :, None].astype(f32))
    packed = _set_grouped(packed, offs["LU"], lu[:, :, None].astype(f32))
    with_f = f is not None
    if with_f:
        packed = _set_grouped(packed, offs["F"], f[:, :, None].astype(f32))
    term = jnp.zeros((1, SUB, LANE), f32)
    term = _set_grouped(term, offs["LXX"], lxxd[None, N].astype(f32))
    term = _set_grouped(term, offs["LX"], lx[None, N, :, None].astype(f32))
    term = term.at[0, 0, offs["REG"]].set(jnp.asarray(reg, f32))
    return packed, term, with_f


def _pick_chunk(N: int) -> int:
    """Largest chunk size dividing N: amortizes per-grid-step pipeline
    overhead (dominant at 1 knot/step) against unrolled body size
    (measured best at 10; override with ALTRO_PACKED_CHUNK)."""
    import os

    cap = int(os.environ.get("ALTRO_PACKED_CHUNK", "10"))
    for c in (25, 20, 10, 8, 5, 4, 2):
        if c <= cap and N % c == 0:
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
    requires packed_supported(n, m). See the module docstring.
    """
    N, n, _ = A.shape
    m = B.shape[2]
    if not packed_supported(n, m):
        raise ValueError(
            f"packed latency kernel needs m <= {SUB} and the packed "
            f"fields to fit {LANE} lanes; got n={n}, m={m} "
            "(use the batched kernel or the scan)")
    offs, G, _ = _field_offsets(n, m)
    oofs = _out_offsets(n, G)
    C = _pick_chunk(N) if chunk is None else chunk
    if N % C != 0:
        raise ValueError(f"chunk {C} must divide N={N}")
    dtype = A.dtype
    packed, term, with_f = _pack_operands(
        A, B, f, lxx, luu, lux, lx, lu, reg, offs)
    # knot-reverse so chunk blocks stream contiguously in recursion order
    packed_rev = packed[::-1].reshape(N // C, C, SUB, LANE)

    kern = functools.partial(
        _kernel, n, m, N, C, G, offs, oofs, symmetrize, with_f,
        lux is not None)
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
            pltpu.VMEM((SUB, max(G * n, SUB)), jnp.float32),  # P carry
            pltpu.VMEM((SUB, G), jnp.float32),        # p carry (grouped)
            pltpu.VMEM((SUB, 2), jnp.float32),        # delta_V accumulators
            pltpu.VMEM((SUB, 2), jnp.float32),        # ok / fail_index
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(packed_rev, term)

    out = out.reshape(N, SUB, LANE)[::-1]
    K = out[:, :m, oofs["K"] : oofs["K"] + n].astype(dtype)
    d = out[:, :m, oofs["D"]].astype(dtype)
    lxxd = lxx if lxx.ndim == 3 else jax.vmap(jnp.diag)(lxx)
    P_rows = jnp.concatenate(
        [out[:, : min(SUB, n - g * SUB),
             oofs["P"] + g * n : oofs["P"] + (g + 1) * n]
         for g in range(G)], axis=1)
    p_rows = jnp.concatenate(
        [out[:, : min(SUB, n - g * SUB), oofs["PV"] + g]
         for g in range(G)], axis=1)
    P = jnp.concatenate([P_rows, lxxd[None, -1]], axis=0).astype(dtype)
    p = jnp.concatenate([p_rows, lx[None, -1]], axis=0).astype(dtype)
    delta_V = acc[0, 0:2].astype(dtype)
    ok = acc[0, 2] > 0.5
    fail_index = acc[0, 3].astype(jnp.int32)
    return TVLQRGains(K=K, d=d, P=P, p=p, delta_V=delta_V, ok=ok,
                      fail_index=fail_index)
