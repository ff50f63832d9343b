"""Pallas TPU kernel: packed line-search TRIAL-GRID rollout (latency).

After the packed backward kernel (ops/pallas_packed.py) landed, the
N=500 single solve's remaining sequential chain was the line-search
trial rollouts: W grid trials x N knots of user dynamics, each knot a
handful of tiny VPU ops paying full XLA op-dispatch latency (~4 us/knot
at N=500 — docs/PERF.md round-3 attribution; the reference's forward
pass is the same serial chain in C++, tvlqr.cpp:208-244 +
solver.cpp:237-258). This kernel runs the WHOLE grid rollout as one
Pallas program:

  * the W <= 8 trial step sizes ride the 8 SUBLANES of every tile — the
    grid is data-parallel across sublanes, so all trials advance in one
    pass of the sequential chain;
  * state components live in LANES: the carry x is an (8, n) block in
    VMEM scratch; per-knot operands (x_ref, u_ref, K, d, diagonal cost
    rows, h) are packed into the 128 lanes of one (8, 128) tile per
    knot, pre-broadcast across sublanes at pack time so in-kernel reads
    are plain lane slices (no scalar extraction);
  * the user dynamics run INSIDE the kernel through the tile-step
    protocol (models/tile_steps.py): `step(x_tile, u_tile, h_col)`
    written in Mosaic-lowerable jnp ops — masked-reduce component
    extraction, one-hot lane assembly;
  * the merit value (diagonal-LQR AL cost, unconstrained) accumulates
    in-kernel per trial row; the rolled-out state stacks stream out per
    knot so the accepted trial's payload is reconstructed knot-parallel
    afterwards (solver.light_from_xstack), exactly like the scan path.

Scope: problems with DiagonalCost; constraint groups declared AFFINE
with NEGATIVE_ORTHANT cones (bounds / boxes / linear halfspaces —
ConstraintSpec.affine) evaluate their AL merit term IN-KERNEL from
per-knot coefficient rows (round-5 VERDICT item 2: the reference pays
zero structural cost for constraints in its solve loop,
solver.cpp:285-316, and now neither does the fast path). Everything
else (nonlinear constraints, other cones) keeps the scan grid.
Supported sizes: the operand fields must fit 128 lanes
(n + 3(n+m) + m*n + 2 + P*(n+m+1) + 1 <= 128 with P total constraint
elements: bicycle/double integrator/pendulum/cartpole/quadrotor all
fit, incl. the steering-bound configs).

Mosaic layout rules follow ops/pallas_packed.py's working notes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "make_trial_grid_rollout",
    "rollout_supported",
    "rollout_constraints_eligible",
    "affine_constraint_stacks",
    "SUB",
]

SUB, LANE = 8, 128


def _offsets(n: int, m: int, P: int = 0):
    fields = [("XREF", n), ("UREF", m), ("D", m), ("K", m * n),
              ("QD", n), ("QL", n), ("RD", m), ("RL", m), ("C", 1),
              ("H", 1)]
    if P:
        # Affine AL-constraint coefficient fields, premultiplied at the
        # call boundary: w_e = CG_e - CAX_e.x - CAU_e.u equals
        # z_e - rho*c_e(x, u); the AL merit adds RHOI * min(0, w_e)^2
        # (RHOI = 1/(2 rho)). Inactive knots pack all-zero rows.
        fields += [("CAX", P * n), ("CAU", P * m), ("CG", P), ("RHOI", 1)]
    offs, cur = {}, 0
    for key, w in fields:
        offs[key] = cur
        cur += w
    return offs, cur


def rollout_supported(n: int, m: int, P: int = 0) -> bool:
    """True when the per-knot operand fields fit one 128-lane tile."""
    return _offsets(n, m, P)[1] <= LANE


def rollout_constraints_eligible(problem) -> bool:
    """True when every constraint group can ride the packed rollout
    kernel: declared affine with a NEGATIVE_ORTHANT cone (the dual
    projection min(0, .) is elementwise, so the AL merit term is a
    per-element VPU expression). Unconstrained problems qualify."""
    from altro_tpu.cones import Cone

    return all(
        spec.affine and spec.cone is Cone.NEGATIVE_ORTHANT
        for spec in problem.constraints
    )


def affine_constraint_stacks(problem):
    """Per-knot affine coefficients of the declared-affine constraint
    groups, concatenated over groups:
      cax [N+1, P, n], cau [N+1, P, m], cg [N+1, P], act [N+1, P]
    with c_e(x, u) = cax_e . x + cau_e . u + cg_e exactly (the
    ConstraintSpec.affine contract). Extracted once at trace time by
    evaluating each group's Jacobian/value at (0, 0)."""
    n, m = problem.n, problem.m
    dtype = problem.x0.dtype
    ks = jnp.arange(problem.N + 1, dtype=jnp.int32)
    xz = jnp.zeros((n,), dtype)
    uz = jnp.zeros((m,), dtype)
    AX, AU, G, ACT = [], [], [], []
    for spec in problem.constraints:
        J = jax.vmap(lambda k: spec.jacobian(xz, uz, k))(ks)  # [N+1, p, n+m]
        g = jax.vmap(lambda k: spec.fn(xz, uz, k))(ks)        # [N+1, p]
        AX.append(J[:, :, :n])
        AU.append(J[:, :, n:])
        G.append(g)
        ACT.append(
            jnp.broadcast_to(
                spec.active[:, None], g.shape).astype(dtype))
    return (jnp.concatenate(AX, axis=1), jnp.concatenate(AU, axis=1),
            jnp.concatenate(G, axis=1), jnp.concatenate(ACT, axis=1))


def _lane_onehot(j, w, dtype=jnp.float32):
    io = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    return (io == j).astype(dtype)


def _al_term(blk, offs, n, m, P, x, u):
    """In-kernel AL merit add: RHOI * sum_e min(0, w_e)^2 with
    w_e = CG_e - CAX_e.x - CAU_e.u (= z_e - rho c_e; NEGATIVE_ORTHANT
    dual projection). u=None at the terminal knot."""
    alc = jnp.zeros((SUB, 1), jnp.float32)
    for e in range(P):
        ax = blk[:, offs["CAX"] + e * n : offs["CAX"] + (e + 1) * n]
        w = (blk[:, offs["CG"] + e : offs["CG"] + e + 1]
             - jnp.sum(ax * x, axis=1, keepdims=True))
        if u is not None:
            au = blk[:, offs["CAU"] + e * m : offs["CAU"] + (e + 1) * m]
            w = w - jnp.sum(au * u, axis=1, keepdims=True)
        pw = jnp.minimum(w, 0.0)
        alc = alc + pw * pw
    return blk[:, offs["RHOI"] : offs["RHOI"] + 1] * alc


def _kernel(n, m, P, N, C, offs, step_tile, op_ref, init_ref, term_ref,
            x_out_ref, acc_ref, x_scr, phi_scr):
    """One grid step = one chunk of C knots, processed forward. The x
    carry and running phi live in VMEM scratch between grid steps (and
    in registers within a chunk)."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        x_scr[:, :n] = init_ref[0][:, 1 : 1 + n]
        phi_scr[:, :] = jnp.zeros((SUB, 1), jnp.float32)

    alpha = init_ref[0][:, 0:1]
    x = x_scr[:, :n]
    phi = phi_scr[:, 0:1]

    for c in range(C):
        blk = op_ref[0, c]
        xref = blk[:, offs["XREF"] : offs["XREF"] + n]
        dx = x - xref
        ucols = []
        for j in range(m):
            Krow = blk[:, offs["K"] + j * n : offs["K"] + (j + 1) * n]
            s = jnp.sum(Krow * dx, axis=1, keepdims=True)
            ucols.append(
                blk[:, offs["UREF"] + j : offs["UREF"] + j + 1]
                + alpha * blk[:, offs["D"] + j : offs["D"] + j + 1]
                - s
            )
        u = ucols[0] * _lane_onehot(0, m)
        for j in range(1, m):
            u = u + ucols[j] * _lane_onehot(j, m)

        qd = blk[:, offs["QD"] : offs["QD"] + n]
        ql = blk[:, offs["QL"] : offs["QL"] + n]
        rd = blk[:, offs["RD"] : offs["RD"] + m]
        rl = blk[:, offs["RL"] : offs["RL"] + m]
        cconst = blk[:, offs["C"] : offs["C"] + 1]
        phi = (
            phi
            + 0.5 * jnp.sum(qd * x * x, axis=1, keepdims=True)
            + jnp.sum(ql * x, axis=1, keepdims=True)
            + 0.5 * jnp.sum(rd * u * u, axis=1, keepdims=True)
            + jnp.sum(rl * u, axis=1, keepdims=True)
            + cconst
        )
        if P:
            phi = phi + _al_term(blk, offs, n, m, P, x, u)
        x_out_ref[0, c, :, :n] = x
        h = blk[:, offs["H"] : offs["H"] + 1]
        x = step_tile(x, u, h)

    x_scr[:, :n] = x
    phi_scr[:, 0:1] = phi

    @pl.when(step == N // C - 1)
    def _final():
        t = term_ref[0]
        qd = t[:, offs["QD"] : offs["QD"] + n]
        ql = t[:, offs["QL"] : offs["QL"] + n]
        cconst = t[:, offs["C"] : offs["C"] + 1]
        phi_N = (
            phi
            + 0.5 * jnp.sum(qd * x * x, axis=1, keepdims=True)
            + jnp.sum(ql * x, axis=1, keepdims=True)
            + cconst
        )
        if P:
            phi_N = phi_N + _al_term(t, offs, n, m, P, x, None)
        acc_ref[:, 0:1] = phi_N
        acc_ref[:, 1 : 1 + n] = x


def _pack_operands(xref, uref, K, d, Qd, ql, Rd, rl, cconst, h, offs, used,
                   con=None):
    """[N, 8, 128] per-knot operand tiles (fields pre-broadcast across
    sublanes) + the [1, 8, 128] terminal tile. `con` is the optional
    (wa [N+1, P, n], wu [N+1, P, m], wg [N+1, P], rhoi scalar) affine
    AL-constraint bundle (already active-masked and rho-premultiplied)."""
    N, m, n = K.shape
    f32 = jnp.float32
    cols = [
        xref[:N].astype(f32),
        uref.astype(f32),
        d.astype(f32),
        K.reshape(N, m * n).astype(f32),
        Qd[:N].astype(f32),
        ql[:N].astype(f32),
        Rd[:N].astype(f32),
        rl[:N].astype(f32),
        cconst[:N, None].astype(f32),
        h[:, None].astype(f32),
    ]
    if con is not None:
        wa, wu, wg, rhoi = con
        P = wg.shape[1]
        cols += [
            wa[:N].reshape(N, P * n).astype(f32),
            wu[:N].reshape(N, P * m).astype(f32),
            wg[:N].astype(f32),
            jnp.broadcast_to(
                jnp.asarray(rhoi, f32).reshape(1, 1), (N, 1)),
        ]
    row = jnp.concatenate(cols, axis=1)
    row = jnp.pad(row, ((0, 0), (0, LANE - used)))
    packed = jnp.broadcast_to(row[:, None, :], (N, SUB, LANE))
    trow = jnp.zeros((LANE,), f32)
    trow = trow.at[offs["QD"] : offs["QD"] + n].set(Qd[N].astype(f32))
    trow = trow.at[offs["QL"] : offs["QL"] + n].set(ql[N].astype(f32))
    trow = trow.at[offs["C"]].set(cconst[N].astype(f32))
    if con is not None:
        P = con[2].shape[1]
        trow = trow.at[offs["CAX"] : offs["CAX"] + P * n].set(
            con[0][N].reshape(P * n).astype(f32))
        trow = trow.at[offs["CG"] : offs["CG"] + P].set(
            con[2][N].astype(f32))
        trow = trow.at[offs["RHOI"]].set(
            jnp.asarray(con[3], f32).reshape(()))
    term = jnp.broadcast_to(trow[None, None, :], (1, SUB, LANE))
    return packed, term


def _pick_chunk(N: int) -> int:
    """Knots per grid step. The rollout body is much smaller than the
    backward kernel's (~40 VPU ops vs ~1500), so the ~2.5 us grid-step
    overhead dominates at small chunks — larger chunks win (measured on
    the N=500 row; override with ALTRO_ROLLOUT_CHUNK)."""
    import os

    cap = int(os.environ.get("ALTRO_ROLLOUT_CHUNK", "25"))
    for c in (25, 20, 10, 8, 5, 4, 2):
        if c <= cap and N % c == 0:
            return c
    return 1


def _scan_rollout(step_tile, alphas, x0, xref, uref, K, d, Qd, ql, Rd, rl,
                  cconst, h, con=None):
    """Portable fallback: the same trial-grid rollout as a lax.scan with
    the W trials riding a leading tile axis (the tile-step protocol is
    plain jnp code, so it runs outside Pallas too). Any dtype/backend.
    `con` as in _pack_operands."""
    N, m, n = K.shape
    dtype = x0.dtype
    W = alphas.shape[0]
    x = jnp.broadcast_to(x0, (W, n)).astype(dtype)
    a_col = alphas[:, None].astype(dtype)
    if con is not None:
        wa, wu, wg, rhoi = con
        rhoi = jnp.asarray(rhoi, dtype)

    def body(carry, inp):
        x, phi = carry
        if con is not None:
            xr, ur, K_k, d_k, qd, qlv, rd, rlv, cc, h_k, wa_k, wu_k, wg_k = inp
        else:
            xr, ur, K_k, d_k, qd, qlv, rd, rlv, cc, h_k = inp
        dx = x - xr[None, :]
        u = ur[None, :] + a_col * d_k[None, :] - dx @ K_k.T
        phi = (
            phi
            + 0.5 * jnp.sum(qd[None, :] * x * x, axis=1)
            + jnp.sum(qlv[None, :] * x, axis=1)
            + 0.5 * jnp.sum(rd[None, :] * u * u, axis=1)
            + jnp.sum(rlv[None, :] * u, axis=1)
            + cc
        )
        if con is not None:
            w = wg_k[None, :] - x @ wa_k.T - u @ wu_k.T  # [W, P]
            pw = jnp.minimum(w, 0.0)
            phi = phi + rhoi * jnp.sum(pw * pw, axis=1)
        x_next = step_tile(x, u, jnp.broadcast_to(h_k, (W, 1)).astype(dtype))
        return (x_next, phi), x

    xs_in = (xref[:N], uref, K, d, Qd[:N], ql[:N], Rd[:N], rl[:N],
             cconst[:N], h)
    if con is not None:
        xs_in = xs_in + (wa[:N], wu[:N], wg[:N])
    (x_N, phi), x_st = jax.lax.scan(
        body, (x, jnp.zeros((W,), dtype)), xs_in,
    )
    phi = (
        phi
        + 0.5 * jnp.sum(Qd[N][None, :] * x_N * x_N, axis=1)
        + jnp.sum(ql[N][None, :] * x_N, axis=1)
        + cconst[N]
    )
    if con is not None:
        w = wg[N][None, :] - x_N @ wa[N].T
        pw = jnp.minimum(w, 0.0)
        phi = phi + rhoi * jnp.sum(pw * pw, axis=1)
    xs = jnp.concatenate([x_st, x_N[None]], axis=0)  # [N+1, W, n]
    return phi, jnp.swapaxes(xs, 0, 1)


def make_trial_grid_rollout(step_tile, interpret=False, n_con=0):
    """Build the grid-rollout callable for one tile-step function.

    Returns grid(alphas[W], x0, xref, uref, K, d, Qd, ql, Rd, rl, c, h)
    -> (phis[W], xstack[W, N+1, n]). With n_con = P > 0 the signature
    gains (wa [N+1, P, n], wu [N+1, P, m], wg [N+1, P], rhoi scalar) —
    the active-masked, rho-premultiplied affine AL-constraint bundle
    (w_e = wg - wa.x - wu.u = z - rho*c; merit adds
    rhoi * sum min(0, w)^2). Unbatched f32 traces on a TPU backend (or
    with interpret=True) run the packed Pallas kernel; any other trace
    — CPU, f64, or a vmapped (batched) solve — falls back to the
    portable scan, whose values the kernel matches to f32 roundoff
    (tests/test_pallas_rollout.py).
    """

    @jax.custom_batching.custom_vmap
    def grid(alphas, x0, xref, uref, K, d, Qd, ql, Rd, rl, cconst, h, *con):
        N, m, n = K.shape
        from altro_tpu.ops.packed_backward import _on_tpu

        cb = (con[0], con[1], con[2], con[3]) if n_con else None
        if ((interpret or _on_tpu()) and x0.dtype == jnp.float32
                and alphas.shape[0] <= SUB
                and rollout_supported(n, m, n_con)):
            return _pallas_rollout(
                step_tile, alphas, x0, xref, uref, K, d, Qd, ql, Rd, rl,
                cconst, h, con=cb, interpret=interpret)
        return _scan_rollout(step_tile, alphas, x0, xref, uref, K, d, Qd,
                             ql, Rd, rl, cconst, h, con=cb)

    @grid.def_vmap
    def _vmap_rule(axis_size, in_batched, *args):
        in_axes = [0 if b else None for b in in_batched]

        def call(*a):
            base, con = a[:12], a[12:]
            cb = (con[0], con[1], con[2], con[3]) if n_con else None
            return _scan_rollout(step_tile, *base, con=cb)

        out = jax.vmap(call, in_axes=in_axes)(*args)
        return out, (True, True)

    return grid


def _pallas_rollout(step_tile, alphas, x0, xref, uref, K, d, Qd, ql, Rd, rl,
                    cconst, h, con=None, interpret=False):
    N, m, n = K.shape
    dtype = x0.dtype
    W = alphas.shape[0]
    P = 0 if con is None else con[2].shape[1]
    offs, used = _offsets(n, m, P)
    C = _pick_chunk(N)
    packed, term = _pack_operands(
        xref, uref, K, d, Qd, ql, Rd, rl, cconst, h, offs, used, con=con)
    packed = packed.reshape(N // C, C, SUB, LANE)

    a_pad = jnp.zeros((SUB,), jnp.float32).at[:W].set(alphas.astype(jnp.float32))
    init_row = jnp.concatenate(
        [a_pad[:, None], jnp.broadcast_to(x0.astype(jnp.float32), (SUB, n))],
        axis=1,
    )
    init = jnp.pad(init_row, ((0, 0), (0, LANE - 1 - n)))[None]

    kern = functools.partial(_kernel, n, m, P, N, C, offs, step_tile)
    x_out, acc = pl.pallas_call(
        kern,
        grid=(N // C,),
        in_specs=[
            pl.BlockSpec((1, C, SUB, LANE), lambda s: (s, 0, 0, 0)),
            pl.BlockSpec((1, SUB, LANE), lambda s: (0, 0, 0)),
            pl.BlockSpec((1, SUB, LANE), lambda s: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, C, SUB, LANE), lambda s: (s, 0, 0, 0)),
            pl.BlockSpec((SUB, LANE), lambda s: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N // C, C, SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((SUB, LANE), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((SUB, max(n, SUB)), jnp.float32),  # x carry
            pltpu.VMEM((SUB, 1), jnp.float32),            # phi carry
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(packed, init, term)

    phis = acc[:W, 0].astype(dtype)
    x_st = x_out.reshape(N, SUB, LANE)[:, :W, :n]      # [N, W, n]
    x_N = acc[:W, 1 : 1 + n]                           # [W, n]
    xstack = jnp.concatenate(
        [jnp.swapaxes(x_st, 0, 1), x_N[:, None, :]], axis=1
    ).astype(dtype)                                    # [W, N+1, n]
    return phis, xstack
