"""Pallas TPU kernel: tile-resident BATCHED line-search trial-grid rollout.

Round-5 stage attribution (scripts/profile_tile_stages.py, TPU v5e,
B=2048 headline shapes, chained 400-rep timing): the W=8 trial rollout
grid is 0.320 ms of the 0.348 ms tile-resident iteration — the Riccati
backward, expansions and completion almost fully overlap with it. Even
a single-trial rollout costs 0.197 ms: the 30-step knot-sequential XLA
scan pays op-granularity scheduling latency per knot (~6.6 us/knot for
a body whose pure VPU issue time is well under 1 us). This kernel runs
the WHOLE grid rollout as ONE Pallas program:

  * lanes: each (8, 128) tile holds 1024 independent batch lanes — the
    same lane-tile layout as the fused tiled backward
    (ops/pallas_riccati.py); state components are separate tiles;
  * the W trial step sizes are an unrolled in-kernel loop, so the
    per-knot operands (x_ref, u_ref, K, d, cost rows, constraint rows)
    are read from VMEM once and reused by all W trials;
  * the x carry ([W, n] tiles) and running merit phi ([W] tiles) live
    in VMEM scratch across grid steps (registers within a chunk);
  * the user dynamics run INSIDE the kernel through the COLUMN-form
    tile-step protocol (models/tile_steps.py: Problem.dynamics_cols —
    `step(x_cols, u_cols, h)` on per-component (8, 128) tiles, written
    in Mosaic-lowerable jnp ops);
  * the merit (diagonal-cost AL value) accumulates in-kernel; affine
    NEGATIVE_ORTHANT constraint groups add their AL term from
    rho-premultiplied per-knot coefficient tiles (same algebra as the
    packed kernel, ops/pallas_rollout.py::_al_term).

Scope (mirrors the packed kernel's): DiagonalCost; every constraint
group declared affine with a NEGATIVE_ORTHANT cone (bounds / boxes /
linear halfspaces) and UNBATCHED specs; f32; column-form dynamics
present. Everything else keeps the XLA scan grid
(ops/tile_iter.rollout_grid_tiled), whose values this kernel matches
to f32 roundoff (tests/test_pallas_rollout_tiled.py).

Reference parity: the merit rollout loop this fuses is
solver.cpp:273-316 (MeritFunction: closed-loop rollout + AL cost); the
reference runs it once per trial per solve on one thread.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from altro_tpu.ops.pallas_riccati import SUB, LANE

__all__ = [
    "rollout_tiled_eligible",
    "rollout_grid_pallas_tiled",
]


def _pick_chunk(N: int, tiles_per_knot: int, interpret: bool) -> int:
    """Knots per grid step: amortize the ~2.5 us Mosaic grid-step
    overhead against a ~4 MB double-buffered VMEM budget per side (the
    same policy as the tiled backward's _pick_chunk; at quadrotor
    n=12 / W=8 block sizes the streamed chunk is ~10x the bicycle's).
    The body unrolls W trials x C knots, so C also bounds Mosaic
    compile time; interpret mode defaults to 1 (the interpreter pays
    minutes on unrolled multi-knot bodies). Override:
    ALTRO_ROLLOUT_TILED_CHUNK."""
    default = "1" if interpret else "6"
    cap = int(os.environ.get("ALTRO_ROLLOUT_TILED_CHUNK", default))
    vmem_cap = max(1, int(4e6 // (tiles_per_knot * SUB * LANE * 4)))
    for c in (6, 5, 4, 3, 2):
        if c <= min(cap, vmem_cap) and N % c == 0:
            return c
    return 1


def rollout_tiled_eligible(problem, prob_axes) -> bool:
    """True when the batched trial-grid rollout can run as the Pallas
    kernel: column-form dynamics present, DiagonalCost, every constraint
    group affine + NEGATIVE_ORTHANT with an UNBATCHED spec (the affine
    coefficient extraction evaluates the shared per-lane callable)."""
    from altro_tpu.cones import Cone
    from altro_tpu.problem import DiagonalCost

    if problem.dynamics_cols is None:
        return False
    if not isinstance(problem.cost, DiagonalCost):
        return False
    for spec, spec_axes in zip(problem.constraints, prob_axes.constraints):
        if not (spec.affine and spec.cone is Cone.NEGATIVE_ORTHANT):
            return False
        if spec_axes.active:  # batched (per-lane) constraint data
            return False
    return True


def _kernel(n, m, P, W, Nc, C, step_cols, *refs):
    """One grid step = one chunk of C knots of one batch tile, forward.

    Streamed refs hold the chunk's (8, 128) lane tiles; the x carry
    ([W, n] tiles) and running phi ([W] tiles) persist in VMEM scratch
    (registers within a chunk). Operand order: xref, uref, K, d, Qd, q,
    Rd, r, cconst, h, [wax, wau, wg,] alphas, x0, rhoi, QdT, qT, ccT,
    [waxT, wgT,] then outputs x_out, xN_out, phi_out, scratch x_scr,
    phi_scr."""
    it = iter(refs)
    xref_ref, uref_ref, K_ref, d_ref = next(it), next(it), next(it), next(it)
    Qd_ref, q_ref, Rd_ref, r_ref, cc_ref, h_ref = (
        next(it), next(it), next(it), next(it), next(it), next(it))
    if P:
        wax_ref, wau_ref, wg_ref = next(it), next(it), next(it)
    a_ref, x0_ref, rhoi_ref = next(it), next(it), next(it)
    QdT_ref, qT_ref, ccT_ref = next(it), next(it), next(it)
    if P:
        waxT_ref, wgT_ref = next(it), next(it)
    x_out_ref, xN_out_ref, phi_out_ref, x_scr, phi_scr = (
        next(it), next(it), next(it), next(it), next(it))

    step = pl.program_id(1)

    @pl.when(step == 0)
    def _init():
        for w in range(W):
            for i in range(n):
                x_scr[w, i] = x0_ref[0, i]
            phi_scr[w] = jnp.zeros((SUB, LANE), jnp.float32)

    rhoi = rhoi_ref[0]
    xs = [[x_scr[w, i] for i in range(n)] for w in range(W)]
    phis = [phi_scr[w] for w in range(W)]
    alphas = [a_ref[w] for w in range(W)]

    for cc in range(C):
        xref = [xref_ref[0, cc, i] for i in range(n)]
        uref = [uref_ref[0, cc, j] for j in range(m)]
        Krow = [[K_ref[0, cc, j, i] for i in range(n)] for j in range(m)]
        dk = [d_ref[0, cc, j] for j in range(m)]
        qd = [Qd_ref[0, cc, i] for i in range(n)]
        ql = [q_ref[0, cc, i] for i in range(n)]
        rd = [Rd_ref[0, cc, j] for j in range(m)]
        rl = [r_ref[0, cc, j] for j in range(m)]
        ccst = cc_ref[0, cc]
        hk = h_ref[0, cc]
        if P:
            wax = [[wax_ref[0, cc, e, i] for i in range(n)] for e in range(P)]
            wau = [[wau_ref[0, cc, e, j] for j in range(m)] for e in range(P)]
            wg = [wg_ref[0, cc, e] for e in range(P)]

        for w in range(W):
            x = xs[w]
            dx = [x[i] - xref[i] for i in range(n)]
            u = [
                uref[j] + alphas[w] * dk[j]
                - sum(Krow[j][i] * dx[i] for i in range(n))
                for j in range(m)
            ]
            ph = (
                phis[w]
                + 0.5 * sum(qd[i] * x[i] * x[i] for i in range(n))
                + sum(ql[i] * x[i] for i in range(n))
                + 0.5 * sum(rd[j] * u[j] * u[j] for j in range(m))
                + sum(rl[j] * u[j] for j in range(m))
                + ccst
            )
            if P:
                for e in range(P):
                    we = (wg[e]
                          - sum(wax[e][i] * x[i] for i in range(n))
                          - sum(wau[e][j] * u[j] for j in range(m)))
                    pw = jnp.minimum(we, 0.0)
                    ph = ph + rhoi * pw * pw
            for i in range(n):
                x_out_ref[w, 0, cc, i] = x[i]
            xs[w] = list(step_cols(tuple(x), tuple(u), hk))
            phis[w] = ph

    for w in range(W):
        for i in range(n):
            x_scr[w, i] = xs[w][i]
        phi_scr[w] = phis[w]

    @pl.when(step == Nc - 1)
    def _final():
        for w in range(W):
            x = xs[w]
            ph = (
                phis[w]
                + 0.5 * sum(QdT_ref[0, i] * x[i] * x[i] for i in range(n))
                + sum(qT_ref[0, i] * x[i] for i in range(n))
                + ccT_ref[0]
            )
            if P:
                for e in range(P):
                    we = wgT_ref[0, e] - sum(
                        waxT_ref[0, e, i] * x[i] for i in range(n))
                    pw = jnp.minimum(we, 0.0)
                    ph = ph + rhoi * pw * pw
            phi_out_ref[w, 0] = ph
            for i in range(n):
                xN_out_ref[w, 0, i] = x[i]


def _bcast_tiled(leaf, batched, bt):
    """Shared [knot, ...] leaf -> [Bt, knot, ..., 8, 128] broadcast; a
    batched leaf is already tiled and passes through."""
    if batched:
        return jnp.asarray(leaf, jnp.float32)
    leaf = jnp.asarray(leaf, jnp.float32)
    shape = (bt,) + leaf.shape + (SUB, LANE)
    ix = (None,) + (slice(None),) * leaf.ndim + (None, None)
    return jnp.broadcast_to(leaf[ix], shape)


def rollout_grid_pallas_tiled(ta, ref_x_t, ref_u_t, K_t, d_t, z_t, rho_t,
                              alphas, x0_t, interpret=False):
    """Tile-resident batched trial-grid rollout as one Pallas program.

    Same contract as ops/tile_iter.rollout_grid_tiled: returns
    (phis [W, Bt, 8, 128], xstacks [W, Bt, N+1, n, 8, 128]). Caller
    gates on `rollout_tiled_eligible`.
    """
    from altro_tpu.ops.pallas_rollout import affine_constraint_stacks

    problem, prob_axes, z_axes = ta
    N, n, m = problem.N, problem.n, problem.m
    W = int(alphas.shape[0])
    bt = x0_t.shape[0]
    dtype = x0_t.dtype
    cost, cost_axes = problem.cost, prob_axes.cost
    T = (SUB, LANE)
    f32 = jnp.float32

    P = sum(spec.dim for spec in problem.constraints)
    # streamed tiles per knot: operands + the W-trial x_out block
    tiles_per_knot = (
        n + m + m * n + m + 2 * n + 2 * m + 2 + P * (n + m + 1) + W * n
    )
    C = _pick_chunk(N, tiles_per_knot, interpret)
    Nc = N // C

    # cost rows, broadcast per-lane where shared
    Qd_t = _bcast_tiled(cost.Q, cost_axes.Q, bt)
    q_t = _bcast_tiled(cost.q, cost_axes.q, bt)
    Rd_t = _bcast_tiled(cost.R, cost_axes.R, bt)
    r_t = _bcast_tiled(cost.r, cost_axes.r, bt)
    cc_t = _bcast_tiled(cost.c, cost_axes.c, bt)
    h_t = _bcast_tiled(problem.h, prob_axes.h, bt)

    in_arrays = [
        jnp.asarray(ref_x_t[:, :N], f32), jnp.asarray(ref_u_t, f32),
        jnp.asarray(K_t, f32), jnp.asarray(d_t, f32),
        Qd_t[:, :N], q_t[:, :N], Rd_t[:, :N], r_t[:, :N], cc_t[:, :N],
        h_t,
    ]

    def knot_spec(*blk):
        nblk = len(blk)
        return pl.BlockSpec(
            (1, C) + blk + T,
            lambda b, s, nblk=nblk: (b, s) + (0,) * nblk + (0, 0),
        )

    def const_spec(lead, *blk):
        nblk = len(blk)
        return pl.BlockSpec(
            (lead,) + blk + T,
            lambda b, s, nblk=nblk: (0,) + (0,) * nblk + (0, 0),
        )

    def bt_const_spec(*blk):
        nblk = len(blk)
        return pl.BlockSpec(
            (1,) + blk + T,
            lambda b, s, nblk=nblk: (b,) + (0,) * nblk + (0, 0),
        )

    in_specs = [
        knot_spec(n), knot_spec(m), knot_spec(m, n), knot_spec(m),
        knot_spec(n), knot_spec(n), knot_spec(m), knot_spec(m),
        knot_spec(), knot_spec(),
    ]

    if P:
        cax, cau, cg, act = affine_constraint_stacks(problem)
        # rho-premultiplied, active-masked rows (packed-kernel algebra:
        # w_e = wg - wax.x - wau.u = z - rho*c at active knots, 0 else)
        z_cat = jnp.concatenate(
            [zj if b else jnp.broadcast_to(
                zj[None, :, :, None, None],
                (bt,) + zj.shape + T)
             for zj, b in zip(z_t, z_axes)],
            axis=2,
        ).astype(f32)
        rho4 = rho_t[:, None, None, :, :].astype(f32)    # [Bt,1,1,S,L]
        axm = (cax * act[:, :, None]).astype(f32)        # [N+1,P,n]
        aum = (cau * act[:, :, None]).astype(f32)
        gm = (cg * act).astype(f32)
        wax_t = rho4[:, :, :, None] * axm[None, :, :, :, None, None]
        wau_t = rho4[:, :, :, None] * aum[None, :, :, :, None, None]
        wg_t = (act[None, :, :, None, None] * z_cat
                - rho4 * gm[None, :, :, None, None])
        in_arrays += [wax_t[:, :N], wau_t[:, :N], wg_t[:, :N]]
        in_specs += [knot_spec(P, n), knot_spec(P, m), knot_spec(P)]

    a_t = jnp.broadcast_to(
        alphas.astype(f32)[:, None, None], (W,) + T)
    rhoi_t = (1.0 / (2.0 * rho_t)).astype(f32)
    in_arrays += [a_t, jnp.asarray(x0_t, f32), rhoi_t,
                  Qd_t[:, N], q_t[:, N], cc_t[:, N]]
    in_specs += [const_spec(W), bt_const_spec(n), bt_const_spec(),
                 bt_const_spec(n), bt_const_spec(n), bt_const_spec()]
    if P:
        in_arrays += [wax_t[:, N], wg_t[:, N]]
        in_specs += [bt_const_spec(P, n), bt_const_spec(P)]

    out_specs = [
        pl.BlockSpec((W, 1, C, n) + T,
                     lambda b, s: (0, b, s, 0, 0, 0)),
        pl.BlockSpec((W, 1, n) + T, lambda b, s: (0, b, 0, 0, 0)),
        pl.BlockSpec((W, 1) + T, lambda b, s: (0, b, 0, 0)),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((W, bt, N, n) + T, f32),   # x knots 0..N-1
        jax.ShapeDtypeStruct((W, bt, n) + T, f32),      # x_N
        jax.ShapeDtypeStruct((W, bt) + T, f32),         # phi
    ]
    kern = functools.partial(
        _kernel, n, m, P, W, Nc, C, problem.dynamics_cols)
    x_out, x_N, phi = pl.pallas_call(
        kern,
        grid=(bt, Nc),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((W, n, SUB, LANE), jnp.float32),  # x carry
            pltpu.VMEM((W, SUB, LANE), jnp.float32),     # phi carry
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(*in_arrays)

    xstack = jnp.concatenate(
        [x_out, x_N[:, :, None]], axis=2).astype(dtype)
    return phi.astype(dtype), xstack
