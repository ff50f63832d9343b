"""Tile-resident AL expansion + fused Riccati backward (custom_vmap).

Round-1 profiling (docs/PERF.md) showed the fused Pallas backward's cost
at headline scale is dominated by the batch-major -> lane-tile relayout
of its operands: the expansions are produced by a vmapped per-knot
computation that XLA materializes batch-major, then transposes (the slow
small-minor-dim path) into the kernel's (8, 128) lane-tile layout.

This module moves the `custom_vmap` dispatch boundary UP from the
backward pass to the whole "expansions + backward" block:

  * per-lane (unbatched): exactly the existing path — knot-vmapped AL
    expansions + the serial-scan backward with adaptive regularization
    (bitwise-identical to the non-Pallas solver, so the f64 parity suite
    is untouched);
  * batched (TPU, f32, batch a multiple of 1024): the expansion
    producers are re-vmapped with the batch axes TRAILING — nested
    vmaps over (batch-tile, knot, sublane, lane) with out_axes placing
    lanes last — so the expansion arrays materialize directly in the
    kernel's [Bt, N, entry.., 8, 128] layout with ZERO relayout, and
    stream into `riccati_backward_pallas_tiled`. The dynamics Jacobians
    are recomputed inside the boundary (cheap for scalar-form models)
    rather than relayouting the carried batch-major A/B.

Measured (scripts/proto_tile_expand.py, TPU v5e, B=2048, bicycle
headline): expansion+backward 0.88 -> 0.62 ms (1.42x), max|dK| = 0
against the batch-major kernel path.

The boundary takes `problem` as an ARGUMENT (not a closure): in the
batched MPC runners the cost's linear terms and x0 are per-lane batched
tracers, and only arguments are visible to the batching rule.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from altro_tpu.ops.pallas_riccati import (
    BATCH_TILE,
    batch_to_tiles,
    riccati_backward_pallas_tiled,
    tiles_to_batch,
)

__all__ = ["make_expand_backward"]

# Test hook: route the batched rule through the Pallas interpreter on CPU
# so the tiled dispatch path is exercised without TPU hardware.
_FORCE_INTERPRET = False


class ExpandBackwardOut(NamedTuple):
    """Everything the solver iteration needs from the block."""

    K: jnp.ndarray
    d: jnp.ndarray
    P: jnp.ndarray
    p: jnp.ndarray
    delta_V: jnp.ndarray
    ok: jnp.ndarray
    fail_index: jnp.ndarray
    reg_used: jnp.ndarray
    phi0: jnp.ndarray
    lx: jnp.ndarray
    lu: jnp.ndarray


def _on_tpu() -> bool:
    default_dev = getattr(jax.config, "jax_default_device", None)
    if default_dev is not None:
        return getattr(default_dev, "platform", None) == "tpu"
    return jax.default_backend() == "tpu"


def _expansions_tiled(problem, prob_axes, x_t, u_t, z_t, z_axes, rho_t,
                      rho_b, diag=False):
    """AL + dynamics expansions with batch axes trailing.

    problem: Problem pytree whose BATCHED array leaves are tiled
    ([Bt, orig..., 8, 128]) and unbatched leaves left as-is; prob_axes
    marks which is which. x_t: [Bt, N+1, n, 8, 128], u_t likewise; z_t
    per group tiled or unbatched per z_axes; rho_t: [Bt, 8, 128] when
    rho_b else scalar.

    Returns (A, B, lx, lu, lxx, luu, lux, phi0) in lane-tile layout.
    """
    from altro_tpu import al

    N = problem.N
    ks = jnp.arange(N, dtype=jnp.int32)

    if diag:
        # diagonal expansion fast path (al.al_hess_diag): lxx/luu stream
        # as diagonals, the cross-Hessian is identically zero
        def stage(prob, k, xk, uk, zk, rho):
            lx, lu = al.al_grad(prob, k, xk, uk, zk, rho, terminal=False)
            lxxd, luud = al.al_hess_diag(prob, k, xk, uk, zk, rho,
                                         terminal=False)
            cost_k, _, _ = al.al_cost(prob, k, xk, uk, zk, rho, terminal=False)
            A, B = prob.dyn_expansion(k, xk, uk)
            return A, B, lx, lu, lxxd, luud, cost_k

        def term(prob, xN, zN, rho):
            lxN, _ = al.al_grad(prob, N, xN, None, zN, rho, terminal=True)
            lxxdN, _ = al.al_hess_diag(prob, N, xN, None, zN, rho,
                                       terminal=True)
            costN, _, _ = al.al_cost(prob, N, xN, None, zN, rho, terminal=True)
            return lxN, lxxdN, costN
    else:
        def stage(prob, k, xk, uk, zk, rho):
            lx, lu = al.al_grad(prob, k, xk, uk, zk, rho, terminal=False)
            lxx, luu, lux = al.al_hess(prob, k, xk, uk, zk, rho, terminal=False)
            cost_k, _, _ = al.al_cost(prob, k, xk, uk, zk, rho, terminal=False)
            A, B = prob.dyn_expansion(k, xk, uk)
            return A, B, lx, lu, lxx, luu, lux, cost_k

        def term(prob, xN, zN, rho):
            lxN, _ = al.al_grad(prob, N, xN, None, zN, rho, terminal=True)
            lxxN, _, _ = al.al_hess(prob, N, xN, None, zN, rho, terminal=True)
            costN, _, _ = al.al_cost(prob, N, xN, None, zN, rho, terminal=True)
            return lxN, lxxN, costN

    # per-level in_axes for the problem pytree: batched leaves carry
    # (Bt, .., 8, 128); map Bt at the tile level and the trailing lane/
    # sublane axes at the inner levels; unbatched leaves broadcast.
    p_lane = jax.tree.map(lambda b: -1 if b else None, prob_axes)
    p_tile = jax.tree.map(lambda b: 0 if b else None, prob_axes)
    z_lane = jax.tree.map(lambda b: -1 if b else None, z_axes)
    z_knot = jax.tree.map(lambda b: 0 if b else 0, z_axes)  # z has a knot axis either way
    z_tile = jax.tree.map(lambda b: 0 if b else None, z_axes)
    r_lane = -1 if rho_b else None
    r_tile = 0 if rho_b else None

    f = stage
    f = jax.vmap(f, in_axes=(p_lane, None, -1, -1, z_lane, r_lane), out_axes=-1)
    f = jax.vmap(f, in_axes=(p_lane, None, -1, -1, z_lane, r_lane), out_axes=-1)
    f = jax.vmap(f, in_axes=(None, 0, 0, 0, z_knot, None), out_axes=0)
    f = jax.vmap(f, in_axes=(p_tile, None, 0, 0, z_tile, r_tile), out_axes=0)

    g = term
    g = jax.vmap(g, in_axes=(p_lane, -1, z_lane, r_lane), out_axes=-1)
    g = jax.vmap(g, in_axes=(p_lane, -1, z_lane, r_lane), out_axes=-1)
    g = jax.vmap(g, in_axes=(p_tile, 0, z_tile, r_tile), out_axes=0)

    def z_stage(zj, b):
        return zj[:, :N] if b else zj[:N]

    def z_term(zj, b):
        return zj[:, N] if b else zj[N]

    zs = jax.tree.map(z_stage, z_t, z_axes)
    zN = jax.tree.map(z_term, z_t, z_axes)

    if diag:
        A, B, lx_s, lu, lxx_s, luu, cost_s = f(
            problem, ks, x_t[:, :N], u_t, zs, rho_t
        )
        lux = None
    else:
        A, B, lx_s, lu, lxx_s, luu, lux, cost_s = f(
            problem, ks, x_t[:, :N], u_t, zs, rho_t
        )
    lxN, lxxN, costN = g(problem, x_t[:, N], zN, rho_t)
    lx = jnp.concatenate([lx_s, lxN[:, None]], axis=1)
    lxx = jnp.concatenate([lxx_s, lxxN[:, None]], axis=1)
    phi0 = jnp.sum(cost_s, axis=1) + costN
    return A, B, lx, lu, lxx, luu, lux, phi0


def _retry_tiled(opts, attempt, reg0_t):
    """Adaptive-regularization retry over the whole tiled batch —
    per-lane semantics identical to the vmapped per-lane while_loop in
    solver.backward_adaptive (lanes already ok keep their gains; only
    failing lanes bump reg and take the recomputed values)."""

    g0 = attempt(reg0_t)

    def cond(c):
        g, _, tries = c
        return jnp.logical_and(tries < opts.reg_max_retries,
                               jnp.any(jnp.logical_not(g.ok)))

    def body(c):
        g, reg_c, tries = c
        need = jnp.logical_not(g.ok)  # [Bt, 8, 128]
        reg_new = jnp.where(
            need,
            jnp.where(reg_c <= 0, opts.reg_min, reg_c * opts.reg_scaling),
            reg_c,
        )
        g2 = attempt(reg_new)

        def sel(old, new):
            mask = need.reshape(
                need.shape[:1] + (1,) * (old.ndim - 3) + need.shape[1:]
            )
            return jnp.where(mask, new, old)

        g_sel = jax.tree.map(sel, g, g2)
        return g_sel, reg_new, tries + 1

    g, reg_used, _ = jax.lax.while_loop(
        cond, body, (g0, reg0_t, jnp.asarray(0, jnp.int32))
    )
    return g, reg_used


def make_expand_backward(opts):
    """Build the custom_vmap boundary for (problem, x, u, z, rho, A, B,
    reg) -> ExpandBackwardOut. opts is static (jit constants)."""
    from altro_tpu import solver as _solver
    from altro_tpu.tvlqr import tvlqr_backward

    @jax.custom_batching.custom_vmap
    def expand_backward(problem, x, u, z, rho, A, B, reg):
        # per-lane path: the plain solver iteration block
        lx, lu, lxx, luu, lux, phi0 = _solver._cost_expansions_and_cost(
            problem, x, u, z, rho
        )
        f_zero = jnp.zeros_like(lx[: A.shape[0]])

        def attempt(r):
            return tvlqr_backward(A, B, f_zero, lxx, luu, lux, lx, lu, r,
                                  symmetrize=opts.symmetrize_ctg)

        gains, reg_used = _solver._retry_loop(opts, attempt, reg)
        return ExpandBackwardOut(
            K=gains.K, d=gains.d, P=gains.P, p=gains.p,
            delta_V=gains.delta_V, ok=gains.ok, fail_index=gains.fail_index,
            reg_used=reg_used, phi0=phi0, lx=lx, lu=lu,
        )

    @expand_backward.def_vmap
    def _rule(axis_size, in_batched, problem, x, u, z, rho, A, B, reg):
        (pb_prob, pb_x, pb_u, pb_z, pb_rho, _pb_A, _pb_B, pb_reg) = in_batched
        interpret = _FORCE_INTERPRET
        use_tiled = (
            (interpret or _on_tpu())
            and axis_size % BATCH_TILE == 0
            and x.dtype == jnp.float32
            and pb_x and pb_u
            # single-level batching: unbatched x is [N+1, n]
            and x.ndim == 3
            and not opts.symmetrize_ctg
        )
        import os as _os

        if _os.environ.get("ALTRO_DEBUG_TILED"):
            import sys as _sys

            print(
                f"tiled_backward rule: use_tiled={use_tiled} axis={axis_size} "
                f"dtype={x.dtype} ndim={x.ndim} on_tpu={_on_tpu()}",
                file=_sys.stderr,
            )
        if not use_tiled:
            axes = jax.tree.map(
                lambda b: 0 if b else None,
                (pb_prob, pb_x, pb_u, pb_z, pb_rho, _pb_A, _pb_B, pb_reg),
            )
            out = jax.vmap(expand_backward.fun, in_axes=axes)(
                problem, x, u, z, rho, A, B, reg
            )
            return out, ExpandBackwardOut(*([True] * len(out)))

        # ---- tiled path -------------------------------------------------
        problem_t = jax.tree.map(
            lambda leaf, b: batch_to_tiles(leaf) if b else leaf,
            problem, pb_prob,
        )
        x_t = batch_to_tiles(x)
        u_t = batch_to_tiles(u)
        z_t = jax.tree.map(
            lambda leaf, b: batch_to_tiles(leaf) if b else leaf, z, pb_z
        )
        rho_t = batch_to_tiles(rho[:, None])[:, 0] if pb_rho else rho
        if pb_reg:
            reg_t = batch_to_tiles(reg[:, None])[:, 0]
        else:
            bt = axis_size // BATCH_TILE
            reg_t = jnp.broadcast_to(
                jnp.asarray(reg, jnp.float32), (bt, 8, 128)
            )

        from altro_tpu import al as _al

        diag = opts.diag_expansion and _al.diag_expansion_eligible(problem)
        A_t, B_t, lx_t, lu_t, lxx_t, luu_t, lux_t, phi0_t = _expansions_tiled(
            problem_t, pb_prob, x_t, u_t, z_t, pb_z, rho_t, pb_rho, diag=diag
        )

        def attempt(r_t):
            return riccati_backward_pallas_tiled(
                A_t, B_t, lxx_t, luu_t, lx_t, lu_t, r_t, lux=lux_t,
                diag_cost=diag, interpret=interpret,
            )

        g, reg_used_t = _retry_tiled(opts, attempt, reg_t)

        out = ExpandBackwardOut(
            K=tiles_to_batch(g.K),
            d=tiles_to_batch(g.d),
            P=tiles_to_batch(g.P),
            p=tiles_to_batch(g.p),
            delta_V=tiles_to_batch(g.delta_V),
            ok=tiles_to_batch(g.ok),
            fail_index=tiles_to_batch(g.fail_index),
            reg_used=tiles_to_batch(reg_used_t[:, None])[:, 0].astype(x.dtype),
            phi0=tiles_to_batch(phi0_t[:, None])[:, 0],
            lx=tiles_to_batch(lx_t),
            lu=tiles_to_batch(lu_t),
        )
        return out, ExpandBackwardOut(*([True] * len(out)))

    return expand_backward
