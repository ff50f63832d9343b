"""Prototype: produce the AL + dynamics expansions DIRECTLY in lane-tile
layout (nested vmaps with batch axes trailing) and feed the tiled Pallas
backward — vs the current batch-major expansion vmap + relayouting
Pallas entry. Uses the REAL headline problem (bicycle + steering bound +
diagonal tracking cost) so the op mix is honest.

  e0  current: vmap(expansions) batch-major -> riccati_backward_pallas
  e1  tiled:   nested-vmap expansions (batch axes trailing, outputs
               materialize as [Bt, N, ..., 8, 128] with no transpose)
               -> riccati_backward_pallas_tiled (dense, lux streamed)
  e2  e1 + diagonal AL Hessian (the headline's steering bound has a
      diagonal J^T J) + lux=None -> diag_cost kernel

Usage: python scripts/proto_tile_expand.py [B] [REPS]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import pick_platform


def main():
    Bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    platform = pick_platform()
    if platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from altro_tpu import al, cones
    from altro_tpu.cones import Cone
    from altro_tpu.io.scotty import load_scotty, synthetic_scotty
    from altro_tpu.models.bicycle import bicycle_continuous
    from altro_tpu.models.integrators import midpoint
    from altro_tpu.ops.pallas_riccati import (
        batch_to_tiles,
        riccati_backward_pallas,
        riccati_backward_pallas_tiled,
        tiles_to_batch,
    )
    from altro_tpu.problem import ConstraintSpec, Problem, lqr_cost_from_reference
    from altro_tpu.solver import _expansions_and_cost

    interp = platform == "cpu"
    dtype = jnp.float32
    N, n, m = 30, 4, 2
    try:
        ref = load_scotty()
    except FileNotFoundError:
        ref = synthetic_scotty(N=500)
    h = float(np.float32(ref.tf / ref.N))
    Qd = np.full(n, 1e-2)
    Rd = np.full(m, 1e-3)
    cost0 = lqr_cost_from_reference(
        jnp.asarray(np.tile(Qd, (N + 1, 1)), dtype),
        jnp.asarray(np.tile(Rd, (N + 1, 1)), dtype),
        jnp.asarray(ref.x[: N + 1], dtype),
        jnp.asarray(ref.u[: N + 1], dtype),
    )
    delta_max = 60 * np.pi / 180.0
    steering = ConstraintSpec(
        fn=lambda x, u, k: jnp.stack([x[3] - delta_max, -delta_max - x[3]]),
        cone=Cone.NEGATIVE_ORTHANT, dim=2, active=jnp.ones(N + 1, bool),
        label="steering bound",
    )
    problem = Problem(
        N=N, n=n, m=m, dynamics=midpoint(bicycle_continuous()),
        dynamics_jac=None, constraints=(steering,), cost=cost0,
        h=jnp.full(N, h, dtype), x0=jnp.asarray(ref.x[0], dtype),
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        np.tile(ref.x[: N + 1], (Bsz, 1, 1)) + 0.02 * rng.standard_normal((Bsz, N + 1, n)),
        dtype,
    )
    u = jnp.asarray(
        np.tile(ref.u[:N], (Bsz, 1, 1)) + 0.02 * rng.standard_normal((Bsz, N, m)), dtype
    )
    z = (jnp.asarray(0.1 * rng.random((Bsz, N + 1, 2)), dtype),)
    rho = jnp.full((Bsz,), 10.0, dtype)
    reg0 = jnp.zeros((Bsz,), dtype)

    # ---- e0: current path --------------------------------------------------
    @jax.jit
    def e0(x_):
        def step(xc, _):
            A, B, lx, lu, lxx, luu, lux, alc = jax.vmap(
                lambda xi, ui, zi, ri: _expansions_and_cost(problem, xi, ui, zi, ri)
            )(xc, u, z, rho)
            f0 = jnp.zeros_like(A[..., 0])
            g = riccati_backward_pallas(
                A, B, f0, lxx, luu, lux, lx, lu, reg=0.0, interpret=interp
            )
            return xc * (1.0 + 1e-12 * g.p[:, :, :1] * 0 + 1e-12 * g.p[:, : N + 1]), (
                alc, g.delta_V
            )

        xc, (alc, dV) = jax.lax.scan(step, x_, None, length=REPS)
        return xc, alc, dV

    # ---- tiled expansion producer ------------------------------------------
    ks = jnp.arange(N, dtype=jnp.int32)

    def stage_dense(k, xk, uk, zk, rho_k):
        lx, lu = al.al_grad(problem, k, xk, uk, zk, rho_k, terminal=False)
        lxx, luu, lux = al.al_hess(problem, k, xk, uk, zk, rho_k, terminal=False)
        cost_k, _, _ = al.al_cost(problem, k, xk, uk, zk, rho_k, terminal=False)
        A, B = problem.dyn_expansion(k, xk, uk)
        return A, B, lx, lu, lxx, luu, lux, cost_k

    def stage_diag(k, xk, uk, zk, rho_k):
        lx, lu = al.al_grad(problem, k, xk, uk, zk, rho_k, terminal=False)
        cost_k, _, _ = al.al_cost(problem, k, xk, uk, zk, rho_k, terminal=False)
        A, B = problem.dyn_expansion(k, xk, uk)
        lxxd = problem.cost.Q[k]
        luud = problem.cost.R[k]
        for spec, zj in zip(problem.constraints, zk):
            dual = cones.dual_cone(spec.cone)
            c_j = spec.fn(xk, uk, k)
            ze = zj - rho_k * c_j
            Jc = spec.jacobian(xk, uk, k)
            Pj = cones.project_jacobian(dual, ze)
            Jt = Pj @ Jc
            hd = rho_k * jnp.sum(Jt * Jt, axis=0)
            act = spec.active[k]
            lxxd = lxxd + jnp.where(act, hd[:n], 0.0)
            luud = luud + jnp.where(act, hd[n:], 0.0)
        return A, B, lx, lu, lxxd, luud, cost_k

    def tileify(stage, term):
        f = jax.vmap(stage, in_axes=(None, -1, -1, -1, -1), out_axes=-1)
        f = jax.vmap(f, in_axes=(None, -1, -1, -1, -1), out_axes=-1)
        f = jax.vmap(f, in_axes=(0, 0, 0, 0, None), out_axes=0)   # knots
        f = jax.vmap(f, in_axes=(None, 0, 0, 0, 0), out_axes=0)   # Bt
        g = jax.vmap(term, in_axes=(-1, -1, -1), out_axes=-1)
        g = jax.vmap(g, in_axes=(-1, -1, -1), out_axes=-1)
        g = jax.vmap(g, in_axes=(0, 0, 0), out_axes=0)            # Bt
        return f, g

    def term_dense(xN, zN, rho_k):
        lxN, _ = al.al_grad(problem, N, xN, None, zN, rho_k, terminal=True)
        lxxN, _, _ = al.al_hess(problem, N, xN, None, zN, rho_k, terminal=True)
        costN, _, _ = al.al_cost(problem, N, xN, None, zN, rho_k, terminal=True)
        return lxN, lxxN, costN

    def term_diag(xN, zN, rho_k):
        lxN, _ = al.al_grad(problem, N, xN, None, zN, rho_k, terminal=True)
        costN, _, _ = al.al_cost(problem, N, xN, None, zN, rho_k, terminal=True)
        lxxd = problem.cost.Q[N]
        um = jnp.zeros((m,), xN.dtype)
        for spec, zj in zip(problem.constraints, zN):
            dual = cones.dual_cone(spec.cone)
            c_j = spec.fn(xN, um, N)
            ze = zj - rho_k * c_j
            Jc = spec.jacobian(xN, um, N)
            Pj = cones.project_jacobian(dual, ze)
            Jt = Pj @ Jc
            hd = rho_k * jnp.sum(Jt * Jt, axis=0)
            lxxd = lxxd + jnp.where(spec.active[N], hd[:n], 0.0)
        return lxN, lxxd, costN

    stage_t_dense, term_t_dense = tileify(stage_dense, term_dense)
    stage_t_diag, term_t_diag = tileify(stage_diag, term_diag)

    x_t = batch_to_tiles(x)       # [Bt, N+1, n, 8, 128]
    u_t = batch_to_tiles(u)
    z_t = tuple(batch_to_tiles(zj) for zj in z)
    rho_t = batch_to_tiles(rho[:, None])[:, 0]
    reg_t = batch_to_tiles(reg0[:, None])[:, 0]

    @jax.jit
    def e1(x_t_):
        def step(xc, _):
            zs = tuple(zj[:, :N] for zj in z_t)
            A, B, lx_s, lu, lxx_s, luu, lux, cost_s = stage_t_dense(
                ks, xc[:, :N], u_t, zs, rho_t
            )
            zN = tuple(zj[:, N] for zj in z_t)
            lxN, lxxN, costN = term_t_dense(xc[:, N], zN, rho_t)
            lx = jnp.concatenate([lx_s, lxN[:, None]], axis=1)
            lxx = jnp.concatenate([lxx_s, lxxN[:, None]], axis=1)
            phi0 = jnp.sum(cost_s, axis=1) + costN
            g = riccati_backward_pallas_tiled(
                A, B, lxx, luu, lx, lu, reg_t, lux=lux, interpret=interp
            )
            return xc * (1.0 + 1e-12 * g.p), (phi0, g.delta_V)

        xc, (phi0, dV) = jax.lax.scan(step, x_t_, None, length=REPS)
        return xc, phi0, dV

    @jax.jit
    def e2(x_t_):
        def step(xc, _):
            zs = tuple(zj[:, :N] for zj in z_t)
            A, B, lx_s, lu, lxxd_s, luud, cost_s = stage_t_diag(
                ks, xc[:, :N], u_t, zs, rho_t
            )
            zN = tuple(zj[:, N] for zj in z_t)
            lxN, lxxdN, costN = term_t_diag(xc[:, N], zN, rho_t)
            lx = jnp.concatenate([lx_s, lxN[:, None]], axis=1)
            lxxd = jnp.concatenate([lxxd_s, lxxdN[:, None]], axis=1)
            phi0 = jnp.sum(cost_s, axis=1) + costN
            g = riccati_backward_pallas_tiled(
                A, B, lxxd, luud, lx, lu, reg_t, lux=None, diag_cost=True,
                interpret=interp,
            )
            return xc * (1.0 + 1e-12 * g.p), (phi0, g.delta_V)

        xc, (phi0, dV) = jax.lax.scan(step, x_t_, None, length=REPS)
        return xc, phi0, dV

    # ---- correctness: one step of each agrees ------------------------------
    A, B, lx, lu, lxx, luu, lux, alc = jax.vmap(
        lambda xi, ui, zi, ri: _expansions_and_cost(problem, xi, ui, zi, ri)
    )(x, u, z, rho)
    f0 = jnp.zeros_like(A[..., 0])
    g0 = riccati_backward_pallas(
        A, B, f0, lxx, luu, lux, lx, lu, reg=0.0, interpret=interp
    )
    zs = tuple(zj[:, :N] for zj in z_t)
    At, Bt_, lx_s, lut, lxx_s, luut, luxt, cost_s = stage_t_dense(
        ks, x_t[:, :N], u_t, zs, rho_t
    )
    zN = tuple(zj[:, N] for zj in z_t)
    lxN, lxxN, costN = term_t_dense(x_t[:, N], zN, rho_t)
    lxt = jnp.concatenate([lx_s, lxN[:, None]], axis=1)
    lxxt = jnp.concatenate([lxx_s, lxxN[:, None]], axis=1)
    g1 = riccati_backward_pallas_tiled(
        At, Bt_, lxxt, luut, lxt, lut, reg_t, lux=luxt, interpret=interp
    )
    dK = float(jnp.max(jnp.abs(tiles_to_batch(g1.K) - g0.K)))
    dphi = float(
        jnp.max(jnp.abs(tiles_to_batch((jnp.sum(cost_s, axis=1) + costN)[:, None])[:, 0] - alc))
    )
    print(json.dumps({"check_dK": dK, "check_dphi0": dphi}))

    def timeit(fn, arg):
        jax.block_until_ready(fn(arg))
        t0 = time.perf_counter()
        jax.block_until_ready(fn(arg))
        return (time.perf_counter() - t0) / REPS * 1e3

    t0_ = timeit(e0, x)
    t1_ = timeit(e1, x_t)
    t2_ = timeit(e2, x_t)
    print(
        json.dumps(
            {
                "B": Bsz, "N": N, "platform": platform,
                "e0_batch_major_ms": round(t0_, 4),
                "e1_tiled_dense_ms": round(t1_, 4),
                "e2_tiled_diag_ms": round(t2_, 4),
                "e1_speedup": round(t0_ / t1_, 3),
                "e2_speedup": round(t0_ / t2_, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
