"""Bisect the tile-resident regression: replicate the solver's EXACT
boundary consumption pattern and time variants.

bench A/B showed the tiled boundary 823k vs 1400k solves/s end-to-end
despite proto_tile_expand measuring the block 1.42x faster — that proto
under-consumed outputs (only p, in tiled form). Here every variant:
  * starts from a batch-major x carry (tiling paid per rep, as in the
    solver's while_loop),
  * uses PER-LANE batched cost linear terms q/c (as the MPC runners do),
  * consumes ALL outputs batch-major (K, d, P, p, dV, phi0, lx, lu).

Variants:
  r0  batch-major expansions + relayouting kernel (the old path)
  r1  tiled boundary exactly as ops/tiled_backward.py's rule
  r2  r1 but WITHOUT converting K/d/P/p back (tiled consumption) — how
      much of the gap is output conversion
  r3  r1 but with SHARED (unbatched) q/c — how much is the batched-cost
      gather inside the nested vmap

Usage: python scripts/proto_tile_real.py [B] [REPS]
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import pick_platform


def main():
    Bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 40

    platform = pick_platform()
    if platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from altro_tpu.cones import Cone
    from altro_tpu.io.scotty import load_scotty, synthetic_scotty
    from altro_tpu.models.bicycle import bicycle_continuous
    from altro_tpu.models.integrators import midpoint
    from altro_tpu.ops import tiled_backward as tbk
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
    # per-lane batched linear cost terms (as the MPC runners batch them)
    qb = jnp.broadcast_to(cost0.q, (Bsz,) + cost0.q.shape) + 1e-6 * jax.random.normal(
        jax.random.PRNGKey(1), (Bsz,) + cost0.q.shape, dtype
    )
    cb = jnp.broadcast_to(cost0.c, (Bsz,) + cost0.c.shape)

    def prob_lane(qi, ci):
        return dataclasses.replace(
            problem, cost=dataclasses.replace(problem.cost, q=qi, c=ci)
        )

    def consume(K, d, P, p, dV, phi0, lx, lu):
        return (jnp.sum(K[:, 0]) + jnp.sum(d[:, 0]) + jnp.sum(P[:, 0])
                + jnp.sum(p[:, 0]) + jnp.sum(dV) + jnp.sum(phi0)
                + jnp.sum(lx[:, 0]) + jnp.sum(lu[:, 0]))

    # ---- r0: old path -------------------------------------------------------
    @jax.jit
    def r0(x_):
        def step(xc, _):
            A, B, lx, lu, lxx, luu, lux, alc = jax.vmap(
                lambda xi, ui, zi, ri, qi, ci: _expansions_and_cost(
                    prob_lane(qi, ci), xi, ui, zi, ri
                )
            )(xc, u, z, rho, qb, cb)
            f0 = jnp.zeros_like(A[..., 0])
            g = riccati_backward_pallas(
                A, B, f0, lxx, luu, lux, lx, lu, reg=0.0, interpret=interp
            )
            s = consume(g.K, g.d, g.P, g.p, g.delta_V, alc, lx, lu)
            return xc * (1.0 + 1e-12 * s) + 1e-12 * g.p[:, : N + 1], None

        out, _ = jax.lax.scan(step, x_, None, length=REPS)
        return out

    # ---- tiled boundary pieces ---------------------------------------------
    pb_prob_leaves = dataclasses.replace(
        problem,
        cost=dataclasses.replace(
            problem.cost,
            Q=False, R=False, q=True, r=False, c=True,
        ),
        h=False, x0=True,
        constraints=tuple(
            dataclasses.replace(s_, active=False) for s_ in problem.constraints
        ),
    )

    def tiled_block(xc, qi, ci, convert_out, batched_cost):
        prob_b = dataclasses.replace(
            problem,
            cost=dataclasses.replace(
                problem.cost,
                q=batch_to_tiles(qi) if batched_cost else cost0.q,
                c=batch_to_tiles(ci) if batched_cost else cost0.c,
            ),
            x0=batch_to_tiles(jnp.broadcast_to(problem.x0, (Bsz, n))),
        )
        pb = dataclasses.replace(
            pb_prob_leaves,
            cost=dataclasses.replace(
                pb_prob_leaves.cost, q=batched_cost, c=batched_cost
            ),
        )
        x_t = batch_to_tiles(xc)
        u_t = batch_to_tiles(u)
        z_t = (batch_to_tiles(z[0]),)
        rho_t = batch_to_tiles(rho[:, None])[:, 0]
        reg_t = jnp.zeros_like(rho_t)
        A_t, B_t, lx_t, lu_t, lxx_t, luu_t, lux_t, phi0_t = tbk._expansions_tiled(
            prob_b, pb, x_t, u_t, z_t, (True,), rho_t, True
        )
        g = riccati_backward_pallas_tiled(
            A_t, B_t, lxx_t, luu_t, lx_t, lu_t, reg_t, lux=lux_t,
            interpret=interp,
        )
        if convert_out:
            K, d, P, p = (tiles_to_batch(g.K), tiles_to_batch(g.d),
                          tiles_to_batch(g.P), tiles_to_batch(g.p))
            dV = tiles_to_batch(g.delta_V)
            phi0 = tiles_to_batch(phi0_t[:, None])[:, 0]
            lx, lu = tiles_to_batch(lx_t), tiles_to_batch(lu_t)
            s = consume(K, d, P, p, dV, phi0, lx, lu)
            pret = p
        else:
            s = (jnp.sum(g.K[:, :, :, :, 0]) + jnp.sum(g.d) + jnp.sum(g.P[:, 0])
                 + jnp.sum(g.p) + jnp.sum(g.delta_V) + jnp.sum(phi0_t)
                 + jnp.sum(lx_t) + jnp.sum(lu_t))
            pret = tiles_to_batch(g.p)
        return s, pret

    def make_r(convert_out, batched_cost):
        @jax.jit
        def r(x_):
            def step(xc, _):
                s, p = tiled_block(xc, qb, cb, convert_out, batched_cost)
                return xc * (1.0 + 1e-12 * s) + 1e-12 * p[:, : N + 1], None

            out, _ = jax.lax.scan(step, x_, None, length=REPS)
            return out

        return r

    r1 = make_r(True, True)
    r2 = make_r(False, True)
    r3 = make_r(True, False)

    # ---- r4: r1 + the adaptive-reg retry while_loop (tiled carry) ----------
    from altro_tpu.options import SolverOptions

    opts = SolverOptions(pallas_backward=True)

    @jax.jit
    def r4(x_):
        def step(xc, _):
            prob_b = dataclasses.replace(
                problem,
                cost=dataclasses.replace(
                    problem.cost, q=batch_to_tiles(qb), c=batch_to_tiles(cb)
                ),
                x0=batch_to_tiles(jnp.broadcast_to(problem.x0, (Bsz, n))),
            )
            pb = dataclasses.replace(
                pb_prob_leaves,
                cost=dataclasses.replace(pb_prob_leaves.cost, q=True, c=True),
            )
            x_t = batch_to_tiles(xc)
            u_t = batch_to_tiles(u)
            z_t = (batch_to_tiles(z[0]),)
            rho_t = batch_to_tiles(rho[:, None])[:, 0]
            reg_t = jnp.zeros_like(rho_t)
            A_t, B_t, lx_t, lu_t, lxx_t, luu_t, lux_t, phi0_t = (
                tbk._expansions_tiled(prob_b, pb, x_t, u_t, z_t, (True,),
                                      rho_t, True)
            )

            def attempt(r_t):
                return riccati_backward_pallas_tiled(
                    A_t, B_t, lxx_t, luu_t, lx_t, lu_t, r_t, lux=lux_t,
                    interpret=interp,
                )

            g, reg_used = tbk._retry_tiled(opts, attempt, reg_t)
            K, d, P, p = (tiles_to_batch(g.K), tiles_to_batch(g.d),
                          tiles_to_batch(g.P), tiles_to_batch(g.p))
            dV = tiles_to_batch(g.delta_V)
            phi0 = tiles_to_batch(phi0_t[:, None])[:, 0]
            lx, lu = tiles_to_batch(lx_t), tiles_to_batch(lu_t)
            s = consume(K, d, P, p, dV, phi0, lx, lu)
            return xc * (1.0 + 1e-12 * s) + 1e-12 * p[:, : N + 1], None

        out, _ = jax.lax.scan(step, x_, None, length=REPS)
        return out

    # ---- r5: the actual custom_vmap boundary under vmap (solver context) ---
    eb = tbk.make_expand_backward(opts)

    @jax.jit
    def r5(x_):
        def step(xc, _):
            def one(xi, ui, zi, ri, qi, ci):
                prob = prob_lane(qi, ci)
                reg0 = jnp.asarray(0.0, dtype)
                A0 = jnp.zeros((N, n, n), dtype)
                B0 = jnp.zeros((N, n, m), dtype)
                return eb(prob, xi, ui, zi, ri, A0, B0, reg0)

            o = jax.vmap(one)(xc, u, z, rho, qb, cb)
            s = consume(o.K, o.d, o.P, o.p, o.delta_V, o.phi0, o.lx, o.lu)
            return xc * (1.0 + 1e-12 * s) + 1e-12 * o.p[:, : N + 1], None

        out, _ = jax.lax.scan(step, x_, None, length=REPS)
        return out

    def timeit(fn, arg):
        jax.block_until_ready(fn(arg))
        t0 = time.perf_counter()
        jax.block_until_ready(fn(arg))
        return (time.perf_counter() - t0) / REPS * 1e3

    t0_ = timeit(r0, x)
    t1_ = timeit(r1, x)
    t2_ = timeit(r2, x)
    t3_ = timeit(r3, x)
    t4_ = timeit(r4, x)
    t5_ = timeit(r5, x)
    print(
        json.dumps(
            {
                "B": Bsz, "N": N, "platform": platform,
                "r0_old_ms": round(t0_, 4),
                "r1_tiled_full_ms": round(t1_, 4),
                "r2_no_outconv_ms": round(t2_, 4),
                "r3_shared_cost_ms": round(t3_, 4),
                "r4_retry_loop_ms": round(t4_, 4),
                "r5_custom_vmap_ms": round(t5_, 4),
            }
        )
    )




def while_variant():
    """r6: the boundary inside a lax.while_loop with a solver-like carry
    (x, u, K, d, P, p) — isolates while-boundary layout copies.
    Usage: python scripts/proto_tile_real.py --while [B] [REPS]
    """
    Bsz = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 40

    platform = pick_platform()
    if platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from altro_tpu.cones import Cone
    from altro_tpu.io.scotty import load_scotty, synthetic_scotty
    from altro_tpu.models.bicycle import bicycle_continuous
    from altro_tpu.models.integrators import midpoint
    from altro_tpu.ops import tiled_backward as tbk
    from altro_tpu.options import SolverOptions
    from altro_tpu.problem import ConstraintSpec, Problem, lqr_cost_from_reference
    from altro_tpu.solver import _expansions_and_cost, backward_adaptive

    interp = platform == "cpu"
    dtype = jnp.float32
    N, n, m = 30, 4, 2
    try:
        ref = load_scotty()
    except FileNotFoundError:
        ref = synthetic_scotty(N=500)
    h = float(np.float32(ref.tf / ref.N))
    cost0 = lqr_cost_from_reference(
        jnp.asarray(np.full((N + 1, n), 1e-2), dtype),
        jnp.asarray(np.full((N + 1, m), 1e-3), dtype),
        jnp.asarray(ref.x[: N + 1], dtype), jnp.asarray(ref.u[: N + 1], dtype))
    delta_max = 60 * np.pi / 180.0
    steering = ConstraintSpec(
        fn=lambda x, u, k: jnp.stack([x[3] - delta_max, -delta_max - x[3]]),
        cone=Cone.NEGATIVE_ORTHANT, dim=2, active=jnp.ones(N + 1, bool),
        label="steer", diag_hessian=True)
    problem = Problem(N=N, n=n, m=m, dynamics=midpoint(bicycle_continuous()),
                      dynamics_jac=None, constraints=(steering,), cost=cost0,
                      h=jnp.full(N, h, dtype), x0=jnp.asarray(ref.x[0], dtype))
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.tile(ref.x[: N + 1], (Bsz, 1, 1))
                    + 0.02 * rng.standard_normal((Bsz, N + 1, n)), dtype)
    u = jnp.asarray(np.tile(ref.u[:N], (Bsz, 1, 1))
                    + 0.02 * rng.standard_normal((Bsz, N, m)), dtype)
    z = (jnp.asarray(0.1 * rng.random((Bsz, N + 1, 2)), dtype),)
    rho = jnp.full((Bsz,), 10.0, dtype)
    qb = jnp.broadcast_to(cost0.q, (Bsz,) + cost0.q.shape)
    cb = jnp.broadcast_to(cost0.c, (Bsz,) + cost0.c.shape)
    eb = tbk.make_expand_backward(
        SolverOptions(pallas_backward=True, pallas_tile_resident=True))
    if interp:
        tbk._FORCE_INTERPRET = True

    def prob_lane(qi, ci):
        return dataclasses.replace(
            problem, cost=dataclasses.replace(problem.cost, q=qi, c=ci))

    A0 = jnp.zeros((N, n, n), dtype)
    B0 = jnp.zeros((N, n, m), dtype)

    def make_loop(tiled):
        @jax.jit
        def run(x0_):
            def cond(c):
                return c[0] < REPS

            def body(c):
                i, xc, uc, K, d, P, p = c
                if tiled:
                    def lane(xi, ui, zi, ri, qi, ci):
                        o = eb(prob_lane(qi, ci), xi, ui, zi, ri, A0, B0,
                               jnp.asarray(0.0, dtype))
                        return o.K, o.d, o.P, o.p, o.phi0, o.lx, o.lu
                else:
                    def lane(xi, ui, zi, ri, qi, ci):
                        A, Bm, lx, lu, lxx, luu, lux, alc = (
                            _expansions_and_cost(prob_lane(qi, ci), xi, ui,
                                                 zi, ri))
                        g, _ = backward_adaptive(
                            SolverOptions(pallas_backward=True),
                            A, Bm, lxx, luu, lux, lx, lu,
                            jnp.asarray(0.0, dtype))
                        return g.K, g.d, g.P, g.p, alc, lx, lu

                K2, d2, P2, p2, phi0, lx, lu = jax.vmap(lane)(
                    xc, uc, z, rho, qb, cb)
                # solver-like carry update (cheap, batch-major)
                s = jnp.sum(phi0) + jnp.sum(lx[:, 0]) + jnp.sum(lu[:, 0])
                xc2 = xc * (1.0 + 1e-12 * p2) + 1e-15 * s
                uc2 = uc * (1.0 + 1e-12 * d2)
                return (i + 1, xc2, uc2, K2, d2, P2, p2)

            K0 = jnp.zeros((Bsz, N, m, n), dtype)
            d0 = jnp.zeros((Bsz, N, m), dtype)
            P0 = jnp.zeros((Bsz, N + 1, n, n), dtype)
            p0 = jnp.zeros((Bsz, N + 1, n), dtype)
            out = jax.lax.while_loop(
                cond, body, (jnp.asarray(0, jnp.int32), x0_, u, K0, d0, P0, p0))
            return out[1], out[5]

        return run

    def timeit(fn, arg):
        jax.block_until_ready(fn(arg))
        t0 = time.perf_counter()
        jax.block_until_ready(fn(arg))
        return (time.perf_counter() - t0) / REPS * 1e3

    t_old = timeit(make_loop(False), x)
    t_tiled = timeit(make_loop(True), x)
    print(json.dumps({
        "B": Bsz, "platform": platform,
        "r6_while_old_ms": round(t_old, 4),
        "r6_while_tiled_ms": round(t_tiled, 4),
    }))


if __name__ == "__main__":
    if "--while" in sys.argv:
        while_variant()
    else:
        main()
