"""Measure the tile-resident ITERATION vs the batch-major headline path.

Round-2's tiled boundary lost end-to-end because K/d/P/p converted back
to batch-major every iteration for the forward pass / line search
(docs/PERF.md). This prototype times the FULL per-iteration pipeline in
both layouts, with no layout conversion anywhere inside the tiled
variant:

  v0  batch-major: vmapped cost expansions -> batch-major Pallas
      backward (operand relayout inside) -> width-8 x-only grid rollout
      (vmapped) -> per-lane selection -> light_from_xstack ->
      knot-parallel completion (armijo-only: no dphi scan)
  v1  tiled: cost_expansions_tiled -> riccati_backward_pallas_tiled ->
      rollout_grid_tiled -> select_trial_tiled -> light_from_xstack_tiled
      -> completion_tiled, all on [Bt, ..., 8, 128] lane tiles
  v1d v1 with the diagonal expansion fast path (diag_cost kernel)

Parity: v1's accepted phi/alpha/x vs v0's, reported as max|diff|.

Usage: python scripts/proto_tile_iteration.py [B] [REPS]
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

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_cache_altro_proto"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from altro_tpu.cones import Cone
    from altro_tpu.io.scotty import load_scotty, synthetic_scotty
    from altro_tpu.models.bicycle import bicycle_continuous
    from altro_tpu.models.integrators import midpoint
    from altro_tpu.ops import tile_iter as ti
    from altro_tpu.ops.pallas_riccati import (
        batch_to_tiles,
        riccati_backward_pallas,
        riccati_backward_pallas_tiled,
        tiles_to_batch,
    )
    from altro_tpu.problem import ConstraintSpec, Problem, lqr_cost_from_reference
    from altro_tpu.solver import (
        _cost_expansions_and_cost,
        complete_merit_payload,
        light_from_xstack,
        merit_rollout_phi_x,
    )

    interp = platform == "cpu"
    dtype = jnp.float32
    N, n, m = 30, 4, 2
    W = 8
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
        label="steering bound", diag_hessian=True,
    )
    problem = Problem(
        N=N, n=n, m=m, dynamics=midpoint(bicycle_continuous()),
        dynamics_jac=None, constraints=(steering,), cost=cost0,
        h=jnp.full(N, h, dtype), x0=jnp.asarray(ref.x[0], dtype),
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        np.tile(ref.x[: N + 1], (Bsz, 1, 1))
        + 0.02 * rng.standard_normal((Bsz, N + 1, n)), dtype)
    u = jnp.asarray(
        np.tile(ref.u[:N], (Bsz, 1, 1))
        + 0.02 * rng.standard_normal((Bsz, N, m)), dtype)
    z = (jnp.asarray(0.1 * rng.random((Bsz, N + 1, 2)), dtype),)
    rho = jnp.full((Bsz,), 10.0, dtype)
    x0b = jnp.asarray(
        np.tile(ref.x[0], (Bsz, 1)) + 0.02 * rng.standard_normal((Bsz, n)),
        dtype)
    # per-lane batched linear cost terms (as the MPC runners batch them)
    qb = jnp.broadcast_to(cost0.q, (Bsz,) + cost0.q.shape) + 1e-6 * jax.random.normal(
        jax.random.PRNGKey(1), (Bsz,) + cost0.q.shape, dtype)
    cb = jnp.broadcast_to(cost0.c, (Bsz,) + cost0.c.shape)

    alphas = 0.5 ** jnp.arange(W, dtype=dtype)
    c1 = 1e-4

    def prob_lane(qi, ci, x0i):
        return dataclasses.replace(
            problem, x0=x0i,
            cost=dataclasses.replace(problem.cost, q=qi, c=ci))

    # ---- v0: batch-major iteration -----------------------------------------
    def v0_lane_fwd(prob, xi, ui, zi, ri, K, d, P, p, phi0, dphi0):
        def merit_light(a):
            return merit_rollout_phi_x(prob, xi, ui, K, d, zi, ri, a, prob.x0)

        phis, xstacks = jax.vmap(merit_light)(alphas)
        passes = phis <= phi0 + c1 * alphas * dphi0
        idx = jnp.argmax(passes)
        a_acc, phi_acc = alphas[idx], phis[idx]
        light = light_from_xstack(
            prob, phi_acc, xstacks[idx], xi, ui, K, d, P, p, zi, ri, a_acc)
        _, mm = complete_merit_payload(prob, light, K, d, zi, ri,
                                       with_dphi=False)
        return a_acc, phi_acc, mm.x, mm.u, mm.y, mm.A, mm.B, mm.lx, mm.lu

    def make_v0(reps):
      @jax.jit
      def v0(x_, u_):
        def step(carry, _):
            xc, uc = carry
            lx, lu, lxx, luu, lux, phi0 = jax.vmap(
                lambda xi, ui, zi, ri, qi, ci, x0i: _cost_expansions_and_cost(
                    prob_lane(qi, ci, x0i), xi, ui, zi, ri)
            )(xc, uc, z, rho, qb, cb, x0b)
            A, B = jax.vmap(
                lambda xi, ui: jax.vmap(
                    lambda k, xk, uk: problem.dyn_expansion(k, xk, uk)
                )(jnp.arange(N, dtype=jnp.int32), xi[:N], ui)
            )(xc, uc)
            f0 = jnp.zeros_like(A[..., 0])
            g = riccati_backward_pallas(A, B, f0, lxx, luu, lux, lx, lu,
                                        reg=0.0, interpret=interp)
            dphi0 = g.delta_V[:, 0]
            a_acc, phi_acc, xn, un, yn, An, Bn, lxn, lun = jax.vmap(
                lambda xi, ui, zi, ri, qi, ci, x0i, K, d, P, p, p0, d0:
                v0_lane_fwd(prob_lane(qi, ci, x0i), xi, ui, zi, ri, K, d,
                            P, p, p0, d0)
            )(xc, uc, z, rho, qb, cb, x0b, g.K, g.d, g.P, g.p, phi0, dphi0)
            s = (jnp.sum(a_acc) + jnp.sum(phi_acc) + jnp.sum(yn[:, 0])
                 + jnp.sum(lxn[:, 0]) + jnp.sum(lun[:, 0])
                 + jnp.sum(An[:, 0]) + jnp.sum(Bn[:, 0]))
            return (xn * (1.0 + 1e-12 * s), un), (a_acc[0], phi_acc[0])

        (xo, uo), aux = jax.lax.scan(step, (x_, u_), None, length=reps)
        return xo, uo, aux

      return v0

    v0 = make_v0(REPS)
    v0_1 = make_v0(1)

    # ---- v1: tiled iteration -------------------------------------------------
    prob_tiled = dataclasses.replace(
        problem,
        cost=dataclasses.replace(problem.cost, q=batch_to_tiles(qb),
                                 c=batch_to_tiles(cb)),
        x0=batch_to_tiles(x0b))
    prob_axes = dataclasses.replace(
        problem,
        cost=dataclasses.replace(problem.cost, Q=False, R=False, q=True,
                                 r=False, c=True),
        h=False, x0=True,
        constraints=tuple(dataclasses.replace(s_, active=False)
                          for s_ in problem.constraints))
    ta = ti.TileArgs(prob_tiled, prob_axes, (True,))
    z_t = (batch_to_tiles(z[0]),)
    rho_t = batch_to_tiles(rho[:, None])[:, 0]
    reg_t = jnp.zeros_like(rho_t)
    x_t0 = batch_to_tiles(x)
    u_t0 = batch_to_tiles(u)
    x0_t = batch_to_tiles(x0b)

    def make_v1(diag, reps):
        @jax.jit
        def v1(x_t_, u_t_):
            def step(carry, _):
                xc, uc, A_t, B_t = carry
                lx, lu, lxx, luu, lux, phi0 = ti.cost_expansions_tiled(
                    ta, xc, uc, z_t, rho_t, diag=diag)
                g = riccati_backward_pallas_tiled(
                    A_t, B_t, lxx, luu, lx, lu, reg_t, lux=lux,
                    diag_cost=diag, interpret=interp)
                dphi0 = g.delta_V[:, 0]
                phis, xstacks = ti.rollout_grid_tiled(
                    ta, xc, uc, g.K, g.d, z_t, rho_t, alphas, x0_t)
                passes = phis <= phi0[None] + c1 * alphas[:, None, None, None] * dphi0[None]
                found, idx, a_acc, phi_acc, xsel = ti.select_trial_tiled(
                    passes, alphas, phis, xstacks)
                u_n, y_n, convals, zproj = ti.light_from_xstack_tiled(
                    ta, xsel, xc, uc, g.K, g.d, g.P, g.p, z_t, rho_t, a_acc)
                A_n, B_n, lx_n, lu_n = ti.completion_tiled(
                    ta, xsel, u_n, z_t, rho_t)
                s = (jnp.sum(a_acc) + jnp.sum(phi_acc) + jnp.sum(y_n[:, 0])
                     + jnp.sum(lx_n[:, 0]) + jnp.sum(lu_n[:, 0])
                     + jnp.sum(A_n[:, 0]) + jnp.sum(B_n[:, 0]))
                return (xsel * (1.0 + 1e-12 * s), u_n, A_n, B_n), (
                    a_acc[0, 0, 0], phi_acc[0, 0, 0])

            # initial A, B from the completion at the incoming trajectory
            A0, B0, _, _ = ti.completion_tiled(ta, x_t_, u_t_, z_t, rho_t)
            (xo, uo, _, _), aux = jax.lax.scan(
                step, (x_t_, u_t_, A0, B0), None, length=reps)
            return xo, uo, aux

        return v1

    v1 = make_v1(False, REPS)
    v1d = make_v1(True, REPS)

    # single-rep parity (one identical iteration in both layouts)
    def parity():
        xv, uv, _ = jax.block_until_ready(v0_1(x, u))
        out = []
        for diag in (False, True):
            f = make_v1(diag, 1)
            xo, uo, _ = f(x_t0, u_t0)
            xt, ut = jax.block_until_ready(
                (tiles_to_batch(xo), tiles_to_batch(uo)))
            out.append(float(jnp.max(jnp.abs(xv - xt))))
            out.append(float(jnp.max(jnp.abs(uv - ut))))
        return out

    def timeit(f, *args):
        jax.block_until_ready(f(*args))
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(*args))
        dt = (time.perf_counter() - t0) / REPS * 1e3
        return dt, out

    do_parity = os.environ.get("PROTO_PARITY", "1") == "1"
    dt0, _ = timeit(v0, x, u)
    print("v0 done:", dt0, file=sys.stderr)
    dt1, _ = timeit(v1, x_t0, u_t0)
    print("v1 done:", dt1, file=sys.stderr)
    dt1d, _ = timeit(v1d, x_t0, u_t0)
    print("v1d done:", dt1d, file=sys.stderr)
    dx, du, dxd, dud = parity() if do_parity else (-1.0, -1.0, -1.0, -1.0)

    print(json.dumps({
        "B": Bsz, "reps": REPS, "platform": platform,
        "v0_batch_major_ms_per_iter": round(dt0, 4),
        "v1_tiled_ms_per_iter": round(dt1, 4),
        "v1d_tiled_diag_ms_per_iter": round(dt1d, 4),
        "speedup_v1": round(dt0 / dt1, 3),
        "speedup_v1d": round(dt0 / dt1d, 3),
        "parity_max_dx": dx, "parity_max_du": du,
        "parity_diag_max_dx": dxd, "parity_diag_max_du": dud,
    }))


if __name__ == "__main__":
    main()
