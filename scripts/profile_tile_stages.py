"""Stage attribution for the tile-resident headline iteration (round 5).

docs/PERF.md's round-5 honesty note: standalone kernel timings mislead
(per-call overhead amortizes inside the fused program), so attribution
must come from CHAINED timings — here every variant is a lax.scan of
REPS full-size stage invocations with a data dependency threading the
carry, so dispatch overhead is paid once per variant, not per rep.

Variants (all at the headline shapes B, N=30, n=4, m=2, diag path):

  full        expansions -> backward -> W=8 rollout grid -> select ->
              light_from_xstack -> completion   (the real trip body)
  exp         cost_expansions_tiled only
  exp_bwd     expansions + riccati_backward_pallas_tiled
  roll        rollout_grid_tiled (W=8) only, K/d held
  roll1       rollout_phi_x_tiled (single alpha=1 rollout), K/d held
  light_comp  light_from_xstack_tiled + completion_tiled, K/d/P/p held

Deltas: bwd = exp_bwd - exp; the rollout grid's marginal width cost =
roll - roll1. Residual = full - (exp_bwd + roll + light_comp) ~ select
+ scheduling.

Usage: python scripts/profile_tile_stages.py [B] [REPS]
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
        riccati_backward_pallas_tiled,
    )
    from altro_tpu.problem import ConstraintSpec, Problem, lqr_cost_from_reference

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
        label="steering bound", diag_hessian=True, affine=True,
    )
    from altro_tpu.models.tile_steps import bicycle_cols, midpoint_cols

    problem = Problem(
        N=N, n=n, m=m, dynamics=midpoint(bicycle_continuous()),
        dynamics_jac=None, constraints=(steering,), cost=cost0,
        h=jnp.full(N, h, dtype), x0=jnp.asarray(ref.x[0], dtype),
        dynamics_cols=midpoint_cols(bicycle_cols()),
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
    qb = jnp.broadcast_to(cost0.q, (Bsz,) + cost0.q.shape) + 1e-6 * jax.random.normal(
        jax.random.PRNGKey(1), (Bsz,) + cost0.q.shape, dtype)
    cb = jnp.broadcast_to(cost0.c, (Bsz,) + cost0.c.shape)

    alphas = 0.5 ** jnp.arange(W, dtype=dtype)
    c1 = 1e-4

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
    diag = True

    # one real backward to freeze K/d/P/p for the held-gain variants
    lx0, lu0, lxx0, luu0, lux0, phi00 = ti.cost_expansions_tiled(
        ta, x_t0, u_t0, z_t, rho_t, diag=diag)
    A0, B0, _, _ = ti.completion_tiled(ta, x_t0, u_t0, z_t, rho_t)
    g0 = riccati_backward_pallas_tiled(
        A0, B0, lxx0, luu0, lx0, lu0, reg_t, lux=lux0, diag_cost=diag,
        interpret=interp)
    g0 = jax.block_until_ready(g0)

    def chain(step_fn):
        """scan REPS data-dependent invocations of step_fn(x)->(x', probe)."""
        @jax.jit
        def run(x_):
            def step(xc, _):
                xn, probe = step_fn(xc)
                return xn * (1.0 + 1e-12 * probe), probe
            xo, aux = jax.lax.scan(step, x_, None, length=REPS)
            return xo, aux
        return run

    def full_step(xc):
        lx, lu, lxx, luu, lux, phi0 = ti.cost_expansions_tiled(
            ta, xc, u_t0, z_t, rho_t, diag=diag)
        g = riccati_backward_pallas_tiled(
            A0, B0, lxx, luu, lx, lu, reg_t, lux=lux, diag_cost=diag,
            interpret=interp)
        dphi0 = g.delta_V[:, 0]
        phis, xstacks = ti.rollout_grid_tiled(
            ta, xc, u_t0, g.K, g.d, z_t, rho_t, alphas, x0_t)
        passes = phis <= phi0[None] + c1 * alphas[:, None, None, None] * dphi0[None]
        found, idx, a_acc, phi_acc, xsel = ti.select_trial_tiled(
            passes, alphas, phis, xstacks)
        u_n, y_n, convals, zproj = ti.light_from_xstack_tiled(
            ta, xsel, xc, u_t0, g.K, g.d, g.P, g.p, z_t, rho_t, a_acc)
        A_n, B_n, lx_n, lu_n = ti.completion_tiled(ta, xsel, u_n, z_t, rho_t)
        probe = (jnp.sum(a_acc) + jnp.sum(phi_acc) + jnp.sum(y_n[:, 0])
                 + jnp.sum(lx_n[:, 0]) + jnp.sum(A_n[:, 0]) + jnp.sum(B_n[:, 0]))
        return xsel, probe

    def exp_step(xc):
        lx, lu, lxx, luu, lux, phi0 = ti.cost_expansions_tiled(
            ta, xc, u_t0, z_t, rho_t, diag=diag)
        probe = (jnp.sum(lx[:, 0]) + jnp.sum(lu[:, 0]) + jnp.sum(phi0)
                 + jnp.sum(lxx[:, 0]) + jnp.sum(luu[:, 0]))
        return xc, probe

    def exp_bwd_step(xc):
        lx, lu, lxx, luu, lux, phi0 = ti.cost_expansions_tiled(
            ta, xc, u_t0, z_t, rho_t, diag=diag)
        g = riccati_backward_pallas_tiled(
            A0, B0, lxx, luu, lx, lu, reg_t, lux=lux, diag_cost=diag,
            interpret=interp)
        probe = jnp.sum(g.d[:, 0]) + jnp.sum(g.K[:, 0]) + jnp.sum(g.delta_V)
        return xc, probe

    def roll_step(xc):
        phis, xstacks = ti.rollout_grid_tiled(
            ta, xc, u_t0, g0.K, g0.d, z_t, rho_t, alphas, x0_t)
        probe = jnp.sum(phis) + jnp.sum(xstacks[0][:, 0])
        return xstacks[0], probe

    def roll1_step(xc):
        one = jnp.asarray(1.0, dtype)
        phi_acc, xsel = ti.rollout_phi_x_tiled(
            ta, xc, u_t0, g0.K, g0.d, z_t, rho_t, one, x0_t)
        probe = jnp.sum(phi_acc) + jnp.sum(xsel[:, 0])
        return xsel, probe

    def light_comp_step(xc):
        a1 = jnp.ones_like(rho_t)
        u_n, y_n, convals, zproj = ti.light_from_xstack_tiled(
            ta, xc, x_t0, u_t0, g0.K, g0.d, g0.P, g0.p, z_t, rho_t, a1)
        A_n, B_n, lx_n, lu_n = ti.completion_tiled(ta, xc, u_n, z_t, rho_t)
        probe = (jnp.sum(u_n[:, 0]) + jnp.sum(y_n[:, 0]) + jnp.sum(A_n[:, 0])
                 + jnp.sum(B_n[:, 0]) + jnp.sum(lx_n[:, 0]))
        return xc, probe

    def noop_step(xc):
        # calibrates the fixed per-rep cost of the chain scaffolding
        # (scalar probe reduce + broadcast-rescale of the carried x)
        return xc, jnp.sum(xc[:, 0])

    # full-minus-stage variants: replace ONE stage with its cheapest
    # stand-in; the delta vs `full` is that stage's marginal cost inside
    # the real fused program (the attribution the honesty note demands).
    def full_no_roll_step(xc):
        lx, lu, lxx, luu, lux, phi0 = ti.cost_expansions_tiled(
            ta, xc, u_t0, z_t, rho_t, diag=diag)
        g = riccati_backward_pallas_tiled(
            A0, B0, lxx, luu, lx, lu, reg_t, lux=lux, diag_cost=diag,
            interpret=interp)
        one = jnp.asarray(1.0, dtype)
        phi_acc, xsel = ti.rollout_phi_x_tiled(
            ta, xc, u_t0, g.K, g.d, z_t, rho_t, one, x0_t)
        a_acc = jnp.ones_like(rho_t)
        u_n, y_n, convals, zproj = ti.light_from_xstack_tiled(
            ta, xsel, xc, u_t0, g.K, g.d, g.P, g.p, z_t, rho_t, a_acc)
        A_n, B_n, lx_n, lu_n = ti.completion_tiled(ta, xsel, u_n, z_t, rho_t)
        probe = (jnp.sum(a_acc) + jnp.sum(phi_acc) + jnp.sum(y_n[:, 0])
                 + jnp.sum(lx_n[:, 0]) + jnp.sum(A_n[:, 0]) + jnp.sum(B_n[:, 0]))
        return xsel, probe

    def full_no_light_comp_step(xc):
        lx, lu, lxx, luu, lux, phi0 = ti.cost_expansions_tiled(
            ta, xc, u_t0, z_t, rho_t, diag=diag)
        g = riccati_backward_pallas_tiled(
            A0, B0, lxx, luu, lx, lu, reg_t, lux=lux, diag_cost=diag,
            interpret=interp)
        dphi0 = g.delta_V[:, 0]
        phis, xstacks = ti.rollout_grid_tiled(
            ta, xc, u_t0, g.K, g.d, z_t, rho_t, alphas, x0_t)
        passes = phis <= phi0[None] + c1 * alphas[:, None, None, None] * dphi0[None]
        found, idx, a_acc, phi_acc, xsel = ti.select_trial_tiled(
            passes, alphas, phis, xstacks)
        probe = jnp.sum(a_acc) + jnp.sum(phi_acc) + jnp.sum(xsel[:, 0])
        return xsel, probe

    def full_no_exp_step(xc):
        # frozen expansions: backward consumes lx0/... (stale but
        # shape/cost-identical downstream)
        g = riccati_backward_pallas_tiled(
            A0, B0, lxx0, luu0, lx0, lu0, reg_t, lux=lux0, diag_cost=diag,
            interpret=interp)
        dphi0 = g.delta_V[:, 0]
        phis, xstacks = ti.rollout_grid_tiled(
            ta, xc, u_t0, g.K, g.d, z_t, rho_t, alphas, x0_t)
        passes = phis <= phi00[None] + c1 * alphas[:, None, None, None] * dphi0[None]
        found, idx, a_acc, phi_acc, xsel = ti.select_trial_tiled(
            passes, alphas, phis, xstacks)
        u_n, y_n, convals, zproj = ti.light_from_xstack_tiled(
            ta, xsel, xc, u_t0, g.K, g.d, g.P, g.p, z_t, rho_t, a_acc)
        A_n, B_n, lx_n, lu_n = ti.completion_tiled(ta, xsel, u_n, z_t, rho_t)
        probe = (jnp.sum(a_acc) + jnp.sum(phi_acc) + jnp.sum(y_n[:, 0])
                 + jnp.sum(lx_n[:, 0]) + jnp.sum(A_n[:, 0]) + jnp.sum(B_n[:, 0]))
        return xsel, probe

    from altro_tpu.ops.pallas_rollout_tiled import rollout_grid_pallas_tiled

    def roll_kernel_step(xc):
        phis, xstacks = rollout_grid_pallas_tiled(
            ta, xc, u_t0, g0.K, g0.d, z_t, rho_t, alphas, x0_t,
            interpret=interp)
        probe = jnp.sum(phis) + jnp.sum(xstacks[0][:, 0])
        return xstacks[0], probe

    def full_kernel_step(xc):
        lx, lu, lxx, luu, lux, phi0 = ti.cost_expansions_tiled(
            ta, xc, u_t0, z_t, rho_t, diag=diag)
        g = riccati_backward_pallas_tiled(
            A0, B0, lxx, luu, lx, lu, reg_t, lux=lux, diag_cost=diag,
            interpret=interp)
        dphi0 = g.delta_V[:, 0]
        phis, xstacks = rollout_grid_pallas_tiled(
            ta, xc, u_t0, g.K, g.d, z_t, rho_t, alphas, x0_t,
            interpret=interp)
        passes = phis <= phi0[None] + c1 * alphas[:, None, None, None] * dphi0[None]
        found, idx, a_acc, phi_acc, xsel = ti.select_trial_tiled(
            passes, alphas, phis, xstacks)
        u_n, y_n, convals, zproj = ti.light_from_xstack_tiled(
            ta, xsel, xc, u_t0, g.K, g.d, g.P, g.p, z_t, rho_t, a_acc)
        A_n, B_n, lx_n, lu_n = ti.completion_tiled(ta, xsel, u_n, z_t, rho_t)
        probe = (jnp.sum(a_acc) + jnp.sum(phi_acc) + jnp.sum(y_n[:, 0])
                 + jnp.sum(lx_n[:, 0]) + jnp.sum(A_n[:, 0]) + jnp.sum(B_n[:, 0]))
        return xsel, probe

    def full_body_step(xc):
        """full_kernel + the solver body's bookkeeping tail
        (stationarity, feasibility, dual/penalty update, convergence
        masks) — the complete per-trip cost of solve_tiled's body."""
        from altro_tpu import tile_solver as tsv

        lx, lu, lxx, luu, lux, phi0 = ti.cost_expansions_tiled(
            ta, xc, u_t0, z_t, rho_t, diag=diag)
        g = riccati_backward_pallas_tiled(
            A0, B0, lxx, luu, lx, lu, reg_t, lux=lux, diag_cost=diag,
            interpret=interp)
        dphi0 = g.delta_V[:, 0]
        phis, xstacks = rollout_grid_pallas_tiled(
            ta, xc, u_t0, g.K, g.d, z_t, rho_t, alphas, x0_t,
            interpret=interp)
        passes = phis <= phi0[None] + c1 * alphas[:, None, None, None] * dphi0[None]
        found, idx, a_acc, phi_acc, xsel = ti.select_trial_tiled(
            passes, alphas, phis, xstacks)
        u_n, y_n, convals, zproj = ti.light_from_xstack_tiled(
            ta, xsel, xc, u_t0, g.K, g.d, g.P, g.p, z_t, rho_t, a_acc)
        A_n, B_n, lx_n, lu_n = ti.completion_tiled(ta, xsel, u_n, z_t, rho_t)
        stat = tsv._stationarity_tiled(ta, A_n, B_n, lx_n, lu_n, y_n)
        feas = tsv._feasibility_tiled(ta, convals)
        do_dual = stat < jnp.sqrt(jnp.asarray(1e-3, dtype))
        z_new = tuple(
            jnp.where(do_dual[:, None, None, :, :], zp, zj)
            for zp, zj in zip(zproj, z_t))
        do_pen = jnp.logical_and(do_dual, feas > 1e-3)
        rho_new = jnp.where(do_pen, rho_t * 10.0, rho_t)
        converged = jnp.logical_and(jnp.abs(stat) < 1e-3, feas < 1e-3)
        probe = (jnp.sum(a_acc) + jnp.sum(phi_acc) + jnp.sum(stat)
                 + jnp.sum(feas) + jnp.sum(rho_new)
                 + jnp.sum(z_new[0][:, 0]) + jnp.sum(converged)
                 + jnp.sum(A_n[:, 0]) + jnp.sum(B_n[:, 0]))
        return xsel, probe

    variants = {
        "noop": chain(noop_step),
        "full": chain(full_step),
        "full_kernel": chain(full_kernel_step),
        "full_body_kernel": chain(full_body_step),
        "roll_w8_kernel": chain(roll_kernel_step),
        "full_no_exp": chain(full_no_exp_step),
        "full_no_roll": chain(full_no_roll_step),
        "full_no_light_comp": chain(full_no_light_comp_step),
        "exp": chain(exp_step),
        "exp_bwd": chain(exp_bwd_step),
        "roll_w8": chain(roll_step),
        "roll_w1": chain(roll1_step),
        "light_comp": chain(light_comp_step),
    }

    out = {"B": Bsz, "reps": REPS, "platform": platform}
    for name, f in variants.items():
        jax.block_until_ready(f(x_t0))  # compile
        t0 = time.perf_counter()
        jax.block_until_ready(f(x_t0))
        dt = (time.perf_counter() - t0) / REPS * 1e3
        out[name + "_ms"] = round(dt, 4)
        print(name, round(dt, 4), "ms/iter", file=sys.stderr)

    # one-shot kernel-vs-scan parity on the same operands
    ph_s, xs_s = ti.rollout_grid_tiled(
        ta, x_t0, u_t0, g0.K, g0.d, z_t, rho_t, alphas, x0_t)
    ph_k, xs_k = rollout_grid_pallas_tiled(
        ta, x_t0, u_t0, g0.K, g0.d, z_t, rho_t, alphas, x0_t,
        interpret=interp)
    out["kernel_parity_dphi"] = float(jnp.max(jnp.abs(ph_k - ph_s)))
    out["kernel_parity_dx"] = float(jnp.max(jnp.abs(xs_k - xs_s)))

    nop = out["noop_ms"]
    out["bwd_delta_ms"] = round(out["exp_bwd_ms"] - out["exp_ms"], 4)
    out["roll_width_delta_ms"] = round(out["roll_w8_ms"] - out["roll_w1_ms"], 4)
    out["exp_marginal_ms"] = round(out["full_ms"] - out["full_no_exp_ms"], 4)
    out["rollgrid_marginal_ms"] = round(
        out["full_ms"] - out["full_no_roll_ms"], 4)
    out["light_comp_marginal_ms"] = round(
        out["full_ms"] - out["full_no_light_comp_ms"], 4)
    out["chain_overhead_ms"] = round(nop, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
