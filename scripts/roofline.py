"""Quantified speed-of-light accounting for the hot kernels (round-5
VERDICT item 4): ops/knot and bytes/knot counted from the kernel
bodies/shapes, theoretical floors from public TPU v5e figures, measured
times, and %-of-peak — converting "the backward is at its issue floor"
from claim to number. Exits non-zero when a kernel regresses past its
gate (µs/knot), so perf regressions fail loudly.

v5e figures used (public: cloud.google.com/tpu/docs/v5e, the scaling
book's hardware chapter):
  HBM bandwidth  819 GB/s
  clock          940 MHz
  VPU            4 independent (8, 128) f32 ALUs -> 4 vector ops/cycle
                 (8.2e12 f32 FMA-flops/s counting mul+add)

Methodology notes:
  * The Pallas kernels are opaque to XLA's cost model, so bytes are
    counted ANALYTICALLY from operand/result shapes (exact — every
    operand is streamed once per grid pass) and vector-op counts are
    counted from the kernel body at the jnp level (a lower bound on
    issued ops: Mosaic lowering expands scalar extracts / one-hot
    assembly into multi-op sequences).
  * "% of HBM peak" uses measured time vs analytic bytes; "cycles/knot"
    uses the 940 MHz clock. A kernel far below HBM peak with thousands
    of cycles/knot is issue/latency-bound, not bandwidth-bound.

Usage: python scripts/roofline.py            (TPU; prints one JSON/row)
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import pick_platform

HBM_GBPS = 819.0
CLOCK_HZ = 940e6
VPU_OPS_PER_CYCLE = 4  # 4 independent (8,128) ALUs

# Regression gates (µs/knot, measured round-5 values + ~25% headroom)
GATE_PACKED_BACKWARD_US_PER_KNOT = 3.5
GATE_ROLLOUT_US_PER_KNOT = 1.2
# Round-5 continuation recalibration: standalone chained timings of the
# two big tiled kernels vary ~2x across invocations on the shared
# remote chip (measured 106/156/245 us for the SAME backward program in
# three back-to-back roofline runs while the end-to-end headline was
# stable at 0.68 ms/tick) — so these gates are set wide enough to catch
# real regressions (a kernel silently falling back to a scan is 5-10x)
# without tripping on tunnel/tenancy noise. End-to-end regressions are
# gated by bench.py itself (per-tick latency + success).
GATE_TILED_BACKWARD_US_PER_ITER = 300.0  # best measured 74.3 (B=2048 headline)
GATE_TILED_ROLLOUT_US_PER_ITER = 400.0  # best measured 147 (B=2048/W=8)


def main():
    platform = pick_platform()
    if platform == "cpu":
        print(json.dumps({"error": "roofline requires TPU"}))
        return 0
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/jax_cache_altro_proto"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    f32 = jnp.float32
    rows = []
    failures = []

    def bench_fn(fn, *args, reps=20):
        out = jax.block_until_ready(fn(*args))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            best = min(best, time.perf_counter() - t0)
        return best, out

    def bench_chained(step, x0, reps=200):
        """Chained timing: one dispatch of a reps-length lax.scan whose
        step carries a data dependency — the ONLY valid way to time
        sub-ms kernels through the axon tunnel, whose per-dispatch
        overhead scales to ~20-25 ms on large-arg programs (docs/PERF.md
        round-5 CORRECTION; measured 28 ms 'per call' for a 0.15 ms
        kernel with per-call timing). step: carry -> (carry, probe)."""

        @jax.jit
        def run(x):
            def body(c, _):
                c2, probe = step(c)
                return jax.tree.map(
                    lambda a: a * (1.0 + 1e-12 * probe), c2), probe
            return jax.lax.scan(body, x, None, length=reps)

        out = jax.block_until_ready(run(x0))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = jax.block_until_ready(run(x0))
            best = min(best, time.perf_counter() - t0)
        return best / reps, out

    # ------------------------------------------------------------------
    # 1. Packed single-lane backward (ops/pallas_packed.py), N=500
    #    bicycle blocks (n=4, m=2, G=1, diag cost, f elided).
    # ------------------------------------------------------------------
    from altro_tpu.ops.pallas_packed import riccati_backward_pallas_packed

    N, n, m = 500, 4, 2
    rng = np.random.default_rng(0)
    A = jnp.asarray(np.tile(np.eye(n), (N, 1, 1))
                    + 0.05 * rng.standard_normal((N, n, n)), f32)
    B = jnp.asarray(0.3 * rng.standard_normal((N, n, m)), f32)
    lxx = jnp.asarray(np.abs(rng.standard_normal((N + 1, n))) + 0.1, f32)
    luu = jnp.asarray(np.abs(rng.standard_normal((N, m))) + 0.1, f32)
    lx = jnp.asarray(rng.standard_normal((N + 1, n)), f32)
    lu = jnp.asarray(rng.standard_normal((N, m)), f32)

    fn = jax.jit(lambda *a: riccati_backward_pallas_packed(
        *a, reg=0.0, lux=None, f=None))
    t, _ = bench_fn(fn, A, B, lxx, luu, lx, lu)
    us_knot = t / N * 1e6
    # analytic: one (8,128) operand tile in + one out per knot = 8 KB
    bytes_knot = 2 * 8 * 128 * 4
    # jnp-level vector ops in _knot_body (n=4, m=2, G=1, f/lux elided):
    # 8 grouped products (PA, PB, at@PA, bt@PB, bt@PA, at@PB, at@t,
    # bt@t) x (2n-1) MAC-ops + 4 adds + m=2 closed-form solve (~30 masked
    # -reduce/scalar ops) + P/p updates (~20) + assembly/dV (~20)
    ops_knot = 8 * (2 * n - 1) + 4 + 30 + 20 + 20
    cyc_knot = us_knot * 1e-6 * CLOCK_HZ
    row = {
        "kernel": "packed_backward_N500",
        "us_per_knot": round(us_knot, 3),
        "cycles_per_knot": round(cyc_knot),
        "bytes_per_knot": bytes_knot,
        "hbm_floor_us_per_knot": round(bytes_knot / (HBM_GBPS * 1e3), 4),
        "pct_of_hbm_peak": round(
            100 * bytes_knot / (HBM_GBPS * 1e9) / (us_knot * 1e-6), 1),
        "jnp_vector_ops_per_knot": ops_knot,
        "issue_floor_us_per_knot": round(
            ops_knot / VPU_OPS_PER_CYCLE / CLOCK_HZ * 1e6, 3),
        "verdict": "issue/latency-bound (HBM <1% utilized); measured "
                   "cycles/knot exceed the jnp-op issue floor by the "
                   "Mosaic lowering expansion + sequential dependency "
                   "chain of the recursion",
    }
    rows.append(row)
    print(json.dumps(row), flush=True)
    if us_knot > GATE_PACKED_BACKWARD_US_PER_KNOT:
        failures.append(
            f"packed backward {us_knot:.2f} us/knot > "
            f"{GATE_PACKED_BACKWARD_US_PER_KNOT}")

    # ------------------------------------------------------------------
    # 2. Packed trial-grid rollout (ops/pallas_rollout.py), N=500, W=8.
    # ------------------------------------------------------------------
    from altro_tpu.models.tile_steps import bicycle_tile, midpoint_tile
    from altro_tpu.ops.pallas_rollout import _pallas_rollout

    step_tile = midpoint_tile(bicycle_tile())
    alphas = jnp.asarray([1.0, 0.5, 0.25, 0.125, 0.0625, 0.03125,
                          0.015625, 0.0078125], f32)
    xref = jnp.asarray(rng.standard_normal((N + 1, n)), f32)
    uref = jnp.asarray(rng.standard_normal((N, m)), f32)
    K = jnp.asarray(0.1 * rng.standard_normal((N, m, n)), f32)
    d = jnp.asarray(0.05 * rng.standard_normal((N, m)), f32)
    Qd = jnp.full((N + 1, n), 1e-2, f32)
    ql = jnp.zeros((N + 1, n), f32)
    Rd = jnp.full((N + 1, m), 1e-3, f32)
    rl = jnp.zeros((N + 1, m), f32)
    cc = jnp.zeros((N + 1,), f32)
    h = jnp.full((N,), 0.1, f32)
    x0 = jnp.zeros((n,), f32)

    fn2 = jax.jit(lambda *a: _pallas_rollout(step_tile, *a))
    t2, _ = bench_fn(fn2, alphas, x0, xref, uref, K, d, Qd, ql, Rd, rl,
                     cc, h)
    us_knot2 = t2 / N * 1e6
    bytes_knot2 = 2 * 8 * 128 * 4
    # ~40 jnp vector ops/knot: policy (m x (n MACs + 3)), cost (~12),
    # bicycle midpoint tile step (~20)
    ops_knot2 = 40
    row = {
        "kernel": "trial_rollout_N500_W8",
        "us_per_knot": round(us_knot2, 3),
        "cycles_per_knot": round(us_knot2 * 1e-6 * CLOCK_HZ),
        "bytes_per_knot": bytes_knot2,
        "pct_of_hbm_peak": round(
            100 * bytes_knot2 / (HBM_GBPS * 1e9) / (us_knot2 * 1e-6), 1),
        "jnp_vector_ops_per_knot": ops_knot2,
        "issue_floor_us_per_knot": round(
            ops_knot2 / VPU_OPS_PER_CYCLE / CLOCK_HZ * 1e6, 3),
        "verdict": "grid-step overhead dominated (~2.5 us/grid step at "
                   "chunk 25 -> ~0.1 us/knot amortized overhead); "
                   "issue-bound body",
    }
    rows.append(row)
    print(json.dumps(row), flush=True)
    if us_knot2 > GATE_ROLLOUT_US_PER_KNOT:
        failures.append(
            f"rollout {us_knot2:.2f} us/knot > {GATE_ROLLOUT_US_PER_KNOT}")

    # ------------------------------------------------------------------
    # 3. Tiled batched backward (ops/pallas_riccati.py) at headline
    #    shapes: B=2048, N=30, diag cost. The HBM-side kernel.
    # ------------------------------------------------------------------
    from altro_tpu.ops.pallas_riccati import (
        batch_to_tiles,
        riccati_backward_pallas_tiled,
    )

    Bb, Nh = 2048, 30
    At = batch_to_tiles(jnp.asarray(
        np.tile(np.eye(n), (Bb, Nh, 1, 1))
        + 0.05 * rng.standard_normal((Bb, Nh, n, n)), f32))
    Bt_ = batch_to_tiles(jnp.asarray(
        0.3 * rng.standard_normal((Bb, Nh, n, m)), f32))
    lxxt = batch_to_tiles(jnp.asarray(
        np.abs(rng.standard_normal((Bb, Nh + 1, n))) + 0.1, f32))
    luut = batch_to_tiles(jnp.asarray(
        np.abs(rng.standard_normal((Bb, Nh, m))) + 0.1, f32))
    lxt = batch_to_tiles(jnp.asarray(
        rng.standard_normal((Bb, Nh + 1, n)), f32))
    lut = batch_to_tiles(jnp.asarray(
        rng.standard_normal((Bb, Nh, m)), f32))
    regt = jnp.zeros((Bb // 1024, 8, 128), f32)

    def bwd_step(lx_c):
        g = riccati_backward_pallas_tiled(
            At, Bt_, lxxt, luut, lx_c, lut, regt, lux=None, diag_cost=True)
        return lx_c, jnp.sum(g.d[:, 0]) + jnp.sum(g.K[:, 0])

    t3, _ = bench_chained(bwd_step, lxt)
    # analytic bytes: every operand lane-tile streamed once + outputs
    # (K, d, P, p): per (batch-tile, knot): in n*n + n*m + n + m + n + m
    # lanes-tiles, out m*n + m + n*n + n tiles; each tile 8*128*4 B
    tiles_in = n * n + n * m + n + m + n + m
    tiles_out = m * n + m + n * n + n
    total_bytes = (Bb // 1024) * Nh * (tiles_in + tiles_out) * 8 * 128 * 4
    gbps = total_bytes / t3 / 1e9
    row = {
        "kernel": "tiled_backward_B2048_N30",
        "us_per_iteration": round(t3 * 1e6, 1),
        "analytic_mbytes": round(total_bytes / 1e6, 1),
        "achieved_gbps": round(gbps, 1),
        "pct_of_hbm_peak": round(100 * gbps / HBM_GBPS, 1),
        "hbm_floor_us": round(total_bytes / (HBM_GBPS * 1e9) * 1e6, 1),
        "verdict": "HBM-streaming kernel; % of peak bounds how much of "
                   "the headline trip cost is irreducible memory time",
    }
    rows.append(row)
    print(json.dumps(row), flush=True)
    if t3 * 1e6 > GATE_TILED_BACKWARD_US_PER_ITER:
        failures.append(
            f"tiled backward {t3*1e6:.0f} us/iter > "
            f"{GATE_TILED_BACKWARD_US_PER_ITER}")

    # ------------------------------------------------------------------
    # 4. Batched tiled trial-rollout kernel (ops/pallas_rollout_tiled.py)
    #    at headline shapes: B=2048, N=30, W=8, steering bound in-kernel.
    #    Round-5 (cont.): this replaced the knot-sequential scan grid
    #    that was 92% of the tiled iteration (profile_tile_stages.py).
    # ------------------------------------------------------------------
    import dataclasses

    from altro_tpu.ops import tile_iter as ti
    from altro_tpu.ops.pallas_rollout_tiled import rollout_grid_pallas_tiled
    from __graft_entry__ import _make_problem

    problem, ref = _make_problem(Nh, f32)
    W = 8
    xb = batch_to_tiles(jnp.asarray(
        np.tile(ref.x[: Nh + 1], (Bb, 1, 1))
        + 0.02 * rng.standard_normal((Bb, Nh + 1, n)), f32))
    ub = batch_to_tiles(jnp.asarray(
        np.tile(ref.u[:Nh], (Bb, 1, 1))
        + 0.02 * rng.standard_normal((Bb, Nh, m)), f32))
    Kb = batch_to_tiles(jnp.asarray(
        0.2 * rng.standard_normal((Bb, Nh, m, n)), f32))
    db = batch_to_tiles(jnp.asarray(
        0.2 * rng.standard_normal((Bb, Nh, m)), f32))
    zb = (batch_to_tiles(jnp.asarray(
        np.abs(rng.standard_normal((Bb, Nh + 1, 2))), f32)),)
    rhob = batch_to_tiles(jnp.full((Bb, 1), 10.0, f32))[:, 0]
    x0b = batch_to_tiles(jnp.asarray(
        np.tile(ref.x[0], (Bb, 1)) + 0.02 * rng.standard_normal((Bb, n)),
        f32))
    prob_axes = dataclasses.replace(
        problem,
        cost=dataclasses.replace(problem.cost, Q=False, R=False, q=False,
                                 r=False, c=False),
        h=False, x0=True, A=False, B=False, f_aff=False,
        constraints=tuple(dataclasses.replace(s_, active=False)
                          for s_ in problem.constraints))
    ta4 = ti.TileArgs(dataclasses.replace(problem, x0=x0b), prob_axes,
                      (True,))
    alphas = jnp.asarray(0.5 ** np.arange(W), f32)

    def roll_step(x_c):
        phis, xstacks = rollout_grid_pallas_tiled(
            ta4, x_c, ub, Kb, db, zb, rhob, alphas, x0b)
        return xstacks[0], jnp.sum(phis)

    t4, _ = bench_chained(roll_step, xb)
    P4 = 2  # steering bound elements
    # streamed per (batch-tile, knot): operands (xref, uref, K, d, cost
    # rows, h, constraint rows) read once for all W trials + W*n output
    tiles_in4 = n + m + m * n + m + 2 * n + 2 * m + 2 + P4 * (n + m + 1)
    tiles_out4 = W * n
    total4 = (Bb // 1024) * Nh * (tiles_in4 + tiles_out4) * 8 * 128 * 4
    gbps4 = total4 / t4 / 1e9
    row = {
        "kernel": "tiled_rollout_grid_B2048_N30_W8",
        "us_per_iteration": round(t4 * 1e6, 1),
        "analytic_mbytes": round(total4 / 1e6, 1),
        "achieved_gbps": round(gbps4, 1),
        "pct_of_hbm_peak": round(100 * gbps4 / HBM_GBPS, 1),
        "hbm_floor_us": round(total4 / (HBM_GBPS * 1e9) * 1e6, 1),
        "verdict": "compute-bound: W=8 trials x ~100 VPU ops/knot "
                   "(2 midpoint bicycle evals with 4 transcendentals "
                   "each + AL merit) per lane-tile; operands read once "
                   "per knot for all trials",
    }
    rows.append(row)
    print(json.dumps(row), flush=True)
    if t4 * 1e6 > GATE_TILED_ROLLOUT_US_PER_ITER:
        failures.append(
            f"tiled rollout {t4*1e6:.0f} us/iter > "
            f"{GATE_TILED_ROLLOUT_US_PER_ITER}")

    if failures:
        print(json.dumps({"roofline_gates": "FAILED", "failures": failures}))
        return 1
    print(json.dumps({"roofline_gates": "passed"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
