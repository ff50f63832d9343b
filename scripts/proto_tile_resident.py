"""Prototype: tile-resident fused backward (zero-relayout ingest) vs the
batch-major Pallas entry.

docs/PERF.md (round 1) measured that the batch-major -> batch-minor
relayout of the fused-backward operands reproduces the entire kernel
cost at headline scale. This script times, inside one jitted scan (the
remote-TPU methodology), per-iteration pipelines that REGENERATE the
operands each rep (as the solver does) and then run the backward:

  v0  batch-major producer -> riccati_backward_pallas (pays _to_tiles /
      _from_tiles relayout both ways)
  v1  tile-layout producer ([Bt, N, ..., 8, 128], the kernel's native
      contiguous-block layout) -> riccati_backward_pallas_tiled
      (zero relayout, dense Hessians, lux streamed)
  v2  v1 + diag_cost + lux=None (the headline's actual structure:
      diagonal cost, bound constraints, zero cross-Hessian)

A batch-TRAILING block layout ([N, ..., Bt, 8, 128]) was measured and
rejected: its streamed blocks are Bt-strided 4 KB chunks instead of one
contiguous chunk, and the kernel ran 0.8x the batch-major baseline
(2026-08-19, B=2048 n=4: 0.745 vs 0.597 ms).

Usage: python scripts/proto_tile_resident.py [B] [n] [m] [N] [REPS]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import pick_platform


def main():
    Bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    m = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    N = int(sys.argv[4]) if len(sys.argv) > 4 else 30
    REPS = int(sys.argv[5]) if len(sys.argv) > 5 else 50

    platform = pick_platform()
    if platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from altro_tpu.ops.pallas_riccati import (
        batch_to_tiles,
        riccati_backward_pallas,
        riccati_backward_pallas_tiled,
    )

    interp = platform == "cpu"
    rng = np.random.default_rng(0)
    dtype = jnp.float32

    def spd_diag(*shape):
        return jnp.asarray(0.5 + rng.random(shape), dtype)

    # batch-major bases
    A0 = jnp.asarray(
        np.tile(np.eye(n), (Bsz, N, 1, 1)) + 0.05 * rng.standard_normal((Bsz, N, n, n)),
        dtype,
    )
    B0 = jnp.asarray(0.3 * rng.standard_normal((Bsz, N, n, m)), dtype)
    f0 = jnp.zeros((Bsz, N, n), dtype)
    lxxd0 = spd_diag(Bsz, N + 1, n)
    luud0 = spd_diag(Bsz, N, m)
    lxx0 = jax.vmap(jax.vmap(jnp.diag))(lxxd0)
    luu0 = jax.vmap(jax.vmap(jnp.diag))(luud0)
    lux0 = jnp.asarray(0.01 * rng.standard_normal((Bsz, N, m, n)), dtype)
    lx0 = jnp.asarray(rng.standard_normal((Bsz, N + 1, n)), dtype)
    lu0 = jnp.asarray(rng.standard_normal((Bsz, N, m)), dtype)

    # tile-layout bases (pre-materialized outside the timed loop)
    A0t, B0t = batch_to_tiles(A0), batch_to_tiles(B0)
    lxx0t, luu0t, lux0t = (batch_to_tiles(lxx0), batch_to_tiles(luu0),
                           batch_to_tiles(lux0))
    lxxd0t, luud0t = batch_to_tiles(lxxd0), batch_to_tiles(luud0)
    lx0t, lu0t = batch_to_tiles(lx0), batch_to_tiles(lu0)
    regt = batch_to_tiles(jnp.zeros((Bsz, 1), dtype))[:, 0]  # [Bt, 8, 128]

    @jax.jit
    def v0(seed):
        def step(s, _):
            # producer: regenerate operands (elementwise, batch-major)
            A = A0 + 1e-12 * s[:, None, None, None]
            lxx = lxx0 + 1e-12 * s[:, None, None, None]
            lx = lx0 * (1.0 + 1e-12 * s[:, None, None])
            g = riccati_backward_pallas(
                A, B0, f0, lxx, luu0, lux0, lx, lu0, reg=0.0, interpret=interp
            )
            return s + 1e-6 * g.p[:, 0, 0], None

        out, _ = jax.lax.scan(step, seed, None, length=REPS)
        return out

    @jax.jit
    def v1(seed_t):
        def step(s, _):
            # producer: same ops, tile layout (s: [Bt, 8, 128])
            A = A0t + 1e-12 * s[:, None, None, None]
            lxx = lxx0t + 1e-12 * s[:, None, None, None]
            lx = lx0t * (1.0 + 1e-12 * s[:, None, None])
            g = riccati_backward_pallas_tiled(
                A, B0t, lxx, luu0t, lx, lu0t, regt, lux=lux0t, interpret=interp
            )
            return s + 1e-6 * g.p[:, 0, 0], None

        out, _ = jax.lax.scan(step, seed_t, None, length=REPS)
        return out

    @jax.jit
    def v2(seed_t):
        def step(s, _):
            A = A0t + 1e-12 * s[:, None, None, None]
            lxxd = lxxd0t + 1e-12 * s[:, None, None]
            lx = lx0t * (1.0 + 1e-12 * s[:, None, None])
            g = riccati_backward_pallas_tiled(
                A, B0t, lxxd, luud0t, lx, lu0t, regt, lux=None,
                diag_cost=True, interpret=interp,
            )
            return s + 1e-6 * g.p[:, 0, 0], None

        out, _ = jax.lax.scan(step, seed_t, None, length=REPS)
        return out

    seed = jnp.zeros((Bsz,), dtype)
    seed_t = batch_to_tiles(seed[:, None])[:, 0]

    def timeit(fn, arg):
        jax.block_until_ready(fn(arg))
        t0 = time.perf_counter()
        jax.block_until_ready(fn(arg))
        return (time.perf_counter() - t0) / REPS * 1e3

    t0_ = timeit(v0, seed)
    t1_ = timeit(v1, seed_t)
    t2_ = timeit(v2, seed_t)
    print(
        json.dumps(
            {
                "B": Bsz, "n": n, "m": m, "N": N, "platform": platform,
                "v0_batch_major_ms": round(t0_, 4),
                "v1_tiled_dense_ms": round(t1_, 4),
                "v2_tiled_diag_ms": round(t2_, 4),
                "v1_speedup": round(t0_ / t1_, 3),
                "v2_speedup": round(t0_ / t2_, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
