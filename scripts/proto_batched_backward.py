"""Prototype: batch-minor Riccati backward pass vs vmapped scan.

Hypothesis (docs/PERF.md "model-form rule"): under vmap, [B, n, n]
intermediates in the backward scan tile as (n, n) trailing dims and pad
to (8k, 128) at low density for n=12. Carrying the batch axis MINOR
([n, n, B]) and unrolling the small-matrix algebra over [B]-shaped
slices makes every op a dense tile.

Usage: python scripts/proto_batched_backward.py [B] [n] [m] [N]
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import pick_platform


def backward_batchminor(A, B, f, lxx, luu, lux, lx, lu, reg=0.0):
    """Riccati backward with batch-minor layout.

    A: [N, n, n, Bsz], B: [N, n, m, Bsz], f: [N, n, Bsz],
    lxx: [N+1, n, n, Bsz], luu: [N, m, m, Bsz], lux: [N, m, n, Bsz],
    lx: [N+1, n, Bsz], lu: [N, m, Bsz].
    Returns (K [N,m,n,Bsz], d [N,m,Bsz], P [N+1,n,n,Bsz], p [N+1,n,Bsz],
    dV [2,Bsz], ok [Bsz] bool).
    """
    import jax
    import jax.numpy as jnp

    N, n = A.shape[0], A.shape[1]
    m = B.shape[2]
    dtype = A.dtype
    reg = jnp.asarray(reg, dtype)

    def step(carry, inputs):
        P_next, p_next, ok = carry  # [n,n,B], [n,B], [B] bool
        A_k, B_k, f_k, lxx_k, luu_k, lux_k, lx_k, lu_k = inputs

        a = [[A_k[i, j] for j in range(n)] for i in range(n)]
        b = [[B_k[i, j] for j in range(m)] for i in range(n)]
        Pn = [[P_next[i, j] for j in range(n)] for i in range(n)]
        pn = [p_next[i] for i in range(n)]
        fv = [f_k[i] for i in range(n)]

        AtP = [[sum(a[l][i] * Pn[l][j] for l in range(n)) for j in range(n)]
               for i in range(n)]
        BtP = [[sum(b[l][i] * Pn[l][j] for l in range(n)) for j in range(n)]
               for i in range(m)]
        # Qxx symmetric: upper triangle only
        Qxx = [[None] * n for _ in range(n)]
        for i in range(n):
            for j in range(i, n):
                Qxx[i][j] = lxx_k[i, j] + sum(AtP[i][l] * a[l][j] for l in range(n))
                Qxx[j][i] = Qxx[i][j]
        Quu = [[None] * m for _ in range(m)]
        for i in range(m):
            for j in range(i, m):
                Quu[i][j] = luu_k[i, j] + sum(BtP[i][l] * b[l][j] for l in range(n))
                Quu[j][i] = Quu[i][j]
        Qux = [[lux_k[i, j] + sum(BtP[i][l] * a[l][j] for l in range(n))
                for j in range(n)] for i in range(m)]
        t = [sum(Pn[i][l] * fv[l] for l in range(n)) + pn[i] for i in range(n)]
        Qx = [lx_k[i] + sum(a[l][i] * t[l] for l in range(n)) for i in range(n)]
        Qu = [lu_k[i] + sum(b[l][i] * t[l] for l in range(n)) for i in range(m)]

        # Unrolled Cholesky of Quu + reg I over [B] lanes
        L = [[None] * m for _ in range(m)]
        ok_k = None
        for j in range(m):
            diag = Quu[j][j] + reg
            for kk in range(j):
                diag = diag - L[j][kk] * L[j][kk]
            pos = jnp.logical_and(diag > 0.0, jnp.isfinite(diag))
            ok_k = pos if ok_k is None else jnp.logical_and(ok_k, pos)
            ljj = jnp.sqrt(jnp.where(pos, diag, 1.0))
            L[j][j] = ljj
            inv = 1.0 / ljj
            for i in range(j + 1, m):
                s = Quu[i][j]
                for kk in range(j):
                    s = s - L[i][kk] * L[j][kk]
                L[i][j] = s * inv

        def chol_solve(cols):
            y = list(cols)
            for i in range(m):
                s = y[i]
                for kk in range(i):
                    s = s - L[i][kk] * y[kk]
                y[i] = s / L[i][i]
            for i in reversed(range(m)):
                s = y[i]
                for kk in range(i + 1, m):
                    s = s - L[kk][i] * y[kk]
                y[i] = s / L[i][i]
            return y

        okf = ok_k
        Kk = [[None] * n for _ in range(m)]
        for j in range(n):
            col = chol_solve([Qux[i][j] for i in range(m)])
            for i in range(m):
                Kk[i][j] = jnp.where(okf, col[i], 0.0)
        dk = chol_solve([-Qu[i] for i in range(m)])
        dk = [jnp.where(okf, dk[i], 0.0) for i in range(m)]

        QuuK = [[sum(Quu[i][l] * Kk[l][j] for l in range(m)) for j in range(n)]
                for i in range(m)]
        KtQux = [[sum(Kk[l][i] * Qux[l][j] for l in range(m)) for j in range(n)]
                 for i in range(n)]
        Pk = [[None] * n for _ in range(n)]
        for i in range(n):
            for j in range(i, n):
                v = (Qxx[i][j] + sum(QuuK[l][i] * Kk[l][j] for l in range(m))
                     - KtQux[i][j] - KtQux[j][i])
                Pk[i][j] = v
                Pk[j][i] = v
        pk = [Qx[i]
              - sum(QuuK[l][i] * dk[l] for l in range(m))
              - sum(Kk[l][i] * Qu[l] for l in range(m))
              + sum(Qux[l][i] * dk[l] for l in range(m))
              for i in range(n)]

        dV_k = (sum(dk[i] * Qu[i] for i in range(m)),
                0.5 * sum(dk[i] * sum(Quu[i][l] * dk[l] for l in range(m))
                          for i in range(m)))

        P_k = jnp.stack([jnp.stack(r) for r in Pk])
        p_k = jnp.stack(pk)
        K_out = jnp.stack([jnp.stack(r) for r in Kk])
        d_out = jnp.stack(dk)
        dV_out = jnp.stack(dV_k)
        ok_new = jnp.logical_and(ok, okf)
        return (P_k, p_k, ok_new), (K_out, d_out, P_k, p_k, dV_out, okf)

    Bsz = A.shape[-1]
    ok0 = jnp.ones((Bsz,), bool)
    inputs = (A, B, f, lxx[:N], luu, lux, lx[:N], lu)
    (_, _, ok), (K, d, P_st, p_st, dV, ok_all) = jax.lax.scan(
        step, (lxx[N], lx[N], ok0), inputs, reverse=True, unroll=2
    )
    P = jnp.concatenate([P_st, lxx[N][None]], axis=0)
    p = jnp.concatenate([p_st, lx[N][None]], axis=0)
    return K, d, P, p, jnp.sum(dV, axis=0), ok


def main():
    platform = pick_platform()
    if platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from altro_tpu.tvlqr import tvlqr_backward

    Bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    m = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    N = int(sys.argv[4]) if len(sys.argv) > 4 else 30
    REPS = 50
    dtype = jnp.float32
    rng = np.random.default_rng(0)

    def spd(*shape):
        M = rng.normal(size=shape).astype(np.float32)
        return M @ np.swapaxes(M, -1, -2) + 2.0 * np.eye(shape[-1], dtype=np.float32)

    # Keep A contractive so the f32 Riccati iterates stay well-conditioned
    # over the horizon (an expansive random A makes P blow up and the two
    # implementations diverge in f32 for reasons unrelated to the layout).
    A = jnp.asarray(rng.normal(size=(Bsz, N, n, n)) * (0.3 / np.sqrt(n))
                    + 0.9 * np.eye(n), dtype)
    B = jnp.asarray(rng.normal(size=(Bsz, N, n, m)) * 0.1, dtype)
    f = jnp.zeros((Bsz, N, n), dtype)
    lxx = jnp.asarray(spd(Bsz, N + 1, n, n) * 0.1, dtype)
    luu = jnp.asarray(spd(Bsz, N, m, m) * 0.1, dtype)
    lux = jnp.asarray(rng.normal(size=(Bsz, N, m, n)) * 0.01, dtype)
    lx = jnp.asarray(rng.normal(size=(Bsz, N + 1, n)), dtype)
    lu = jnp.asarray(rng.normal(size=(Bsz, N, m)), dtype)

    # Reference: vmapped scan
    @jax.jit
    def run_vmap(lx_):
        def one(args):
            return jax.vmap(
                lambda a, b, ff, hxx, huu, hux, gx, gu: tvlqr_backward(
                    a, b, ff, hxx, huu, hux, gx, gu))(*args)

        def step(lx_c, _):
            g = one((A, B, f, lxx, luu, lux, lx_c, lu))
            return lx_c + 1e-12 * g.p, None

        out, _ = jax.lax.scan(step, lx_, None, length=REPS)
        return out

    # Batch-minor
    def to_minor(x):
        return jnp.moveaxis(x, 0, -1)

    Am, Bm_, fm = to_minor(A), to_minor(B), to_minor(f)
    lxxm, luum, luxm = to_minor(lxx), to_minor(luu), to_minor(lux)
    lxm, lum = to_minor(lx), to_minor(lu)

    @jax.jit
    def run_minor(lx_):
        def step(lx_c, _):
            K, d, P, p, dV, ok = backward_batchminor(
                Am, Bm_, fm, lxxm, luum, luxm, lx_c, lum)
            return lx_c + 1e-12 * p, None

        out, _ = jax.lax.scan(step, lx_, None, length=REPS)
        return out

    # Correctness check (single call)
    g = jax.vmap(lambda a, b, ff, hxx, huu, hux, gx, gu: tvlqr_backward(
        a, b, ff, hxx, huu, hux, gx, gu))(A, B, f, lxx, luu, lux, lx, lu)
    K2, d2, P2, p2, dV2, ok2 = jax.jit(backward_batchminor)(
        Am, Bm_, fm, lxxm, luum, luxm, lxm, lum)
    err = float(jnp.max(jnp.abs(jnp.moveaxis(K2, -1, 0) - g.K))
                / (1e-9 + float(jnp.max(jnp.abs(g.K)))))
    print(json.dumps({"check": "K rel err", "value": err}))

    def timeit(fn, arg):
        out = jax.block_until_ready(fn(arg))
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(arg))
        return (time.perf_counter() - t0) / REPS * 1e3

    t_vmap = timeit(run_vmap, lx)
    t_minor = timeit(run_minor, lxm)
    print(json.dumps({
        "B": Bsz, "n": n, "m": m, "N": N, "platform": platform,
        "vmap_scan_ms": round(t_vmap, 4),
        "batchminor_ms": round(t_minor, 4),
        "speedup": round(t_vmap / t_minor, 3),
    }))


if __name__ == "__main__":
    main()
