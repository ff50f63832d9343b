"""Pallas batched Riccati kernel vs. the vmapped scan kernel.

Runs in interpreter mode on the CPU test backend; the compiled path is
exercised on real TPU hardware by scripts/ and bench runs (validated at
1.2e-6 max deviation, with throughput parity vs the XLA scan at
reference scale — see BASELINE.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from altro_tpu.ops.pallas_riccati import BATCH_TILE, riccati_backward_pallas
from altro_tpu.tvlqr import tvlqr_backward


def make_batch(Bsz, N, n=4, m=2, seed=0):
    rng = np.random.default_rng(seed)
    A = np.tile(np.eye(n, dtype=np.float32), (Bsz, N, 1, 1)) + 0.02 * rng.standard_normal(
        (Bsz, N, n, n)
    ).astype(np.float32)
    B = 0.3 * rng.standard_normal((Bsz, N, n, m)).astype(np.float32)
    f = 0.05 * rng.standard_normal((Bsz, N, n)).astype(np.float32)

    def spd(count, d):
        W = rng.standard_normal((Bsz, count, d, d)).astype(np.float32)
        return np.einsum("bkij,bklj->bkil", W, W) / d + np.eye(d, dtype=np.float32)

    lxx = spd(N + 1, n)
    luu = spd(N, m)
    lux = 0.02 * rng.standard_normal((Bsz, N, m, n)).astype(np.float32)
    lx = rng.standard_normal((Bsz, N + 1, n)).astype(np.float32)
    lu = rng.standard_normal((Bsz, N, m)).astype(np.float32)
    return A, B, f, lxx, luu, lux, lx, lu


def test_matches_vmapped_scan():
    args = make_batch(BATCH_TILE, N=8)
    out = riccati_backward_pallas(*args, interpret=True)
    ref = jax.vmap(tvlqr_backward)(*(jnp.asarray(a) for a in args))
    assert bool(out.ok.all()) and bool(ref.ok.all())
    np.testing.assert_allclose(out.K, np.asarray(ref.K), atol=2e-5)
    np.testing.assert_allclose(out.d, np.asarray(ref.d), atol=2e-5)
    np.testing.assert_allclose(out.P, np.asarray(ref.P), atol=2e-4)
    np.testing.assert_allclose(out.p, np.asarray(ref.p), atol=2e-4)
    np.testing.assert_allclose(out.delta_V, np.asarray(ref.delta_V), rtol=2e-4, atol=2e-4)


def test_per_lane_failure_flags():
    args = list(make_batch(BATCH_TILE, N=6))
    luu = args[4].copy()
    luu[3, 2] = -10.0 * np.eye(2, dtype=np.float32)  # break lane 3 at knot 2
    args[4] = luu
    out = riccati_backward_pallas(*args, interpret=True)
    ok = np.asarray(out.ok)
    assert not ok[3]
    assert ok[[0, 1, 2, 4]].all()


def test_rejects_partial_tile():
    args = make_batch(BATCH_TILE // 2, N=4)
    with pytest.raises(ValueError):
        riccati_backward_pallas(*args, interpret=True)
