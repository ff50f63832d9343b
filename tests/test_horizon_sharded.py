"""Horizon-sharded (sequence-parallel) Riccati vs. the serial scan,
on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from altro_tpu.parallel.horizon import tvlqr_backward_horizon_sharded
from altro_tpu.parallel.mesh import make_mesh
from altro_tpu.tvlqr import tvlqr_backward

from test_parallel_riccati import random_lqr


@pytest.mark.parametrize("N", [15])  # N+1 divisible by 8
def test_matches_serial(N):
    mesh = make_mesh(8, axis="horizon")
    args = random_lqr(N, n=4, m=2, seed=N)
    gs = tvlqr_backward(*args)
    gp = tvlqr_backward_horizon_sharded(*args, mesh=mesh)
    assert bool(gs.ok) and bool(gp.ok)
    np.testing.assert_allclose(gp.P, np.asarray(gs.P), rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(gp.p, np.asarray(gs.p), rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(gp.K, np.asarray(gs.K), rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(gp.d, np.asarray(gs.d), rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(gp.delta_V, np.asarray(gs.delta_V), rtol=1e-7, atol=1e-8)


def test_divisibility_check():
    mesh = make_mesh(8, axis="horizon")
    args = random_lqr(10, n=4, m=2, seed=1)
    with pytest.raises(ValueError):
        tvlqr_backward_horizon_sharded(*args, mesh=mesh)


def test_batch_horizon_2d_mesh_matches_vmapped_serial():
    """2-D mesh: lanes over 'batch', each horizon over 'horizon'."""
    from jax.sharding import Mesh

    from altro_tpu.parallel.horizon import tvlqr_backward_batch_horizon_sharded

    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("batch", "horizon"))
    N, Bsz = 15, 6  # N+1 divisible by 4; Bsz divisible by 2
    batched = [
        jnp.stack(a)
        for a in zip(*[random_lqr(N, n=4, m=2, seed=100 + i) for i in range(Bsz)])
    ]
    gs = jax.vmap(lambda *a: tvlqr_backward(*a))(*batched)
    gp = tvlqr_backward_batch_horizon_sharded(*batched, mesh=mesh)
    assert bool(jnp.all(gs.ok)) and bool(jnp.all(gp.ok))
    np.testing.assert_allclose(gp.P, np.asarray(gs.P), rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(gp.p, np.asarray(gs.p), rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(gp.K, np.asarray(gs.K), rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(gp.d, np.asarray(gs.d), rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(gp.delta_V, np.asarray(gs.delta_V), rtol=1e-7, atol=1e-8)
    np.testing.assert_array_equal(np.asarray(gp.fail_index), N)
