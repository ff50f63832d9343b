"""Batch-fused Riccati backward pass dispatch.

`tvlqr_backward_fused` is `tvlqr_backward` wrapped in
`jax.custom_batching.custom_vmap`: called unbatched it IS the serial
scan, but when the solver is vmapped over a batch of lanes (the batched
MPC runners) the batching rule replaces the vmapped scan with the single
fused Pallas kernel (`ops/pallas_riccati.py`) — the batch axis becomes
the kernel's (8, 128) lane tiles, measured 2-3x the vmapped scan at
quadrotor block sizes (n=12) on TPU v5e.

Dispatch falls back to the plain vmapped scan whenever the kernel does
not apply: non-TPU backends, batch not a multiple of 1024, non-f32
dtypes (the f64 parity suite), or nested batching.

This realizes the "natively batched solver path" the reference's serial
design cannot express (its backward pass is one knot at a time,
tvlqr.cpp:92-192, one problem at a time).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from altro_tpu.ops.pallas_riccati import BATCH_TILE, riccati_backward_pallas
from altro_tpu.tvlqr import TVLQRGains, tvlqr_backward

__all__ = ["tvlqr_backward_fused"]

# Test hook: route the batching rule through the Pallas interpreter on
# CPU so the dispatch path itself is exercised without TPU hardware.
_FORCE_INTERPRET = False


@jax.custom_batching.custom_vmap
def tvlqr_backward_fused(A, B, f, lxx, luu, lux, lx, lu, reg):
    return tvlqr_backward(A, B, f, lxx, luu, lux, lx, lu, reg)


@tvlqr_backward_fused.def_vmap
def _fused_vmap_rule(axis_size, in_batched, A, B, f, lxx, luu, lux, lx, lu,
                     reg):
    args = [A, B, f, lxx, luu, lux, lx, lu, reg]
    interpret = _FORCE_INTERPRET
    # Target-platform check at trace time: honor an explicit
    # jax.default_device(...) override (the debugging/forced-CPU case) in
    # addition to the process default backend. Arrays committed to a
    # non-default device are not visible from inside a batching rule —
    # that residual case still mis-dispatches, so pallas_backward is
    # opt-in rather than on by default.
    default_dev = getattr(jax.config, "jax_default_device", None)
    if default_dev is not None:
        on_tpu = getattr(default_dev, "platform", None) == "tpu"
    else:
        on_tpu = jax.default_backend() == "tpu"
    use_pallas = (
        (interpret or on_tpu)
        and axis_size % BATCH_TILE == 0
        and A.dtype == jnp.float32
        # unbatched rank 3 => single-level batching (rule also fires for
        # the outer axis of nested vmaps; those fall back)
        and A.ndim == 3 + int(in_batched[0])
    )
    if use_pallas:
        full = [
            x if b else jnp.broadcast_to(x[None], (axis_size,) + x.shape)
            for x, b in zip(args[:8], in_batched[:8])
        ]
        reg_b = reg if in_batched[8] else jnp.broadcast_to(
            jnp.asarray(reg, jnp.float32), (axis_size,)
        )
        out = riccati_backward_pallas(*full, reg=reg_b, interpret=interpret)
        gains = TVLQRGains(out.K, out.d, out.P, out.p, out.delta_V, out.ok,
                           out.fail_index)
    else:
        in_axes = [0 if b else None for b in in_batched]
        gains = jax.vmap(
            lambda *a: tvlqr_backward(*a), in_axes=in_axes
        )(*args)
    return gains, TVLQRGains(*([True] * len(gains)))
