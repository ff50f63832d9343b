"""Latency-path Riccati backward dispatch (single-lane packed kernel).

`tvlqr_backward_latency` is the single-solve twin of
ops/fused_backward.tvlqr_backward_fused: called unbatched on a TPU
backend with f32 operands at supported block sizes (packed_supported:
m <= 8 and the row-grouped fields fit one 128-lane tile — the whole
repo zoo, incl. the quadrotor's n = 12) it runs the packed single-lane
Pallas kernel (ops/pallas_packed.py — the whole N-step recursion as one
kernel program, ~10 us/knot XLA op latency collapsed to VPU issue
latency); any other trace (CPU/f64 parity suites, big blocks) falls
back to the serial scan, and a vmapped trace falls back to the vmapped
scan — batched workloads belong on the fused batched kernel
(options.pallas_backward) or the tile-resident solve, which this
dispatcher deliberately does not shadow.

This closes the reference's defining low-latency deployment gap: a
single warm-started solve per control tick (bicycle_test.cpp:302-342)
and the long-horizon single solve (bench_all scotty_long_horizon_N500)
run the backward pass at kernel latency instead of per-op XLA dispatch
latency (docs/PERF.md: the backward is ~50% of the N=500 solve).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from altro_tpu.ops.pallas_packed import (
    packed_supported,
    riccati_backward_pallas_packed,
)
from altro_tpu.tvlqr import TVLQRGains, tvlqr_backward

__all__ = ["tvlqr_backward_latency"]

# Test hook: route dispatch through the Pallas interpreter on CPU so the
# kernel path is exercised without TPU hardware.
_FORCE_INTERPRET = False


def _on_tpu() -> bool:
    default_dev = getattr(jax.config, "jax_default_device", None)
    if default_dev is not None:
        if isinstance(default_dev, str):
            # jax_default_device accepts platform strings ("tpu",
            # "tpu:0"); getattr(str, "platform") would be None and
            # wrongly disable the kernel
            return default_dev.split(":")[0] == "tpu"
        return getattr(default_dev, "platform", None) == "tpu"
    return jax.default_backend() == "tpu"


def _make(symmetrize: bool, with_f: bool):
    if with_f:
        @jax.custom_batching.custom_vmap
        def latency(A, B, f, lxx, luu, lux, lx, lu, reg):
            n, m = A.shape[1], B.shape[2]
            interpret = _FORCE_INTERPRET
            if ((interpret or _on_tpu()) and A.dtype == jnp.float32
                    and packed_supported(n, m)):
                return riccati_backward_pallas_packed(
                    A, B, lxx, luu, lx, lu, reg=reg, lux=lux, f=f,
                    symmetrize=symmetrize, interpret=interpret)
            return tvlqr_backward(A, B, f, lxx, luu, lux, lx, lu, reg,
                                  symmetrize=symmetrize)
    else:
        # f == 0 (defect-free iLQR expansions, the solver's only mode):
        # the kernel statically elides the grouped P⁺f product; the scan
        # fallback gets a literal-zero f that XLA folds away.
        @jax.custom_batching.custom_vmap
        def latency(A, B, lxx, luu, lux, lx, lu, reg):
            n, m = A.shape[1], B.shape[2]
            interpret = _FORCE_INTERPRET
            if ((interpret or _on_tpu()) and A.dtype == jnp.float32
                    and packed_supported(n, m)):
                return riccati_backward_pallas_packed(
                    A, B, lxx, luu, lx, lu, reg=reg, lux=lux, f=None,
                    symmetrize=symmetrize, interpret=interpret)
            return tvlqr_backward(
                A, B, jnp.zeros_like(lx[: A.shape[0]]), lxx, luu, lux,
                lx, lu, reg, symmetrize=symmetrize)

    @latency.def_vmap
    def _vmap_rule(axis_size, in_batched, *args):
        in_axes = [0 if b else None for b in in_batched]
        if with_f:
            call = lambda *a: tvlqr_backward(*a, symmetrize=symmetrize)
        else:
            def call(A, B, lxx, luu, lux, lx, lu, reg):
                return tvlqr_backward(
                    A, B, jnp.zeros_like(lx[: A.shape[0]]), lxx, luu,
                    lux, lx, lu, reg, symmetrize=symmetrize)
        gains = jax.vmap(call, in_axes=in_axes)(*args)
        return gains, TVLQRGains(*([True] * len(gains)))

    return latency


_LATENCY = {
    (s, wf): _make(s, wf) for s in (True, False) for wf in (True, False)
}


def tvlqr_backward_latency(A, B, f, lxx, luu, lux, lx, lu, reg,
                           symmetrize: bool = False) -> TVLQRGains:
    """f=None declares the affine dynamics term identically zero (iLQR
    defect-free expansions) and elides its products on the kernel path."""
    if f is None:
        return _LATENCY[(bool(symmetrize), False)](
            A, B, lxx, luu, lux, lx, lu, reg)
    return _LATENCY[(bool(symmetrize), True)](
        A, B, f, lxx, luu, lux, lx, lu, reg)
