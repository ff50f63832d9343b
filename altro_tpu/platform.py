"""Backend-selection and capability-probing helpers.

Some environments force a specific PJRT plugin through `JAX_PLATFORMS`
and register it in a `sitecustomize` placed on `PYTHONPATH` (e.g. the
remote-TPU "axon" tunnel used by this repo's bench hardware). Any
process that overrides `PYTHONPATH` inherits the forced platform name
WITHOUT the plugin registration, and the very first backend use raises
`RuntimeError: Unable to initialize backend ...`. `ensure_backend()`
makes entry points robust to that: try the configured platforms, and if
none can initialize, fall back to automatic selection before the first
real computation.

Some PJRT plugins (the same axon tunnel) do not support host send/recv
callbacks, so `jax.debug.print` / `jax.debug.callback` raise at compile
time ("... does not support host send/recv callbacks"). The solver's
verbosity tiers (reference solver.cpp:438-441,492-509) must degrade
gracefully there instead of killing the solve: `supports_host_callbacks()`
probes the backend once, and `debug_print()` is a drop-in
`jax.debug.print` that becomes a no-op on callback-less backends (the
public API then prints a host-side post-solve summary instead — see
`ALTROSolver.solve`).
"""

from __future__ import annotations

import functools
import warnings

__all__ = [
    "ensure_backend",
    "supports_host_callbacks",
    "debug_print",
    "debug_callback",
]


def ensure_backend() -> str:
    """Return the selected platform name, falling back to automatic
    platform selection if the configured one cannot initialize. Must be
    called before the first jax computation to have an effect."""
    import jax

    try:
        return jax.devices()[0].platform
    except RuntimeError:
        jax.config.update("jax_platforms", "")
        return jax.devices()[0].platform


@functools.lru_cache(maxsize=None)
def _supports_host_callbacks_for(platform: str) -> bool:
    """Probe: compile + run a trivial jitted computation containing a
    debug callback. Platforms without host send/recv support raise at
    lowering or execution time; any failure means "unsupported"."""
    import concurrent.futures

    def _run_probe() -> bool:
        import jax
        import jax.numpy as jnp

        try:
            def probe(x):
                # Silent callback: exercises the same host send/recv
                # machinery as debug.print without emitting a stray
                # blank line to stdout on callback-capable backends.
                jax.debug.callback(lambda: None)
                return x + 1

            jax.block_until_ready(jax.jit(probe)(jnp.zeros((), jnp.float32)))
            return True
        except Exception:  # noqa: BLE001 - any backend error means no support
            return False

    # The first call usually happens at TRACE time (debug_print sits
    # inside the jitted solve). Under an active trace the probe's inner
    # jit would be inlined into the caller's program instead of executing
    # — it would "succeed", cache True, and let the callbacks through to
    # a backend that rejects them at dispatch (and
    # jax.ensure_compile_time_eval doesn't help: it disables jit, so the
    # eager debug.print never exercises the callback machinery). JAX's
    # trace state is thread-local, so run the probe in a fresh thread,
    # which always has a clean trace state.
    with concurrent.futures.ThreadPoolExecutor(max_workers=1) as pool:
        return pool.submit(_run_probe).result()


def supports_host_callbacks() -> bool:
    """True if the default backend can run `jax.debug.print` /
    `jax.debug.callback`. Probed once per platform and cached."""
    import jax

    try:
        platform = jax.default_backend()
    except RuntimeError:
        platform = ensure_backend()
    return _supports_host_callbacks_for(platform)


def debug_print(fmt: str, **kwargs) -> None:
    """`jax.debug.print` that degrades to a no-op on backends without
    host-callback support (trace-time decision — verbosity flags are
    static, so this adds nothing to the compiled program)."""
    import jax

    if supports_host_callbacks():
        jax.debug.print(fmt, **kwargs)


_warned_callback_drop = False


def debug_callback(fn, *args) -> None:
    """`jax.debug.callback` that warns-and-drops on backends without
    host-callback support (a user-supplied iteration callback cannot be
    silently eaten without a trace)."""
    import jax

    global _warned_callback_drop
    if supports_host_callbacks():
        jax.debug.callback(fn, *args)
    elif not _warned_callback_drop:
        _warned_callback_drop = True
        warnings.warn(
            "iteration_callback dropped: backend "
            f"'{jax.default_backend()}' does not support host callbacks",
            RuntimeWarning,
            stacklevel=2,
        )
