"""Backend-selection resilience helper.

Some environments force a specific PJRT plugin through `JAX_PLATFORMS`
and register it in a `sitecustomize` placed on `PYTHONPATH` (e.g. the
remote-TPU "axon" tunnel used by this repo's bench hardware). Any
process that overrides `PYTHONPATH` inherits the forced platform name
WITHOUT the plugin registration, and the very first backend use raises
`RuntimeError: Unable to initialize backend ...`. `ensure_backend()`
makes entry points robust to that: try the configured platforms, and if
none can initialize, fall back to automatic selection before the first
real computation.
"""

from __future__ import annotations

__all__ = ["ensure_backend"]


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
