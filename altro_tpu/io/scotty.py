"""Reference-trajectory IO.

`load_scotty` reads the reference's "Scotty dog" bicycle path fixture
(format of /root/reference/test/scotty.json, loader parity with
test_utils.cpp:240-289: Nref = N - 1 segments, tf seconds, [N, 4] states,
[N, 2] inputs). `synthetic_scotty` generates a self-contained kinematic
bicycle reference of the same shape (a smooth figure-eight driven at the
same average speed) so benchmarks run without the reference tree.
"""

from __future__ import annotations

import json
import os
from typing import NamedTuple

import numpy as np

DEFAULT_PATHS = (
    os.path.join(os.path.dirname(__file__), "..", "..", "data", "scotty.json"),
    os.path.join(os.path.dirname(__file__), "..", "..", "data", "scotty.npz"),
    "/root/reference/test/scotty.json",
)


class ReferenceTrajectory(NamedTuple):
    N: int  # number of segments
    tf: float
    h: float
    x: np.ndarray  # [N+1, n]
    u: np.ndarray  # [N+1, m] (input reference has a row per knot)


def load_scotty(path: str | None = None) -> ReferenceTrajectory:
    if path is None:
        for cand in DEFAULT_PATHS:
            if os.path.exists(cand):
                path = cand
                break
    if path is None or not os.path.exists(path):
        raise FileNotFoundError("scotty fixture not found; use synthetic_scotty()")
    if path.endswith(".npz"):
        # vendored binary form (scripts/vendor_scotty.py): same fields
        # as the reference JSON, committed under data/ so the strict
        # oracles run without the reference tree
        data = dict(np.load(path))
    else:
        with open(path) as f:
            data = json.load(f)
    N = int(data["N"]) - 1
    tf = float(data["tf"])
    x = np.asarray(data["state_trajectory"], dtype=np.float64)
    u = np.asarray(data["input_trajectory"], dtype=np.float64)
    return ReferenceTrajectory(N=N, tf=tf, h=tf / N, x=x, u=u)


def synthetic_scotty(N: int = 500, tf: float = 50.0, scale: float = 30.0) -> ReferenceTrajectory:
    """Figure-eight bicycle reference with consistent headings/speeds."""
    h = tf / N
    t = np.linspace(0.0, 2.0 * np.pi, N + 1)
    px = scale * np.sin(t)
    py = 0.5 * scale * np.sin(2.0 * t)
    dx = np.gradient(px, tf / N)
    dy = np.gradient(py, tf / N)
    theta = np.unwrap(np.arctan2(dy, dx))
    speed = np.sqrt(dx * dx + dy * dy)
    # Steering angle from curvature (rear-axle bicycle, wheelbase 2.7)
    ddx = np.gradient(dx, tf / N)
    ddy = np.gradient(dy, tf / N)
    curv = (dx * ddy - dy * ddx) / np.maximum(speed**3, 1e-6)
    delta = np.arctan(2.7 * curv)
    delta_dot = np.gradient(delta, tf / N)
    x = np.stack([px, py, theta, delta], axis=1)
    u = np.stack([speed, delta_dot], axis=1)
    return ReferenceTrajectory(N=N, tf=tf, h=h, x=x, u=u)
