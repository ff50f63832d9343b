"""Kinematic bicycle model (three reference frames).

Parity: /root/reference/test/test_utils.cpp:134-238 /
test_utils.hpp:33-55. State [px, py, theta (heading), delta (steering)],
input [v (longitudinal speed), delta_dot (steering rate)].
"""

from __future__ import annotations

import enum

import jax.numpy as jnp

LENGTH = 2.7  # wheelbase
REAR = 1.5  # distance CoG -> rear axle


class BicycleFrame(enum.Enum):
    CENTER_OF_GRAVITY = "cog"
    REAR = "rear"
    FRONT = "front"


def bicycle_continuous(frame: BicycleFrame = BicycleFrame.CENTER_OF_GRAVITY,
                       length: float = LENGTH, rear: float = REAR):
    def f(x, u):
        v, delta_dot = u[0], u[1]
        theta, delta = x[2], x[3]
        if frame is BicycleFrame.CENTER_OF_GRAVITY:
            beta = jnp.arctan2(rear * delta, length)
            omega = v * jnp.cos(beta) * jnp.tan(delta) / length
            ang = theta + beta
        elif frame is BicycleFrame.REAR:
            omega = v * jnp.tan(delta) / length
            ang = theta
        else:  # FRONT
            omega = v * jnp.sin(delta) / length
            ang = theta + delta
        return jnp.stack([v * jnp.cos(ang), v * jnp.sin(ang), omega, delta_dot])

    return f
