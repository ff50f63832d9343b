"""Cart-pole (declared but never shipped by the reference,
test_utils.hpp:20-21). State [x, theta, xdot, thetadot], input [force];
theta = 0 hanging down.
"""

from __future__ import annotations

import jax.numpy as jnp


def cartpole_continuous(mass_cart=1.0, mass_pole=0.2, length=0.5, gravity=9.81):
    def f(x, u):
        q, theta, qd, thetad = x[0], x[1], x[2], x[3]
        st, ct = jnp.sin(theta), jnp.cos(theta)
        mt = mass_cart + mass_pole
        # Standard underactuated-robotics cartpole equations
        temp = (u[0] + mass_pole * length * thetad**2 * st) / mt
        thetadd = (gravity * st - ct * temp) / (
            length * (4.0 / 3.0 - mass_pole * ct * ct / mt)
        )
        qdd = temp - mass_pole * length * thetadd * ct / mt
        return jnp.stack([qd, thetad, qdd, thetadd])

    return f
