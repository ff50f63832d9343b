"""Planar-attitude 3D quadrotor (extra model; BASELINE.json's configs name
a quadrotor even though the reference's "scotty" fixture is a bicycle
path — see SURVEY §2.2).

State [pos(3), rpy(3), vel(3), omega(3)] with Euler roll-pitch-yaw
attitude; input = 4 rotor thrusts. Small-angle-free formulation using the
ZYX rotation matrix.
"""

from __future__ import annotations

import jax.numpy as jnp


def quadrotor_continuous(mass=0.5, gravity=9.81, arm=0.1750, kf=1.0, km=0.0245,
                         inertia=(0.0023, 0.0023, 0.004)):
    J = jnp.asarray(inertia)

    def rot_zyx(rpy):
        r, p, y = rpy[0], rpy[1], rpy[2]
        cr, sr = jnp.cos(r), jnp.sin(r)
        cp, sp = jnp.cos(p), jnp.sin(p)
        cy, sy = jnp.cos(y), jnp.sin(y)
        return jnp.array(
            [
                [cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr],
                [sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr],
                [-sp, cp * sr, cp * cr],
            ]
        )

    def euler_rate_matrix(rpy):
        r, p = rpy[0], rpy[1]
        cr, sr = jnp.cos(r), jnp.sin(r)
        cp = jnp.cos(p)
        tp = jnp.tan(p)
        return jnp.array(
            [
                [1.0, sr * tp, cr * tp],
                [0.0, cr, -sr],
                [0.0, sr / cp, cr / cp],
            ]
        )

    def f(x, u):
        rpy = x[3:6]
        vel = x[6:9]
        omega = x[9:12]
        w = kf * u  # rotor thrusts
        total_thrust = jnp.sum(w)
        R = rot_zyx(rpy)
        acc = jnp.array([0.0, 0.0, -gravity]) + R @ jnp.array([0.0, 0.0, total_thrust]) / mass
        torque = jnp.array(
            [
                arm * (w[1] - w[3]),
                arm * (w[2] - w[0]),
                km * (w[0] - w[1] + w[2] - w[3]),
            ]
        )
        omega_dot = (torque - jnp.cross(omega, J * omega)) / J
        rpy_dot = euler_rate_matrix(rpy) @ omega
        return jnp.concatenate([vel, rpy_dot, acc, omega_dot])

    return f
