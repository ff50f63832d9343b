"""Tile-form dynamics steps for the packed trial-rollout Pallas kernel.

The packed rollout kernel (ops/pallas_rollout.py) runs the line-search
trial-grid rollout — the solver's remaining sequential chain — inside
ONE Pallas program, with the W trial step sizes riding the 8 sublanes
of each (8, 128) tile. That requires the model dynamics to be evaluated
on TILE operands: x is an (S, n) block whose rows are independent trial
lanes and whose lanes are state components, u likewise (S, m), and h an
(S, 1) column. This module provides that tile form for the model zoo
(VERDICT r4 item 1's packed-dynamics protocol).

Writing rules (Mosaic lowering, same lessons as ops/pallas_packed.py's
docstring): extract state components with MASKED ROW-REDUCES
(`comp(x, i)` — a plain lane slice keeps a nonzero lane offset that
`vector.broadcast` refuses), assemble result vectors with one-hot
lane masks (`place`), and keep everything 2-D. Any jnp elementwise op /
transcendental that Mosaic lowers (sin, cos, arctan2, tan, ...) is fine.

The protocol: `Problem.dynamics_tile` holds a step function
`step(x_tile, u_tile, h_col) -> x_next_tile` equal (to f32 roundoff) to
`problem.dynamics(x, u, h, k)` row-wise. Build one by composing a
continuous tile dynamics with `midpoint_tile` / `rk4_tile`, mirroring
models/integrators.py. Parity: tests/test_pallas_rollout.py checks each
zoo step against the per-lane dynamics under vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "comp",
    "place",
    "midpoint_tile",
    "rk4_tile",
    "bicycle_tile",
    "double_integrator_tile",
    "pendulum_tile",
    "quadrotor_tile",
]


def comp(x, i):
    """Column i of a tile as an (S, 1) broadcast-safe column (masked
    row-reduce normalizes the lane offset/layout)."""
    w = x.shape[-1]
    io = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    return jnp.sum(jnp.where(io == i, x, 0.0), axis=1, keepdims=True)


def place(cols, n):
    """Assemble an (S, n) tile from a list of (S, 1) columns."""
    io = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    out = cols[0] * (io == 0).astype(cols[0].dtype)
    for i in range(1, n):
        out = out + cols[i] * (io == i).astype(cols[i].dtype)
    return out


def midpoint_tile(f):
    """Explicit midpoint on tile operands (== models.integrators.midpoint,
    integrators.py / reference test_utils.cpp midpoint discretization)."""

    def step(x, u, h):
        xm = x + 0.5 * h * f(x, u)
        return x + h * f(xm, u)

    return step


def rk4_tile(f):
    """Classic RK4 on tile operands (== models.integrators.rk4)."""

    def step(x, u, h):
        k1 = f(x, u)
        k2 = f(x + 0.5 * h * k1, u)
        k3 = f(x + 0.5 * h * k2, u)
        k4 = f(x + h * k3, u)
        return x + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)

    return step


def bicycle_tile(frame="cog", length=2.7, rear=1.5):
    """Tile form of models.bicycle.bicycle_continuous (all 3 frames)."""

    def f(x, u):
        v = comp(u, 0)
        delta_dot = comp(u, 1)
        theta = comp(x, 2)
        delta = comp(x, 3)
        if frame in ("cog", "CENTER_OF_GRAVITY"):
            # beta = atan(rear*delta / length), but Mosaic has no atan
            # lowering — and none is needed: only cos(beta)/sin(beta)
            # appear, which the triangle identity gives EXACTLY:
            #   cos(beta) = L / hyp,  sin(beta) = rear*delta / hyp,
            #   hyp = sqrt(L^2 + (rear*delta)^2);
            # cos/sin(theta + beta) expand by the angle-sum formulas.
            rd = rear * delta
            inv_hyp = jax.lax.rsqrt(length * length + rd * rd)
            cosb = length * inv_hyp
            sinb = rd * inv_hyp
            ct, st = jnp.cos(theta), jnp.sin(theta)
            cos_ang = ct * cosb - st * sinb
            sin_ang = st * cosb + ct * sinb
            omega = v * cosb * jnp.tan(delta) / length
        elif frame in ("rear", "REAR"):
            omega = v * jnp.tan(delta) / length
            cos_ang, sin_ang = jnp.cos(theta), jnp.sin(theta)
        else:  # front
            omega = v * jnp.sin(delta) / length
            ang = theta + delta
            cos_ang, sin_ang = jnp.cos(ang), jnp.sin(ang)
        return place([v * cos_ang, v * sin_ang, omega, delta_dot], 4)

    return f


def double_integrator_tile(dim=2):
    """Tile form of models.double_integrator.double_integrator_dynamics —
    that model is an EXACT DISCRETE step, so this returns a step(x, u, h)
    directly (no integrator composition):
    pos' = pos + vel h + u h^2/2;  vel' = vel + u h."""

    def step(x, u, h):
        b = 0.5 * h * h
        cols = []
        for i in range(dim):
            cols.append(comp(x, i) + comp(x, dim + i) * h + comp(u, i) * b)
        for i in range(dim):
            cols.append(comp(x, dim + i) + comp(u, i) * h)
        return place(cols, 2 * dim)

    return step


def pendulum_tile(mass=1.0, length=0.5, b=0.1, g=9.81):
    """Tile form of models.pendulum.pendulum_continuous."""

    def f(x, u):
        theta = comp(x, 0)
        omega = comp(x, 1)
        tau = comp(u, 0)
        alpha = (tau - b * omega) / (mass * length * length) - (
            g / length
        ) * jnp.sin(theta)
        return place([omega, alpha], 2)

    return f


def quadrotor_tile(mass=0.5, gravity=9.81, arm=0.1750, kf=1.0, km=0.0245,
                   inertia=(0.0023, 0.0023, 0.004)):
    """Tile form of models.quadrotor.quadrotor_continuous (n=12:
    [pos(3), rpy(3), vel(3), omega(3)], u = 4 rotor thrusts) — the same
    scalar-form expressions on (S, 1) columns."""
    Jx, Jy, Jz = inertia

    def f(x, u):
        r, p, y = comp(x, 3), comp(x, 4), comp(x, 5)
        vx, vy, vz = comp(x, 6), comp(x, 7), comp(x, 8)
        wx, wy, wz = comp(x, 9), comp(x, 10), comp(x, 11)
        w0, w1, w2, w3 = (kf * comp(u, i) for i in range(4))

        cr, sr = jnp.cos(r), jnp.sin(r)
        cp, sp = jnp.cos(p), jnp.sin(p)
        cy, sy = jnp.cos(y), jnp.sin(y)

        T = (w0 + w1 + w2 + w3) / mass
        ax = (cy * sp * cr + sy * sr) * T
        ay = (sy * sp * cr - cy * sr) * T
        az = cp * cr * T - gravity

        tx = arm * (w1 - w3)
        ty = arm * (w2 - w0)
        tz = km * (w0 - w1 + w2 - w3)
        wdx = (tx - (wy * Jz * wz - wz * Jy * wy)) / Jx
        wdy = (ty - (wz * Jx * wx - wx * Jz * wz)) / Jy
        wdz = (tz - (wx * Jy * wy - wy * Jx * wx)) / Jz

        tp = sp / cp
        rd = wx + sr * tp * wy + cr * tp * wz
        pd = cr * wy - sr * wz
        yd = (sr * wy + cr * wz) / cp

        return place([vx, vy, vz, rd, pd, yd, ax, ay, az, wdx, wdy, wdz], 12)

    return f
