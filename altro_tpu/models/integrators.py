"""Explicit integrators lifting continuous dynamics xdot = f(x, u) to
discrete maps x' = F(x, u, h, k).

Parity: the reference midpoint (RK2) integrator
(/root/reference/test/test_utils.cpp:84-132); its hand-coded chain-rule
Jacobian is replaced by autodiff of the same composition, which yields
identical values.
"""

from __future__ import annotations


def midpoint(f):
    """Midpoint (explicit RK2): x' = x + h f(x + h/2 f(x, u), u)."""

    def step(x, u, h, k):
        xm = x + 0.5 * h * f(x, u)
        return x + h * f(xm, u)

    return step


def rk4(f):
    """Classic RK4."""

    def step(x, u, h, k):
        k1 = f(x, u)
        k2 = f(x + 0.5 * h * k1, u)
        k3 = f(x + 0.5 * h * k2, u)
        k4 = f(x + h * k3, u)
        return x + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)

    return step
