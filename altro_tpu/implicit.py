"""Implicit dynamics support.

The reference declares an implicit-dynamics API
(ImplicitDynamicsFunction/Jacobian, typedefs.hpp:37-42;
SetImplicitDynamics, altro_solver.hpp:114) but ships no implementation.
Here the intent is realized: a residual r(x1, u, x2, h) = 0 defines the
step implicitly; the explicit step comes from a fixed-iteration Newton
solve (trace-friendly `fori_loop`), and the dynamics Jacobian comes from
the implicit function theorem
    A = -(dr/dx2)^-1 dr/dx1,   B = -(dr/dx2)^-1 dr/du
instead of differentiating through the Newton iterations.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["implicit_dynamics", "implicit_midpoint_residual"]


def implicit_dynamics(residual: Callable, newton_iters: int = 8):
    """Build (dynamics, jacobian) callables from a residual.

    residual(x1, u, x2, h) -> [n], zero at the implicit step.
    Returns (step(x, u, h, k) -> x_next, jac(x, u, h, k) -> [n, n+m])
    matching the Problem dynamics interface.
    """

    def step(x, u, h, k):
        def body(_, x2):
            r = residual(x, u, x2, h)
            Jr = jax.jacfwd(residual, argnums=2)(x, u, x2, h)
            return x2 - jnp.linalg.solve(Jr, r)

        return jax.lax.fori_loop(0, newton_iters, body, x)

    def jac(x, u, h, k):
        x2 = step(x, u, h, k)
        Jx2 = jax.jacfwd(residual, argnums=2)(x, u, x2, h)
        Jx1 = jax.jacfwd(residual, argnums=0)(x, u, x2, h)
        Ju = jax.jacfwd(residual, argnums=1)(x, u, x2, h)
        AB = -jnp.linalg.solve(Jx2, jnp.concatenate([Jx1, Ju], axis=1))
        return AB

    return step, jac


def implicit_midpoint_residual(f: Callable) -> Callable:
    """Residual of the (symplectic) implicit midpoint rule:
    x2 = x1 + h f((x1+x2)/2, u)."""

    def residual(x1, u, x2, h):
        return x2 - x1 - h * f(0.5 * (x1 + x2), u)

    return residual
