"""Differentiable solves: gradients of the optimal trajectory w.r.t. the
problem data, by implicit differentiation of the solver's fixed point.

This is a capability the reference does not have (and could not express:
its problem data live behind raw-pointer callbacks,
/root/reference/src/altro/solver/typedefs.hpp:31-53). Because `Problem` is
a pytree whose data leaves are the cost arrays (Q/R/q/r/c), references,
timesteps h, initial state x0, and linear-dynamics arrays (A/B/f_aff),
`implicit_solve` makes the map `problem -> (x*, u*)` reverse-mode
differentiable — the enabler for learning-based MPC (tuning cost weights
through the controller), sensitivity analysis, and bilevel trajectory
optimization.

Math. At convergence the returned inputs u* satisfy the reduced
stationarity condition

    g(u, theta) := d/du  phi(u, theta) = 0,
    phi(u, theta) = AL total cost along the rollout x = R(u, theta)
                    at the converged duals z* and penalty rho*,

(the same merit function the solver minimizes, solver.cpp:273-355). The
implicit function theorem gives du*/dtheta = -H^{-1} dg/dtheta with
H = d2 phi / du2, so for an output cotangent (xbar, ubar):

    w         = ubar + R_u^T xbar          (pull xbar back through the rollout)
    lambda    = H^{-1} w                   (one linear solve)
    theta_bar = R_theta^T xbar - (dg/dtheta)^T lambda.

The linear solve is performed either with

  * method="tvlqr": the Gauss-Newton Hessian, i.e. ONE extra TVLQR
    backward+forward pass at the solution (O(N), the same kernel the
    solver itself uses). Exact for quadratic costs + linear dynamics;
    for nonlinear dynamics it is the derivative of the iLQR fixed point
    (the standard differentiable-MPC construction — see PAPERS.md,
    Amos et al., "Differentiable MPC for End-to-end Planning and
    Control").
  * method="cg": matrix-free conjugate gradients on the EXACT Hessian of
    phi (Hessian-vector products by forward-over-reverse autodiff through
    the rollout). Exact for smooth problems; use for verification or when
    dynamics curvature matters.

Constrained problems: z* and rho* are held fixed (stop-gradient), so the
gradient is the sensitivity of the augmented-Lagrangian minimizer at the
converged multipliers. For active constraints this approximates the true
NLP solution sensitivity with error O(1/rho + feasibility violation) —
tighten `tol_primal_feasibility` / raise `penalty_max` when gradients
through active constraints must be accurate.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from altro_tpu.options import SolverOptions
from altro_tpu.problem import Problem
from altro_tpu.solver import (
    SolverState,
    al_expansions,
    al_total_cost,
    init_state,
    open_loop_rollout,
    solve,
)
from altro_tpu.tvlqr import tvlqr_backward, tvlqr_forward

__all__ = ["implicit_solve"]


def _stop(tree):
    return jax.tree_util.tree_map(jax.lax.stop_gradient, tree)


def _merit(problem: Problem, u: jnp.ndarray, z, rho) -> jnp.ndarray:
    """phi(u, theta): the AL merit as a function of the inputs alone
    (states eliminated through the rollout), at fixed duals/penalty."""
    x = open_loop_rollout(problem, u)
    return al_total_cost(problem, x, u, z, rho)


def _gn_solve(problem: Problem, u, z, rho, w, reg):
    """lambda = H_GN^{-1} w via one TVLQR backward+forward pass.

    The reduced Gauss-Newton Hessian of the merit is exactly the LQR
    Hessian assembled from the AL cost expansions along the linearized
    dynamics; minimizing 0.5 du' H du - w'du (stage linear terms lx = 0,
    lu = -w; affine term f = 0; dx0 = 0) yields du = H^{-1} w.
    """
    x = open_loop_rollout(problem, u)
    A, B, _, _, lxx, luu, lux = al_expansions(problem, x, u, z, rho)
    N = problem.N
    dtype = u.dtype
    zeros_f = jnp.zeros((N, problem.n), dtype)
    lx = jnp.zeros((N + 1, problem.n), dtype)
    gains = tvlqr_backward(A, B, zeros_f, lxx, luu, lux, lx, -w, reg=reg)
    _, lam, _ = tvlqr_forward(
        A, B, zeros_f, gains.K, gains.d, gains.P, gains.p, jnp.zeros((problem.n,), dtype)
    )
    return lam


def _cg_solve(problem: Problem, u, z, rho, w, tol, maxiter):
    """lambda = H^{-1} w with the exact merit Hessian, matrix-free CG."""
    grad_fn = jax.grad(lambda u_: _merit(problem, u_, z, rho))

    def hvp(v):
        return jax.jvp(grad_fn, (u,), (v,))[1]

    lam, _ = jax.scipy.sparse.linalg.cg(hvp, w, tol=tol, maxiter=maxiter)
    return lam


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _implicit_solve(problem, state, opts, method, cg_tol, cg_maxiter):
    st, _ = solve(problem, state, opts)
    return st.x, st.u


def _implicit_fwd(problem, state, opts, method, cg_tol, cg_maxiter):
    st, _ = solve(problem, state, opts)
    return (st.x, st.u), (problem, st.u, st.z, st.rho)


def _implicit_bwd(opts, method, cg_tol, cg_maxiter, res, cot):
    problem, u, z, rho = res
    xbar, ubar = cot
    z = _stop(z)
    rho = jax.lax.stop_gradient(rho)
    u = jax.lax.stop_gradient(u)

    # Pull the state cotangent back through the rollout x* = R(u*, theta):
    # contributes both to the u-cotangent (chained into the implicit term)
    # and directly to theta_bar.
    _, vjp_roll = jax.vjp(lambda u_, pb_: open_loop_rollout(pb_, u_), u, problem)
    w_from_x, pbar_direct = vjp_roll(xbar)
    w = ubar + w_from_x

    if method == "cg":
        lam = _cg_solve(problem, u, z, rho, w, cg_tol, cg_maxiter)
    else:
        lam = _gn_solve(problem, u, z, rho, w, jnp.asarray(opts.reg_initial, u.dtype))

    # theta_bar_implicit = -(dg/dtheta)^T lambda, with
    # g(u, theta) = d phi / du evaluated at the solution.
    def g_of_theta(pb_):
        return jax.grad(lambda u_: _merit(pb_, u_, z, rho))(u)

    _, vjp_g = jax.vjp(g_of_theta, problem)
    (pbar_implicit,) = vjp_g(lam)

    # Non-differentiable leaves (e.g. bool `active` masks) carry float0
    # cotangents — pass them through untouched.
    pbar = jax.tree_util.tree_map(
        lambda a, b: a if a.dtype == jax.dtypes.float0 else a - b,
        pbar_direct,
        pbar_implicit,
    )
    # Warm-start state does not influence the converged solution:
    # zero cotangent.
    state_bar = jax.tree_util.tree_map(jnp.zeros_like, init_state(problem))
    return (pbar, state_bar)


_implicit_solve.defvjp(_implicit_fwd, _implicit_bwd)


def implicit_solve(
    problem: Problem,
    state: Optional[SolverState] = None,
    opts: SolverOptions = SolverOptions(),
    method: str = "tvlqr",
    cg_tol: float = 1e-10,
    cg_maxiter: Optional[int] = None,
):
    """Solve and return (x*, u*), differentiable w.r.t. `problem`'s data
    leaves (cost arrays, h, x0, linear-dynamics A/B/f_aff).

    method: "tvlqr" (Gauss-Newton implicit diff, one extra TVLQR pass,
    O(N)) or "cg" (exact-Hessian matrix-free CG). Compose freely with
    `jax.vmap` (batched problems) and `jax.jit`.
    """
    if method not in ("tvlqr", "cg"):
        raise ValueError(f"unknown method {method!r}")
    if state is None:
        state = init_state(problem)
    if cg_maxiter is None:
        cg_maxiter = problem.N * problem.m
    return _implicit_solve(problem, state, opts, method, cg_tol, cg_maxiter)
