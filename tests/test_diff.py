"""Differentiable solves (altro_tpu/diff.py): implicit-diff gradients
vs central finite differences of the actual solve.

All checks run in f64 on CPU (conftest). Finite differences re-run the
FULL solver at perturbed problem data, so agreement validates the whole
implicit-function-theorem pipeline end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from altro_tpu.cones import Cone
from altro_tpu.diff import implicit_solve
from altro_tpu.models.double_integrator import double_integrator_dynamics
from altro_tpu.models.integrators import midpoint
from altro_tpu.models.pendulum import pendulum_continuous
from altro_tpu.options import SolverOptions
from altro_tpu.problem import ConstraintSpec, DiagonalCost, Problem
from altro_tpu.solver import init_state, solve


def _di_problem(q_extra=0.0, x0_shift=0.0, dtype=jnp.float64):
    N, n, m, h = 10, 4, 2, 0.1
    Q = jnp.tile(jnp.asarray([1.0, 1.0, 0.1, 0.1], dtype), (N + 1, 1))
    R = jnp.tile(jnp.full((m,), 1e-2, dtype), (N + 1, 1))
    q = jnp.tile(jnp.asarray([-1.0 + q_extra, -0.5, 0.0, 0.0], dtype), (N + 1, 1))
    r = jnp.zeros((N + 1, m), dtype)
    c = jnp.zeros((N + 1,), dtype)
    cost = DiagonalCost(Q=Q, R=R, q=q, r=r, c=c)
    x0 = jnp.asarray([1.0 + x0_shift, 2.0, 0.0, 0.0], dtype)
    return Problem(
        N=N, n=n, m=m,
        dynamics=double_integrator_dynamics(), dynamics_jac=None,
        constraints=(), cost=cost,
        h=jnp.full((N,), h, dtype), x0=x0,
    )


def _loss_of_solution(x, u):
    return jnp.sum(x**2) + 0.5 * jnp.sum(u**2)


def _fd_grad(f, theta0, eps=1e-6):
    g = np.zeros_like(np.asarray(theta0, dtype=np.float64))
    flat = g.reshape(-1)
    t = np.asarray(theta0, dtype=np.float64)
    for i in range(flat.size):
        tp, tm = t.copy().reshape(-1), t.copy().reshape(-1)
        tp[i] += eps
        tm[i] -= eps
        flat[i] = (f(tp.reshape(t.shape)) - f(tm.reshape(t.shape))) / (2 * eps)
    return g


@pytest.mark.parametrize("method", ["tvlqr", "cg"])
def test_unconstrained_lqr_grad_wrt_q_and_x0(method):
    """Linear dynamics + quadratic cost: both methods are EXACT."""
    opts = SolverOptions()

    def loss_from(q_row0, x0_vec):
        pb = _di_problem()
        pb = jax.tree_util.tree_map(lambda a: a, pb)
        cost = pb.cost
        q_new = cost.q.at[0].set(q_row0)
        pb = Problem(
            N=pb.N, n=pb.n, m=pb.m, dynamics=pb.dynamics, dynamics_jac=None,
            constraints=(), cost=DiagonalCost(cost.Q, cost.R, q_new, cost.r, cost.c),
            h=pb.h, x0=x0_vec,
        )
        x, u = implicit_solve(pb, opts=opts, method=method)
        return _loss_of_solution(x, u)

    pb0 = _di_problem()
    q0 = pb0.cost.q[0]
    x00 = pb0.x0

    loss_jit = jax.jit(loss_from)  # cache the solve across the fd sweep
    g_q, g_x0 = jax.jit(jax.grad(loss_from, argnums=(0, 1)))(q0, x00)

    fd_q = _fd_grad(lambda qv: float(loss_jit(jnp.asarray(qv), x00)), np.asarray(q0))
    fd_x0 = _fd_grad(lambda xv: float(loss_jit(q0, jnp.asarray(xv))), np.asarray(x00))

    np.testing.assert_allclose(np.asarray(g_q), fd_q, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(g_x0), fd_x0, rtol=1e-6, atol=1e-8)


def _pendulum_problem(Qd_stage, dtype=jnp.float64):
    """Near-upright pendulum stabilization: nonlinear dynamics with a
    single solution basin (swing-up from hanging is multimodal, which
    makes finite differences jump between local solutions)."""
    N, n, m, h = 20, 2, 1, 0.05
    Q = jnp.tile(jnp.asarray(Qd_stage, dtype), (N + 1, 1))
    Q = Q.at[N].set(jnp.asarray([30.0, 30.0], dtype))
    R = jnp.tile(jnp.full((m,), 1e-1, dtype), (N + 1, 1))
    xg = jnp.asarray([np.pi, 0.0], dtype)
    q = -Q * xg
    r = jnp.zeros((N + 1, m), dtype)
    c = 0.5 * jnp.sum(Q * xg * xg, axis=1)
    cost = DiagonalCost(Q=Q, R=R, q=q, r=r, c=c)
    return Problem(
        N=N, n=n, m=m,
        dynamics=midpoint(pendulum_continuous()), dynamics_jac=None,
        constraints=(), cost=cost,
        h=jnp.full((N,), h, dtype), x0=jnp.asarray([np.pi - 0.4, 0.3], dtype),
    )


def test_nonlinear_dynamics_grad_cg_exact_tvlqr_close():
    """Pendulum stabilization: CG (exact Hessian) matches finite
    differences; the Gauss-Newton (tvlqr) gradient is the iLQR-fixed-point
    derivative, close but not exact under dynamics curvature."""
    opts = SolverOptions(tol_stationarity=1e-9, tol_primal_feasibility=1e-9)

    def rebuilt(Qd):
        base = _pendulum_problem([1.0, 0.1])
        Q = base.cost.Q.at[: base.N].set(jnp.broadcast_to(Qd, (base.N, 2)))
        q = -Q * jnp.asarray([np.pi, 0.0])
        c = 0.5 * jnp.sum(Q * jnp.asarray([np.pi, 0.0]) ** 2, axis=1)
        cost = DiagonalCost(Q, base.cost.R, q, base.cost.r, c)
        return Problem(
            N=base.N, n=base.n, m=base.m, dynamics=base.dynamics, dynamics_jac=None,
            constraints=(), cost=cost, h=base.h, x0=base.x0,
        )

    def loss_from(Qd, method):
        x, u = implicit_solve(rebuilt(Qd), opts=opts, method=method)
        return _loss_of_solution(x, u)

    Qd0 = jnp.asarray([1.0, 0.1])
    # sanity: deep convergence in merit terms at the nominal point (the
    # max-norm stationarity metric floors at ~1e-4 for nonlinear dynamics
    # because the TVLQR dual estimate carries the Gauss-Newton bias —
    # reference-parity behavior)
    _, stats0 = solve(rebuilt(Qd0), init_state(rebuilt(Qd0)), opts)
    assert abs(float(stats0.dphi)) < 1e-7

    g_cg = jax.jit(jax.grad(lambda Qd: loss_from(Qd, "cg")))(Qd0)
    g_gn = jax.jit(jax.grad(lambda Qd: loss_from(Qd, "tvlqr")))(Qd0)

    @jax.jit
    def _fd_loss(Qv):
        pb = rebuilt(Qv)
        st, _ = solve(pb, init_state(pb), opts)
        return _loss_of_solution(st.x, st.u)

    def fd_loss(Qv):
        return float(_fd_loss(jnp.asarray(Qv)))

    fd = _fd_grad(fd_loss, np.asarray(Qd0), eps=1e-6)
    np.testing.assert_allclose(np.asarray(g_cg), fd, rtol=1e-3)
    # GN gradient: the iLQR-fixed-point derivative, within ~1% here
    np.testing.assert_allclose(np.asarray(g_gn), fd, rtol=2e-2)


def test_constrained_grad_matches_fd_to_al_accuracy():
    """Control-bounded double integrator: fixed-multiplier AL sensitivity
    approximates the NLP sensitivity to O(1/rho + violation)."""
    u_bnd = 0.5
    opts = SolverOptions(
        tol_stationarity=1e-9, tol_primal_feasibility=1e-9, penalty_max=1e10
    )

    def build(q_row0):
        base = _di_problem()
        cost = base.cost
        q_new = cost.q.at[0].set(q_row0)
        bound = ConstraintSpec(
            fn=lambda x, u, k: jnp.concatenate([u - u_bnd, -u_bnd - u]),
            cone=Cone.NEGATIVE_ORTHANT, dim=4,
            active=jnp.arange(base.N + 1) < base.N,
        )
        return Problem(
            N=base.N, n=base.n, m=base.m, dynamics=base.dynamics, dynamics_jac=None,
            constraints=(bound,),
            cost=DiagonalCost(cost.Q, cost.R, q_new, cost.r, cost.c),
            h=base.h, x0=base.x0,
        )

    def loss_from(q_row0):
        x, u = implicit_solve(build(q_row0), opts=opts, method="tvlqr")
        return _loss_of_solution(x, u)

    q0 = _di_problem().cost.q[0] * 4.0  # push harder so the bound is active
    # confirm the bound actually binds
    xs, us = implicit_solve(build(q0), opts=opts)
    assert float(jnp.max(jnp.abs(us))) > u_bnd - 1e-6

    g = jax.jit(jax.grad(loss_from))(q0)

    @jax.jit
    def _fd_loss(qv):
        pb = build(qv)
        st, _ = solve(pb, init_state(pb), opts)
        return _loss_of_solution(st.x, st.u)

    def fd_loss(qv):
        return float(_fd_loss(jnp.asarray(qv)))

    fd = _fd_grad(fd_loss, np.asarray(q0), eps=1e-5)
    np.testing.assert_allclose(np.asarray(g), fd, rtol=1e-3, atol=1e-6)


def test_vmap_and_jit_compose():
    """implicit_solve composes with jit and vmap over problem data."""
    opts = SolverOptions()

    def loss(x0):
        base = _di_problem()
        pb = Problem(
            N=base.N, n=base.n, m=base.m, dynamics=base.dynamics, dynamics_jac=None,
            constraints=(), cost=base.cost, h=base.h, x0=x0,
        )
        x, u = implicit_solve(pb, opts=opts)
        return _loss_of_solution(x, u)

    x0s = jnp.stack([_di_problem().x0, _di_problem().x0 + 0.1])
    grads = jax.jit(jax.vmap(jax.grad(loss)))(x0s)
    assert grads.shape == (2, 4)
    g_single = jax.jit(jax.grad(loss))(x0s[0])
    np.testing.assert_allclose(np.asarray(grads[0]), np.asarray(g_single), rtol=1e-10)
