"""Time-varying LQR: Riccati backward pass and affine closed-loop rollout.

TPU-native redesign of the reference TVLQR kernel
(/root/reference/src/tvlqr/tvlqr.cpp:65-248). The reference iterates a
serial C loop over arrays-of-pointers per knot point; here the problem
data are struct-of-arrays `[N, ...]` stacks and the recurrences are
`lax.scan`s, so the whole pass is one fused XLA computation that batches
trivially under `vmap` (the batched-MPC axis) and shards over a device
mesh. Inputs of any floating dtype are supported; f64 is used by the
correctness suite, f32 by the performance configuration.

Failure semantics: instead of aborting with the failing knot index
(tvlqr.cpp:162-164), the backward pass records per-lane `ok` and
`fail_index` and returns well-defined (zero-gain) output at failed knots,
so a diverged lane cannot poison a batch; the solver wraps this with an
adaptive regularization retry loop (the reference's unused `reg` hook,
solver.cpp:363, made real).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["TVLQRGains", "tvlqr_backward", "tvlqr_forward"]


class TVLQRGains(NamedTuple):
    K: jnp.ndarray  # [N, m, n] feedback gains
    d: jnp.ndarray  # [N, m] feedforward
    P: jnp.ndarray  # [N+1, n, n] cost-to-go Hessian
    p: jnp.ndarray  # [N+1, n] cost-to-go gradient
    delta_V: jnp.ndarray  # [2] expected decrease (d.Qu, 0.5 d.Quu d) sums
    ok: jnp.ndarray  # [] bool: all Cholesky factorizations succeeded
    fail_index: jnp.ndarray  # [] int32: smallest failing knot index, N if ok


def _psd_solve(chol, rhs):
    """Solve (L L^T) X = rhs given lower-triangular L."""
    y = jax.scipy.linalg.solve_triangular(chol, rhs, lower=True)
    return jax.scipy.linalg.solve_triangular(chol.T, y, lower=False)


def tvlqr_backward(A, B, f, lxx, luu, lux, lx, lu, reg=0.0) -> TVLQRGains:
    """Riccati backward pass.

    Args:
      A: [N, n, n] dynamics state Jacobians.
      B: [N, n, m] dynamics input Jacobians.
      f: [N, n] affine terms of the dynamics expansion (zero for a
         defect-free iLQR expansion; the affine dynamics term for TVLQR).
      lxx: [N+1, n, n] cost Hessian wrt state (row N = terminal).
      luu: [N, m, m], lux: [N, m, n]: input / cross cost Hessians.
      lx: [N+1, n], lu: [N, m]: cost gradients.
      reg: scalar added to the Quu diagonal before factorization.

    Returns:
      TVLQRGains. Action-value recursion matches
      /root/reference/src/tvlqr/tvlqr.cpp:124-191:
        Qxx = lxx + A'P⁺A;  Quu = luu + B'P⁺B;  Qux = lux + B'P⁺A
        Qx  = lx + A'(P⁺f + p⁺);  Qu = lu + B'(P⁺f + p⁺)
        K   = (Quu+reg I)⁻¹ Qux;  d = -(Quu+reg I)⁻¹ Qu
        P   = Qxx + K'QuuK - K'Qux - Qux'K
        p   = Qx - K'Quu d - K'Qu + Qux'd
        ΔV += (d·Qu, ½ d·Quu d)
    """
    N = A.shape[0]
    n = A.shape[1]
    m = B.shape[2]
    dtype = A.dtype
    reg = jnp.asarray(reg, dtype)

    P_term = lxx[N]
    p_term = lx[N]

    def step(carry, inputs):
        P_next, p_next = carry
        A_k, B_k, f_k, lxx_k, luu_k, lux_k, lx_k, lu_k = inputs

        AtP = A_k.T @ P_next
        BtP = B_k.T @ P_next
        Qxx = lxx_k + AtP @ A_k
        Quu = luu_k + BtP @ B_k
        Qux = lux_k + BtP @ A_k
        t = P_next @ f_k + p_next
        Qx = lx_k + A_k.T @ t
        Qu = lu_k + B_k.T @ t

        Quu_reg = Quu + reg * jnp.eye(m, dtype=dtype)
        chol = jnp.linalg.cholesky(Quu_reg)
        ok_k = jnp.all(jnp.isfinite(chol))
        chol_safe = jnp.where(ok_k, chol, jnp.eye(m, dtype=dtype))

        K_k = _psd_solve(chol_safe, Qux)
        d_k = _psd_solve(chol_safe, -Qu)
        K_k = jnp.where(ok_k, K_k, 0.0)
        d_k = jnp.where(ok_k, d_k, 0.0)

        QuuK = Quu @ K_k
        KtQux = K_k.T @ Qux
        P_k = Qxx + QuuK.T @ K_k - KtQux - KtQux.T
        p_k = Qx - QuuK.T @ d_k - K_k.T @ Qu + Qux.T @ d_k

        dV_k = jnp.stack([jnp.dot(d_k, Qu), 0.5 * jnp.dot(d_k, Quu @ d_k)])
        return (P_k, p_k), (K_k, d_k, P_k, p_k, dV_k, ok_k)

    inputs = (A, B, f, lxx[:N], luu, lux, lx[:N], lu)
    (_, _), (K, d, P_stack, p_stack, dV_all, ok_all) = jax.lax.scan(
        step, (P_term, p_term), inputs, reverse=True
    )

    P = jnp.concatenate([P_stack, P_term[None]], axis=0)
    p = jnp.concatenate([p_stack, p_term[None]], axis=0)
    delta_V = jnp.sum(dV_all, axis=0)
    ok = jnp.all(ok_all)
    fail_index = jnp.where(
        ok_all, jnp.asarray(N, jnp.int32), jnp.arange(N, dtype=jnp.int32)
    )
    return TVLQRGains(K, d, P, p, delta_V, ok, jnp.min(fail_index))


def tvlqr_forward(A, B, f, K, d, P, p, x0):
    """Affine closed-loop rollout of the LINEARIZED dynamics.

    u_k = d_k - K_k x_k;  x_{k+1} = A_k x_k + B_k u_k + f_k;
    y_k = P_k x_k + p_k (TVLQR dual estimate).

    Parity: /root/reference/src/tvlqr/tvlqr.cpp:197-248.

    Returns (x: [N+1, n], u: [N, m], y: [N+1, n]).
    """
    N = A.shape[0]

    def step(x_k, inputs):
        A_k, B_k, f_k, K_k, d_k, P_k, p_k = inputs
        u_k = d_k - K_k @ x_k
        y_k = P_k @ x_k + p_k
        x_next = A_k @ x_k + B_k @ u_k + f_k
        return x_next, (x_k, u_k, y_k)

    x_N, (x_stack, u, y_stack) = jax.lax.scan(
        step, x0, (A, B, f, K, d, P[:N], p[:N])
    )
    x = jnp.concatenate([x_stack, x_N[None]], axis=0)
    y = jnp.concatenate([y_stack, (P[N] @ x_N + p[N])[None]], axis=0)
    return x, u, y
