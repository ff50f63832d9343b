"""Rocket soft landing with second-order-cone constraints.

The classic ALTRO-family showcase for conic constraint handling
(the reference implements the SECOND_ORDER_CONE machinery at
/root/reference/src/altro/solver/cones.cpp:13-123 and exercises it on
control-norm bounds in test/double_integrator_test.cpp:377-492; this
example composes THREE simultaneous SOC groups the way the ALTRO papers'
rocket-landing demos do):

  * thrust pointing cone   ||(ux, uy)|| <= tan(theta_max) * uz
  * thrust magnitude ball  ||u|| <= u_max         (+ u_z >= u_min orthant)
  * glide-slope cone       ||(rx, ry)|| <= tan(gamma) * rz

with an exact terminal equality (ZERO cone) pinning touchdown at the pad
with zero velocity. 3-DOF point-mass rocket, scalar-form dynamics
(docs/PERF.md model-form rule), midpoint-discretized.

    python examples/rocket_landing.py                 # single cold solve
    ALTRO_EXAMPLE_B=256 python examples/rocket_landing.py   # + batched
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from altro_tpu.cones import Cone
from altro_tpu.models.integrators import midpoint
from altro_tpu.options import SolverOptions
from altro_tpu.problem import ConstraintSpec, Problem, lqr_cost_from_reference
from altro_tpu.solver import init_state, solve

G = 9.81


def rocket_continuous():
    """3-DOF point mass: x = [rx, ry, rz, vx, vy, vz], u = thrust accel."""

    def f(x, u):
        vx, vy, vz = x[3], x[4], x[5]
        return jnp.stack([vx, vy, vz, u[0], u[1], u[2] - G])

    return f


def build_problem(N=60, tf=6.0, dtype=jnp.float64,
                  theta_max_deg=25.0, gamma_deg=45.0, u_max=20.0, u_min=2.0):
    n, m = 6, 3
    h = tf / N
    x0 = jnp.asarray([20.0, -10.0, 50.0, 1.0, 2.0, -8.0], dtype)
    xf = jnp.zeros(n, dtype)
    hover = jnp.asarray([0.0, 0.0, G], dtype)

    Qd = np.tile(np.concatenate([np.full(3, 1e-2), np.full(3, 1e-1)]), (N + 1, 1))
    Qd[N] *= 10.0
    cost = lqr_cost_from_reference(
        jnp.asarray(Qd, dtype), jnp.full((N + 1, m), 1e-1, dtype),
        jnp.tile(xf, (N + 1, 1)), jnp.tile(hover, (N + 1, 1)),
    )

    tan_th = float(np.tan(np.deg2rad(theta_max_deg)))
    tan_ga = float(np.tan(np.deg2rad(gamma_deg)))
    input_active = jnp.ones(N + 1, bool).at[N].set(False)
    all_active = jnp.ones(N + 1, bool)
    term_only = jnp.zeros(N + 1, bool).at[N].set(True)

    constraints = (
        # ||(ux, uy)|| <= tan(theta) uz — SOC membership is
        # ||c[:-1]|| <= c[-1] (cones.py / reference cones.cpp:13-38)
        ConstraintSpec(
            fn=lambda x, u, k: jnp.stack([u[0], u[1], tan_th * u[2]]),
            cone=Cone.SECOND_ORDER, dim=3, active=input_active,
            label="thrust pointing cone",
        ),
        # ||u|| <= u_max (SOC ball: last entry constant)
        ConstraintSpec(
            fn=lambda x, u, k: jnp.stack(
                [u[0], u[1], u[2], jnp.asarray(u_max, u.dtype)]),
            cone=Cone.SECOND_ORDER, dim=4, active=input_active,
            label="max thrust",
        ),
        # u_min - uz <= 0 (negative orthant)
        ConstraintSpec(
            fn=lambda x, u, k: jnp.stack([u_min - u[2]]),
            cone=Cone.NEGATIVE_ORTHANT, dim=1, active=input_active,
            label="min thrust",
        ),
        # ||(rx, ry)|| <= tan(gamma) rz (glide slope, stage knots; the
        # terminal knot sits exactly on the cone vertex and is pinned by
        # the equality below)
        ConstraintSpec(
            fn=lambda x, u, k: jnp.stack([x[0], x[1], tan_ga * x[2]]),
            cone=Cone.SECOND_ORDER, dim=3, active=all_active,
            label="glide slope",
        ),
        # touchdown: x_N = 0 exactly
        ConstraintSpec(
            fn=lambda x, u, k: x - xf, cone=Cone.ZERO, dim=n,
            active=term_only, label="touchdown",
        ),
    )
    problem = Problem(
        N=N, n=n, m=m, dynamics=midpoint(rocket_continuous()), dynamics_jac=None,
        constraints=constraints, cost=cost,
        h=jnp.full(N, h, dtype), x0=x0,
    )
    return problem, hover


def main():
    # Decide the platform BEFORE the first jax call: jax_enable_x64 set
    # after backend init is silently ignored (arrays stay f32 and the
    # 1e-4 tolerances become unreachable).
    from bench import pick_platform

    on_tpu = pick_platform() != "cpu"
    if not on_tpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)  # real f64 on CPU
    dtype = jnp.float32 if on_tpu else jnp.float64
    tol = 1e-3 if on_tpu else 1e-4  # reference default (solver_options.hpp:19-22)

    problem, hover = build_problem(dtype=dtype)
    # Relative KKT stationarity: the rocket's cost gradients are O(1e3)
    # (100 m positions, 10^1..10^2 N thrusts), so the reference's absolute
    # 1e-4 stationarity is unreachable at this problem scale in ANY
    # precision — the solve converges (touchdown ~1e-7) and then the line
    # search correctly reports no further progress. Scale-invariant
    # stationarity reports that as SUCCESS.
    opts = SolverOptions(
        iterations_max=120, penalty_initial=10.0, penalty_scaling=10.0,
        tol_stationarity=tol, tol_primal_feasibility=tol,
        tol_stationarity_rel=1e-5,
        use_backtracking_linesearch=True, throw_errors=False,
    )
    import dataclasses

    state = init_state(problem)
    state = dataclasses.replace(
        state, u=jnp.tile(hover, (problem.N, 1)))

    t0 = time.perf_counter()
    new_state, stats = jax.block_until_ready(
        jax.jit(lambda s: solve(problem, s, opts))(state))
    dt = time.perf_counter() - t0

    xN = np.asarray(new_state.x[problem.N])
    u = np.asarray(new_state.u)
    tan_th = np.tan(np.deg2rad(25.0))
    print(f"status={int(stats.status)}  iters={int(stats.iterations)}  "
          f"feas={float(stats.primal_feasibility):.2e}  ({dt*1e3:.0f} ms incl. compile)")
    print(f"touchdown |r|={np.linalg.norm(xN[:3]):.2e} m  |v|={np.linalg.norm(xN[3:]):.2e} m/s")
    print(f"max ||u||={np.linalg.norm(u, axis=1).max():.2f} (<= 20)  "
          f"max pointing ratio={np.max(np.linalg.norm(u[:, :2], axis=1) / (tan_th * u[:, 2])):.3f} (<= 1)")

    B = int(os.environ.get("ALTRO_EXAMPLE_B", "0"))
    if B:
        from altro_tpu.parallel.batch import batch_init_state

        kr, kv = jax.random.split(jax.random.PRNGKey(0))
        x0s = problem.x0[None, :] + jnp.concatenate(
            [2.0 * jax.random.normal(kr, (B, 3), dtype),
             0.5 * jax.random.normal(kv, (B, 3), dtype)], axis=1)
        states = batch_init_state(problem, B)
        states = dataclasses.replace(
            states, u=jnp.tile(hover, (B, problem.N, 1)))

        @jax.jit
        def batch_solve(x0s, states):
            return jax.vmap(lambda x0, s: solve(
                dataclasses.replace(problem, x0=x0), s, opts))(x0s, states)

        out = jax.block_until_ready(batch_solve(x0s, states))
        t0 = time.perf_counter()
        _, bstats = jax.block_until_ready(batch_solve(x0s, states))
        dt = time.perf_counter() - t0
        print(f"batched cold solves: B={B}  {B/dt:.0f} solves/s  "
              f"success={float(jnp.mean(bstats.status == 0)):.3f}  "
              f"mean iters={float(jnp.mean(bstats.iterations)):.1f}")


if __name__ == "__main__":
    main()
