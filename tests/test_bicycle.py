"""Kinematic bicycle tests: dynamics goldens, 90-degree turn, Scotty-path
tracking, and the 200-step warm-started receding-horizon MPC loop.

Oracles from /root/reference/test/bicycle_test.cpp and the reference's
scotty_mpc.json regression artifact (median 1 iteration per warm-started
resolve, mean tracking error ~0.48 over the Scotty path).
"""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from altro_tpu.cones import Cone
from altro_tpu.io.scotty import load_scotty
from altro_tpu.models.bicycle import bicycle_continuous
from altro_tpu.models.integrators import midpoint
from altro_tpu.mpc import set_initial_state, shift_trajectory, update_linear_costs
from altro_tpu.options import SolverOptions
from altro_tpu.problem import ConstraintSpec, Problem, lqr_cost_from_reference
from altro_tpu.solver import init_state, solve
from altro_tpu.status import SolveStatus


def f32(x):
    return float(np.float32(x))


def test_dynamics_golden():
    """bicycle_test.cpp:27-51 (CoG frame)."""
    f = bicycle_continuous()
    x = jnp.asarray([1.0, 0.5, 15 * np.pi / 180.0, -5 * np.pi / 180.0])
    u = jnp.asarray([1.1, 0.2])
    xdot = f(x, u)
    np.testing.assert_allclose(
        xdot,
        [1.0750584102061864, 0.23291503739549996, -0.03560171424038893, 0.2],
        atol=1e-10,
    )
    Jx = jax.jacfwd(f, argnums=0)(x, u)
    Ju = jax.jacfwd(f, argnums=1)(x, u)
    J = np.hstack([np.asarray(Jx), np.asarray(Ju)])
    J_expected = np.array(
        [
            [-0.0, -0.0, -0.23291503739549996, -0.1290938153359409, 0.9773258274601694, 0.0],
            [0.0, 0.0, 1.0750584102061864, 0.5958541510862063, 0.21174094308681812, 0.0],
            [0.0, 0.0, 0.0, 0.409087550891862, -0.03236519476398994, -0.0],
            [0.0, 0.0, 0.0, 0.0, 0.0, 1.0],
        ]
    )
    np.testing.assert_allclose(J, J_expected, atol=1e-6)


def test_unconstrained_turn90():
    """bicycle_test.cpp:53-138: 90-degree turn with backtracking LS."""
    n, m, N = 4, 2, 30
    h = f32(3.0 / N)
    xf = np.array([1.0, 2.0, np.pi / 2, 0.0])
    Qd = np.concatenate([np.full((N, n), 1e-2), np.full((1, n), 1e1)])
    Rd = np.full((N + 1, m), 1e-3)
    cost = lqr_cost_from_reference(Qd, Rd, np.tile(xf, (N + 1, 1)), np.zeros((N + 1, m)))
    problem = Problem(
        N=N, n=n, m=m, dynamics=midpoint(bicycle_continuous()), dynamics_jac=None,
        constraints=(), cost=cost, h=jnp.full(N, h), x0=jnp.zeros(n),
    )
    state = init_state(problem)
    state = dataclasses.replace(state, u=jnp.tile(jnp.asarray([0.5, 0.0]), (N, 1)))
    opts = SolverOptions(iterations_max=30, use_backtracking_linesearch=True)
    state, stats = solve(problem, state, opts)
    assert float(jnp.linalg.norm(state.x[-1] - jnp.asarray(xf))) < 1e-2


def scotty_or_skip():
    try:
        return load_scotty()
    except FileNotFoundError:
        pytest.skip("scotty.json reference fixture unavailable")


def make_scotty_problem(ref, N=30):
    """bicycle_test.cpp:140-245: tracking cost over the first window,
    steering-angle bounds at every knot."""
    n, m = 4, 2
    h = f32(ref.tf / ref.N)
    Qd = np.full((N + 1, n), 1e-2)
    Rd = np.full((N + 1, m), 1e-3)
    cost = lqr_cost_from_reference(Qd, Rd, ref.x[: N + 1], ref.u[: N + 1])
    delta_max = 60 * np.pi / 180.0
    steering = ConstraintSpec(
        fn=lambda x, u, k: jnp.stack([x[3] - delta_max, -delta_max - x[3]]),
        cone=Cone.NEGATIVE_ORTHANT, dim=2, active=jnp.ones(N + 1, bool),
        label="steering bound",
    )
    problem = Problem(
        N=N, n=n, m=m, dynamics=midpoint(bicycle_continuous()), dynamics_jac=None,
        constraints=(steering,), cost=cost, h=jnp.full(N, h),
        x0=jnp.asarray(ref.x[0]),
    )
    state = init_state(problem)
    u0 = jnp.asarray([ref.u[0][0], 0.0])
    state = dataclasses.replace(
        state, u=jnp.tile(u0, (N, 1)), x=jnp.asarray(ref.x[: N + 1])
    )
    return problem, state, u0


def test_scotty_tracking_single_solve():
    """bicycle_test.cpp:247-264."""
    ref = scotty_or_skip()
    problem, state, u0 = make_scotty_problem(ref)
    state, stats = solve(problem, state, SolverOptions(iterations_max=80))
    assert int(stats.status) == SolveStatus.SUCCESS


def test_scotty_mpc_closed_loop():
    """bicycle_test.cpp:266-360: 200 warm-started resolves with sliding
    reference, measured-state updates, and trajectory shifting."""
    ref = scotty_or_skip()
    N, n, m = 30, 4, 2
    Nsim = 200
    h = f32(ref.tf / ref.N)
    problem, state, u0 = make_scotty_problem(ref, N)
    opts = SolverOptions(iterations_max=80, use_backtracking_linesearch=True)
    solve_jit = jax.jit(solve, static_argnames=("opts",))
    dyn = midpoint(bicycle_continuous())

    Qd = np.full(n, 1e-2)
    Rd = np.full(m, 1e-3)
    c_u = 0.5 * float(u0 @ (jnp.asarray(Rd) * u0))

    x_sim = [np.asarray(ref.x[0])]
    iters, errs, statuses = [], [], []
    for t in range(Nsim):
        state, stats = solve_jit(problem, state, opts)
        statuses.append(int(stats.status))
        iters.append(int(stats.iterations))
        u_now = np.asarray(state.u[0])
        x_next = np.asarray(dyn(jnp.asarray(x_sim[-1]), jnp.asarray(u_now), h, 0))
        x_sim.append(x_next)
        errs.append(np.linalg.norm(x_next - ref.x[t + 1]))

        # Slide the tracking reference (q, c only — bicycle_test.cpp:320-330)
        window = ref.x[t + 1 : t + N + 2]
        q_new = -(Qd[None, :] * window)
        c_new = 0.5 * np.sum(Qd[None, :] * window * window, axis=1)
        c_new[:N] += c_u
        problem = update_linear_costs(problem, q=q_new, c=c_new)
        problem = set_initial_state(problem, x_next)
        state = shift_trajectory(state)

    iters = np.asarray(iters)
    errs = np.asarray(errs)
    assert all(s == SolveStatus.SUCCESS for s in statuses)

    # Pin the reference's regression artifact (written by
    # bicycle_test.cpp:344-359): the per-resolve iteration counts must be
    # IDENTICAL tick by tick, and the closed-loop tracking errors must
    # match to f64 cross-implementation tolerance. This is the strongest
    # cross-implementation oracle in the suite: 200 warm-started
    # constrained resolves reproducing the C++ solver's exact iteration
    # trace end-to-end.
    art = None
    vendored = os.path.join(
        os.path.dirname(__file__), "..", "data", "scotty_mpc.npz"
    )
    if os.path.exists(vendored):
        # in-repo vendored artifact (scripts/vendor_scotty.py) — the
        # strict branch no longer depends on the reference tree
        art = {k: v.tolist() if v.ndim else v.item()
               for k, v in np.load(vendored).items()}
    else:
        ref_path = "/root/reference/test/scotty_mpc.json"
        if os.path.exists(ref_path):
            with open(ref_path) as fh:
                art = json.load(fh)
    if art is not None:
        assert iters.tolist() == art["solve_iters"], (
            "per-resolve iteration trace diverged from the reference artifact"
        )
        te = np.asarray(art["tracking_error"])
        assert abs(errs[0] - 1.2289032472929445e-3) < 1e-9 * 1.23e-3
        np.testing.assert_allclose(errs, te, atol=1e-5)
    else:  # artifact unavailable: keep the behavioral envelope
        assert np.median(iters) <= 2
        assert errs.mean() < 0.7
        assert errs[0] < 5e-3


def test_vendored_scotty_matches_reference():
    """Cross-check: the vendored data/*.npz fixtures must be numerically
    identical to the reference JSONs when the reference tree is mounted
    (scripts/vendor_scotty.py provenance guard)."""
    here = os.path.dirname(__file__)
    checked = 0
    for name in ("scotty", "scotty_mpc"):
        ref_path = f"/root/reference/test/{name}.json"
        npz_path = os.path.join(here, "..", "data", f"{name}.npz")
        if not (os.path.exists(ref_path) and os.path.exists(npz_path)):
            continue
        with open(ref_path) as fh:
            ref = json.load(fh)
        vend = np.load(npz_path)
        assert sorted(vend.files) == sorted(ref.keys())
        for k in ref:
            np.testing.assert_array_equal(
                vend[k], np.asarray(ref[k]), err_msg=f"{name}.npz[{k}]"
            )
        checked += 1
    if checked == 0:
        pytest.skip("reference tree not mounted; nothing to cross-check")
