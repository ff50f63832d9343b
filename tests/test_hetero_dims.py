"""Heterogeneous per-knot dimensions through the public API.

The reference supports per-knot varying state/input dims end to end:
SetDimension over knot ranges (altro_solver.cpp:26-60) feeding the TVLQR
kernel's `const int *nx, const int *nu` (tvlqr.h:15-33). Here the
framework pads internally to (max n, max m) — sliced user callables,
zero-filled padded coordinates, unit input-cost diagonal — so the solver
core keeps static shapes. The oracle: a hetero problem built through the
API must match a HAND-padded fixed-dim problem exactly.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from altro_tpu.api import ALTROSolver, LAST_INDEX
from altro_tpu.status import AltroError, SolveStatus

N = 10
H = 0.1
X_REF_B = [1.0, 0.0, 0.0]


def dyn_a(x, u, hh, k):
    """Phase A (knots 0..3): 1D double integrator, n=2 (p, v), m=1."""
    p, v = x[0], x[1]
    return jnp.stack([p + v * hh + 0.5 * u[0] * hh * hh, v + u[0] * hh])


def dyn_t(x, u, hh, k):
    """Transition knot 4: (2, 1) -> 3 states (adds integral of position)."""
    p, v = x[0], x[1]
    return jnp.stack([p + v * hh + 0.5 * u[0] * hh * hh, v + u[0] * hh, p * hh])


def dyn_b(x, u, hh, k):
    """Phase B (knots 5..9): n=3 (p, v, s), m=2 (force, damper)."""
    p, v, s = x[0], x[1], x[2]
    return jnp.stack(
        [p + v * hh + 0.5 * u[0] * hh * hh, v + (u[0] - u[1] * v) * hh, s + p * hh]
    )


def build_hetero():
    s = ALTROSolver(N)
    s.set_dimension(2, 1, 0, 5)          # knots 0..4
    s.set_dimension(3, 2, 5, N + 1)      # knots 5..N
    s.set_time_step(H)
    s.set_explicit_dynamics(dyn_a, k_start=0, k_stop=4)
    s.set_explicit_dynamics(dyn_t, k_start=4, k_stop=5)
    s.set_explicit_dynamics(dyn_b, k_start=5, k_stop=N)
    s.set_lqr_cost([1.0, 1.0], [0.1], [1.0, 0.0], [0.0], 0, 5)
    s.set_lqr_cost([1.0, 1.0, 0.5], [0.1, 0.1], X_REF_B, [0.0, 0.0], 5, N + 1)
    s.set_input_bounds([-0.6, -0.6], [0.6, 0.6], 5, N)  # knot-sized bounds
    s.set_initial_state([0.0, 0.0])      # knot-0 sized; padded internally
    s.initialize()
    return s


def build_hand_padded():
    """The same problem padded by hand to fixed (n=3, m=2)."""

    def dyn_a_pad(x, u, hh, k):
        xn = dyn_a(x[:2], u[:1], hh, k)
        return jnp.concatenate([xn, jnp.zeros((1,), x.dtype)])

    def dyn_t_pad(x, u, hh, k):
        return dyn_t(x[:2], u[:1], hh, k)

    s = ALTROSolver(N)
    s.set_dimension(3, 2)
    s.set_time_step(H)
    s.set_explicit_dynamics(dyn_a_pad, k_start=0, k_stop=4)
    s.set_explicit_dynamics(dyn_t_pad, k_start=4, k_stop=5)
    s.set_explicit_dynamics(dyn_b, k_start=5, k_stop=N)
    # padded cost: zero state cost on the padded coordinate, UNIT cost on
    # the padded input (what the framework inserts to keep Quu SPD)
    s.set_lqr_cost([1.0, 1.0, 0.0], [0.1, 1.0], [1.0, 0.0, 0.0], [0.0, 0.0], 0, 5)
    s.set_lqr_cost([1.0, 1.0, 0.5], [0.1, 0.1], X_REF_B, [0.0, 0.0], 5, N + 1)
    s.set_input_bounds([-0.6, -0.6], [0.6, 0.6], 5, N)
    s.set_initial_state([0.0, 0.0, 0.0])
    s.initialize()
    return s


def test_hetero_matches_hand_padded():
    sh = build_hetero()
    sp = build_hand_padded()
    st_h = sh.solve()
    st_p = sp.solve()
    assert st_h == SolveStatus.SUCCESS
    assert st_p == SolveStatus.SUCCESS
    assert sh.get_iterations() == sp.get_iterations()
    np.testing.assert_allclose(
        np.asarray(sh.state.x), np.asarray(sp.state.x), atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(sh.state.u), np.asarray(sp.state.u), atol=1e-10
    )


def test_hetero_padded_coords_inert():
    sh = build_hetero()
    sh.solve()
    x = np.asarray(sh.state.x)
    u = np.asarray(sh.state.u)
    # padded state coordinate is zero through phase A (knots 0..4)
    np.testing.assert_allclose(x[:5, 2], 0.0, atol=1e-12)
    # padded input coordinate is zero through phase A (knots 0..3)
    np.testing.assert_allclose(u[:4, 1], 0.0, atol=1e-12)
    # phase B actually uses the extra state/input
    assert np.max(np.abs(x[6:, 2])) > 1e-6
    # input bound active knots stay within bounds
    assert np.all(u[5:, 0] <= 0.6 + 1e-6)


def test_hetero_getters_slice_to_knot_dims():
    sh = build_hetero()
    assert sh.get_state_dim() == 3 and sh.get_input_dim() == 2
    assert sh.get_state_dim(0) == 2 and sh.get_input_dim(0) == 1
    assert sh.get_state_dim(7) == 3 and sh.get_input_dim(7) == 2
    sh.solve()
    assert sh.get_state(0).shape == (2,)
    assert sh.get_input(0).shape == (1,)
    assert sh.get_state(N).shape == (3,)
    assert sh.get_input(7).shape == (2,)


def test_hetero_requires_all_knots_set():
    s = ALTROSolver(N)
    s.set_dimension(2, 1, 0, 5)  # knots 5..N left unset
    s.set_time_step(H)
    s.set_explicit_dynamics(dyn_a)
    s.set_lqr_cost([1.0, 1.0], [0.1], [1.0, 0.0], [0.0])
    s.set_initial_state([0.0, 0.0])
    with pytest.raises(AltroError):
        s.initialize()


def test_homogeneous_path_unchanged():
    """No-hetero problems take the plain path (no wrapping)."""
    s = ALTROSolver(N)
    s.set_dimension(3, 2)
    s.set_time_step(H)
    s.set_explicit_dynamics(dyn_b)
    s.set_lqr_cost([1.0, 1.0, 0.5], [0.1, 0.1], X_REF_B, [0.0, 0.0])
    s.set_initial_state([0.0, 0.0, 0.0])
    s.initialize()
    assert s.solve() == SolveStatus.SUCCESS
