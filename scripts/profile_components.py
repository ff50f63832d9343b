"""Component-level timing of the batched solve on the current backend.

Times (per batched call, B lanes): AL expansions, Riccati backward pass
(serial scan vs associative scan), one full merit rollout, one whole
warm-started resolve — to see where a resolve's wall-clock goes before
reaching for Pallas kernels.

Usage: ALTRO_PROFILE_PLATFORM=cpu python scripts/profile_components.py
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    if os.environ.get("ALTRO_PROFILE_PLATFORM") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from altro_tpu.io.scotty import load_scotty, synthetic_scotty
    from altro_tpu.options import SolverOptions
    from altro_tpu.parallel.batch import batch_init_state
    from altro_tpu.profiling import time_fn
    from altro_tpu.solver import (
        _expansions_and_cost,
        backward_adaptive,
        merit_function,
        solve,
    )
    from altro_tpu.tvlqr import tvlqr_backward, tvlqr_backward_associative
    from __graft_entry__ import _make_problem

    dtype = jnp.float32
    N = int(os.environ.get("ALTRO_PROFILE_N", "30"))
    B = int(os.environ.get("ALTRO_PROFILE_B", "1024"))
    problem, ref = _make_problem(N, dtype)
    opts = SolverOptions(
        iterations_max=10, use_backtracking_linesearch=True,
        tol_stationarity=1e-3, tol_primal_feasibility=1e-3, throw_errors=False,
    )

    states = batch_init_state(problem, B)
    states = dataclasses.replace(
        states,
        u=jnp.tile(jnp.asarray([ref.u[0][0], 0.0], dtype), (B, N, 1)),
        x=jnp.tile(jnp.asarray(ref.x[: N + 1], dtype), (B, 1, 1)),
    )
    x0s = jnp.asarray(ref.x[0], dtype)[None, :] + 0.01 * jax.random.normal(
        jax.random.PRNGKey(0), (B, 4), dtype
    )

    def expansions(states):
        return jax.vmap(
            lambda x, u, z: _expansions_and_cost(problem, x, u, z, jnp.asarray(1.0, dtype))
        )(states.x, states.u, states.z)

    exp_out = jax.jit(expansions)(states)
    A, Bm, lx, lu, lxx, luu, lux, phi0 = exp_out

    def backward_serial(A, Bm, lxx, luu, lux, lx, lu):
        f0 = jnp.zeros_like(lx[:, : A.shape[1]])
        return jax.vmap(tvlqr_backward)(A, Bm, f0, lxx, luu, lux, lx, lu)

    def backward_assoc(A, Bm, lxx, luu, lux, lx, lu):
        f0 = jnp.zeros_like(lx[:, : A.shape[1]])
        return jax.vmap(tvlqr_backward_associative)(A, Bm, f0, lxx, luu, lux, lx, lu)

    gains = jax.jit(backward_serial)(A, Bm, lxx, luu, lux, lx, lu)

    def merit_once(states, gains):
        return jax.vmap(
            lambda x, u, K, d, P, p, z, x0: merit_function(
                problem, x, u, K, d, P, p, z, jnp.asarray(1.0, dtype),
                jnp.asarray(1.0, dtype), x0, True,
            ).phi
        )(states.x, states.u, gains.K, gains.d, gains.P, gains.p, states.z, x0s)

    def full_resolve(x0, states):
        def one(x0_i, state):
            prob = dataclasses.replace(problem, x0=x0_i)
            return solve(prob, state, opts)

        return jax.vmap(one)(x0, states)

    results = {"B": B, "N": N, "platform": jax.devices()[0].platform}
    results["expansions"] = time_fn(jax.jit(expansions), states, iters=5)["p50_ms"]
    results["backward_serial"] = time_fn(
        jax.jit(backward_serial), A, Bm, lxx, luu, lux, lx, lu, iters=5
    )["p50_ms"]
    results["backward_assoc"] = time_fn(
        jax.jit(backward_assoc), A, Bm, lxx, luu, lux, lx, lu, iters=5
    )["p50_ms"]
    results["merit_rollout"] = time_fn(jax.jit(merit_once), states, gains, iters=5)["p50_ms"]
    results["full_resolve"] = time_fn(jax.jit(full_resolve), x0s, states, iters=5)["p50_ms"]
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
