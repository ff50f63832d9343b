"""ctypes bindings for the native full AL-iLQR solver
(native/altro_solver_native.cpp) — the embedded/host single-solve engine.

Dynamics/constraint callbacks cross the C ABI as CFUNCTYPE thunks, so
Python callables (including numpy-based models) drive the native solver
directly in tests; embedded deployments link C callbacks instead.
"""

from __future__ import annotations

import ctypes
from typing import Callable, NamedTuple, Optional, Sequence

import numpy as np

from altro_tpu import native as _base
from altro_tpu.cones import Cone

__all__ = ["NativeConstraint", "NativeStats", "solve_native"]

_DYN_FN = ctypes.CFUNCTYPE(None, ctypes.POINTER(ctypes.c_double),
                           ctypes.POINTER(ctypes.c_double),
                           ctypes.POINTER(ctypes.c_double),
                           ctypes.c_double, ctypes.c_int, ctypes.c_void_p)
_CON_FN = ctypes.CFUNCTYPE(None, ctypes.POINTER(ctypes.c_double),
                           ctypes.POINTER(ctypes.c_double),
                           ctypes.POINTER(ctypes.c_double),
                           ctypes.c_int, ctypes.c_void_p)

_CONE_MAP = {
    Cone.ZERO: 0,
    Cone.IDENTITY: 1,
    Cone.NEGATIVE_ORTHANT: 2,
    Cone.SECOND_ORDER: 3,
}


class _CConstraint(ctypes.Structure):
    _fields_ = [
        ("cone", ctypes.c_int),
        ("dim", ctypes.c_int),
        ("fn", _CON_FN),
        ("jac", _CON_FN),
        ("active", ctypes.POINTER(ctypes.c_ubyte)),
    ]


class _COptions(ctypes.Structure):
    _fields_ = [
        ("iterations_max", ctypes.c_int),
        ("tol_stationarity", ctypes.c_double),
        ("tol_feasibility", ctypes.c_double),
        ("tol_merit_grad", ctypes.c_double),
        ("penalty_initial", ctypes.c_double),
        ("penalty_scaling", ctypes.c_double),
        ("penalty_max", ctypes.c_double),
        ("use_backtracking", ctypes.c_int),
        ("ls_c1", ctypes.c_double),
        ("ls_c2", ctypes.c_double),
    ]


class _CStats(ctypes.Structure):
    _fields_ = [
        ("status", ctypes.c_int),
        ("iterations", ctypes.c_int),
        ("stationarity", ctypes.c_double),
        ("feasibility", ctypes.c_double),
        ("objective", ctypes.c_double),
    ]


class NativeConstraint(NamedTuple):
    fn: Callable  # fn(x: np.ndarray, u: np.ndarray, k) -> np.ndarray [dim]
    jac: Callable  # jac(x, u, k) -> np.ndarray [dim, n+m]
    cone: Cone
    dim: int
    active: np.ndarray  # [N+1] bool


class NativeStats(NamedTuple):
    status: int
    iterations: int
    stationarity: float
    feasibility: float
    objective: float


def solve_native(
    n: int, m: int, N: int,
    dynamics: Callable,  # dynamics(x, u, h, k) -> np.ndarray [n]
    jacobian: Callable,  # jacobian(x, u, h, k) -> np.ndarray [n, n+m]
    Qd, Rd, q, r, c,     # stacked diagonal cost arrays, [N+1, ...]
    h, x0,
    constraints: Sequence[NativeConstraint] = (),
    u_init: Optional[np.ndarray] = None,
    **options,
):
    """Run the native single-solve AL-iLQR engine. Returns (x, u, stats)."""
    lib = _base.load()
    lib.altro_solve_native.restype = ctypes.c_int

    Qd = np.ascontiguousarray(Qd, np.float64)
    Rd = np.ascontiguousarray(Rd, np.float64)
    q = np.ascontiguousarray(q, np.float64)
    r = np.ascontiguousarray(r, np.float64)
    c = np.ascontiguousarray(c, np.float64)
    h = np.ascontiguousarray(h, np.float64)
    x0 = np.ascontiguousarray(x0, np.float64)
    x = np.zeros((N + 1, n))
    u = np.ascontiguousarray(
        np.zeros((N, m)) if u_init is None else np.asarray(u_init, np.float64)
    ).copy()

    def dyn_thunk(xn_p, x_p, u_p, hh, k, _ud):
        xv = np.ctypeslib.as_array(x_p, (n,))
        uv = np.ctypeslib.as_array(u_p, (m,))
        out = np.asarray(dynamics(xv, uv, hh, k), np.float64)
        np.ctypeslib.as_array(xn_p, (n,))[:] = out

    def jac_thunk(J_p, x_p, u_p, hh, k, _ud):
        xv = np.ctypeslib.as_array(x_p, (n,))
        uv = np.ctypeslib.as_array(u_p, (m,))
        out = np.asarray(jacobian(xv, uv, hh, k), np.float64)
        np.ctypeslib.as_array(J_p, (n * (n + m),))[:] = out.ravel()

    cb_keepalive = [_DYN_FN(dyn_thunk), _DYN_FN(jac_thunk)]
    c_cons = (_CConstraint * max(len(constraints), 1))()
    active_keepalive = []
    for i, spec in enumerate(constraints):
        p = spec.dim

        def make_fn(f, out_size):
            def thunk(c_p, x_p, u_p, k, _ud):
                xv = np.ctypeslib.as_array(x_p, (n,))
                uv = np.ctypeslib.as_array(u_p, (m,))
                np.ctypeslib.as_array(c_p, (out_size,))[:] = np.asarray(
                    f(xv, uv, k), np.float64
                ).ravel()
            return _CON_FN(thunk)

        fn_c = make_fn(spec.fn, p)
        jac_c = make_fn(spec.jac, p * (n + m))
        act = np.ascontiguousarray(np.asarray(spec.active, bool), np.uint8)
        cb_keepalive += [fn_c, jac_c]
        active_keepalive.append(act)
        c_cons[i] = _CConstraint(
            _CONE_MAP[spec.cone], p, fn_c, jac_c,
            act.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        )

    copts = _COptions(
        options.get("iterations_max", 200),
        options.get("tol_stationarity", 1e-4),
        options.get("tol_feasibility", 1e-4),
        options.get("tol_merit_grad", 1e-8),
        options.get("penalty_initial", 1.0),
        options.get("penalty_scaling", 10.0),
        options.get("penalty_max", 1e8),
        1 if options.get("use_backtracking", False) else 0,
        options.get("ls_c1", 1e-4),
        options.get("ls_c2", 0.9),
    )
    cstats = _CStats()
    dp = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    lib.altro_solve_native(
        n, m, N, cb_keepalive[0], cb_keepalive[1], None,
        dp(Qd), dp(Rd), dp(q), dp(r), dp(c), dp(h), dp(x0),
        c_cons, len(constraints), ctypes.byref(copts),
        dp(x), dp(u), ctypes.byref(cstats),
    )
    stats = NativeStats(cstats.status, cstats.iterations, cstats.stationarity,
                        cstats.feasibility, cstats.objective)
    return x, u, stats
