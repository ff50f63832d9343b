"""Solver status and error codes.

Per-lane int32 status carried through batched solves: unlike the
reference's whole-solve abort (ALTRO_THROW, exceptions.hpp:13-20), a
failed lane in a vmapped batch records its code and freezes while other
lanes continue.

Parity: SolveStatus (/root/reference/src/altro/solver/typedefs.hpp:19-27)
and ErrorCodes (/root/reference/src/altro/solver/exceptions.hpp:24-51).
"""

from __future__ import annotations

import enum


class SolveStatus(enum.IntEnum):
    SUCCESS = 0
    UNSOLVED = 1
    MAX_ITERATIONS = 2
    MAX_OBJECTIVE_EXCEEDED = 3
    STATE_OUT_OF_BOUNDS = 4
    INPUT_OUT_OF_BOUNDS = 5
    MERIT_FUN_GRADIENT_TOO_SMALL = 6
    BACKWARD_PASS_FAILED = 7
    LINE_SEARCH_FAILED = 8
    # Beyond the reference enum (typedefs.hpp:19-27): the wall-clock
    # budget (AltroOptions.max_solve_time, declared but never enforced
    # in the reference) is enforced host-side by the ALTROSolver facade.
    MAX_SOLVE_TIME = 9


class ErrorCode(enum.IntEnum):
    NO_ERROR = 0
    STATE_DIM_UNKNOWN = 1
    INPUT_DIM_UNKNOWN = 2
    NEXT_STATE_DIM_UNKNOWN = 3
    DIMENSION_UNKNOWN = 4
    BAD_INDEX = 5
    DIMENSION_MISMATCH = 6
    SOLVER_NOT_INITIALIZED = 7
    SOLVER_ALREADY_INITIALIZED = 8
    NON_POSITIVE = 9
    TIMESTEP_NOT_POSITIVE = 10
    COST_FUN_NOT_SET = 11
    DYNAMICS_FUN_NOT_SET = 12
    INVALID_OPT_AT_TERMINAL_KNOT_POINT = 13
    MAX_CONSTRAINTS_EXCEEDED = 14
    INVALID_CONSTRAINT_DIM = 15
    CHOLESKY_FAILED = 16
    OP_ONLY_VALID_AT_TERMINAL_KNOT_POINT = 17
    INVALID_POINTER = 18
    BACKWARD_PASS_FAILED = 19
    LINE_SEARCH_FAILED = 20
    MERIT_FUNCTION_GRADIENT_TOO_SMALL = 21
    INVALID_BOUND_CONSTRAINT = 22
    NON_POSITIVE_PENALTY = 23
    COST_NOT_QUADRATIC = 24
    FILE_ERROR = 25


class LineSearchCode(enum.IntEnum):
    """Return codes of the strong-Wolfe line search.

    Parity: /root/reference/src/linesearch/linesearch.hpp:16-25.
    """

    NO_ERROR = 0
    MINIMUM_FOUND = 1
    INVALID_POINTER = 2
    NOT_DESCENT_DIRECTION = 3
    WINDOW_TOO_SMALL = 4
    GOT_NONFINITE_STEP_SIZE = 5
    MAX_ITERATIONS = 6
    HIT_MAX_STEPSIZE = 7
    # Beyond the reference enum: the grid search found no Armijo-passing
    # step but returned the best merit-DECREASING trial's payload
    # (SolverOptions.ls_best_decrease_fallback). Treated as a failure for
    # status/recovery accounting; the payload is still usable progress.
    BEST_DECREASE = 8


class AltroError(RuntimeError):
    """Host-side exception raised by the convenience API when asked to."""

    def __init__(self, code: ErrorCode, msg: str = ""):
        super().__init__(f"[{code.name}] {msg}")
        self.code = code
