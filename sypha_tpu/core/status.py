"""Termination statuses.

IpmStatus mirrors the reference's SolverTerminationStatus
(src/sypha_solver_sparse.h:13-20); MilpStatus mirrors the library API's
ResultStatus (include/sypha/sypha.h:44-51).
"""

import enum


class IpmStatus(enum.IntEnum):
    RUNNING = 0
    CONVERGED = 1
    MAX_ITER = 2
    GAP_STALLED = 3
    INFEASIBLE_OR_NUMERICAL = 4
    TIME_LIMIT = 5


class MilpStatus(enum.IntEnum):
    OPTIMAL = 0
    FEASIBLE = 1
    INFEASIBLE = 2
    NOT_SOLVED = 3
    ABNORMAL = 4
