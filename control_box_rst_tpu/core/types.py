"""Core enums and status codes.

Ref parity: `SolverStatus` mirrors corbo's solver status
(ref: src/optimization/include/corbo-optimization/types.h — enum
{Converged, EarlyTerminated, Infeasible, Error}) but is an int32 code so it
survives `jit`/`vmap`: each lane of a batched solve carries its own status.
"""
from __future__ import annotations

import enum


class SolverStatus(enum.IntEnum):
    """Per-solve outcome. Stored as int32 inside jitted solver states."""

    ERROR = 0
    CONVERGED = 1
    EARLY_TERMINATED = 2   # iteration budget exhausted before tolerance met
    INFEASIBLE = 3         # constraint violation not decreasing / diverged


class ControllerStatus(enum.IntEnum):
    """Ref parity: corbo ControllerInterface step() bool + statistics
    (ref: src/controllers/include/corbo-controllers/controller_interface.h:58)."""

    OK = 1
    FAILED = 0
