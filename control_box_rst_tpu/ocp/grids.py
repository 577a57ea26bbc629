"""Discretization grids.

Ref parity: the grid family of src/optimal_control/
  - FullDiscretizationGridBase / FiniteDifferencesGrid
    (full_discretization_grid_base.h:39-164, finite_differences_grid.cpp:38)
  - FiniteDifferencesVariableGrid (time-optimal, dt unfixed,
    finite_differences_variable_grid.h:34,71)
  - MultipleShootingGrid / MultipleShootingVariableGrid
    (multiple_shooting_grid.h:34, multiple_shooting_variable_grid.h:34)
  - NonUniformFiniteDifferencesVariableGrid / NonUniformMultipleShooting…
    (non_uniform_*.h) — per-interval dt vertices
  - FiniteDifferencesGridMoveBlocking
    (finite_differences_grid_move_blocking.h:32,59)

TPU-first redesign: a grid is a *static description* of how the trajectory
arrays parameterize the NLP — it owns no vertices. All variants share ONE
canonical stage structure (see ocp/transcribe.py):

  stage variable  w_k = [x_k ; u_k ; dt_k]   (nz = nx+nu+1, always)
  interval rows   c_k(w_k, w_{k+1}) = 0      (defect + tie rows)

  - fixed-dt grids pin the dt component with an equality mask
  - the single-dt time-optimal grid ("TEB-style", uniform) keeps per-stage
    dt variables and adds tie rows  dt_{k+1} - dt_k = 0  — the reference's
    TwoScalarEqualEdge trick (misc_edges.h:40) turned into banded rows
  - non-uniform time-optimal grids leave all dt_k free
  - move blocking ties u_{k+1} = u_k inside each block via the same tie-row
    mechanism (per-stage masks), instead of eliminating u vertices

Because every variant lands in the same block-banded canonical form, one
jitted SQP/ADMM solver covers all of them with no shape changes — grid
switches never trigger recompilation of the solver for a given (N, nx, nu).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from control_box_rst_tpu.utils.tree import pytree_dataclass, static_field


@pytree_dataclass
class Grid:
    """Static grid description (all fields are pytree metadata)."""

    N: int = static_field(default=20)
    kind: str = static_field(default="fd")  # "fd" | "ms"
    fd_scheme: str = static_field(default="crank_nicolson")
    # multiple shooting: integrator for in-interval forward integration
    integrator: str = static_field(default="rk4")
    integrator_substeps: int = static_field(default=1)
    cost_integration: str = static_field(default="left_sum")  # | "trapezoidal"
    dt_mode: str = static_field(default="fixed")  # | "single" | "per_interval"
    # move blocking: tuple of per-interval block ids (len N), controls with
    # equal consecutive ids are tied together; None = no blocking
    u_blocks: Optional[Tuple[int, ...]] = static_field(default=None)

    @property
    def dt_is_variable(self) -> bool:
        return self.dt_mode != "fixed"

    @property
    def has_dt_tie(self) -> bool:
        return self.dt_mode == "single"

    @property
    def has_u_tie(self) -> bool:
        return self.u_blocks is not None

    def u_tie_mask(self, nu: int) -> np.ndarray:
        """[N-1, nu] mask: row k ties u_{k+1} == u_k (inside one block)."""
        N = self.N
        m = np.zeros((max(N - 1, 0), nu), dtype=np.float64)
        if self.u_blocks is not None:
            blocks = np.asarray(self.u_blocks)
            if len(blocks) != N:
                raise ValueError(f"u_blocks must have length N={N}")
            same = blocks[1:] == blocks[:-1]
            m[same, :] = 1.0
        return m


# -- convenience constructors matching the reference grid classes ----------

def finite_differences_grid(N: int, fd_scheme: str = "crank_nicolson",
                            cost_integration: str = "left_sum") -> Grid:
    """Uniform full-discretization grid, fixed dt.
    (ref: FiniteDifferencesGrid, finite_differences_grid.cpp:38)"""
    return Grid(N=N, kind="fd", fd_scheme=fd_scheme,
                cost_integration=cost_integration, dt_mode="fixed")


def hermite_simpson_uncompressed_grid(N: int) -> Grid:
    """Uncompressed Hermite-Simpson collocation: interval midpoint states
    are decision variables with an explicit interpolation constraint, and
    the Simpson cost quadrature evaluates the decision midpoint (ref: the
    uncompressed collocation edges, structured_ocp/edges/
    collocation_edges.h:42-1392). The midpoints are appended to the stage
    vector (w_k = [x;u;dt;xm]) so the interval rows stay 2-point-coupled
    — see TranscribedOCP.n_aux."""
    return Grid(N=N, kind="fd", fd_scheme="hermite_simpson_unc",
                cost_integration="hermite_simpson_unc", dt_mode="fixed")


def finite_differences_variable_grid(N: int, fd_scheme: str = "crank_nicolson",
                                     cost_integration: str = "left_sum") -> Grid:
    """Uniform time-optimal grid: ONE global dt decision variable.
    (ref: FiniteDifferencesVariableGrid, finite_differences_variable_grid.h:34)"""
    return Grid(N=N, kind="fd", fd_scheme=fd_scheme,
                cost_integration=cost_integration, dt_mode="single")


def non_uniform_fd_variable_grid(N: int, fd_scheme: str = "crank_nicolson",
                                 cost_integration: str = "left_sum") -> Grid:
    """Non-uniform time-optimal grid: per-interval dt_k decision variables.
    (ref: NonUniformFiniteDifferencesVariableGrid,
    non_uniform_finite_differences_variable_grid.h:34)"""
    return Grid(N=N, kind="fd", fd_scheme=fd_scheme,
                cost_integration=cost_integration, dt_mode="per_interval")


def multiple_shooting_grid(N: int, integrator: str = "rk4",
                           substeps: int = 1,
                           cost_integration: str = "left_sum") -> Grid:
    """Multiple shooting, fixed dt: defect = solveIVP(x_k,u_k,dt) - x_{k+1}.
    (ref: MultipleShootingGrid, multiple_shooting_grid.cpp:38)"""
    return Grid(N=N, kind="ms", integrator=integrator,
                integrator_substeps=substeps,
                cost_integration=cost_integration, dt_mode="fixed")


def multiple_shooting_variable_grid(N: int, integrator: str = "rk4",
                                    substeps: int = 1,
                                    cost_integration: str = "left_sum") -> Grid:
    """Time-optimal multiple shooting, single dt.
    (ref: MultipleShootingVariableGrid, multiple_shooting_variable_grid.h:34)"""
    return Grid(N=N, kind="ms", integrator=integrator,
                integrator_substeps=substeps,
                cost_integration=cost_integration, dt_mode="single")


def non_uniform_multiple_shooting_variable_grid(
    N: int, integrator: str = "rk4", substeps: int = 1,
    cost_integration: str = "left_sum") -> Grid:
    """Non-uniform time-optimal multiple shooting (per-interval dt).
    (ref: NonUniformMultipleShootingVariableGrid,
    non_uniform_multiple_shooting_variable_grid.h:34)"""
    return Grid(N=N, kind="ms", integrator=integrator,
                integrator_substeps=substeps,
                cost_integration=cost_integration, dt_mode="per_interval")


def move_blocking_grid(N: int, blocks, fd_scheme: str = "crank_nicolson",
                       cost_integration: str = "left_sum") -> Grid:
    """Move-blocking full discretization: `blocks` is either a per-interval
    block-id sequence of length N or a list of block lengths summing to N.
    (ref: FiniteDifferencesGridMoveBlocking,
    finite_differences_grid_move_blocking.h:32,59)"""
    blocks = list(blocks)
    if sum(blocks) == N and all(b >= 1 for b in blocks):
        ids = []
        for i, b in enumerate(blocks):
            ids.extend([i] * b)
        blocks = ids
    if len(blocks) != N:
        raise ValueError("blocks must be length-N ids or lengths summing to N")
    return Grid(N=N, kind="fd", fd_scheme=fd_scheme,
                cost_integration=cost_integration, dt_mode="fixed",
                u_blocks=tuple(int(b) for b in blocks))
