"""Stage and terminal constraint functions.

Ref parity:
  - StageEqualityConstraint / StageInequalityConstraint protocols
    (ref: functions/stage_functions.h:276,294)
  - TerminalBall / TerminalBallInheritFromCost / TerminalEqualityConstraint /
    TerminalPartialEqualityConstraint
    (ref: functions/final_state_constraints.h:38,98,130,198)

Convention: inequality constraints are g(·) ≤ 0 (elementwise); equalities are
h(·) = 0. Constraint dimensions are static so batched stage evaluation has
fixed shapes. Box bounds do NOT live here — they are first-class in
ocp/problem.py Bounds and handled as projections in the QP (far cheaper than
general rows).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from control_box_rst_tpu.utils.tree import pytree_dataclass, static_field


@pytree_dataclass
class StageConstraint:
    """Base: no constraints. Subclasses override and set dims static."""

    neq: int = static_field(default=0)
    nineq: int = static_field(default=0)

    def eq(self, x, u, dt, xref, uref):
        return jnp.zeros((self.neq,))

    def ineq(self, x, u, dt, xref, uref):
        return jnp.zeros((self.nineq,))


@pytree_dataclass
class FunctionalStageConstraint(StageConstraint):
    """Wrap user lambdas g(x,u)≤0 / h(x,u)=0 (analogue of generic lambda
    edges, ref generic_edge.h:68)."""

    eq_fn: callable = static_field(default=None)
    ineq_fn: callable = static_field(default=None)

    def eq(self, x, u, dt, xref, uref):
        if self.eq_fn is None:
            return jnp.zeros((self.neq,))
        return jnp.atleast_1d(self.eq_fn(x, u))

    def ineq(self, x, u, dt, xref, uref):
        if self.ineq_fn is None:
            return jnp.zeros((self.nineq,))
        return jnp.atleast_1d(self.ineq_fn(x, u))


@pytree_dataclass
class TerminalConstraint:
    """Base terminal constraint: h(x_N)=0 (neq) and g(x_N)≤0 (nineq)."""

    neq: int = static_field(default=0)
    nineq: int = static_field(default=0)

    def eq(self, x, xref):
        return jnp.zeros((self.neq,))

    def ineq(self, x, xref):
        return jnp.zeros((self.nineq,))


@pytree_dataclass
class TerminalBall(TerminalConstraint):
    """Terminal region ‖x_N - xref‖²_S ≤ γ  →  g = (dx'S dx) - γ ≤ 0.
    (ref: final_state_constraints.h:38 TerminalBall; :98 InheritFromCost
    uses S = Qf of the terminal cost — construct with that Qf.)"""

    nineq: int = static_field(default=1)
    S: jax.Array = None
    gamma: jax.Array = 1.0

    def ineq(self, x, xref):
        dx = x - xref
        return jnp.atleast_1d(dx @ self.S @ dx - self.gamma)


def terminal_ball_from_cost(final_cost, gamma) -> TerminalBall:
    """TerminalBallInheritFromCost (ref final_state_constraints.h:98)."""
    return TerminalBall(S=final_cost.Qf, gamma=gamma)


@pytree_dataclass
class TerminalEquality(TerminalConstraint):
    """x_N = xref exactly. (ref: final_state_constraints.h:130)
    Note: grids can express this more efficiently via BoundaryConditions.
    xf_fixed masks (no QP rows needed); this class exists for parity and for
    use as a general equality row."""

    neq: int = static_field(default=0)  # set to nx at construction

    def eq(self, x, xref):
        return x - xref


def terminal_equality(nx: int) -> TerminalEquality:
    return TerminalEquality(neq=nx)


@pytree_dataclass
class TerminalPartialEquality(TerminalConstraint):
    """Selected components of x_N pinned to xref (mask static).
    (ref: final_state_constraints.h:198)"""

    neq: int = static_field(default=0)
    mask: tuple = static_field(default=())  # indices of pinned components

    def eq(self, x, xref):
        idx = jnp.asarray(self.mask, dtype=jnp.int32)
        return x[idx] - xref[idx]


def terminal_partial_equality(indices) -> TerminalPartialEquality:
    indices = tuple(int(i) for i in indices)
    return TerminalPartialEquality(neq=len(indices), mask=indices)
