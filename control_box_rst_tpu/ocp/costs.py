"""Stage and terminal cost functions.

Ref parity: the stage-function family of
src/optimal_control/include/corbo-optimal-control/functions/:
  - QuadraticFormCost / QuadraticStateCost / QuadraticControlCost
    (quadratic_cost.h:35-128, quadratic_state_cost.h:35,
     quadratic_control_cost.h:35)
  - MinimumTime / MinimumTimeRegularized (minimum_time.h:35-108,:109)
  - MinTimeQuadratic blends (hybrid_cost.h:39,189,306,392)
  - QuadraticFinalStateCost [+ Riccati variant] (final_state_cost.h:47,103)

TPU-first redesign: a cost is a frozen pytree with a pure
`stage(x, u, dt, xref, uref) -> scalar` (and `final(x, xref)` for terminal
terms). The reference splits every stage function by dependency signature
(state-only / control-only / state-control-dt …, stage_functions.h:47-128) so
its hypergraph allocates minimal edges; here that taxonomy is unnecessary —
XLA dead-code-eliminates unused inputs after tracing, so every cost just
takes the full stage tuple. `integral=True` costs are quadrature-weighted by
the transcription (left-sum/trapezoidal, full_discretization_grid_base.h:45);
non-integral costs are summed per stage exactly like the reference's
non-integral stage cost edges.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from control_box_rst_tpu.utils.tree import pytree_dataclass, static_field


@pytree_dataclass
class StageCost:
    """Base: zero cost. Subclasses override stage()/final()."""

    integral: bool = static_field(default=False)
    lsq_form: bool = static_field(default=False)
    # whether the stage Hessian is PSD everywhere; nonconvex costs set this
    # False so the SQP auto-enables its PSD clamp (indefinite blocks NaN the
    # QP's Cholesky otherwise)
    convex: bool = static_field(default=True)
    # whether stage()/final() are (at most) quadratic in (x, u) for fixed dt.
    # Solvers use this to hoist the constant cost Hessian out of their
    # iteration loops on LTI problems (the reference's analogue: the CSC
    # structure/value split with `new_structure=false` pattern reuse,
    # SURVEY.md §3.5 — here the *values* are constant too)
    quadratic: bool = static_field(default=False)

    def stage(self, x, u, dt, xref, uref):
        return jnp.zeros(())

    def final(self, x, xref):
        return jnp.zeros(())

    def stage_residual(self, x, u, dt, xref, uref):
        """LSQ residual r with cost = r'r (for Gauss-Newton / LM solvers).
        Ref parity: lsq_form returns the Q^{1/2}-weighted residual
        (quadratic_cost.h lsq mode). Default: none (empty residual)."""
        return jnp.zeros((0,))

    def final_residual(self, x, xref):
        """LSQ residual of the terminal cost, final = r'r (ref: the LSQ form
        of QuadraticFinalStateCost, final_state_cost.h lsq mode). Default:
        none (empty residual)."""
        return jnp.zeros((0,))


@pytree_dataclass
class QuadraticFormCost(StageCost):
    """(x-xref)'Q(x-xref) + (u-uref)'R(u-uref).
    (ref: quadratic_cost.h:35-128)"""

    quadratic: bool = static_field(default=True)
    Q: jax.Array = None  # [nx, nx]
    R: jax.Array = None  # [nu, nu]

    def stage(self, x, u, dt, xref, uref):
        dx = x - xref
        du = u - uref
        return dx @ self.Q @ dx + du @ self.R @ du

    def final(self, x, xref):
        return jnp.zeros(())

    def stage_residual(self, x, u, dt, xref, uref):
        # sqrt-weighted residual; assumes Q, R PSD (cholesky of Q + tiny reg)
        Qs = _sqrtm_psd(self.Q)
        Rs = _sqrtm_psd(self.R)
        return jnp.concatenate([Qs @ (x - xref), Rs @ (u - uref)])


@pytree_dataclass
class QuadraticStateCost(StageCost):
    """(x-xref)'Q(x-xref). (ref: quadratic_state_cost.h:35)"""

    quadratic: bool = static_field(default=True)
    Q: jax.Array = None

    def stage(self, x, u, dt, xref, uref):
        dx = x - xref
        return dx @ self.Q @ dx

    def stage_residual(self, x, u, dt, xref, uref):
        return _sqrtm_psd(self.Q) @ (x - xref)


@pytree_dataclass
class QuadraticControlCost(StageCost):
    """(u-uref)'R(u-uref). (ref: quadratic_control_cost.h:35)"""

    quadratic: bool = static_field(default=True)
    R: jax.Array = None

    def stage(self, x, u, dt, xref, uref):
        du = u - uref
        return du @ self.R @ du

    def stage_residual(self, x, u, dt, xref, uref):
        return _sqrtm_psd(self.R) @ (u - uref)


@pytree_dataclass
class MinimumTime(StageCost):
    """Time-optimal objective: total time Σ dt_k (weight 1 per interval —
    the reference folds the interval count into a single-dt-vertex weight,
    minimum_time.h:52-68; with per-stage evaluation the sum is identical).

    lsq_form=True mirrors the reference's LSQ mode exactly: the per-interval
    residual is √weight·dt_k, i.e. the objective becomes weight·Σ dt_k² —
    a genuinely DIFFERENT optimum on per-interval-dt (non-uniform) grids,
    where the reference's LM solver spreads time across intervals instead
    of minimizing the sum (minimum_time.h:50,60-66: isLsqFormNonIntegralDt,
    lsq weight √(n−1) per dt edge). stage() returns the same χ² so the
    SQP/IP backends optimize the identical objective as LM."""

    weight: jax.Array = 1.0

    def stage(self, x, u, dt, xref, uref):
        if self.lsq_form:
            return self.weight * dt * dt
        return self.weight * dt

    def stage_residual(self, x, u, dt, xref, uref):
        if self.lsq_form:
            return jnp.sqrt(self.weight) * jnp.reshape(dt, (1,))
        return jnp.zeros((0,))


@pytree_dataclass
class MinimumTimeRegularized(StageCost):
    """w·Σdt + reg·Σ dt². (ref: minimum_time.h:109 MinimumTimeRegularized)"""

    weight: jax.Array = 1.0
    reg: jax.Array = 1e-3

    def stage(self, x, u, dt, xref, uref):
        return self.weight * dt + self.reg * dt * dt


@pytree_dataclass
class MinTimeQuadratic(StageCost):
    """Blend: time_weight·Σdt + quadratic tracking term.
    (ref: hybrid_cost.h:189 MinTimeQuadratic; :306/:392 control/state-only
    variants are obtained with zero Q or R)."""

    time_weight: jax.Array = 1.0
    Q: jax.Array = None
    R: jax.Array = None

    def stage(self, x, u, dt, xref, uref):
        c = self.time_weight * dt
        if self.Q is not None:
            dx = x - xref
            c = c + dx @ self.Q @ dx
        if self.R is not None:
            du = u - uref
            c = c + du @ self.R @ du
        return c


def MinTimeQuadraticControls(time_weight=1.0, R=None) -> MinTimeQuadratic:
    """Time + control-effort blend (ref: MinTimeQuadraticControls,
    hybrid_cost.h:306) — MinTimeQuadratic with no state term."""
    return MinTimeQuadratic(time_weight=time_weight, Q=None, R=R)


def MinTimeQuadraticStates(time_weight=1.0, Q=None) -> MinTimeQuadratic:
    """Time + state-tracking blend (ref: MinTimeQuadraticStates,
    hybrid_cost.h:392) — MinTimeQuadratic with no control term."""
    return MinTimeQuadratic(time_weight=time_weight, Q=Q, R=None)


@pytree_dataclass
class MinTimeQuadraticGainScheduled(StageCost):
    """Gain-scheduled blend: quadratic weights fade in as ||x-xref|| shrinks
    below `radius` (ref: hybrid_cost.h:39 MinTimeQuadraticGainScheduled).
    Smooth sigmoid scheduling keeps it AD-friendly."""

    time_weight: jax.Array = 1.0
    Q: jax.Array = None
    R: jax.Array = None
    radius: jax.Array = 1.0
    sharpness: jax.Array = 10.0
    convex: bool = static_field(default=False)

    def stage(self, x, u, dt, xref, uref):
        dx = x - xref
        # schedule on the SQUARED distance: sqrt's Hessian is unbounded at
        # dx → 0 (1/dist³), which NaNs Newton steps exactly when the state
        # reaches the goal — the squared form is C^∞ everywhere
        gain = jax.nn.sigmoid(
            self.sharpness * (1.0 - (dx @ dx) / (self.radius**2))
        )
        c = self.time_weight * dt
        if self.Q is not None:
            c = c + gain * (dx @ self.Q @ dx)
        if self.R is not None and uref is not None:
            du = u - uref
            c = c + gain * (du @ self.R @ du)
        return c


@pytree_dataclass
class QuadraticFinalStateCost(StageCost):
    """Terminal cost (x_N - xref)'Qf(x_N - xref). (ref: final_state_cost.h:47)"""

    quadratic: bool = static_field(default=True)
    Qf: jax.Array = None

    def final(self, x, xref):
        dx = x - xref
        return dx @ self.Qf @ dx

    def final_residual(self, x, xref):
        return _sqrtm_psd(self.Qf) @ (x - xref)


def riccati_terminal_cost(system, xref, uref, Q, R, dt: Optional[float] = None):
    """Qf from the algebraic Riccati equation at the linearization (xref, uref).

    Ref parity: QuadraticFinalStateCostRiccati (final_state_cost.h:103) —
    linearize the system at the reference and solve CARE (continuous) for the
    stabilizing cost-to-go; this makes the finite-horizon MPC cost a
    quasi-infinite-horizon surrogate. Returns QuadraticFinalStateCost.
    """
    from control_box_rst_tpu.ops.matrix_eq import solve_care, solve_dare

    A = system.linear_A(xref, uref)
    B = system.linear_B(xref, uref)
    if system.continuous_time:
        Qf = solve_care(A, B, Q, R)
    else:
        Qf = solve_dare(A, B, Q, R)
    return QuadraticFinalStateCost(Qf=Qf)


@pytree_dataclass
class L1SoftConstraintCost(StageCost):
    """Exact-penalty (L1) soft constraints as a cost term.

    Ref parity: the L1 soft-constraint stabilization edges
    (ref: structured_ocp/edges/l1_stab_edges.h:41,77) — constraint
    violations enter the objective as weight·‖·‖₁ instead of hard rows.
    Wrap any StageConstraint; inequalities contribute weight·max(0,g),
    equalities weight·|h|."""

    constraint: object = None  # a StageConstraint
    weight: jax.Array = 1.0

    def stage(self, x, u, dt, xref, uref):
        c = self.constraint
        total = jnp.zeros(())
        if c.nineq:
            g = c.ineq(x, u, dt, xref, uref)
            total = total + self.weight * jnp.sum(jnp.maximum(0.0, g))
        if c.neq:
            h = c.eq(x, u, dt, xref, uref)
            total = total + self.weight * jnp.sum(jnp.abs(h))
        return total


@pytree_dataclass
class CompositeCost(StageCost):
    """Sum of a stage cost and a terminal cost object (or several)."""

    costs: tuple = static_field(default=())

    def __post_init__(self):
        object.__setattr__(
            self, "convex", all(getattr(c, "convex", True) for c in self.costs)
        )
        object.__setattr__(
            self,
            "quadratic",
            all(getattr(c, "quadratic", False) for c in self.costs),
        )

    def stage(self, x, u, dt, xref, uref):
        total = jnp.zeros(())
        for c in self.costs:
            total = total + c.stage(x, u, dt, xref, uref)
        return total

    def final(self, x, xref):
        total = jnp.zeros(())
        for c in self.costs:
            total = total + c.final(x, xref)
        return total

    def stage_residual(self, x, u, dt, xref, uref):
        parts = [c.stage_residual(x, u, dt, xref, uref) for c in self.costs]
        return jnp.concatenate(parts) if parts else jnp.zeros((0,))

    def final_residual(self, x, xref):
        parts = [c.final_residual(x, xref) for c in self.costs]
        return jnp.concatenate(parts) if parts else jnp.zeros((0,))


def _sqrtm_psd(M: jax.Array) -> jax.Array:
    """Symmetric PSD matrix square root via eigh (small matrices)."""
    w, V = jnp.linalg.eigh(M)
    w = jnp.maximum(w, 0.0)
    return (V * jnp.sqrt(w)[None, :]) @ V.T
