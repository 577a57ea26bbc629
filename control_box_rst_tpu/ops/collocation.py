"""Finite-difference collocation defects and quadrature rules.

Ref parity:
- FD collocation (one-step defect h(x1,u1,x2,dt) - f(·)):
  `FiniteDifferencesCollocationInterface` and Forward/Backward/Midpoint/
  Crank-Nicolson realizations
  (ref: src/numerics/include/corbo-numerics/finite_differences_collocation.h:
  60,119,153,187,221). The sign/scale convention matches the reference:
  defect = f(·) - (x2 - x1)/dt  (Crank-Nicolson uses the negated form in the
  reference, which is equivalent as an equality constraint; we use the same
  f-minus-difference orientation for all rules).
- Quadrature for integral stage costs: rectangle (left sum), trapezoidal,
  Hermite-Simpson (ref: src/numerics/include/corbo-numerics/quadrature.h:
  48,315,622,1087).

All functions are pure and shaped for `vmap` over the horizon: transcription
evaluates every interval's defect in one batched call — the reference's
serial edge loop (hyper_graph_optimization_problem_edge_based.cpp:460-498)
becomes a single tensor op.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

DynamicsFn = Callable[[jax.Array, jax.Array], jax.Array]


# --------------------------------------------------------------------------
# FD collocation defects (equality constraints for full-discretization grids)
# --------------------------------------------------------------------------

def forward_diff_defect(f: DynamicsFn, x1, u1, x2, dt):
    """Forward Euler defect: f(x1,u1) - (x2-x1)/dt.
    (ref: finite_differences_collocation.h:119-151)"""
    return f(x1, u1) - (x2 - x1) / dt


def backward_diff_defect(f: DynamicsFn, x1, u1, x2, dt):
    """Backward Euler defect: f(x2,u1) - (x2-x1)/dt.
    (ref: finite_differences_collocation.h:153-185)"""
    return f(x2, u1) - (x2 - x1) / dt


def midpoint_diff_defect(f: DynamicsFn, x1, u1, x2, dt):
    """Midpoint defect: f((x1+x2)/2, u1) - (x2-x1)/dt.
    (ref: finite_differences_collocation.h:187-219)"""
    return f(0.5 * (x1 + x2), u1) - (x2 - x1) / dt


def crank_nicolson_defect(f: DynamicsFn, x1, u1, x2, dt):
    """Crank-Nicolson defect: 0.5(f(x1,u1)+f(x2,u1)) - (x2-x1)/dt.
    (ref: finite_differences_collocation.h:221-243, negated orientation)"""
    return 0.5 * (f(x1, u1) + f(x2, u1)) - (x2 - x1) / dt


FD_COLLOCATIONS = {
    "forward": forward_diff_defect,
    "backward": backward_diff_defect,
    "midpoint": midpoint_diff_defect,
    "crank_nicolson": crank_nicolson_defect,
}
# hermite_simpson (3rd-order quadrature collocation; ref collocation_edges.h
# Hermite-Simpson edges) is registered below after its definition.


def get_fd_collocation(name: str):
    if name not in FD_COLLOCATIONS:
        raise KeyError(f"unknown FD collocation {name!r}; have {sorted(FD_COLLOCATIONS)}")
    return FD_COLLOCATIONS[name]


# --------------------------------------------------------------------------
# Quadrature rules for integral stage costs over one interval [0, dt]
#   cost_k = ∫ l(x(t), u_k) dt  approximated from endpoint samples
# --------------------------------------------------------------------------

def quadrature_left_sum(l, x1, u1, x2, dt):
    """Rectangle / left-sum rule: dt * l(x1, u1).
    (ref: quadrature.h:48 QuadratureRectangleRule; also the LeftSum cost
    integration option of full-discretization grids,
    full_discretization_grid_base.h:45)"""
    return dt * l(x1, u1)


def quadrature_trapezoidal(l, x1, u1, x2, dt):
    """Trapezoidal rule: dt/2 * (l(x1,u1) + l(x2,u1)).
    (ref: quadrature.h:315 QuadratureTrapezoidalRule)"""
    return 0.5 * dt * (l(x1, u1) + l(x2, u1))


def quadrature_hermite_simpson(l, x1, u1, x2, dt, f: DynamicsFn | None = None):
    """Hermite-Simpson rule: dt/6 * (l(x1) + 4 l(xm) + l(x2)) with the
    Hermite-interpolated midpoint xm = (x1+x2)/2 + dt/8 (f(x1)-f(x2)).
    Falls back to the arithmetic midpoint when no dynamics are supplied.
    (ref: quadrature.h:622,1087 QuadratureHermiteSimpson[LinearControl])"""
    if f is not None:
        xm = 0.5 * (x1 + x2) + (dt / 8.0) * (f(x1, u1) - f(x2, u1))
    else:
        xm = 0.5 * (x1 + x2)
    return (dt / 6.0) * (l(x1, u1) + 4.0 * l(xm, u1) + l(x2, u1))


QUADRATURES = {
    "left_sum": quadrature_left_sum,
    "trapezoidal": quadrature_trapezoidal,
    "hermite_simpson": quadrature_hermite_simpson,
}


def hermite_simpson_defect(f: DynamicsFn, x1, u1, x2, dt):
    """Hermite-Simpson dynamics defect (quadrature collocation):
      (x2 - x1)/dt - 1/6 (f1 + 4 fm + f2),  xm Hermite-interpolated.
    (ref: collocation_edges.h Hermite-Simpson edges, structured_ocp/edges/
    collocation_edges.h:42-1392). Scaled by 1/dt to match the FD-collocation
    defect convention."""
    f1 = f(x1, u1)
    f2 = f(x2, u1)
    xm = 0.5 * (x1 + x2) + (dt / 8.0) * (f1 - f2)
    fm = f(xm, u1)
    return (f1 + 4.0 * fm + f2) / 6.0 - (x2 - x1) / dt


FD_COLLOCATIONS["hermite_simpson"] = hermite_simpson_defect


def hermite_simpson_lc_defect(f: DynamicsFn, x1, u1, x2, u2, dt):
    """Hermite-Simpson defect with LINEAR control interpolation: the
    midpoint dynamics use um = (u1+u2)/2 and the endpoint terms their own
    controls. (ref: QuadratureHermiteSimpsonLinearControl, quadrature.h:622,
    vs the piecewise-constant variant at :1087.) Same 1/dt scaling
    convention as the other defects. Extra u2 argument — the transcription
    feeds the next stage's control (ocp/transcribe.py)."""
    um = 0.5 * (u1 + u2)
    f1 = f(x1, u1)
    f2 = f(x2, u2)
    xm = 0.5 * (x1 + x2) + (dt / 8.0) * (f1 - f2)
    fm = f(xm, um)
    return (f1 + 4.0 * fm + f2) / 6.0 - (x2 - x1) / dt


def quadrature_hermite_simpson_lc(l, x1, u1, x2, u2, dt, f: DynamicsFn | None = None):
    """Hermite-Simpson cost quadrature with linear control interpolation.
    (ref: QuadratureHermiteSimpsonLinearControl, quadrature.h:622)"""
    um = 0.5 * (u1 + u2)
    if f is not None:
        xm = 0.5 * (x1 + x2) + (dt / 8.0) * (f(x1, u1) - f(x2, u2))
    else:
        xm = 0.5 * (x1 + x2)
    return (dt / 6.0) * (l(x1, u1) + 4.0 * l(xm, um) + l(x2, u2))


def hermite_simpson_unc_rows(f: DynamicsFn, x1, xm, u1, x2, dt):
    """UNCOMPRESSED Hermite-Simpson interval rows: the midpoint state xm is
    a DECISION VARIABLE rather than being Hermite-interpolated away (ref:
    the uncompressed collocation edge variants, structured_ocp/edges/
    collocation_edges.h:42-1392 — midpoint vertices with an explicit
    interpolation constraint).

    Returns [2·nx] rows, both in the 1/dt-scaled defect convention:
      simpson  = (f1 + 4 f(xm) + f2)/6 − (x2 − x1)/dt          (dynamics)
      midtie   = (xm − (x1+x2)/2)/dt − (f1 − f2)/8             (interpolation)
    At a solution the midtie row pins xm to the Hermite midpoint, making
    the scheme equivalent to the compressed form — but the midpoint enters
    the NLP with its own bounds and linearization (larger, sparser KKT:
    the reference's accuracy/structure trade-off)."""
    f1 = f(x1, u1)
    f2 = f(x2, u1)
    fm = f(xm, u1)
    simpson = (f1 + 4.0 * fm + f2) / 6.0 - (x2 - x1) / dt
    midtie = (xm - 0.5 * (x1 + x2)) / dt - (f1 - f2) / 8.0
    return jnp.concatenate([simpson, midtie])
