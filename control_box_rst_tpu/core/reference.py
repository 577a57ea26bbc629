"""Reference trajectories.

Ref parity: src/core/include/corbo-core/reference_trajectory.h:60 —
StaticReference (:112), ZeroReference (:162), SineReferenceTrajectory (:194),
DiscreteTimeReferenceTrajectory (:321), BlindDiscreteTimeReferenceTrajectory
(:483) with precompute()/getReferenceCached().

TPU-first redesign: a reference is a pure function t → value plus a
`sample(t0, dts)` that materializes the per-stage References arrays the
grids consume (the reference's cache; here just a vmapped evaluation that
XLA fuses into the solve). All jittable, so time-varying references work
inside the closed-loop scan.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from control_box_rst_tpu.core.time_series import TimeSeries
from control_box_rst_tpu.ocp.problem import References
from control_box_rst_tpu.utils.tree import pytree_dataclass, static_field


@pytree_dataclass
class ReferenceTrajectory:
    """Base: subclasses implement value_at(t) -> [d]."""

    dim: int = static_field(default=0)

    def value_at(self, t) -> jax.Array:
        raise NotImplementedError

    def stage_values(self, t0, dts) -> jax.Array:
        """Values at stage times t0, t0+dt0, … — [N+1, d]."""
        ts = t0 + jnp.concatenate([jnp.zeros((1,), dts.dtype), jnp.cumsum(dts)])
        return jax.vmap(self.value_at)(ts)


@pytree_dataclass
class StaticReference(ReferenceTrajectory):
    """Constant reference (ref: reference_trajectory.h:112)."""

    value: jax.Array = None

    def value_at(self, t):
        return self.value


def ZeroReference(dim: int) -> StaticReference:
    """(ref: reference_trajectory.h:162)"""
    return StaticReference(dim=dim, value=jnp.zeros((dim,)))


@pytree_dataclass
class SineReferenceTrajectory(ReferenceTrajectory):
    """value_i = offset + amplitude · sin(omega t + phase)
    (ref: reference_trajectory.h:194)."""

    amplitude: jax.Array = 1.0
    omega: jax.Array = 1.0
    phase: jax.Array = 0.0
    offset: jax.Array = 0.0

    def value_at(self, t):
        v = self.offset + self.amplitude * jnp.sin(self.omega * t + self.phase)
        return jnp.broadcast_to(jnp.atleast_1d(v), (self.dim,))


@pytree_dataclass
class DiscreteTimeReferenceTrajectory(ReferenceTrajectory):
    """Reference stored as a TimeSeries, interpolated in time
    (ref: reference_trajectory.h:321; the 'blind' variant :483 steps through
    samples without time-synchronization — use interpolation='zero_order_hold'
    and pre-shifted times for that behavior)."""

    series: TimeSeries = None
    interpolation: str = static_field(default="linear")

    def value_at(self, t):
        return self.series.value_at(t, interpolation=self.interpolation)


def sample_references(
    xref: ReferenceTrajectory,
    uref: ReferenceTrajectory,
    t0,
    dts: jax.Array,
) -> References:
    """Materialize per-stage reference arrays for a grid update.
    (ref: grid ref caching, full_discretization_grid_base.cpp:59-64)"""
    xs = xref.stage_values(t0, dts)
    ts = t0 + jnp.concatenate([jnp.zeros((1,), dts.dtype), jnp.cumsum(dts)])[:-1]
    us = jax.vmap(uref.value_at)(ts)
    return References(xref=xs, uref=us)
