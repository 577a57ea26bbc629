"""Observers.

Ref parity: ObserverInterface::observe(y → x) and the passthrough NoObserver
(ref: src/observers/include/corbo-observers/observer_interface.h:58,101,141 —
the reference ships only NoObserver). Here additionally a steady-state
Kalman filter (Luenberger gain from the DARE) as a useful extension for
partial-output plants.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from control_box_rst_tpu.models.base import SystemDynamics
from control_box_rst_tpu.ops.matrix_eq import solve_dare
from control_box_rst_tpu.utils.tree import pytree_dataclass, static_field


@pytree_dataclass
class NoObserver:
    """y IS the full state (ref: observer_interface.h:141)."""

    def init_carry(self, x0):
        return ()

    def observe(self, carry, y, u, dt):
        return carry, y


class KalmanCarry(NamedTuple):
    x_hat: jax.Array


@pytree_dataclass
class SteadyStateKalmanObserver:
    """Discrete steady-state Kalman filter on the linearized system.

    x̂⁺ = Ad x̂ + Bd u + L (y - C x̂), L from the filter DARE. No reference
    equivalent (the reference only ships NoObserver) — provided for
    partial-output closed loops.
    """

    Ad: jax.Array = None
    Bd: jax.Array = None
    C: jax.Array = None
    L: jax.Array = None

    @staticmethod
    def from_linear(Ad, Bd, C, W=None, V=None):
        nx = Ad.shape[0]
        ny = C.shape[0]
        W = jnp.eye(nx) * 1e-3 if W is None else W
        V = jnp.eye(ny) * 1e-2 if V is None else V
        # filter DARE on (Aᵀ, Cᵀ)
        P = solve_dare(Ad.T, C.T, W, V)
        L = P @ C.T @ jnp.linalg.inv(C @ P @ C.T + V)
        return SteadyStateKalmanObserver(Ad=Ad, Bd=Bd, C=C, L=L)

    def init_carry(self, x0):
        return KalmanCarry(x_hat=x0)

    def observe(self, carry: KalmanCarry, y, u, dt):
        x_pred = self.Ad @ carry.x_hat + self.Bd @ u
        x_hat = x_pred + self.L @ (y - self.C @ x_pred)
        return KalmanCarry(x_hat=x_hat), x_hat
