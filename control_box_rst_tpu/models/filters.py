"""Signal filters, one-step predictor, and dead-time buffer.

Ref parity (src/systems/):
  - MovingAverageFilter / MovingMedianFilter / MovingLeastSquaresFilter
    (standard_filters.h:52,105,160)
  - OneStepPredictor — integrates the model over the pending control
    sequence to compensate computation dead time (one_step_predictor.h:49,64;
    used by ClosedLoopControlTask, task_closed_loop_control.cpp:128-145)
  - TimeValueBuffer — actuation-delay buffer returning the piecewise-
    constant controls active during a delayed interval (time_value_buffer.h:53)

TPU-first redesign: the reference's std::deque state becomes fixed-size ring
buffers carried through `lax.scan` — every filter is a pure
(carry, sample) → (carry, filtered) transition with static window size.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from control_box_rst_tpu.models.base import SystemDynamics
from control_box_rst_tpu.ops.integrators import ExplicitIntegrator, make_integrator
from control_box_rst_tpu.utils.tree import pytree_dataclass, static_field


class FilterCarry(NamedTuple):
    buffer: jax.Array  # [W] ring buffer of recent samples
    count: jax.Array   # number of valid samples (≤ W)


def _push(carry: FilterCarry, value) -> FilterCarry:
    buf = jnp.roll(carry.buffer, -1).at[-1].set(value)
    return FilterCarry(buffer=buf, count=jnp.minimum(carry.count + 1, buf.shape[0]))


def _valid_mask(carry: FilterCarry):
    W = carry.buffer.shape[0]
    idx = jnp.arange(W)
    return idx >= (W - carry.count)


@pytree_dataclass
class MovingAverageFilter:
    """Mean over the last `window` samples (ref: standard_filters.h:52)."""

    window: int = static_field(default=5)

    def init_carry(self):
        return FilterCarry(jnp.zeros((self.window,)), jnp.asarray(0, jnp.int32))

    def __call__(self, carry: FilterCarry, t, value):
        carry = _push(carry, value)
        m = _valid_mask(carry)
        avg = jnp.sum(carry.buffer * m) / jnp.maximum(carry.count, 1)
        return carry, avg


@pytree_dataclass
class MovingMedianFilter:
    """Median over the last `window` samples (ref: standard_filters.h:105)."""

    window: int = static_field(default=5)

    def init_carry(self):
        return FilterCarry(jnp.zeros((self.window,)), jnp.asarray(0, jnp.int32))

    def __call__(self, carry: FilterCarry, t, value):
        carry = _push(carry, value)
        m = _valid_mask(carry)
        # masked median: sort with invalid entries pushed to +inf, take the
        # middle of the valid range
        vals = jnp.where(m, carry.buffer, jnp.inf)
        s = jnp.sort(vals)
        n = carry.count
        lo = (n - 1) // 2
        hi = n // 2
        med = 0.5 * (s[lo] + s[hi])
        return carry, med


@pytree_dataclass
class MovingLeastSquaresFilter:
    """Fit a degree-`order` polynomial to the window (least squares) and
    evaluate it at the newest sample (ref: standard_filters.h:160)."""

    window: int = static_field(default=7)
    order: int = static_field(default=2)

    def init_carry(self):
        return FilterCarry(jnp.zeros((self.window,)), jnp.asarray(0, jnp.int32))

    def __call__(self, carry: FilterCarry, t, value):
        carry = _push(carry, value)
        W = self.window
        m = _valid_mask(carry).astype(carry.buffer.dtype)
        # normalized abscissa 0..W-1; weighted LS with mask weights
        x = jnp.arange(W, dtype=carry.buffer.dtype)
        V = jnp.stack([x**p for p in range(self.order + 1)], axis=1)  # [W, o+1]
        Wm = m[:, None]
        A = (V * Wm).T @ V + 1e-9 * jnp.eye(self.order + 1, dtype=V.dtype)
        b = (V * Wm).T @ carry.buffer
        coef = jnp.linalg.solve(A, b)
        fitted = V[-1] @ coef
        # before the window fills, fall back to the raw value
        out = jnp.where(carry.count > self.order, fitted, value)
        return carry, out


@pytree_dataclass
class OneStepPredictor:
    """Predict x(t+dt) from x(t) and the pending control sequence — dead-time
    compensation (ref: one_step_predictor.h:49,64)."""

    system: SystemDynamics = None
    integrator: ExplicitIntegrator = None

    def __post_init__(self):
        if self.integrator is None:
            object.__setattr__(self, "integrator", make_integrator("rk4", 2))

    def predict(self, x0, u_seq: jax.Array, dt_seq: jax.Array) -> jax.Array:
        """Integrate through the piecewise-constant (dt_k, u_k) sequence."""

        def body(x, inp):
            u, dtk = inp
            if self.system.continuous_time:
                xn = self.integrator.solve_ivp(self.system, x, u, dtk)
            else:
                xn = jnp.where(dtk > 0, self.system(x, u), x)
            return xn, None

        xf, _ = jax.lax.scan(body, x0, (u_seq, dt_seq))
        return xf

    def predict_single(self, x0, u, dt) -> jax.Array:
        return self.predict(x0, u[None, :], jnp.asarray(dt)[None])


class DelayCarry(NamedTuple):
    u_hist: jax.Array  # [D, nu] most recent controls (ring, newest last)
    filled: jax.Array  # count


@pytree_dataclass
class TimeValueBuffer:
    """Discrete dead-time buffer: the control applied now is the one
    commanded `delay_steps` intervals ago (piecewise-constant signal,
    ref time_value_buffer.h:53-110 specialized to the fixed-dt closed loop)."""

    delay_steps: int = static_field(default=1)
    nu: int = static_field(default=1)

    def init_carry(self, u_init=None):
        D = max(self.delay_steps, 1)
        hist = jnp.zeros((D, self.nu))
        if u_init is not None:
            hist = hist + jnp.asarray(u_init)[None, :]
        return DelayCarry(u_hist=hist, filled=jnp.asarray(0, jnp.int32))

    def push_pop(self, carry: DelayCarry, u_new: jax.Array):
        """Append the newly commanded u; return the delayed (applied) u."""
        if self.delay_steps == 0:
            return carry, u_new
        u_out = carry.u_hist[0]
        hist = jnp.concatenate([carry.u_hist[1:], u_new[None, :]], axis=0)
        return DelayCarry(u_hist=hist, filled=carry.filled + 1), u_out
