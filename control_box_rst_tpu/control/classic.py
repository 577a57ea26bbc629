"""Classic controllers: LQR, PID, simple state feedback, step response.

Ref parity:
  - LqrController (ref: src/controllers/include/corbo-controllers/
    lqr_controller.h:74; src/lqr_controller.cpp): linearize the system at the
    reference steady state, solve CARE/DARE → K, u = uref - K(x - xref).
  - PidController (pid_controller.h:46; src/pid_controller.cpp:40-90):
    num_parallel_pid independent PID loops on state error components.
  - SimpleStateController (simple_state_controller.h:46;
    src/simple_state_controller.cpp): u = K(xref - x) + uref, or the
    prefilter form u = -K x + V xref.
  - StepResponseGenerator (step_response_generator.h:47): open-loop step.

All controllers are pure carry/step functions (see control/base.py).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from control_box_rst_tpu.control.base import Controller, ControlOutput
from control_box_rst_tpu.models.base import SystemDynamics
from control_box_rst_tpu.ops.matrix_eq import lqr_gain_continuous, lqr_gain_discrete
from control_box_rst_tpu.utils.tree import pytree_dataclass, static_field


@pytree_dataclass
class LqrController(Controller):
    """u = uref - K (x - xref), K from CARE (continuous) / DARE (discrete)."""

    K: jax.Array = None
    xref: jax.Array = None
    uref: jax.Array = None

    @staticmethod
    def from_system(
        system: SystemDynamics,
        Q: jax.Array,
        R: jax.Array,
        xref: Optional[jax.Array] = None,
        uref: Optional[jax.Array] = None,
    ) -> "LqrController":
        """Linearize at (xref, uref) and solve the Riccati equation.
        (ref: LqrController::initialize → CARE → K, src/lqr_controller.cpp)"""
        xref = jnp.zeros((system.nx,)) if xref is None else jnp.asarray(xref)
        uref = jnp.zeros((system.nu,)) if uref is None else jnp.asarray(uref)
        A = system.linear_A(xref, uref)
        B = system.linear_B(xref, uref)
        if system.continuous_time:
            K = lqr_gain_continuous(A, B, Q, R)
        else:
            K = lqr_gain_discrete(A, B, Q, R)
        return LqrController(
            nx=system.nx, nu=system.nu, K=K, xref=xref, uref=uref
        )

    def step(self, carry, x, t, dt):
        u = self.uref - self.K @ (x - self.xref)
        return carry, self._single(x, u)


class PidCarry(NamedTuple):
    p_error: jax.Array
    i_error: jax.Array


@pytree_dataclass
class PidController(Controller):
    """num_parallel_pid independent PIDs on (xref - x) components.
    Control i = p·e_i + i·∫e_i + d·de_i/dt  (ref: pid_controller.cpp:60-70)."""

    p_gain: jax.Array = 1.0
    i_gain: jax.Array = 0.0
    d_gain: jax.Array = 0.0
    xref: jax.Array = None

    def init_carry(self, x0):
        n = self.nu
        return PidCarry(p_error=jnp.zeros((n,)), i_error=jnp.zeros((n,)))

    def step(self, carry: PidCarry, x, t, dt):
        xref = self.xref if self.xref is not None else jnp.zeros_like(x)
        e = (xref - x)[: self.nu]
        d_error = jnp.where(dt > 0, (e - carry.p_error) / dt, 0.0)
        i_error = carry.i_error + dt * e
        u = self.p_gain * e + self.i_gain * i_error + self.d_gain * d_error
        return PidCarry(p_error=e, i_error=i_error), self._single(x, u)


@pytree_dataclass
class SimpleStateController(Controller):
    """u = K (xref - x) + uref, or prefilter form u = -K x + V xref.
    (ref: simple_state_controller.cpp step)"""

    K: jax.Array = None
    V: jax.Array = None  # if set, use u = -K x + V xref
    xref: jax.Array = None
    uref: jax.Array = None

    def step(self, carry, x, t, dt):
        xref = self.xref if self.xref is not None else jnp.zeros_like(x)
        if self.V is not None:
            u = -self.K @ x + self.V @ xref
        else:
            uref = (
                self.uref if self.uref is not None else jnp.zeros((self.nu,))
            )
            u = self.K @ (xref - x) + uref
        return carry, self._single(x, u)


@pytree_dataclass
class StepResponseGenerator(Controller):
    """Open-loop step input: u = u_step for t >= t_step else u_init.
    (ref: step_response_generator.h:47)"""

    u_step: jax.Array = None
    u_init: jax.Array = None
    t_step: jax.Array = 0.0

    def step(self, carry, x, t, dt):
        u_init = (
            self.u_init if self.u_init is not None else jnp.zeros_like(self.u_step)
        )
        u = jnp.where(t >= self.t_step, self.u_step, u_init)
        return carry, self._single(x, u)
