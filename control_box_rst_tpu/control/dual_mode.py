"""Dual-mode controller: MPC far from the goal, local (LQR) controller near it.

Ref parity: `DualModeController` (ref: src/controllers/include/
corbo-controllers/dual_mode_controller.h:47; src/dual_mode_controller.cpp:
56-90): switches to the local controller when x enters the terminal ball
‖x - xf‖²_S ≤ γ (or when the predictive controller's dt collapses below a
threshold in time-optimal mode).

TPU-first: both controllers run every step inside `lax.cond`-free select
(both branches are traced anyway under vmap; the MPC branch dominates cost,
and running it unconditionally keeps the batched closed loop shape-static).
The switch is a smooth per-lane boolean on the ball condition.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from control_box_rst_tpu.control.base import Controller, ControlOutput
from control_box_rst_tpu.utils.tree import pytree_dataclass, static_field


class DualModeCarry(NamedTuple):
    mpc_carry: object
    local_carry: object
    local_active: jax.Array  # bool — latched once entered (hysteresis-free)


@pytree_dataclass
class DualModeController(Controller):
    global_controller: Controller = None  # typically PredictiveController
    local_controller: Controller = None   # typically LqrController
    S: jax.Array = None                   # terminal ball metric
    gamma: jax.Array = 1.0
    xf: jax.Array = None
    latch: bool = static_field(default=False)  # stay local once switched

    def init_carry(self, x0):
        return DualModeCarry(
            mpc_carry=self.global_controller.init_carry(x0),
            local_carry=self.local_controller.init_carry(x0),
            local_active=jnp.asarray(False),
        )

    def step(self, carry: DualModeCarry, x, t, dt):
        dx = x - self.xf
        inside = (dx @ self.S @ dx) <= self.gamma
        active = jnp.logical_or(inside, carry.local_active) if self.latch else inside

        mpc_carry, mpc_out = self.global_controller.step(carry.mpc_carry, x, t, dt)
        loc_carry, loc_out = self.local_controller.step(carry.local_carry, x, t, dt)

        u = jnp.where(active, loc_out.u, mpc_out.u)
        out = ControlOutput(
            u=u,
            u_seq=jnp.where(active, jnp.broadcast_to(loc_out.u, mpc_out.u_seq.shape), mpc_out.u_seq),
            x_seq=mpc_out.x_seq,
            ok=jnp.where(active, loc_out.ok, mpc_out.ok),
            info={**mpc_out.info, "local_active": active},
        )
        return DualModeCarry(mpc_carry, loc_carry, active), out
