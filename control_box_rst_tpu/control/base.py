"""Controller protocol.

Ref parity: `ControllerInterface::step(x, xref, uref, dt, t, u_seq, x_seq, …)`
(ref: src/controllers/include/corbo-controllers/controller_interface.h:58,
127-138).

TPU-first redesign: a controller is a pure transition function
  step(carry, x, t) -> (carry', ControlOutput)
so closed loops compose as `lax.scan` (sim/closed_loop.py). Mutable members
of the reference (PID error integrals, MPC warm starts, dual-mode switches)
become explicit carry pytrees. References (xref/uref) are data on the
controller object or supplied per step.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from control_box_rst_tpu.utils.tree import pytree_dataclass, static_field


class ControlOutput(NamedTuple):
    """What one controller step produces.

    u:      [nu] immediate control (applied ZOH over the next interval)
    u_seq:  [H, nu] predicted control sequence (H=1 for static controllers —
            ref controllers return single-entry TimeSeries the same way)
    x_seq:  [H+1, nx] predicted state sequence
    ok:     bool success flag (ref: step() return value)
    info:   dict of diagnostics (objective, iterations, residuals …)
    """

    u: jax.Array
    u_seq: jax.Array
    x_seq: jax.Array
    ok: jax.Array
    info: dict


@pytree_dataclass
class Controller:
    """Base controller. Subclasses define init_carry()/step()."""

    nx: int = static_field(default=0)
    nu: int = static_field(default=0)

    def init_carry(self, x0: jax.Array) -> Any:
        return ()

    def step(self, carry, x: jax.Array, t: jax.Array, dt) -> tuple:
        raise NotImplementedError

    @property
    def horizon(self) -> int:
        """Length of the produced u_seq (1 for static feedback)."""
        return 1

    def _single(self, x, u, ok=True, info=None):
        return ControlOutput(
            u=u,
            u_seq=u[None, :],
            x_seq=jnp.stack([x, x]),
            ok=jnp.asarray(ok),
            info=info or {},
        )
