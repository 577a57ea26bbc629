"""Dynamics-model protocol.

Ref parity: `SystemDynamicsInterface`
(ref: src/systems/include/corbo-systems/system_dynamics_interface.h:66,121).
The reference exposes `dynamics(x, u, f)` plus finite-difference linearization
`getLinearA/getLinearB` (system_dynamics_interface.h:144-157, central FD).

TPU-first redesign: a system is a frozen pytree dataclass whose parameters are
traced leaves, with a pure `__call__(x, u) -> xdot` (continuous) or
`x_next` (discrete). Linearization is exact `jax.jacfwd` instead of numeric
FD — batched over stages/scenarios with `vmap` at the call site. Everything
composes with jit/vmap/grad; there is no mutable state.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from control_box_rst_tpu.utils.tree import pytree_dataclass, static_field


@pytree_dataclass
class SystemDynamics:
    """Base class for all dynamics models.

    Subclasses set `nx`/`nu` static fields and implement `__call__(x, u)`.
    `continuous_time=True` means `__call__` returns xdot; False means it
    returns x_{k+1} directly (discrete-time system).
    """

    nx: int = static_field(default=0)
    nu: int = static_field(default=0)
    continuous_time: bool = static_field(default=True)

    def __call__(self, x: jax.Array, u: jax.Array) -> jax.Array:
        raise NotImplementedError

    # -- exact linearization (replaces FD getLinearA/getLinearB,
    #    ref system_dynamics_interface.h:144-157) ---------------------------
    def linear_A(self, x0: jax.Array, u0: jax.Array) -> jax.Array:
        """∂f/∂x at (x0, u0) via forward-mode AD."""
        return jax.jacfwd(lambda x: self(x, u0))(x0)

    def linear_B(self, x0: jax.Array, u0: jax.Array) -> jax.Array:
        """∂f/∂u at (x0, u0) via forward-mode AD."""
        return jax.jacfwd(lambda u: self(x0, u))(u0)

    def linearize(self, x0: jax.Array, u0: jax.Array) -> Tuple[jax.Array, jax.Array]:
        return self.linear_A(x0, u0), self.linear_B(x0, u0)

    @property
    def is_linear(self) -> bool:
        return False


@pytree_dataclass
class FunctionalDynamics(SystemDynamics):
    """Wrap an arbitrary pure function f(x, u) -> xdot as a system.

    Ref parity: the reference lets tests wrap lambdas as systems/edges
    (generic_edge.h:68); this is the system-level analogue.
    """

    fn: Callable[[jax.Array, jax.Array], jax.Array] = static_field(default=None)

    def __call__(self, x: jax.Array, u: jax.Array) -> jax.Array:
        return self.fn(x, u)


def check_dimensions(system: SystemDynamics) -> None:
    """Sanity-check that the model maps (nx,), (nu,) -> (nx,)."""
    x = jnp.zeros((system.nx,))
    u = jnp.zeros((system.nu,))
    f = jax.eval_shape(system, x, u)
    if f.shape != (system.nx,):
        raise ValueError(
            f"{type(system).__name__}: dynamics output shape {f.shape} "
            f"!= (nx,) = ({system.nx},)"
        )
