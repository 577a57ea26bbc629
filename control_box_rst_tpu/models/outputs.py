"""System output functions y = g(x).

Ref parity: SystemOutputInterface / FullStateSystemOutput /
FirstStateSystemOutput / LinearStateSystemOutput
(ref: src/systems/include/corbo-systems/output_function_interface.h:62,115).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from control_box_rst_tpu.utils.tree import pytree_dataclass, static_field


@pytree_dataclass
class SystemOutput:
    """Base: full-state output y = x (ref: FullStateSystemOutput,
    output_function_interface.h:115)."""

    ny: int = static_field(default=0)

    def __call__(self, x: jax.Array) -> jax.Array:
        return x


def FullStateSystemOutput(nx: int) -> SystemOutput:
    return SystemOutput(ny=nx)


@pytree_dataclass
class FirstStateSystemOutput(SystemOutput):
    """y = x[0:1] (ref: output_function_interface.h FirstStateSystemOutput)."""

    ny: int = static_field(default=1)

    def __call__(self, x):
        return x[:1]


@pytree_dataclass
class LinearStateSystemOutput(SystemOutput):
    """y = C x (ref: output_function_interface.h linear output)."""

    C: jax.Array = None

    @staticmethod
    def from_matrix(C) -> "LinearStateSystemOutput":
        C = jnp.asarray(C)
        return LinearStateSystemOutput(ny=C.shape[0], C=C)

    def __call__(self, x):
        return self.C @ x
