"""Simulated plants and disturbances.

Ref parity:
  - PlantInterface::control(u_seq, x_seq, dt, t) / output(y, t)
    (ref: src/plants/include/corbo-plants/plant_interface.h:54,98-124)
  - SimulatedPlant: integrates the system dynamics with a configurable
    integrator, applies an output function, injects state/input/output
    disturbances (simulated_plant.h:56; disturbances.h:35
    DisturbanceGaussianNoise)
  - SimulatedPlantThreaded (simulated_plant_threaded.h:52): the reference
    runs the sim loop in its own thread at a fixed rate. TPU-native
    equivalent: the plant is a pure transition function fused into the
    closed-loop `lax.scan` — there is no asynchrony to emulate because the
    whole loop is one device-side program; wall-clock-real-time execution
    (when driving hardware) lives in sim/realtime.py.

A plant is a pure function step(state, u, dt, key) -> (state', y).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from control_box_rst_tpu.models.base import SystemDynamics
from control_box_rst_tpu.ops.integrators import ExplicitIntegrator, make_integrator
from control_box_rst_tpu.utils.tree import pytree_dataclass, static_field


@pytree_dataclass
class GaussianNoise:
    """Additive Gaussian disturbance (ref: DisturbanceGaussianNoise,
    plants/disturbances.h:35)."""

    mean: jax.Array = 0.0
    std: jax.Array = 0.0

    def __call__(self, key, shape, dtype):
        return self.mean + self.std * jax.random.normal(key, shape, dtype)


@pytree_dataclass
class SimulatedPlant:
    """Integrates `system` over each control interval (ZOH input).

    output: 'full' → y = x (ref FullStateSystemOutput,
    output_function_interface.h:115); 'first' → y = x[:1]; or a C matrix.
    """

    system: SystemDynamics = None
    integrator: ExplicitIntegrator = None
    output_kind: str = static_field(default="full")
    C: jax.Array = None  # used when output_kind == "linear"
    state_noise: Optional[GaussianNoise] = None
    output_noise: Optional[GaussianNoise] = None
    input_noise: Optional[GaussianNoise] = None

    def __post_init__(self):
        if self.integrator is None:
            object.__setattr__(self, "integrator", make_integrator("rk4", 4))

    @property
    def nx(self):
        return self.system.nx

    @property
    def ny(self):
        if self.output_kind == "full":
            return self.system.nx
        if self.output_kind == "first":
            return 1
        return self.C.shape[0]

    def step(self, x: jax.Array, u: jax.Array, dt, key) -> jax.Array:
        """Advance the true state by one control interval."""
        ku, kx = jax.random.split(key)
        if self.input_noise is not None:
            u = u + self.input_noise(ku, u.shape, u.dtype)
        if self.system.continuous_time:
            x_next = self.integrator.solve_ivp(self.system, x, u, dt)
        else:
            x_next = self.system(x, u)
        if self.state_noise is not None:
            x_next = x_next + self.state_noise(kx, x_next.shape, x_next.dtype)
        return x_next

    def output(self, x: jax.Array, key) -> jax.Array:
        if self.output_kind == "full":
            y = x
        elif self.output_kind == "first":
            y = x[:1]
        else:
            y = self.C @ x
        if self.output_noise is not None:
            y = y + self.output_noise(key, y.shape, y.dtype)
        return y
