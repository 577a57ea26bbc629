"""Benchmark dynamics systems.

Ref parity: every model from
`src/systems/include/corbo-systems/benchmark/linear_benchmark_systems.h`
(SerialIntegratorSystem:50, ParallelIntegratorSystem:120,
LinearStateSpaceModel:186, DoubleIntegratorDiscreteTime:298) and
`.../nonlinear_benchmark_systems.h` (VanDerPolOscillator:32,
DuffingOscillator:88, FreeSpaceRocket:154, SimplePendulum:187,
MasslessPendulum:261, CartPole:317, ToyExample:406, ArtsteinsCircle:463),
re-expressed as pure JAX functions with identical equations and default
parameters (verified against the C++ source; equations re-derived, not
copied). Parameters are pytree leaves, so a *batch of systems with different
parameters* vmaps for free — the TPU-native replacement for the reference's
sequential parameter sweeps.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from control_box_rst_tpu.core.factory import register
from control_box_rst_tpu.models.base import SystemDynamics
from control_box_rst_tpu.utils.tree import pytree_dataclass, static_field


# --------------------------------------------------------------------------
# Linear benchmark systems (ref: linear_benchmark_systems.h)
# --------------------------------------------------------------------------

@register("system", "serial_integrators")
@pytree_dataclass
class SerialIntegratorSystem(SystemDynamics):
    """Chain of n integrators: x^(n) = u / T.
    (ref: linear_benchmark_systems.h:50-117; dynamics at :75-81)"""

    nx: int = static_field(default=2)
    nu: int = static_field(default=1)
    time_constant: jax.Array = 1.0

    def __call__(self, x, u):
        # xdot[i] = x[i+1] for i < n-1; xdot[n-1] = u / T
        return jnp.concatenate([x[1:], u[:1] / self.time_constant])

    @property
    def is_linear(self):
        return True


@register("system", "parallel_integrators")
@pytree_dataclass
class ParallelIntegratorSystem(SystemDynamics):
    """n decoupled single integrators: xdot = T * u.
    (ref: linear_benchmark_systems.h:120-183; dynamics at :147)"""

    nx: int = static_field(default=2)
    nu: int = static_field(default=2)
    time_constant: jax.Array = 1.0

    def __call__(self, x, u):
        return self.time_constant * u

    @property
    def is_linear(self):
        return True


@register("system", "linear_state_space")
@pytree_dataclass
class LinearStateSpaceModel(SystemDynamics):
    """xdot = A x + B u. (ref: linear_benchmark_systems.h:186-281)"""

    nx: int = static_field(default=1)
    nu: int = static_field(default=1)
    A: jax.Array = None
    B: jax.Array = None

    @staticmethod
    def from_matrices(A, B) -> "LinearStateSpaceModel":
        A = jnp.asarray(A, dtype=jnp.float32)
        B = jnp.asarray(B, dtype=jnp.float32)
        return LinearStateSpaceModel(nx=A.shape[0], nu=B.shape[1], A=A, B=B)

    def __call__(self, x, u):
        return self.A @ x + self.B @ u

    @property
    def is_linear(self):
        return True


@register("system", "double_integrator_discrete")
@pytree_dataclass
class DoubleIntegratorDiscreteTime(SystemDynamics):
    """Exact discrete double integrator:
    x1+ = x1 + dt x2 + dt²/2 u;  x2+ = x2 + dt u.
    (ref: linear_benchmark_systems.h:298-349; dynamics at :323-324)"""

    nx: int = static_field(default=2)
    nu: int = static_field(default=1)
    continuous_time: bool = static_field(default=False)
    dt: jax.Array = 1.0

    def __call__(self, x, u):
        return jnp.stack(
            [x[0] + self.dt * x[1] + 0.5 * self.dt**2 * u[0], x[1] + self.dt * u[0]]
        )

    @property
    def is_linear(self):
        return True


def DoubleIntegratorContinuous(time_constant: float = 1.0) -> SerialIntegratorSystem:
    """BASELINE config 1 model: continuous double integrator
    (SerialIntegratorSystem with dimension 2, ref linear_benchmark_systems.h:50)."""
    return SerialIntegratorSystem(nx=2, nu=1, time_constant=time_constant)


# --------------------------------------------------------------------------
# Nonlinear benchmark systems (ref: nonlinear_benchmark_systems.h)
# --------------------------------------------------------------------------

@register("system", "van_der_pol")
@pytree_dataclass
class VanDerPolOscillator(SystemDynamics):
    """xdot1 = x2; xdot2 = -a(x1²-1)x2 - x1 + u.
    (ref: nonlinear_benchmark_systems.h:32-86; dynamics at :58-59)"""

    nx: int = static_field(default=2)
    nu: int = static_field(default=1)
    a: jax.Array = 1.0

    def __call__(self, x, u):
        return jnp.stack(
            [x[1], -self.a * (x[0] ** 2 - 1.0) * x[1] - x[0] + u[0]]
        )


@register("system", "duffing")
@pytree_dataclass
class DuffingOscillator(SystemDynamics):
    """xdot2 = -d x2 - α x1 - β x1³ + u.
    (ref: nonlinear_benchmark_systems.h:88-152)"""

    nx: int = static_field(default=2)
    nu: int = static_field(default=1)
    damping: jax.Array = 1.0
    spring_alpha: jax.Array = 1.0
    spring_beta: jax.Array = 1.0

    def __call__(self, x, u):
        return jnp.stack(
            [
                x[1],
                -self.damping * x[1]
                - self.spring_alpha * x[0]
                - self.spring_beta * x[0] ** 3
                + u[0],
            ]
        )


@register("system", "free_space_rocket")
@pytree_dataclass
class FreeSpaceRocket(SystemDynamics):
    """[s, v, m]: sdot=v; vdot=(u-0.02 v²)/m; mdot=-0.01 u².
    (ref: nonlinear_benchmark_systems.h:154-185)"""

    nx: int = static_field(default=3)
    nu: int = static_field(default=1)

    def __call__(self, x, u):
        return jnp.stack(
            [x[1], (u[0] - 0.02 * x[1] ** 2) / x[2], -0.01 * u[0] ** 2]
        )


@register("system", "simple_pendulum")
@pytree_dataclass
class SimplePendulum(SystemDynamics):
    """phiddot = u - rho/(m l²) phidot - g/l sin(phi).
    (ref: nonlinear_benchmark_systems.h:187-259)"""

    nx: int = static_field(default=2)
    nu: int = static_field(default=1)
    m: jax.Array = 0.205
    l: jax.Array = 0.34
    g: jax.Array = 9.81
    rho: jax.Array = 0.0

    def __call__(self, x, u):
        return jnp.stack(
            [
                x[1],
                u[0]
                - self.rho / (self.m * self.l**2) * x[1]
                - self.g / self.l * jnp.sin(x[0]),
            ]
        )


@register("system", "massless_pendulum")
@pytree_dataclass
class MasslessPendulum(SystemDynamics):
    """phiddot = u - ω₀ sin(phi). (ref: nonlinear_benchmark_systems.h:261-315)"""

    nx: int = static_field(default=2)
    nu: int = static_field(default=1)
    omega0: jax.Array = 1.0

    def __call__(self, x, u):
        return jnp.stack([x[1], u[0] - self.omega0 * jnp.sin(x[0])])


@register("system", "cart_pole")
@pytree_dataclass
class CartPole(SystemDynamics):
    """State [p, phi, pdot, phidot], force input; standard cart-pole equations.
    (ref: nonlinear_benchmark_systems.h:317-404; dynamics at :346-353)"""

    nx: int = static_field(default=4)
    nu: int = static_field(default=1)
    mc: jax.Array = 1.0
    mp: jax.Array = 0.3
    l: jax.Array = 0.5
    g: jax.Array = 9.81

    def __call__(self, x, u):
        sin_phi = jnp.sin(x[1])
        cos_phi = jnp.cos(x[1])
        sin_phi_phidot_sq = sin_phi * x[3] ** 2
        denom = self.mc + self.mp * (1.0 - cos_phi**2)
        acc = (
            self.l * self.mp * sin_phi_phidot_sq
            + u[0]
            + self.mp * self.g * cos_phi * sin_phi
        ) / denom
        ang = -(
            self.l * self.mp * cos_phi * sin_phi_phidot_sq
            + u[0] * cos_phi
            + (self.mp + self.mc) * self.g * sin_phi
        ) / (self.l * denom)
        return jnp.stack([x[2], x[3], acc, ang])


@register("system", "toy_example")
@pytree_dataclass
class ToyExample(SystemDynamics):
    """Chen/Allgöwer quasi-infinite-horizon NMPC toy system.
    (ref: nonlinear_benchmark_systems.h:406-461)"""

    nx: int = static_field(default=2)
    nu: int = static_field(default=1)
    mu: jax.Array = 0.5

    def __call__(self, x, u):
        return jnp.stack(
            [
                x[1] + u[0] * (self.mu + (1.0 - self.mu) * x[0]),
                x[0] + u[0] * (self.mu - 4.0 * (1.0 - self.mu) * x[1]),
            ]
        )


@register("system", "artsteins_circle")
@pytree_dataclass
class ArtsteinsCircle(SystemDynamics):
    """xdot1 = (x1²-x2²)u; xdot2 = 2 x1 x2 u.
    (ref: nonlinear_benchmark_systems.h:463-end)"""

    nx: int = static_field(default=2)
    nu: int = static_field(default=1)

    def __call__(self, x, u):
        return jnp.stack(
            [(x[0] ** 2 - x[1] ** 2) * u[0], 2.0 * x[0] * x[1] * u[0]]
        )


ALL_BENCHMARK_SYSTEMS = [
    SerialIntegratorSystem,
    ParallelIntegratorSystem,
    LinearStateSpaceModel,
    DoubleIntegratorDiscreteTime,
    VanDerPolOscillator,
    DuffingOscillator,
    FreeSpaceRocket,
    SimplePendulum,
    MasslessPendulum,
    CartPole,
    ToyExample,
    ArtsteinsCircle,
]
