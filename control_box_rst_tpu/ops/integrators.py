"""Explicit numerical integrators as pure, vmappable JAX functions.

Ref parity: `NumericalIntegratorExplicitInterface::solveIVP(x1, u1, dt, f, x2)`
and the fixed-step explicit family Euler / RK2..RK7, adaptive step size, and
multi-stage fixed/scaled integrators
(ref: src/numerics/include/corbo-numerics/explicit_integrators.h:47-1111,
integrator_interface.h:158-231).

TPU-first redesign: each integrator is a Butcher tableau driven by an
unrolled stage loop (stage counts are tiny and static, so unrolling lets XLA
fuse everything into one kernel); multi-step variants use `lax.scan`.
Controls are held constant over the step (zero-order hold), matching the
reference's `solveIVP(x1, u1, dt, system)` contract. The default equality
defect `solveIVP(x1,u1,dt) - x2` (integrator_interface.h:219-231) lives in
`ocp/transcribe.py` (multiple-shooting defect).

The adaptive-step integrator of the reference shrinks dt dynamically — a
data-dependent loop that would defeat jit. `IntegratorAdaptiveStepSize` here
runs a *fixed* number of substeps with an embedded error estimate and a
per-substep accepted/rejected mask (static shapes, same control flow on every
lane of a batch).
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from control_box_rst_tpu.core.factory import register
from control_box_rst_tpu.utils.tree import pytree_dataclass, static_field

DynamicsFn = Callable[[jax.Array, jax.Array], jax.Array]


# --------------------------------------------------------------------------
# Butcher tableaus (classical coefficients; np arrays are static constants)
# --------------------------------------------------------------------------

def _tableau(a, b, c):
    return (
        np.asarray(a, dtype=np.float64),
        np.asarray(b, dtype=np.float64),
        np.asarray(c, dtype=np.float64),
    )


_EULER = _tableau([[0.0]], [1.0], [0.0])

# Heun's method (matches reference RK2, explicit_integrators.h:97-124:
# k2 = f(x + dt k1), x2 = x + (k1+k2)/2)
_RK2 = _tableau([[0, 0], [1.0, 0]], [0.5, 0.5], [0, 1.0])

# Kutta's third-order method (ref RK3, explicit_integrators.h:167)
_RK3 = _tableau(
    [[0, 0, 0], [0.5, 0, 0], [-1, 2, 0]],
    [1 / 6, 4 / 6, 1 / 6],
    [0, 0.5, 1],
)

# Classical RK4 (ref explicit_integrators.h:244)
_RK4 = _tableau(
    [[0, 0, 0, 0], [0.5, 0, 0, 0], [0, 0.5, 0, 0], [0, 0, 1, 0]],
    [1 / 6, 1 / 3, 1 / 3, 1 / 6],
    [0, 0.5, 0.5, 1],
)

# 6-stage 5th-order method matching the reference RK5
# (explicit_integrators.h:327-425: k2 = f(x + 4/11 dt k1), …,
#  x2 = x + (4 k1 + (16+√6) k5 + (16-√6) k6)/36).
_S6 = np.sqrt(6.0)
_RK5 = _tableau(
    [
        [0] * 6,
        [4 / 11, 0, 0, 0, 0, 0],
        [9 / 50, 11 / 50, 0, 0, 0, 0],
        [0, -11 / 4, 15 / 4, 0, 0, 0],
        [(81 + 9 * _S6) / 600, 0, (255 - 55 * _S6) / 600, (24 - 14 * _S6) / 600, 0, 0],
        [(81 - 9 * _S6) / 600, 0, (255 + 55 * _S6) / 600, (24 + 14 * _S6) / 600, 0, 0],
    ],
    [4 / 36, 0, 0, 0, (16 + _S6) / 36, (16 - _S6) / 36],
    [0, 4 / 11, 2 / 5, 1, 0.5, 0.5],
)

# Dormand-Prince 5(4) embedded pair — used by the adaptive-step integrator.
_DOPRI = _tableau(
    [
        [0, 0, 0, 0, 0, 0, 0],
        [1 / 5, 0, 0, 0, 0, 0, 0],
        [3 / 40, 9 / 40, 0, 0, 0, 0, 0],
        [44 / 45, -56 / 15, 32 / 9, 0, 0, 0, 0],
        [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729, 0, 0, 0],
        [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656, 0, 0],
        [35 / 384, 0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0],
    ],
    [35 / 384, 0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0],
    [0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1, 1],
)
# Embedded 4th-order weights for error estimation (adaptive integrator)
_DOPRI_B4 = np.array(
    [5179 / 57600, 0, 7571 / 16695, 393 / 640, -92097 / 339200, 187 / 2100, 1 / 40],
    dtype=np.float64,
)

# Butcher's classical 7-stage 6th-order method.
# NOTE: the reference's RK6 (explicit_integrators.h:429-537) transcribes its
# tableau inconsistently — its weights fail the order-2 condition b·c = 1/2
# (numerically verified: observed convergence order 1). We deliberately ship a
# correct 6th-order method instead of reproducing that defect.
_RK6 = _tableau(
    [
        [0, 0, 0, 0, 0, 0, 0],
        [1 / 3, 0, 0, 0, 0, 0, 0],
        [0, 2 / 3, 0, 0, 0, 0, 0],
        [1 / 12, 1 / 3, -1 / 12, 0, 0, 0, 0],
        [-1 / 16, 9 / 8, -3 / 16, -3 / 8, 0, 0, 0],
        [0, 9 / 8, -3 / 8, -3 / 4, 1 / 2, 0, 0],
        [9 / 44, -9 / 11, 63 / 44, 18 / 11, 0, -16 / 11, 0],
    ],
    [11 / 120, 0, 27 / 40, 27 / 40, -4 / 15, -4 / 15, 11 / 120],
    [0, 1 / 3, 2 / 3, 1 / 3, 1 / 2, 1 / 2, 1],
)

# Fehlberg's 11-stage RK7(8), 7th-order weights — the same method as the
# reference RK7 (explicit_integrators.h:541-637; stage coefficients there are
# these fractions with common denominators, e.g. k5 uses (80,-300,300)/192 =
# (5/12, -25/16, 25/16)).
_RK7 = _tableau(
    [
        [0] * 11,
        [2 / 27] + [0] * 10,
        [1 / 36, 3 / 36] + [0] * 9,
        [1 / 24, 0, 3 / 24] + [0] * 8,
        [80 / 192, 0, -300 / 192, 300 / 192] + [0] * 7,
        [1 / 20, 0, 0, 5 / 20, 4 / 20] + [0] * 6,
        [-25 / 108, 0, 0, 125 / 108, -260 / 108, 250 / 108] + [0] * 5,
        [93 / 900, 0, 0, 0, 244 / 900, -200 / 900, 13 / 900] + [0] * 4,
        [2, 0, 0, -53 / 6, 1408 / 90, -1070 / 90, 67 / 90, 3] + [0] * 3,
        [-12285 / 14580, 0, 0, 3105 / 14580, -105408 / 14580, 83970 / 14580,
         -4617 / 14580, 41310 / 14580, -1215 / 14580] + [0] * 2,
        [2383 / 4100, 0, 0, -8525 / 4100, 17984 / 4100, -15050 / 4100,
         2133 / 4100, 2250 / 4100, 1125 / 4100, 1800 / 4100, 0],
    ],
    [41 / 840, 0, 0, 0, 0, 272 / 840, 216 / 840, 216 / 840, 27 / 840,
     27 / 840, 41 / 840],
    [0, 2 / 27, 1 / 9, 1 / 6, 5 / 12, 1 / 2, 5 / 6, 1 / 6, 2 / 3, 1 / 3, 1],
)


def _rk_step(tableau, f: DynamicsFn, x: jax.Array, u: jax.Array, dt) -> jax.Array:
    """One explicit Runge-Kutta step with ZOH control (tableau is static)."""
    A, b, c = tableau
    s = len(b)
    ks = []
    for i in range(s):
        xi = x
        for j in range(i):
            if A[i][j] != 0.0:
                xi = xi + dt * A[i][j] * ks[j]
        ks.append(f(xi, u))
    out = x
    for i in range(s):
        if b[i] != 0.0:
            out = out + dt * b[i] * ks[i]
    return out


# --------------------------------------------------------------------------
# Integrator objects
# --------------------------------------------------------------------------

@pytree_dataclass
class ExplicitIntegrator:
    """Fixed-step explicit RK integrator defined by a Butcher tableau.

    `solve_ivp(f, x, u, dt)` integrates xdot = f(x, u) over [0, dt] with
    `num_substeps` equal substeps (lax.scan). Matches the reference's
    `solveIVP` contract (integrator_interface.h:199-217).
    """

    order: int = static_field(default=4)
    num_substeps: int = static_field(default=1)
    name: str = static_field(default="rk4")

    def _tableau(self):
        return _TABLEAUS[self.name]

    def step(self, f: DynamicsFn, x: jax.Array, u: jax.Array, dt) -> jax.Array:
        """Single step of size dt (no substepping)."""
        return _rk_step(self._tableau(), f, x, u, dt)

    def solve_ivp(self, f: DynamicsFn, x: jax.Array, u: jax.Array, dt) -> jax.Array:
        if self.num_substeps == 1:
            return self.step(f, x, u, dt)
        h = dt / self.num_substeps
        tab = self._tableau()

        def body(xk, _):
            return _rk_step(tab, f, xk, u, h), None

        out, _ = jax.lax.scan(body, x, None, length=self.num_substeps)
        return out

    def solve_ivp_traj(
        self, f: DynamicsFn, x: jax.Array, u: jax.Array, dt
    ) -> jax.Array:
        """Integrate and return all substep states, shape [num_substeps+1, nx]."""
        h = dt / self.num_substeps
        tab = self._tableau()

        def body(xk, _):
            xn = _rk_step(tab, f, xk, u, h)
            return xn, xn

        _, traj = jax.lax.scan(body, x, None, length=self.num_substeps)
        return jnp.concatenate([x[None], traj], axis=0)


_TABLEAUS = {
    "euler": _EULER,
    "rk2": _RK2,
    "rk3": _RK3,
    "rk4": _RK4,
    "rk5": _RK5,
    "rk6": _RK6,
    "rk7": _RK7,
}

_ORDERS = {"euler": 1, "rk2": 2, "rk3": 3, "rk4": 4, "rk5": 5, "rk6": 6, "rk7": 7}


def make_integrator(name: str = "rk4", num_substeps: int = 1) -> ExplicitIntegrator:
    """Factory: euler | rk2..rk7. (ref classes explicit_integrators.h:47-671)"""
    if name not in _TABLEAUS:
        raise KeyError(f"unknown integrator {name!r}; have {sorted(_TABLEAUS)}")
    return ExplicitIntegrator(order=_ORDERS[name], num_substeps=num_substeps, name=name)


for _n in _TABLEAUS:
    register("integrator", _n)(
        lambda name=_n, num_substeps=1: make_integrator(name, num_substeps)
    )


@pytree_dataclass
class AdaptiveStepIntegrator:
    """Embedded Dormand-Prince 5(4) with per-substep step-size control.

    Ref parity: `IntegratorAdaptiveStepSize` (explicit_integrators.h:672-888).
    TPU redesign: a *fixed* budget of `max_substeps` DOPRI stages; each substep
    proposes h, accepts/rejects on the embedded error estimate, and rescales
    h — all with static shapes and per-lane state so it vmaps. Integration
    stops (masks to identity) once accumulated time reaches dt.
    """

    abs_tol: jax.Array = 1e-6
    max_substeps: int = static_field(default=32)

    def solve_ivp(self, f: DynamicsFn, x: jax.Array, u: jax.Array, dt) -> jax.Array:
        A, b, c = _DOPRI

        def dopri_pair(xk, h):
            ks = []
            for i in range(7):
                xi = xk
                for j in range(i):
                    if A[i][j] != 0.0:
                        xi = xi + h * A[i][j] * ks[j]
                ks.append(f(xi, u))
            x5 = xk
            x4 = xk
            for i in range(7):
                if b[i] != 0.0:
                    x5 = x5 + h * b[i] * ks[i]
                if _DOPRI_B4[i] != 0.0:
                    x4 = x4 + h * _DOPRI_B4[i] * ks[i]
            return x5, x4

        def body(carry, _):
            xk, t, h = carry
            remaining = dt - t
            h_eff = jnp.minimum(h, remaining)
            x5, x4 = dopri_pair(xk, h_eff)
            err = jnp.max(jnp.abs(x5 - x4))
            accept = err <= self.abs_tol
            done = remaining <= 1e-12
            x_new = jnp.where(done | ~accept, xk, x5)
            t_new = jnp.where(done | ~accept, t, t + h_eff)
            # PI-free step-size update: classic 0.9 * (tol/err)^(1/5), clipped.
            scale = 0.9 * (self.abs_tol / (err + 1e-30)) ** 0.2
            h_new = jnp.where(done, h, h_eff * jnp.clip(scale, 0.2, 5.0))
            h_new = jnp.maximum(h_new, dt * 1e-6)
            return (x_new, t_new, h_new), None

        init = (x, jnp.zeros_like(jnp.asarray(dt)), jnp.asarray(dt, dtype=x.dtype))
        (xf, tf, _), _ = jax.lax.scan(body, init, None, length=self.max_substeps)
        return xf


@pytree_dataclass
class MultiStageFixedStep:
    """Fixed substep count wrapper (ref IntegratorMultiStageFixedStep,
    explicit_integrators.h:890): inner integrator applied n times with h=dt/n."""

    inner: ExplicitIntegrator = None
    n: int = static_field(default=10)

    def solve_ivp(self, f, x, u, dt):
        return self.inner.replace(num_substeps=self.n).solve_ivp(f, x, u, dt)


@pytree_dataclass
class MultiStageScaled:
    """Substep count scaled by dt (ref IntegratorMultiStageScaled,
    explicit_integrators.h:1011): n = ceil(dt / dt_ref), statically bounded.

    Under jit dt is traced, so the substep count is fixed to `n_max` and the
    effective step is dt/n_max — a conservative, shape-static equivalent.
    """

    inner: ExplicitIntegrator = None
    dt_ref: jax.Array = 0.1
    n_max: int = static_field(default=10)

    def solve_ivp(self, f, x, u, dt):
        return self.inner.replace(num_substeps=self.n_max).solve_ivp(f, x, u, dt)
