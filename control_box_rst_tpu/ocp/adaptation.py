"""Grid adaptation strategies under static shapes.

Ref parity: the variable-grid adaptation of
  - FiniteDifferencesVariableGrid: TimeBasedSingleStep,
    TimeBasedAggressiveEstimate, SimpleShrinkingHorizon with dt hysteresis
    and n_min/n_max (ref: src/.../finite_differences_variable_grid.cpp:66-180)
  - NonUniformFiniteDifferencesVariableGrid: RedundantControls — remove
    intervals whose controls repeat, insert midpoints into the largest-dt
    interval (ref: non_uniform_finite_differences_variable_grid.cpp:259-352)

TPU-first redesign (SURVEY.md §7 hard part (a)): the reference resizes
vertex containers; under jit shapes are frozen, so adaptation changes the
*active interval count* n ≤ N_max plus a resampling of the trajectory arrays
— pure gathers, no recompilation, vmappable (every lane of a batch can carry
a different active horizon).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from control_box_rst_tpu.utils.tree import pytree_dataclass, static_field


def stage_mask_from_n(n_active, N: int, dtype=jnp.float32) -> jax.Array:
    return (jnp.arange(N) < n_active).astype(dtype)


def resample_W(W: jax.Array, nx: int, nu: int, n_old, n_new, N: int) -> jax.Array:
    """Resample the active portion of W = [x;u;dt] stages onto n_new uniform
    intervals (ref: FullDiscretizationGridBase::resampleTrajectory — linear
    state interpolation, ZOH controls). Pure gather version: n_old/n_new are
    traced scalars, shapes stay [N+1, nz]."""
    dtype = W.dtype
    dts = W[:-1, nx + nu]
    mask = stage_mask_from_n(n_old, N, dtype)
    dts_act = dts * mask
    T = jnp.sum(dts_act)
    # cumulative stage times of the old grid (tail holds T)
    t_old = jnp.concatenate([jnp.zeros((1,), dtype), jnp.cumsum(dts_act)])
    # new uniform times: i*T/n_new for i <= n_new, then hold T
    dt_new = T / jnp.maximum(n_new, 1).astype(dtype)
    i = jnp.arange(N + 1, dtype=dtype)
    t_new = jnp.minimum(i, n_new.astype(dtype)) * dt_new

    # linear interpolation of states over t_old
    def interp_state(t):
        idx = jnp.clip(jnp.searchsorted(t_old, t, side="right") - 1, 0, N - 1)
        t0, t1 = t_old[idx], t_old[idx + 1]
        w = jnp.where(t1 > t0, (t - t0) / jnp.where(t1 > t0, t1 - t0, 1.0), 0.0)
        return W[idx, :nx] + w * (W[idx + 1, :nx] - W[idx, :nx])

    X_new = jax.vmap(interp_state)(t_new)

    # ZOH controls at interval start times
    def interp_u(t):
        idx = jnp.clip(jnp.searchsorted(t_old, t, side="right") - 1, 0, N - 1)
        return W[idx, nx : nx + nu]

    U_new = jax.vmap(interp_u)(t_new[:-1])
    new_mask = stage_mask_from_n(n_new, N, dtype)
    dts_new = jnp.where(new_mask > 0, dt_new, 0.0)

    W_out = jnp.concatenate(
        [
            X_new,
            jnp.concatenate([U_new, jnp.zeros((1, nu), dtype)], axis=0),
            jnp.concatenate([dts_new, jnp.zeros((1,), dtype)], axis=0)[:, None],
        ],
        axis=-1,
    )
    return W_out


@pytree_dataclass
class GridAdaptation:
    """Base: no adaptation (ref GridAdaptStrategy::NoGridAdapt)."""

    n_min: int = static_field(default=2)
    n_max: int = static_field(default=0)  # 0 → use grid N

    def adapt(self, W, n_active, nx: int, nu: int, N: int, feas=None):
        return W, n_active


@pytree_dataclass
class TimeBasedSingleStep(GridAdaptation):
    """Grow/shrink n by one when dt leaves the hysteresis band around dt_ref
    (ref: adaptGridTimeBasedSingleStep, finite_differences_variable_grid.cpp
    :101-122)."""

    dt_ref: jax.Array = 0.1
    dt_hyst_ratio: jax.Array = 0.1

    def adapt(self, W, n_active, nx: int, nu: int, N: int, feas=None):
        n_max = self.n_max or N
        dts = W[:-1, nx + nu]
        mask = stage_mask_from_n(n_active, N, W.dtype)
        dt = jnp.sum(dts * mask) / jnp.maximum(n_active, 1).astype(W.dtype)
        grow = (dt > self.dt_ref * (1.0 + self.dt_hyst_ratio)) & (n_active < n_max)
        shrink = (dt < self.dt_ref * (1.0 - self.dt_hyst_ratio)) & (
            n_active > self.n_min
        )
        n_new = jnp.where(grow, n_active + 1, jnp.where(shrink, n_active - 1, n_active))
        W_new = resample_W(W, nx, nu, n_active, n_new, N)
        return W_new, n_new


@pytree_dataclass
class TimeBasedAggressiveEstimate(GridAdaptation):
    """n_new = round(n · dt/dt_ref), clipped (ref: adaptGridTimeBasedAggressive
    Estimate, finite_differences_variable_grid.cpp:124-152)."""

    dt_ref: jax.Array = 0.1
    dt_hyst_ratio: jax.Array = 0.1

    def adapt(self, W, n_active, nx: int, nu: int, N: int, feas=None):
        n_max = self.n_max or N
        dts = W[:-1, nx + nu]
        mask = stage_mask_from_n(n_active, N, W.dtype)
        dt = jnp.sum(dts * mask) / jnp.maximum(n_active, 1).astype(W.dtype)
        within = (dt >= self.dt_ref * (1.0 - self.dt_hyst_ratio)) & (
            dt <= self.dt_ref * (1.0 + self.dt_hyst_ratio)
        )
        est = jnp.round(n_active.astype(W.dtype) * dt / self.dt_ref).astype(n_active.dtype)
        n_new = jnp.clip(est, self.n_min, n_max)
        n_new = jnp.where(within, n_active, n_new)
        W_new = resample_W(W, nx, nu, n_active, n_new, N)
        return W_new, n_new


@pytree_dataclass
class SimpleShrinkingHorizon(GridAdaptation):
    """Remove one interval per step until n_min (ref: adaptGridSimpleShrinking
    Horizon, finite_differences_variable_grid.cpp:154-163)."""

    def adapt(self, W, n_active, nx: int, nu: int, N: int, feas=None):
        n_new = jnp.maximum(n_active - 1, self.n_min)
        W_new = resample_W(W, nx, nu, n_active, n_new, N)
        return W_new, n_new


@pytree_dataclass
class GrowOnInfeasibility(GridAdaptation):
    """Grow the horizon by one interval after an infeasible solve.

    Ref parity: `_increase_n_if_infeas` — when the solver reports neither
    Converged nor EarlyTerminated, the grid grows for the next OCP
    iteration (`_grid->setN(_grid->getN() + 1)`, ref:
    src/optimal_control/src/structured_ocp/structured_optimal_control_
    problem.cpp:135-140).

    TPU redesign: infeasibility is signalled by the previous solve's
    constraint violation `feas` (the controller feeds carry.feas_prev);
    growth activates one more masked interval (no recompile, vmappable —
    each batch lane grows independently). The newly activated interval
    inherits the last active interval's control and dt; its state rows
    already hold the terminal state via the inactive identity chain
    (ocp/transcribe.py interval_residual), so the warm start stays
    consistent."""

    feas_tol: float = static_field(default=1e-3)

    def adapt(self, W, n_active, nx: int, nu: int, N: int, feas=None):
        if feas is None:
            return W, n_active
        n_max = self.n_max or N
        grow = (feas > self.feas_tol) & (n_active < n_max)
        k_new = jnp.minimum(n_active, N - 1)
        k_last = jnp.maximum(n_active - 1, 0)
        row = W[k_new]
        row = row.at[nx : nx + nu].set(W[k_last, nx : nx + nu])
        row = row.at[nx + nu].set(W[k_last, nx + nu])
        W_new = W.at[k_new].set(jnp.where(grow, row, W[k_new]))
        n_new = jnp.where(grow, n_active + 1, n_active)
        return W_new, n_new


@pytree_dataclass
class RedundantControls(GridAdaptation):
    """Non-uniform grid refinement (ref: adaptGridRedundantControls,
    non_uniform_finite_differences_variable_grid.cpp:259-352): count
    intervals whose next control is (componentwise) within epsilon or whose
    dt collapsed; keep `backup` of them as reserve. Too few → split the
    largest-dt interval (insert midpoint); too many → merge the first
    redundant interval into its successor. One structural change per call
    (the reference loops; a single step per MPC iteration converges the same
    way and keeps the jitted program simple)."""

    epsilon: jax.Array = 0.1
    backup: int = static_field(default=1)

    def adapt(self, W, n_active, nx: int, nu: int, N: int, feas=None):
        n_max = self.n_max or N
        dtype = W.dtype
        dts = W[:-1, nx + nu]
        U = W[:-1, nx : nx + nu]
        idx = jnp.arange(N)
        # redundant interval k: active, k < n-1, and u_{k+1} ≈ u_k or dt tiny
        act_pair = (idx < n_active - 1)
        du = jnp.max(jnp.abs(jnp.roll(U, -1, axis=0) - U), axis=-1)
        redundant = act_pair & ((du <= self.epsilon) | (dts < 1e-6))
        n_red = jnp.sum(redundant.astype(jnp.int32))

        need_split = (n_red < self.backup) & (n_active < n_max)
        need_merge = (n_red > self.backup) & (n_active > self.n_min)

        # --- split: halve the largest-dt active interval, insert midpoint --
        mask = stage_mask_from_n(n_active, N, dtype)
        dts_act = jnp.where(mask > 0, dts, -jnp.inf)
        k_split = jnp.argmax(dts_act)

        def do_split(W):
            # shift stages > k_split right by one; insert midpoint state
            src = jnp.arange(N + 1)
            gather = jnp.where(src <= k_split, src, src - 1)
            W_s = W[gather]
            x_mid = 0.5 * (W[k_split, :nx] + W[k_split + 1, :nx])
            half = 0.5 * W[k_split, nx + nu]
            W_s = W_s.at[k_split, nx + nu].set(half)
            row = jnp.concatenate(
                [x_mid, W[k_split, nx : nx + nu], jnp.asarray([half], dtype)]
            )
            W_s = W_s.at[k_split + 1].set(row)
            return W_s

        # --- merge: first redundant interval absorbs its successor ---------
        k_merge = jnp.argmax(redundant)  # first True

        def do_merge(W):
            merged_dt = W[k_merge, nx + nu] + W[k_merge + 1, nx + nu]
            src = jnp.arange(N + 1)
            gather = jnp.where(src <= k_merge, src, jnp.minimum(src + 1, N))
            W_m = W[gather]
            W_m = W_m.at[k_merge, nx + nu].set(merged_dt)
            return W_m

        W_split = do_split(W)
        W_merge = do_merge(W)
        W_new = jnp.where(need_split, W_split, jnp.where(need_merge, W_merge, W))
        n_new = jnp.where(
            need_split, n_active + 1, jnp.where(need_merge, n_active - 1, n_active)
        )
        return W_new, n_new
