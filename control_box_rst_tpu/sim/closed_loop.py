"""Closed-loop control task as a single device-side scan.

Ref parity: `ClosedLoopControlTask::performTask`
(ref: src/tasks/src/task_closed_loop_control.cpp:82-268) — the reference's
host loop {plant output → observer → controller step → plant control →
rate sleep} with per-step signal emission.

TPU-first redesign (SURVEY.md §2.7 / §5): the entire closed loop is ONE
`lax.scan` over time steps — plant, observer and the full SQP solve are
fused into a single compiled program, so an H-step simulated experiment runs
without any host↔device round trips, and `vmap` turns it into thousands of
parallel closed-loop rollouts (BASELINE config 5). "Signals" are the stacked
scan outputs (see core/signals.py for the named-signal tree built on top).

Failure handling parity: on controller failure the reference commands zero
controls (task_closed_loop_control.cpp:200-206) — here the per-lane `ok`
flag gates the applied control the same way.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from control_box_rst_tpu.sim.observer import NoObserver
from control_box_rst_tpu.sim.plant import SimulatedPlant
from control_box_rst_tpu.utils.tree import pytree_dataclass, static_field
from control_box_rst_tpu.utils.precision import f32_matmuls


class ClosedLoopResult(NamedTuple):
    """Stacked per-step signals (leading axis = time).

    Mirrors the reference's signal names: "plant_output", "observed_states",
    "applied_controls" (task_closed_loop_control.cpp:168-181,236)."""

    ts: jax.Array        # [T] step start times
    x_true: jax.Array    # [T+1, nx] plant states (incl. initial)
    y: jax.Array         # [T, ny] plant outputs
    x_observed: jax.Array  # [T, nx]
    u: jax.Array         # [T, nu] applied controls
    ok: jax.Array        # [T] controller success
    info: dict           # stacked controller diagnostics


@f32_matmuls
def run_closed_loop(
    plant: SimulatedPlant,
    controller,
    x0: jax.Array,
    T_steps: int,
    dt: float,
    observer=None,
    key: Optional[jax.Array] = None,
    t0: float = 0.0,
    apply_sequence_substeps: int = 0,
    predictor=None,
) -> ClosedLoopResult:
    """Simulate T_steps of {output → observe → control → integrate}.

    apply_sequence_substeps = 0: apply u0 zero-order-hold over the sampling
    interval. > 0: apply the controller's *planned sequence* (u_seq on its
    own dts time base) across the sampling interval in that many substeps —
    the reference's behavior of handing the whole sequence to the plant
    (plant_interface.h:98, TimeValueBuffer interpolation); essential for
    time-optimal MPC whose planned dt can be shorter than the sampling time.

    predictor: optional OneStepPredictor (models/filters.py) — propagates
    the observed state by one control interval under the previously applied
    control before solving, compensating the controller's own latency
    (ref: CPU-time/dead-time compensation in the closed-loop task,
    task_closed_loop_control.cpp:128-145). Pure, stays jittable.

    Pure and jittable; vmap over x0/key for batched rollouts.
    """
    if observer is None:
        observer = NoObserver()
    if key is None:
        key = jax.random.PRNGKey(0)

    ctrl_carry0 = controller.init_carry(x0)
    obs_carry0 = observer.init_carry(x0)

    def step(carry, k):
        x, ctrl_carry, obs_carry, u_prev, key = carry
        key, k_out, k_plant = jax.random.split(key, 3)
        t = t0 + k * dt
        y = plant.output(x, k_out)
        # the observer predicts with the control applied over the PREVIOUS
        # interval (ref: the reference's observer consumes the commanded
        # control sequence, observer_interface.h observe(..., u))
        obs_carry, x_hat = observer.observe(obs_carry, y, u_prev, dt)
        if predictor is not None:
            x_hat = predictor.predict_single(x_hat, u_prev, dt)
        ctrl_carry, out = controller.step(ctrl_carry, x_hat, t, dt)
        # failure → zero controls (ref task_closed_loop_control.cpp:200-206)
        u = jnp.where(out.ok, out.u, jnp.zeros_like(out.u))
        if apply_sequence_substeps <= 0:
            x_next = plant.step(x, u, dt, k_plant)
        else:
            S = apply_sequence_substeps
            dts_plan = out.info.get("dts", None)
            H = out.u_seq.shape[0]
            if dts_plan is None:
                dts_plan = jnp.full((H,), dt, x.dtype)
            t_plan = jnp.concatenate(
                [jnp.zeros((1,), x.dtype), jnp.cumsum(dts_plan)]
            )
            sub_dt = dt / S
            keys = jax.random.split(k_plant, S)

            def substep(xc, inp):
                i, kk = inp
                tau = (i.astype(x.dtype) + 0.5) * sub_dt
                idx = jnp.clip(
                    jnp.searchsorted(t_plan, tau, side="right") - 1, 0, H - 1
                )
                u_i = jnp.where(out.ok, out.u_seq[idx], jnp.zeros_like(out.u))
                return plant.step(xc, u_i, sub_dt, kk), None

            x_next, _ = jax.lax.scan(
                substep, x, (jnp.arange(S), keys)
            )
        outputs = (t, x_next, y, x_hat, u, out.ok, out.info)
        return (x_next, ctrl_carry, obs_carry, u, key), outputs

    u_prev0 = jnp.zeros((plant.system.nu,), x0.dtype)
    (xf, _, _, _, _), (ts, xs, ys, xhats, us, oks, infos) = jax.lax.scan(
        step, (x0, ctrl_carry0, obs_carry0, u_prev0, key), jnp.arange(T_steps)
    )
    x_true = jnp.concatenate([x0[None], xs], axis=0)
    return ClosedLoopResult(
        ts=ts, x_true=x_true, y=ys, x_observed=xhats, u=us, ok=oks, info=infos
    )


@f32_matmuls
def run_open_loop(
    plant: SimulatedPlant,
    controller,
    x0: jax.Array,
    dt: float,
    key: Optional[jax.Array] = None,
):
    """One controller solve, then roll the plant along the planned controls.

    Ref parity: OpenLoopControlTask (ref: src/tasks/include/corbo-tasks/
    task_open_loop_control.h:49) — single OCP solve, publish planned
    trajectories, optionally apply them to the plant.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    carry = controller.init_carry(x0)
    _, out = controller.step(carry, x0, 0.0, dt)

    # roll the true plant under the planned control sequence
    dts = out.info.get("dts", None)
    H = out.u_seq.shape[0]
    dts = jnp.full((H,), dt) if dts is None else dts

    def roll(carry, inp):
        x, key = carry
        u, dtk = inp
        key, sub = jax.random.split(key)
        x_next = plant.step(x, u, dtk, sub)
        return (x_next, key), x_next

    (_, _), xs = jax.lax.scan(roll, (x0, key), (out.u_seq, dts))
    x_rollout = jnp.concatenate([x0[None], xs], axis=0)
    return out, x_rollout
