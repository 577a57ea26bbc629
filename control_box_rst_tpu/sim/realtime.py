"""Wall-clock real-time closed-loop executor.

Ref parity: ClosedLoopControlTask's real-time mode — `Rate`-synchronized
host loop with CPU-time compensation via OneStepPredictor
(ref: task_closed_loop_control.cpp:82-268, realtime sync via corbo::Rate;
compensation :128-145) and SimulatedPlantThreaded's fixed-rate simulation
thread (simulated_plant_threaded.h:52).

Use this when driving an external/physical plant through Python callbacks;
for pure simulation studies use sim/closed_loop.py (fully on-device, orders
of magnitude faster). The controller step is jitted once up front; the loop
body is {read output → observe → (optionally dead-time-predict) → solve →
write control → rate.sleep()} with the native Rate for drift-free timing
and the native SignalWriter for logging.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from control_box_rst_tpu.models.filters import OneStepPredictor
from control_box_rst_tpu.native import Rate, SignalWriter, monotonic_time


def run_realtime_closed_loop(
    controller,
    read_output: Callable[[], np.ndarray],
    write_control: Callable[[np.ndarray], None],
    x0: np.ndarray,
    dt: float,
    duration_s: float,
    observer=None,
    predictor: Optional[OneStepPredictor] = None,
    log_path: Optional[str] = None,
    on_step: Optional[Callable] = None,
):
    """Drive a real plant at rate 1/dt. Returns run statistics.

    read_output() → current measurement y; write_control(u) applies u.
    If `predictor` is given, the measured state is propagated by one control
    interval before solving — compensating the solve's own latency
    (ref: OneStepPredictor usage, task_closed_loop_control.cpp:128-145).
    """
    from control_box_rst_tpu.sim.observer import NoObserver

    observer = observer or NoObserver()
    x0 = jnp.asarray(x0)

    ctrl_carry = controller.init_carry(x0)
    obs_carry = observer.init_carry(x0)

    @jax.jit
    def ctrl_step(carry, x, t):
        return controller.step(carry, x, t, dt)

    @jax.jit
    def obs_step(carry, y, u):
        return observer.observe(carry, y, u, dt)

    # warm up the compiles before entering the RT loop
    _ = ctrl_step(ctrl_carry, x0, 0.0)
    _ = obs_step(obs_carry, jnp.asarray(read_output()), jnp.zeros(controller.nu))

    writer = None
    if log_path is not None:
        writer = SignalWriter(log_path, dim=int(x0.shape[0]) + controller.nu)

    from control_box_rst_tpu.core.console import ok

    rate = Rate(dt)
    n_steps = int(round(duration_s / dt))
    u_prev = jnp.zeros((controller.nu,))
    solve_times = []
    t_start = monotonic_time()
    rate.reset()
    for k in range(n_steps):
        if not ok():  # cooperative cancellation (ref: corbo::ok())
            n_steps = k
            break
        t = k * dt
        y = jnp.asarray(read_output())
        obs_carry, x_hat = obs_step(obs_carry, y, u_prev)
        if predictor is not None:
            x_hat = predictor.predict_single(x_hat, u_prev, dt)
        t0 = monotonic_time()
        ctrl_carry, out = ctrl_step(ctrl_carry, x_hat, t)
        u = np.asarray(out.u)
        solve_times.append(monotonic_time() - t0)
        write_control(u)
        u_prev = jnp.asarray(u)
        if writer is not None:
            writer.push(t, np.concatenate([np.asarray(x_hat), u]))
        if on_step is not None:
            on_step(k, np.asarray(x_hat), u)
        rate.sleep()
    wall = monotonic_time() - t_start
    if writer is not None:
        writer.close()
    st = np.asarray(solve_times)
    return {
        "steps": n_steps,
        "wall_s": wall,
        "overruns": rate.overruns,
        "solve_time_mean_s": float(st.mean()),
        "solve_time_p99_s": float(np.percentile(st, 99)),
        "log_dropped": writer.dropped if writer else 0,
    }
