"""Threaded simulated plant: fixed-rate simulation in its own host thread.

Ref parity: corbo::SimulatedPlantThreaded (ref: src/plants/include/
corbo-plants/simulated_plant_threaded.h:52,110-111) — the reference runs
the plant integration loop in a dedicated std::thread at a configurable
simulation rate, with the commanded control held in a mutex-guarded buffer,
so the controller and the plant evolve asynchronously (the realistic
hardware situation: the plant doesn't wait for the solver).

TPU-native placement: for *pure simulation studies* the plant is a pure
function fused into the on-device closed-loop scan (sim/closed_loop.py) —
asynchrony would only slow that down. This class exists for the
*asynchronous/real-time* path: it simulates a plant on the host at rate
`sim_rate` (typically faster than the control rate) using the native
drift-free Rate, and exposes read_output()/write_control() — exactly the
callbacks `sim.realtime.run_realtime_closed_loop` drives. Control values
are applied with optional actuation dead time through a TimeValueBuffer
(ref: time_value_buffer.h:53).
"""
from __future__ import annotations

import threading
from typing import Optional

import numpy as np

from control_box_rst_tpu.sim.plant import SimulatedPlant


class SimulatedPlantThreaded:
    """Host-side asynchronous plant simulation at a fixed rate."""

    def __init__(
        self,
        plant: SimulatedPlant,
        x0: np.ndarray,
        sim_dt: float = 0.001,
        dead_time: float = 0.0,
        seed: int = 0,
    ):
        import jax

        self._plant = plant
        self._sim_dt = float(sim_dt)
        self._dead_time = float(dead_time)
        self._lock = threading.Lock()
        self._x = np.asarray(x0, dtype=np.float64)
        self._u = np.zeros((plant.system.nu,), dtype=np.float64)
        # pending (apply_time, u) commands when dead_time > 0
        self._u_queue: list = []
        self._t = 0.0
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._key = jax.random.PRNGKey(seed)

        # jit the single sim step once (tiny shapes; runs on host-visible device)
        import jax.numpy as jnp

        self._step_fn = jax.jit(
            lambda x, u, key: plant.step(x, u, jnp.asarray(self._sim_dt), key)
        )
        self._out_fn = jax.jit(lambda x, key: plant.output(x, key))

    # -- controller-facing API (matches sim/realtime.py callbacks) ---------
    def read_output(self) -> np.ndarray:
        import jax

        with self._lock:
            x = self._x.copy()
        self._key, sub = jax.random.split(self._key)
        return np.asarray(self._out_fn(x, sub))

    def write_control(self, u: np.ndarray) -> None:
        """Command a control; applied after `dead_time` (ref: the reference
        buffers controls through TimeValueBuffer for actuation delay)."""
        with self._lock:
            if self._dead_time <= 0.0:
                self._u = np.asarray(u, dtype=np.float64).copy()
            else:
                self._u_queue.append(
                    (self._t + self._dead_time, np.asarray(u, dtype=np.float64))
                )

    def state(self) -> np.ndarray:
        with self._lock:
            return self._x.copy()

    def set_state(self, x: np.ndarray) -> None:
        """(ref: PlantInterface::setState, plant_interface.h)"""
        with self._lock:
            self._x = np.asarray(x, dtype=np.float64).copy()

    # -- lifecycle -----------------------------------------------------------
    def start(self) -> "SimulatedPlantThreaded":
        if self._thread is not None:
            raise RuntimeError("plant thread already started")
        # warm up the jit compiles BEFORE the rate-synced loop starts, so the
        # first loop iterations don't blow the simulation period
        import jax

        key = jax.random.PRNGKey(0)
        jax.block_until_ready(self._step_fn(self._x, self._u, key))
        jax.block_until_ready(self._out_fn(self._x, key))
        self._stop.clear()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5.0)
            self._thread = None

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    # -- simulation thread ------------------------------------------------------
    def _run(self) -> None:
        import jax

        from control_box_rst_tpu.native import Rate

        rate = Rate(self._sim_dt)
        rate.reset()
        while not self._stop.is_set():
            with self._lock:
                # release dead-timed commands whose apply time has come
                while self._u_queue and self._u_queue[0][0] <= self._t:
                    self._u = self._u_queue.pop(0)[1]
                x, u = self._x, self._u
            self._key, sub = jax.random.split(self._key)
            x_next = np.asarray(self._step_fn(x, u, sub))
            with self._lock:
                self._x = x_next
                self._t += self._sim_dt
            rate.sleep()
