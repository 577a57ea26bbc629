"""Native runtime tests: Rate timing, SignalWriter round-trip, realtime loop."""
import os
import time

import numpy as np
import pytest

from control_box_rst_tpu.native import (
    Rate,
    SignalWriter,
    monotonic_time,
    native_available,
    read_signal_log,
    set_realtime_priority,
)


def test_native_library_builds():
    assert native_available(), "g++ build of runtime.cpp failed"


def test_rate_timing():
    rate = Rate(0.02)
    t0 = monotonic_time()
    for _ in range(10):
        rate.sleep()
    elapsed = monotonic_time() - t0
    # 10 periods of 20ms: allow generous jitter on shared CI machines
    assert 0.18 <= elapsed < 0.5, elapsed
    assert rate.overruns == 0


def test_rate_overrun_detection():
    rate = Rate(0.005)
    time.sleep(0.05)  # blow through several deadlines
    slack = rate.sleep()
    assert slack < 0
    assert rate.overruns >= 1


def test_signal_writer_roundtrip(tmp_path):
    path = os.path.join(tmp_path, "log.bin")
    w = SignalWriter(path, dim=3, capacity=1024)
    for k in range(100):
        assert w.push(k * 0.01, np.array([k, 2.0 * k, -k]))
    w.close()
    ts, vals = read_signal_log(path)
    assert ts.shape == (100,) and vals.shape == (100, 3)
    np.testing.assert_allclose(ts, np.arange(100) * 0.01)
    np.testing.assert_allclose(vals[:, 1], 2.0 * np.arange(100))
    assert w.dropped == 0


def test_set_realtime_priority_no_crash():
    # usually fails without CAP_SYS_NICE — must not raise either way
    set_realtime_priority(5)


def test_realtime_closed_loop_sim(tmp_path):
    """Drive the realtime executor against an in-process simulated plant."""
    import jax.numpy as jnp

    from control_box_rst_tpu.control import LqrController
    from control_box_rst_tpu.models import DoubleIntegratorContinuous
    from control_box_rst_tpu.ops.integrators import make_integrator
    from control_box_rst_tpu.sim.realtime import run_realtime_closed_loop

    sys_ = DoubleIntegratorContinuous()
    ctrl = LqrController.from_system(sys_, jnp.eye(2), jnp.eye(1))
    integ = make_integrator("rk4", 2)

    state = {"x": np.array([1.0, 0.0])}

    def read_output():
        return state["x"]

    def write_control(u):
        state["x"] = np.asarray(
            integ.solve_ivp(sys_, jnp.asarray(state["x"]), jnp.asarray(u), 0.02)
        )

    log = os.path.join(tmp_path, "rt.bin")
    stats = run_realtime_closed_loop(
        ctrl, read_output, write_control,
        x0=np.array([1.0, 0.0]), dt=0.02, duration_s=0.5, log_path=log,
    )
    assert stats["steps"] == 25
    assert np.linalg.norm(state["x"]) < 1.0  # heading toward origin
    ts, vals = read_signal_log(log)
    assert vals.shape == (25, 3)
    assert stats["solve_time_p99_s"] < 0.02 or stats["overruns"] >= 0
