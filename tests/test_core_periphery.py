"""Tests for TimeSeries, references, filters, signals, exporters, benchmarks."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from control_box_rst_tpu.core.export import export_tsv, export_yaml
from control_box_rst_tpu.core.reference import (
    DiscreteTimeReferenceTrajectory,
    SineReferenceTrajectory,
    StaticReference,
    ZeroReference,
    sample_references,
)
from control_box_rst_tpu.core.signals import SignalRecorder
from control_box_rst_tpu.core.time_series import TimeSeries, TimeSeriesSequence
from control_box_rst_tpu.models.filters import (
    MovingAverageFilter,
    MovingLeastSquaresFilter,
    MovingMedianFilter,
    OneStepPredictor,
    TimeValueBuffer,
)
from control_box_rst_tpu.models import DoubleIntegratorContinuous


def test_time_series_interpolation():
    ts = TimeSeries.from_arrays([0.0, 1.0, 2.0], [[0.0], [10.0], [20.0]])
    assert float(ts.value_at(0.5)[0]) == pytest.approx(5.0)
    assert float(ts.value_at(0.5, interpolation="zero_order_hold")[0]) == 0.0
    assert float(ts.value_at(1.5)[0]) == pytest.approx(15.0)
    # extrapolation
    assert float(ts.value_at(3.0)[0]) == pytest.approx(20.0)  # hold
    assert float(ts.value_at(3.0, extrapolation="linear")[0]) == pytest.approx(30.0)
    assert float(ts.value_at(-1.0)[0]) == 0.0
    # jit + vmap
    f = jax.jit(jax.vmap(lambda t: ts.value_at(t)))
    out = f(jnp.array([0.5, 1.5]))
    np.testing.assert_allclose(np.asarray(out[:, 0]), [5.0, 15.0])


def test_time_series_transforms():
    ts = TimeSeries.from_arrays([1.0, 2.0], [[1.0, 2.0], [3.0, 4.0]])
    assert float(ts.normalized_time().times[0]) == 0.0
    np.testing.assert_allclose(np.asarray(ts.mean()), [2.0, 3.0])
    seq = TimeSeriesSequence.stack([ts, ts.shifted(1.0)])
    assert seq.n_series == 2
    assert float(seq.series(1).times[0]) == 2.0


def test_references():
    zr = ZeroReference(2)
    np.testing.assert_allclose(np.asarray(zr.value_at(3.0)), [0.0, 0.0])
    sr = StaticReference(dim=2, value=jnp.array([1.0, -1.0]))
    dts = jnp.full((4,), 0.5)
    vals = sr.stage_values(0.0, dts)
    assert vals.shape == (5, 2)
    sine = SineReferenceTrajectory(dim=1, amplitude=2.0, omega=jnp.pi, offset=1.0)
    assert float(sine.value_at(0.5)[0]) == pytest.approx(3.0)
    series = TimeSeries.from_arrays([0.0, 1.0], [[0.0], [1.0]])
    dref = DiscreteTimeReferenceTrajectory(dim=1, series=series)
    assert float(dref.value_at(0.25)[0]) == pytest.approx(0.25)
    refs = sample_references(sr, ZeroReference(1), 0.0, dts)
    assert refs.xref.shape == (5, 2) and refs.uref.shape == (4, 1)


def _run_filter(filt, samples):
    carry = filt.init_carry()
    outs = []
    for i, v in enumerate(samples):
        carry, o = filt(carry, float(i), v)
        outs.append(float(o))
    return outs


def test_moving_average():
    f = MovingAverageFilter(window=3)
    outs = _run_filter(f, [3.0, 5.0, 7.0, 9.0])
    assert outs[0] == pytest.approx(3.0)
    assert outs[1] == pytest.approx(4.0)
    assert outs[3] == pytest.approx(7.0)  # (5+7+9)/3


def test_moving_median():
    f = MovingMedianFilter(window=3)
    outs = _run_filter(f, [1.0, 100.0, 2.0, 3.0])
    assert outs[2] == pytest.approx(2.0)
    assert outs[3] == pytest.approx(3.0)


def test_moving_least_squares():
    # exact quadratic data → filter reproduces it once the window is full
    f = MovingLeastSquaresFilter(window=5, order=2)
    data = [(0.5 * i**2 - i + 2) for i in range(8)]
    outs = _run_filter(f, data)
    assert outs[-1] == pytest.approx(data[-1], abs=1e-6)


def test_one_step_predictor():
    sys_ = DoubleIntegratorContinuous()
    pred = OneStepPredictor(system=sys_)
    x0 = jnp.array([0.0, 1.0])
    x1 = pred.predict_single(x0, jnp.array([0.0]), 0.5)
    np.testing.assert_allclose(np.asarray(x1), [0.5, 1.0], atol=1e-9)


def test_time_value_buffer():
    buf = TimeValueBuffer(delay_steps=2, nu=1)
    carry = buf.init_carry(u_init=jnp.array([0.0]))
    applied = []
    for k in range(5):
        carry, u = buf.push_pop(carry, jnp.array([float(k + 1)]))
        applied.append(float(u[0]))
    assert applied == [0.0, 0.0, 1.0, 2.0, 3.0]


def test_signal_recorder_and_export(tmp_path):
    rec = SignalRecorder()
    rec.add_measurement("controller/u", 0.0, [1.0])
    rec.add_measurement("controller/u", 0.1, [2.0])
    rec.add_time_series("plant/x", [0.0, 0.1], [[1.0, 0.0], [0.9, -0.1]])
    assert sorted(rec.names()) == ["controller/u", "plant/x"]
    sig = rec.get("plant/x")
    assert sig["values"].shape == (2, 2)

    ypath = os.path.join(tmp_path, "out.yaml")
    export_yaml(rec, ypath)
    import yaml

    with open(ypath) as f:
        tree = yaml.safe_load(f)
    assert tree["plant"]["x"]["kind"] == "time_series"

    export_tsv(rec, os.path.join(tmp_path, "tsv"))
    files = os.listdir(os.path.join(tmp_path, "tsv"))
    assert sorted(files) == ["controller__u.tsv", "plant__x.tsv"]


def test_benchmark_varying_initial_state():
    from control_box_rst_tpu.control import LqrController
    from control_box_rst_tpu.sim import SimulatedPlant
    from control_box_rst_tpu.sim.benchmarks import benchmark_varying_initial_state

    sys_ = DoubleIntegratorContinuous()
    lqr = LqrController.from_system(sys_, jnp.eye(2), jnp.eye(1))
    plant = SimulatedPlant(system=sys_)
    res, x0s = benchmark_varying_initial_state(
        plant, lqr, jnp.linspace(-1, 1, 3), jnp.linspace(-1, 1, 2),
        T_steps=50, dt=0.1,
    )
    assert res.x_true.shape == (6, 51, 2)
    # every initial state regulated
    assert float(jnp.max(jnp.linalg.norm(res.x_true[:, -1], axis=-1))) < 0.1
    np.testing.assert_allclose(np.asarray(x0s[:, 0]), [-1, -1, 0, 0, 1, 1])


def test_benchmark_increasing_n():
    from control_box_rst_tpu.ocp import (
        CompositeCost, QuadraticFinalStateCost, QuadraticFormCost,
        finite_differences_grid, transcribe,
    )
    from control_box_rst_tpu.sim.benchmarks import (
        benchmark_increasing_n_masked,
        benchmark_increasing_n_open_loop,
    )
    from control_box_rst_tpu.solvers import SQPConfig

    sys_ = DoubleIntegratorContinuous()
    cost = CompositeCost(costs=(
        QuadraticFormCost(Q=jnp.eye(2), R=0.1 * jnp.eye(1)),
        QuadraticFinalStateCost(Qf=5.0 * jnp.eye(2)),
    ))

    def make_ocp(N):
        return transcribe(sys_, finite_differences_grid(N, "crank_nicolson"),
                          cost, x0=jnp.array([1.0, 0.0]))

    cfg = SQPConfig(max_iter=8)
    per_n = benchmark_increasing_n_open_loop(make_ocp, [5, 10], jnp.array([1.0, 0.0]), 0.1, cfg)
    assert [r["N"] for r in per_n] == [5, 10]
    assert all(r["feas_res"] < 1e-6 for r in per_n)

    masked = benchmark_increasing_n_masked(
        make_ocp(10), [5, 10], jnp.array([1.0, 0.0]), 0.1, cfg
    )
    # masked N=10 must equal the dedicated N=10 solve
    assert masked[1]["objective"] == pytest.approx(per_n[1]["objective"], rel=1e-6)
    assert all(r["feas_res"] < 1e-6 for r in masked)

def test_time_duration_types():
    """Time/Duration value types (ref: core/time.h:106,251)."""
    from control_box_rst_tpu.core.timex import Duration, Time

    d = Duration.from_sec(0.5)
    assert (d + d).to_sec() == 1.0
    assert (2 * d).to_sec() == 1.0
    assert (-d).to_sec() == -0.5
    t0 = Time.now()
    t1 = t0 + Duration.from_sec(2.0)
    assert isinstance(t1 - t0, Duration)
    assert abs((t1 - t0).to_sec() - 2.0) < 1e-9
    assert t1 > t0
    later = Time.now() + Duration.from_sec(0.05)
    later.sleep_until()
    assert Time.now() >= later
