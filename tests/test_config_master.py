"""Config system + master CLI tests (ref: master/.cparams replacement)."""
import os

import numpy as np
import pytest
import yaml

from control_box_rst_tpu.core.config import (
    build_controller,
    build_ocp,
    build_system,
    run_experiment,
)

CONFIG1 = {
    "experiment": {"task": "closed_loop", "T_steps": 40, "dt": 0.1},
    "system": {"type": "serial_integrators", "params": {"nx": 2, "nu": 1}},
    "grid": {"type": "fd", "N": 20, "fd_scheme": "crank_nicolson"},
    "cost": {"type": "quadratic_form", "Q": [[1, 0], [0, 1]], "R": [[0.1]],
             "Qf": [[10, 0], [0, 10]]},
    "bounds": {"u_min": -1.0, "u_max": 1.0},
    "x0": [1.0, 0.0],
    "solver": {"max_iter": 6, "qp_max_iter": 150, "qp_tol": 1e-8},
}


def test_build_system():
    s = build_system({"type": "van_der_pol", "params": {"a": 2.0}})
    assert s.nx == 2 and float(s.a) == 2.0
    s2 = build_system({"type": "linear_state_space",
                       "params": {"A": [[0, 1], [0, 0]], "B": [[0], [1]]}})
    assert s2.nx == 2 and s2.nu == 1


def test_build_ocp_and_controller():
    ocp, system = build_ocp(CONFIG1)
    assert ocp.N == 20 and ocp.nx == 2
    ctrl, _ = build_controller(CONFIG1)
    assert ctrl.horizon == 20


def test_run_closed_loop_experiment():
    rec = run_experiment(CONFIG1)
    names = set(rec.names())
    assert "plant_output" in names and "applied_controls" in names
    x = rec.get("plant_states")["values"]
    assert np.linalg.norm(x[-1]) < 0.2  # regulated
    u = rec.get("applied_controls")["values"]
    assert np.max(np.abs(u)) <= 1.0 + 1e-6


def test_time_optimal_config():
    cfg = {
        "experiment": {"task": "open_loop", "dt": 0.2},
        "system": {"type": "serial_integrators", "params": {"nx": 2, "nu": 1}},
        "grid": {"type": "fd_variable", "N": 20},
        "cost": {"type": "minimum_time"},
        "bounds": {"u_min": -1.0, "u_max": 1.0, "dt_min": 1e-3, "dt_max": 0.5},
        "x0": [1.0, 0.0],
        "xf": [0.0, 0.0],
        "xf_fixed": [1.0, 1.0],
        "solver": {"max_iter": 40, "qp_max_iter": 500, "qp_tol": 1e-10},
    }
    rec = run_experiment(cfg)
    ts = rec.get("planned_states")["times"]
    assert abs(ts[-1] - 2.0) < 0.2  # minimum time ≈ 2√d


def test_minimum_time_lsq_form_config():
    """YAML knob for the reference's LSQ MinimumTime mode (round 5,
    minimum_time.h:50-66): per-interval-dt grid + lsq_form minimizes
    (n-1)·Σdt² whose optimum is equal dts at the bang-bang T*."""
    cfg = {
        "experiment": {"task": "open_loop", "dt": 0.2},
        "system": {"type": "serial_integrators", "params": {"nx": 2, "nu": 1}},
        "grid": {"type": "multiple_shooting_variable_non_uniform", "N": 10},
        "cost": {"type": "minimum_time", "weight": 10.0, "lsq_form": True},
        "bounds": {"u_min": -1.0, "u_max": 1.0, "dt_min": 1e-3, "dt_max": 0.5},
        "x0": [1.5, 0.0],
        "xf": [0.0, 0.0],
        "xf_fixed": [1.0, 1.0],
        "solver": {"max_iter": 60, "qp_max_iter": 1000, "qp_tol": 1e-10},
    }
    rec = run_experiment(cfg)
    ts = rec.get("planned_states")["times"]
    # T* = 2 sqrt(1.5); equal dts by the QM-AM argument
    assert abs(ts[-1] - 2.0 * np.sqrt(1.5)) < 1e-3
    dts = np.diff(ts)
    np.testing.assert_allclose(dts, dts.mean(), atol=1e-4)


def test_master_cli(tmp_path):
    cfg_path = os.path.join(tmp_path, "exp.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(CONFIG1, f)
    from control_box_rst_tpu.master import main

    out_dir = os.path.join(tmp_path, "out")
    rc = main(["--config", cfg_path, "--out", out_dir, "--format", "both"])
    assert rc == 0
    assert os.path.exists(os.path.join(out_dir, "signals.yaml"))
    tsvs = os.listdir(os.path.join(out_dir, "signals"))
    assert any("applied_controls" in t for t in tsvs)
