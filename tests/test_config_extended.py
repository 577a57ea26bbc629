"""Extended YAML config coverage: observers, plants, controllers,
terminal constraints, hybrid costs, benchmark tasks.

Ref parity tested: every protobuf-configurable component family of the
reference has a YAML counterpart (SURVEY.md §5 "Config / flag system"):
plants with disturbances/output functions (simulated_plant.h,
disturbances.h:35), observers (observer_interface.h), controllers
(dual_mode_controller.h:47, simple_state_controller.h:46,
step_response_generator.h:47), terminal constraints
(final_state_constraints.h), hybrid costs (hybrid_cost.h:39), and the
increasing-N benchmark task (benchmark_task_increasing_n_open_loop.h:48).
"""
import numpy as np
import pytest

from control_box_rst_tpu.core.config import run_experiment


def _vals(rec, name):
    sig = rec.get(name)
    return np.asarray(sig.get("values", sig.get("matrices", [])))


BASE = {
    "experiment": {"task": "closed_loop", "T_steps": 25, "dt": 0.1},
    "system": {"type": "serial_integrators", "params": {"nx": 2, "nu": 1}},
    "grid": {"type": "fd", "N": 8, "fd_scheme": "crank_nicolson"},
    "cost": {"type": "quadratic_form", "Q": [[1.0, 0.0], [0.0, 1.0]],
             "R": [[0.1]], "Qf": [[10.0, 0.0], [0.0, 10.0]]},
    "bounds": {"u_min": -1.0, "u_max": 1.0},
    "x0": [1.0, 0.0],
    "solver": {"max_iter": 6},
}


def test_plant_options_noise_and_output():
    cfg = dict(BASE)
    cfg["plant"] = {
        "integrator": {"type": "rk4", "substeps": 2},
        "output": "full",
        "noise": {"output_std": 0.01},
        "x0": [0.8, 0.1],
    }
    rec = run_experiment(cfg)
    y = _vals(rec, "plant_output")
    x = _vals(rec, "plant_states")
    # plant x0 override takes effect
    assert np.allclose(x[0], [0.8, 0.1])
    # output noise present: y differs from x
    assert not np.allclose(y, x[:-1])
    assert np.abs(y - x[:-1]).max() < 0.08  # but small


def test_kalman_observer_closed_loop():
    cfg = dict(BASE)
    cfg["plant"] = {"output": "first", "noise": {"output_std": 0.02}}
    cfg["observer"] = {"type": "kalman", "V": [[0.0004]]}
    rec = run_experiment(cfg)
    xs = _vals(rec, "plant_states")
    xhat = _vals(rec, "observed_states")
    assert xhat.shape[1] == 2  # full state reconstructed from 1-D output
    # regulation works from partial, noisy measurements
    assert abs(xs[-1][0]) < 0.35, xs[-1]
    # estimate tracks the true state
    assert np.abs(xhat[5:] - xs[5:-1]).max() < 0.35


def test_dual_mode_controller_yaml():
    cfg = dict(BASE)
    cfg["experiment"] = {"task": "closed_loop", "T_steps": 40, "dt": 0.1}
    cfg["controller"] = {
        "type": "dual_mode",
        "local": {"Q": [[1.0, 0.0], [0.0, 1.0]], "R": [[1.0]]},
        "S": [[1.0, 0.0], [0.0, 1.0]],
        "gamma": 0.09,
        "latch": True,
    }
    rec = run_experiment(cfg)
    xs = _vals(rec, "plant_states")
    assert abs(xs[-1][0]) < 0.12, xs[-1]


def test_simple_state_and_step_response_yaml():
    cfg = dict(BASE)
    cfg["controller"] = {"type": "simple_state", "K": [[1.0, 1.5]]}
    rec = run_experiment(cfg)
    xs = _vals(rec, "plant_states")
    assert abs(xs[-1][0]) < 0.35

    cfg2 = dict(BASE)
    cfg2["controller"] = {"type": "step_response", "u_step": [0.5], "t_step": 0.5}
    rec2 = run_experiment(cfg2)
    u = _vals(rec2, "applied_controls")
    assert np.allclose(u[:5], 0.0)       # before t_step
    assert np.allclose(u[6:], 0.5)       # after


def test_terminal_ball_constraint_yaml():
    cfg = dict(BASE)
    cfg["experiment"] = {"task": "open_loop", "dt": 0.1}
    cfg["grid"] = {"type": "fd", "N": 20, "fd_scheme": "crank_nicolson"}
    cfg["constraints"] = {"terminal_ball": {"S": [[1.0, 0.0], [0.0, 1.0]],
                                            "gamma": 0.04}}
    cfg["solver"] = {"max_iter": 20}
    rec = run_experiment(cfg)
    X = _vals(rec, "planned_states")
    xN = X[-1]
    assert xN @ xN <= 0.04 + 1e-3, xN  # inside the ball


def test_gain_scheduled_cost_and_soft_bounds_yaml():
    cfg = dict(BASE)
    cfg["grid"] = {"type": "fd_variable", "N": 12}
    cfg["bounds"] = {"u_min": -1.0, "u_max": 1.0, "dt_min": 0.02, "dt_max": 0.3}
    cfg["cost"] = {
        "type": "min_time_quadratic_gain_scheduled",
        "time_weight": 1.0,
        "Q": [[1.0, 0.0], [0.0, 1.0]], "R": [[0.1]],
        "radius": 0.5,
        "soft_x_max": [10.0, 0.6], "soft_weight": 20.0,
        "Qf": [[10.0, 0.0], [0.0, 10.0]],
    }
    cfg["xf"] = [0.0, 0.0]
    cfg["xf_fixed"] = [1, 1]
    cfg["experiment"] = {"task": "open_loop", "dt": 0.1}
    cfg["solver"] = {"max_iter": 25}
    rec = run_experiment(cfg)
    X = _vals(rec, "planned_states")
    assert np.abs(X[-1]).max() < 0.05  # reaches the goal
    assert X[:, 1].max() < 0.75        # soft bound mostly respected


def test_benchmark_increasing_n_yaml():
    cfg = dict(BASE)
    cfg["experiment"] = {
        "task": "benchmark_increasing_n", "dt": 0.1,
        "benchmark": {"N_values": [6, 12]},
    }
    rec = run_experiment(cfg)
    n = _vals(rec, "benchmark/n_values").ravel()
    times = _vals(rec, "benchmark/solve_times").ravel()
    objs = _vals(rec, "benchmark/objectives").ravel()
    assert list(n) == [6.0, 12.0]
    assert times.shape == (2,) and np.all(times > 0)
    assert np.all(np.isfinite(objs))


def test_unknown_observer_and_cost_errors():
    cfg = dict(BASE)
    cfg["observer"] = {"type": "luenberger"}
    with pytest.raises(KeyError, match="luenberger"):
        run_experiment(cfg)
    cfg2 = dict(BASE)
    cfg2["cost"] = {"type": "nonexistent_cost"}
    with pytest.raises(KeyError, match="nonexistent_cost"):
        run_experiment(cfg2)


def test_uncompressed_hs_grid_yaml():
    """Round-4 components reachable from YAML: uncompressed Hermite-Simpson
    grid (midpoint decision states)."""
    import copy

    cfg = copy.deepcopy(BASE)
    cfg["grid"] = {"type": "hermite_simpson_uncompressed", "N": 8}
    rec = run_experiment(cfg)
    u = _vals(rec, "applied_controls")
    assert u.shape[0] == 25
    assert np.all(np.abs(u) <= 1.0 + 1e-6)
    x = _vals(rec, "plant_states")
    assert np.linalg.norm(x[-1]) < 0.3  # regulated toward the origin


def test_grow_on_infeasibility_yaml():
    """Round-4 components reachable from YAML: grow-horizon-on-infeasibility
    adaptation + short initial active horizon."""
    import copy

    cfg = copy.deepcopy(BASE)
    cfg["grid"] = {"type": "fd", "N": 30, "fd_scheme": "crank_nicolson"}
    cfg["xf"] = [0.0, 0.0]
    cfg["xf_fixed"] = [True, True]
    cfg["x0"] = [1.5, 0.0]
    cfg["solver"] = {"max_iter": 30, "qp": {"max_iter": 1500, "tol": 1e-10}}
    cfg["controller"] = {
        "type": "predictive",
        "adaptation": {"type": "grow_on_infeasibility", "feas_tol": 1e-4,
                       "n_max": 30},
        "n_active_init": 8,
        "warm_start_shift": False,
    }
    rec = run_experiment(cfg)
    ns = _vals(rec, "controller/n_active")
    assert ns[0] <= 9 and ns[-1] > ns[0]  # horizon grew
