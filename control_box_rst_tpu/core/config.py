"""Typed experiment configuration.

Ref parity: the reference's parameter system is protobuf messages — every
component has toMessage/fromMessage, `oneof` fields select factory
implementations, and experiments persist as `.cparams` files loaded by the
master (ref: proto/ schema, master.h:85-87 loadFromFile, SURVEY.md §5
"Config / flag system").

TPU-first redesign: plain dict / YAML configs with string-keyed component
types resolved through core/factory.py — the same select-by-name idea
without a protobuf toolchain. `build_experiment` materializes the full
{system, ocp, controller, plant, task} tree; `run_experiment` executes it
and returns a SignalRecorder (see master.py for the CLI).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from control_box_rst_tpu.core.factory import Factory
from control_box_rst_tpu.core.signals import SignalRecorder


def _arr(v, dtype=None):
    return None if v is None else jnp.asarray(np.asarray(v, dtype=np.float64))


def build_system(cfg: Dict[str, Any]):
    """{'type': 'van_der_pol', 'params': {...}} → SystemDynamics."""
    import control_box_rst_tpu.models.benchmark  # noqa: F401 (registers)

    params = dict(cfg.get("params", {}))
    typ = cfg["type"]
    if typ == "linear_state_space":
        from control_box_rst_tpu.models import LinearStateSpaceModel

        return LinearStateSpaceModel.from_matrices(
            np.asarray(params["A"]), np.asarray(params["B"])
        )
    for k, v in list(params.items()):
        if isinstance(v, (list, tuple)):
            params[k] = _arr(v)
    return Factory.create("system", typ, **params)


def build_grid(cfg: Dict[str, Any]):
    from control_box_rst_tpu.ocp import grids

    typ = cfg.get("type", "fd")
    N = int(cfg.get("N", 20))
    if typ == "fd":
        return grids.finite_differences_grid(
            N, cfg.get("fd_scheme", "crank_nicolson"),
            cfg.get("cost_integration", "left_sum"),
        )
    if typ == "fd_variable":
        return grids.finite_differences_variable_grid(
            N, cfg.get("fd_scheme", "crank_nicolson"),
            cfg.get("cost_integration", "left_sum"),
        )
    if typ == "fd_variable_non_uniform":
        return grids.non_uniform_fd_variable_grid(
            N, cfg.get("fd_scheme", "crank_nicolson"),
            cfg.get("cost_integration", "left_sum"),
        )
    if typ == "multiple_shooting":
        return grids.multiple_shooting_grid(
            N, cfg.get("integrator", "rk4"), cfg.get("substeps", 1),
            cfg.get("cost_integration", "left_sum"),
        )
    if typ == "multiple_shooting_variable":
        return grids.multiple_shooting_variable_grid(
            N, cfg.get("integrator", "rk4"), cfg.get("substeps", 1),
            cfg.get("cost_integration", "left_sum"),
        )
    if typ == "multiple_shooting_variable_non_uniform":
        return grids.non_uniform_multiple_shooting_variable_grid(
            N, cfg.get("integrator", "rk4"), cfg.get("substeps", 1),
            cfg.get("cost_integration", "left_sum"),
        )
    if typ == "move_blocking":
        return grids.move_blocking_grid(
            N, cfg["blocks"], cfg.get("fd_scheme", "crank_nicolson"),
        )
    raise KeyError(f"unknown grid type {typ!r}")


def build_cost(cfg: Dict[str, Any], nx: int, nu: int):
    from control_box_rst_tpu.ocp import costs as C

    typ = cfg.get("type", "quadratic_form")
    parts = []
    if typ == "quadratic_form":
        Q = _arr(cfg.get("Q", np.eye(nx)))
        R = _arr(cfg.get("R", 0.1 * np.eye(nu)))
        parts.append(
            C.QuadraticFormCost(Q=Q, R=R, integral=bool(cfg.get("integral", False)))
        )
    elif typ == "minimum_time":
        parts.append(C.MinimumTime(weight=float(cfg.get("weight", 1.0))))
    elif typ == "minimum_time_regularized":
        parts.append(
            C.MinimumTimeRegularized(
                weight=float(cfg.get("weight", 1.0)),
                reg=float(cfg.get("reg", 1e-3)),
            )
        )
    elif typ == "min_time_quadratic":
        parts.append(
            C.MinTimeQuadratic(
                time_weight=float(cfg.get("time_weight", 1.0)),
                Q=_arr(cfg.get("Q")), R=_arr(cfg.get("R")),
            )
        )
    else:
        raise KeyError(f"unknown cost type {typ!r}")
    if cfg.get("Qf") is not None:
        parts.append(C.QuadraticFinalStateCost(Qf=_arr(cfg["Qf"])))
    if len(parts) == 1:
        return parts[0]
    return C.CompositeCost(costs=tuple(parts))


def build_ocp(config: Dict[str, Any]):
    from control_box_rst_tpu.ocp import Bounds, transcribe

    system = build_system(config["system"])
    grid = build_grid(config.get("grid", {}))
    cost = build_cost(config.get("cost", {}), system.nx, system.nu)
    b = config.get("bounds", {})
    bounds = Bounds.unbounded(system.nx, system.nu)
    if "u_min" in b or "u_max" in b:
        bounds = bounds.with_u(
            b.get("u_min", -np.inf), b.get("u_max", np.inf)
        )
    if "x_min" in b or "x_max" in b:
        bounds = bounds.with_x(
            b.get("x_min", -np.inf), b.get("x_max", np.inf)
        )
    if "dt_min" in b or "dt_max" in b:
        bounds = bounds.with_dt(b.get("dt_min", 0.0), b.get("dt_max", np.inf))
    xf_fixed = config.get("xf_fixed")
    ocp = transcribe(
        system, grid, cost,
        bounds=bounds,
        x0=_arr(config.get("x0", np.zeros(system.nx))),
        xf=_arr(config.get("xf")),
        xf_fixed=_arr(xf_fixed) if xf_fixed is not None else None,
    )
    return ocp, system


def build_controller(config: Dict[str, Any]):
    from control_box_rst_tpu.control import (
        LqrController, PidController, PredictiveController,
    )
    from control_box_rst_tpu.solvers import QPConfig, SQPConfig

    ctrl_cfg = config.get("controller", {"type": "predictive"})
    typ = ctrl_cfg.get("type", "predictive")
    ocp, system = build_ocp(config)
    if typ == "predictive":
        s = config.get("solver", {})
        cfg = SQPConfig(
            max_iter=int(s.get("max_iter", 10)),
            qp=QPConfig(
                max_iter=int(s.get("qp_max_iter", 200)),
                tol=float(s.get("qp_tol", 1e-8)),
            ),
            tol_stat=float(s.get("tol_stat", 1e-6)),
            tol_feas=float(s.get("tol_feas", 1e-7)),
        )
        adaptation = None
        a = ctrl_cfg.get("adaptation")
        if a:
            from control_box_rst_tpu.ocp import adaptation as A

            kinds = {
                "time_based_single_step": A.TimeBasedSingleStep,
                "time_based_aggressive": A.TimeBasedAggressiveEstimate,
                "shrinking_horizon": A.SimpleShrinkingHorizon,
                "redundant_controls": A.RedundantControls,
            }
            kw = {k: v for k, v in a.items() if k != "type"}
            adaptation = kinds[a["type"]](**kw)
        return (
            PredictiveController(
                nx=system.nx, nu=system.nu, ocp=ocp,
                dt=float(config.get("experiment", {}).get("dt", 0.1)),
                cfg=cfg, adaptation=adaptation,
                warm_start_shift=bool(ctrl_cfg.get("warm_start_shift", True)),
            ),
            system,
        )
    if typ == "lqr":
        Q = _arr(ctrl_cfg.get("Q", np.eye(system.nx)))
        R = _arr(ctrl_cfg.get("R", np.eye(system.nu)))
        return (
            LqrController.from_system(
                system, Q, R, xref=_arr(config.get("xf")),
            ),
            system,
        )
    if typ == "pid":
        return (
            PidController(
                nx=system.nx, nu=system.nu,
                p_gain=float(ctrl_cfg.get("p_gain", 1.0)),
                i_gain=float(ctrl_cfg.get("i_gain", 0.0)),
                d_gain=float(ctrl_cfg.get("d_gain", 0.0)),
                xref=_arr(config.get("xf")),
            ),
            system,
        )
    raise KeyError(f"unknown controller type {typ!r}")


def run_experiment(config: Dict[str, Any]) -> SignalRecorder:
    """Build and execute the configured task; returns recorded signals.

    Ref parity: Master::performTask driving a TaskInterface over the
    Environment {controller, observer, plant} (ref: master.cpp:362-379,
    environment.h:49, task_closed_loop_control.cpp:82)."""
    import jax

    from control_box_rst_tpu.sim import SimulatedPlant, run_closed_loop
    from control_box_rst_tpu.sim.benchmarks import benchmark_varying_initial_state

    exp = config.get("experiment", {})
    task = exp.get("task", "closed_loop")
    dt = float(exp.get("dt", 0.1))
    controller, system = build_controller(config)
    plant_cfg = config.get("plant", {})
    plant_system = (
        build_system(plant_cfg["system"]) if "system" in plant_cfg else system
    )
    plant = SimulatedPlant(system=plant_system)
    x0 = _arr(config.get("x0", np.zeros(system.nx)))

    rec = SignalRecorder()
    if task == "closed_loop":
        T_steps = int(exp.get("T_steps", 50))
        res = jax.jit(
            lambda x: run_closed_loop(
                plant, controller, x, T_steps=T_steps, dt=dt,
                apply_sequence_substeps=int(exp.get("apply_sequence_substeps", 0)),
            )
        )(x0)
        rec.record_closed_loop(res)
    elif task == "open_loop":
        from control_box_rst_tpu.sim import run_open_loop

        out, x_roll = run_open_loop(plant, controller, x0, dt)
        ts = np.concatenate([[0.0], np.cumsum(np.asarray(out.info["dts"]))])
        rec.add_time_series("planned_states", ts, np.asarray(out.x_seq))
        rec.add_time_series("planned_controls", ts[:-1], np.asarray(out.u_seq))
        rec.add_time_series("rollout_states", ts, np.asarray(x_roll))
    elif task == "benchmark_varying_x0":
        bm = exp.get("benchmark", {})
        res, x0s = benchmark_varying_initial_state(
            plant, controller,
            jnp.asarray(bm.get("x01", [-1.0, 0.0, 1.0])),
            jnp.asarray(bm.get("x02", [-1.0, 0.0, 1.0])),
            T_steps=int(exp.get("T_steps", 50)), dt=dt,
            x0_template=x0,
        )
        rec.add_matrix("benchmark/x0_grid", np.asarray(x0s))
        rec.add_matrix("benchmark/final_states", np.asarray(res.x_true[:, -1]))
        rec.add_matrix("benchmark/controls", np.asarray(res.u))
    else:
        raise KeyError(f"unknown task {task!r}")
    return rec


def load_config(path: str) -> Dict[str, Any]:
    import yaml

    with open(path) as f:
        return yaml.safe_load(f)
