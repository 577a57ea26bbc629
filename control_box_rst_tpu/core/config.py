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
    if typ == "hermite_simpson_uncompressed":
        return grids.hermite_simpson_uncompressed_grid(N)
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
    elif typ == "quadratic_state":
        parts.append(
            C.QuadraticStateCost(
                Q=_arr(cfg.get("Q", np.eye(nx))),
                integral=bool(cfg.get("integral", False)),
            )
        )
    elif typ == "quadratic_control":
        parts.append(
            C.QuadraticControlCost(
                R=_arr(cfg.get("R", np.eye(nu))),
                integral=bool(cfg.get("integral", False)),
            )
        )
    elif typ == "minimum_time":
        parts.append(C.MinimumTime(
            weight=float(cfg.get("weight", 1.0)),
            lsq_form=bool(cfg.get("lsq_form", False)),
        ))
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
    elif typ == "min_time_quadratic_gain_scheduled":
        parts.append(
            C.MinTimeQuadraticGainScheduled(
                time_weight=float(cfg.get("time_weight", 1.0)),
                Q=_arr(cfg.get("Q")), R=_arr(cfg.get("R")),
                radius=float(cfg.get("radius", 1.0)),
                sharpness=float(cfg.get("sharpness", 10.0)),
            )
        )
    else:
        raise KeyError(f"unknown cost type {typ!r}")
    if cfg.get("Qf") is not None:
        parts.append(C.QuadraticFinalStateCost(Qf=_arr(cfg["Qf"])))
    # L1 soft state bounds as an additional exact-penalty term
    # (ref: l1_stab_edges.h; YAML: cost.soft_x_min/max + soft_weight)
    if cfg.get("soft_x_min") is not None or cfg.get("soft_x_max") is not None:
        from control_box_rst_tpu.ocp import FunctionalStageConstraint
        import jax.numpy as _jnp

        lo = _arr(cfg.get("soft_x_min", np.full(nx, -np.inf)))
        hi = _arr(cfg.get("soft_x_max", np.full(nx, np.inf)))
        con = FunctionalStageConstraint(
            nineq=2 * nx,
            ineq_fn=lambda x, u: _jnp.concatenate([lo - x, x - hi]),
        )
        parts.append(
            C.L1SoftConstraintCost(
                constraint=con, weight=float(cfg.get("soft_weight", 10.0))
            )
        )
    if len(parts) == 1:
        return parts[0]
    return C.CompositeCost(costs=tuple(parts))


def build_terminal_constraint(config: Dict[str, Any], nx: int):
    """constraints: section → TerminalConstraint (None if absent).

    YAML forms (ref: final_state_constraints.h):
      constraints: {terminal_ball: {S: [[..]], gamma: 0.1}}
      constraints: {terminal_equality: true}            # x_N == xf
      constraints: {terminal_partial_equality: [0]}     # component indices
    """
    cc = config.get("constraints")
    if not cc:
        return None
    from control_box_rst_tpu.ocp import (
        TerminalBall,
        terminal_equality,
        terminal_partial_equality,
    )

    if "terminal_ball" in cc:
        tb = cc["terminal_ball"]
        S = _arr(tb.get("S", np.eye(nx)))
        return TerminalBall(S=S, gamma=float(tb.get("gamma", 1.0)))
    if cc.get("terminal_equality"):
        return terminal_equality(nx)
    if "terminal_partial_equality" in cc:
        return terminal_partial_equality(cc["terminal_partial_equality"])
    raise KeyError(f"unknown constraints spec: {sorted(cc)}")


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
        term_con=build_terminal_constraint(config, system.nx),
    )
    return ocp, system


def build_plant(config: Dict[str, Any], default_system):
    """plant: section → SimulatedPlant.

    YAML (ref: simulated_plant.h:56, disturbances.h:35):
      plant:
        system: {type: ...}          # defaults to the controller's model
        integrator: {type: rk4, substeps: 4}
        output: full | first         # or a C matrix (list of lists)
        noise: {state_std: 0.0, output_std: 0.0, input_std: 0.0}
        x0: [..]                     # plant-side initial state override
    """
    from control_box_rst_tpu.ops.integrators import make_integrator
    from control_box_rst_tpu.sim import GaussianNoise, SimulatedPlant

    pc = config.get("plant", {})
    system = build_system(pc["system"]) if "system" in pc else default_system
    integ_cfg = pc.get("integrator", {})
    integrator = make_integrator(
        integ_cfg.get("type", "rk4"), int(integ_cfg.get("substeps", 4))
    )
    out = pc.get("output", "full")
    if isinstance(out, str):
        output_kind, C = out, None
    else:
        output_kind, C = "linear", _arr(out)
    noise = pc.get("noise", {})

    def _noise(key):
        std = float(noise.get(key, 0.0))
        return GaussianNoise(std=std) if std > 0.0 else None

    return SimulatedPlant(
        system=system,
        integrator=integrator,
        output_kind=output_kind,
        C=C,
        state_noise=_noise("state_std"),
        output_noise=_noise("output_std"),
        input_noise=_noise("input_std"),
    )


def build_observer(config: Dict[str, Any], plant) -> Any:
    """observer: section → observer object.

    YAML (ref: observer_interface.h:58; NoObserver :141):
      observer: {type: none}
      observer: {type: kalman, W: [[..]], V: [[..]]}   # steady-state KF on
        the plant linearization at the origin, ZOH-discretized at dt
    """
    import jax.numpy as jnp

    from control_box_rst_tpu.sim.observer import (
        NoObserver,
        SteadyStateKalmanObserver,
    )

    oc = config.get("observer", {"type": "none"})
    typ = oc.get("type", "none")
    if typ in ("none", "no_observer"):
        return NoObserver()
    if typ == "kalman":
        system = plant.system
        dt = float(config.get("experiment", {}).get("dt", 0.1))
        x0 = jnp.zeros((system.nx,))
        u0 = jnp.zeros((system.nu,))
        A = system.linear_A(x0, u0)
        B = system.linear_B(x0, u0)
        if system.continuous_time:
            # exact ZOH discretization via the augmented-matrix exponential
            from jax.scipy.linalg import expm

            nx, nu = system.nx, system.nu
            M = jnp.zeros((nx + nu, nx + nu)).at[:nx, :nx].set(A)
            M = M.at[:nx, nx:].set(B)
            E = expm(M * dt)
            Ad, Bd = E[:nx, :nx], E[:nx, nx:]
        else:
            Ad, Bd = A, B
        if plant.output_kind == "full":
            C = jnp.eye(system.nx)
        elif plant.output_kind == "first":
            C = jnp.eye(system.nx)[:1]
        else:
            C = plant.C
        return SteadyStateKalmanObserver.from_linear(
            Ad, Bd, C, W=_arr(oc.get("W")), V=_arr(oc.get("V"))
        )
    raise KeyError(f"unknown observer type {typ!r}")


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
        solver_type = s.get("type", "sqp")
        cfg = SQPConfig(
            max_iter=int(s.get("max_iter", 10)),
            qp=QPConfig(
                max_iter=int(s.get("qp_max_iter", 200)),
                tol=float(s.get("qp_tol", 1e-8)),
            ),
            tol_stat=float(s.get("tol_stat", 1e-6)),
            tol_feas=float(s.get("tol_feas", 1e-7)),
        )
        ip_cfg = None
        lm_cfg = None
        if solver_type == "ip":
            from control_box_rst_tpu.solvers import IPConfig

            ip_cfg = IPConfig(
                max_iter=int(s.get("max_iter", 60)),
                tol=(float(s["tol"]) if "tol" in s else None),
                mu_init=float(s.get("mu_init", 1e-1)),
            )
        elif solver_type == "lm":
            from control_box_rst_tpu.solvers import LMConfig

            lm_cfg = LMConfig(
                max_iter=int(s.get("max_iter", 50)),
                mu_init=float(s.get("mu_init", 1e-4)),
                feas_tol=float(s.get("tol_feas", 1e-6)),
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
                "grow_on_infeasibility": A.GrowOnInfeasibility,
            }
            kw = {k: v for k, v in a.items() if k != "type"}
            adaptation = kinds[a["type"]](**kw)
        return (
            PredictiveController(
                nx=system.nx, nu=system.nu, ocp=ocp,
                dt=float(config.get("experiment", {}).get("dt", 0.1)),
                cfg=cfg, solver=solver_type, ip_cfg=ip_cfg, lm_cfg=lm_cfg,
                adaptation=adaptation,
                warm_start_shift=bool(ctrl_cfg.get("warm_start_shift", True)),
                n_active_init=int(ctrl_cfg.get("n_active_init", 0)),
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
    if typ == "simple_state":
        from control_box_rst_tpu.control import SimpleStateController

        return (
            SimpleStateController(
                nx=system.nx, nu=system.nu,
                K=_arr(ctrl_cfg["K"]),
                V=_arr(ctrl_cfg.get("V")),
                xref=_arr(config.get("xf")),
                uref=_arr(ctrl_cfg.get("uref")),
            ),
            system,
        )
    if typ == "step_response":
        from control_box_rst_tpu.control import StepResponseGenerator

        return (
            StepResponseGenerator(
                nx=system.nx, nu=system.nu,
                u_step=_arr(ctrl_cfg.get("u_step", np.ones(system.nu))),
                u_init=_arr(ctrl_cfg.get("u_init")),
                t_step=float(ctrl_cfg.get("t_step", 0.0)),
            ),
            system,
        )
    if typ == "dual_mode":
        # MPC far from the goal, LQR inside the terminal ball
        # (ref: dual_mode_controller.h:47). YAML:
        #   controller: {type: dual_mode, local: {Q: .., R: ..},
        #                S: [[..]], gamma: 0.1, latch: true}
        from control_box_rst_tpu.control import DualModeController

        inner = dict(config)
        inner["controller"] = {
            k: v for k, v in ctrl_cfg.items()
            if k not in ("type", "local", "S", "gamma", "latch")
        }
        inner["controller"]["type"] = "predictive"
        mpc, _ = build_controller(inner)
        local_cfg = ctrl_cfg.get("local", {})
        xf = _arr(config.get("xf", np.zeros(system.nx)))
        local = LqrController.from_system(
            system,
            _arr(local_cfg.get("Q", np.eye(system.nx))),
            _arr(local_cfg.get("R", np.eye(system.nu))),
            xref=xf,
        )
        return (
            DualModeController(
                nx=system.nx, nu=system.nu,
                global_controller=mpc, local_controller=local,
                S=_arr(ctrl_cfg.get("S", np.eye(system.nx))),
                gamma=float(ctrl_cfg.get("gamma", 0.1)),
                xf=xf,
                latch=bool(ctrl_cfg.get("latch", False)),
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
    plant = build_plant(config, system)
    observer = build_observer(config, plant)
    x0 = _arr(config.get("plant", {}).get("x0", config.get("x0", np.zeros(system.nx))))

    rec = SignalRecorder()
    if task == "closed_loop":
        T_steps = int(exp.get("T_steps", 50))
        res = jax.jit(
            lambda x: run_closed_loop(
                plant, controller, x, T_steps=T_steps, dt=dt,
                observer=observer,
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
    elif task == "benchmark_increasing_n":
        # horizon sweep, one open-loop solve per N
        # (ref: benchmark_task_increasing_n_open_loop.h:48)
        from control_box_rst_tpu.sim.benchmarks import benchmark_increasing_n_open_loop

        bm = exp.get("benchmark", {})
        N_values = [int(n) for n in bm.get("N_values", [10, 20, 40])]

        def make_ocp(N):
            cfg_n = dict(config)
            cfg_n["grid"] = dict(config.get("grid", {}), N=N)
            ocp_n, _ = build_ocp(cfg_n)
            return ocp_n

        out = benchmark_increasing_n_open_loop(
            make_ocp, N_values, x0, dt_init=dt,
        )
        rec.add_matrix("benchmark/n_values", np.asarray(N_values, dtype=np.float64))
        rec.add_matrix(
            "benchmark/solve_times",
            np.asarray([r["solve_time_s"] for r in out], dtype=np.float64),
        )
        rec.add_matrix(
            "benchmark/objectives",
            np.asarray([float(r["objective"]) for r in out], dtype=np.float64),
        )
        rec.add_matrix(
            "benchmark/status",
            np.asarray([int(r["status"]) for r in out], dtype=np.float64),
        )
    else:
        raise KeyError(f"unknown task {task!r}")
    return rec


def load_config(path: str) -> Dict[str, Any]:
    import yaml

    with open(path) as f:
        return yaml.safe_load(f)
