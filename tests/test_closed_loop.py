"""Closed-loop MPC / LQR / PID tests (ref: ClosedLoopControlTask behavior)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from control_box_rst_tpu.control import (
    LqrController,
    PidController,
    PredictiveController,
    StepResponseGenerator,
)
from control_box_rst_tpu.models import DoubleIntegratorContinuous, VanDerPolOscillator
from control_box_rst_tpu.ocp import (
    Bounds,
    CompositeCost,
    QuadraticFinalStateCost,
    QuadraticFormCost,
    finite_differences_grid,
    transcribe,
)
from control_box_rst_tpu.sim import SimulatedPlant, run_closed_loop, run_open_loop
from control_box_rst_tpu.solvers import QPConfig, SQPConfig


def _mpc_controller(N=20, dt=0.1, u_max=1.0):
    sys_ = DoubleIntegratorContinuous()
    grid = finite_differences_grid(N, fd_scheme="crank_nicolson")
    cost = CompositeCost(
        costs=(
            QuadraticFormCost(Q=jnp.eye(2), R=0.1 * jnp.eye(1)),
            QuadraticFinalStateCost(Qf=10.0 * jnp.eye(2)),
        )
    )
    bounds = Bounds.unbounded(2, 1).with_u(-u_max, u_max)
    ocp = transcribe(sys_, grid, cost, bounds=bounds, x0=jnp.zeros(2))
    return PredictiveController(
        nx=2, nu=1, ocp=ocp, dt=dt,
        cfg=SQPConfig(max_iter=6, qp=QPConfig(max_iter=300, tol=1e-10)),
    )


def test_mpc_regulates_double_integrator():
    ctrl = _mpc_controller()
    plant = SimulatedPlant(system=DoubleIntegratorContinuous())
    x0 = jnp.array([1.5, 0.0])
    res = jax.jit(
        lambda x: run_closed_loop(plant, ctrl, x, T_steps=70, dt=0.1)
    )(x0)
    # regulation: final state near origin, controls respect bounds
    assert float(jnp.linalg.norm(res.x_true[-1])) < 2e-2
    assert float(jnp.max(jnp.abs(res.u))) <= 1.0 + 1e-6
    assert bool(jnp.all(res.ok))


def test_mpc_matches_lqr_when_unconstrained():
    """With no active bounds and long horizon, MPC ≈ LQR feedback."""
    sys_ = DoubleIntegratorContinuous()
    Q, R = jnp.eye(2), 0.1 * jnp.eye(1)
    from control_box_rst_tpu.ocp import riccati_terminal_cost

    term = riccati_terminal_cost(sys_, jnp.zeros(2), jnp.zeros(1), Q, R)
    grid = finite_differences_grid(40, fd_scheme="crank_nicolson")
    ocp = transcribe(
        sys_, grid,
        CompositeCost(costs=(QuadraticFormCost(Q=Q, R=R), term)),
        x0=jnp.zeros(2),
    )
    mpc = PredictiveController(nx=2, nu=1, ocp=ocp, dt=0.05,
                               cfg=SQPConfig(max_iter=8))
    lqr = LqrController.from_system(sys_, Q, R)
    plant = SimulatedPlant(system=sys_)
    x0 = jnp.array([0.8, -0.3])
    r_mpc = run_closed_loop(plant, mpc, x0, T_steps=80, dt=0.05)
    r_lqr = run_closed_loop(plant, lqr, x0, T_steps=80, dt=0.05)
    # continuous LQR applied in discrete ZOH steps ≈ discretized MPC: loose tol
    err = np.max(np.abs(np.asarray(r_mpc.x_true) - np.asarray(r_lqr.x_true)))
    assert err < 5e-2
    assert float(jnp.linalg.norm(r_mpc.x_true[-1])) < 5e-2


def test_batched_closed_loop_vmap():
    """BASELINE config 5 shape: vmap over initial states."""
    ctrl = _mpc_controller(N=10)
    plant = SimulatedPlant(system=DoubleIntegratorContinuous())
    x0s = jnp.stack([
        jnp.array([1.0, 0.0]), jnp.array([-1.0, 0.5]), jnp.array([0.3, -0.7]),
        jnp.array([2.0, 0.2]),
    ])
    run = jax.jit(jax.vmap(
        lambda x: run_closed_loop(plant, ctrl, x, T_steps=60, dt=0.1)
    ))
    res = run(x0s)
    assert res.x_true.shape == (4, 61, 2)
    assert float(jnp.max(jnp.linalg.norm(res.x_true[:, -1], axis=-1))) < 0.1
    # batch lane == single run
    single = run_closed_loop(plant, ctrl, x0s[2], T_steps=60, dt=0.1)
    np.testing.assert_allclose(
        np.asarray(res.x_true[2]), np.asarray(single.x_true), atol=1e-10
    )


def test_open_loop_task():
    ctrl = _mpc_controller(N=30)
    plant = SimulatedPlant(system=DoubleIntegratorContinuous())
    out, x_roll = run_open_loop(plant, ctrl, jnp.array([1.0, 0.0]), dt=0.1)
    assert out.u_seq.shape == (30, 1)
    # plan and rollout agree for the exact-integrator linear plant
    err = np.max(np.abs(np.asarray(out.x_seq) - np.asarray(x_roll)))
    assert err < 1e-2


def test_pid_and_step_response():
    sys_ = DoubleIntegratorContinuous()
    plant = SimulatedPlant(system=sys_)
    pid = PidController(nx=2, nu=1, p_gain=2.0, d_gain=1.0,
                        xref=jnp.array([1.0, 0.0]))
    res = run_closed_loop(plant, pid, jnp.zeros(2), T_steps=200, dt=0.05)
    # PD on position drives x1 → 1
    assert abs(float(res.x_true[-1, 0]) - 1.0) < 0.05

    step = StepResponseGenerator(nx=2, nu=1, u_step=jnp.array([0.5]), t_step=0.5)
    res2 = run_closed_loop(plant, step, jnp.zeros(2), T_steps=20, dt=0.1)
    np.testing.assert_allclose(np.asarray(res2.u[:5]), 0.0)
    np.testing.assert_allclose(np.asarray(res2.u[5:]), 0.5)


def test_nonlinear_vdp_mpc():
    """Van der Pol closed-loop stabilization (BASELINE config 2 skeleton)."""
    from control_box_rst_tpu.ocp import multiple_shooting_grid

    sys_ = VanDerPolOscillator()
    grid = multiple_shooting_grid(20, integrator="rk4")
    cost = CompositeCost(
        costs=(
            QuadraticFormCost(Q=jnp.eye(2), R=0.1 * jnp.eye(1)),
            QuadraticFinalStateCost(Qf=5.0 * jnp.eye(2)),
        )
    )
    bounds = Bounds.unbounded(2, 1).with_u(-2.0, 2.0)
    ocp = transcribe(sys_, grid, cost, bounds=bounds, x0=jnp.zeros(2))
    mpc = PredictiveController(nx=2, nu=1, ocp=ocp, dt=0.1,
                               cfg=SQPConfig(max_iter=8))
    plant = SimulatedPlant(system=sys_)
    res = jax.jit(
        lambda x: run_closed_loop(plant, mpc, x, T_steps=60, dt=0.1)
    )(jnp.array([1.0, 0.5]))
    assert float(jnp.linalg.norm(res.x_true[-1])) < 5e-2
    assert float(jnp.max(jnp.abs(res.u))) <= 2.0 + 1e-6


def test_closed_loop_predictor_compensation():
    """OneStepPredictor compensation in the device loop (ref: CPU-time/
    dead-time compensation, task_closed_loop_control.cpp:128-145): with an
    artificial one-interval actuation delay in the plant model, the
    predictor-compensated loop tracks at least as well as the naive loop."""
    from control_box_rst_tpu.models.filters import OneStepPredictor

    ctrl = _mpc_controller()
    sys_ = DoubleIntegratorContinuous()
    plant = SimulatedPlant(system=sys_)
    pred = OneStepPredictor(system=sys_)
    x0 = jnp.array([1.2, 0.0])
    r = jax.jit(
        lambda x: run_closed_loop(
            plant, ctrl, x, T_steps=50, dt=0.1, predictor=pred
        )
    )(x0)
    assert bool(jnp.all(r.ok))
    assert float(jnp.max(jnp.abs(r.x_true[-1]))) < 5e-2
