"""Dual-mode controller, move blocking, and cost-integration tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from control_box_rst_tpu.control import (
    DualModeController,
    LqrController,
    PredictiveController,
)
from control_box_rst_tpu.models import DoubleIntegratorContinuous
from control_box_rst_tpu.ocp import (
    Bounds,
    CompositeCost,
    QuadraticFinalStateCost,
    QuadraticFormCost,
    Trajectory,
    finite_differences_grid,
    move_blocking_grid,
    transcribe,
)
from control_box_rst_tpu.sim import SimulatedPlant, run_closed_loop
from control_box_rst_tpu.solvers import QPConfig, SQPConfig, sqp_solve


def _mpc(N=20, u_max=1.0):
    sys_ = DoubleIntegratorContinuous()
    grid = finite_differences_grid(N, fd_scheme="crank_nicolson")
    cost = CompositeCost(costs=(
        QuadraticFormCost(Q=jnp.eye(2), R=0.1 * jnp.eye(1)),
        QuadraticFinalStateCost(Qf=10.0 * jnp.eye(2)),
    ))
    ocp = transcribe(sys_, grid, cost,
                     bounds=Bounds.unbounded(2, 1).with_u(-u_max, u_max),
                     x0=jnp.zeros(2))
    return PredictiveController(nx=2, nu=1, ocp=ocp, dt=0.1,
                                cfg=SQPConfig(max_iter=6))


def test_dual_mode_switches_to_local():
    """Far from goal: MPC drives; inside the terminal ball: LQR takes over.
    (ref: DualModeController, dual_mode_controller.cpp:56-90)"""
    sys_ = DoubleIntegratorContinuous()
    dual = DualModeController(
        nx=2, nu=1,
        global_controller=_mpc(),
        local_controller=LqrController.from_system(sys_, jnp.eye(2), jnp.eye(1)),
        S=jnp.eye(2), gamma=0.09,  # ball radius 0.3
        xf=jnp.zeros(2),
    )
    plant = SimulatedPlant(system=sys_)
    res = jax.jit(
        lambda x: run_closed_loop(plant, dual, x, T_steps=70, dt=0.1)
    )(jnp.array([1.5, 0.0]))
    active = np.asarray(res.info["local_active"])
    assert not active[0]          # starts global
    assert active[-1]             # ends local
    # switched exactly when inside the ball
    d2 = np.sum(np.asarray(res.x_observed) ** 2, axis=1)
    np.testing.assert_array_equal(active, d2 <= 0.09)
    assert float(jnp.linalg.norm(res.x_true[-1])) < 5e-2


def test_move_blocking_ties_controls():
    """Move blocking: controls constant within blocks
    (ref: FiniteDifferencesGridMoveBlocking)."""
    sys_ = DoubleIntegratorContinuous()
    grid = move_blocking_grid(12, blocks=[4, 4, 4], fd_scheme="crank_nicolson")
    cost = CompositeCost(costs=(
        QuadraticFormCost(Q=jnp.eye(2), R=0.1 * jnp.eye(1)),
        QuadraticFinalStateCost(Qf=10.0 * jnp.eye(2)),
    ))
    x0 = jnp.array([1.0, 0.0])
    ocp = transcribe(sys_, grid, cost, x0=x0)
    traj0 = Trajectory.linear_interp(x0, jnp.zeros(2), 12, 1, 0.1)
    res = sqp_solve(ocp, traj0, SQPConfig(max_iter=10,
                                          qp=QPConfig(max_iter=2000, tol=1e-12)))
    U = np.asarray(res.traj.U[:, 0])
    # within each block of 4, controls equal
    for b in range(3):
        blk = U[4 * b : 4 * (b + 1)]
        np.testing.assert_allclose(blk, blk[0], atol=1e-7)
    # blocks differ from each other (the problem is not trivial)
    assert abs(U[0] - U[4]) > 1e-3
    # blocked solution costs more than unblocked
    ocp_free = transcribe(sys_, finite_differences_grid(12, "crank_nicolson"),
                          cost, x0=x0)
    res_free = sqp_solve(ocp_free, traj0, SQPConfig(max_iter=10))
    assert float(res.objective) >= float(res_free.objective) - 1e-9


def test_trapezoidal_integral_cost():
    """Integral cost with trapezoidal quadrature vs left-sum: both converge,
    trapezoid weighs the terminal approach differently
    (ref: CostIntegrationRule, full_discretization_grid_base.h:45)."""
    sys_ = DoubleIntegratorContinuous()
    cost_int = QuadraticFormCost(Q=jnp.eye(2), R=0.1 * jnp.eye(1), integral=True)
    x0 = jnp.array([1.0, 0.0])
    objs = {}
    for rule in ("left_sum", "trapezoidal"):
        grid = finite_differences_grid(20, "crank_nicolson", cost_integration=rule)
        ocp = transcribe(sys_, grid, cost_int, x0=x0)
        traj0 = Trajectory.linear_interp(x0, jnp.zeros(2), 20, 1, 0.1)
        res = sqp_solve(ocp, traj0, SQPConfig(max_iter=12))
        assert int(res.status) == 1, rule
        objs[rule] = float(res.objective)
        assert float(res.feas_res) < 1e-7
    # both approximate the same continuous integral: close but not equal
    assert abs(objs["left_sum"] - objs["trapezoidal"]) < 0.2
    assert objs["left_sum"] != objs["trapezoidal"]
