"""Time-optimal MPC tests (BASELINE configs 3 and 4).

Golden value: for the double integrator ẍ=u, |u|≤1, rest-to-rest transfer
over distance d, the minimum time is T* = 2√d (bang-bang). The TEB-style
uniform grid (single dt decision variable, ref
finite_differences_variable_grid.h) and the non-uniform grid (per-interval
dt, ref non_uniform_finite_differences_variable_grid.h) must both find it.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from control_box_rst_tpu.models import DoubleIntegratorContinuous
from control_box_rst_tpu.ocp import (
    Bounds,
    MinimumTime,
    Trajectory,
    finite_differences_variable_grid,
    multiple_shooting_variable_grid,
    non_uniform_fd_variable_grid,
    transcribe,
)
from control_box_rst_tpu.solvers import QPConfig, SQPConfig, sqp_solve


def _time_optimal_ocp(grid, d=1.0, dt_init=0.2):
    sys_ = DoubleIntegratorContinuous()
    x0 = jnp.array([d, 0.0])
    xf = jnp.zeros(2)
    bounds = (
        Bounds.unbounded(2, 1)
        .with_u(-1.0, 1.0)
        .with_dt(1e-3, 0.5)
    )
    ocp = transcribe(
        sys_, grid, MinimumTime(),
        bounds=bounds, x0=x0, xf=xf, xf_fixed=jnp.array([1.0, 1.0]),
    )
    N = grid.N
    traj0 = Trajectory.linear_interp(x0, xf, N, 1, dt_init)
    return ocp, traj0


CFG = SQPConfig(max_iter=50, qp=QPConfig(max_iter=1000, tol=1e-10),
                tol_stat=1e-6, tol_feas=1e-8)


def test_uniform_time_optimal_double_integrator():
    """Config 3: single-dt TEB-style grid → T* = 2."""
    N = 20
    grid = finite_differences_variable_grid(N, fd_scheme="crank_nicolson")
    ocp, traj0 = _time_optimal_ocp(grid)
    res = sqp_solve(ocp, traj0, CFG)
    T = float(jnp.sum(res.traj.dts))
    # discretization error of crank-nicolson bang-bang: O(1/N) tolerance
    assert abs(T - 2.0) < 0.15, f"min time {T} vs 2.0"
    # all dts equal (tie rows)
    dts = np.asarray(res.traj.dts)
    np.testing.assert_allclose(dts, dts[0], rtol=1e-5)
    # defects feasible, terminal state reached
    assert float(res.feas_res) < 1e-6
    np.testing.assert_allclose(np.asarray(res.traj.X[-1]), 0.0, atol=1e-6)
    # bang-bang: u starts at -1, ends at +1
    u = np.asarray(res.traj.U[:, 0])
    assert u[0] < -0.95 and u[-1] > 0.95


def test_nonuniform_time_optimal_double_integrator():
    """Config 4 core: per-interval dt grid → same minimum time.

    Pure per-interval minimum time is degenerate (any redistribution of dt
    within a bang arc is optimal); like the reference's
    MinimumTimeRegularized (minimum_time.h:109), a quadratic dt
    regularization makes the solution unique (uniform dts)."""
    from control_box_rst_tpu.ocp import MinimumTimeRegularized

    N = 20
    grid = non_uniform_fd_variable_grid(N, fd_scheme="crank_nicolson")
    sys_ = DoubleIntegratorContinuous()
    x0 = jnp.array([1.0, 0.0])
    bounds = Bounds.unbounded(2, 1).with_u(-1.0, 1.0).with_dt(1e-3, 0.5)
    ocp = transcribe(
        sys_, grid, MinimumTimeRegularized(reg=0.1),
        bounds=bounds, x0=x0, xf=jnp.zeros(2), xf_fixed=jnp.array([1.0, 1.0]),
    )
    traj0 = Trajectory.linear_interp(x0, jnp.zeros(2), N, 1, 0.2)
    res = sqp_solve(ocp, traj0, SQPConfig(max_iter=100,
                                          qp=QPConfig(max_iter=1000, tol=1e-10)))
    T = float(jnp.sum(res.traj.dts))
    assert abs(T - 2.0) < 0.15, f"min time {T} vs 2.0"
    assert float(res.feas_res) < 1e-6
    dts = np.asarray(res.traj.dts)
    assert np.all(dts >= 1e-3 - 1e-9) and np.all(dts <= 0.5 + 1e-9)
    # regularization makes dts uniform
    np.testing.assert_allclose(dts, dts.mean(), rtol=1e-3)


def test_time_optimal_multiple_shooting():
    """Config 3 with a shooting grid (MultipleShootingVariableGrid)."""
    N = 15
    grid = multiple_shooting_variable_grid(N, integrator="rk4")
    ocp, traj0 = _time_optimal_ocp(grid)
    res = sqp_solve(ocp, traj0, CFG)
    T = float(jnp.sum(res.traj.dts))
    assert abs(T - 2.0) < 0.2, f"min time {T} vs 2.0"
    dts = np.asarray(res.traj.dts)
    np.testing.assert_allclose(dts, dts[0], rtol=1e-5)


def test_time_optimal_batched():
    """Batched minimum-time solves over distances: T*(d) = 2√d."""
    N = 20
    grid = finite_differences_variable_grid(N, fd_scheme="crank_nicolson")
    ocp0, _ = _time_optimal_ocp(grid)

    @jax.jit
    @jax.vmap
    def solve_d(d):
        x0 = jnp.stack([d, 0.0])
        ocp = ocp0.replace(bc=ocp0.bc.replace(x0=x0))
        traj0 = Trajectory.linear_interp(x0, jnp.zeros(2), N, 1, 0.2)
        res = sqp_solve(ocp, traj0, CFG)
        return jnp.sum(res.traj.dts), res.feas_res

    ds = jnp.array([0.5, 1.0, 2.0])
    Ts, feas = solve_d(ds)
    expect = 2.0 * np.sqrt(np.asarray(ds))
    np.testing.assert_allclose(np.asarray(Ts), expect, atol=0.2)
    assert float(jnp.max(feas)) < 1e-6
