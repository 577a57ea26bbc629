"""Interior-point solver tests (IPOPT-role backend, solvers/ip.py).

Oracle strategy (SURVEY.md §4): the SQP solver — itself validated against
dense-KKT numpy oracles and scipy — is the cross-check, mirroring the
reference's edge-based vs vertex-based vs ignore-structure cross-validation
(ref: test_hyper_graph_optimization_problem_*.cpp). The reference's own IP
tests are guarded by IPOPT availability (ref: test_solver_ipopt.cpp).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from control_box_rst_tpu.core.types import SolverStatus
from control_box_rst_tpu.models import SerialIntegratorSystem, VanDerPolOscillator
from control_box_rst_tpu.ocp import (
    Bounds,
    CompositeCost,
    QuadraticFinalStateCost,
    QuadraticFormCost,
    finite_differences_grid,
    multiple_shooting_grid,
    transcribe,
)
from control_box_rst_tpu.ocp.constraints import (
    FunctionalStageConstraint,
    terminal_equality,
)
from control_box_rst_tpu.ocp.problem import Trajectory
from control_box_rst_tpu.solvers import (
    IPConfig,
    SQPConfig,
    ip_solve,
    sqp_solve,
)


def _di_ocp(x0, N=20, umax=1.0, Qf=5.0, stage_con=None, term_con=None):
    sys_ = SerialIntegratorSystem(nx=2, nu=1)
    costs = [QuadraticFormCost(Q=jnp.eye(2), R=0.1 * jnp.eye(1))]
    if Qf is not None:
        costs.append(QuadraticFinalStateCost(Qf=Qf * jnp.eye(2)))
    return transcribe(
        sys_,
        finite_differences_grid(N=N),
        CompositeCost(costs=tuple(costs)),
        bounds=Bounds.unbounded(2, 1).with_u(-umax, umax),
        x0=jnp.asarray(x0),
        stage_con=stage_con,
        term_con=term_con,
    )


def test_ip_matches_sqp_box_bounded():
    """Active input bounds: IP and SQP must find the same KKT point."""
    x0 = jnp.array([2.0, 0.0])
    ocp = _di_ocp(x0)
    traj0 = Trajectory.linear_interp(x0, jnp.zeros(2), 20, 1, 0.1)
    r_sqp = jax.jit(lambda t: sqp_solve(ocp, t, SQPConfig(max_iter=20)))(traj0)
    r_ip = jax.jit(lambda t: ip_solve(ocp, t, IPConfig(max_iter=60)))(traj0)
    assert int(r_ip.status) == int(SolverStatus.CONVERGED)
    np.testing.assert_allclose(r_ip.objective, r_sqp.objective, rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(r_ip.traj.U), np.asarray(r_sqp.traj.U), atol=1e-5
    )
    # bounds strictly respected (interior method: never violated)
    assert jnp.all(r_ip.traj.U <= 1.0 + 1e-9)
    assert jnp.all(r_ip.traj.U >= -1.0 - 1e-9)
    # the bound is actually active on this problem
    assert jnp.min(r_ip.traj.U) < -1.0 + 1e-4


def test_ip_general_rows_and_terminal_equality():
    """Stage inequality (state constraint) + terminal equality rows."""
    x0 = jnp.array([2.0, 0.0])
    sc = FunctionalStageConstraint(
        nineq=1, ineq_fn=lambda x, u: -x[1] - 0.9  # x2 >= -0.9
    )
    ocp = _di_ocp(x0, N=25, Qf=None, stage_con=sc, term_con=terminal_equality(2))
    traj0 = Trajectory.linear_interp(x0, jnp.zeros(2), 25, 1, 0.25)
    r_sqp = jax.jit(lambda t: sqp_solve(ocp, t, SQPConfig(max_iter=30)))(traj0)
    r_ip = jax.jit(lambda t: ip_solve(ocp, t, IPConfig(max_iter=100)))(traj0)
    assert int(r_ip.status) == int(SolverStatus.CONVERGED)
    np.testing.assert_allclose(r_ip.objective, r_sqp.objective, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(r_ip.traj.U), np.asarray(r_sqp.traj.U), atol=1e-5
    )
    # state constraint active and never violated
    assert jnp.min(r_ip.traj.X[:, 1]) >= -0.9 - 1e-7
    assert jnp.min(r_ip.traj.X[:, 1]) < -0.9 + 1e-4
    # terminal equality satisfied
    np.testing.assert_allclose(np.asarray(r_ip.traj.X[-1]), 0.0, atol=1e-7)


def test_ip_unconstrained_is_newton():
    """No finite bounds anywhere: IP reduces to Newton on the equality-
    constrained problem and must converge fast."""
    x0 = jnp.array([1.0, -0.5])
    sys_ = SerialIntegratorSystem(nx=2, nu=1)
    ocp = transcribe(
        sys_,
        finite_differences_grid(N=15),
        CompositeCost(costs=(
            QuadraticFormCost(Q=jnp.eye(2), R=0.1 * jnp.eye(1)),
            QuadraticFinalStateCost(Qf=2.0 * jnp.eye(2)),
        )),
        bounds=Bounds.unbounded(2, 1),
        x0=x0,
    )
    traj0 = Trajectory.linear_interp(x0, jnp.zeros(2), 15, 1, 0.1)
    r_ip = jax.jit(lambda t: ip_solve(ocp, t))(traj0)
    r_sqp = jax.jit(lambda t: sqp_solve(ocp, t))(traj0)
    assert int(r_ip.status) == int(SolverStatus.CONVERGED)
    np.testing.assert_allclose(r_ip.objective, r_sqp.objective, rtol=1e-9)
    assert int(r_ip.iterations) <= 12


def test_ip_batched_equals_single():
    """vmap(ip_solve) lanes must match unbatched solves bitwise-closely
    (per-lane μ trajectories and convergence masks)."""
    N = 20
    x0s = jnp.asarray(np.random.RandomState(0).uniform(-2, 2, (8, 2)))

    def solve_one(x0):
        ocp = _di_ocp(x0, N=N)
        t0 = Trajectory.linear_interp(x0, jnp.zeros(2), N, 1, 0.1)
        return ip_solve(ocp, t0, IPConfig(max_iter=60))

    batch = jax.jit(jax.vmap(solve_one))(x0s)
    assert jnp.all(batch.status == int(SolverStatus.CONVERGED))
    for i in [0, 3, 7]:
        single = jax.jit(solve_one)(x0s[i])
        np.testing.assert_allclose(
            np.asarray(batch.W[i]), np.asarray(single.W), atol=1e-12
        )


def test_ip_infeasible_reports_and_stays_finite():
    """Unreachable terminal equality: the lane must flag INFEASIBLE (or at
    least terminate) with all outputs finite — never NaN."""
    x0 = jnp.array([2.0, 0.0])
    # reaching the origin in 2.0 s with |u| <= 1 from (2, 0) is impossible
    ocp = _di_ocp(x0, N=20, Qf=None, term_con=terminal_equality(2))
    traj0 = Trajectory.linear_interp(x0, jnp.zeros(2), 20, 1, 0.1)
    r = jax.jit(lambda t: ip_solve(ocp, t, IPConfig(max_iter=80)))(traj0)
    assert int(r.status) in (
        int(SolverStatus.INFEASIBLE),
        int(SolverStatus.EARLY_TERMINATED),
    )
    assert bool(jnp.all(jnp.isfinite(r.W)))
    assert bool(jnp.isfinite(r.objective))


def test_ip_nonlinear_van_der_pol():
    """Nonlinear dynamics (multiple shooting): IP matches SQP."""
    sys_ = VanDerPolOscillator()
    x0 = jnp.array([1.0, 0.5])
    ocp = transcribe(
        sys_,
        multiple_shooting_grid(N=20, integrator="rk4"),
        CompositeCost(costs=(
            QuadraticFormCost(Q=jnp.eye(2), R=0.1 * jnp.eye(1)),
            QuadraticFinalStateCost(Qf=5.0 * jnp.eye(2)),
        )),
        bounds=Bounds.unbounded(2, 1).with_u(-2.0, 2.0),
        x0=x0,
    )
    traj0 = Trajectory.linear_interp(x0, jnp.zeros(2), 20, 1, 0.1)
    r_sqp = jax.jit(lambda t: sqp_solve(ocp, t, SQPConfig(max_iter=30)))(traj0)
    r_ip = jax.jit(lambda t: ip_solve(ocp, t, IPConfig(max_iter=80)))(traj0)
    assert int(r_ip.status) == int(SolverStatus.CONVERGED)
    np.testing.assert_allclose(r_ip.objective, r_sqp.objective, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(r_ip.traj.U), np.asarray(r_sqp.traj.U), atol=1e-4
    )


def test_ip_complementarity_and_duals():
    """KKT quality: bound duals nonnegative, complementarity ~ final μ."""
    x0 = jnp.array([2.0, 0.0])
    ocp = _di_ocp(x0)
    traj0 = Trajectory.linear_interp(x0, jnp.zeros(2), 20, 1, 0.1)
    r = jax.jit(lambda t: ip_solve(ocp, t))(traj0)
    assert int(r.status) == int(SolverStatus.CONVERGED)
    assert jnp.all(r.z_lw >= 0.0) and jnp.all(r.z_uw >= 0.0)
    assert float(r.comp_res) < 1e-7
    # active lower bound rows carry positive multipliers
    u = r.traj.U[:, 0]
    zl_u = r.z_lw[:-1, 2]  # u column in w = [x1, x2, u, dt]
    active = np.asarray(u) < -1.0 + 1e-6
    assert np.all(np.asarray(zl_u)[active] > 1e-6)


def test_ip_closed_loop_controller():
    """PredictiveController(solver='ip') drives the plant to the origin and
    tracks the SQP-backed controller's closed loop."""
    from control_box_rst_tpu.control import PredictiveController
    from control_box_rst_tpu.models.benchmark import DoubleIntegratorContinuous
    from control_box_rst_tpu.sim import SimulatedPlant, run_closed_loop

    sys_ = DoubleIntegratorContinuous()
    ocp = transcribe(
        sys_,
        finite_differences_grid(20),
        CompositeCost(costs=(
            QuadraticFormCost(Q=jnp.eye(2), R=0.1 * jnp.eye(1)),
            QuadraticFinalStateCost(Qf=10.0 * jnp.eye(2)),
        )),
        bounds=Bounds.unbounded(2, 1).with_u(-1.0, 1.0),
        x0=jnp.zeros(2),
    )
    plant = SimulatedPlant(system=sys_)
    x0 = jnp.array([1.5, 0.0])
    mk = lambda solver: PredictiveController(
        nx=2, nu=1, ocp=ocp, dt=0.1, solver=solver,
        cfg=SQPConfig(max_iter=6), ip_cfg=IPConfig(max_iter=40),
    )
    r_ip = jax.jit(lambda x: run_closed_loop(plant, mk("ip"), x, T_steps=60, dt=0.1))(x0)
    r_sqp = jax.jit(lambda x: run_closed_loop(plant, mk("sqp"), x, T_steps=60, dt=0.1))(x0)
    assert jnp.max(jnp.abs(r_ip.x_true[-1])) < 1e-2
    np.testing.assert_allclose(
        np.asarray(r_ip.u), np.asarray(r_sqp.u), atol=2e-4
    )
    # input bounds never violated along the loop (interior iterates)
    assert jnp.all(jnp.abs(r_ip.u) <= 1.0 + 1e-9)
