"""Hermite-Simpson quadrature collocation as a grid option.

Ref parity tested: the reference's Hermite-Simpson collocation edges
(structured_ocp/edges/collocation_edges.h:42-1392) and
QuadratureHermiteSimpson cost integration (quadrature.h:622,1087) — here as
fd_scheme="hermite_simpson" + cost_integration="hermite_simpson" on the
canonical stage NLP.
"""
import jax
import jax.numpy as jnp
import numpy as np

from control_box_rst_tpu.models import DoubleIntegratorContinuous, VanDerPolOscillator
from control_box_rst_tpu.ocp import (
    Bounds,
    QuadraticFormCost,
    finite_differences_grid,
    transcribe,
)
from control_box_rst_tpu.ocp.problem import Trajectory
from control_box_rst_tpu.solvers import SQPConfig, sqp_solve


def _objective_on_exact_trajectory(cost_integration: str, N: int) -> float:
    """Double integrator from x=[0,0] under u(t)=1: x(t) = [t²/2, t].
    Integral cost ∫₀ᵀ (x'Qx + u'Ru) dt has a closed form; evaluate the
    transcription objective on the EXACT sampled trajectory and compare."""
    T = 2.0
    dt = T / N
    ts = np.linspace(0.0, T, N + 1)
    X = np.stack([ts**2 / 2.0, ts], -1)
    U = np.ones((N, 1))
    sys_ = DoubleIntegratorContinuous()
    cost = QuadraticFormCost(Q=jnp.eye(2), R=jnp.eye(1), integral=True)
    ocp = transcribe(
        sys_,
        finite_differences_grid(N, fd_scheme="hermite_simpson",
                                cost_integration=cost_integration),
        cost,
        bounds=Bounds.unbounded(2, 1).with_dt(dt, dt),
        x0=jnp.zeros(2),
    )
    traj = Trajectory(
        X=jnp.asarray(X),
        U=jnp.asarray(U),
        dts=jnp.full((N,), dt),
    )
    return float(ocp.objective(traj))


def test_hs_cost_integration_beats_lower_order_rules():
    # exact: ∫ (t⁴/4 + t²) dt + ∫ 1 dt over [0,2] = 8/5 + 8/3 + 2
    exact = 2.0**5 / 20.0 + 2.0**3 / 3.0 + 2.0
    errs = {
        ci: abs(_objective_on_exact_trajectory(ci, N=8) - exact)
        for ci in ("left_sum", "trapezoidal", "hermite_simpson")
    }
    # Simpson is exact for polynomials up to degree 3 in t; the t⁴ term
    # leaves a tiny residual — orders of magnitude below the other rules
    assert errs["hermite_simpson"] < 1e-3, errs
    assert errs["hermite_simpson"] < errs["trapezoidal"] / 50.0, errs
    assert errs["trapezoidal"] < errs["left_sum"], errs


def test_hs_defect_transcription_more_accurate_than_crank_nicolson():
    """Solve Van der Pol OCP at coarse N with HS vs Crank-Nicolson defects;
    compare each solution's true rollout mismatch (transcription error)."""
    from control_box_rst_tpu.ops.integrators import make_integrator

    sys_ = VanDerPolOscillator()
    x0 = jnp.array([1.0, 0.0])
    N, dt = 10, 0.3
    fine = make_integrator("rk4", 32)

    def solve(scheme):
        ocp = transcribe(
            sys_,
            finite_differences_grid(N, fd_scheme=scheme),
            QuadraticFormCost(Q=jnp.eye(2), R=0.1 * jnp.eye(1)),
            bounds=Bounds.unbounded(2, 1).with_u(-2.0, 2.0).with_dt(dt, dt),
            x0=x0,
        )
        traj0 = Trajectory.linear_interp(x0, jnp.zeros(2), N, 1, dt)
        res = sqp_solve(ocp, traj0, SQPConfig(max_iter=25))
        return res

    def rollout_gap(res):
        # integrate the true ODE under the planned controls; compare to the
        # transcribed state sequence
        X, U = np.asarray(res.traj.X), np.asarray(res.traj.U)
        x = jnp.asarray(X[0])
        gaps = []
        for k in range(N):
            x = fine.solve_ivp(sys_, x, jnp.asarray(U[k]), dt)
            gaps.append(np.abs(np.asarray(x) - X[k + 1]).max())
        return max(gaps)

    gap_cn = rollout_gap(solve("crank_nicolson"))
    gap_hs = rollout_gap(solve("hermite_simpson"))
    assert gap_hs < gap_cn / 3.0, (gap_hs, gap_cn)  # 3rd vs 2nd order


def test_hs_end_to_end_solve_converges():
    sys_ = DoubleIntegratorContinuous()
    ocp = transcribe(
        sys_,
        finite_differences_grid(20, fd_scheme="hermite_simpson",
                                cost_integration="hermite_simpson"),
        QuadraticFormCost(Q=jnp.eye(2), R=0.1 * jnp.eye(1), integral=True),
        bounds=Bounds.unbounded(2, 1).with_u(-1.0, 1.0).with_dt(0.1, 0.1),
        x0=jnp.array([1.0, 0.0]),
    )
    traj0 = Trajectory.linear_interp(jnp.array([1.0, 0.0]), jnp.zeros(2), 20, 1, 0.1)
    res = jax.jit(lambda t: sqp_solve(ocp, t, SQPConfig(max_iter=20)))(traj0)
    # HS couples adjacent stages strongly through the Hermite midpoint; the
    # block-diagonal Hessian (cross terms dropped, see cost_hessian_blocks)
    # converges linearly in stationarity — assert solution quality, not the
    # tight KKT flag: dynamics feasible to machine precision, bounds held
    assert float(res.feas_res) < 1e-8, res.feas_res
    assert float(res.stat_res) < 2e-3, res.stat_res
    assert np.abs(np.asarray(res.traj.U)).max() <= 1.0 + 1e-6
    # matches the trapezoidal solution of the same problem to grid accuracy
    ocp_tr = transcribe(
        sys_,
        finite_differences_grid(20, fd_scheme="crank_nicolson",
                                cost_integration="trapezoidal"),
        QuadraticFormCost(Q=jnp.eye(2), R=0.1 * jnp.eye(1), integral=True),
        bounds=Bounds.unbounded(2, 1).with_u(-1.0, 1.0).with_dt(0.1, 0.1),
        x0=jnp.array([1.0, 0.0]),
    )
    res_tr = jax.jit(lambda t: sqp_solve(ocp_tr, t, SQPConfig(max_iter=20)))(traj0)
    assert np.abs(np.asarray(res.traj.X) - np.asarray(res_tr.traj.X)).max() < 5e-2


def test_hs_linear_control_defect_order():
    """Linear-control HS (ref: QuadratureHermiteSimpsonLinearControl,
    quadrature.h:622): for a LINEARLY varying control the _lc defect is
    exact on polynomial trajectories where the constant-u variant is not.
    System xdot = u with u(t) = t: x(t) = t²/2."""
    from control_box_rst_tpu.ops.collocation import (
        hermite_simpson_defect,
        hermite_simpson_lc_defect,
    )
    from control_box_rst_tpu.models.base import FunctionalDynamics

    f = FunctionalDynamics(nx=1, nu=1, fn=lambda x, u: u)
    dt = 0.4
    x1 = jnp.array([0.0])
    x2 = jnp.array([dt**2 / 2.0])
    u1 = jnp.array([0.0])
    u2 = jnp.array([dt])
    d_lc = hermite_simpson_lc_defect(f, x1, u1, x2, u2, dt)
    d_const = hermite_simpson_defect(f, x1, u1, x2, dt)
    assert abs(float(d_lc[0])) < 1e-12
    assert abs(float(d_const[0])) > 1e-3  # constant-u misses the ramp


def test_hs_linear_control_grid_solves():
    """fd_scheme='hermite_simpson_lc' + cost_integration='hermite_simpson_lc'
    transcribes and solves; solution tracks the fine-grid oracle better than
    the same-N constant-control variant on a control-varying problem."""
    sys_ = VanDerPolOscillator()
    x0 = jnp.array([1.0, 0.5])

    def solve(scheme, ci, N):
        ocp = transcribe(
            sys_,
            finite_differences_grid(N, fd_scheme=scheme, cost_integration=ci),
            QuadraticFormCost(Q=jnp.eye(2), R=0.1 * jnp.eye(1), integral=True),
            bounds=Bounds.unbounded(2, 1).with_u(-2.0, 2.0),
            x0=x0,
        )
        traj0 = Trajectory.linear_interp(x0, jnp.zeros(2), N, 1, 1.0 / N * 4.0)
        return jax.jit(lambda t: sqp_solve(ocp, t, SQPConfig(max_iter=25)))(traj0)

    r_lc = solve("hermite_simpson_lc", "hermite_simpson_lc", 16)
    r_hs = solve("hermite_simpson", "hermite_simpson", 16)
    r_fine = solve("hermite_simpson_lc", "hermite_simpson_lc", 64)
    assert int(r_lc.status) == 1
    # objectives of both coarse variants near the fine-grid oracle; _lc at
    # least as close (linear control interpolation is strictly more accurate
    # for this smooth problem)
    e_lc = abs(float(r_lc.objective) - float(r_fine.objective))
    e_hs = abs(float(r_hs.objective) - float(r_fine.objective))
    assert e_lc <= e_hs * 1.5
    assert e_lc < 0.05 * abs(float(r_fine.objective))
