"""Levenberg-Marquardt solver tests (ref: LM dense/sparse test strategy —
cross-validated against the SQP solver the way the reference cross-validates
its problem realizations, SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from control_box_rst_tpu.models import DoubleIntegratorContinuous, VanDerPolOscillator
from control_box_rst_tpu.ocp import (
    Bounds,
    QuadraticFormCost,
    Trajectory,
    finite_differences_grid,
    transcribe,
)
from control_box_rst_tpu.solvers import (
    LMConfig,
    QPConfig,
    SQPConfig,
    lm_solve,
    sqp_solve,
)


def _lsq_ocp(u_max=None, N=15, dt=0.1):
    sys_ = DoubleIntegratorContinuous()
    grid = finite_differences_grid(N, fd_scheme="forward")
    # lsq_form quadratic cost (ref: quadratic_cost.h lsq mode)
    cost = QuadraticFormCost(
        Q=jnp.diag(jnp.array([1.0, 0.5])), R=0.1 * jnp.eye(1), lsq_form=True
    )
    bounds = Bounds.unbounded(2, 1)
    if u_max is not None:
        bounds = bounds.with_u(-u_max, u_max)
    x0 = jnp.array([1.0, 0.0])
    ocp = transcribe(sys_, grid, cost, bounds=bounds, x0=x0)
    return ocp, Trajectory.linear_interp(x0, jnp.zeros(2), N, 1, dt)


def test_lm_matches_sqp_unconstrained():
    ocp, traj0 = _lsq_ocp()
    lm = lm_solve(ocp, traj0, LMConfig(max_iter=60))
    sqp = sqp_solve(ocp, traj0, SQPConfig(max_iter=10,
                                          qp=QPConfig(max_iter=2000, tol=1e-12)))
    # defects satisfied (penalty drives them to ~1e-5 scale)
    assert float(lm.feas_res) < 1e-5
    np.testing.assert_allclose(
        np.asarray(lm.traj.U), np.asarray(sqp.traj.U), atol=1e-3
    )


def test_lm_respects_bounds_softly():
    ocp, traj0 = _lsq_ocp(u_max=0.5)
    lm = lm_solve(ocp, traj0, LMConfig(max_iter=80))
    # penalty method: small overshoot allowed
    assert float(jnp.max(jnp.abs(lm.traj.U))) < 0.5 + 1e-3
    assert float(lm.feas_res) < 1e-4


def test_lm_jit_and_vmap():
    ocp, traj0 = _lsq_ocp()
    cfg = LMConfig(max_iter=40)

    @jax.jit
    @jax.vmap
    def solve(x0):
        o = ocp.replace(bc=ocp.bc.replace(x0=x0))
        t0 = Trajectory.linear_interp(x0, jnp.zeros(2), ocp.N, 1, 0.1)
        return lm_solve(o, t0, cfg).chi2

    chis = solve(jnp.stack([jnp.array([1.0, 0.0]), jnp.array([-0.5, 0.2])]))
    assert chis.shape == (2,)
    assert bool(jnp.all(jnp.isfinite(chis)))


def test_lm_backed_predictive_controller():
    """PredictiveController(solver='lm') (ref: PredictiveController paired
    with LevenbergMarquardt*, nlp_solver_interface.h factory) drives the
    double integrator to the origin in closed loop."""
    import jax
    from control_box_rst_tpu.control import PredictiveController
    from control_box_rst_tpu.models.benchmark import DoubleIntegratorContinuous
    from control_box_rst_tpu.ocp import (
        Bounds, CompositeCost, QuadraticFinalStateCost, QuadraticFormCost,
        finite_differences_grid, transcribe,
    )
    from control_box_rst_tpu.sim import SimulatedPlant, run_closed_loop
    from control_box_rst_tpu.solvers import LMConfig

    sys_ = DoubleIntegratorContinuous()
    ocp = transcribe(
        sys_, finite_differences_grid(15),
        CompositeCost(costs=(
            QuadraticFormCost(Q=jnp.eye(2), R=0.1 * jnp.eye(1), lsq_form=True),
            QuadraticFinalStateCost(Qf=10.0 * jnp.eye(2)),
        )),
        bounds=Bounds.unbounded(2, 1).with_u(-1.0, 1.0),
        x0=jnp.zeros(2),
    )
    ctrl = PredictiveController(
        nx=2, nu=1, ocp=ocp, dt=0.1, solver="lm",
        lm_cfg=LMConfig(max_iter=30), usable_feas_tol=1e-2,
    )
    plant = SimulatedPlant(system=sys_)
    r = jax.jit(
        lambda x: run_closed_loop(plant, ctrl, x, T_steps=100, dt=0.1)
    )(jnp.array([1.0, 0.0]))
    assert float(jnp.max(jnp.abs(r.x_true[-1]))) < 1e-3
    # penalty method: bounds satisfied to penalty accuracy
    assert float(jnp.max(jnp.abs(r.u))) <= 1.0 + 1e-4
