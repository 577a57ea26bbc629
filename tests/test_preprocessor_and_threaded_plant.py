"""StagePreprocessor + SimulatedPlantThreaded.

Ref parity tested:
  - StagePreprocessor hook (ref: functions/stage_preprocessor.h:41) —
    shared per-stage quantities consumed by both a cost and a constraint.
  - SimulatedPlantThreaded (ref: simulated_plant_threaded.h:52) — plant
    simulation in its own thread at a fixed rate with a guarded control
    buffer, driven through the realtime executor's callback API.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from control_box_rst_tpu.models import DoubleIntegratorContinuous
from control_box_rst_tpu.ocp import (
    Bounds,
    PreprocessedStageConstraint,
    PreprocessedStageCost,
    QuadraticFormCost,
    StagePreprocessor,
    finite_differences_grid,
    transcribe,
)
from control_box_rst_tpu.sim import SimulatedPlant, SimulatedPlantThreaded
from control_box_rst_tpu.solvers import SQPConfig, sqp_solve
from control_box_rst_tpu.ocp.problem import Trajectory


def test_preprocessed_cost_and_constraint_share_quantity():
    # shared quantity: squared speed q = x1^2 (think: kinetic energy)
    pre = StagePreprocessor(fn=lambda x, u, dt: x[1] ** 2)
    cost = PreprocessedStageCost(
        pre=pre, term=lambda q, x, u, dt, xref, uref: 0.5 * q
    )
    con = PreprocessedStageConstraint(
        pre=pre, nineq=1, ineq_term=lambda q, x, u, dt: jnp.array([q - 0.25])
    )
    x = jnp.array([0.3, 0.8])
    u = jnp.array([0.1])
    assert np.isclose(cost.stage(x, u, 0.1, x, u), 0.5 * 0.64)
    assert np.isclose(con.ineq(x, u, 0.1, x, u)[0], 0.64 - 0.25)


def test_preprocessed_constraint_enforced_in_solve():
    """Velocity-squared bound via preprocessor: |x1|^2 ≤ 0.09 → |x1| ≤ 0.3."""
    sys_ = DoubleIntegratorContinuous()
    pre = StagePreprocessor(fn=lambda x, u, dt: x[1] ** 2)
    con = PreprocessedStageConstraint(
        pre=pre, nineq=1, ineq_term=lambda q, x, u, dt: jnp.array([q - 0.09])
    )
    ocp = transcribe(
        sys_,
        finite_differences_grid(20, fd_scheme="crank_nicolson"),
        QuadraticFormCost(Q=jnp.eye(2), R=0.1 * jnp.eye(1)),
        bounds=Bounds.unbounded(2, 1).with_u(-1.0, 1.0).with_dt(0.1, 0.1),
        x0=jnp.array([1.0, 0.0]),
        stage_con=con,
    )
    traj0 = Trajectory.linear_interp(jnp.array([1.0, 0.0]), jnp.zeros(2), 20, 1, 0.1)
    res = jax.jit(lambda t: sqp_solve(ocp, t, SQPConfig(max_iter=15)))(traj0)
    v = np.asarray(res.traj.X[:, 1])
    assert np.all(np.abs(v) <= 0.3 + 5e-3), v  # constraint active & respected
    # sanity: without the constraint the unconstrained solution exceeds it
    ocp_free = transcribe(
        sys_,
        finite_differences_grid(20, fd_scheme="crank_nicolson"),
        QuadraticFormCost(Q=jnp.eye(2), R=0.1 * jnp.eye(1)),
        bounds=Bounds.unbounded(2, 1).with_u(-1.0, 1.0).with_dt(0.1, 0.1),
        x0=jnp.array([1.0, 0.0]),
    )
    res_free = jax.jit(lambda t: sqp_solve(ocp_free, t, SQPConfig(max_iter=15)))(traj0)
    assert np.abs(np.asarray(res_free.traj.X[:, 1])).max() > 0.3


def test_threaded_plant_free_response_matches_direct_integration():
    """Run the plant thread with u=0; the double integrator with x0=[0,1]
    drifts x0(t) = t. Compare against the plant's own integrator."""
    plant = SimulatedPlant(system=DoubleIntegratorContinuous())
    th = SimulatedPlantThreaded(plant, x0=np.array([0.0, 1.0]), sim_dt=0.005)
    with th:
        time.sleep(0.5)
        y = th.read_output()
    # position grew ≈ elapsed sim time * velocity 1 (rate-synced ≈ wall
    # clock, minus ~0.1-0.2s thread startup)
    assert y.shape == (2,)
    assert 0.05 < y[0] < 0.8, y
    assert np.isclose(y[1], 1.0, atol=1e-6)  # velocity untouched (u=0)


def test_threaded_plant_control_and_deadtime():
    plant = SimulatedPlant(system=DoubleIntegratorContinuous())
    th = SimulatedPlantThreaded(
        plant, x0=np.zeros(2), sim_dt=0.005, dead_time=0.1
    )
    with th:
        th.write_control(np.array([1.0]))
        time.sleep(0.05)
        v_early = th.state()[1]  # dead time not elapsed → still coasting
        time.sleep(0.3)
        v_late = th.state()[1]
    assert abs(v_early) < 0.02, v_early
    assert v_late > 0.1, v_late  # control applied after dead time
    # set_state API (ref: PlantInterface::setState)
    th.set_state(np.array([5.0, 0.0]))
    assert th.state()[0] == 5.0


def test_threaded_plant_with_realtime_executor():
    """Close the loop: realtime executor drives the threaded plant through
    its callback API (the reference's ClosedLoopControlTask +
    SimulatedPlantThreaded pairing)."""
    from control_box_rst_tpu.control import LqrController
    from control_box_rst_tpu.sim.realtime import run_realtime_closed_loop

    sys_ = DoubleIntegratorContinuous()
    ctrl = LqrController.from_system(
        sys_, Q=jnp.eye(2), R=jnp.eye(1), xref=jnp.zeros(2)
    )
    plant = SimulatedPlant(system=sys_)
    th = SimulatedPlantThreaded(plant, x0=np.array([0.5, 0.0]), sim_dt=0.004)
    with th:
        stats = run_realtime_closed_loop(
            ctrl,
            read_output=th.read_output,
            write_control=th.write_control,
            x0=np.array([0.5, 0.0]),
            dt=0.02,
            duration_s=1.2,
        )
        x_final = th.state()
    assert stats["steps"] == 60
    # LQR regulates toward the origin despite the async plant
    assert abs(x_final[0]) < 0.4, x_final
