"""Grid adaptation tests (ref: finite_differences_variable_grid.cpp:66-180,
non_uniform_finite_differences_variable_grid.cpp:259)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from control_box_rst_tpu.control import PredictiveController
from control_box_rst_tpu.models import DoubleIntegratorContinuous
from control_box_rst_tpu.ocp import (
    Bounds,
    MinimumTime,
    Trajectory,
    finite_differences_variable_grid,
    transcribe,
)
from control_box_rst_tpu.ocp.adaptation import (
    RedundantControls,
    SimpleShrinkingHorizon,
    TimeBasedAggressiveEstimate,
    TimeBasedSingleStep,
    resample_W,
    stage_mask_from_n,
)
from control_box_rst_tpu.sim import SimulatedPlant, run_closed_loop
from control_box_rst_tpu.solvers import QPConfig, SQPConfig


def _make_W(N=10, nx=2, nu=1, dt=0.1):
    X = jnp.linspace(0.0, 1.0, N + 1)[:, None] * jnp.ones((N + 1, nx))
    U = jnp.linspace(-1.0, 1.0, N)[:, None] * jnp.ones((N, nu))
    dts = jnp.full((N,), dt)
    traj = Trajectory(X=X, U=U, dts=dts)
    W = jnp.concatenate(
        [X, jnp.concatenate([U, jnp.zeros((1, nu))]),
         jnp.concatenate([dts, jnp.zeros((1,))])[:, None]], axis=-1
    )
    return W


def test_resample_identity():
    N = 10
    W = _make_W(N)
    W2 = resample_W(W, 2, 1, jnp.asarray(N), jnp.asarray(N), N)
    np.testing.assert_allclose(np.asarray(W2[:, :2]), np.asarray(W[:, :2]), atol=1e-12)
    np.testing.assert_allclose(np.asarray(W2[:-1, 3]), np.asarray(W[:-1, 3]), atol=1e-12)


def test_resample_halve():
    N = 10
    W = _make_W(N, dt=0.1)
    n_new = jnp.asarray(5)
    W2 = resample_W(W, 2, 1, jnp.asarray(N), n_new, N)
    dts = np.asarray(W2[:-1, 3])
    # active intervals get T/n = 1.0/5 = 0.2, tail zero
    np.testing.assert_allclose(dts[:5], 0.2, atol=1e-9)
    np.testing.assert_allclose(dts[5:], 0.0, atol=1e-12)
    # endpoint states preserved; tail holds the final state
    np.testing.assert_allclose(np.asarray(W2[0, :2]), np.asarray(W[0, :2]))
    np.testing.assert_allclose(np.asarray(W2[5, :2]), np.asarray(W[-1, :2]), atol=1e-9)
    np.testing.assert_allclose(np.asarray(W2[-1, :2]), np.asarray(W[-1, :2]), atol=1e-9)


def test_time_based_single_step():
    N = 10
    W = _make_W(N, dt=0.2)  # dt above band
    ad = TimeBasedSingleStep(dt_ref=0.1, dt_hyst_ratio=0.1, n_min=3, n_max=N)
    W2, n2 = ad.adapt(W, jnp.asarray(8), 2, 1, N)
    assert int(n2) == 9
    W = _make_W(N, dt=0.05)  # below band
    W3, n3 = ad.adapt(W, jnp.asarray(8), 2, 1, N)
    assert int(n3) == 7
    W = _make_W(N, dt=0.1)  # inside band
    W4, n4 = ad.adapt(W, jnp.asarray(8), 2, 1, N)
    assert int(n4) == 8


def test_aggressive_estimate():
    N = 20
    W = _make_W(N, dt=0.2)
    ad = TimeBasedAggressiveEstimate(dt_ref=0.1, n_min=3, n_max=N)
    W2, n2 = ad.adapt(W, jnp.asarray(10), 2, 1, N)
    assert int(n2) == 20  # 10 * 0.2/0.1


def test_shrinking_horizon():
    N = 10
    W = _make_W(N)
    ad = SimpleShrinkingHorizon(n_min=4)
    n = jnp.asarray(6)
    for expect in (5, 4, 4):
        W, n = ad.adapt(W, n, 2, 1, N)
        assert int(n) == expect


def test_redundant_controls_merge_and_split():
    N = 10
    # constant controls → many redundant → merge
    W = _make_W(N)
    W = W.at[:-1, 2].set(0.5)  # all controls equal
    ad = RedundantControls(epsilon=0.1, backup=1, n_min=3, n_max=N)
    W2, n2 = ad.adapt(W, jnp.asarray(8), 2, 1, N)
    assert int(n2) == 7
    # total time preserved by merge
    assert float(jnp.sum(W2[:7, 3])) == pytest.approx(0.8, abs=1e-9)

    # wildly different controls → no redundant → split largest interval
    W = _make_W(N)
    W = W.at[:-1, 2].set(jnp.linspace(-1, 1, N) * 5)
    W = W.at[3, 3].set(0.4)  # largest dt at k=3
    W3, n3 = ad.adapt(W, jnp.asarray(8), 2, 1, N)
    assert int(n3) == 9
    dts = np.asarray(W3[:-1, 3])
    assert dts[3] == pytest.approx(0.2) and dts[4] == pytest.approx(0.2)
    # total active time preserved
    assert float(np.sum(dts[:9])) == pytest.approx(0.7 + 0.4, abs=1e-9)


def test_closed_loop_time_optimal_with_adaptation():
    """Time-optimal MPC with TimeBasedSingleStep adaptation: as the goal
    nears, dt shrinks and the horizon count adapts downward."""
    N = 25
    sys_ = DoubleIntegratorContinuous()
    grid = finite_differences_variable_grid(N, fd_scheme="crank_nicolson")
    bounds = Bounds.unbounded(2, 1).with_u(-1.0, 1.0).with_dt(1e-3, 0.5)
    ocp = transcribe(
        sys_, grid, MinimumTime(), bounds=bounds,
        x0=jnp.zeros(2), xf=jnp.zeros(2), xf_fixed=jnp.array([1.0, 1.0]),
    )
    ctrl = PredictiveController(
        nx=2, nu=1, ocp=ocp, dt=0.1,
        cfg=SQPConfig(max_iter=20, qp=QPConfig(max_iter=500, tol=1e-10),
                      tol_stat=1e-4, tol_feas=1e-6),
        adaptation=TimeBasedSingleStep(dt_ref=0.1, dt_hyst_ratio=0.2,
                                       n_min=5, n_max=N),
        warm_start_shift=False,
    )
    plant = SimulatedPlant(system=sys_)
    res = jax.jit(
        lambda x: run_closed_loop(plant, ctrl, x, T_steps=30, dt=0.1,
                                  apply_sequence_substeps=8)
    )(jnp.array([1.0, 0.0]))
    ns = np.asarray(res.info["n_active"])
    # solves stay reasonably feasible throughout (transient spikes while the
    # grid is being restructured near the goal are expected for shrinking
    # time-optimal MPC; the closed loop is what matters)
    assert float(jnp.median(res.info["feas_res"])) < 1e-5
    # horizon adapted down as remaining time shrinks
    assert ns[-1] < ns[0]
    # the plant reached the goal (time-optimal MPC chatters once AT the
    # goal — terminal stabilization is DualModeController's job, like the
    # reference's local-controller switch)
    dist = np.linalg.norm(np.asarray(res.x_true), axis=-1)
    assert dist.min() < 0.1
    # and it got there no slower than ~T* = 2s (+1s slack for replanning)
    assert float(res.ts[int(dist.argmin())]) < 3.0


def test_grow_on_infeasibility_unit():
    """GrowOnInfeasibility grows only on a reported violation and copies the
    last active interval's u/dt into the newly activated one."""
    from control_box_rst_tpu.ocp.adaptation import GrowOnInfeasibility

    N = 10
    W = _make_W(N)
    ad = GrowOnInfeasibility(feas_tol=1e-3, n_max=N)
    # feasible → no growth
    W2, n2 = ad.adapt(W, jnp.asarray(5), 2, 1, N, feas=jnp.asarray(1e-6))
    assert int(n2) == 5
    np.testing.assert_allclose(np.asarray(W2), np.asarray(W))
    # infeasible → +1, new interval inherits u/dt of the last active one
    W3, n3 = ad.adapt(W, jnp.asarray(5), 2, 1, N, feas=jnp.asarray(1.0))
    assert int(n3) == 6
    np.testing.assert_allclose(float(W3[5, 2]), float(W[4, 2]))
    np.testing.assert_allclose(float(W3[5, 3]), float(W[4, 3]))
    # saturates at n_max
    _, n4 = ad.adapt(W, jnp.asarray(N), 2, 1, N, feas=jnp.asarray(1.0))
    assert int(n4) == N
    # no feas signal → inert
    _, n5 = ad.adapt(W, jnp.asarray(5), 2, 1, N)
    assert int(n5) == 5


def test_grow_horizon_until_feasible():
    """An infeasibly short horizon grows step by step until the terminal
    equality constraint becomes reachable (ref `_increase_n_if_infeas`,
    structured_optimal_control_problem.cpp:135-140).

    Double integrator, |u| <= 1, dt = 0.1 fixed, rest-to-rest transfer over
    a distance of 2: minimum time T* = 2*sqrt(2) ~ 2.83 s, so at least 29
    intervals are needed; the controller starts with 10."""
    from control_box_rst_tpu.ocp import GrowOnInfeasibility

    N = 40
    sys_ = DoubleIntegratorContinuous()
    from control_box_rst_tpu.ocp import QuadraticFormCost, finite_differences_grid

    grid = finite_differences_grid(N, fd_scheme="crank_nicolson")
    bounds = Bounds.unbounded(2, 1).with_u(-1.0, 1.0).with_dt(0.1, 0.1)
    ocp = transcribe(
        sys_, grid, QuadraticFormCost(Q=jnp.eye(2), R=0.1 * jnp.eye(1)),
        bounds=bounds,
        x0=jnp.array([2.0, 0.0]), xf=jnp.zeros(2),
        xf_fixed=jnp.array([1.0, 1.0]),
    )
    ctrl = PredictiveController(
        nx=2, nu=1, ocp=ocp, dt=0.1,
        cfg=SQPConfig(max_iter=12, qp=QPConfig(max_iter=300, tol=1e-10),
                      tol_stat=1e-5, tol_feas=1e-7),
        adaptation=GrowOnInfeasibility(feas_tol=1e-4, n_max=N),
        n_active_init=10,
        warm_start_shift=False,
        usable_feas_tol=1e-4,
    )
    carry = ctrl.init_carry(jnp.array([2.0, 0.0]))
    step = jax.jit(lambda c: ctrl.step(c, jnp.array([2.0, 0.0]), 0.0, 0.1))
    ns, oks = [], []
    for _ in range(30):
        carry, out = step(carry)
        ns.append(int(out.info["n_active"]))
        oks.append(bool(out.ok))
    # started infeasible and short
    assert ns[0] == 10 and not oks[0]
    # grew monotonically (one interval per infeasible solve)
    assert all(b - a in (0, 1) for a, b in zip(ns, ns[1:]))
    # ended feasible at a horizon long enough for the min-time bound
    assert oks[-1]
    assert 29 <= ns[-1] <= 34
    # growth stopped once feasible
    assert ns[-1] == ns[-3]


# ---------------------------------------------------------------------------
# Round-5 warm-start shifting: unit semantics + interaction with adaptation
# ---------------------------------------------------------------------------


def test_find_nearest_state_semantics():
    """Greedy proximity walk matches the reference's findNearestState
    (full_discretization_grid_base.cpp:288-322): 0 for an unchanged start,
    the nearest index while distances decrease, stop at the first rise."""
    from control_box_rst_tpu.control import find_nearest_state

    X = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0], [3.0, 0.0],
                     [4.0, 0.0]])
    W = jnp.concatenate([X, jnp.zeros((5, 2))], axis=1)  # nz=4, nx=2
    # unchanged start -> 0
    assert int(find_nearest_state(W, jnp.asarray([0.0, 0.0]), 2)) == 0
    # x0 closest to state 2
    assert int(find_nearest_state(W, jnp.asarray([2.1, 0.0]), 2)) == 2
    # monotone approach past the end: capped at N-1 (keep >= 1 interval)
    assert int(find_nearest_state(W, jnp.asarray([9.0, 0.0]), 2)) == 3
    # masked horizon: the walk must not enter the inactive tail
    assert int(find_nearest_state(W, jnp.asarray([9.0, 0.0]), 2,
                                  n_active=jnp.asarray(2))) == 1


def test_shift_warm_start_dynamic_count():
    """k=0 is the identity; k=1 matches drop-first + linear tail
    extrapolation + held last control; k=2 extrapolates two stages along
    the last planned interval (x_N + m*(x_N - x_{N-1}))."""
    from control_box_rst_tpu.control import shift_warm_start

    N, nx, nu = 4, 2, 1
    X = jnp.arange(N + 1, dtype=jnp.float64)[:, None] * jnp.asarray([[1.0, 10.0]])
    U = 0.1 * jnp.arange(N, dtype=jnp.float64)[:, None]
    U_pad = jnp.concatenate([U, jnp.zeros((1, nu))], axis=0)
    dts = jnp.concatenate([jnp.full((N,), 0.1), jnp.zeros((1,))])[:, None]
    W = jnp.concatenate([X, U_pad, dts], axis=1)

    W0 = shift_warm_start(W, nx, 0)
    np.testing.assert_allclose(np.asarray(W0), np.asarray(W), atol=1e-15)

    W1 = shift_warm_start(W, nx, 1)
    np.testing.assert_allclose(np.asarray(W1[:-1, :nx]), np.asarray(X[1:]),
                               atol=1e-15)
    # tail state: linear continuation x_N + (x_N - x_{N-1})
    np.testing.assert_allclose(np.asarray(W1[-1, :nx]),
                               np.asarray(2 * X[-1] - X[-2]), atol=1e-15)
    # controls shift; last real interval holds the final control
    np.testing.assert_allclose(np.asarray(W1[:-2, nx]), np.asarray(U[1:, 0]),
                               atol=1e-15)
    assert float(W1[-2, nx]) == float(U[-1, 0])
    assert float(W1[-1, nx]) == 0.0  # stage-N dummies stay zero

    W2 = shift_warm_start(W, nx, 2)
    np.testing.assert_allclose(np.asarray(W2[-1, :nx]),
                               np.asarray(X[-1] + 2 * (X[-1] - X[-2])),
                               atol=1e-15)


def test_shifting_with_adaptation_closed_loop():
    """Proximity shifting ON together with a grid adaptation strategy (the
    round-5 order: adapt -> shift(n_active-capped) -> x0/xf overwrite).
    The time-optimal loop must still reach the goal."""
    from control_box_rst_tpu.control import PredictiveController
    from control_box_rst_tpu.models import DoubleIntegratorContinuous
    from control_box_rst_tpu.ocp import (
        Bounds, MinimumTime, finite_differences_variable_grid, transcribe,
    )
    from control_box_rst_tpu.sim import SimulatedPlant, run_closed_loop

    N = 25
    grid = finite_differences_variable_grid(N, fd_scheme="crank_nicolson")
    bounds = Bounds.unbounded(2, 1).with_u(-1.0, 1.0).with_dt(1e-3, 0.5)
    ocp = transcribe(
        DoubleIntegratorContinuous(), grid, MinimumTime(), bounds=bounds,
        x0=jnp.array([1.0, 0.0]), xf=jnp.zeros(2),
        xf_fixed=jnp.array([1.0, 1.0]),
    )
    ad = TimeBasedSingleStep(dt_ref=0.1, n_min=5, n_max=N)
    ctrl = PredictiveController(
        nx=2, nu=1, ocp=ocp, dt=0.1, adaptation=ad,
        cfg=SQPConfig(max_iter=40, qp=QPConfig(max_iter=800, tol=1e-10),
                      tol_stat=1e-6, tol_feas=1e-8),
    )
    plant = SimulatedPlant(system=DoubleIntegratorContinuous())
    res = jax.jit(
        lambda x: run_closed_loop(plant, ctrl, x, T_steps=30, dt=0.1)
    )(jnp.asarray([1.0, 0.0]))
    p = np.abs(np.asarray(res.x_true)[:, 0])
    assert p[16:26].min() < 0.05  # arrives (T* = 2 for d = 1)
    n_act = np.asarray(res.info["n_active"])
    assert n_act.min() >= 5 and n_act.max() <= N
