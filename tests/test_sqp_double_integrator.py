"""End-to-end SQP tests on the double integrator (BASELINE config 1 anchor).

Oracle strategy follows the reference's test design (SURVEY.md §4): the
structured solver is cross-validated against an independent dense oracle
(numpy KKT solve) and scipy SLSQP for the constrained cases.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from control_box_rst_tpu.models import DoubleIntegratorContinuous
from control_box_rst_tpu.ocp import (
    Bounds,
    QuadraticFinalStateCost,
    QuadraticFormCost,
    CompositeCost,
    Trajectory,
    finite_differences_grid,
    multiple_shooting_grid,
    transcribe,
)
from control_box_rst_tpu.solvers import SQPConfig, QPConfig, sqp_solve


def _make_ocp(N=20, dt=0.1, u_max=None, scheme="forward"):
    sys_ = DoubleIntegratorContinuous()
    grid = finite_differences_grid(N, fd_scheme=scheme)
    Q = jnp.diag(jnp.array([1.0, 0.5]))
    R = jnp.diag(jnp.array([0.1]))
    Qf = jnp.diag(jnp.array([5.0, 5.0]))
    cost = CompositeCost(
        costs=(QuadraticFormCost(Q=Q, R=R), QuadraticFinalStateCost(Qf=Qf))
    )
    bounds = Bounds.unbounded(2, 1)
    if u_max is not None:
        bounds = bounds.with_u(-u_max, u_max)
    x0 = jnp.array([1.0, 0.0])
    ocp = transcribe(sys_, grid, cost, bounds=bounds, x0=x0)
    traj0 = Trajectory.linear_interp(x0, jnp.zeros(2), N, 1, dt)
    return ocp, traj0, (np.asarray(Q), np.asarray(R), np.asarray(Qf))


def _dense_oracle_unconstrained(N, dt, Q, R, Qf, x0):
    """Solve the same equality-constrained QP densely with numpy.

    Variables v = [x_0..x_N (2 each), u_0..u_{N-1}]. Defect (forward scheme):
    f(x_k,u_k) - (x_{k+1}-x_k)/dt = 0, f = [x2; u].
    """
    nx, nu = 2, 1
    n = (N + 1) * nx + N * nu

    def xi(k):
        return slice(k * nx, (k + 1) * nx)

    def ui(k):
        return slice((N + 1) * nx + k * nu, (N + 1) * nx + (k + 1) * nu)

    H = np.zeros((n, n))
    g = np.zeros(n)
    for k in range(N):
        H[xi(k), xi(k)] += 2 * Q
        H[ui(k), ui(k)] += 2 * R
    H[xi(N), xi(N)] += 2 * Qf
    A_sys = np.array([[0.0, 1.0], [0.0, 0.0]])
    B_sys = np.array([[0.0], [1.0]])
    m = N * nx + nx
    A = np.zeros((m, n))
    b = np.zeros(m)
    for k in range(N):
        r = slice(k * nx, (k + 1) * nx)
        A[r, xi(k)] = A_sys + np.eye(nx) / dt
        A[r, xi(k + 1)] = -np.eye(nx) / dt
        A[r, ui(k)] = B_sys
    A[N * nx :, xi(0)] = np.eye(nx)
    b[N * nx :] = x0
    KKT = np.block([[H, A.T], [A, np.zeros((m, m))]])
    sol = np.linalg.solve(KKT, np.concatenate([-g, b]))
    X = sol[: (N + 1) * nx].reshape(N + 1, nx)
    U = sol[(N + 1) * nx : n].reshape(N, nu)
    return X, U


def test_unconstrained_matches_dense_kkt():
    N, dt = 20, 0.1
    ocp, traj0, (Q, R, Qf) = _make_ocp(N, dt, scheme="forward")
    cfg = SQPConfig(max_iter=10, qp=QPConfig(max_iter=2000, tol=1e-12))
    res = sqp_solve(ocp, traj0, cfg)
    Xd, Ud = _dense_oracle_unconstrained(N, dt, Q, R, Qf, np.array([1.0, 0.0]))
    np.testing.assert_allclose(np.asarray(res.traj.X), Xd, atol=2e-6)
    np.testing.assert_allclose(np.asarray(res.traj.U), Ud, atol=2e-6)
    assert int(res.status) == 1  # CONVERGED


def test_defects_vanish_at_solution():
    ocp, traj0, _ = _make_ocp(20, 0.1, scheme="crank_nicolson")
    res = sqp_solve(ocp, traj0, SQPConfig(max_iter=15))
    d = ocp.defects(res.traj)
    assert float(jnp.max(jnp.abs(d))) < 1e-6


def test_box_constrained_matches_slsqp():
    """Input-bounded problem vs scipy SLSQP oracle (small N)."""
    from scipy.optimize import minimize

    N, dt, umax = 10, 0.2, 0.6
    ocp, traj0, (Q, R, Qf) = _make_ocp(N, dt, u_max=umax, scheme="forward")
    cfg = SQPConfig(max_iter=25, qp=QPConfig(max_iter=4000, tol=1e-12))
    res = sqp_solve(ocp, traj0, cfg)

    x0 = np.array([1.0, 0.0])
    nx, nu = 2, 1

    def unpack(v):
        X = v[: (N + 1) * nx].reshape(N + 1, nx)
        U = v[(N + 1) * nx :].reshape(N, nu)
        return X, U

    def obj(v):
        X, U = unpack(v)
        c = sum(X[k] @ Q @ X[k] + U[k] @ R @ U[k] for k in range(N))
        return c + X[N] @ Qf @ X[N]

    def eqcon(v):
        X, U = unpack(v)
        cons = [X[0] - x0]
        for k in range(N):
            f = np.array([X[k][1], U[k][0]])
            cons.append(f - (X[k + 1] - X[k]) / dt)
        return np.concatenate(cons)

    v0 = np.zeros((N + 1) * nx + N * nu)
    v0[: (N + 1) * nx] = np.linspace(x0, np.zeros(2), N + 1).ravel()
    bounds = [(None, None)] * ((N + 1) * nx) + [(-umax, umax)] * (N * nu)
    out = minimize(
        obj, v0, constraints=[{"type": "eq", "fun": eqcon}], bounds=bounds,
        method="SLSQP", options={"maxiter": 500, "ftol": 1e-12},
    )
    assert out.success
    Xs, Us = unpack(out.x)
    np.testing.assert_allclose(np.asarray(res.traj.U), Us, atol=5e-5)
    np.testing.assert_allclose(np.asarray(res.traj.X), Xs, atol=5e-5)
    # bounds respected
    assert float(jnp.max(jnp.abs(res.traj.U))) <= umax + 1e-7


def test_sqp_jit_and_vmap_batch():
    """The batched-solve axis: vmap over initial states, jitted."""
    N, dt = 20, 0.1
    ocp, traj0, _ = _make_ocp(N, dt, u_max=1.0)
    cfg = SQPConfig(max_iter=10)

    @jax.jit
    def solve_from(x0):
        o = ocp.replace(bc=ocp.bc.replace(x0=x0))
        t0 = Trajectory.linear_interp(x0, jnp.zeros(2), N, 1, dt)
        return sqp_solve(o, t0, cfg)

    x0s = jnp.stack([jnp.array([1.0, 0.0]), jnp.array([-0.5, 0.3]), jnp.array([0.2, -0.8])])
    batched = jax.vmap(solve_from)(x0s)
    assert batched.traj.U.shape == (3, N, 1)
    single = solve_from(x0s[1])
    np.testing.assert_allclose(
        np.asarray(batched.traj.U[1]), np.asarray(single.traj.U), atol=1e-8
    )


def test_multiple_shooting_grid_matches_fd_limit():
    """MS with rk4 on the double integrator: dynamics are linear, so MS and
    the exact discrete solution agree; defects vanish and the controller
    output is close to the FD solution for small dt."""
    N, dt = 20, 0.05
    sys_ = DoubleIntegratorContinuous()
    grid = multiple_shooting_grid(N, integrator="rk4")
    cost = CompositeCost(
        costs=(
            QuadraticFormCost(Q=jnp.eye(2), R=0.1 * jnp.eye(1)),
            QuadraticFinalStateCost(Qf=5.0 * jnp.eye(2)),
        )
    )
    x0 = jnp.array([1.0, 0.0])
    ocp = transcribe(sys_, grid, cost, x0=x0)
    traj0 = Trajectory.linear_interp(x0, jnp.zeros(2), N, 1, dt)
    res = sqp_solve(ocp, traj0, SQPConfig(max_iter=15))
    assert int(res.status) == 1
    d = ocp.defects(res.traj)
    assert float(jnp.max(jnp.abs(d))) < 1e-7
