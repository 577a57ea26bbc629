"""Uncompressed Hermite-Simpson collocation tests.

Ref: the uncompressed collocation edge variants (midpoint states as
decision vertices + explicit interpolation constraint),
structured_ocp/edges/collocation_edges.h:42-1392. Our stage layout appends
the midpoints to the stage vector (w_k = [x;u;dt;xm]) which keeps the
interval rows 2-point-coupled (TranscribedOCP.n_aux).
"""
import jax
import jax.numpy as jnp
import numpy as np

from control_box_rst_tpu.models import VanDerPolOscillator
from control_box_rst_tpu.ocp import (
    Bounds,
    CompositeCost,
    QuadraticFinalStateCost,
    QuadraticFormCost,
    Trajectory,
    finite_differences_grid,
    hermite_simpson_uncompressed_grid,
    transcribe,
)
from control_box_rst_tpu.solvers import QPConfig, SQPConfig, sqp_solve

CFG = SQPConfig(max_iter=30, qp=QPConfig(max_iter=1500, tol=1e-12),
                tol_stat=1e-7, tol_feas=1e-9)


def _cost(Q=1.0, R=0.1, Qf=5.0):
    return CompositeCost(costs=(
        QuadraticFormCost(Q=Q * jnp.eye(2), R=R * jnp.eye(1), integral=True),
        QuadraticFinalStateCost(Qf=Qf * jnp.eye(2)),
    ))


def _solve(grid, x0=(1.0, 0.5)):
    ocp = transcribe(VanDerPolOscillator(), grid, _cost(),
                     x0=jnp.asarray(x0))
    traj0 = Trajectory.linear_interp(jnp.asarray(x0), jnp.zeros(2),
                                     grid.N, 1, 0.1)
    return ocp, sqp_solve(ocp, traj0, CFG)


def test_shapes_and_aux_slots():
    grid = hermite_simpson_uncompressed_grid(8)
    ocp = transcribe(VanDerPolOscillator(), grid, _cost(),
                     x0=jnp.array([1.0, 0.5]))
    assert ocp.n_aux == 2
    assert ocp.nz == 2 + 1 + 1 + 2
    assert ocp.nc == 2 + 2  # simpson + midpoint tie
    traj = Trajectory.linear_interp(jnp.array([1.0, 0.5]), jnp.zeros(2),
                                    8, 1, 0.1)
    W = ocp.pack(traj)
    assert W.shape == (9, 6)
    # pack initializes midpoints by interpolation
    np.testing.assert_allclose(
        np.asarray(W[0, 4:]), np.asarray(0.5 * (W[0, :2] + W[1, :2])),
        atol=1e-12,
    )


def test_uncompressed_matches_compressed_solution():
    """At a KKT point the midpoint tie pins xm to the Hermite interpolant,
    so the uncompressed NLP is the compressed one after elimination — the
    solutions must coincide to solver tolerance (this is exactly the
    compressed/uncompressed equivalence the reference exploits)."""
    N = 15
    _, res_c = _solve(finite_differences_grid(
        N, fd_scheme="hermite_simpson", cost_integration="hermite_simpson"))
    ocp_u, res_u = _solve(hermite_simpson_uncompressed_grid(N))
    assert int(res_c.status) == 1 and int(res_u.status) == 1
    np.testing.assert_allclose(
        np.asarray(res_u.traj.U), np.asarray(res_c.traj.U), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(res_u.traj.X), np.asarray(res_c.traj.X), atol=5e-5
    )
    # the converged midpoints satisfy the Hermite interpolation identity
    W = res_u.W
    f = VanDerPolOscillator()
    for k in range(N):
        x, x1 = W[k, :2], W[k + 1, :2]
        u, dt = W[k, 2:3], W[k, 3]
        xm = W[k, 4:]
        xm_ref = 0.5 * (x + x1) + (dt / 8.0) * (f(x, u) - f(x1, u))
        np.testing.assert_allclose(np.asarray(xm), np.asarray(xm_ref),
                                   atol=1e-7)


def test_midpoint_states_respect_bounds():
    """The uncompressed form's raison d'être: midpoint states are real
    decision variables, so state box bounds apply BETWEEN grid points too
    (the compressed form can cut corners there)."""
    N = 15
    grid = hermite_simpson_uncompressed_grid(N)
    bounds = Bounds.unbounded(2, 1).with_x(
        jnp.array([-0.8, -jnp.inf]), jnp.array([2.0, jnp.inf])
    )
    ocp = transcribe(VanDerPolOscillator(), grid, _cost(),
                     bounds=bounds, x0=jnp.array([1.0, 0.5]))
    traj0 = Trajectory.linear_interp(jnp.array([1.0, 0.5]), jnp.zeros(2),
                                     N, 1, 0.1)
    res = sqp_solve(ocp, traj0, CFG)
    assert int(res.status) == 1
    Xm = np.asarray(res.W[:-1, 4:])
    assert Xm[:, 0].min() >= -0.8 - 1e-6
    assert np.asarray(res.traj.X)[:, 0].min() >= -0.8 - 1e-6
