"""Block cyclic reduction solver (ops/btridiag_cr.py).

Validated against dense solves and against the scan-ordering Cholesky, at
every size class including the padding edge cases, and end-to-end inside the
ADMM QP (linsolver='bcr' vs 'scan' must agree).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from control_box_rst_tpu.ops.btridiag import btridiag_cholesky, btridiag_solve
from control_box_rst_tpu.ops.btridiag_cr import bcr_factor, bcr_solve


def _random_spd_btd(K, nz, seed=0):
    rng = np.random.default_rng(seed)
    D = np.stack(
        [np.eye(nz) * (4 + i % 3) + 0.2 * rng.standard_normal((nz, nz))
         for i in range(K)]
    )
    D = 0.5 * (D + D.transpose(0, 2, 1))
    O = 0.3 * rng.standard_normal((max(K - 1, 0), nz, nz))
    b = rng.standard_normal((K, nz))
    return jnp.asarray(D), jnp.asarray(O), jnp.asarray(b)


def _dense(D, O):
    D, O = np.asarray(D), np.asarray(O)
    K, nz, _ = D.shape
    M = np.zeros((K * nz, K * nz))
    for k in range(K):
        M[k * nz:(k + 1) * nz, k * nz:(k + 1) * nz] = D[k]
        if k < K - 1:
            M[k * nz:(k + 1) * nz, (k + 1) * nz:(k + 2) * nz] = O[k]
            M[(k + 1) * nz:(k + 2) * nz, k * nz:(k + 1) * nz] = O[k].T
    return M


@pytest.mark.parametrize("K,nz", [(1, 3), (2, 3), (3, 1), (4, 2), (5, 4),
                                  (7, 2), (51, 4), (64, 5), (65, 4)])
def test_bcr_matches_dense(K, nz):
    D, O, b = _random_spd_btd(K, nz, seed=K)
    x_ref = np.linalg.solve(_dense(D, O), np.asarray(b).ravel()).reshape(K, nz)
    x = np.asarray(bcr_solve(bcr_factor(D, O), b))
    np.testing.assert_allclose(x, x_ref, rtol=1e-10, atol=1e-12)


def test_bcr_matches_scan_cholesky_batched():
    """vmap over a batch of systems: both solvers agree lane-wise."""
    B, K, nz = 16, 51, 4
    Ds, Os, bs = [], [], []
    for i in range(B):
        D, O, b = _random_spd_btd(K, nz, seed=100 + i)
        Ds.append(D); Os.append(O); bs.append(b)
    D, O, b = jnp.stack(Ds), jnp.stack(Os), jnp.stack(bs)

    def scan_solve(D, O, b):
        Ld, Lo = btridiag_cholesky(D, O)
        return btridiag_solve(Ld, Lo, b)

    x_scan = jax.jit(jax.vmap(scan_solve))(D, O, b)
    x_bcr = jax.jit(jax.vmap(lambda D, O, b: bcr_solve(bcr_factor(D, O), b)))(
        D, O, b
    )
    np.testing.assert_allclose(
        np.asarray(x_bcr), np.asarray(x_scan), rtol=1e-9, atol=1e-11
    )


def test_admm_linsolver_bcr_matches_scan():
    """Full SQP solve with linsolver='bcr' vs 'scan' on BASELINE config 1."""
    from control_box_rst_tpu.models import DoubleIntegratorContinuous
    from control_box_rst_tpu.ocp import (
        Bounds, QuadraticFormCost, finite_differences_grid, transcribe,
    )
    from control_box_rst_tpu.ocp.problem import Trajectory
    from control_box_rst_tpu.solvers import QPConfig, SQPConfig, sqp_solve

    sys_ = DoubleIntegratorContinuous()
    ocp = transcribe(
        sys_,
        finite_differences_grid(30, fd_scheme="crank_nicolson"),
        QuadraticFormCost(Q=jnp.eye(2), R=0.1 * jnp.eye(1)),
        bounds=Bounds.unbounded(2, 1).with_u(-1.0, 1.0).with_dt(0.1, 0.1),
        x0=jnp.array([1.0, 0.0]),
    )
    traj0 = Trajectory.linear_interp(jnp.array([1.0, 0.0]), jnp.zeros(2), 30, 1, 0.1)
    res = {}
    for lin in ("scan", "bcr"):
        cfg = SQPConfig(max_iter=10, qp=QPConfig(linsolver=lin))
        res[lin] = jax.jit(lambda t: sqp_solve(ocp, t, cfg))(traj0)
        assert int(res[lin].status) == 1
    np.testing.assert_allclose(
        np.asarray(res["bcr"].traj.U), np.asarray(res["scan"].traj.U),
        atol=1e-6,
    )
