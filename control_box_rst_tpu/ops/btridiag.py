"""Block-tridiagonal symmetric positive-definite factor/solve.

This is the TPU-native replacement for the reference's sparse normal-equation
factorizations: `H = JᵀJ` + `SimplicialLLT`/CHOLMOD inside Levenberg-Marquardt
(ref: src/optimization/src/solver/levenberg_marquardt_sparse.cpp:98-150) and
OSQP's internal QDLDL KKT factorization (ref: qp_solver_osqp.cpp:107). Direct
transcription makes every KKT-like system block-tridiagonal with tiny blocks
(nz = nx+nu+1 ≈ 4-12); the CSC machinery of the reference disappears — the
matrix IS the pair (diag blocks D [N+1,nz,nz], upper-off blocks O [N,nz,nz]).

Parallelism model: one solve is a sequential `lax.scan` over N+1 stages of
small dense ops. Chips are filled by the *batch* axis: `vmap` of this module
turns every stage op into [B, nz, nz] batched linear algebra, which XLA maps
onto the VPU/MXU. (A parallel cyclic-reduction variant for the batch=1
latency case lives in ops/pallas/ later.)
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from control_box_rst_tpu.ops.smallmat import (
    chol_small,
    mm_small_nt,
    mv_small,
    mv_small_t,
    solve_lower_mat,
    solve_lower_vec,
    solve_upperT_vec,
)


def _solve_tri_lower(L: jax.Array, B: jax.Array) -> jax.Array:
    """Solve L X = B with L lower-triangular (unrolled small-matrix kernel —
    full f32 precision on TPU, no MXU tile padding; see ops/smallmat.py)."""
    if B.ndim == L.ndim - 1:
        return solve_lower_vec(L, B)
    return solve_lower_mat(L, B)


def _solve_tri_upper_T(L: jax.Array, B: jax.Array) -> jax.Array:
    """Solve Lᵀ X = B with L lower-triangular."""
    if B.ndim == L.ndim - 1:
        return solve_upperT_vec(L, B)
    # matrix rhs: column-wise via vec solves (rarely used)
    cols = [solve_upperT_vec(L, B[..., :, j]) for j in range(B.shape[-1])]
    return jnp.stack(cols, axis=-1)


def btridiag_cholesky(D: jax.Array, O: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Factor the SPD block-tridiagonal matrix M = tridiag(Oᵀ, D, O).

    D: [K, nz, nz] diagonal blocks (symmetric), O: [K-1, nz, nz] upper
    off-diagonal blocks (M[k, k+1] = O[k]).

    Returns (Ld, Lo): Ld [K, nz, nz] lower-Cholesky factors of the Schur
    complements, Lo [K-1, nz, nz] sub-diagonal blocks of L, where M = L Lᵀ.
    """
    L0 = chol_small(D[0])

    def body(Lprev, inputs):
        Ok, Dk1 = inputs
        # L_{k+1,k} = Okᵀ Lprev^{-T}:  solve Lprev X = Ok, then Lo = Xᵀ
        X = _solve_tri_lower(Lprev, Ok)  # Lprev X = O_k → X = Lprev^{-1} O_k
        Lo_k = X.T  # [nz, nz]
        # tiny matmul as broadcast-sum (dot_general pads onto the MXU)
        S = Dk1 - mm_small_nt(Lo_k, Lo_k)
        Lk1 = chol_small(S)
        return Lk1, (Lk1, Lo_k)

    _, (Ld_rest, Lo) = jax.lax.scan(body, L0, (O, D[1:]))
    Ld = jnp.concatenate([L0[None], Ld_rest], axis=0)
    return Ld, Lo


def btridiag_solve(Ld: jax.Array, Lo: jax.Array, b: jax.Array) -> jax.Array:
    """Solve M x = b given the factorization from btridiag_cholesky.

    b: [K, nz] stage-blocked right-hand side. Returns x: [K, nz].
    """
    # forward: L z = b
    z0 = _solve_tri_lower(Ld[0], b[0])

    def fwd(zprev, inputs):
        Ldk, Lok, bk = inputs
        zk = _solve_tri_lower(Ldk, bk - mv_small(Lok, zprev))
        return zk, zk

    _, z_rest = jax.lax.scan(fwd, z0, (Ld[1:], Lo, b[1:]))
    z = jnp.concatenate([z0[None], z_rest], axis=0)

    # backward: Lᵀ x = z
    xK = _solve_tri_upper_T(Ld[-1], z[-1])

    def bwd(xnext, inputs):
        Ldk, Lok, zk = inputs
        xk = _solve_tri_upper_T(Ldk, zk - mv_small_t(Lok, xnext))
        return xk, xk

    _, x_rest = jax.lax.scan(bwd, xK, (Ld[:-1], Lo, z[:-1]), reverse=True)
    return jnp.concatenate([x_rest, xK[None]], axis=0)


def btridiag_matvec(D: jax.Array, O: jax.Array, x: jax.Array) -> jax.Array:
    """y = M x for the block-tridiagonal M (testing / residuals)."""
    y = mv_small(D, x)
    y = y.at[:-1].add(mv_small(O, x[1:]))
    y = y.at[1:].add(mv_small_t(O, x[:-1]))
    return y


def btridiag_dense(D: jax.Array, O: jax.Array) -> jax.Array:
    """Materialize M densely (oracle for tests — the analogue of the
    reference's 'ignore structure' problem realization,
    hyper_graph_optimization_problem_ignore_structure.h:34)."""
    K, nz, _ = D.shape
    M = jnp.zeros((K * nz, K * nz), D.dtype)
    for k in range(K):
        M = M.at[k * nz : (k + 1) * nz, k * nz : (k + 1) * nz].set(D[k])
        if k < K - 1:
            M = M.at[k * nz : (k + 1) * nz, (k + 1) * nz : (k + 2) * nz].set(O[k])
            M = M.at[(k + 1) * nz : (k + 2) * nz, k * nz : (k + 1) * nz].set(O[k].T)
    return M
