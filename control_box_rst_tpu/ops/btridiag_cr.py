"""Block cyclic reduction: log-depth factor/solve for SPD block-tridiagonal
systems.

TPU motivation: the Thomas-style factorization/solve in ops/btridiag.py is a
sequential `lax.scan` over the K ≈ N+1 stages — ~2K dependent micro-ops per
solve. At MPC sizes (nz ≈ 4-12, K ≈ 50) each step is far too small to fill
the chip, so ADMM iterations are *latency*-bound: the chip idles while ~100
tiny kernels retire one after another. Cyclic reduction reorders the same
elimination (it IS block Cholesky under an odd-even permutation, so SPD is
preserved) into ⌈log₂ K⌉ levels whose per-level work is one batched einsum
over all remaining stages — depth ~2·log₂K instead of ~2K, with every level
a wide [B·K_l, nz, nz] op.

Reference anchor: replaces the same sparse factorizations as ops/btridiag.py
(LM's SimplicialLLT, levenberg_marquardt_sparse.cpp:98-150; OSQP's QDLDL,
qp_solver_osqp.cpp:107). Literature: parallel/block-elimination KKT solvers
for OCP (PAPERS.md).

Layout: M = tridiag(Oᵀ, D, O) with D [K, nz, nz] symmetric diagonal blocks
and O [K-1, nz, nz] upper off-diagonals (M[k, k+1] = O[k]). K is padded to
2^m + 1 with identity/zero blocks (decoupled dummy unknowns).

One level (evens e = 2j keep, odds o = 2j+1 eliminated; K_l = 2^l + 1):
    α_{j+1} = O[2j+1]ᵀ B⁻¹[2j+1]       (even row 2j+2 couples left odd 2j+1)
    γ_j     = O[2j]    B⁻¹[2j+1]       (even row 2j   couples right odd 2j+1)
    D'_{j+1} -= α_{j+1} O[2j+1] ;  D'_j -= γ_j O[2j]ᵀ
    O'_j = -γ_j O[2j+1]
    b'_{j+1} -= α_{j+1} b[2j+1] ;  b'_j -= γ_j b[2j+1]
Back substitution:
    x[2j+1] = B⁻¹[2j+1] (b[2j+1] - O[2j]ᵀ x[2j] - O[2j+1] x[2j+2])
Reduction stops at K = 2; the remaining 2-block system is solved densely
(2nz × 2nz, still tiny).
"""
from __future__ import annotations

import math
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from control_box_rst_tpu.ops.smallmat import (
    inv_spd_small,
    mm_small,
    mm_small_nt,
    mm_small_tn,
    mv_small,
    mv_small_t,
)


class BCRFactors(NamedTuple):
    # per level: (Binv, alpha, gamma, OL, OR) each [n_odd, nz, nz] with
    # OL = O[0::2], OR = O[1::2] of that level
    levels: Tuple
    root_inv: jax.Array  # [2nz, 2nz] (or [nz, nz] when K == 1)
    K: int               # original (unpadded) stage count


def _pad_pow2p1(D: jax.Array, O: jax.Array) -> Tuple[jax.Array, jax.Array]:
    K = D.shape[0]
    m = max(1, math.ceil(math.log2(max(K - 1, 1))))
    Kp = (1 << m) + 1
    if Kp == K:
        return D, O
    nz = D.shape[-1]
    pad = Kp - K
    eye = jnp.broadcast_to(jnp.eye(nz, dtype=D.dtype), (pad, nz, nz))
    Dp = jnp.concatenate([D, eye], axis=0)
    Op = jnp.concatenate([O, jnp.zeros((pad, nz, nz), dtype=O.dtype)], axis=0)
    return Dp, Op


def bcr_factor(D: jax.Array, O: jax.Array) -> BCRFactors:
    """Precompute per-level elimination coefficients.

    D: [K, nz, nz] SPD diagonal blocks, O: [K-1, nz, nz] upper off-diagonals.
    """
    K_orig, nz = D.shape[0], D.shape[-1]
    if K_orig == 1:
        return BCRFactors(levels=(), root_inv=inv_spd_small(D[0]), K=1)
    D, O = _pad_pow2p1(D, O)
    levels: List = []
    while D.shape[0] > 2:
        D_odd = D[1::2]
        Binv = inv_spd_small(D_odd)               # [n_odd, nz, nz]
        OL = O[0::2]                              # O[2j]
        OR = O[1::2]                              # O[2j+1]
        alpha = mm_small_tn(OR, Binv)   # α_{j+1}
        gamma = mm_small(OL, Binv)   # γ_j
        D_new = D[0::2]
        D_new = D_new.at[1:].add(-mm_small(alpha, OR))
        D_new = D_new.at[:-1].add(-mm_small_nt(gamma, OL))
        O_new = -mm_small(gamma, OR)
        levels.append((Binv, alpha, gamma, OL, OR))
        D, O = D_new, O_new
    # 2-block root: [[D0, O0], [O0ᵀ, D1]]
    top = jnp.concatenate([D[0], O[0]], axis=-1)
    bot = jnp.concatenate([O[0].T, D[1]], axis=-1)
    root_inv = inv_spd_small(jnp.concatenate([top, bot], axis=0))
    return BCRFactors(levels=tuple(levels), root_inv=root_inv, K=K_orig)


def bcr_solve(fac: BCRFactors, b: jax.Array) -> jax.Array:
    """Solve M x = b with precomputed factors. b: [K, nz] → x: [K, nz]."""
    K, nz = fac.K, b.shape[-1]
    if K == 1:
        return mv_small(fac.root_inv[None], b)
    Kp = (1 << len(fac.levels)) + 1  # padded size the factor loop started from
    if Kp != K:
        b = jnp.concatenate(
            [b, jnp.zeros((Kp - K, nz), b.dtype)], axis=0
        )
    # forward reduction
    b_odds = []
    for (Binv, alpha, gamma, OL, OR) in fac.levels:
        b_odd = b[1::2]
        b_new = b[0::2]
        b_new = b_new.at[1:].add(-mv_small(alpha, b_odd))
        b_new = b_new.at[:-1].add(-mv_small(gamma, b_odd))
        b_odds.append(b_odd)
        b = b_new
    # 2-block root
    x2 = mv_small(fac.root_inv, b.reshape(-1))
    x = x2.reshape(2, nz)
    # back substitution
    for (Binv, alpha, gamma, OL, OR), b_odd in zip(
        reversed(fac.levels), reversed(b_odds)
    ):
        rhs = b_odd - mv_small_t(OL, x[:-1]) - mv_small(OR, x[1:])
        x_odd = mv_small(Binv, rhs)
        full = jnp.zeros((x.shape[0] + x_odd.shape[0], nz), x.dtype)
        x = full.at[0::2].set(x).at[1::2].set(x_odd)
    return x[:K]
