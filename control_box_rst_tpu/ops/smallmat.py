"""Unrolled small-matrix linear algebra.

The KKT blocks of direct transcription are tiny (nz = nx+nu+1 ≈ 4-12).
XLA-TPU's generic `cholesky`/`triangular_solve` pads such operands to MXU
tiles and routes through matmul kernels whose default precision is bf16 —
both slow AND inaccurate for 4×4 factorizations. These routines unroll the
factorization/substitution over the (static) block size so every operation
is a plain elementwise VPU op on the batch dimensions: full f32 precision,
no padding, and XLA fuses the whole factor+solve chain.

Used by ops/btridiag.py (the ADMM normal-equation solver). Shapes: all
functions take [..., n, n] / [..., n] with arbitrary leading batch dims.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def chol_small(A: jax.Array) -> jax.Array:
    """Cholesky factor L (lower) of SPD A, unrolled over the static n."""
    n = A.shape[-1]
    L = jnp.zeros_like(A)
    for j in range(n):
        # d = A[j,j] - sum_k L[j,k]^2
        d = A[..., j, j]
        for k in range(j):
            d = d - L[..., j, k] * L[..., j, k]
        d = jnp.sqrt(d)
        L = L.at[..., j, j].set(d)
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[..., i, k] * L[..., j, k]
            L = L.at[..., i, j].set(s * inv_d)
    return L


def solve_lower_vec(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve L x = b (L lower-triangular), b: [..., n]."""
    n = L.shape[-1]
    xs = []
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[..., i, k] * xs[k]
        xs.append(s / L[..., i, i])
    return jnp.stack(xs, axis=-1)


def solve_upperT_vec(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve Lᵀ x = b (L lower-triangular), b: [..., n]."""
    n = L.shape[-1]
    xs = [None] * n
    for i in reversed(range(n)):
        s = b[..., i]
        for k in range(i + 1, n):
            s = s - L[..., k, i] * xs[k]
        xs[i] = s / L[..., i, i]
    return jnp.stack(xs, axis=-1)


def solve_lower_mat(L: jax.Array, B: jax.Array) -> jax.Array:
    """Solve L X = B with B: [..., n, m] (column-wise substitution)."""
    n = L.shape[-1]
    rows = []
    for i in range(n):
        s = B[..., i, :]
        for k in range(i):
            s = s - L[..., i, k][..., None] * rows[k]
        rows.append(s / L[..., i, i][..., None])
    return jnp.stack(rows, axis=-2)


def chol_solve_vec(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve (L Lᵀ) x = b."""
    return solve_upperT_vec(L, solve_lower_vec(L, b))


def inv_spd_small(A: jax.Array) -> jax.Array:
    """Inverse of small SPD A via unrolled Cholesky."""
    n = A.shape[-1]
    L = chol_small(A)
    eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
    X = solve_lower_mat(L, eye)
    # A^{-1} = L^{-T} L^{-1} = Xᵀ X with X = L^{-1}
    return jnp.einsum("...ki,...kj->...ij", X, X)


# -- tiny-contraction products as broadcast-multiply-sum --------------------
# XLA lowers dot_general with 2-12-wide contraction dims onto padded MXU /
# convolution kernels (measured 43% of solve time at 0.008% FLOPs util on
# TPU v5e). Expressing the same contractions as broadcast elementwise
# multiplies + a small-axis reduce keeps them on the VPU and lets XLA fuse
# them into the surrounding elementwise graph.

def mm_small(A: jax.Array, B: jax.Array) -> jax.Array:
    """A @ B for tiny trailing dims: [..., m, k] x [..., k, n] -> [..., m, n]."""
    return jnp.sum(A[..., :, :, None] * B[..., None, :, :], axis=-2)


def mm_small_tn(A: jax.Array, B: jax.Array) -> jax.Array:
    """Aᵀ @ B: [..., k, m] x [..., k, n] -> [..., m, n] (contract first dim)."""
    return jnp.sum(A[..., :, :, None] * B[..., :, None, :], axis=-3)


def mm_small_nt(A: jax.Array, B: jax.Array) -> jax.Array:
    """A @ Bᵀ: [..., m, k] x [..., n, k] -> [..., m, n]."""
    return jnp.sum(A[..., :, None, :] * B[..., None, :, :], axis=-1)


def mv_small(A: jax.Array, x: jax.Array) -> jax.Array:
    """A @ x: [..., m, k] x [..., k] -> [..., m]."""
    return jnp.sum(A * x[..., None, :], axis=-1)


def mv_small_t(A: jax.Array, x: jax.Array) -> jax.Array:
    """Aᵀ @ x: [..., k, m] x [..., k] -> [..., m]."""
    return jnp.sum(A * x[..., :, None], axis=-2)
