"""Pallas TPU kernel v2: block-tridiagonal solve with full-VPU batch tiling.

v1 (btridiag_kernel.py) put the batch only in the 128-lane axis, so each
unrolled scalar op used 1/8 of the VPU. v2 packs the batch tile as
(8 sublanes × 128 lanes) = 1024 problems: every scalar entry of the
small-matrix algebra is an [8, 128] tile op — full VPU utilization.

VMEM budget (K=51, nz=4, tile 1024, f32): D 3.3 MB + O 3.3 MB + b/x/z
≈ 1.9 MB ≈ 8.5 MB. The Cholesky factor is written IN PLACE over D/O via
input_output_aliases (within one stage, all reads complete before the
stores), avoiding 6.6 MB of scratch.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(D_ref, O_ref, b_ref, x_ref, Ld_ref, Lo_ref, z_ref, *, nz: int, K: int):
    """Factor M = L Lᵀ in place (Ld_ref aliases D_ref, Lo_ref aliases O_ref)
    and solve M x = b. Every indexed entry is an [8, 128] tile."""

    def chol(S):  # S: [nz][nz] entries → lower factor L [nz][nz]
        L = [[None] * nz for _ in range(nz)]
        for j in range(nz):
            d = S[j][j]
            for t in range(j):
                d = d - L[j][t] * L[j][t]
            dj = jnp.sqrt(d)
            L[j][j] = dj
            inv = 1.0 / dj
            for i in range(j + 1, nz):
                s = S[i][j]
                for t in range(j):
                    s = s - L[i][t] * L[j][t]
                L[i][j] = s * inv
        return L

    def tri_solve_mat(L, Bm):  # L X = Bm (Bm [nz][nz])
        X = [[None] * nz for _ in range(nz)]
        for c in range(nz):
            for i in range(nz):
                s = Bm[i][c]
                for t in range(i):
                    s = s - L[i][t] * X[t][c]
                X[i][c] = s / L[i][i]
        return X

    def tri_solve_vec(L, rhs):
        z = [None] * nz
        for i in range(nz):
            s = rhs[i]
            for t in range(i):
                s = s - L[i][t] * z[t]
            z[i] = s / L[i][i]
        return z

    def triT_solve_vec(L, rhs):
        x = [None] * nz
        for i in reversed(range(nz)):
            s = rhs[i]
            for t in range(i + 1, nz):
                s = s - L[t][i] * x[t]
            x[i] = s / L[i][i]
        return x

    def read_mat(ref, k):
        return [[ref[k, i, j] for j in range(nz)] for i in range(nz)]

    def read_lower(ref, k):
        L = [[None] * nz for _ in range(nz)]
        for i in range(nz):
            for j in range(i + 1):
                L[i][j] = ref[k, i, j]
        return L

    def write_lower(ref, k, L):
        for i in range(nz):
            for j in range(i + 1):
                ref[k, i, j] = L[i][j]

    # stage 0 factor + forward substitution fused in one sweep
    L0 = chol(read_mat(D_ref, 0))
    write_lower(Ld_ref, 0, L0)
    z0 = tri_solve_vec(L0, [b_ref[0, i] for i in range(nz)])
    for i in range(nz):
        z_ref[0, i] = z0[i]

    def fwd_body(k, _):
        Lprev = read_lower(Ld_ref, k - 1)
        X = tri_solve_mat(Lprev, read_mat(O_ref, k - 1))  # X = Lprev⁻¹ O
        # S = D_k − Xᵀ X ; Lo_{k-1} = Xᵀ (write after all O reads done)
        S = [[None] * nz for _ in range(nz)]
        for i in range(nz):
            for j in range(i + 1):
                acc = D_ref[k, i, j]
                for t in range(nz):
                    acc = acc - X[t][i] * X[t][j]
                S[i][j] = acc
        for i in range(nz):
            for j in range(nz):
                Lo_ref[k - 1, i, j] = X[j][i]
        Lk = chol([[S[max(i, j)][min(i, j)] for j in range(nz)] for i in range(nz)])
        write_lower(Ld_ref, k, Lk)
        # forward substitution for stage k
        rhs = []
        for i in range(nz):
            s = b_ref[k, i]
            for t in range(nz):
                s = s - Lo_ref[k - 1, i, t] * z_ref[k - 1, t]
            rhs.append(s)
        zk = tri_solve_vec(Lk, rhs)
        for i in range(nz):
            z_ref[k, i] = zk[i]
        return 0

    jax.lax.fori_loop(1, K, fwd_body, 0)

    # backward substitution
    LK = read_lower(Ld_ref, K - 1)
    xK = triT_solve_vec(LK, [z_ref[K - 1, i] for i in range(nz)])
    for i in range(nz):
        x_ref[K - 1, i] = xK[i]

    def bwd_body(kk, _):
        k = K - 2 - kk
        Lk = read_lower(Ld_ref, k)
        rhs = []
        for i in range(nz):
            s = z_ref[k, i]
            for t in range(nz):
                s = s - Lo_ref[k, t, i] * x_ref[k + 1, t]
            rhs.append(s)
        xk = triT_solve_vec(Lk, rhs)
        for i in range(nz):
            x_ref[k, i] = xk[i]
        return 0

    jax.lax.fori_loop(0, K - 1, bwd_body, 0)


@functools.partial(jax.jit, static_argnames=("tile_b", "interpret"))
def btridiag_solve_pallas_v2(D, O, b, tile_b: int = 1024, interpret: bool = False):
    """Batched block-tridiagonal SPD solve, (8,128)-tiled batch.

    D [B,K,nz,nz], O [B,K-1,nz,nz], b [B,K,nz] → x [B,K,nz].
    tile_b must be a multiple of 1024 (8 sublanes × 128 lanes).
    """
    B, K, nz, _ = D.shape
    SUB, LANE = 8, 128
    assert tile_b % (SUB * LANE) == 0
    pad = (-B) % tile_b
    if pad:
        eye = jnp.broadcast_to(jnp.eye(nz, dtype=D.dtype), (pad, K, nz, nz))
        D = jnp.concatenate([D, eye], axis=0)
        O = jnp.concatenate([O, jnp.zeros((pad, K - 1, nz, nz), O.dtype)], axis=0)
        b = jnp.concatenate([b, jnp.zeros((pad, K, nz), b.dtype)], axis=0)
    Bp = B + pad
    n_sub = tile_b // LANE  # sublane extent per tile (multiple of 8)

    # layout [K, nz(,nz), Bp//LANE, LANE]
    Dt = jnp.moveaxis(D, 0, -1).reshape(K, nz, nz, Bp // LANE, LANE)
    Ot = jnp.moveaxis(O, 0, -1).reshape(K - 1, nz, nz, Bp // LANE, LANE)
    bt = jnp.moveaxis(b, 0, -1).reshape(K, nz, Bp // LANE, LANE)

    grid = (Bp // tile_b,)
    kernel = functools.partial(_kernel, nz=nz, K=K)
    x, Ld, Lo, z = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((K, nz, nz, n_sub, LANE), lambda i: (0, 0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K - 1, nz, nz, n_sub, LANE), lambda i: (0, 0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, nz, n_sub, LANE), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((K, nz, n_sub, LANE), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, nz, nz, n_sub, LANE), lambda i: (0, 0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K - 1, nz, nz, n_sub, LANE), lambda i: (0, 0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, nz, n_sub, LANE), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((K, nz, Bp // LANE, LANE), D.dtype),       # x
            jax.ShapeDtypeStruct((K, nz, nz, Bp // LANE, LANE), D.dtype),   # Ld (aliases D)
            jax.ShapeDtypeStruct((K - 1, nz, nz, Bp // LANE, LANE), D.dtype),  # Lo (aliases O)
            jax.ShapeDtypeStruct((K, nz, Bp // LANE, LANE), D.dtype),       # z scratch
        ),
        input_output_aliases={0: 1, 1: 2},
        interpret=interpret,
    )(Dt, Ot, bt)
    x = x.reshape(K, nz, Bp)
    x = jnp.moveaxis(x, -1, 0)
    return x[:B]
