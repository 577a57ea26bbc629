"""Pallas TPU kernel: batched block-tridiagonal Cholesky factor + solve.

Why a kernel: the scan-based solver (ops/btridiag.py) issues ~2·K sequential
steps of [B, nz, nz] micro-ops; on TPU that is dispatch/latency bound — the
VPU idles between tiny steps. This kernel runs the ENTIRE factorization and
both substitution sweeps in one `pallas_call`: the batch dimension lives in
the 128-wide lane axis, every scalar operation of the unrolled small-matrix
algebra is a [tile_b]-lane VPU op, and the K-loop is a register-level
`fori_loop` with all operands resident in VMEM.

Layout: inputs are transposed to batch-last —
  D [K, nz, nz, B], O [K-1, nz, nz, B], b [K, nz, B]
and tiled over B with a 1-D grid. VMEM per tile (K=51, nz=4, tile=128):
D 417 KB + O 409 KB + b/x 104 KB + factor scratch ≈ 1.4 MB — comfortably
inside the ~16 MB VMEM budget, leaving room for double buffering.

STATUS (measured on TPU v5e, B=1024/K=51/nz=4): the XLA scan path runs at
0.037 ms/batch — already dispatch-fused and NOT the solver bottleneck — while
this kernel currently measures 0.786 ms/batch because the [tile_b]-lane
layout occupies only one sublane row of the 8×128 VPU per op. It is kept as
a correctness-tested experimental path; the planned fix is packing the batch
into full (8, 128) tiles (batch = sublane × lane) so every unrolled scalar
op utilizes the whole VPU, plus fusing the ADMM iteration loop into the same
kernel. The production solver uses ops/btridiag.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _factor_solve_kernel(D_ref, O_ref, b_ref, x_ref, Ld_ref, Lo_ref, z_ref, nz: int, K: int):
    """Factor M = L Lᵀ and solve M x = b for one batch tile.

    All loops over k unrolled via fori_loop; loops over the (static, tiny)
    block size nz are Python-unrolled so every op is a [tile_b] vector op.
    """

    # ---- stage-0 Cholesky ----
    def chol_at(k_D):
        """Cholesky of the nz×nz block k_D (a [nz, nz, B] VMEM view) →
        list-of-lists of [B] rows (lower triangle)."""
        L = [[None] * nz for _ in range(nz)]
        for j in range(nz):
            d = k_D[j, j]
            for t in range(j):
                d = d - L[j][t] * L[j][t]
            dj = jnp.sqrt(d)
            L[j][j] = dj
            inv = 1.0 / dj
            for i in range(j + 1, nz):
                s = k_D[i, j]
                for t in range(j):
                    s = s - L[i][t] * L[j][t]
                L[i][j] = s * inv
        return L

    def tri_solve_mat(L, Bm):
        """Solve L X = Bm for X (Bm: [nz][nz] of [B] entries, column-major
        over second index)."""
        X = [[None] * nz for _ in range(nz)]
        for c in range(nz):
            for i in range(nz):
                s = Bm[i][c]
                for t in range(i):
                    s = s - L[i][t] * X[t][c]
                X[i][c] = s / L[i][i]
        return X

    def store_L(ref, k, L):
        for i in range(nz):
            for j in range(i + 1):
                ref[k, i, j] = L[i][j]

    def load_L(ref, k):
        L = [[None] * nz for _ in range(nz)]
        for i in range(nz):
            for j in range(i + 1):
                L[i][j] = ref[k, i, j]
        return L

    # factor stage 0
    D0 = D_ref[0]
    L0 = chol_at(D0)
    store_L(Ld_ref, 0, L0)

    # forward factorization k = 1..K-1
    def fact_body(k, _):
        Lprev = load_L(Ld_ref, k - 1)
        # X = Lprev^{-1} O_{k-1}  (O rows indexed [nz][nz])
        Om = [[O_ref[k - 1, i, j] for j in range(nz)] for i in range(nz)]
        X = tri_solve_mat(Lprev, Om)
        # Lo = Xᵀ ; S = D_k - Lo Loᵀ = D_k - Xᵀ X
        for i in range(nz):
            for j in range(nz):
                Lo_ref[k - 1, i, j] = X[j][i]
        S = [[None] * nz for _ in range(nz)]
        for i in range(nz):
            for j in range(i + 1):
                acc = D_ref[k, i, j]
                for t in range(nz):
                    acc = acc - X[t][i] * X[t][j]
                S[i][j] = acc
                S[j][i] = acc
        Lk = chol_at_list(S)
        store_L(Ld_ref, k, Lk)
        return 0

    def chol_at_list(Sm):
        L = [[None] * nz for _ in range(nz)]
        for j in range(nz):
            d = Sm[j][j]
            for t in range(j):
                d = d - L[j][t] * L[j][t]
            dj = jnp.sqrt(d)
            L[j][j] = dj
            inv = 1.0 / dj
            for i in range(j + 1, nz):
                s = Sm[i][j]
                for t in range(j):
                    s = s - L[i][t] * L[j][t]
                L[i][j] = s * inv
        return L

    jax.lax.fori_loop(1, K, fact_body, 0)

    # ---- forward substitution: L z = b ----
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

    z0 = tri_solve_vec(L0, [b_ref[0, i] for i in range(nz)])
    for i in range(nz):
        z_ref[0, i] = z0[i]

    def fwd_body(k, _):
        Lk = load_L(Ld_ref, k)
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

    # ---- backward substitution: Lᵀ x = z ----
    LK = load_L(Ld_ref, K - 1)
    xK = triT_solve_vec(LK, [z_ref[K - 1, i] for i in range(nz)])
    for i in range(nz):
        x_ref[K - 1, i] = xK[i]

    def bwd_body(kk, _):
        k = K - 2 - kk
        Lk = load_L(Ld_ref, k)
        rhs = []
        for i in range(nz):
            s = z_ref[k, i]
            for t in range(nz):
                # Loᵀ: (Lo_k)ᵀ[i,t] = Lo_ref[k, t, i]
                s = s - Lo_ref[k, t, i] * x_ref[k + 1, t]
            rhs.append(s)
        xk = triT_solve_vec(Lk, rhs)
        for i in range(nz):
            x_ref[k, i] = xk[i]
        return 0

    jax.lax.fori_loop(0, K - 1, bwd_body, 0)


@functools.partial(jax.jit, static_argnames=("tile_b", "interpret"))
def btridiag_solve_pallas(D, O, b, tile_b: int = 128, interpret: bool = False):
    """Solve M x = b for a BATCH of block-tridiagonal SPD systems.

    D: [B, K, nz, nz], O: [B, K-1, nz, nz], b: [B, K, nz] → x [B, K, nz].
    The batch is tiled into lane-dimension groups of `tile_b`.
    """
    B, K, nz, _ = D.shape
    pad = (-B) % tile_b
    if pad:
        D = jnp.concatenate([D, jnp.ones((pad, K, nz, nz), D.dtype)
                             * jnp.eye(nz, dtype=D.dtype)], axis=0)
        O = jnp.concatenate([O, jnp.zeros((pad, K - 1, nz, nz), O.dtype)], axis=0)
        b = jnp.concatenate([b, jnp.zeros((pad, K, nz), b.dtype)], axis=0)
    Bp = B + pad
    # batch-last layout
    Dt = jnp.moveaxis(D, 0, -1)  # [K, nz, nz, Bp]
    Ot = jnp.moveaxis(O, 0, -1)
    bt = jnp.moveaxis(b, 0, -1)  # [K, nz, Bp]

    grid = (Bp // tile_b,)
    kernel = functools.partial(_factor_solve_kernel, nz=nz, K=K)
    x = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((K, nz, nz, tile_b), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K - 1, nz, nz, tile_b), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, nz, tile_b), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, nz, tile_b), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, nz, Bp), D.dtype),
        scratch_shapes=[
            pltpu.VMEM((K, nz, nz, tile_b), D.dtype),  # Ld
            pltpu.VMEM((K - 1, nz, nz, tile_b), D.dtype),  # Lo
            pltpu.VMEM((K, nz, tile_b), D.dtype),  # z
        ],
        interpret=interpret,
    )(Dt, Ot, bt)
    x = jnp.moveaxis(x, -1, 0)  # [Bp, K, nz]
    return x[:B]
