"""Pallas TPU kernel: whole ADMM rounds of the stage QP in VMEM.

Motivation (measured, TPU v5e, flagship config-1 batch B=1024): the XLA
lowering of solve_stage_qp spends its time in thousands of tiny fusions —
0.09 % FLOPs utilization, everything op-overhead. One ADMM iteration's
working set is ≈16 KB per lane; a (8×128)-lane tile of the whole QP state
fits in ~15 MiB of VMEM. This kernel runs assembly + block-tridiagonal
Cholesky + `iters` ADMM iterations for 1024 lanes per grid step with ZERO
HBM traffic between iterations — the fusion XLA cannot do across a
fori_loop of scatters and scans.

Scope (falls back to the XLA path otherwise, solvers/stage_qp.py):
  - f32, no general constraint rows (ng = 0): interval equalities + box.
  - dynamics rows are equalities (l = u = -c), so their ADMM z-variable is
    the constant -c and is eliminated analytically; only y_dyn is carried.
  - ρ is fixed within one kernel call; OSQP ρ-adaptation rounds live
    outside (one kernel call per round, assembly+factor redone in-kernel).

Layout convention (shared with btridiag_kernel_v2): the batch is packed
into the last two dims as (8 sublanes × 128 lanes); every "scalar" of the
small-matrix algebra is an [8, 128] tile op at full VPU width. Arrays are
[stage(, row, col), n_sub, 128].

Per-lane ADMM iteration (matches solve_stage_qp exactly, ng = 0):
    rhs   = σx - g + Jᵀ(ρe·z_d - y_d)|_k + Kᵀ(...)|_{k-1} + (ρb·z_b - y_b)
    x_t   = M⁻¹ rhs                      (block-tridiag solve, factored once)
    x     = α x_t + (1-α) x
    Ax_d  = J x_t|_k + K x_t|_{k+1}
    v_d   = α Ax_d + (1-α)(-c) ;  y_d += ρe (v_d + c)        [z_d ≡ -c]
    v_b   = α x_t + (1-α) z_b
    z_b'  = clip(v_b + y_b/ρb, dlb, dub) ;  y_b += ρb (v_b - z_b')
    pr    = max(|Ax_d + c|, |x_t - z_b'|) ;  dr = max |ρb (z_b' - z_b)|
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB, LANE = 8, 128
TILE_B = SUB * LANE  # 1024


def _tri(i, j):
    """Index of (i,j), j<=i, in a packed lower-triangular layout."""
    return i * (i + 1) // 2 + j


def _round_ops(
    Hd_ref, J_ref, K_ref, g_ref, c_ref, dlb_ref, dub_ref,
    x_ref, zb_ref, yd_ref, yb_ref,
    Ld_ref, Lo_ref, xt_ref,
    rho,
    *, nz: int, nc: int, Kst: int, iters: int,
    sigma: float, alpha: float, rho_eq_scale: float,
    xtot_ref=None,
):
    """One ρ-round on VMEM-resident state: assemble M for the given per-lane
    ρ tile, factor, run `iters` ADMM iterations in place, return (pr, dr).

    Shapes (leading dims; every entry is an [SUB, LANE] tile):
      Hd [Kst, nz, nz]   J,K [Kst-1, nc, nz]   g [Kst, nz]   c [Kst-1, nc]
      dlb/dub [Kst, nz]  rho [SUB, LANE]  states x/zb/yb [Kst, nz], yd [N, nc]
      Ld [Kst, nz(nz+1)/2] packed   Lo [Kst-1, nz, nz]   xt [Kst, nz]

    When `xtot_ref` is given (the recentered full-solve kernel), the box
    bounds are shifted on the fly: [dlb - xtot, dub - xtot].
    """
    N = Kst - 1
    rho_eq = rho * rho_eq_scale

    def box_lo(k, i):
        if xtot_ref is None:
            return dlb_ref[k, i]
        return dlb_ref[k, i] - xtot_ref[k, i]

    def box_hi(k, i):
        if xtot_ref is None:
            return dub_ref[k, i]
        return dub_ref[k, i] - xtot_ref[k, i]

    def rho_box(k, i):
        # per-row ρ: equality-like box rows (pins: dlb == dub) get ρ_eq.
        # The pin test uses the UNSHIFTED bounds (shift-invariant anyway).
        return jnp.where(dlb_ref[k, i] == dub_ref[k, i], rho_eq, rho)

    # ---- assemble + factor M = LLᵀ (stage-by-stage, D_k built on the fly) --
    def assemble_D(k):
        """D_k = Hd_k + σI + ρe (J_kᵀJ_k [k<N] + K_{k-1}ᵀK_{k-1} [k>0])
        + diag(ρ_box); returns [nz][nz] list (symmetric, fully formed)."""
        D = [[None] * nz for _ in range(nz)]
        for i in range(nz):
            for j in range(i + 1):
                acc = Hd_ref[k, i, j]
                if k < N:
                    for r in range(nc):
                        acc = acc + rho_eq * J_ref[k, r, i] * J_ref[k, r, j]
                if k > 0:
                    for r in range(nc):
                        acc = acc + rho_eq * K_ref[k - 1, r, i] * K_ref[k - 1, r, j]
                if i == j:
                    acc = acc + sigma + rho_box(k, i)
                D[i][j] = acc
                D[j][i] = acc
        return D

    def chol_packed(S, k):
        """Cholesky of S (list form) → packed lower into Ld_ref[k]."""
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
        for i in range(nz):
            for j in range(i + 1):
                Ld_ref[k, _tri(i, j)] = L[i][j]
        return L

    def read_L(k):
        L = [[None] * nz for _ in range(nz)]
        for i in range(nz):
            for j in range(i + 1):
                L[i][j] = Ld_ref[k, _tri(i, j)]
        return L

    # stage 0
    L = chol_packed(assemble_D(0), 0)
    # stages 1..K-1: X = Lprev⁻¹ O_{k-1};  S = D_k − XᵀX;  Lo_{k-1} = Xᵀ
    for k in range(1, Kst):
        Lprev = read_L(k - 1)
        # O_{k-1} = ρe · J_{k-1}ᵀ K_{k-1}  (computed on the fly, [nz][nz])
        O = [[None] * nz for _ in range(nz)]
        for i in range(nz):
            for j in range(nz):
                acc = J_ref[k - 1, 0, i] * K_ref[k - 1, 0, j]
                for r in range(1, nc):
                    acc = acc + J_ref[k - 1, r, i] * K_ref[k - 1, r, j]
                O[i][j] = rho_eq * acc
        # X = Lprev⁻¹ O (column-wise forward substitution)
        X = [[None] * nz for _ in range(nz)]
        for cc in range(nz):
            for i in range(nz):
                s = O[i][cc]
                for t in range(i):
                    s = s - Lprev[i][t] * X[t][cc]
                X[i][cc] = s / Lprev[i][i]
        S = assemble_D(k)
        for i in range(nz):
            for j in range(i + 1):
                acc = S[i][j]
                for t in range(nz):
                    acc = acc - X[t][i] * X[t][j]
                S[i][j] = acc
                S[j][i] = acc
        for i in range(nz):
            for j in range(nz):
                Lo_ref[k - 1, i, j] = X[j][i]
        L = chol_packed(S, k)

    # ---- ADMM iterations ----
    def tri_solve_vec(L, rhs):
        z = [None] * nz
        for i in range(nz):
            s = rhs[i]
            for t in range(i):
                s = s - L[i][t] * z[t]
            z[i] = s / L[i][i]
        return z

    def triT_solve_vec(L, rhs):
        out = [None] * nz
        for i in reversed(range(nz)):
            s = rhs[i]
            for t in range(i + 1, nz):
                s = s - L[t][i] * out[t]
            out[i] = s / L[i][i]
        return out

    def admm_iter(_, carry):
        # --- rhs and forward substitution fused per stage ---
        # vd[k,r] = ρe·z_d − y_d = −ρe·c[k,r] − yd[k,r]
        for k in range(Kst):
            rhs = []
            for i in range(nz):
                s = sigma * x_ref[k, i] - g_ref[k, i]
                s = s + (rho_box(k, i) * zb_ref[k, i] - yb_ref[k, i])
                if k < N:
                    for r in range(nc):
                        vd = -rho_eq * c_ref[k, r] - yd_ref[k, r]
                        s = s + J_ref[k, r, i] * vd
                if k > 0:
                    for r in range(nc):
                        vd = -rho_eq * c_ref[k - 1, r] - yd_ref[k - 1, r]
                        s = s + K_ref[k - 1, r, i] * vd
                rhs.append(s)
            Lk = read_L(k)
            if k > 0:
                for i in range(nz):
                    s = rhs[i]
                    for t in range(nz):
                        s = s - Lo_ref[k - 1, i, t] * xt_ref[k - 1, t]
                    rhs[i] = s
            zk = tri_solve_vec(Lk, rhs)
            for i in range(nz):
                xt_ref[k, i] = zk[i]  # holds z during fwd, x_t after bwd
        # --- backward substitution ---
        LK = read_L(Kst - 1)
        xk = triT_solve_vec(LK, [xt_ref[Kst - 1, i] for i in range(nz)])
        for i in range(nz):
            xt_ref[Kst - 1, i] = xk[i]
        for kk in range(Kst - 1):
            k = Kst - 2 - kk
            Lk = read_L(k)
            rhs = []
            for i in range(nz):
                s = xt_ref[k, i]
                for t in range(nz):
                    s = s - Lo_ref[k, t, i] * xt_ref[k + 1, t]
                rhs.append(s)
            xk = triT_solve_vec(Lk, rhs)
            for i in range(nz):
                xt_ref[k, i] = xk[i]
        # --- updates ---
        for k in range(Kst):
            for i in range(nz):
                x_ref[k, i] = alpha * xt_ref[k, i] + (1.0 - alpha) * x_ref[k, i]
        for k in range(N):
            for r in range(nc):
                ax = jnp.zeros((SUB, LANE), jnp.float32)
                for i in range(nz):
                    ax = ax + J_ref[k, r, i] * xt_ref[k, i]
                    ax = ax + K_ref[k, r, i] * xt_ref[k + 1, i]
                v_d = alpha * ax + (1.0 - alpha) * (-c_ref[k, r])
                yd_ref[k, r] = yd_ref[k, r] + rho_eq * (v_d + c_ref[k, r])
        for k in range(Kst):
            for i in range(nz):
                rb = rho_box(k, i)
                v_b = alpha * xt_ref[k, i] + (1.0 - alpha) * zb_ref[k, i]
                z_new = jnp.clip(
                    v_b + yb_ref[k, i] / rb, box_lo(k, i), box_hi(k, i)
                )
                yb_ref[k, i] = yb_ref[k, i] + rb * (v_b - z_new)
                zb_ref[k, i] = z_new
        return carry

    # while_loop, not fori_loop: a static-trip-count fori lowers to an
    # UNROLLED scan under Mosaic — compile time measured linear in `iters`
    # (12→50 iterations: 55 s → 145 s). The dynamic-condition while keeps
    # one copy of the body regardless of the iteration budget.
    def _wl_body(i):
        admm_iter(i, 0)
        return i + 1

    jax.lax.while_loop(lambda i: i < iters, _wl_body, 0)

    # ---- residuals (computed once, on the final iterate) ----
    # NOTE: needs one extra Ax_d pass with the final x_t (still in xt_ref)
    pr = jnp.zeros((SUB, LANE), jnp.float32)
    dr = jnp.zeros((SUB, LANE), jnp.float32)
    for k in range(N):
        for r in range(nc):
            ax = jnp.zeros((SUB, LANE), jnp.float32)
            for i in range(nz):
                ax = ax + J_ref[k, r, i] * xt_ref[k, i]
                ax = ax + K_ref[k, r, i] * xt_ref[k + 1, i]
            pr = jnp.maximum(pr, jnp.abs(ax + c_ref[k, r]))
    for k in range(Kst):
        for i in range(nz):
            pr = jnp.maximum(pr, jnp.abs(xt_ref[k, i] - zb_ref[k, i]))
    # dual residual: last box z-update step size (dynamics z is constant)
    # approximated by the final y_b increment / ρ... exact form needs z_prev;
    # we recompute it from the stored v_b relation: dr uses the clip gap
    # |ρb(v_b − z_b)| = |y_b increment| of the LAST iteration, which equals
    # the fixed-point residual of the box family.
    for k in range(Kst):
        for i in range(nz):
            rb = rho_box(k, i)
            v_b = alpha * xt_ref[k, i] + (1.0 - alpha) * zb_ref[k, i]
            z_new = jnp.clip(
                v_b + yb_ref[k, i] / rb, box_lo(k, i), box_hi(k, i)
            )
            dr = jnp.maximum(dr, jnp.abs(rb * (z_new - zb_ref[k, i])))
    return pr, dr


def _init_state(
    x0_ref, zb0_ref, yd0_ref, yb0_ref,
    x_ref, zb_ref, yd_ref, yb_ref,
    *, nz: int, nc: int, Kst: int,
):
    """Copy warm-start inputs into the in-place state refs."""
    for k in range(Kst):
        for i in range(nz):
            x_ref[k, i] = x0_ref[k, i]
            zb_ref[k, i] = zb0_ref[k, i]
            yb_ref[k, i] = yb0_ref[k, i]
    for k in range(Kst - 1):
        for r in range(nc):
            yd_ref[k, r] = yd0_ref[k, r]


def _kernel(
    Hd_ref, J_ref, K_ref, g_ref, c_ref, dlb_ref, dub_ref, rho_ref,
    x0_ref, zb0_ref, yd0_ref, yb0_ref,
    # outputs
    x_ref, zb_ref, yd_ref, yb_ref, pr_ref, dr_ref,
    # scratch
    Ld_ref, Lo_ref, xt_ref,
    *, nz: int, nc: int, Kst: int, iters: int,
    sigma: float, alpha: float, rho_eq_scale: float,
):
    """One ρ-round: assemble M, factor, run `iters` ADMM iterations.
    ρ adaptation between rounds lives OUTSIDE (solvers/stage_qp.py)."""
    _init_state(
        x0_ref, zb0_ref, yd0_ref, yb0_ref, x_ref, zb_ref, yd_ref, yb_ref,
        nz=nz, nc=nc, Kst=Kst,
    )
    pr, dr = _round_ops(
        Hd_ref, J_ref, K_ref, g_ref, c_ref, dlb_ref, dub_ref,
        x_ref, zb_ref, yd_ref, yb_ref, Ld_ref, Lo_ref, xt_ref,
        rho_ref[...],
        nz=nz, nc=nc, Kst=Kst, iters=iters,
        sigma=sigma, alpha=alpha, rho_eq_scale=rho_eq_scale,
    )
    pr_ref[0] = pr
    dr_ref[0] = dr


def _solve_kernel(
    Hd_ref, J_ref, K_ref, g_ref, c_ref, dlb_ref, dub_ref, rho0_ref,
    x0_ref, zb0_ref, yd0_ref, yb0_ref,
    # outputs
    x_ref, zb_ref, yd_ref, yb_ref, pr_ref, dr_ref, it_ref,
    # scratch
    Ld_ref, Lo_ref, xt_ref, gs_ref, cs_ref, xtot_ref,
    *, nz: int, nc: int, Kst: int, n_rounds: int, iters: int, tol: float,
    sigma: float, alpha: float, rho_eq_scale: float,
    rho_min: float, rho_max: float,
    tol_stat: float = 0.0, tol_feas: float = 0.0,
):
    """FULL box-QP solve in one kernel: up to `n_rounds` ρ-adaptation rounds
    (assemble → block-tridiag factor → `iters` ADMM iterations → RECENTER →
    per-lane OSQP §5.2 ρ rescale), with early exit once every lane is below
    tolerance.

    Recentering between rounds absorbs the accumulated step xtot into the
    linear data (g += H·x, c += A·x, box bounds shifted on the fly) and
    restarts the primal at 0 — algebraically a no-op for the QP, but it is
    what makes a single-launch f32 solve POSSIBLE: a non-recentered ADMM
    chain stalls at an absolute residual floor ~ρ_eq·ε_f32·‖data‖ (measured
    stat ⪆1e-2 on the flagship problem), while each recentered round shrinks
    every carried magnitude together with the remaining error. This is the
    same reason the outer SQP loop (solvers/sqp.py) converges where a long
    plain ADMM run does not.

    Exit criterion: ADMM primal/dual < `tol`, OR — when (tol_stat,
    tol_feas) are nonzero — the exact NLP KKT residuals of the LTI QP at
    the recentered iterate (stat = |g' + Aᵀy| over free rows, feas =
    |c'|), matching solvers/sqp.py's outer-loop test."""
    _init_state(
        x0_ref, zb0_ref, yd0_ref, yb0_ref, x_ref, zb_ref, yd_ref, yb_ref,
        nz=nz, nc=nc, Kst=Kst,
    )
    N = Kst - 1
    zero = jnp.zeros((SUB, LANE), jnp.float32)
    for k in range(Kst):
        for i in range(nz):
            gs_ref[k, i] = g_ref[k, i]
            xtot_ref[k, i] = zero
    for k in range(N):
        for r in range(nc):
            cs_ref[k, r] = c_ref[k, r]
    use_kkt = tol_stat > 0.0 and tol_feas > 0.0

    def do_round(carry):
        rnd, _, rho, it = carry
        pr, dr = _round_ops(
            Hd_ref, J_ref, K_ref, gs_ref, cs_ref, dlb_ref, dub_ref,
            x_ref, zb_ref, yd_ref, yb_ref, Ld_ref, Lo_ref, xt_ref,
            rho,
            nz=nz, nc=nc, Kst=Kst, iters=iters,
            sigma=sigma, alpha=alpha, rho_eq_scale=rho_eq_scale,
            xtot_ref=xtot_ref,
        )
        # ---- recenter: absorb this round's step into the linear data ----
        for k in range(N):
            for r in range(nc):
                ax = jnp.zeros((SUB, LANE), jnp.float32)
                for i in range(nz):
                    ax = ax + J_ref[k, r, i] * x_ref[k, i]
                    ax = ax + K_ref[k, r, i] * x_ref[k + 1, i]
                cs_ref[k, r] = cs_ref[k, r] + ax
        for k in range(Kst):
            for i in range(nz):
                gi = gs_ref[k, i]
                for j in range(nz):
                    gi = gi + Hd_ref[k, i, j] * x_ref[k, j]
                gs_ref[k, i] = gi
        for k in range(Kst):
            for i in range(nz):
                xtot_ref[k, i] = xtot_ref[k, i] + x_ref[k, i]
        for k in range(Kst):
            for i in range(nz):
                lo = dlb_ref[k, i] - xtot_ref[k, i]
                hi = dub_ref[k, i] - xtot_ref[k, i]
                zb_ref[k, i] = jnp.minimum(jnp.maximum(zero, lo), hi)
                x_ref[k, i] = zero
        # ---- convergence ----
        conv = (pr < tol) & (dr < tol)
        if use_kkt:
            feas = jnp.zeros((SUB, LANE), jnp.float32)
            for k in range(N):
                for r in range(nc):
                    feas = jnp.maximum(feas, jnp.abs(cs_ref[k, r]))
            stat = jnp.zeros((SUB, LANE), jnp.float32)
            for k in range(Kst):
                for i in range(nz):
                    s = gs_ref[k, i] + yb_ref[k, i]
                    if k < N:
                        for r in range(nc):
                            s = s + J_ref[k, r, i] * yd_ref[k, r]
                    if k > 0:
                        for r in range(nc):
                            s = s + K_ref[k - 1, r, i] * yd_ref[k - 1, r]
                    is_free = dlb_ref[k, i] != dub_ref[k, i]
                    stat = jnp.maximum(
                        stat, jnp.where(is_free, jnp.abs(s), 0.0)
                    )
            conv = conv | ((stat < tol_stat) & (feas < tol_feas))
        scale = jnp.sqrt(pr / jnp.maximum(dr, 1e-30))
        rho_new = jnp.clip(
            rho * jnp.clip(scale, 0.1, 10.0), rho_min, rho_max
        )
        rho_next = jnp.where(conv, rho, rho_new)
        pr_ref[0] = pr
        dr_ref[0] = dr
        return rnd + 1, jnp.all(conv), rho_next, it + jnp.float32(iters)

    # dynamic while (NOT fori + cond): single copy of the round body under
    # Mosaic and a true early exit — converged tiles stop looping instead
    # of running the remaining rounds as an identity branch
    init = (jnp.asarray(0, jnp.int32), jnp.asarray(False),
            rho0_ref[...], jnp.float32(0.0))
    _, done, rho, it = jax.lax.while_loop(
        lambda s: (s[0] < n_rounds) & ~s[1], do_round, init
    )
    it_ref[0] = jnp.broadcast_to(it, (SUB, LANE))
    # the solution is the accumulated recentered step
    for k in range(Kst):
        for i in range(nz):
            x_ref[k, i] = xtot_ref[k, i]


def _to_tiles(a, B):
    """[B, ...] → [..., B//LANE, LANE] (batch packed into last two dims)."""
    out = jnp.moveaxis(a, 0, -1)
    return out.reshape(out.shape[:-1] + (B // LANE, LANE))


def _from_tiles(a, B):
    out = a.reshape(a.shape[:-2] + (B,))
    return jnp.moveaxis(out, -1, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_rounds", "iters", "tol", "sigma", "alpha", "rho_eq_scale",
        "rho_min", "rho_max", "tol_stat", "tol_feas", "interpret",
    ),
)
def boxqp_solve_pallas(
    Hd, J, K, g, c, dlb, dub, rho,
    x, z_b, y_d, y_b,
    n_rounds: int,
    iters: int,
    tol: float,
    sigma: float,
    alpha: float,
    rho_eq_scale: float,
    rho_min: float,
    rho_max: float,
    tol_stat: float = 0.0,
    tol_feas: float = 0.0,
    interpret: bool = False,
):
    """FULL box-QP ADMM solve (all ρ rounds) in one pallas_call per 1024-lane
    chunk. Same argument layout as admm_round_pallas; additionally returns a
    per-lane iteration count. B is padded to a multiple of 1024 internally —
    padded lanes get a trivially feasible QP so they converge on round 1 and
    never hold the early-exit back."""
    B, Kst, nz, _ = Hd.shape
    N, nc = J.shape[1], J.shape[2]
    pad = (-B) % TILE_B
    if pad:
        def padb(a, identity=False):
            shape = (pad,) + a.shape[1:]
            if identity:
                extra = jnp.broadcast_to(jnp.eye(nz, dtype=a.dtype), shape)
            else:
                extra = jnp.zeros(shape, a.dtype)
            return jnp.concatenate([a, extra], axis=0)

        Hd = padb(Hd, identity=True)
        J, K, g, c, x, z_b, y_d, y_b = map(padb, (J, K, g, c, x, z_b, y_d, y_b))
        dlb = jnp.concatenate(
            [dlb, jnp.full((pad,) + dlb.shape[1:], -1.0, dlb.dtype)], axis=0
        )
        dub = jnp.concatenate(
            [dub, jnp.full((pad,) + dub.shape[1:], 1.0, dub.dtype)], axis=0
        )
        rho = jnp.concatenate([rho, jnp.ones((pad,), rho.dtype)], axis=0)
    Bp = B + pad
    n_sub = TILE_B // LANE

    if Bp > TILE_B:
        n_chunks = Bp // TILE_B
        chunked = jax.tree.map(
            lambda a: a.reshape((n_chunks, TILE_B) + a.shape[1:]),
            (Hd, J, K, g, c, dlb, dub, rho, x, z_b, y_d, y_b),
        )
        outs = jax.lax.map(
            lambda ch: boxqp_solve_pallas(
                *ch, n_rounds=n_rounds, iters=iters, tol=tol, sigma=sigma,
                alpha=alpha, rho_eq_scale=rho_eq_scale,
                rho_min=rho_min, rho_max=rho_max,
                tol_stat=tol_stat, tol_feas=tol_feas, interpret=interpret,
            ),
            chunked,
        )
        merged = jax.tree.map(
            lambda a: a.reshape((Bp,) + a.shape[2:]), outs
        )
        return jax.tree.map(lambda a: a[:B], merged)

    tiles = lambda a: _to_tiles(a, Bp)
    args = tuple(map(tiles, (Hd, J, K, g, c, dlb, dub, rho, x, z_b, y_d, y_b)))

    def spec_for(shape):
        lead = shape[:-2]
        zeros = (0,) * len(lead)
        return pl.BlockSpec(
            lead + (n_sub, LANE),
            lambda i, z=zeros: z + (i, 0),
            memory_space=pltpu.VMEM,
        )

    grid = (Bp // TILE_B,)
    out_shape = (
        jax.ShapeDtypeStruct((Kst, nz, Bp // LANE, LANE), Hd.dtype),      # x
        jax.ShapeDtypeStruct((Kst, nz, Bp // LANE, LANE), Hd.dtype),      # z_b
        jax.ShapeDtypeStruct((N, nc, Bp // LANE, LANE), Hd.dtype),        # y_d
        jax.ShapeDtypeStruct((Kst, nz, Bp // LANE, LANE), Hd.dtype),      # y_b
        jax.ShapeDtypeStruct((1, Bp // LANE, LANE), Hd.dtype),            # pr
        jax.ShapeDtypeStruct((1, Bp // LANE, LANE), Hd.dtype),            # dr
        jax.ShapeDtypeStruct((1, Bp // LANE, LANE), Hd.dtype),            # it
    )
    kernel = functools.partial(
        _solve_kernel, nz=nz, nc=nc, Kst=Kst, n_rounds=n_rounds, iters=iters,
        tol=tol, sigma=sigma, alpha=alpha, rho_eq_scale=rho_eq_scale,
        rho_min=rho_min, rho_max=rho_max, tol_stat=tol_stat, tol_feas=tol_feas,
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_for(a.shape) for a in args],
        out_specs=tuple(spec_for(s.shape) for s in out_shape),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((Kst, nz * (nz + 1) // 2, n_sub, LANE), Hd.dtype),  # Ld
            pltpu.VMEM((N, nz, nz, n_sub, LANE), Hd.dtype),                # Lo
            pltpu.VMEM((Kst, nz, n_sub, LANE), Hd.dtype),                  # xt
            pltpu.VMEM((Kst, nz, n_sub, LANE), Hd.dtype),                  # gs
            pltpu.VMEM((N, nc, n_sub, LANE), Hd.dtype),                    # cs
            pltpu.VMEM((Kst, nz, n_sub, LANE), Hd.dtype),                  # xtot
        ],
        interpret=interpret,
    )(*args)
    x_o, zb_o, yd_o, yb_o, pr_o, dr_o, it_o = outs
    untile = lambda a: _from_tiles(a, Bp)[:B]
    return (
        untile(x_o), untile(zb_o), untile(yd_o), untile(yb_o),
        untile(pr_o)[:, 0], untile(dr_o)[:, 0], untile(it_o)[:, 0],
    )


@functools.partial(
    jax.jit,
    static_argnames=("iters", "sigma", "alpha", "rho_eq_scale", "interpret"),
)
def admm_round_pallas(
    Hd, J, K, g, c, dlb, dub, rho,
    x, z_b, y_d, y_b,
    iters: int,
    sigma: float,
    alpha: float,
    rho_eq_scale: float,
    interpret: bool = False,
):
    """One ρ-round of the stage-QP ADMM for a batch of lanes.

    Hd [B,Kst,nz,nz], J/K [B,N,nc,nz], g [B,Kst,nz], c [B,N,nc],
    dlb/dub [B,Kst,nz], rho [B], states x/z_b/y_b [B,Kst,nz], y_d [B,N,nc].
    Returns (x', z_b', y_d', y_b', pr [B], dr [B]).
    B is padded to a multiple of 1024 internally.
    """
    B, Kst, nz, _ = Hd.shape
    N, nc = J.shape[1], J.shape[2]
    pad = (-B) % TILE_B
    if pad:
        def padb(a, identity=False):
            shape = (pad,) + a.shape[1:]
            if identity:
                extra = jnp.broadcast_to(jnp.eye(nz, dtype=a.dtype), shape)
            else:
                extra = jnp.zeros(shape, a.dtype)
            return jnp.concatenate([a, extra], axis=0)

        Hd = padb(Hd, identity=True)
        J, K, g, c, x, z_b, y_d, y_b = map(padb, (J, K, g, c, x, z_b, y_d, y_b))
        dlb = jnp.concatenate(
            [dlb, jnp.full((pad,) + dlb.shape[1:], -1.0, dlb.dtype)], axis=0
        )
        dub = jnp.concatenate(
            [dub, jnp.full((pad,) + dub.shape[1:], 1.0, dub.dtype)], axis=0
        )
        rho = jnp.concatenate([rho, jnp.ones((pad,), rho.dtype)], axis=0)
    Bp = B + pad
    n_sub = TILE_B // LANE

    # one TILE_B chunk per kernel launch: a multi-step grid would make the
    # pipeliner double-buffer the ~12 MB of inputs and overflow the ~16 MB
    # VMEM budget. lax.map serializes the launches (each is VMEM-saturating
    # anyway, so there is no parallelism to lose).
    if Bp > TILE_B:
        n_chunks = Bp // TILE_B
        chunked = jax.tree.map(
            lambda a: a.reshape((n_chunks, TILE_B) + a.shape[1:]),
            (Hd, J, K, g, c, dlb, dub, rho, x, z_b, y_d, y_b),
        )
        outs = jax.lax.map(
            lambda ch: admm_round_pallas(
                *ch, iters=iters, sigma=sigma, alpha=alpha,
                rho_eq_scale=rho_eq_scale, interpret=interpret,
            ),
            chunked,
        )
        merged = jax.tree.map(
            lambda a: a.reshape((Bp,) + a.shape[2:]), outs
        )
        return jax.tree.map(lambda a: a[:B], merged)

    tiles = lambda a: _to_tiles(a, Bp)
    args = tuple(map(tiles, (Hd, J, K, g, c, dlb, dub, rho, x, z_b, y_d, y_b)))

    def spec_for(shape):
        lead = shape[:-2]
        zeros = (0,) * len(lead)
        return pl.BlockSpec(
            lead + (n_sub, LANE),
            lambda i, z=zeros: z + (i, 0),
            memory_space=pltpu.VMEM,
        )

    grid = (Bp // TILE_B,)
    out_shape = (
        jax.ShapeDtypeStruct((Kst, nz, Bp // LANE, LANE), Hd.dtype),      # x
        jax.ShapeDtypeStruct((Kst, nz, Bp // LANE, LANE), Hd.dtype),      # z_b
        jax.ShapeDtypeStruct((N, nc, Bp // LANE, LANE), Hd.dtype),        # y_d
        jax.ShapeDtypeStruct((Kst, nz, Bp // LANE, LANE), Hd.dtype),      # y_b
        jax.ShapeDtypeStruct((1, Bp // LANE, LANE), Hd.dtype),            # pr
        jax.ShapeDtypeStruct((1, Bp // LANE, LANE), Hd.dtype),            # dr
    )
    kernel = functools.partial(
        _kernel, nz=nz, nc=nc, Kst=Kst, iters=iters,
        sigma=sigma, alpha=alpha, rho_eq_scale=rho_eq_scale,
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_for(a.shape) for a in args],
        out_specs=tuple(spec_for(s.shape) for s in out_shape),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((Kst, nz * (nz + 1) // 2, n_sub, LANE), Hd.dtype),  # Ld
            pltpu.VMEM((N, nz, nz, n_sub, LANE), Hd.dtype),                # Lo
            pltpu.VMEM((Kst, nz, n_sub, LANE), Hd.dtype),                  # xt
        ],
        interpret=interpret,
    )(*args)
    x_o, zb_o, yd_o, yb_o, pr_o, dr_o = outs
    untile = lambda a: _from_tiles(a, Bp)[:B]
    return (
        untile(x_o), untile(zb_o), untile(yd_o), untile(yb_o),
        untile(pr_o)[:, 0], untile(dr_o)[:, 0],
    )
