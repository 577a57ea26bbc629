"""Stage-structured ADMM QP solver (OSQP-style, block-tridiagonal direct solve).

Ref parity: replaces the OSQP backend (ref: src/optimization/include/
corbo-optimization/solver/qp_solver_osqp.h:47, src/solver/qp_solver_osqp.cpp:
85-179) and the two-side-bounded linear form interface the reference prepares
for QP/SQP backends (optimization_problem_interface.h:569,614). Same ADMM
scheme as OSQP (splitting, over-relaxation α, per-row ρ with the equality-row
boost); the sparse CSC + QDLDL factorization is replaced by the block-
tridiagonal Cholesky of ops/btridiag.py — factor once per QP, O(N·nz³),
then O(N·nz²) per ADMM iteration.

QP canonical form (δ = step on stage variables w_k = [x;u;dt]):

  min  Σ ½ δ_kᵀ Hd_k δ_k + g_kᵀ δ_k
  s.t. J_k δ_k + K_k δ_{k+1} = -c_k          (interval rows: defects + ties)
       rl_k - r_k ≤ G_k δ_k ≤ ru_k - r_k     (general rows)
       dlb_k ≤ δ_k ≤ dub_k                   (box rows, pins have [0,0])

Everything is fully batched: `vmap` of `solve` turns each stage operation
into [B, …] tensor ops; each lane carries its own ADMM state and termination
is lockstep-masked.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from control_box_rst_tpu.ops.btridiag import btridiag_cholesky, btridiag_solve
from control_box_rst_tpu.ops.btridiag_cr import bcr_factor, bcr_solve
from control_box_rst_tpu.ops.smallmat import mm_small_tn, mv_small, mv_small_t
from control_box_rst_tpu.utils.tree import pytree_dataclass, static_field


@pytree_dataclass
class StageQP:
    """Data of one stage-structured QP (shapes: [N+1,…] stages, [N,…] intervals)."""

    Hd: jax.Array  # [N+1, nz, nz]
    g: jax.Array  # [N+1, nz]
    J: jax.Array  # [N, nc, nz]
    K: jax.Array  # [N, nc, nz]
    c: jax.Array  # [N, nc]
    G: jax.Array  # [N+1, ng, nz]
    gl: jax.Array  # [N+1, ng]  (= rl - r)
    gu: jax.Array  # [N+1, ng]
    dlb: jax.Array  # [N+1, nz]
    dub: jax.Array  # [N+1, nz]


@pytree_dataclass
class QPConfig:
    sigma: float = static_field(default=1e-6)
    rho: float = static_field(default=0.1)
    rho_eq_scale: float = static_field(default=1e3)
    alpha: float = static_field(default=1.6)
    # None → shape-calibrated at solve time: 200 for box-only QPs, 600 when
    # general (nonlinear-constraint) rows are present — ADMM needs a larger
    # budget there, and an under-solved QP stalls the outer SQP loop.
    max_iter: int = static_field(default=None)  # total ADMM iteration budget
    # None → dtype-calibrated at solve time (f64 → 1e-8, f32 → 1e-5)
    tol: float = static_field(default=None)
    check_every: int = static_field(default=10)
    # ρ adaptation (OSQP §5.2): every `iters_per_round` iterations, rescale ρ
    # by sqrt(pr/dr) (clipped) and refactorize. Rounds = max_iter / round.
    iters_per_round: int = static_field(default=50)
    rho_min: float = static_field(default=1e-4)
    rho_max: float = static_field(default=1e4)
    # block-tridiagonal linear solver:
    #   'scan' — Thomas-ordering block Cholesky (ops/btridiag.py). Best
    #     throughput for batched solves (the batch axis already fills the
    #     chip; measured 15.7k vs 8.3k solves/s at B=1024 on TPU v5e).
    #   'bcr'  — block cyclic reduction (ops/btridiag_cr.py), log₂-depth.
    #     ~6× lower latency for SINGLE solves (B=1: 33 ms vs 192 ms on the
    #     same chip) — use for real-time per-step MPC.
    linsolver: str = static_field(default="scan")
    # QP round execution backend:
    #   'xla'   — lax loops over XLA ops (works everywhere; default)
    #   'fused' — whole ρ-rounds in ONE Pallas kernel (VMEM-resident state,
    #     ops/pallas/admm_kernel.py). Requires ng == 0 and f32; dispatched
    #     through custom_vmap, so it only engages under a single vmap level
    #     (make_batched_solver enables it on TPU). Falls back to 'xla'
    #     per-lane when called unbatched.
    # None = auto: make_batched_solver picks 'fused' on TPU, else 'xla'.
    backend: str = static_field(default=None)
    # (tol_stat, tol_feas): when set (one-shot LTI path, solvers/sqp.py),
    # the full-solve rounds loop ALSO exits once the exact NLP KKT
    # residuals of the LTI QP are below these — the solver-level criterion,
    # typically far looser than the ADMM pr/dr `tol` — so the kernel stops
    # the moment the outer SQP loop would have declared convergence.
    kkt_tols: Tuple[float, float] = static_field(default=None)


class QPSolution(NamedTuple):
    delta: jax.Array  # [N+1, nz]
    y_dyn: jax.Array  # [N, nc]
    y_gen: jax.Array  # [N+1, ng]
    y_box: jax.Array  # [N+1, nz]
    iters: jax.Array  # int32
    prim_res: jax.Array
    dual_res: jax.Array


class QPWarmStart(NamedTuple):
    delta: jax.Array
    y_dyn: jax.Array
    y_gen: jax.Array
    y_box: jax.Array


def zero_warm_start(N: int, nz: int, nc: int, ng: int, dtype=jnp.float64) -> QPWarmStart:
    return QPWarmStart(
        delta=jnp.zeros((N + 1, nz), dtype),
        y_dyn=jnp.zeros((N, nc), dtype),
        y_gen=jnp.zeros((N + 1, ng), dtype),
        y_box=jnp.zeros((N + 1, nz), dtype),
    )


def _assemble_M(qp: StageQP, cfg: QPConfig, rho_eq, rho_gen, rho_box):
    """Block-tridiagonal normal matrix M = Hd + σI + Aᵀdiag(ρ)A."""
    Np1, nz, _ = qp.Hd.shape
    eye = jnp.eye(nz, dtype=qp.Hd.dtype)
    D = qp.Hd + cfg.sigma * eye[None]
    # dynamics rows: ρ_eq (JᵀJ at k, KᵀK at k+1, JᵀK off-diag)
    # tiny contractions as broadcast-multiply-sum (smallmat.mm_small_tn):
    # einsum/dot_general here lowers to padded MXU convolutions — measured
    # 43% of total solve time at 0.008% FLOPs utilization on TPU v5e
    JtJ = mm_small_tn(qp.J, qp.J)
    KtK = mm_small_tn(qp.K, qp.K)
    D = D.at[:-1].add(rho_eq * JtJ)
    D = D.at[1:].add(rho_eq * KtK)
    O = rho_eq * mm_small_tn(qp.J, qp.K)  # [N, nz, nz]
    # general rows: per-row ρ
    if qp.G.shape[1] > 0:
        D = D + mm_small_tn(qp.G * rho_gen[..., None], qp.G)
    # box rows: diagonal per-row ρ
    D = D + jax.vmap(jnp.diag)(rho_box)
    return D, O


def _round_reference_fn(cfg: QPConfig, iters: int):
    """Unbatched single-ρ-round implementation matching the Pallas kernel
    exactly (z_d ≡ -c eliminated; pr/dr computed once on the final iterate)."""
    sigma, alpha, res = cfg.sigma, cfg.alpha, cfg.rho_eq_scale

    def _reference(Hd, J, K, g, c, dlb, dub, rho, x, z_b, y_d, y_b):
        dtype = g.dtype
        Np1, nz = g.shape
        box_is_eq = dlb == dub
        rho_eq = rho * res
        rho_box = jnp.where(box_is_eq, rho_eq, rho).astype(dtype)
        D, O = _assemble_M(
            StageQP(Hd=Hd, g=g, J=J, K=K, c=c,
                    G=jnp.zeros((Np1, 0, nz), dtype),
                    gl=jnp.zeros((Np1, 0), dtype), gu=jnp.zeros((Np1, 0), dtype),
                    dlb=dlb, dub=dub),
            cfg, rho_eq, jnp.zeros((Np1, 0), dtype), rho_box,
        )
        if cfg.linsolver == "bcr":
            fac = bcr_factor(D, O)
            solve_M = lambda rhs: bcr_solve(fac, rhs)
        else:
            Ld, Lo = btridiag_cholesky(D, O)
            solve_M = lambda rhs: btridiag_solve(Ld, Lo, rhs)

        def At(vd, vb):
            out = jnp.zeros((Np1, nz), dtype)
            out = out.at[:-1].add(mv_small_t(J, vd))
            out = out.at[1:].add(mv_small_t(K, vd))
            return out + vb

        def body(_, st):
            x, z_b, y_d, y_b, _ = st
            vd = -rho_eq * c - y_d
            rhs = sigma * x - g + At(vd, rho_box * z_b - y_b)
            x_t = solve_M(rhs)
            x = alpha * x_t + (1.0 - alpha) * x
            ax = mv_small(J, x_t[:-1]) + mv_small(K, x_t[1:])
            v_d = alpha * ax + (1.0 - alpha) * (-c)
            y_d = y_d + rho_eq * (v_d + c)
            v_b = alpha * x_t + (1.0 - alpha) * z_b
            z_new = jnp.clip(v_b + y_b / rho_box, dlb, dub)
            y_b = y_b + rho_box * (v_b - z_new)
            return x, z_new, y_d, y_b, x_t

        x, z_b, y_d, y_b, x_t = jax.lax.fori_loop(
            0, iters, body, (x, z_b, y_d, y_b, jnp.zeros_like(x))
        )
        # residuals on the final iterate (same semantics as the kernel)
        ax = mv_small(J, x_t[:-1]) + mv_small(K, x_t[1:])
        pr = jnp.maximum(
            jnp.max(jnp.abs(ax + c)), jnp.max(jnp.abs(x_t - z_b))
        )
        v_b = alpha * x_t + (1.0 - alpha) * z_b
        z_new = jnp.clip(v_b + y_b / rho_box, dlb, dub)
        dr = jnp.max(jnp.abs(rho_box * (z_new - z_b)))
        return x, z_b, y_d, y_b, pr, dr

    return _reference


def _make_fused_round(cfg: QPConfig, iters: int, tol):
    """custom_vmap wrapper: per-lane reference implementation + a batched
    rule that dispatches the whole batch to the fused Pallas kernel (or, for
    small batches where the kernel's 1024-lane tile would be mostly padding,
    the vmapped reference)."""
    from control_box_rst_tpu.ops.pallas.admm_kernel import admm_round_pallas

    sigma, alpha, res = cfg.sigma, cfg.alpha, cfg.rho_eq_scale
    _reference = _round_reference_fn(cfg, iters)

    fused_round = jax.custom_batching.custom_vmap(_reference)

    @fused_round.def_vmap
    def _rule(axis_size, in_batched, Hd, J, K, g, c, dlb, dub, rho,
              x, z_b, y_d, y_b):
        def bc(a, batched):
            return a if batched else jnp.broadcast_to(
                a[None], (axis_size,) + a.shape
            )
        args = [bc(a, b) for a, b in zip(
            (Hd, J, K, g, c, dlb, dub, rho, x, z_b, y_d, y_b), in_batched
        )]
        # small batches: the 1024-lane tile would be >90% padding and B=1
        # XLA programs lower poorly around an embedded kernel — the vmapped
        # reference (which honors cfg.linsolver, e.g. the low-latency 'bcr')
        # is faster below ~1/16 tile occupancy
        if axis_size < 64:
            outs = jax.vmap(_reference)(*args)
        else:
            interpret = jax.devices()[0].platform not in ("tpu", "axon")
            outs = admm_round_pallas(
                *args, iters=iters, sigma=sigma, alpha=alpha,
                rho_eq_scale=res, interpret=interpret,
            )
        return outs, tuple(True for _ in outs)

    return fused_round


def _make_fused_solve(cfg: QPConfig, max_iter: int, tol):
    """custom_vmap wrapper for the FULL box-QP solve: every ρ-adaptation
    round — assemble, block-tridiagonal factor, `iters_per_round` ADMM
    iterations, per-lane ρ rescale, early exit — runs inside ONE Pallas
    kernel launch (ops/pallas/admm_kernel.py:_solve_kernel). The per-lane
    reference below is the identical rounds loop in XLA ops; it serves as
    the unbatched/small-batch/non-TPU fallback and the kernel's oracle
    (tests/test_admm_pallas.py)."""
    from control_box_rst_tpu.ops.pallas.admm_kernel import boxqp_solve_pallas

    iters = cfg.iters_per_round
    n_rounds = max(1, -(-max_iter // iters))
    round_ref = _round_reference_fn(cfg, iters)
    kkt = cfg.kkt_tols
    tol_stat = float(kkt[0]) if kkt is not None else 0.0
    tol_feas = float(kkt[1]) if kkt is not None else 0.0

    def _reference(Hd, J, K, g, c, dlb, dub, rho, x, z_b, y_d, y_b):
        dtype = g.dtype
        big = jnp.asarray(jnp.inf, dtype)

        # Rounds RECENTER between ADMM bursts: the accumulated step xtot is
        # absorbed into the linear data (g += H·x, c += A·x, bounds shift)
        # and the primal restarts at 0. Algebraically a no-op for the QP,
        # but essential in f32: it shrinks every carried magnitude with the
        # remaining error, so the achievable absolute residual floor drops
        # each round — a single non-recentered ADMM chain stalls at
        # ~ρ_eq·ε_f32·‖data‖ (measured: stat pinned at 1e-2 while the
        # recentered outer loop reaches 2e-5 on the same problem).
        def body(state):
            xtot, g_s, c_s, x, z_b, y_d, y_b, rho, rnd, it, pr, dr, _ = state
            dlb_s, dub_s = dlb - xtot, dub - xtot
            x, z_b, y_d, y_b, pr, dr = round_ref(
                Hd, J, K, g_s, c_s, dlb_s, dub_s, rho, x, z_b, y_d, y_b
            )
            # ---- recenter ----
            xtot = xtot + x
            c_s = c_s + mv_small(J, x[:-1]) + mv_small(K, x[1:])
            g_s = g_s + jnp.einsum("kij,kj->ki", Hd, x)
            z_b = jnp.clip(jnp.zeros_like(x), dlb - xtot, dub - xtot)
            x = jnp.zeros_like(x)
            # ---- convergence ----
            converged = (pr < tol) & (dr < tol)
            if kkt is not None:
                # exact NLP KKT residuals at the recentered iterate
                # (mirrors solvers/sqp.py's outer-loop test exactly)
                feas = jnp.max(jnp.abs(c_s))
                gl = g_s + y_b
                gl = gl.at[:-1].add(mv_small_t(J, y_d))
                gl = gl.at[1:].add(mv_small_t(K, y_d))
                is_free = dlb != dub
                stat = jnp.max(jnp.where(is_free, jnp.abs(gl), 0.0))
                converged = converged | (
                    (stat < tol_stat) & (feas < tol_feas)
                )
            scale = jnp.sqrt(pr / jnp.maximum(dr, 1e-30))
            rho_new = jnp.clip(
                rho * jnp.clip(scale, 0.1, 10.0), cfg.rho_min, cfg.rho_max
            )
            rho_new = jnp.where(converged, rho, rho_new)
            return (
                xtot, g_s, c_s, x, z_b, y_d, y_b, rho_new, rnd + 1,
                it + jnp.float32(iters), pr, dr, converged,
            )

        def cond(state):
            rnd, conv = state[8], state[12]
            return (rnd < n_rounds) & ~conv

        init = (
            jnp.zeros_like(x), g, c, x, z_b, y_d, y_b, rho,
            jnp.asarray(0, jnp.int32), jnp.float32(0.0), big, big,
            jnp.asarray(False),
        )
        out = jax.lax.while_loop(cond, body, init)
        xtot, g_s, c_s, x, z_b, y_d, y_b, rho, rnd, it, pr, dr, _ = out
        return xtot, z_b, y_d, y_b, pr, dr, it

    fused_solve = jax.custom_batching.custom_vmap(_reference)

    @fused_solve.def_vmap
    def _rule(axis_size, in_batched, Hd, J, K, g, c, dlb, dub, rho,
              x, z_b, y_d, y_b):
        def bc(a, batched):
            return a if batched else jnp.broadcast_to(
                a[None], (axis_size,) + a.shape
            )
        args = [bc(a, b) for a, b in zip(
            (Hd, J, K, g, c, dlb, dub, rho, x, z_b, y_d, y_b), in_batched
        )]
        # single-solve latency through the kernel beats the XLA while_loop
        # even at 1/1024 tile occupancy (one launch vs hundreds of small
        # ops), so the kernel engages for EVERY batch size on TPU
        interpret = jax.devices()[0].platform not in ("tpu", "axon")
        outs = boxqp_solve_pallas(
            *args, n_rounds=n_rounds, iters=iters, tol=float(tol),
            sigma=cfg.sigma, alpha=cfg.alpha, rho_eq_scale=cfg.rho_eq_scale,
            rho_min=cfg.rho_min, rho_max=cfg.rho_max,
            tol_stat=tol_stat, tol_feas=tol_feas, interpret=interpret,
        )
        return outs, tuple(True for _ in outs)

    return fused_solve, _reference


def solve_stage_qp(
    qp: StageQP,
    cfg: QPConfig,
    warm: Optional[QPWarmStart] = None,
) -> QPSolution:
    """OSQP-style ADMM on the stage QP with ρ adaptation.

    Outer rounds (while_loop): factor M with the current ρ, run
    `iters_per_round` fixed ADMM iterations (fori_loop), rescale ρ by
    √(pr/dr) (OSQP §5.2 rule) and refactorize — until tolerances or the
    iteration budget. Unscaled duals y are carried, so ρ changes need no
    dual rescaling."""
    tol = cfg.tol if cfg.tol is not None else (
        1e-8 if qp.Hd.dtype == jnp.float64 else 1e-5)
    max_iter = cfg.max_iter if cfg.max_iter is not None else (
        200 if qp.G.shape[1] == 0 else 600)
    Np1, nz = qp.g.shape
    N = Np1 - 1
    nc = qp.c.shape[1]
    ng = qp.G.shape[1]
    dtype = qp.g.dtype

    gen_is_eq = jnp.isfinite(qp.gl) & (qp.gl == qp.gu)
    box_is_eq = qp.dlb == qp.dub

    def family_rhos(rho):
        rho_eq = rho * cfg.rho_eq_scale
        rho_gen = jnp.where(gen_is_eq, rho_eq, rho).astype(dtype)
        rho_box = jnp.where(box_is_eq, rho_eq, rho).astype(dtype)
        return rho_eq, rho_gen, rho_box

    def A_mul(x):
        d = mv_small(qp.J, x[:-1]) + mv_small(qp.K, x[1:])
        ggg = mv_small(qp.G, x) if ng else jnp.zeros((Np1, 0), dtype)
        return d, ggg, x

    def At_mul(vd, vg, vb):
        out = jnp.zeros((Np1, nz), dtype)
        out = out.at[:-1].add(mv_small_t(qp.J, vd))
        out = out.at[1:].add(mv_small_t(qp.K, vd))
        if ng:
            out = out + mv_small_t(qp.G, vg)
        return out + vb

    l_dyn = -qp.c
    u_dyn = -qp.c

    if warm is None:
        warm = zero_warm_start(N, nz, nc, ng, dtype)
    x = warm.delta
    y_d, y_g, y_b = warm.y_dyn, warm.y_gen, warm.y_box
    z_d, z_g, z_b = A_mul(x)
    z_d = jnp.clip(z_d, l_dyn, u_dyn)
    if ng:
        z_g = jnp.clip(z_g, qp.gl, qp.gu)
    z_b = jnp.clip(z_b, qp.dlb, qp.dub)

    big = jnp.asarray(jnp.inf, dtype)
    n_rounds = max(1, -(-max_iter // cfg.iters_per_round))

    use_fused = cfg.backend == "fused" and ng == 0 and dtype == jnp.float32
    if use_fused:
        fused_solve, _ = _make_fused_solve(cfg, max_iter, tol)
        x, z_b, y_d, y_b, pr, dr, it = fused_solve(
            qp.Hd, qp.J, qp.K, qp.g, qp.c, qp.dlb, qp.dub,
            jnp.asarray(cfg.rho, dtype), x, z_b, y_d, y_b,
        )
        return QPSolution(
            delta=x, y_dyn=y_d, y_gen=y_g, y_box=y_b,
            iters=it.astype(jnp.int32), prim_res=pr, dual_res=dr,
        )

    def round_body(state):
        x, z_d, z_g, z_b, y_d, y_g, y_b, rho, rnd, it, pr, dr = state
        rho_eq, rho_gen, rho_box = family_rhos(rho)
        D, O = _assemble_M(qp, cfg, rho_eq, rho_gen, rho_box)
        if cfg.linsolver == "bcr":
            fac = bcr_factor(D, O)
            solve_M = lambda rhs: bcr_solve(fac, rhs)
        elif cfg.linsolver == "scan":
            Ld, Lo = btridiag_cholesky(D, O)
            solve_M = lambda rhs: btridiag_solve(Ld, Lo, rhs)
        else:
            raise KeyError(
                f"unknown linsolver {cfg.linsolver!r}; have ['scan', 'bcr']"
            )

        def admm_iter(_, s):
            x, z_d, z_g, z_b, y_d, y_g, y_b, it, pr, dr = s
            rhs = (
                cfg.sigma * x
                - qp.g
                + At_mul(
                    rho_eq * z_d - y_d, rho_gen * z_g - y_g, rho_box * z_b - y_b
                )
            )
            x_t = solve_M(rhs)
            a = cfg.alpha
            Ax_d, Ax_g, Ax_b = A_mul(x_t)
            x_new = a * x_t + (1 - a) * x

            def family(Ax, z, y, rho_f, lo, hi):
                v = a * Ax + (1 - a) * z
                z_new = jnp.clip(v + y / rho_f, lo, hi)
                y_new = y + rho_f * (v - z_new)
                return z_new, y_new

            z_d2, y_d2 = family(Ax_d, z_d, y_d, rho_eq, l_dyn, u_dyn)
            if ng:
                z_g2, y_g2 = family(Ax_g, z_g, y_g, rho_gen, qp.gl, qp.gu)
            else:
                z_g2, y_g2 = z_g, y_g
            z_b2, y_b2 = family(Ax_b, z_b, y_b, rho_box, qp.dlb, qp.dub)

            # residuals (OSQP §3.4)
            pr_new = jnp.maximum(
                jnp.max(jnp.abs(Ax_d - z_d2)),
                jnp.maximum(
                    jnp.max(jnp.abs(Ax_g - z_g2)) if ng else 0.0,
                    jnp.max(jnp.abs(Ax_b - z_b2)),
                ),
            )
            dz = At_mul(
                rho_eq * (z_d2 - z_d),
                rho_gen * (z_g2 - z_g),
                rho_box * (z_b2 - z_b),
            )
            dr_new = jnp.max(jnp.abs(dz))
            return (
                x_new, z_d2, z_g2, z_b2, y_d2, y_g2, y_b2, it + 1, pr_new, dr_new
            )

        inner = (x, z_d, z_g, z_b, y_d, y_g, y_b, it, pr, dr)
        inner = jax.lax.fori_loop(0, cfg.iters_per_round, admm_iter, inner)
        x, z_d, z_g, z_b, y_d, y_g, y_b, it, pr, dr = inner

        # ρ adaptation: balance primal vs dual residual (OSQP §5.2)
        scale = jnp.sqrt(pr / jnp.maximum(dr, 1e-30))
        rho_new = jnp.clip(
            rho * jnp.clip(scale, 0.1, 10.0), cfg.rho_min, cfg.rho_max
        )
        converged = (pr < tol) & (dr < tol)
        rho_new = jnp.where(converged, rho, rho_new)
        return (x, z_d, z_g, z_b, y_d, y_g, y_b, rho_new, rnd + 1, it, pr, dr)

    def cond(state):
        rnd, pr, dr = state[8], state[10], state[11]
        return (rnd < n_rounds) & ((pr > tol) | (dr > tol))

    init = (
        x, z_d, z_g, z_b, y_d, y_g, y_b,
        jnp.asarray(cfg.rho, dtype),
        jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32), big, big,
    )
    out = jax.lax.while_loop(cond, round_body, init)
    x, z_d, z_g, z_b, y_d, y_g, y_b, rho, rnd, it, pr, dr = out
    return QPSolution(
        delta=x, y_dyn=y_d, y_gen=y_g, y_box=y_b, iters=it, prim_res=pr, dual_res=dr
    )


def dense_qp_oracle(qp: StageQP, cfg: QPConfig = None):
    """Dense active-set-free oracle: solve the equality-constrained QP with
    inequality handling via a simple projected solve — FOR TESTS ONLY.

    This materializes the full KKT system like the reference's
    ignore-structure problem (hyper_graph_optimization_problem_ignore_
    structure.h:34) and solves the *equality-only* QP (interval rows +
    pinned box rows) densely. General rows/box inequalities are ignored, so
    compare only on problems where they are inactive."""
    Np1, nz = qp.g.shape
    N = Np1 - 1
    nc = qp.c.shape[1]
    n = Np1 * nz
    H = jnp.zeros((n, n), qp.g.dtype)
    for k in range(Np1):
        H = H.at[k * nz : (k + 1) * nz, k * nz : (k + 1) * nz].set(qp.Hd[k])
    g = qp.g.reshape(-1)
    # equality rows: dynamics (+ ties); pins handled as large diagonal penalty
    A = jnp.zeros((N * nc, n), qp.g.dtype)
    for k in range(N):
        A = A.at[k * nc : (k + 1) * nc, k * nz : (k + 1) * nz].set(qp.J[k])
        A = A.at[k * nc : (k + 1) * nc, (k + 1) * nz : (k + 2) * nz].set(qp.K[k])
    b = (-qp.c).reshape(-1)
    pin = (qp.dlb == qp.dub).reshape(-1)
    bigpen = 1e10
    H = H + bigpen * jnp.diag(pin.astype(qp.g.dtype))
    m = N * nc
    KKT = jnp.zeros((n + m, n + m), qp.g.dtype)
    KKT = KKT.at[:n, :n].set(H + 1e-12 * jnp.eye(n))
    KKT = KKT.at[:n, n:].set(A.T)
    KKT = KKT.at[n:, :n].set(A)
    sol = jnp.linalg.solve(KKT, jnp.concatenate([-g, b]))
    delta = sol[:n].reshape(Np1, nz)
    lam = sol[n:].reshape(N, nc)
    return delta, lam
