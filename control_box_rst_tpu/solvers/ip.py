"""Jitted primal-dual interior-point solver for stage NLPs.

Ref parity: the IPOPT backend (ref: src/optimization/include/corbo-optimization/
solver/nlp_solver_ipopt.h:49-120, src/solver/nlp_solver_ipopt.cpp:33-84, and the
TNLP adapter nlp_solver_ipopt_wrapper.h:41,73-91). The reference hands the NLP
to libipopt — sparse Jacobian structure/values, Lagrangian Hessian, MUMPS/MA27
linear solvers. Here the interior-point method itself is re-derived for the
canonical stage NLP so the whole solve is one jitted, vmappable program:

  min  f(W)
  s.t. c_k(w_k, w_{k+1}) = 0          (interval rows: defects + ties)
       rl ≤ r_k(w_k) ≤ ru             (general rows → slacks s, barrier)
       lb ≤ W ≤ ub                    (box rows → barrier)

TPU-first structure (vs IPOPT's general sparse KKT + MUMPS):
  * two-sided general rows become per-stage slacks with log barriers on both
    sides (IPOPT's own slack formulation) — the slack/bound-dual blocks are
    eliminated ANALYTICALLY, leaving a saddle system whose Hessian block
    H_hat = H + Σ_w + GᵀΣ_sG is block-diagonal per stage;
  * the equality (interval) rows are then condensed by a Schur complement
    S = A H_hat⁻¹ Aᵀ which is block-tridiagonal with nc×nc blocks — factored
    by the same batched block Cholesky as the SQP's ADMM (ops/btridiag.py);
  * the Fiacco-McCormick outer loop (monotone μ reduction, IPOPT's
    κ_μ/θ_μ schedule), the fraction-to-boundary rule, and the backtracking
    line search on the barrier ℓ1-merit all run inside one lax.while_loop —
    every candidate step length is evaluated in parallel;
  * per-lane convergence masks make `jax.vmap(ip_solve)` a batch solver with
    independent μ trajectories per problem (the reference solves one NLP at
    a time, nlp_solver_interface.h:105).

Equality general rows (rl == ru) use IPOPT's bound_relax_factor trick: the
slack bounds are relaxed by a dtype-scaled ε so every slack keeps an interior.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from control_box_rst_tpu.core.types import SolverStatus
from control_box_rst_tpu.ocp.problem import Trajectory
from control_box_rst_tpu.ocp.transcribe import TranscribedOCP
from control_box_rst_tpu.ops.btridiag import btridiag_cholesky, btridiag_solve
from control_box_rst_tpu.ops.smallmat import (
    inv_spd_small,
    mm_small,
    mm_small_nt,
    mv_small,
    mv_small_t,
)
from control_box_rst_tpu.utils.precision import f32_matmuls
from control_box_rst_tpu.utils.tree import pytree_dataclass, static_field


@pytree_dataclass
class IPConfig:
    """Interior-point options (defaults follow IPOPT's where they exist)."""

    max_iter: int = static_field(default=60)
    mu_init: float = static_field(default=1e-1)
    # μ schedule: μ⁺ = max(tol/10, min(κ_μ·μ, μ^θ_μ))  (IPOPT eq. 7)
    kappa_mu: float = static_field(default=0.2)
    theta_mu: float = static_field(default=1.5)
    kappa_eps: float = static_field(default=10.0)  # inner tol = κ_ε·μ
    tau_min: float = static_field(default=0.99)  # fraction-to-boundary floor
    # None → dtype-calibrated at solve time (same policy as SQPConfig)
    tol: float = static_field(default=None)
    # primal/dual regularization of the condensed KKT system
    reg_primal: float = static_field(default=None)  # None → dtype default
    reg_dual: float = static_field(default=None)
    ls_candidates: int = static_field(default=8)
    ls_c1: float = static_field(default=1e-4)
    merit_nu_init: float = static_field(default=10.0)
    psd_clamp: bool = static_field(default=False)
    # κ_Σ dual-consistency clip (IPOPT eq. 16)
    kappa_sigma: float = static_field(default=1e10)
    # initial-point push-off-bounds factor (IPOPT κ₁ = κ₂ = 0.01)
    bound_push: float = static_field(default=1e-2)


class IPResult(NamedTuple):
    traj: Trajectory
    W: jax.Array
    S: jax.Array  # general-row slacks [N+1, ng]
    y_dyn: jax.Array  # [N, nc]
    y_gen: jax.Array  # [N+1, ng]
    z_lw: jax.Array  # bound duals on W (lower/upper) [N+1, nz]
    z_uw: jax.Array
    iterations: jax.Array
    objective: jax.Array
    stat_res: jax.Array
    feas_res: jax.Array
    comp_res: jax.Array
    mu: jax.Array
    status: jax.Array  # SolverStatus int32


def _psd_clamp(H: jax.Array, floor: float = 1e-8) -> jax.Array:
    w, V = jnp.linalg.eigh(H)
    w = jnp.maximum(w, floor)
    return jnp.einsum("...ij,...j,...kj->...ik", V, w, V)


@f32_matmuls
def ip_solve(
    ocp: TranscribedOCP,
    traj0: Trajectory,
    cfg: Optional[IPConfig] = None,
) -> IPResult:
    """Solve the transcribed OCP by a primal-dual interior-point method.

    Pure and jittable; `jax.vmap(lambda x0: ip_solve(...))` batches lanes
    with independent barrier trajectories.
    """
    if cfg is None:
        cfg = IPConfig()
    N, nz, nc, ng = ocp.N, ocp.nz, ocp.nc, ocp.ng

    traj0 = ocp.apply_boundary(traj0)
    W_init = ocp.pack(traj0)
    dtype = W_init.dtype
    f64 = dtype == jnp.float64

    tol = cfg.tol if cfg.tol is not None else (1e-8 if f64 else 5e-4)
    reg_p = cfg.reg_primal if cfg.reg_primal is not None else (1e-8 if f64 else 1e-6)
    reg_d = cfg.reg_dual if cfg.reg_dual is not None else (1e-10 if f64 else 1e-7)
    eps_relax = 1e-8 if f64 else 1e-5  # bound_relax_factor for rl == ru rows
    tiny = jnp.asarray(1e-30 if f64 else 1e-30, dtype)

    pin = ocp.fixed_mask().astype(dtype)
    free = 1.0 - pin
    lb, ub = ocp.w_bounds()

    # finite-bound masks on FREE variables only (pins never get barriers)
    mwL = (free > 0) & jnp.isfinite(lb)
    mwU = (free > 0) & jnp.isfinite(ub)
    # box rows with lb == ub on a free variable: relax symmetrically
    box_eq = mwL & mwU & (lb == ub)
    lb = jnp.where(box_eq, lb - eps_relax, lb)
    ub = jnp.where(box_eq, ub + eps_relax, ub)

    # slack bounds from the general rows (values refresh each iterate; the
    # bounds rl/ru are constant arrays produced by the transcription)
    _, rl, ru = ocp.general_rows(W_init)
    msL = jnp.isfinite(rl)
    msU = jnp.isfinite(ru)
    gen_eq = msL & msU & (rl == ru)
    sl = jnp.where(gen_eq, rl - eps_relax, rl)
    su = jnp.where(gen_eq, ru + eps_relax, ru)
    # rows with no finite bound at all (padding) get unit Σ_s so the
    # analytic elimination stays regular; their multipliers remain 0
    s_inactive = (~msL) & (~msU)

    # ---- initial point: push primal variables off their bounds ----------
    def push_inside(v, lo, hi, mL, mU):
        both = mL & mU
        width = jnp.where(both, hi - lo, jnp.asarray(1.0, dtype))
        pl_ = jnp.minimum(
            cfg.bound_push * jnp.maximum(1.0, jnp.abs(jnp.where(mL, lo, 0.0))),
            0.45 * width,
        )
        pu_ = jnp.minimum(
            cfg.bound_push * jnp.maximum(1.0, jnp.abs(jnp.where(mU, hi, 0.0))),
            0.45 * width,
        )
        v = jnp.where(mL, jnp.maximum(v, lo + pl_), v)
        v = jnp.where(mU, jnp.minimum(v, hi - pu_), v)
        return v

    W0 = push_inside(W_init, lb, ub, mwL, mwU)
    W0 = jnp.where(pin > 0, W_init, W0)
    r0, _, _ = ocp.general_rows(W0)
    S0 = push_inside(r0, sl, su, msL, msU)

    mu0 = jnp.asarray(cfg.mu_init, dtype)

    def z_init(v, lo, hi, mL, mU, mu):
        zl = jnp.where(mL, mu / jnp.maximum(v - lo, 1e-8), 0.0).astype(dtype)
        zu = jnp.where(mU, mu / jnp.maximum(hi - v, 1e-8), 0.0).astype(dtype)
        return jnp.clip(zl, 0.0, 1e8), jnp.clip(zu, 0.0, 1e8)

    z_lw0, z_uw0 = z_init(W0, lb, ub, mwL, mwU, mu0)
    z_ls0, z_us0 = z_init(S0, sl, su, msL, msU, mu0)
    y_dyn0 = jnp.zeros((N, nc), dtype)
    y_gen0 = jnp.zeros((N + 1, ng), dtype)

    eye_nz = jnp.eye(nz, dtype=dtype)
    eye_nc = jnp.eye(nc, dtype=dtype)
    backtracks = 0.5 ** jnp.arange(cfg.ls_candidates, dtype=dtype)

    def safe_dist(v, lo, hi, mL, mU):
        """Distances to bounds, 1.0 where the bound is absent (mask applied
        downstream — avoids inf/NaN arithmetic)."""
        dL = jnp.where(mL, v - lo, 1.0)
        dU = jnp.where(mU, hi - v, 1.0)
        return dL, dU

    def barrier_merit(W, S, mu, nu):
        """φ_μ = f - μ·Σ logs + ν·(‖c‖₁ + ‖r - s‖₁); returns (φ, infeas)."""
        f = ocp.objective_from_W(W)
        dLw, dUw = safe_dist(W, lb, ub, mwL, mwU)
        logs = jnp.sum(jnp.where(mwL, jnp.log(jnp.maximum(dLw, tiny)), 0.0))
        logs += jnp.sum(jnp.where(mwU, jnp.log(jnp.maximum(dUw, tiny)), 0.0))
        if ng:
            dLs, dUs = safe_dist(S, sl, su, msL, msU)
            logs += jnp.sum(jnp.where(msL, jnp.log(jnp.maximum(dLs, tiny)), 0.0))
            logs += jnp.sum(jnp.where(msU, jnp.log(jnp.maximum(dUs, tiny)), 0.0))
        c = ocp.interval_residuals(W)
        infeas = jnp.sum(jnp.abs(c))
        if ng:
            r, _, _ = ocp.general_rows(W)
            infeas += jnp.sum(jnp.abs(r - S))
        return f - mu * logs + nu * infeas, infeas

    # hoist constant structure (LTI + fixed dt / quadratic cost) out of the
    # Newton loop — same invariant as sqp_solve (SURVEY §3.5 analogue)
    hoist_JK = ocp.lti_structure
    hoist_H = ocp.constant_hessian

    def _mask_H(Hd):
        if cfg.psd_clamp or not getattr(ocp.cost, "convex", True):
            Hd = _psd_clamp(Hd)
        return Hd * free[:, None, :] * free[:, :, None]

    if hoist_JK:
        J_c, K_c, _ = ocp.interval_jacobians(W0)
        Jm_c = J_c * free[:-1, None, :]
        Km_c = K_c * free[1:, None, :]
    if hoist_H:
        Hm_c = _mask_H(ocp.cost_hessian_blocks(W0))

    def iteration(state):
        (W, S, y, yg, z_lw, z_uw, z_ls, z_us, mu, nu, it,
         stat0, feas0, comp0, done, diverged) = state

        # ---- linearize (exact AD, batched per stage) ----
        if hoist_JK:
            Jm, Km = Jm_c, Km_c
            c = ocp.interval_residuals(W)
        else:
            J, K, c = ocp.interval_jacobians(W)
            Jm = J * free[:-1, None, :]
            Km = K * free[1:, None, :]
        grad = ocp.cost_gradient(W)
        Hm = Hm_c if hoist_H else _mask_H(ocp.cost_hessian_blocks(W))
        r, _, _ = ocp.general_rows(W)
        G = ocp.general_row_jacobians(W)

        # pin masking: zero columns/rows of fixed variables
        Gm = G * free[:, None, :]
        gm = grad * free

        # ---- primal-dual Σ terms (bound duals eliminated) ----
        dLw, dUw = safe_dist(W, lb, ub, mwL, mwU)
        sig_w = jnp.where(mwL, z_lw / dLw, 0.0) + jnp.where(mwU, z_uw / dUw, 0.0)
        if ng:
            dLs, dUs = safe_dist(S, sl, su, msL, msU)
            sig_s = (
                jnp.where(msL, z_ls / dLs, 0.0)
                + jnp.where(msU, z_us / dUs, 0.0)
                + jnp.where(s_inactive, 1.0, 0.0)
                + reg_p
            )

        # ---- stationarity residuals (true KKT, for E and for rhs) ----
        AtY = jnp.zeros((N + 1, nz), dtype)
        AtY = AtY.at[:-1].add(mv_small_t(Jm, y))
        AtY = AtY.at[1:].add(mv_small_t(Km, y))
        GtYg = mv_small_t(Gm, yg) if ng else 0.0
        rW = (gm + AtY + GtYg - jnp.where(mwL, z_lw, 0.0)
              + jnp.where(mwU, z_uw, 0.0)) * free
        # barrier-condensed version (z's replaced by μ/d along the Newton
        # direction): rhs of the reduced W row
        rW_bar = (gm + AtY + GtYg
                  - jnp.where(mwL, mu / dLw, 0.0)
                  + jnp.where(mwU, mu / dUw, 0.0)) * free
        if ng:
            rs = -yg - jnp.where(msL, z_ls, 0.0) + jnp.where(msU, z_us, 0.0)
            rs_bar = (-yg - jnp.where(msL, mu / dLs, 0.0)
                      + jnp.where(msU, mu / dUs, 0.0))
            rg = r - S  # general-row equality r(W) - s = 0

        # ---- condensed stage Hessian H_hat and its inverse ----
        H_hat = Hm + jax.vmap(jnp.diag)(sig_w * free) + reg_p * eye_nz[None]
        H_hat = H_hat + pin[:, :, None] * pin[:, None, :] * eye_nz[None]
        if ng:
            H_hat = H_hat + mm_small_nt(
                jnp.swapaxes(Gm, -1, -2) * sig_s[:, None, :],
                jnp.swapaxes(Gm, -1, -2),
            )  # GᵀΣ_sG  ([N+1, nz, ng]·diag·[ng, nz])
        Hinv = inv_spd_small(H_hat)

        # reduced rhs for the W row
        rhs1 = -rW_bar
        if ng:
            rhs1 = rhs1 - mv_small_t(Gm, sig_s * rg + rs_bar) * free

        # ---- Schur complement over interval rows (block-tridiagonal) ----
        JH = mm_small(Jm, Hinv[:-1])  # [N, nc, nz]
        KH = mm_small(Km, Hinv[1:])
        S_D = mm_small_nt(JH, Jm) + mm_small_nt(KH, Km) + reg_d * eye_nc[None]
        S_O = mm_small_nt(KH[:-1], Jm[1:])  # [N-1, nc, nc]
        Hr = mv_small(Hinv, rhs1)
        rhs_y = mv_small(Jm, Hr[:-1]) + mv_small(Km, Hr[1:]) + c
        Ld, Lo = btridiag_cholesky(S_D, S_O)
        dy = btridiag_solve(Ld, Lo, rhs_y)

        # back-substitute ΔW, Δy_gen, Δs, Δz
        AtDy = jnp.zeros((N + 1, nz), dtype)
        AtDy = AtDy.at[:-1].add(mv_small_t(Jm, dy))
        AtDy = AtDy.at[1:].add(mv_small_t(Km, dy))
        dW = mv_small(Hinv, rhs1 - AtDy) * free
        if ng:
            dyg = sig_s * (mv_small(Gm, dW) + rg) + rs_bar
            dS = (dyg - rs_bar) / sig_s
        dz_lw = jnp.where(mwL, -z_lw + mu / dLw - (z_lw / dLw) * dW, 0.0)
        dz_uw = jnp.where(mwU, -z_uw + mu / dUw + (z_uw / dUw) * dW, 0.0)
        if ng:
            dz_ls = jnp.where(msL, -z_ls + mu / dLs - (z_ls / dLs) * dS, 0.0)
            dz_us = jnp.where(msU, -z_us + mu / dUs + (z_us / dUs) * dS, 0.0)

        # ---- fraction-to-boundary step limits (IPOPT eq. 15) ----
        tau = jnp.maximum(cfg.tau_min, 1.0 - mu)

        def max_step(d, dist, mask):
            # largest α with v + α·d keeping τ of the distance to the bound
            lim = jnp.where(mask & (d < 0), -tau * dist / jnp.minimum(d, -tiny), 1.0)
            return jnp.min(lim)

        a_p = jnp.minimum(
            max_step(dW, dLw, mwL), max_step(-dW, dUw, mwU)
        )
        if ng:
            a_p = jnp.minimum(
                a_p, jnp.minimum(max_step(dS, dLs, msL), max_step(-dS, dUs, msU))
            )
        a_z = jnp.minimum(
            max_step(dz_lw, z_lw, mwL), max_step(dz_uw, z_uw, mwU)
        )
        if ng:
            a_z = jnp.minimum(
                a_z, jnp.minimum(max_step(dz_ls, z_ls, msL),
                                 max_step(dz_us, z_us, msU))
            )
        a_p = jnp.clip(a_p, 0.0, 1.0)
        a_z = jnp.clip(a_z, 0.0, 1.0)

        # ---- backtracking Armijo on the barrier ℓ1 merit ----
        y_max = jnp.max(jnp.abs(dy + y))
        if ng:
            y_max = jnp.maximum(y_max, jnp.max(jnp.abs(yg + dyg)) if ng else 0.0)
        nu_new = jnp.maximum(nu, 1.2 * y_max + 1e-3)
        phi0, infeas0 = barrier_merit(W, S, mu, nu_new)

        def phi_smooth(Wv, Sv):
            v, _ = barrier_merit(Wv, Sv, mu, 0.0)
            return v

        dS_dir = dS if ng else jnp.zeros_like(S)
        _, dphi = jax.jvp(phi_smooth, (W, S), (dW, dS_dir))
        dirderiv = dphi - nu_new * infeas0

        def merit_at(f_bt):
            a = a_p * f_bt
            phi, _ = barrier_merit(W + a * dW, S + a * dS_dir, mu, nu_new)
            return phi

        phis = jax.vmap(merit_at)(backtracks)
        armijo = phis <= phi0 + cfg.ls_c1 * a_p * backtracks * jnp.minimum(
            dirderiv, 0.0
        )
        any_ok = jnp.any(armijo)
        idx = jnp.argmax(armijo)
        alpha = a_p * jnp.where(any_ok, backtracks[idx], backtracks[-1])

        W_new = W + alpha * dW
        S_new = S + alpha * dS_dir
        y_new = y + alpha * dy
        yg_new = yg + alpha * dyg if ng else yg
        z_lw_new = z_lw + a_z * dz_lw
        z_uw_new = z_uw + a_z * dz_uw
        z_ls_new = z_ls + a_z * dz_ls if ng else z_ls
        z_us_new = z_us + a_z * dz_us if ng else z_us

        # κ_Σ dual-consistency clip (IPOPT eq. 16)
        dLw_n, dUw_n = safe_dist(W_new, lb, ub, mwL, mwU)
        ks = cfg.kappa_sigma

        def z_clip(z, d, mask):
            return jnp.where(
                mask, jnp.clip(z, mu / (ks * d), ks * mu / d), z
            )

        z_lw_new = z_clip(z_lw_new, dLw_n, mwL)
        z_uw_new = z_clip(z_uw_new, dUw_n, mwU)
        if ng:
            dLs_n, dUs_n = safe_dist(S_new, sl, su, msL, msU)
            z_ls_new = z_clip(z_ls_new, dLs_n, msL)
            z_us_new = z_clip(z_us_new, dUs_n, msU)

        # ---- KKT error at the new iterate ----
        stat = jnp.max(jnp.abs(rW))  # stationarity at linearization point
        feas = jnp.max(jnp.abs(c))
        if ng:
            feas = jnp.maximum(feas, jnp.max(jnp.abs(rg)) if ng else 0.0)
            stat = jnp.maximum(stat, jnp.max(jnp.abs(rs)) if ng else 0.0)
        comp_w = jnp.where(mwL, dLw * z_lw, 0.0), jnp.where(mwU, dUw * z_uw, 0.0)
        comp0_terms = [jnp.max(jnp.abs(comp_w[0])), jnp.max(jnp.abs(comp_w[1]))]
        comp_mu_terms = [
            jnp.max(jnp.abs(comp_w[0] - jnp.where(mwL, mu, 0.0))),
            jnp.max(jnp.abs(comp_w[1] - jnp.where(mwU, mu, 0.0))),
        ]
        if ng:
            cs = jnp.where(msL, dLs * z_ls, 0.0), jnp.where(msU, dUs * z_us, 0.0)
            comp0_terms += [jnp.max(jnp.abs(cs[0])), jnp.max(jnp.abs(cs[1]))]
            comp_mu_terms += [
                jnp.max(jnp.abs(cs[0] - jnp.where(msL, mu, 0.0))),
                jnp.max(jnp.abs(cs[1] - jnp.where(msU, mu, 0.0))),
            ]
        comp = jnp.max(jnp.stack(comp0_terms))
        comp_mu = jnp.max(jnp.stack(comp_mu_terms))

        E0 = jnp.maximum(jnp.maximum(stat, feas), comp)
        Emu = jnp.maximum(jnp.maximum(stat, feas), comp_mu)

        converged = E0 < tol
        # μ update once the barrier subproblem is solved (IPOPT eq. 7)
        inner_done = Emu <= cfg.kappa_eps * mu
        mu_next = jnp.maximum(
            tol / 10.0,
            jnp.minimum(cfg.kappa_mu * mu, mu ** cfg.theta_mu),
        )
        mu_new = jnp.where(inner_done & ~converged, mu_next, mu)

        # numerical breakdown (e.g. infeasible problem → diverging duals):
        # keep the last finite iterate and flag the lane (ref SolverStatus
        # semantics, nlp_solver_interface.h — the reference's IPOPT wrapper
        # maps Ipopt failure codes the same way)
        bad = ~(
            jnp.all(jnp.isfinite(W_new))
            & jnp.all(jnp.isfinite(y_new))
            & jnp.isfinite(E0)
        )

        # freeze converged/diverged lanes (lockstep under vmap)
        def keep(old, new):
            return jnp.where(done | bad, old, new)

        return (
            keep(W, W_new), keep(S, S_new), keep(y, y_new), keep(yg, yg_new),
            keep(z_lw, z_lw_new), keep(z_uw, z_uw_new),
            keep(z_ls, z_ls_new), keep(z_us, z_us_new),
            keep(mu, mu_new), keep(nu, nu_new),
            jnp.where(done, it, it + 1),
            keep(stat0, stat), keep(feas0, feas), keep(comp0, comp),
            done | (converged & ~bad), diverged | (bad & ~done),
        )

    def cond(state):
        it, done, diverged = state[10], state[14], state[15]
        return (it < cfg.max_iter) & (~done) & (~diverged)

    big = jnp.asarray(jnp.inf, dtype)
    init = (
        W0, S0, y_dyn0, y_gen0, z_lw0, z_uw0, z_ls0, z_us0,
        mu0, jnp.asarray(cfg.merit_nu_init, dtype),
        jnp.asarray(0, jnp.int32), big, big, big,
        jnp.asarray(False), jnp.asarray(False),
    )
    (W, S, y, yg, z_lw, z_uw, z_ls, z_us, mu, nu, it,
     stat, feas, comp, done, diverged) = jax.lax.while_loop(
        cond, iteration, init
    )

    status = jnp.where(
        diverged,
        jnp.asarray(int(SolverStatus.INFEASIBLE), jnp.int32),
        jnp.where(
            done,
            jnp.asarray(int(SolverStatus.CONVERGED), jnp.int32),
            jnp.asarray(int(SolverStatus.EARLY_TERMINATED), jnp.int32),
        ),
    )
    traj = ocp.unpack(W)
    return IPResult(
        traj=traj, W=W, S=S, y_dyn=y, y_gen=yg, z_lw=z_lw, z_uw=z_uw,
        iterations=it, objective=ocp.objective_from_W(W),
        stat_res=stat, feas_res=feas, comp_res=comp, mu=mu, status=status,
    )
