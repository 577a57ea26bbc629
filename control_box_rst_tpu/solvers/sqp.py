"""Jitted SQP solver for stage NLPs.

The single solver that replaces the reference's whole backend stack
(SURVEY.md §2.2 note): LevenbergMarquardtDense/Sparse (LSQ penalty mode —
see solvers/lm.py), IPOPT (general NLP mode), and OSQP (QP subproblems —
solvers/stage_qp.py). Structure:

  linearize (exact AD, batched per stage)
    → stage QP (block-tridiagonal ADMM, warm-started)
    → ℓ1-merit backtracking line search (all candidate steps evaluated
      in parallel — a TPU-friendly replacement for sequential backtracking)
    → KKT residual check, per-lane convergence mask

Ref anchors: the SQP substrate the reference prepares but never ships
(`computeSparseJacobianTwoSideBoundedLinearFormAndHessianLagrangian`,
hyper_graph_optimization_problem_edge_based.cpp:4969), solver status
(nlp_solver_interface.h:67-116), vertex backup/restore during line search
(vertex_interface.h:162-169 — here: trajectories are immutable, no backup
stack needed).

Everything is shape-static: `jax.vmap(lambda x0: sqp_solve(...))` yields
thousands of independent MPC solves per chip, each with its own convergence
state (the batched benchmark axis of SURVEY.md §2.7).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from control_box_rst_tpu.core.types import SolverStatus
from control_box_rst_tpu.utils.precision import f32_matmuls
from control_box_rst_tpu.ocp.problem import Trajectory
from control_box_rst_tpu.ocp.transcribe import TranscribedOCP
from control_box_rst_tpu.solvers.stage_qp import (
    QPConfig,
    QPWarmStart,
    StageQP,
    solve_stage_qp,
)
from control_box_rst_tpu.utils.tree import pytree_dataclass, static_field


@pytree_dataclass
class SQPConfig:
    max_iter: int = static_field(default=30)
    qp: QPConfig = static_field(default=None)
    # None → dtype-calibrated at solve time: f64 → (1e-6, 1e-7);
    # f32 (the TPU production path) → (5e-4, 2e-5). The reference's
    # tolerances assume CPU doubles; blindly reusing them under f32 makes
    # correct solutions report "not converged" (and zero-control gating).
    tol_stat: float = static_field(default=None)
    tol_feas: float = static_field(default=None)
    ls_candidates: int = static_field(default=8)
    ls_c1: float = static_field(default=1e-4)
    merit_nu_init: float = static_field(default=10.0)
    psd_clamp: bool = static_field(default=False)
    # proximal damping λ‖δ‖² added to the QP Hessian diagonal — stabilizes
    # degenerate problems (e.g. non-uniform minimum time, SURVEY.md §7(e))
    prox: float = static_field(default=0.0)
    # Maratos-watchdog arming threshold: the full-step rescue (see the line
    # search) only fires when the CURRENT iterate's ℓ1 infeasibility is
    # already below this — the stall it repairs is a near-solution
    # phenomenon, and far from feasibility the conservative minimum step
    # must stay in charge
    rescue_infeas_max: float = static_field(default=1e-3)

    def __post_init__(self):
        if self.qp is None:
            object.__setattr__(self, "qp", QPConfig())


class SQPResult(NamedTuple):
    traj: Trajectory
    W: jax.Array
    y_dyn: jax.Array
    y_gen: jax.Array
    y_box: jax.Array
    iterations: jax.Array
    objective: jax.Array
    stat_res: jax.Array
    feas_res: jax.Array
    status: jax.Array  # SolverStatus int32
    qp_iters: jax.Array


class SQPWarmStart(NamedTuple):
    W: jax.Array
    y_dyn: jax.Array
    y_gen: jax.Array
    y_box: jax.Array


def _psd_clamp(H: jax.Array, floor: float = 1e-8) -> jax.Array:
    w, V = jnp.linalg.eigh(H)
    w = jnp.maximum(w, floor)
    return jnp.einsum("...ij,...j,...kj->...ik", V, w, V)


def _merit(ocp: TranscribedOCP, W, lb, ub, nu, free):
    """ℓ1 merit φ = f + ν·infeas. Box violations are counted on FREE
    entries only: pinned entries (x0 row, fixed-xf components, stage-N
    dummy u/dt, fixed-dt columns) are equalities maintained by
    construction, and the dummy slots sit OUTSIDE the broadcast bounds
    (e.g. the stage-N dt dummy is 0 vs dt bounds [0.1, 0.1]) — counting
    them adds a CONSTANT, irreducible infeasibility that skews dirderiv by
    −ν·const and demands a per-step merit decrease (c1·ν·const·α) that no
    step near the optimum can deliver: every candidate gets rejected and
    the iteration creeps at the minimum step forever (the round-5 VdP-MS
    stall — it looked like the Maratos effect but was this accounting
    bug)."""
    f = ocp.objective_from_W(W)
    c = ocp.interval_residuals(W)
    r, rl, ru = ocp.general_rows(W)
    viol_gen = jnp.maximum(0.0, rl - r) + jnp.maximum(0.0, r - ru)
    viol_box = (jnp.maximum(0.0, lb - W) + jnp.maximum(0.0, W - ub)) * free
    infeas = jnp.sum(jnp.abs(c)) + jnp.sum(viol_gen) + jnp.sum(viol_box)
    return f + nu * infeas, infeas


@f32_matmuls
def sqp_solve(
    ocp: TranscribedOCP,
    traj0: Trajectory,
    cfg: Optional[SQPConfig] = None,
    warm: Optional[SQPWarmStart] = None,
) -> SQPResult:
    """Solve the transcribed OCP starting from traj0. Pure & jittable."""
    if cfg is None:
        cfg = SQPConfig()
    N, nz, nc, ng = ocp.N, ocp.nz, ocp.nc, ocp.ng

    traj0 = ocp.apply_boundary(traj0)
    W0 = ocp.pack(traj0)
    dtype = W0.dtype

    tol_stat = cfg.tol_stat if cfg.tol_stat is not None else (
        1e-6 if dtype == jnp.float64 else 5e-4)
    tol_feas = cfg.tol_feas if cfg.tol_feas is not None else (
        1e-7 if dtype == jnp.float64 else 2e-5)

    pin = ocp.fixed_mask().astype(dtype)
    free = 1.0 - pin
    lb, ub = ocp.w_bounds()
    # clamp ±inf to a large finite value (OSQP's OSQP_INFTY trick): keeps
    # every arithmetic path finite — some accelerator backends mis-handle
    # inf in fused select/clip chains, and inf−inf/0·inf NaNs are ruled out
    BIG = jnp.asarray(1e8, dtype)
    lb = jnp.maximum(lb, -BIG)
    ub = jnp.minimum(ub, BIG)

    if warm is None:
        y_dyn0 = jnp.zeros((N, nc), dtype)
        y_gen0 = jnp.zeros((N + 1, ng), dtype)
        y_box0 = jnp.zeros((N + 1, nz), dtype)
    else:
        W0 = warm.W
        y_dyn0, y_gen0, y_box0 = warm.y_dyn, warm.y_gen, warm.y_box

    alphas = 0.5 ** jnp.arange(cfg.ls_candidates, dtype=dtype)

    # ---- hoist constant structure out of the iteration loop ----
    # LTI + fixed dt: J, K are constant in W; quadratic cost: Hd constant.
    # (ref analogue: `new_structure=false` CSC pattern reuse, SURVEY §3.5 —
    # here the values are constant too, so the per-iteration relinearization
    # and Hessian evaluation disappear entirely.)
    hoist_JK = ocp.lti_structure
    hoist_H = ocp.constant_hessian

    def _mask_H(Hd):
        if cfg.psd_clamp or not getattr(ocp.cost, "convex", True):
            Hd = _psd_clamp(Hd)
        if cfg.prox:
            Hd = Hd + cfg.prox * jnp.eye(nz, dtype=dtype)[None]
        return Hd * free[:, None, :] * free[:, :, None]

    if hoist_JK:
        # LTI ⇒ J, K are the same at every W; evaluate them at a
        # state-zeroed reference trajectory (keeping u/dt from traj0 —
        # J/K depend on dt). Under vmap this matters a lot: in the batched
        # solver x0 enters only through traj0.X, so the reference point is
        # an UNBATCHED value and the whole linearization (and constant
        # Hessian) is traced once per BATCH instead of once per lane —
        # vmap only batches computations that consume batched inputs.
        # (With a fully batched warm start, e.g. the closed-loop carry,
        # this degrades gracefully to the per-lane evaluation.)
        traj_ref = traj0.replace(
            X=jnp.zeros((N + 1, ocp.nx), dtype)
        )
        W_jac = ocp.pack(traj_ref)
        J_c, K_c, _ = ocp.interval_jacobians(W_jac)
        Jm_c = J_c * free[:-1, None, :]
        Km_c = K_c * free[1:, None, :]
    if hoist_H:
        Hm_c = _mask_H(ocp.cost_hessian_blocks(W_jac if hoist_JK else W0))

    # ---- one-shot LTI fast path (single fused kernel launch) ----
    # LTI dynamics + constant quadratic Hessian + box-only constraints make
    # the NLP itself a convex QP: the first linearization is exact, the QP
    # minimizer IS the NLP minimizer (full Newton step, no line search, no
    # outer loop). The fused Pallas kernel runs the ENTIRE solve — every
    # ρ-adaptation round, with per-tile early exit — in one launch
    # (ops/pallas/admm_kernel.py:_solve_kernel).
    #
    # Budget: the one-shot must match the TOTAL ADMM work the outer SQP
    # loop would spend (max_iter SQP iterations × the per-QP budget), not a
    # single QP's budget — the round-3 regression (converged_frac 1.0 →
    # 0.002) came from giving it 12 iterations total. Early exit makes the
    # larger cap cheap for easy lanes.
    #
    # Correctness contract (ref: OSQP's solve-to-tolerance contract,
    # qp_solver_osqp.cpp:179, and SolverStatus semantics,
    # nlp_solver_interface.h:67-116): the one-shot result is checked
    # against the EXACT NLP KKT residuals, and lanes that miss tolerance
    # fall through into the standard outer SQP loop below (their `done`
    # flag starts False) — the one-shot can only accelerate, never degrade.
    one_shot = (
        hoist_JK and hoist_H and ng == 0
        and cfg.qp.backend == "fused" and dtype == jnp.float32
    )
    it0 = jnp.asarray(0, jnp.int32)
    qp_iters0 = jnp.asarray(0, jnp.int32)
    done0 = jnp.asarray(False)
    stat0 = feas0 = jnp.asarray(jnp.inf, dtype)
    if one_shot:
        per_qp_budget = cfg.qp.max_iter if cfg.qp.max_iter is not None else 200
        qp_cfg_os = cfg.qp.replace(
            max_iter=cfg.max_iter * per_qp_budget,
            # in-kernel early exit on the SOLVER-level KKT criterion — the
            # per-round ADMM pr/dr `tol` alone is far stricter than what
            # the outer loop would require, and grinding it wastes rounds
            kkt_tols=(float(tol_stat), float(tol_feas)),
        )
        c0 = ocp.interval_residuals(W0)
        gm = ocp.cost_gradient(W0) * free
        qp = StageQP(
            Hd=Hm_c, g=gm, J=Jm_c, K=Km_c, c=c0,
            G=jnp.zeros((N + 1, 0, nz), dtype),
            gl=jnp.zeros((N + 1, 0), dtype), gu=jnp.zeros((N + 1, 0), dtype),
            dlb=jnp.where(free > 0, lb - W0, 0.0),
            dub=jnp.where(free > 0, ub - W0, 0.0),
        )
        sol = solve_stage_qp(
            qp, qp_cfg_os,
            warm=QPWarmStart(
                delta=jnp.zeros_like(W0), y_dyn=y_dyn0, y_gen=y_gen0,
                y_box=y_box0,
            ),
        )
        W_os = W0 + sol.delta * free
        # exact KKT residuals of the NLP at the solution
        gm1 = ocp.cost_gradient(W_os) * free
        grad_lag = gm1.at[:-1].add(jnp.einsum("kri,kr->ki", Jm_c, sol.y_dyn))
        grad_lag = grad_lag.at[1:].add(jnp.einsum("kri,kr->ki", Km_c, sol.y_dyn))
        grad_lag = grad_lag + sol.y_box * free
        stat0 = jnp.max(jnp.abs(grad_lag * free))
        feas0 = jnp.max(jnp.abs(ocp.interval_residuals(W_os)))
        done0 = (stat0 < tol_stat) & (feas0 < tol_feas)
        # accept the one-shot iterate as the outer loop's starting point
        # either way: for converged lanes it is final (frozen by `done`);
        # for the rest it is a warm start strictly better than traj0.
        W0 = W_os
        y_dyn0, y_box0 = sol.y_dyn, sol.y_box
        it0 = jnp.asarray(1, jnp.int32)
        qp_iters0 = sol.iters

    def iteration(state):
        (W0_it, y_dyn0_it, y_gen0_it, y_box0_it, nu, it, stat_res0, feas_res0,
         done, qp_tot) = state
        W, y_dyn, y_gen, y_box = W0_it, y_dyn0_it, y_gen0_it, y_box0_it

        # ---- linearize (exact AD, all stages batched) ----
        # (the axon adjacent-row miscompilation is handled at the source:
        # ocp.transcribe.adjacent_rows barriers every stage-pair vmap)
        if hoist_JK:
            Jm, Km = Jm_c, Km_c
            c = ocp.interval_residuals(W)
        else:
            J, K, c = ocp.interval_jacobians(W)
            Jm = J * free[:-1, None, :]
            Km = K * free[1:, None, :]
        grad = ocp.cost_gradient(W)
        Hm = Hm_c if hoist_H else _mask_H(ocp.cost_hessian_blocks(W))
        r, rl, ru = ocp.general_rows(W)
        G = ocp.general_row_jacobians(W)

        # ---- pin masking: zero columns of fixed variables ----
        Gm = G * free[:, None, :]
        gm = grad * free

        dlb = jnp.where(free > 0, lb - W, 0.0)
        dub = jnp.where(free > 0, ub - W, 0.0)

        qp = StageQP(
            Hd=Hm, g=gm, J=Jm, K=Km, c=c, G=Gm,
            gl=jnp.maximum(rl - r, -BIG), gu=jnp.minimum(ru - r, BIG),
            dlb=dlb, dub=dub,
        )
        sol = solve_stage_qp(
            qp, cfg.qp,
            warm=QPWarmStart(
                delta=jnp.zeros_like(W), y_dyn=y_dyn, y_gen=y_gen, y_box=y_box
            ),
        )
        delta = sol.delta * free

        # ---- ℓ1 merit line search (parallel candidates) ----
        y_max = jnp.maximum(
            jnp.max(jnp.abs(sol.y_dyn)),
            jnp.max(jnp.abs(sol.y_gen)) if ng else 0.0,
        )
        # ν tracks the current dual scale both ways: it must dominate the
        # duals for the ℓ1 merit to be exact, but a ν stuck at the scale of
        # the FIRST iterations' duals makes the merit constraint-phobic
        # near the solution (any residual infeasibility is over-penalized
        # in dirderiv, tightening the Armijo demand). Geometric decay
        # toward the live dual scale keeps the exactness property while
        # forgetting stale magnitudes.
        nu_new = jnp.maximum(1.2 * y_max + 1e-3, 0.5 * nu)
        phi0, infeas0 = _merit(ocp, W, lb, ub, nu_new, free)
        dirderiv = jnp.sum(grad * delta) - nu_new * infeas0

        def merit_at(a):
            return _merit(ocp, W + a * delta, lb, ub, nu_new, free)

        phis, infeas_c = jax.vmap(merit_at)(alphas)
        ok = phis <= phi0 + cfg.ls_c1 * alphas * jnp.minimum(dirderiv, 0.0)
        any_ok = jnp.any(ok)
        idx = jnp.argmax(ok)  # first True = largest α
        # Maratos rescue: near a solution with curved constraints the full
        # Newton step slightly increases BOTH objective and ‖c‖, so every
        # Armijo candidate fails and the forced minimum step creeps at
        # (1-α_min)/iteration (the classic Maratos effect; the textbook
        # remedies are a second-order correction or a watchdog — this is
        # the watchdog form: accept the FULL step whenever the merit test
        # fails across the board yet the trial point stays essentially
        # feasible, i.e. the rejection is second-order noise, not a real
        # feasibility loss).
        rescue = (
            (~any_ok)
            & (infeas0 <= cfg.rescue_infeas_max)
            & (infeas_c[0] <= jnp.maximum(10.0 * infeas0, tol_feas))
        )
        alpha = jnp.where(
            any_ok, alphas[idx], jnp.where(rescue, alphas[0], alphas[-1])
        )
        W_new = W + alpha * delta

        # ---- KKT residuals (at current linearization, QP multipliers) ----
        grad_lag = gm.at[:-1].add(jnp.einsum("kri,kr->ki", Jm, sol.y_dyn))
        grad_lag = grad_lag.at[1:].add(jnp.einsum("kri,kr->ki", Km, sol.y_dyn))
        if ng:
            grad_lag = grad_lag + jnp.einsum("kri,kr->ki", Gm, sol.y_gen)
        grad_lag = grad_lag + sol.y_box * free
        stat = jnp.max(jnp.abs(grad_lag * free))
        viol = jnp.maximum(0.0, rl - r) + jnp.maximum(0.0, r - ru)
        feas = jnp.maximum(jnp.max(jnp.abs(c)), jnp.max(viol) if ng else 0.0)
        step_norm = jnp.max(jnp.abs(alpha * delta))

        converged = ((stat < tol_stat) & (feas < tol_feas)) | (
            (step_norm < 1e-12) & (feas < tol_feas)
        )
        # freeze converged lanes: under vmap the while_loop runs lockstep
        # until ALL lanes finish, and extra iterations must not move a lane
        # that already satisfied its KKT tolerances
        W_new = jnp.where(done, W0_it, W_new)
        y_dyn_new = jnp.where(done, y_dyn0_it, sol.y_dyn)
        y_gen_new = jnp.where(done, y_gen0_it, sol.y_gen)
        y_box_new = jnp.where(done, y_box0_it, sol.y_box)
        stat = jnp.where(done, stat_res0, stat)
        feas = jnp.where(done, feas_res0, feas)
        it_new = jnp.where(done, it, it + 1)
        return (
            W_new, y_dyn_new, y_gen_new, y_box_new, nu_new,
            it_new, stat, feas, converged | done, qp_tot + sol.iters,
        )

    def cond(state):
        it, done = state[5], state[8]
        return (it < cfg.max_iter) & (~done)

    init = (
        W0, y_dyn0, y_gen0, y_box0,
        jnp.asarray(cfg.merit_nu_init, dtype),
        it0, stat0, feas0,
        done0, qp_iters0,
    )
    (W, y_dyn, y_gen, y_box, nu, it, stat, feas, done, qp_tot) = jax.lax.while_loop(
        cond, iteration, init
    )

    status = jnp.where(
        done,
        jnp.asarray(int(SolverStatus.CONVERGED), jnp.int32),
        jnp.asarray(int(SolverStatus.EARLY_TERMINATED), jnp.int32),
    )
    traj = ocp.unpack(W)
    return SQPResult(
        traj=traj, W=W, y_dyn=y_dyn, y_gen=y_gen, y_box=y_box,
        iterations=it, objective=ocp.objective_from_W(W),
        stat_res=stat, feas_res=feas, status=status, qp_iters=qp_tot,
    )
