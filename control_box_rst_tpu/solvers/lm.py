"""Levenberg-Marquardt solver (LSQ penalty mode).

Ref parity: LevenbergMarquardtDense / LevenbergMarquardtSparse
(ref: src/optimization/include/corbo-optimization/solver/
levenberg_marquardt_dense.h:62, levenberg_marquardt_sparse.h:54-66;
algorithm in src/solver/levenberg_marquardt_sparse.cpp:44-230):

  residual r(z) = [ lsq-objective residuals ;
                    √w_eq · c_eq ; √w_ineq · max(0, c_ineq) ;
                    √w_b · bound violation ]
  H = JᵀJ + μI,  Δ = -H⁻¹ Jᵀ r,  trust-region-style μ update (ρ-gain test,
  ν-doubling on rejection), penalty weights grown by `weight_adapt_factor`
  up to a max (levenberg_marquardt_sparse.h:54-66).

TPU-first redesign: residuals are stage-blocked (r_k couples w_k, w_{k+1}),
so JᵀJ is block-tridiagonal — the Eigen SimplicialLLT/CHOLMOD factorization
becomes ops/btridiag's batched Cholesky; Jacobians are exact `jacfwd` blocks
instead of the reference's central FD (edge_interface.cpp:55). The whole
solver jits and vmaps (batched LM across scenarios).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from control_box_rst_tpu.core.types import SolverStatus
from control_box_rst_tpu.ocp.problem import Trajectory
from control_box_rst_tpu.ocp.transcribe import TranscribedOCP, adjacent_rows
from control_box_rst_tpu.ops.btridiag import btridiag_cholesky, btridiag_solve
from control_box_rst_tpu.utils.tree import pytree_dataclass, static_field
from control_box_rst_tpu.utils.precision import f32_matmuls


@pytree_dataclass
class LMConfig:
    max_iter: int = static_field(default=50)
    mu_init: float = static_field(default=1e-4)
    tol_chi2_rel: float = static_field(default=1e-10)
    tol_step: float = static_field(default=1e-10)
    # penalty weights (ref levenberg_marquardt_sparse.h:54-66)
    weight_eq: float = static_field(default=2.0)
    weight_ineq: float = static_field(default=2.0)
    weight_bounds: float = static_field(default=2.0)
    weight_adapt_factor: float = static_field(default=10.0)
    weight_max: float = static_field(default=1e8)
    # unweighted dynamics-defect tolerance for convergence
    feas_tol: float = static_field(default=1e-6)


class LMResult(NamedTuple):
    traj: Trajectory
    W: jax.Array
    chi2: jax.Array
    iterations: jax.Array
    feas_res: jax.Array
    status: jax.Array


def _residual_dims(ocp: TranscribedOCP):
    # probe the lsq residual lengths once (static): stage and terminal
    x = jnp.zeros((ocp.nx,))
    u = jnp.zeros((ocp.nu,))
    r = ocp.cost.stage_residual(x, u, jnp.zeros(()), x, u)
    rf = ocp.cost.final_residual(x, x)
    return int(r.shape[0]), int(rf.shape[0])


@f32_matmuls
def lm_solve(
    ocp: TranscribedOCP,
    traj0: Trajectory,
    cfg: Optional[LMConfig] = None,
) -> LMResult:
    """Levenberg-Marquardt on the stage NLP. Pure & jittable."""
    if cfg is None:
        cfg = LMConfig()
    N, nz, nx, nu, ng = ocp.N, ocp.nz, ocp.nx, ocp.nu, ocp.ng
    n_lsq_stage, n_final = _residual_dims(ocp)
    # stage and terminal blocks share the row layout; the lsq slot holds the
    # stage residual on interval rows and the terminal-cost residual on the
    # terminal row (padded to a common width)
    n_lsq = max(n_lsq_stage, n_final)

    traj0 = ocp.apply_boundary(traj0)
    W0 = ocp.pack(traj0)
    dtype = W0.dtype
    pin = ocp.fixed_mask().astype(dtype)
    free = 1.0 - pin
    lb, ub = ocp.w_bounds()
    # finite-infinity clamp (see solvers/sqp.py): keep all arithmetic finite
    BIG = jnp.asarray(1e8, dtype)
    lb = jnp.maximum(lb, -BIG)
    ub = jnp.minimum(ub, BIG)

    nr = n_lsq + ocp.nc + ng + nz  # rows per interval block

    # general-row bounds are W-independent (0 / ±inf patterns): precompute
    if ng:
        _, g_rl, g_ru = ocp.general_rows(W0)
    else:
        g_rl = g_ru = jnp.zeros((N + 1, 0), dtype)

    def _gen_viol(k, v):
        """Two-sided violation of general rows: max(0, v-ru) + max(0, rl-v)."""
        return jnp.maximum(0.0, v - g_ru[k]) + jnp.maximum(0.0, g_rl[k] - v)

    def interval_res(k, w, w1, w_eq, w_ineq, w_b):
        """Stage-blocked residual r_k(w_k, w_{k+1}) ∈ R^nr."""
        x, u, dt = ocp.split_w(w, nx, nu)
        m = ocp.stage_mask[k]
        parts = []
        # lsq objective residual (√-weighted quadrature: left-sum style)
        r_lsq = ocp.cost.stage_residual(x, u, dt, ocp.refs.xref[k], ocp.refs.uref[k])
        scale = jnp.sqrt(jnp.maximum(dt, 1e-12)) if ocp.cost.integral else 1.0
        pad = n_lsq - r_lsq.shape[0]
        if pad:
            r_lsq = jnp.concatenate([r_lsq, jnp.zeros((pad,), dtype)])
        parts.append(m * scale * r_lsq)
        # equality: interval rows (defect + ties)
        c = ocp.interval_residual(k, w, w1)
        parts.append(jnp.sqrt(w_eq) * c)
        # general rows at stage k (two-sided hinge covers eq and ineq rows)
        if ng:
            v = ocp._rows_single(k, w)
            parts.append(jnp.sqrt(w_ineq) * _gen_viol(k, v))
        # box violation at stage k
        viol = jnp.maximum(0.0, lb[k] - w) + jnp.maximum(0.0, w - ub[k])
        parts.append(jnp.sqrt(w_b) * viol * free[k])
        return jnp.concatenate(parts)

    def terminal_res(wN, w_ineq, w_b):
        # terminal-cost LSQ residual in the lsq slot (ref: the final-state
        # cost edge contributes lsq rows, final_state_cost.h lsq mode)
        rf = ocp.cost.final_residual(wN[:nx], ocp.refs.xref[-1])
        pad = n_lsq - rf.shape[0]
        if pad:
            rf = jnp.concatenate([rf, jnp.zeros((pad,), dtype)])
        parts = [rf, jnp.zeros((ocp.nc,), dtype)]
        if ng:
            v = ocp._rows_single(jnp.asarray(N), wN)
            parts.append(jnp.sqrt(w_ineq) * _gen_viol(N, v))
        viol = jnp.maximum(0.0, lb[N] - wN) + jnp.maximum(0.0, wN - ub[N])
        parts.append(jnp.sqrt(w_b) * viol * free[N])
        return jnp.concatenate(parts)

    def all_residuals(W, w_eq, w_ineq, w_b):
        ks = jnp.arange(N)
        Wk, Wk1 = adjacent_rows(W)  # axon miscompile workaround
        r_int = jax.vmap(
            lambda k, w, w1: interval_res(k, w, w1, w_eq, w_ineq, w_b)
        )(ks, Wk, Wk1)
        r_term = terminal_res(W[-1], w_ineq, w_b)
        return r_int, r_term  # [N, nr], [nr]

    def chi2_of(W, w_eq, w_ineq, w_b):
        r_int, r_term = all_residuals(W, w_eq, w_ineq, w_b)
        return jnp.sum(r_int**2) + jnp.sum(r_term**2)

    def gn_system(W, w_eq, w_ineq, w_b):
        """Block-tridiagonal JᵀJ and Jᵀr."""
        ks = jnp.arange(N)

        def blocks(k, w, w1):
            r = interval_res(k, w, w1, w_eq, w_ineq, w_b)
            Jk, Kk = jax.jacfwd(
                lambda a, b: interval_res(k, a, b, w_eq, w_ineq, w_b),
                argnums=(0, 1),
            )(w, w1)
            return r, Jk * free[k][None, :], Kk * free[k + 1][None, :]

        Wk, Wk1 = adjacent_rows(W)  # axon miscompile workaround
        r_int, J, K = jax.vmap(blocks)(ks, Wk, Wk1)
        r_term = terminal_res(W[-1], w_ineq, w_b)
        J_term = jax.jacfwd(lambda w: terminal_res(w, w_ineq, w_b))(W[-1])
        J_term = J_term * free[N][None, :]

        D = jnp.zeros((N + 1, nz, nz), dtype)
        D = D.at[:-1].add(jnp.einsum("kri,krj->kij", J, J))
        D = D.at[1:].add(jnp.einsum("kri,krj->kij", K, K))
        D = D.at[N].add(J_term.T @ J_term)
        O = jnp.einsum("kri,krj->kij", J, K)
        g = jnp.zeros((N + 1, nz), dtype)
        g = g.at[:-1].add(jnp.einsum("kri,kr->ki", J, r_int))
        g = g.at[1:].add(jnp.einsum("kri,kr->ki", K, r_int))
        g = g.at[N].add(J_term.T @ r_term)
        return D, O, g

    eye = jnp.eye(nz, dtype=dtype)

    def iteration(state):
        W, mu, nu_reject, w_eq, w_ineq, w_b, it, done, chi2_prev = state
        D, O, g = gn_system(W, w_eq, w_ineq, w_b)
        Dmu = D + mu * eye[None]
        Ld, Lo = btridiag_cholesky(Dmu, O)
        delta = -btridiag_solve(Ld, Lo, g)
        delta = delta * free
        W_new = W + delta
        chi2_new = chi2_of(W_new, w_eq, w_ineq, w_b)
        chi2_old = chi2_of(W, w_eq, w_ineq, w_b)
        # ρ-gain: predicted reduction from the GN model
        pred = -jnp.sum(g * delta) - 0.5 * jnp.sum(
            delta * (
                jnp.einsum("kij,kj->ki", D, delta)
                .at[:-1].add(jnp.einsum("kij,kj->ki", O, delta[1:]))
                .at[1:].add(jnp.einsum("kji,kj->ki", O, delta[:-1]))
            )
        ) + 0.0
        actual = chi2_old - chi2_new
        rho_gain = actual / jnp.maximum(jnp.abs(pred), 1e-30)
        accept = actual > 0
        W_next = jnp.where(accept, W_new, W)
        # μ update (ref levenberg_marquardt_sparse.cpp:130-199)
        mu_acc = mu * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho_gain - 1.0) ** 3)
        mu_rej = mu * nu_reject
        mu_new = jnp.where(accept, mu_acc, mu_rej)
        nu_new = jnp.where(accept, 2.0, nu_reject * 2.0)
        chi2_cur = jnp.where(accept, chi2_new, chi2_old)
        step_norm = jnp.max(jnp.abs(delta))
        stalled = (step_norm < cfg.tol_step) | (
            jnp.abs(chi2_prev - chi2_cur) < cfg.tol_chi2_rel * (1.0 + chi2_cur)
        )
        # feasibility at the current iterate (unweighted): dynamics defects,
        # box violations, and general-row violations — declaring convergence
        # on defects alone lets the penalty weights stall while e.g. bound
        # rows are still violated
        c = ocp.interval_residuals(W_next)
        feas = jnp.max(jnp.abs(c))
        viol_box = (
            jnp.maximum(0.0, lb - W_next) + jnp.maximum(0.0, W_next - ub)
        ) * free
        feas = jnp.maximum(feas, jnp.max(viol_box))
        if ng:
            ks_f = jnp.arange(N + 1)
            vg = jax.vmap(lambda k, w: _gen_viol(k, ocp._rows_single(k, w)))(
                ks_f, W_next
            )
            feas = jnp.maximum(feas, jnp.max(vg))
        feasible = feas < cfg.feas_tol
        # when stalled but infeasible: grow penalty weights and keep going
        # (the reference adapts weights between (re)solves,
        # levenberg_marquardt_sparse.h:54-66); stalled + feasible: done
        adapt = stalled & (~feasible)
        grow = lambda w: jnp.where(
            adapt, jnp.minimum(w * cfg.weight_adapt_factor, cfg.weight_max), w
        )
        conv = stalled & feasible
        W_next = jnp.where(done, W, W_next)
        # reset chi2 memory when weights change (chi2 scale jumps)
        chi2_mem = jnp.where(adapt, jnp.inf, chi2_cur)
        return (
            W_next, jnp.where(done, mu, mu_new), nu_new,
            grow(w_eq), grow(w_ineq), grow(w_b),
            it + 1, done | conv, chi2_mem,
        )

    def cond(state):
        it, done = state[6], state[7]
        return (it < cfg.max_iter) & (~done)

    init = (
        W0,
        jnp.asarray(cfg.mu_init, dtype),
        jnp.asarray(2.0, dtype),
        jnp.asarray(cfg.weight_eq, dtype),
        jnp.asarray(cfg.weight_ineq, dtype),
        jnp.asarray(cfg.weight_bounds, dtype),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
        jnp.asarray(jnp.inf, dtype),
    )
    out = jax.lax.while_loop(cond, iteration, init)
    W, mu, nu_r, w_eq, w_ineq, w_b, it, done, chi2 = out
    c = ocp.interval_residuals(W)
    feas = jnp.max(jnp.abs(c))
    status = jnp.where(
        done & (feas < 1e-4),
        jnp.asarray(int(SolverStatus.CONVERGED), jnp.int32),
        jnp.asarray(int(SolverStatus.EARLY_TERMINATED), jnp.int32),
    )
    return LMResult(
        traj=ocp.unpack(W), W=W, chi2=chi2, iterations=it,
        feas_res=feas, status=status,
    )
