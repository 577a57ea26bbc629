"""Predictive (MPC) controller.

Ref parity: `PredictiveController` (ref: src/controllers/include/
corbo-controllers/predictive_controller.h:50-77; step loop at
src/predictive_controller.cpp:46-80): per control step it calls the
structured OCP `compute()` `_num_ocp_iterations` times, extracts the first
control, and auto-updates u_prev; warm starting comes from the grid's
`warmStartShifting` (full_discretization_grid_base.cpp:230).

TPU-first redesign: the OCP solve is the jitted SQP (solvers/sqp.py); the
controller carry holds the full warm-start state (primal W + duals).
Shifting happens at the START of each step with the measured state — the
reference's call order — using the state-proximity shift count
(`find_nearest_state`), so variable-dt (time-optimal) grids stay aligned
when dt* differs from the loop dt. `shift_warm_start` implements the
dynamic-count moving-horizon shift + tail extrapolation as pure gather ops.
The whole controller step jits and vmaps — a batch of plants each gets its
own warm-start carry.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from control_box_rst_tpu.control.base import Controller, ControlOutput
from control_box_rst_tpu.ocp.problem import Trajectory
from control_box_rst_tpu.ocp.transcribe import TranscribedOCP
from control_box_rst_tpu.solvers.ip import IPConfig, ip_solve
from control_box_rst_tpu.solvers.lm import LMConfig, lm_solve
from control_box_rst_tpu.solvers.sqp import SQPConfig, SQPWarmStart, sqp_solve
from control_box_rst_tpu.utils.tree import pytree_dataclass, static_field


class MPCCarry(NamedTuple):
    W: jax.Array       # [N+1, nz] warm-start primal
    y_dyn: jax.Array   # [N, nc]
    y_gen: jax.Array   # [N+1, ng]
    y_box: jax.Array   # [N+1, nz]
    u_prev: jax.Array  # [nu] last applied control (ref: caches u_prev)
    n_active: jax.Array  # active interval count (grid adaptation)
    feas_prev: jax.Array = 0.0  # previous solve's constraint violation
    # (feeds GrowOnInfeasibility — ref `_increase_n_if_infeas`,
    # structured_optimal_control_problem.cpp:135-140)


def find_nearest_state(
    W: jax.Array, x0: jax.Array, nx: int, lookahead: int = 20,
    n_active=None,
) -> jax.Array:
    """State-proximity shift count: the index of the nearest already-planned
    state to the new x0, found by the reference's greedy forward walk (stop
    at the first non-decreasing distance).

    (ref: FullDiscretizationGridBase::findNearestState,
    full_discretization_grid_base.cpp:288-322 — keep ≥1 interval, look at
    most 20 samples ahead, return 0 when the start state is unchanged.)
    Jittable: the walk is expressed as first-non-decrease over a static
    window instead of a data-dependent loop. With a masked variable
    horizon, pass `n_active` so the walk never considers the inactive tail
    (its rows hold resampled/duplicated data) and at least one active
    interval is kept."""
    N = W.shape[0] - 1
    L = min(lookahead, N - 1)
    d = jnp.linalg.norm(W[: L + 1, :nx] - x0, axis=1)
    if n_active is not None:
        idx = jnp.arange(L + 1)
        d = jnp.where(idx <= n_active - 1, d, jnp.inf)
    inc = d[1:] >= d[:-1]  # True where the walk would stop
    first_stop = jnp.argmax(inc)  # 0 if all False
    nearest = jnp.where(jnp.any(inc), first_stop, L)
    return jnp.where(d[0] < 1e-12, 0, nearest).astype(jnp.int32)


def shift_warm_start(W: jax.Array, nx: int, num_shift=1, n_active=None) -> jax.Array:
    """Moving-horizon shift by `num_shift` stages (dynamic, jittable):
    stage i takes old stage i+k, tail states extrapolate linearly along the
    last planned interval, tail controls/dts hold the last real interval.

    (ref: FullDiscretizationGridBase::warmStartShifting,
    full_discretization_grid_base.cpp:230-285 — shift by the
    state-proximity count, extrapolate states `x_new = 2 x_{n-1} - x_{n-2}`
    sequentially ≡ linear continuation through the last two states, hold
    the final control. k = 0 is the identity.)

    With a masked variable horizon pass `n_active`: the u/dt gather is then
    clamped to the last ACTIVE interval — the inactive tail carries dummy
    zeros, and importing a zero dt into the active range NaNs every
    1/dt-containing defect scheme. (States need no clamp: under masking the
    tail rows duplicate the terminal state, so the gather/extrapolation is
    already benign.)"""
    Np1 = W.shape[0]
    N = Np1 - 1
    k = jnp.asarray(num_shift, jnp.int32)
    idx = jnp.arange(Np1, dtype=jnp.int32) + k
    over = jnp.maximum(idx - N, 0)  # stages past the old horizon end
    X = W[:, :nx]
    rest = W[:, nx:]
    x_shift = jnp.where(
        (over > 0)[:, None],
        X[N] + over[:, None].astype(X.dtype) * (X[N] - X[N - 1]),
        X[jnp.minimum(idx, N)],
    )
    # controls/dt live on intervals 0..N-1 (stage N carries dummies): shift,
    # hold the last real interval for the extrapolated tail, keep stage N 0
    last_real = (
        jnp.asarray(N - 1, jnp.int32) if n_active is None
        else jnp.asarray(n_active, jnp.int32) - 1
    )
    rest_shift = rest[jnp.minimum(idx, last_real)]
    rest_shift = rest_shift.at[-1].set(0.0)
    return jnp.concatenate([x_shift, rest_shift], axis=1)


def shift_stage_rows(a: jax.Array, num_shift, last: int) -> jax.Array:
    """Shift stage-indexed rows (duals) by `num_shift`, duplicating the row
    at index `last` for the tail (ref: the LM/OSQP warm start reuses the
    final stage's multipliers for appended stages)."""
    n = a.shape[0]
    idx = jnp.minimum(
        jnp.arange(n, dtype=jnp.int32) + jnp.asarray(num_shift, jnp.int32),
        last,
    )
    return a[idx]


@pytree_dataclass
class PredictiveController(Controller):
    """MPC controller wrapping a TranscribedOCP + SQP config."""

    ocp: TranscribedOCP = None
    dt: jax.Array = 0.1  # grid dt (fixed grids) / initial dt guess (variable)
    cfg: SQPConfig = static_field(default=None)
    # NLP backend (ref: PredictiveController pairs with any factory-
    # registered NlpSolver, nlp_solver_interface.h:118):
    #   'sqp' — default, fully warm-startable, the production MPC path
    #   'ip'  — interior point (solvers/ip.py, the IPOPT-role backend; only
    #           the primal warm-starts, duals re-center each step as in the
    #           reference's IPOPT warm-start caveats)
    #   'lm'  — Levenberg-Marquardt penalty mode (solvers/lm.py, the
    #           LevenbergMarquardt[Dense|Sparse] role; primal warm start)
    solver: str = static_field(default="sqp")
    ip_cfg: IPConfig = static_field(default=None)
    lm_cfg: LMConfig = static_field(default=None)
    num_ocp_iterations: int = static_field(default=1)
    warm_start_shift: bool = static_field(default=True)
    # initial active horizon (0 → full grid N); use together with a
    # GrowOnInfeasibility adaptation to start short and grow as needed
    n_active_init: int = static_field(default=0)
    # grid adaptation strategy (ref: FiniteDifferencesVariableGrid::adaptGrid)
    adaptation: object = None
    # a solve is usable (ok=True) when its constraint violation is below
    # this, even if KKT tolerances weren't fully met — matching the
    # reference, which only zeroes controls on real failure
    # (task_closed_loop_control.cpp:200-206)
    usable_feas_tol: float = static_field(default=1e-3)

    def __post_init__(self):
        if self.cfg is None:
            object.__setattr__(self, "cfg", SQPConfig())
        if self.solver not in ("sqp", "ip", "lm"):
            raise KeyError(
                f"unknown solver {self.solver!r}; have ['sqp', 'ip', 'lm']"
            )
        if self.solver == "ip" and self.ip_cfg is None:
            object.__setattr__(self, "ip_cfg", IPConfig())
        if self.solver == "lm" and self.lm_cfg is None:
            object.__setattr__(self, "lm_cfg", LMConfig())
        if self.num_ocp_iterations < 1:
            raise ValueError("num_ocp_iterations must be >= 1")

    @property
    def horizon(self) -> int:
        return self.ocp.N

    def init_carry(self, x0: jax.Array) -> MPCCarry:
        ocp = self.ocp
        N, nz, nc, ng = ocp.N, ocp.nz, ocp.nc, ocp.ng
        xf = ocp.bc.xf if ocp.bc.xf is not None else ocp.refs.xref[-1]
        dt0 = jnp.asarray(self.dt)
        if ocp.grid.dt_is_variable:
            b = ocp.bounds
            dt0 = jnp.clip(
                dt0,
                jnp.where(jnp.isfinite(b.dt_lb), b.dt_lb, dt0),
                jnp.where(jnp.isfinite(b.dt_ub), b.dt_ub, dt0),
            )
        traj = Trajectory.linear_interp(x0, xf, N, ocp.nu, dt0)
        W = ocp.pack(traj)
        dtype = W.dtype
        return MPCCarry(
            W=W,
            y_dyn=jnp.zeros((N, nc), dtype),
            y_gen=jnp.zeros((N + 1, ng), dtype),
            y_box=jnp.zeros((N + 1, nz), dtype),
            u_prev=jnp.zeros((ocp.nu,), dtype),
            n_active=jnp.asarray(self.n_active_init or N, jnp.int32),
            feas_prev=jnp.asarray(0.0, dtype),
        )

    def step(self, carry: MPCCarry, x: jax.Array, t, dt) -> tuple:
        ocp = self.ocp.replace(bc=self.ocp.bc.replace(x0=x))
        W = carry.W
        y_dyn, y_gen, y_box = carry.y_dyn, carry.y_gen, carry.y_box
        n_active = carry.n_active
        # grid adaptation before the solve (ref: adaptGrid at grid update,
        # finite_differences_variable_grid.cpp:66)
        if self.adaptation is not None:
            from control_box_rst_tpu.ocp.adaptation import stage_mask_from_n

            W, n_active = self.adaptation.adapt(
                W, n_active, ocp.nx, ocp.nu, ocp.N, feas=carry.feas_prev
            )
            ocp = ocp.replace(
                stage_mask=stage_mask_from_n(n_active, ocp.N, W.dtype)
            )
        # moving-horizon warm-start shift, at the START of the step with the
        # measured state — the reference's call order (grid update:
        # warmStartShifting(x0) before the x0 overwrite,
        # full_discretization_grid_base.cpp:230). State-proximity shifting
        # is what keeps variable-dt (time-optimal) grids aligned when the
        # plan dt* differs from the loop dt: the shift count is however many
        # planned states the plant actually passed (0, 1, 2, ...), not a
        # fixed one-stage hop.
        if self.warm_start_shift:
            # n_active == N when unmasked, so passing it unconditionally
            # reduces to the plain shift there and guards masked horizons
            # (adaptation or n_active_init) against importing the inactive
            # tail's dummy rows
            k = find_nearest_state(W, x, ocp.nx, n_active=n_active)
            W = shift_warm_start(W, ocp.nx, k, n_active=n_active)
            y_dyn = shift_stage_rows(y_dyn, k, ocp.N - 1)
            y_gen = shift_stage_rows(y_gen, k, ocp.N)
            y_box = shift_stage_rows(y_box, k, ocp.N)
        # overwrite x0 row, keep rest of warm start
        W = W.at[0, : ocp.nx].set(x)
        # restore pinned terminal components after shifting — the shift's
        # tail extrapolation writes THROUGH the goal state, and a pinned
        # vertex keeps whatever value it holds; without this restore the
        # extrapolated state becomes the frozen goal and the solver locks
        # onto an overshoot-and-return branch. (ref: update() rewrites
        # fixed xf components from xref right after warmStartShifting,
        # full_discretization_grid_base.cpp:101-105.)
        if ocp.bc.xf_fixed is not None and ocp.bc.xf is not None:
            mask = jnp.asarray(ocp.bc.xf_fixed, W.dtype)
            W = W.at[-1, : ocp.nx].set(
                mask * ocp.bc.xf + (1.0 - mask) * W[-1, : ocp.nx]
            )
        warm = SQPWarmStart(W=W, y_dyn=y_dyn, y_gen=y_gen, y_box=y_box)
        traj_init = ocp.unpack(W)
        res = None
        if self.solver == "ip":
            res = ip_solve(ocp, traj_init, self.ip_cfg)
            # map bound duals to the SQP's signed-box convention for the
            # carry (positive = pushing against the upper bound)
            res_y_box = res.z_uw - res.z_lw
            res_qp_iters = jnp.asarray(0, jnp.int32)
        elif self.solver == "lm":
            import types

            lm_res = lm_solve(ocp, traj_init, self.lm_cfg)
            # adapt LMResult to the common fields used below (LM carries no
            # duals — the penalty weights play that role, solvers/lm.py)
            res = types.SimpleNamespace(
                W=lm_res.W,
                traj=lm_res.traj,
                y_dyn=y_dyn,
                y_gen=y_gen,
                objective=ocp.objective_from_W(lm_res.W),
                iterations=lm_res.iterations,
                stat_res=lm_res.chi2,
                feas_res=lm_res.feas_res,
                status=lm_res.status,
            )
            res_y_box = y_box
            res_qp_iters = jnp.asarray(0, jnp.int32)
        else:
            for _ in range(self.num_ocp_iterations):
                res = sqp_solve(ocp, traj_init, self.cfg, warm=warm)
                warm = SQPWarmStart(
                    W=res.W, y_dyn=res.y_dyn, y_gen=res.y_gen, y_box=res.y_box
                )
                traj_init = res.traj
            res_y_box = res.y_box
            res_qp_iters = res.qp_iters

        u0 = res.traj.U[0]
        # the carry holds the UNSHIFTED solution; shifting happens at the
        # start of the NEXT step, where the measured state determines the
        # proximity shift count (matching the reference's call order)
        W_next, y_dyn, y_gen, y_box = res.W, res.y_dyn, res.y_gen, res_y_box
        # duals from an unusable (infeasible/unconverged) solve are not a
        # warm start — ADMM iterated on an infeasible QP grows its duals
        # without bound, and carrying them poisons every later solve (the
        # primal W stays: it is still the best available initializer).
        # Ref analogue: LM carries no duals at all; warm starting is a
        # primal-trajectory concept there (warmStartShifting).
        usable = res.feas_res < self.usable_feas_tol
        y_dyn = jnp.where(usable, y_dyn, 0.0)
        y_gen = jnp.where(usable, y_gen, 0.0)
        y_box = jnp.where(usable, y_box, 0.0)

        new_carry = MPCCarry(
            W=W_next, y_dyn=y_dyn, y_gen=y_gen, y_box=y_box, u_prev=u0,
            n_active=n_active, feas_prev=res.feas_res,
        )
        out = ControlOutput(
            u=u0,
            u_seq=res.traj.U,
            x_seq=res.traj.X,
            ok=res.feas_res < self.usable_feas_tol,
            info={
                "objective": res.objective,
                "sqp_iters": res.iterations,
                "qp_iters": res_qp_iters,
                "stat_res": res.stat_res,
                "feas_res": res.feas_res,
                "dts": res.traj.dts,
                "n_active": n_active,
            },
        )
        return new_carry, out
