"""Transcription: grid + system + costs + constraints → canonical stage NLP.

This module is the TPU-native counterpart of the reference's
grid `update()/createEdges()` pipeline
(ref: full_discretization_grid_base.cpp:38-133,
finite_differences_grid.cpp:38-156, multiple_shooting_grid.cpp:38-160) plus
the edge-based problem realization that evaluates per-edge Jacobian blocks
(ref: hyper_graph_optimization_problem_edge_based.cpp:31-5393).

Canonical form ("stage NLP"): decision variables are W ∈ [N+1, nz] with
w_k = [x_k ; u_k ; dt_k] (nz = nx+nu+1 always; unused components are pinned
via `fixed_mask`). The NLP is

  min  Σ_{k<N} stage_term_k(w_k, w_{k+1})  +  final(x_N)
  s.t. c_k(w_k, w_{k+1}) = 0                      k < N   (defect + tie rows)
       r_k(w_k) ∈ [rl_k, ru_k]                    k ≤ N   (general rows)
       lb_k ≤ w_k ≤ ub_k                                   (box; pins incl.)

All evaluations are vmapped over k: the reference's serial edge iteration
becomes batched tensor ops, and `jax.jacfwd` provides exact derivative
blocks where the reference uses central finite differences with δ=1e-9
(edge_interface.cpp:55-96).

Variable-horizon support: `stage_mask[k] ∈ {0,1}` deactivates tail intervals
by replacing their defect with the identity chain x_{k+1} - x_k = 0 and
zeroing their cost, so grid adaptation (ref FiniteDifferencesVariableGrid
adaptation strategies, finite_differences_variable_grid.h:41) changes only
array values — never shapes, never recompiles.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from control_box_rst_tpu.models.base import SystemDynamics
from control_box_rst_tpu.ocp.constraints import StageConstraint, TerminalConstraint
from control_box_rst_tpu.ocp.costs import StageCost
from control_box_rst_tpu.ocp.grids import Grid
from control_box_rst_tpu.ocp.problem import (
    BoundaryConditions,
    Bounds,
    References,
    Trajectory,
)
from control_box_rst_tpu.ops.collocation import get_fd_collocation
from control_box_rst_tpu.ops.integrators import make_integrator
from control_box_rst_tpu.utils.tree import pytree_dataclass, static_field


def adjacent_rows(W: jax.Array):
    """Materialize the (w_k, w_{k+1}) stage-pair views behind an XLA
    optimization barrier before vmapping over them.

    The axon TPU compiler MISCOMPILES the fused pattern
    `vmap(f)(ks, W[:-1], W[1:])` when f's primal output mixes both rows:
    residual VALUES silently blend the adjacent stage's control while the
    Jacobians stay correct, so solvers converge on (and report feasibility
    of) a corrupted constraint. Root-caused via tools/tpu_consistency_check
    (lanes reporting feas ~1e-5 with true defect ~0.2); minimal repro:
    double-integrator dynamics (slice+concat) under a crank_nicolson defect.
    The barrier pins the two shifted views as materialized buffers, which
    defeats the bad fusion on every case tested; it is AD-transparent, so
    grad/linearize through this helper stay exact.
    """
    return jax.lax.optimization_barrier((W[:-1], W[1:]))


@pytree_dataclass
class TranscribedOCP:
    """A fully-specified, jittable stage NLP."""

    # static structure
    grid: Grid = static_field(default=None)
    # data (pytrees with their own static/data split)
    system: SystemDynamics = None
    cost: StageCost = None
    stage_con: Optional[StageConstraint] = None
    term_con: Optional[TerminalConstraint] = None
    bounds: Bounds = None
    bc: BoundaryConditions = None
    refs: References = None
    stage_mask: jax.Array = None  # [N] 1.0 = interval active

    # ---------------- dimensions ----------------
    @property
    def N(self) -> int:
        return self.grid.N

    @property
    def nx(self) -> int:
        return self.system.nx

    @property
    def nu(self) -> int:
        return self.system.nu

    @property
    def n_aux(self) -> int:
        """Auxiliary per-stage decision states appended after [x;u;dt]:
        the UNCOMPRESSED Hermite-Simpson scheme stores interval k's
        midpoint state in stage k (ref: midpoint vertices of
        collocation_edges.h:42-1392). Keeping them inside the stage vector
        preserves the 2-point coupling c_k(w_k, w_{k+1}) — and with it the
        block-tridiagonal KKT structure every solver relies on."""
        return (
            self.nx
            if (self.grid.kind == "fd"
                and self.grid.fd_scheme == "hermite_simpson_unc"
                and self.system.continuous_time)
            else 0
        )

    @property
    def nz(self) -> int:
        return self.nx + self.nu + 1 + self.n_aux

    @property
    def n_tie(self) -> int:
        return (1 if self.grid.has_dt_tie else 0) + (
            self.nu if self.grid.has_u_tie else 0
        )

    @property
    def nc(self) -> int:
        """Interval equality rows: defect (+ midpoint ties) + ties."""
        return self.nx + self.n_aux + self.n_tie

    @property
    def ng_stage(self) -> int:
        sc = self.stage_con
        return 0 if sc is None else sc.neq + sc.nineq

    @property
    def ng_term(self) -> int:
        tc = self.term_con
        return 0 if tc is None else tc.neq + tc.nineq

    @property
    def ng(self) -> int:
        return max(self.ng_stage, self.ng_term)

    # ---------------- packing ----------------
    def pack(self, traj: Trajectory) -> jax.Array:
        """Trajectory → W [N+1, nz]. Stage N gets dummy u/dt (zeros).
        Aux midpoint states (uncompressed HS) are initialized by linear
        midpoint interpolation; thereafter they live in W as decision
        variables."""
        N, nx, nu = self.N, self.nx, self.nu
        U_pad = jnp.concatenate([traj.U, jnp.zeros((1, nu), traj.U.dtype)], axis=0)
        dt_pad = jnp.concatenate(
            [traj.dts, jnp.zeros((1,), traj.dts.dtype)], axis=0
        )
        cols = [traj.X, U_pad, dt_pad[:, None]]
        if self.n_aux:
            Xm = 0.5 * (traj.X[:-1] + traj.X[1:])
            cols.append(jnp.concatenate([Xm, traj.X[-1:]], axis=0))
        return jnp.concatenate(cols, axis=-1)

    def unpack(self, W: jax.Array) -> Trajectory:
        nx, nu = self.nx, self.nu
        return Trajectory(
            X=W[:, :nx], U=W[:-1, nx : nx + nu], dts=W[:-1, nx + nu]
        )

    @staticmethod
    def split_w(w: jax.Array, nx: int, nu: int):
        return w[:nx], w[nx : nx + nu], w[nx + nu]

    # ---------------- defect ----------------
    def _defect_needs_u1(self) -> bool:
        """Static: does the defect scheme read the next stage's control?
        Only the linear-control Hermite-Simpson scheme does."""
        return (
            self.grid.kind == "fd"
            and self.grid.fd_scheme == "hermite_simpson_lc"
            and self.system.continuous_time
        )

    def _defect_fn(self):
        """Returns defect(x, u, x1, u1, dt) for the grid's scheme. u1 is the
        NEXT stage's control — only the linear-control Hermite-Simpson
        scheme uses it (ref: QuadratureHermiteSimpsonLinearControl,
        quadrature.h:622); the other schemes ignore it."""
        g = self.grid
        f = self.system
        if not f.continuous_time:
            # discrete-time system: x⁺ = f(x, u); FD collocation of ẋ is
            # undefined, both grid kinds use the one-step defect
            # (ref: discrete systems bypass integration,
            # system_dynamics_interface.h isContinuousTime)
            return lambda x, u, x1, u1, dt: f(x, u) - x1
        if g.kind == "fd":
            if g.fd_scheme == "hermite_simpson_lc":
                from control_box_rst_tpu.ops.collocation import (
                    hermite_simpson_lc_defect,
                )

                return lambda x, u, x1, u1, dt: hermite_simpson_lc_defect(
                    f, x, u, x1, u1, dt
                )
            scheme = get_fd_collocation(g.fd_scheme)
            return lambda x, u, x1, u1, dt: scheme(f, x, u, x1, dt)
        elif g.kind == "ms":
            integ = make_integrator(g.integrator, g.integrator_substeps)
            # MS defect: solveIVP(x,u,dt) - x1 (ref integrator_interface.h:219)
            return lambda x, u, x1, u1, dt: integ.solve_ivp(f, x, u, dt) - x1
        raise ValueError(f"unknown grid kind {g.kind!r}")

    def interval_residual(self, k, w, w1):
        """c_k(w_k, w_{k+1}) ∈ R^nc: masked defect + tie rows."""
        nx, nu = self.nx, self.nu
        x, u, dt = self.split_w(w, nx, nu)
        x1 = w1[:nx]
        m = self.stage_mask[k]
        if self._defect_needs_u1():
            # next stage's control (linear-control HS only); the last
            # interval falls back to the interval's own control — stage N
            # carries a pinned dummy u. NOTE: scalar-mask-multiply form, NOT
            # jnp.where(pred, vec_a, vec_b): a vector select between the
            # adjacent stage's slice and a local vector inside this vmapped
            # body miscompiles on the axon TPU backend — it corrupted the
            # defect evaluation even for schemes that ignore u1 (caught by
            # the f64-oracle accuracy audit; same bug family as the
            # interval_residuals slicing note below).
            m1 = jnp.where(k < self.N - 1, 1.0, 0.0)
            u1 = m1 * w1[nx : nx + nu] + (1.0 - m1) * u
        else:
            u1 = u  # unused by the scheme; never touch w1's control
        # guard: inactive intervals may carry dt = 0, and FD defects divide
        # by dt — evaluate them at a safe dt (result is masked out anyway;
        # without the guard, 0 · inf = NaN poisons the masked sum)
        dt_safe = jnp.where(m > 0, dt, jnp.ones_like(dt))
        if self.n_aux:
            from control_box_rst_tpu.ops.collocation import (
                hermite_simpson_unc_rows,
            )

            xm = w[nx + nu + 1:]
            unc = hermite_simpson_unc_rows(
                self.system, x, xm, u, x1, dt_safe
            )
            # inactive interval → identity chain + midpoint pinned to x
            idle = jnp.concatenate([x1 - x, xm - x])
            rows = [m * unc + (1.0 - m) * idle]
        else:
            defect = self._defect_fn()(x, u, x1, u1, dt_safe)
            # inactive interval → identity chain (keeps tail pinned, QP regular)
            defect = m * defect + (1.0 - m) * (x1 - x)
            rows = [defect]
        if self.grid.has_dt_tie:
            dt1 = w1[nx + nu]
            # last interval has dummy dt at stage N → masked off
            tie_on = jnp.where(k < self.N - 1, 1.0, 0.0)
            rows.append(jnp.atleast_1d(tie_on * (dt1 - dt)))
        if self.grid.has_u_tie:
            u1 = w1[nx : nx + nu]
            mask_np = self.grid.u_tie_mask(nu)  # [N-1, nu]
            mask = jnp.asarray(
                np.concatenate([mask_np, np.zeros((1, nu))], axis=0), w.dtype
            )[k]
            rows.append(mask * (u1 - u))
        return jnp.concatenate(rows)

    def interval_residuals(self, W: jax.Array) -> jax.Array:
        """[N, nc] all interval equality rows.

        NOTE: the stage slices are materialized BEFORE the vmap and the
        per-stage function receives them as separate arguments. Slicing the
        adjacent w/w1 rows *inside* a vmapped function exposed a backend
        miscompilation on the axon TPU platform (the defect was evaluated
        with the next stage's control — tools/axon_repro.py); this
        formulation avoids the pattern and is equivalent on all platforms."""
        nx, nu = self.nx, self.nu
        ks = jnp.arange(self.N)
        Wk, Wk1 = adjacent_rows(W)
        Xk = Wk[:, :nx]
        Uk = Wk[:, nx : nx + nu]
        DTk = Wk[:, nx + nu]
        AUXk = Wk[:, nx + nu + 1:]
        Xk1 = Wk1[:, :nx]
        Uk1 = Wk1[:, nx : nx + nu]
        DTk1 = Wk1[:, nx + nu]
        AUXk1 = Wk1[:, nx + nu + 1:]

        def one(k, x, u, dt, aux, x1, u1, dt1, aux1):
            w = jnp.concatenate([x, u, dt[None], aux])
            w1 = jnp.concatenate([x1, u1, dt1[None], aux1])
            return self.interval_residual(k, w, w1)

        return jax.vmap(one)(ks, Xk, Uk, DTk, AUXk, Xk1, Uk1, DTk1, AUXk1)

    def defects(self, traj: Trajectory) -> jax.Array:
        """[N, nx] dynamics defects only (diagnostics / tests)."""
        W = self.pack(traj)
        return self.interval_residuals(W)[:, : self.nx]

    def interval_jacobians(self, W: jax.Array):
        """J [N, nc, nz], K [N, nc, nz], c [N, nc] — exact via jacfwd.

        The primal c is harvested from the same `jax.linearize` computation
        that produces the Jacobians (one evaluation, consistent values —
        see interval_residuals note on the axon slicing pattern)."""
        nz = self.nz

        def jac_one(k, w, w1):
            c, lin = jax.linearize(
                lambda a, b: self.interval_residual(k, a, b), w, w1
            )
            eye = jnp.eye(nz, dtype=w.dtype)
            zeros = jnp.zeros((nz, nz), dtype=w.dtype)
            J = jax.vmap(lambda e: lin(e, jnp.zeros_like(w1)))(eye)
            K = jax.vmap(lambda e: lin(jnp.zeros_like(w), e))(eye)
            return J.T, K.T, c

        ks = jnp.arange(self.N)
        Wk, Wk1 = adjacent_rows(W)  # axon miscompile workaround, see helper
        return jax.vmap(jac_one)(ks, Wk, Wk1)

    # ---------------- cost ----------------
    def _stage_term(self, k, w, w1):
        """Cost contribution of interval k (uses w_k and, for trapezoidal
        integration, x_{k+1})."""
        nx, nu = self.nx, self.nu
        x, u, dt = self.split_w(w, nx, nu)
        xref = self.refs.xref[k]
        uref = self.refs.uref[k]
        c = self.cost
        if c.integral:
            if self.grid.cost_integration == "trapezoidal":
                x1 = w1[:nx]
                xref1 = self.refs.xref[k + 1]
                val = 0.5 * dt * (
                    c.stage(x, u, dt, xref, uref)
                    + c.stage(x1, u, dt, xref1, uref)
                )
            elif self.grid.cost_integration == "hermite_simpson_unc":
                # Simpson rule on the DECISION-VARIABLE midpoint (ref:
                # uncompressed collocation cost edges,
                # collocation_edges.h:42-1392)
                x1 = w1[:nx]
                xref1 = self.refs.xref[k + 1]
                xm = w[nx + nu + 1:]
                xrefm = 0.5 * (xref + xref1)
                val = (dt / 6.0) * (
                    c.stage(x, u, dt, xref, uref)
                    + 4.0 * c.stage(xm, u, dt, xrefm, uref)
                    + c.stage(x1, u, dt, xref1, uref)
                )
            elif self.grid.cost_integration in (
                "hermite_simpson", "hermite_simpson_lc",
            ):
                # Simpson rule with the Hermite-interpolated midpoint
                # (ref: QuadratureHermiteSimpson, quadrature.h:1087; the
                # _lc variant interpolates the control linearly,
                # QuadratureHermiteSimpsonLinearControl, quadrature.h:622)
                x1 = w1[:nx]
                xref1 = self.refs.xref[k + 1]
                if self.grid.cost_integration == "hermite_simpson_lc":
                    # scalar-mask-multiply, not a vector select — see the
                    # axon miscompilation note in interval_residual
                    m1 = jnp.where(k < self.N - 1, 1.0, 0.0)
                    u1 = m1 * w1[nx : nx + nu] + (1.0 - m1) * u
                else:
                    u1 = u
                um = 0.5 * (u + u1)
                if self.system.continuous_time:
                    xm = 0.5 * (x + x1) + (dt / 8.0) * (
                        self.system(x, u) - self.system(x1, u1)
                    )
                else:
                    xm = 0.5 * (x + x1)
                xrefm = 0.5 * (xref + xref1)
                val = (dt / 6.0) * (
                    c.stage(x, u, dt, xref, uref)
                    + 4.0 * c.stage(xm, um, dt, xrefm, uref)
                    + c.stage(x1, u1, dt, xref1, uref)
                )
            else:  # left_sum
                val = dt * c.stage(x, u, dt, xref, uref)
        else:
            val = c.stage(x, u, dt, xref, uref)
        return self.stage_mask[k] * val

    def objective_from_W(self, W: jax.Array) -> jax.Array:
        ks = jnp.arange(self.N)
        Wk, Wk1 = adjacent_rows(W)  # axon miscompile workaround, see helper
        stage_sum = jnp.sum(jax.vmap(self._stage_term)(ks, Wk, Wk1))
        final = self.cost.final(W[-1, : self.nx], self.refs.xref[-1])
        return stage_sum + final

    def objective(self, traj: Trajectory) -> jax.Array:
        return self.objective_from_W(self.pack(traj))

    def cost_gradient(self, W: jax.Array) -> jax.Array:
        """Exact gradient [N+1, nz] of the objective."""
        return jax.grad(self.objective_from_W)(W)

    def cost_hessian_blocks(self, W: jax.Array) -> jax.Array:
        """Block-diagonal Hessian approximation Hd [N+1, nz, nz].

        Exact per-stage Hessian of φ_k(v) = all objective terms touching
        stage k, with neighboring stages frozen. Cross-stage cost coupling
        (trapezoidal integration) is dropped from the Hessian — but NOT from
        the gradient — which preserves exact KKT solutions (the Hessian only
        shapes the convergence path, Gauss-Newton style)."""
        N, nx = self.N, self.nx

        def phi(k, v, w_prev, w_next):
            # interval k as left stage (k<N)
            left = jnp.where(k < N, 1.0, 0.0)
            t1 = left * self._stage_term(jnp.minimum(k, N - 1), v, w_next)
            # interval k-1 as right stage (k>0): trapezoidal/Hermite-Simpson
            # integration touches x_k from the left interval
            t2 = jnp.zeros(())
            if self.cost.integral and self.grid.cost_integration in (
                "trapezoidal", "hermite_simpson", "hermite_simpson_lc",
                "hermite_simpson_unc",
            ):
                right = jnp.where(k > 0, 1.0, 0.0)
                t2 = right * self._stage_term(
                    jnp.maximum(k - 1, 0), w_prev, v
                )
            # terminal at k == N
            tN = jnp.where(k == N, 1.0, 0.0) * self.cost.final(
                v[:nx], self.refs.xref[-1]
            )
            return t1 + t2 + tN

        ks = jnp.arange(N + 1)
        pad = jnp.zeros_like(W[:1])
        Wk, Wk1 = adjacent_rows(W)  # axon miscompile workaround, see helper
        W_prev = jnp.concatenate([pad, Wk], axis=0)
        W_next = jnp.concatenate([Wk1, pad], axis=0)

        def hess_one(k, v, wp, wn):
            return jax.hessian(lambda vv: phi(k, vv, wp, wn))(v)

        return jax.vmap(hess_one)(ks, W, W_prev, W_next)

    # ---------------- general rows (stage + terminal constraints) --------
    def general_rows(self, W: jax.Array):
        """Values r [N+1, ng] with bounds rl, ru [N+1, ng].

        Stage constraints apply at k = 0..N-1 (masked by stage_mask);
        terminal constraints at k = N. Equality rows get rl = ru = 0;
        inactive/padded rows get (-inf, +inf) so they never bind."""
        ng = self.ng
        if ng == 0:
            z = jnp.zeros((self.N + 1, 0), W.dtype)
            return z, z, z
        N, nx, nu = self.N, self.nx, self.nu
        inf = jnp.inf

        def stage_rows(k, w):
            x, u, dt = self.split_w(w, nx, nu)
            vals, lo, hi = [], [], []
            sc = self.stage_con
            if sc is not None and (sc.neq or sc.nineq):
                m = self.stage_mask[k]
                if sc.neq:
                    h = m * sc.eq(x, u, dt, self.refs.xref[k], self.refs.uref[k])
                    vals.append(h)
                    lo.append(jnp.zeros((sc.neq,)))
                    hi.append(jnp.zeros((sc.neq,)))
                if sc.nineq:
                    g = m * sc.ineq(x, u, dt, self.refs.xref[k], self.refs.uref[k])
                    vals.append(g)
                    lo.append(jnp.full((sc.nineq,), -inf))
                    hi.append(jnp.zeros((sc.nineq,)))
            out_v = jnp.concatenate(vals) if vals else jnp.zeros((0,))
            out_l = jnp.concatenate(lo) if lo else jnp.zeros((0,))
            out_h = jnp.concatenate(hi) if hi else jnp.zeros((0,))
            padn = ng - out_v.shape[0]
            if padn:
                out_v = jnp.concatenate([out_v, jnp.zeros((padn,))])
                out_l = jnp.concatenate([out_l, jnp.full((padn,), -inf)])
                out_h = jnp.concatenate([out_h, jnp.full((padn,), inf)])
            return out_v, out_l, out_h

        def term_rows(w):
            x = w[:nx]
            vals, lo, hi = [], [], []
            tc = self.term_con
            if tc is not None and (tc.neq or tc.nineq):
                if tc.neq:
                    vals.append(tc.eq(x, self.refs.xref[-1]))
                    lo.append(jnp.zeros((tc.neq,)))
                    hi.append(jnp.zeros((tc.neq,)))
                if tc.nineq:
                    vals.append(tc.ineq(x, self.refs.xref[-1]))
                    lo.append(jnp.full((tc.nineq,), -inf))
                    hi.append(jnp.zeros((tc.nineq,)))
            out_v = jnp.concatenate(vals) if vals else jnp.zeros((0,))
            out_l = jnp.concatenate(lo) if lo else jnp.zeros((0,))
            out_h = jnp.concatenate(hi) if hi else jnp.zeros((0,))
            padn = ng - out_v.shape[0]
            if padn:
                out_v = jnp.concatenate([out_v, jnp.zeros((padn,))])
                out_l = jnp.concatenate([out_l, jnp.full((padn,), -inf)])
                out_h = jnp.concatenate([out_h, jnp.full((padn,), inf)])
            return out_v, out_l, out_h

        ks = jnp.arange(N)
        Wk, _ = adjacent_rows(W)  # axon miscompile workaround, see helper
        sv, sl, sh = jax.vmap(stage_rows)(ks, Wk)
        tv, tl, th = term_rows(W[-1])
        r = jnp.concatenate([sv, tv[None]], axis=0)
        rl = jnp.concatenate([sl, tl[None]], axis=0)
        ru = jnp.concatenate([sh, th[None]], axis=0)
        return r, rl, ru

    def general_row_jacobians(self, W: jax.Array) -> jax.Array:
        """G [N+1, ng, nz]."""
        if self.ng == 0:
            return jnp.zeros((self.N + 1, 0, self.nz), W.dtype)

        def jac_one(k, w):
            def rows_of_w(v):
                # reuse general_rows logic on a single stage
                return self._rows_single(k, v)

            return jax.jacfwd(rows_of_w)(w)

        ks = jnp.arange(self.N + 1)
        return jax.vmap(jac_one)(ks, W)

    def _rows_single(self, k, w):
        """Row values for one stage (stage rows if k<N else terminal rows)."""
        N, nx, nu = self.N, self.nx, self.nu
        ng = self.ng
        x, u, dt = self.split_w(w, nx, nu)
        is_term = k == N
        vals_s = []
        sc = self.stage_con
        kk = jnp.minimum(k, N - 1)
        if sc is not None and (sc.neq or sc.nineq):
            m = self.stage_mask[kk]
            if sc.neq:
                vals_s.append(m * sc.eq(x, u, dt, self.refs.xref[kk], self.refs.uref[kk]))
            if sc.nineq:
                vals_s.append(m * sc.ineq(x, u, dt, self.refs.xref[kk], self.refs.uref[kk]))
        v_s = jnp.concatenate(vals_s) if vals_s else jnp.zeros((0,))
        v_s = jnp.concatenate([v_s, jnp.zeros((ng - v_s.shape[0],))])
        vals_t = []
        tc = self.term_con
        if tc is not None and (tc.neq or tc.nineq):
            if tc.neq:
                vals_t.append(tc.eq(x, self.refs.xref[-1]))
            if tc.nineq:
                vals_t.append(tc.ineq(x, self.refs.xref[-1]))
        v_t = jnp.concatenate(vals_t) if vals_t else jnp.zeros((0,))
        v_t = jnp.concatenate([v_t, jnp.zeros((ng - v_t.shape[0],))])
        return jnp.where(is_term, v_t, v_s)

    # ---------------- structural invariants ----------------
    @property
    def lti_structure(self) -> bool:
        """True when the interval Jacobians J, K are constant in W: linear
        dynamics (all defect schemes and fixed-step integrators compose
        affinely) and dt pinned. Solvers hoist the linearization out of
        their iteration loops then — the TPU analogue of the reference's
        `new_structure=false` CSC pattern reuse (SURVEY.md §3.5), except the
        *values* are constant too, not just the sparsity pattern."""
        return (
            bool(getattr(self.system, "is_linear", False))
            and not self.grid.dt_is_variable
        )

    @property
    def constant_hessian(self) -> bool:
        """True when the cost Hessian blocks are constant in W: quadratic
        cost composed with affine stage maps (LTI + fixed dt)."""
        return self.lti_structure and bool(
            getattr(self.cost, "quadratic", False)
        )

    # ---------------- bounds & pins ----------------
    def w_bounds(self) -> Tuple[jax.Array, jax.Array]:
        """Absolute box bounds lb, ub [N+1, nz] (before pinning)."""
        N, nz = self.N, self.nz
        b = self.bounds
        lb_parts = [b.x_lb, b.u_lb, b.dt_lb[None]]
        ub_parts = [b.x_ub, b.u_ub, b.dt_ub[None]]
        if self.n_aux:
            # midpoint states get the state bounds (ref: midpoint vertices
            # carry the same box bounds as the state vertices)
            lb_parts.append(b.x_lb)
            ub_parts.append(b.x_ub)
        lb_row = jnp.concatenate(lb_parts)
        ub_row = jnp.concatenate(ub_parts)
        lb = jnp.broadcast_to(lb_row, (N + 1, nz))
        ub = jnp.broadcast_to(ub_row, (N + 1, nz))
        return lb, ub

    def fixed_mask(self) -> jax.Array:
        """[N+1, nz] 1.0 where the variable is pinned to its current value:
        x_0 (initial state), xf_fixed components of x_N, stage-N dummy u/dt,
        and all dt columns when the grid's dt is not a decision variable."""
        N, nx, nu, nz = self.N, self.nx, self.nu, self.nz
        m = jnp.zeros((N + 1, nz))
        m = m.at[0, :nx].set(1.0)  # x0 fixed (ref: fixed x0 vertex)
        m = m.at[N, nx:].set(1.0)  # dummy terminal u/dt
        if self.bc.xf_fixed is not None:
            m = m.at[N, :nx].set(jnp.asarray(self.bc.xf_fixed, m.dtype))
        if not self.grid.dt_is_variable:
            m = m.at[:, nx + nu].set(1.0)
        return m

    def apply_boundary(self, traj: Trajectory) -> Trajectory:
        """Overwrite x_0 ← bc.x0 and pinned terminal components ← bc.xf
        (ref: grid update x0 overwrite, full_discretization_grid_base.cpp)."""
        X = traj.X.at[0].set(self.bc.x0)
        if self.bc.xf_fixed is not None and self.bc.xf is not None:
            mask = jnp.asarray(self.bc.xf_fixed, X.dtype)
            X = X.at[-1].set(mask * self.bc.xf + (1.0 - mask) * X[-1])
        return traj.replace(X=X)


def transcribe(
    system: SystemDynamics,
    grid: Grid,
    cost: StageCost,
    bounds: Optional[Bounds] = None,
    x0: Optional[jax.Array] = None,
    xf: Optional[jax.Array] = None,
    xf_fixed: Optional[jax.Array] = None,
    refs: Optional[References] = None,
    stage_con: Optional[StageConstraint] = None,
    term_con: Optional[TerminalConstraint] = None,
    stage_mask: Optional[jax.Array] = None,
) -> TranscribedOCP:
    """Convenience constructor with sensible defaults."""
    nx, nu, N = system.nx, system.nu, grid.N
    if bounds is None:
        bounds = Bounds.unbounded(nx, nu)
    if x0 is None:
        x0 = jnp.zeros((nx,))
    if refs is None:
        xr = xf if xf is not None else jnp.zeros((nx,))
        refs = References.constant(jnp.asarray(xr), jnp.zeros((nu,)), N)
    if stage_mask is None:
        stage_mask = jnp.ones((N,))
    bc = BoundaryConditions(
        x0=jnp.asarray(x0),
        xf=None if xf is None else jnp.asarray(xf),
        xf_fixed=None if xf_fixed is None else jnp.asarray(xf_fixed),
    )
    return TranscribedOCP(
        grid=grid,
        system=system,
        cost=cost,
        stage_con=stage_con,
        term_con=term_con,
        bounds=bounds,
        bc=bc,
        refs=refs,
        stage_mask=jnp.asarray(stage_mask),
    )
