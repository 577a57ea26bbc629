"""TPU-vs-host numerical consistency audit.

The axon TPU backend has miscompiled certain slicing/select patterns inside
vmapped stage functions (see the notes in ocp/transcribe.py:
interval_residuals and interval_residual). CPU tests cannot catch those —
this script evaluates the transcription's residuals/Jacobians for every
defect scheme on the DEFAULT backend (the TPU when run under axon) and
compares against the same computation run through jax's CPU path via pure
numpy inputs evaluated with jax.jit(backend-default) vs non-jit eval.

Run on the TPU machine:  python tools/tpu_consistency_check.py
Exit code 0 = all schemes consistent; 1 = mismatch (prints details).

Also re-audits end-to-end solution accuracy: batched f32 SQP solves on the
default backend against a tight-tolerance solve of the same lanes, flagging
infeasible-but-reported-converged lanes (the signature of a miscompiled
residual).
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, ".")


def check_residual_consistency() -> bool:
    """jit (device) vs eager evaluation of interval residuals/jacobians per scheme."""
    from control_box_rst_tpu.models import VanDerPolOscillator
    from control_box_rst_tpu.ocp import (
        Bounds, QuadraticFormCost, finite_differences_grid,
        multiple_shooting_grid, transcribe,
    )
    from control_box_rst_tpu.ocp.problem import Trajectory

    ok = True
    rng = np.random.default_rng(0)
    N = 12
    sys_ = VanDerPolOscillator()
    schemes = [
        ("fd", "forward"), ("fd", "backward"),
        ("fd", "midpoint"), ("fd", "crank_nicolson"),
        ("fd", "hermite_simpson"), ("fd", "hermite_simpson_lc"),
        ("ms", "rk4"),
    ]
    for kind, scheme in schemes:
        if kind == "fd":
            grid = finite_differences_grid(N, fd_scheme=scheme)
        else:
            grid = multiple_shooting_grid(N, integrator=scheme)
        ocp = transcribe(
            sys_, grid, QuadraticFormCost(Q=jnp.eye(2), R=0.1 * jnp.eye(1)),
            bounds=Bounds.unbounded(2, 1), x0=jnp.array([1.0, 0.5]),
        )
        W = jnp.asarray(
            rng.normal(0.5, 0.5, (N + 1, 4)).astype(np.float32)
        ).at[:, 3].set(0.1)

        c_jit = np.asarray(jax.jit(ocp.interval_residuals)(W))
        # eager per-stage reference (no vmap, no jit): the trusted oracle
        c_ref = np.stack([
            np.asarray(ocp.interval_residual(k, W[k], W[k + 1]))
            for k in range(N)
        ])
        err = float(np.max(np.abs(c_jit - c_ref)))
        J_jit, K_jit, cj = jax.jit(ocp.interval_jacobians)(W)
        errc2 = float(np.max(np.abs(np.asarray(cj) - c_ref)))
        status = "OK" if max(err, errc2) < 1e-4 else "MISMATCH"
        if status != "OK":
            ok = False
        print(f"scheme {kind}/{scheme:<22} residual err {err:.2e} "
              f"(linearize primal {errc2:.2e})  {status}")
    return ok


def check_solution_feasibility(B: int = 256) -> bool:
    """Batched flagship solves: every lane reported CONVERGED must have a
    defect (re-evaluated stage-by-stage, eagerly) below 1e-3."""
    from control_box_rst_tpu.parallel import make_batched_solver
    from control_box_rst_tpu.ocp.problem import Trajectory
    from control_box_rst_tpu.solvers import sqp_solve
    from __graft_entry__ import _flagship

    ocp, cfg = _flagship(N=50)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-1.0, 1.0, size=(B, 2)).astype(np.float32))

    def solve_one(x0):
        o = ocp.replace(bc=ocp.bc.replace(x0=x0))
        t0 = Trajectory.linear_interp(x0, jnp.zeros(2, jnp.float32), 50, 1, 0.1)
        r = sqp_solve(o, t0, cfg)
        return r.W, r.status, r.feas_res

    Ws, status, feas = jax.jit(jax.vmap(solve_one))(x0s)
    Ws = np.asarray(Ws)
    worst = 0.0
    for b in range(B):
        o = ocp.replace(bc=ocp.bc.replace(x0=x0s[b]))
        # eager residuals — independent of the jitted compute path
        c = np.stack([
            np.asarray(o.interval_residual(k, jnp.asarray(Ws[b, k]),
                                           jnp.asarray(Ws[b, k + 1])))
            for k in range(50)
        ])
        worst = max(worst, float(np.max(np.abs(c))))
    print(f"end-to-end: worst true defect over {B} lanes = {worst:.2e} "
          f"(reported feas max {float(jnp.max(feas)):.2e})")
    return worst < 1e-3


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}, device: {jax.devices()[0]}")
    ok = check_residual_consistency()
    ok = check_solution_feasibility() and ok
    print("CONSISTENT" if ok else "INCONSISTENT")
    sys.exit(0 if ok else 1)
