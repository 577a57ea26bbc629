"""CPU check: recentered full-solve reference converges the one-shot QP."""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import os
os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "highest")

from control_box_rst_tpu.ocp.problem import Trajectory
from control_box_rst_tpu.solvers import QPConfig
from control_box_rst_tpu.solvers.stage_qp import _make_fused_solve
from control_box_rst_tpu.ops.smallmat import mv_small, mv_small_t
from __graft_entry__ import _flagship

ocp, base = _flagship(N=50)
N, nz, nc, ng = ocp.N, ocp.nz, ocp.nc, ocp.ng

rng = np.random.default_rng(0)
x0s = jnp.asarray(rng.uniform(-1, 1, size=(64, 2)).astype(np.float32))

tol_stat, tol_feas = 5e-4, 1e-5
cfg = QPConfig(max_iter=12, iters_per_round=12, rho=1.0, tol=1e-5,
               kkt_tols=(tol_stat, tol_feas))
fused_solve, reference = _make_fused_solve(cfg, max_iter=16 * 12, tol=1e-5)


def one(x0):
    o = ocp.replace(bc=ocp.bc.replace(x0=x0))
    traj0 = Trajectory.linear_interp(x0, o.refs.xref[-1], N, 1, 0.1)
    traj0 = o.apply_boundary(traj0)
    W0 = o.pack(traj0)
    dtype = W0.dtype
    pin = o.fixed_mask().astype(dtype)
    free = 1.0 - pin
    lb, ub = o.w_bounds()
    BIG = jnp.asarray(1e8, dtype)
    lb, ub = jnp.maximum(lb, -BIG), jnp.minimum(ub, BIG)
    J, K, _ = o.interval_jacobians(W0)
    Jm, Km = J * free[:-1, None, :], K * free[1:, None, :]
    Hm = o.cost_hessian_blocks(W0) * free[:, None, :] * free[:, :, None]
    c0 = o.interval_residuals(W0)
    gm = o.cost_gradient(W0) * free
    dlb = jnp.where(free > 0, lb - W0, 0.0)
    dub = jnp.where(free > 0, ub - W0, 0.0)
    zeros = jnp.zeros_like(W0)
    xt, z_b, y_d, y_b, pr, dr, it = reference(
        Hm, Jm, Km, gm, c0, dlb, dub, jnp.asarray(1.0, dtype),
        zeros, zeros, jnp.zeros((N, nc), dtype), zeros,
    )
    # NLP KKT at solution
    W = W0 + xt * free
    gm1 = o.cost_gradient(W) * free
    gl = gm1.at[:-1].add(mv_small_t(Jm, y_d)).at[1:].add(mv_small_t(Km, y_d))
    gl = gl + y_b * free
    stat = jnp.max(jnp.abs(gl * free))
    feas = jnp.max(jnp.abs(o.interval_residuals(W)))
    return stat, feas, it, W


stats, feass, its, Ws = jax.jit(jax.vmap(one))(x0s)
conv = (stats < tol_stat) & (feass < tol_feas)
print(f"converged: {float(jnp.mean(conv.astype(jnp.float32))):.4f}")
print(f"stat p50={float(jnp.median(stats)):.2e} max={float(jnp.max(stats)):.2e}")
print(f"feas max={float(jnp.max(feass)):.2e}")
print(f"qp iters: mean={float(jnp.mean(its)):.0f} max={float(jnp.max(its)):.0f}")
