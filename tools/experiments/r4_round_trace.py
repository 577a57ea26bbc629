"""Trace per-round ADMM + KKT residuals of the one-shot QP (CPU, f32)."""
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
from control_box_rst_tpu.solvers.stage_qp import (
    StageQP, _round_reference_fn,
)
from control_box_rst_tpu.ops.smallmat import mv_small, mv_small_t
from __graft_entry__ import _flagship

ocp, base = _flagship(N=50)
x0 = jnp.asarray([0.9, -0.7], jnp.float32)
o = ocp.replace(bc=ocp.bc.replace(x0=x0))
N, nz, nc, ng = o.N, o.nz, o.nc, o.ng
traj0 = Trajectory.linear_interp(x0, o.refs.xref[-1], N, 1, 0.1)
traj0 = o.apply_boundary(traj0)
W0 = o.pack(traj0)
dtype = W0.dtype
print("dtype", dtype)

pin = o.fixed_mask().astype(dtype)
free = 1.0 - pin
lb, ub = o.w_bounds()
BIG = jnp.asarray(1e8, dtype)
lb = jnp.maximum(lb, -BIG)
ub = jnp.minimum(ub, BIG)

J, K, _ = o.interval_jacobians(W0)
Jm = J * free[:-1, None, :]
Km = K * free[1:, None, :]
Hm = o.cost_hessian_blocks(W0) * free[:, None, :] * free[:, :, None]
c0 = o.interval_residuals(W0)
gm = o.cost_gradient(W0) * free
dlb = jnp.where(free > 0, lb - W0, 0.0)
dub = jnp.where(free > 0, ub - W0, 0.0)

cfg = QPConfig(max_iter=12, iters_per_round=12, rho=1.0, tol=1e-5)
round_ref = _round_reference_fn(cfg, 12)

x = jnp.zeros_like(W0)
z_b = jnp.zeros_like(W0)
y_d = jnp.zeros((N, nc), dtype)
y_b = jnp.zeros_like(W0)
rho = jnp.asarray(1.0, dtype)

tol_stat, tol_feas = 5e-4, 1e-5
for rnd in range(20):
    x, z_b, y_d, y_b, pr, dr = round_ref(
        Hm, Jm, Km, gm, c0, dlb, dub, rho, x, z_b, y_d, y_b
    )
    ax = mv_small(Jm, x[:-1]) + mv_small(Km, x[1:])
    feas = float(jnp.max(jnp.abs(ax + c0)))
    gl = gm + jnp.einsum("kij,kj->ki", Hm, x) + y_b
    gl = gl.at[:-1].add(mv_small_t(Jm, y_d))
    gl = gl.at[1:].add(mv_small_t(Km, y_d))
    stat = float(jnp.max(jnp.where(dlb != dub, jnp.abs(gl), 0.0)))
    scale = jnp.sqrt(pr / jnp.maximum(dr, 1e-30))
    rho_new = jnp.clip(rho * jnp.clip(scale, 0.1, 10.0), cfg.rho_min, cfg.rho_max)
    conv = (stat < tol_stat) and (feas < tol_feas)
    print(f"rnd {rnd:2d}: pr={float(pr):.2e} dr={float(dr):.2e} "
          f"stat={stat:.2e} feas={feas:.2e} rho={float(rho):.3g} conv={conv}")
    if conv:
        break
    rho = rho_new
