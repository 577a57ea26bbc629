"""Probe: one-shot QP residuals/KKT vs in-kernel round budget."""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "highest")

from control_box_rst_tpu.solvers import QPConfig, SQPConfig
from control_box_rst_tpu.solvers.sqp import sqp_solve
from control_box_rst_tpu.ocp.problem import Trajectory
from __graft_entry__ import _flagship


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


ocp, base = _flagship(N=50)
rng = np.random.default_rng(0)
B = 1024
x0s = jnp.asarray(rng.uniform(-1, 1, size=(B, 2)).astype(np.float32))


def make(cfg):
    def solve_one(x0):
        o = ocp.replace(bc=ocp.bc.replace(x0=x0))
        xf = o.bc.xf if o.bc.xf is not None else o.refs.xref[-1]
        traj0 = Trajectory.linear_interp(x0, xf, 50, 1, 0.1)
        r = sqp_solve(o, traj0, cfg)
        return r.traj.U, r.status, r.iterations, r.qp_iters, r.stat_res, r.feas_res
    return jax.jit(jax.vmap(solve_one))


# sweep one-shot budget via SQP max_iter (one-shot budget = max_iter * qp.max_iter)
for sqp_mi, qp_mi, ipr, tol in [
    (16, 12, 12, 1e-5),
    (8, 12, 12, 1e-5),
    (4, 24, 24, 1e-5),
    (16, 12, 12, 5e-5),
    (16, 12, 12, 2e-4),
]:
    cfg = SQPConfig(
        max_iter=sqp_mi,
        qp=QPConfig(max_iter=qp_mi, iters_per_round=ipr, rho=1.0, tol=tol,
                    backend="fused"),
        tol_stat=5e-4, tol_feas=1e-5,
    )
    f = make(cfg)
    dt, (U, st, it, qpit, stat, feas) = timeit(f, x0s)
    conv = float(jnp.mean((st == 1).astype(jnp.float32)))
    print(
        f"sqp{sqp_mi} qp{qp_mi}/{ipr} tol{tol:g}: {B/dt:.0f}/s conv={conv:.4f} "
        f"it={float(jnp.mean(it.astype(jnp.float32))):.2f} "
        f"qpit mean={float(jnp.mean(qpit.astype(jnp.float32))):.0f} "
        f"max={int(jnp.max(qpit))} "
        f"stat p50={float(jnp.median(stat)):.1e} max={float(jnp.max(stat)):.1e} "
        f"feas max={float(jnp.max(feas)):.1e}",
        flush=True,
    )
