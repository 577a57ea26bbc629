"""Round-4 check: one-shot fused LTI path w/ full budget + outer-loop fallback.

Measures converged_frac, throughput, and max |dU| vs the XLA outer-loop path.
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "highest")

from control_box_rst_tpu.parallel import make_batched_solver
from control_box_rst_tpu.solvers import QPConfig, SQPConfig
from __graft_entry__ import _flagship


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


ocp, cfg = _flagship(N=50)
rng = np.random.default_rng(0)
B = 1024
x0s = jnp.asarray(rng.uniform(-1, 1, size=(B, 2)).astype(np.float32))

# fused path (auto-selected on TPU)
solver = make_batched_solver(ocp, cfg, dt_init=0.1)
t0 = time.perf_counter()
U, obj, st, it = solver(x0s)
jax.block_until_ready(U)
print(f"fused compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
dt, (U, obj, st, it) = timeit(solver, x0s)
conv = float(jnp.mean((st == 1).astype(jnp.float32)))
print(f"fused: {B/dt:.0f} solves/s  converged_frac={conv:.4f} "
      f"mean_iters={float(jnp.mean(it.astype(jnp.float32))):.2f}", flush=True)

# XLA outer-loop path (r2 reference semantics)
cfg_xla = cfg.replace(qp=cfg.qp.replace(backend="xla"))
solver_x = make_batched_solver(ocp, cfg_xla, dt_init=0.1)
dtx, (Ux, objx, stx, itx) = timeit(solver_x, x0s)
convx = float(jnp.mean((stx == 1).astype(jnp.float32)))
print(f"xla:   {B/dtx:.0f} solves/s  converged_frac={convx:.4f}", flush=True)

dU = float(jnp.max(jnp.abs(U - Ux)))
print(f"max |dU| fused vs xla: {dU:.2e}", flush=True)
