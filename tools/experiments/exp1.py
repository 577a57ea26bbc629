"""Throughput profiling: where does the batched SQP solve spend time?"""
import time
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

for B in (1024, 4096):
    x0s = jnp.asarray(rng.uniform(-1, 1, size=(B, 2)).astype(np.float32))
    solver = make_batched_solver(ocp, cfg, dt_init=0.1)
    dt, (U, obj, status, iters) = timeit(solver, x0s)
    print(f"B={B}: {B/dt:.0f} solves/s  conv={float(jnp.mean((status==1).astype(jnp.float32))):.4f} sqp_iters={float(jnp.mean(iters)):.2f}")

# raw kernel round timing at B=1024
from control_box_rst_tpu.ops.pallas.admm_kernel import admm_round_pallas

B, Kst, nz, nc = 1024, 51, 3, 2
key = jax.random.PRNGKey(0)
mk = lambda *s: jax.random.normal(key, s, jnp.float32) * 0.1
Hd = jnp.broadcast_to(jnp.eye(nz, dtype=jnp.float32), (B, Kst, nz, nz))
J = mk(B, Kst - 1, nc, nz)
K = mk(B, Kst - 1, nc, nz)
g = mk(B, Kst, nz)
c = mk(B, Kst - 1, nc)
dlb = jnp.full((B, Kst, nz), -1.0, jnp.float32)
dub = jnp.full((B, Kst, nz), 1.0, jnp.float32)
rho = jnp.full((B,), 0.1, jnp.float32)
x = jnp.zeros((B, Kst, nz), jnp.float32)
zb = jnp.zeros((B, Kst, nz), jnp.float32)
yd = jnp.zeros((B, Kst - 1, nc), jnp.float32)
yb = jnp.zeros((B, Kst, nz), jnp.float32)

for iters_n in (50, 25):
    f = jax.jit(lambda *a: admm_round_pallas(
        *a, iters=iters_n, sigma=1e-6, alpha=1.6, rho_eq_scale=1e3))
    dt, _ = timeit(f, Hd, J, K, g, c, dlb, dub, rho, x, zb, yd, yb, reps=20)
    print(f"kernel round iters={iters_n}: {dt*1e3:.2f} ms  ({dt*1e3/iters_n:.3f} ms/iter)")

# QP budget variants at B=1024
x0s = jnp.asarray(rng.uniform(-1, 1, size=(1024, 2)).astype(np.float32))
for label, qp in (
    ("round25/max100", QPConfig(max_iter=100, iters_per_round=25)),
    ("round50/max100", QPConfig(max_iter=100, iters_per_round=50)),
    ("round25/max200", QPConfig(max_iter=200, iters_per_round=25)),
):
    c2 = SQPConfig(max_iter=6, qp=qp, tol_stat=5e-4, tol_feas=2e-5)
    solver = make_batched_solver(ocp, c2, dt_init=0.1)
    dt, (U, obj, status, iters) = timeit(solver, x0s)
    print(f"{label}: {1024/dt:.0f} solves/s  conv={float(jnp.mean((status==1).astype(jnp.float32))):.4f} sqp_iters={float(jnp.mean(iters)):.2f}")
