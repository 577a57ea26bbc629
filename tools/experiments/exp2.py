"""Single-solve latency experiments (B=1, real-time MPC stepping)."""
import time
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "highest")

from control_box_rst_tpu.parallel import make_batched_solver
from control_box_rst_tpu.solvers import QPConfig, SQPConfig
from __graft_entry__ import _flagship


def lat(fn, *args, reps=30):
    jax.block_until_ready(fn(*args)[0])
    ls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args)[0])
        ls.append(time.perf_counter() - t0)
    ls = np.array(ls) * 1e3
    return np.percentile(ls, 50), np.percentile(ls, 99)


ocp, cfg_flag = _flagship(N=50)
x0 = jnp.asarray(np.array([[0.7, -0.3]], np.float32))

variants = {
    "bench cfg_lat (bcr, max100/round50)": SQPConfig(
        max_iter=6, qp=QPConfig(max_iter=100, tol=1e-5, linsolver="bcr"),
        tol_stat=5e-4, tol_feas=1e-5),
    "flagship (short rounds, scan)": cfg_flag,
    "flagship + bcr": cfg_flag.replace(qp=cfg_flag.qp.replace(linsolver="bcr")),
    "scan max100/round50": SQPConfig(
        max_iter=6, qp=QPConfig(max_iter=100, tol=1e-5, linsolver="scan"),
        tol_stat=5e-4, tol_feas=1e-5),
}
for name, c in variants.items():
    solver = make_batched_solver(ocp, c, dt_init=0.1)
    U, obj, status, iters = solver(x0)
    p50, p99 = lat(solver, x0)
    print(f"{name}: p50={p50:.2f} ms p99={p99:.2f} ms conv={int(status[0])} sqp_iters={int(iters[0])}")

# force the fused kernel at B=1 (pad to one tile inside the kernel)
import control_box_rst_tpu.solvers.stage_qp as sq
orig = sq._make_fused_round
def patched(cfg, iters, tol):
    import functools
    fr = orig(cfg, iters, tol)
    return fr
# monkeypatch the batch threshold: rewrite _rule? easier: call the batched
# solver with backend='fused' and batch padded to 64
cfgf = cfg_flag.replace(qp=cfg_flag.qp.replace(backend="fused"))
solver_f = make_batched_solver(ocp, cfgf, dt_init=0.1)
x0_64 = jnp.tile(x0, (64, 1))
U, obj, status, iters = solver_f(x0_64)
p50, p99 = lat(solver_f, x0_64)
print(f"fused kernel @B=64 (same x0): p50={p50:.2f} ms p99={p99:.2f} ms conv={int(status[0])} sqp_iters={int(iters[0])}")

# warm-started MPC step latency (representative real-time use)
from control_box_rst_tpu.control.predictive import PredictiveController

ctrl = PredictiveController(ocp=ocp, cfg=cfg_flag.replace(
    qp=cfg_flag.qp.replace(linsolver="bcr")), dt=0.1)
carry = ctrl.init_carry(x0[0])
step = jax.jit(lambda c, x: ctrl.step(c, x, 0.0, 0.1))
carry2, out = step(carry, x0[0])
ls = []
for _ in range(30):
    t0 = time.perf_counter()
    carry2, out = step(carry2, x0[0])
    jax.block_until_ready(out.u)
    ls.append(time.perf_counter() - t0)
ls = np.array(ls) * 1e3
print(f"warm MPC step (bcr): p50={np.percentile(ls,50):.2f} ms p99={np.percentile(ls,99):.2f} ms")
