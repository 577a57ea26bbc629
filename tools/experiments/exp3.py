"""One-shot fused LTI path: operating-point sweep on TPU."""
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


ocp, _ = _flagship(N=50)
rng = np.random.default_rng(0)
x0s_1k = jnp.asarray(rng.uniform(-1, 1, size=(1024, 2)).astype(np.float32))
x0s_4k = jnp.asarray(rng.uniform(-1, 1, size=(4096, 2)).astype(np.float32))
x0_1 = x0s_1k[:1]

variants = {
    "m60/r12/rho1": QPConfig(max_iter=60, iters_per_round=12, rho=1.0, tol=1e-5),
    "m48/r16/rho1": QPConfig(max_iter=48, iters_per_round=16, rho=1.0, tol=1e-5),
    "m100/r25/rho0.1": QPConfig(max_iter=100, iters_per_round=25, rho=0.1, tol=1e-5),
    "m96/r24/rho1": QPConfig(max_iter=96, iters_per_round=24, rho=1.0, tol=1e-5),
}
for name, qp in variants.items():
    cfg = SQPConfig(max_iter=16, qp=qp, tol_stat=5e-4, tol_feas=1e-5)
    solver = make_batched_solver(ocp, cfg, dt_init=0.1)
    dt1, (U, obj, st, it) = timeit(solver, x0s_1k)
    conv1 = float(jnp.mean((st == 1).astype(jnp.float32)))
    dt4, (U4, obj4, st4, it4) = timeit(solver, x0s_4k)
    conv4 = float(jnp.mean((st4 == 1).astype(jnp.float32)))
    # B=1 latency
    jax.block_until_ready(solver(x0_1)[0])
    ls = []
    for _ in range(30):
        t0 = time.perf_counter()
        jax.block_until_ready(solver(x0_1)[0])
        ls.append(time.perf_counter() - t0)
    ls = np.array(ls) * 1e3
    print(
        f"{name}: B1k {1024/dt1:.0f}/s conv={conv1:.4f} | "
        f"B4k {4096/dt4:.0f}/s conv={conv4:.4f} | "
        f"B=1 p50={np.percentile(ls,50):.2f}ms p99={np.percentile(ls,99):.2f}ms"
    )
