"""Sweep one-shot kkt tolerances on TPU; measure throughput + err vs f64 oracle."""
import pathlib
import subprocess
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

ROOT = pathlib.Path(__file__).resolve().parents[2]

B = 1024
rng = np.random.default_rng(0)
x0s_np = rng.uniform(-1.0, 1.0, size=(B, 2)).astype(np.float32)
x0s = jnp.asarray(x0s_np)

# oracle on a subsample (cached across invocations — deterministic seed)
SUB = 128
if not pathlib.Path("/tmp/fid_out.npz").exists():
    np.savez("/tmp/fid_in.npz", x0s=x0s_np[:SUB])
    subprocess.run(
        [sys.executable, str(ROOT / "tools/oracle_solve.py"),
         "/tmp/fid_in.npz", "/tmp/fid_out.npz"],
        check=True, capture_output=True,
    )
U_oracle = np.load("/tmp/fid_out.npz")["U"]


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


ocp, _ = _flagship(N=50)

variants = [
    ("fused ts1e-4/12", SQPConfig(
        max_iter=16, qp=QPConfig(max_iter=12, iters_per_round=12, rho=1.0,
                                 tol=1e-5, backend="fused"),
        tol_stat=1e-4, tol_feas=1e-5)),
    ("fused ts2e-4/8", SQPConfig(
        max_iter=24, qp=QPConfig(max_iter=8, iters_per_round=8, rho=1.0,
                                 tol=1e-5, backend="fused"),
        tol_stat=2e-4, tol_feas=1e-5)),
    ("fused ts1e-4/8", SQPConfig(
        max_iter=24, qp=QPConfig(max_iter=8, iters_per_round=8, rho=1.0,
                                 tol=1e-5, backend="fused"),
        tol_stat=1e-4, tol_feas=1e-5)),
    ("fused ts1e-4/8 rho2", SQPConfig(
        max_iter=24, qp=QPConfig(max_iter=8, iters_per_round=8, rho=2.0,
                                 tol=1e-5, backend="fused"),
        tol_stat=1e-4, tol_feas=1e-5)),
    ("fused ts1e-4/8 rho0.5", SQPConfig(
        max_iter=24, qp=QPConfig(max_iter=8, iters_per_round=8, rho=0.5,
                                 tol=1e-5, backend="fused"),
        tol_stat=1e-4, tol_feas=1e-5)),
]
sel = [int(a) for a in sys.argv[1:]] or range(len(variants))
for idx in sel:
    name, cfg = variants[idx]
    solver = make_batched_solver(ocp, cfg, dt_init=0.1)
    t0 = time.perf_counter()
    jax.block_until_ready(solver(x0s)[0])
    tc = time.perf_counter() - t0
    dt, (U, obj, st, it) = timeit(solver, x0s)
    conv = float(jnp.mean((st == 1).astype(jnp.float32)))
    err = float(np.max(np.abs(np.asarray(U[:SUB], np.float64) - U_oracle)))
    print(f"{name}: {B/dt:7.0f}/s conv={conv:.4f} "
          f"it={float(jnp.mean(it.astype(jnp.float32))):.2f} "
          f"max|U-oracle|={err:.2e} compile={tc:.0f}s", flush=True)
