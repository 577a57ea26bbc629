"""Benchmark: batched H=50 SQP solves/s on one TPU chip (BASELINE north star).

Prints ONE JSON line:
  {"metric": "h50_sqp_solves_per_s_per_chip", "value": N, "unit": "solves/s",
   "vs_baseline": N / 1000}

Baseline target (BASELINE.json): ≥ 1000 H=50 SQP solves/s/chip on config 1
(double integrator, quadratic cost, input bounds, SQP+ADMM).
Each "solve" is a full cold-start SQP solve (linear-interp init, no warm
start): linearize → block-tridiagonal ADMM QP → line search, iterated to
convergence (max 6 SQP iterations — 2 suffice on this problem class).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# full f32 matmul precision: the solver does small-matrix algebra where
# bf16 MXU default precision is insufficient
jax.config.update("jax_default_matmul_precision", "highest")


def main():
    from control_box_rst_tpu.parallel import make_batched_solver
    from __graft_entry__ import _flagship

    ocp, cfg = _flagship(N=50)
    solver = make_batched_solver(ocp, cfg, dt_init=0.1)

    B = 1024
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        rng.uniform(-1.0, 1.0, size=(B, 2)).astype(np.float32)
    )

    # warm-up / compile
    U, obj, status, iters = solver(x0s)
    jax.block_until_ready(U)

    reps = 5
    t0 = time.perf_counter()
    for r in range(reps):
        U, obj, status, iters = solver(x0s)
    jax.block_until_ready(U)
    dt_total = time.perf_counter() - t0

    solves_per_s = B * reps / dt_total
    conv = float(jnp.mean((status == 1).astype(jnp.float32)))

    # single-solve p99 latency (real-time MPC stepping): block cyclic
    # reduction linear solver — log-depth, ~6x lower latency at B=1
    from control_box_rst_tpu.solvers import QPConfig, SQPConfig

    cfg_lat = SQPConfig(
        max_iter=6, qp=QPConfig(max_iter=100, tol=1e-5, linsolver="bcr"),
        tol_stat=5e-4, tol_feas=1e-5,
    )
    solver1 = make_batched_solver(ocp, cfg_lat, dt_init=0.1)
    x0_1 = x0s[:1]
    jax.block_until_ready(solver1(x0_1)[0])
    lats = []
    for _ in range(50):
        t0 = time.perf_counter()
        jax.block_until_ready(solver1(x0_1)[0])
        lats.append(time.perf_counter() - t0)
    p99_ms = float(np.percentile(np.asarray(lats), 99) * 1e3)

    result = {
        "metric": "h50_sqp_solves_per_s_per_chip",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 1000.0, 3),
        "batch": B,
        "converged_frac": round(conv, 4),
        "mean_sqp_iters": round(float(jnp.mean(iters.astype(jnp.float32))), 2),
        "p99_single_solve_ms": round(p99_ms, 2),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
