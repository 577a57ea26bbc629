"""Batched MPC solving — the production batch API in ~30 lines.

Runs BASELINE config 1 (double integrator, H=50, quadratic cost, |u| <= 1)
for a batch of initial states through the same path bench.py measures
(1.68M solves/s/chip at B=32768 on a TPU v5e; on CPU this runs the XLA
backend at whatever the host can do).

    python examples/batch_solve.py [--batch 1024] [--platform cpu]
"""
import argparse
import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--platform", default=None,
                    help="e.g. 'cpu' to force the CPU backend")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import numpy as np

    from control_box_rst_tpu.parallel import make_batched_solver
    from __graft_entry__ import _flagship

    ocp, cfg = _flagship(N=50)
    solver = make_batched_solver(ocp, cfg, dt_init=0.1)

    rng = np.random.default_rng(0)
    x0s = jnp.asarray(
        rng.uniform(-1.0, 1.0, size=(args.batch, 2)).astype(np.float32)
    )

    U, obj, status, iters = solver(x0s)  # compile + solve
    jax.block_until_ready(U)
    t0 = time.perf_counter()
    U, obj, status, iters = solver(x0s)
    jax.block_until_ready(U)
    dt = time.perf_counter() - t0

    conv = float(jnp.mean((status == 1).astype(jnp.float32)))
    print(f"batch {args.batch}: {args.batch / dt:,.0f} solves/s on "
          f"{jax.devices()[0].platform}, converged {conv:.1%}, "
          f"first controls {np.round(np.asarray(U[:3, 0, 0]), 4)}")


if __name__ == "__main__":
    main()
