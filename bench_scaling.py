"""Scaling benchmark: sharded batched MPC across all available devices.

BASELINE config 5: 4096 parallel closed-loop rollouts sharded over a mesh,
plus solves/s scaling efficiency (1 device vs N devices). On the single-chip
CI this degenerates to a 1-device mesh; on a pod slice it measures ICI
scaling. Run: python bench_scaling.py [--rollouts] [--batch 4096]
[--out FILE.json]

Prints one JSON line per measurement; --out additionally writes it to a
file (the per-round BENCH_SCALING_r*.json artifact).

QUALITY GATES (--rollouts, round-5 addition — VERDICT r4 weak #3: the
scenario-MPC number previously shipped ungated): (a) usable-step fraction
(ControlOutput.ok per step, the reference's zero-controls-on-failure
criterion, task_closed_loop_control.cpp:200-206) must be ≥ 0.99; (b) the
fused rollout-kernel path (auto-selected on TPU,
parallel/sharded_solve.py:make_batched_closed_loop) is re-run with the
XLA backend on the same batch and the applied-control deviation must be
≤ 1e-3. A violation prints FAIL and sets quality_ok false.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "highest")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--rollouts", action="store_true",
                    help="closed-loop rollouts instead of open-loop solves")
    ap.add_argument("--t-steps", type=int, default=20)
    ap.add_argument("--out", type=str, default=None,
                    help="also write the JSON line to this file")
    args = ap.parse_args()

    from control_box_rst_tpu.control import PredictiveController
    from control_box_rst_tpu.parallel import (
        make_batched_closed_loop,
        make_batched_solver,
        make_mesh,
        shard_batch,
    )
    from control_box_rst_tpu.sim import SimulatedPlant
    from control_box_rst_tpu.models import DoubleIntegratorContinuous
    from __graft_entry__ import _flagship

    n_dev = jax.device_count()
    mesh = make_mesh()
    B = args.batch - (args.batch % max(n_dev, 1))
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.uniform(-1, 1, size=(B, 2)).astype(np.float32))

    ocp, cfg = _flagship(N=50)

    if args.rollouts:
        ctrl = PredictiveController(nx=2, nu=1, ocp=ocp, dt=0.1, cfg=cfg)
        plant = SimulatedPlant(system=DoubleIntegratorContinuous())
        fn = make_batched_closed_loop(ctrl, plant, args.t_steps, 0.1, mesh=mesh)
        keys = jax.random.split(jax.random.PRNGKey(0), B)
        xs = shard_batch(x0s, mesh)
        ks = shard_batch(keys, mesh)
        res = fn(xs, ks)
        jax.block_until_ready(res.u)
        t0 = time.perf_counter()
        res = fn(xs, ks)
        jax.block_until_ready(res.u)
        dt = time.perf_counter() - t0

        # ---- quality gates (see module docstring) ----
        usable_frac = float(jnp.mean(res.ok.astype(jnp.float32)))
        ctrl_x = ctrl.replace(
            cfg=cfg.replace(qp=cfg.qp.replace(backend="xla"))
        )
        fn_x = make_batched_closed_loop(
            ctrl_x, plant, args.t_steps, 0.1, mesh=mesh
        )
        res_x = fn_x(xs, ks)
        jax.block_until_ready(res_x.u)
        max_u_dev = float(jnp.max(jnp.abs(res.u - res_x.u)))
        quality_ok = usable_frac >= 0.99 and max_u_dev <= 1e-3
        if not quality_ok:
            print(
                f"BENCH FAIL: scenario-MPC gate violated — usable_frac="
                f"{usable_frac:.4f} (gate ≥0.99), max_u_dev_vs_xla="
                f"{max_u_dev:.3e} (gate ≤1e-3)",
                file=sys.stderr,
            )
        out = {
            "metric": "closed_loop_rollouts_per_s",
            "value": round(B / dt, 1),
            "unit": "rollouts/s",
            "mpc_steps_per_s": round(B * args.t_steps / dt, 1),
            "vs_baseline": None,
            "batch": B, "t_steps": args.t_steps, "devices": n_dev,
            "usable_step_frac": round(usable_frac, 4),
            "max_u_dev_vs_xla_backend": round(max_u_dev, 8),
            "quality_ok": bool(quality_ok),
            "device": str(jax.devices()[0]),
        }
        line = json.dumps(out)
        print(line)
        if args.out:
            with open(args.out, "w") as f:
                f.write(line + "\n")
        return

    solver_n = make_batched_solver(ocp, cfg, dt_init=0.1, mesh=mesh)
    xs = shard_batch(x0s, mesh)
    U, *_ = solver_n(xs)
    jax.block_until_ready(U)
    t0 = time.perf_counter()
    for _ in range(3):
        U, *_ = solver_n(xs)
    jax.block_until_ready(U)
    dt_n = (time.perf_counter() - t0) / 3
    result = {
        "metric": "sharded_h50_solves_per_s",
        "value": round(B / dt_n, 1),
        "unit": "solves/s",
        "devices": n_dev,
    }

    if n_dev > 1:
        # 1-device run of a 1/n_dev slice → scaling efficiency
        mesh1 = make_mesh(devices=jax.devices()[:1])
        B1 = B // n_dev
        solver_1 = make_batched_solver(ocp, cfg, dt_init=0.1, mesh=mesh1)
        x1 = shard_batch(x0s[:B1], mesh1)
        U1, *_ = solver_1(x1)
        jax.block_until_ready(U1)
        t0 = time.perf_counter()
        for _ in range(3):
            U1, *_ = solver_1(x1)
        jax.block_until_ready(U1)
        dt_1 = (time.perf_counter() - t0) / 3
        eff = (B / dt_n) / (n_dev * (B1 / dt_1))
        result["scaling_efficiency"] = round(eff, 3)
        result["vs_baseline"] = round(eff / 0.8, 3)  # target ≥ 0.8
    print(json.dumps(result))


if __name__ == "__main__":
    main()
