"""Benchmark tasks.

Ref parity:
  - BenchmarkTaskVaryingInitialState (ref: src/tasks/include/corbo-tasks/
    benchmark_task_varying_initial_state.h:46; src/benchmark_task_varying_
    initial_state.cpp:35-80): sweep a 2-D grid of initial states (x01 × x02),
    rerunning the wrapped closed-loop task per x0 — SEQUENTIALLY in the
    reference. Here the whole sweep is ONE vmapped, optionally mesh-sharded
    closed-loop rollout batch: the reference's outer for-loop becomes the
    chip-filling batch axis (SURVEY.md §2.7).
  - BenchmarkTaskIncreasingNOpenLoop (benchmark_task_increasing_n_open_loop.
    h:48): open-loop solves over a sweep of horizon lengths N. Horizon is a
    static shape, so this sweep compiles one program per N (cached across
    repeats) — or, with `use_mask=True`, pads to max(N) and reuses ONE
    compiled program with stage masks (no recompilation, the TPU-native way).
"""
from __future__ import annotations

import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from control_box_rst_tpu.control.predictive import PredictiveController
from control_box_rst_tpu.ocp.problem import Trajectory
from control_box_rst_tpu.sim.closed_loop import ClosedLoopResult, run_closed_loop
from control_box_rst_tpu.sim.plant import SimulatedPlant
from control_box_rst_tpu.solvers.sqp import SQPConfig, sqp_solve


def benchmark_varying_initial_state(
    plant: SimulatedPlant,
    controller,
    x01_values: jax.Array,
    x02_values: jax.Array,
    T_steps: int,
    dt: float,
    x0_template: Optional[jax.Array] = None,
    mesh=None,
    key=None,
):
    """Closed-loop rollouts over the grid x01 × x02 (first two state dims).

    Returns a ClosedLoopResult batch with leading axis len(x01)*len(x02),
    plus the flattened x0 grid.
    """
    nx = plant.system.nx
    if x0_template is None:
        x0_template = jnp.zeros((nx,))
    g1, g2 = jnp.meshgrid(jnp.asarray(x01_values), jnp.asarray(x02_values),
                          indexing="ij")
    x0s = (
        jnp.tile(x0_template[None, :], (g1.size, 1))
        .at[:, 0].set(g1.ravel())
        .at[:, 1].set(g2.ravel())
    )
    if key is None:
        key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, x0s.shape[0])

    roll = jax.vmap(
        lambda x0, k: run_closed_loop(
            plant, controller, x0, T_steps=T_steps, dt=dt, key=k
        )
    )
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(mesh, P("batch"))
        x0s = jax.device_put(x0s, sh)
        keys = jax.device_put(keys, sh)
        roll = jax.jit(roll, in_shardings=(sh, sh), out_shardings=sh)
    else:
        roll = jax.jit(roll)
    return roll(x0s, keys), x0s


def benchmark_increasing_n_open_loop(
    make_ocp,
    N_values: Sequence[int],
    x0: jax.Array,
    dt_init: float,
    cfg: Optional[SQPConfig] = None,
):
    """Open-loop solve per horizon length N; returns per-N results + timings.

    `make_ocp(N)` builds the transcribed OCP for horizon N (shape change →
    one compile per N, like the reference's per-N problem rebuild).
    """
    cfg = cfg or SQPConfig()
    results = []
    for N in N_values:
        ocp = make_ocp(int(N))
        xf = ocp.bc.xf if ocp.bc.xf is not None else ocp.refs.xref[-1]
        traj0 = Trajectory.linear_interp(x0, xf, int(N), ocp.nu, dt_init)
        solve = jax.jit(lambda o, t: sqp_solve(o, t, cfg))
        res = solve(ocp, traj0)  # compile + run
        jax.block_until_ready(res.W)
        t0 = time.perf_counter()
        res = solve(ocp, traj0)
        jax.block_until_ready(res.W)
        wall = time.perf_counter() - t0
        results.append(
            {
                "N": int(N),
                "objective": float(res.objective),
                "iterations": int(res.iterations),
                "feas_res": float(res.feas_res),
                "status": int(res.status),
                "solve_time_s": wall,
            }
        )
    return results


def benchmark_increasing_n_masked(
    ocp_max,
    N_values: Sequence[int],
    x0: jax.Array,
    dt_init: float,
    cfg: Optional[SQPConfig] = None,
):
    """Same sweep with ONE compiled program: the OCP is built at N_max and
    shorter horizons are expressed through stage masks (inactive tail
    intervals collapse to identity chains — see ocp/transcribe.py). All
    N values can even be solved as one vmapped batch."""
    cfg = cfg or SQPConfig()
    N_max = ocp_max.N
    xf = ocp_max.bc.xf if ocp_max.bc.xf is not None else ocp_max.refs.xref[-1]

    @jax.jit
    @jax.vmap
    def solve_masked(n_active):
        mask = (jnp.arange(N_max) < n_active).astype(jnp.float64 if
                jax.config.jax_enable_x64 else jnp.float32)
        o = ocp_max.replace(stage_mask=mask)
        traj0 = Trajectory.linear_interp(x0, xf, N_max, o.nu, dt_init)
        res = sqp_solve(o, traj0, cfg)
        return res.objective, res.iterations, res.feas_res

    ns = jnp.asarray(list(N_values))
    obj, iters, feas = solve_masked(ns)
    return [
        {
            "N": int(n),
            "objective": float(o),
            "iterations": int(i),
            "feas_res": float(f),
        }
        for n, o, i, f in zip(np.asarray(ns), np.asarray(obj),
                              np.asarray(iters), np.asarray(feas))
    ]
