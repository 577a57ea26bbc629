"""Sharded batched MPC solves and closed-loop rollouts.

The TPU-native replacement for the reference's sequential benchmark sweeps
(ref: benchmark_task_varying_initial_state.cpp:35-80) and the scaling story
of BASELINE config 5: 4096 closed-loop rollouts sharded over a pod slice.

Implementation note: each MPC solve is independent, so the jitted vmapped
solve partitions along the batch axis with zero communication; `psum`-style
collectives appear only in the summary metrics (computed here with a plain
jnp reduction that XLA lowers to an all-reduce over ICI when the inputs are
sharded).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from control_box_rst_tpu.control.predictive import PredictiveController
from control_box_rst_tpu.ocp.problem import Trajectory
from control_box_rst_tpu.ocp.transcribe import TranscribedOCP
from control_box_rst_tpu.sim.closed_loop import run_closed_loop
from control_box_rst_tpu.sim.plant import SimulatedPlant
from control_box_rst_tpu.solvers.sqp import SQPConfig, sqp_solve


def make_batched_solver(
    ocp: TranscribedOCP,
    cfg: Optional[SQPConfig] = None,
    dt_init: float = 0.1,
    mesh: Optional[Mesh] = None,
):
    """Returns a jitted fn x0s [B, nx] → (U [B, N, nu], objective, status).

    If `mesh` is given, inputs/outputs are annotated with batch sharding so
    the compiled program partitions over devices.
    """
    cfg = cfg or SQPConfig()
    # fused Pallas QP rounds: box-only QP on a TPU backend — the kernel's
    # supported envelope. On multi-device meshes the vmapped solve is
    # wrapped in shard_map so each shard runs the fused kernel on ITS local
    # batch (a bare pallas_call is opaque to GSPMD auto partitioning; the
    # manual collective-free partitioning is exactly right here because
    # every lane's solve is independent). Shards whose local batch is < 64
    # fall back to the vmapped XLA reference inside the same program
    # (custom_vmap rule in solvers/stage_qp.py) — which is also what makes
    # the CPU virtual-mesh dry run work.
    if (
        cfg.qp.backend is None
        and ocp.ng == 0
        and jax.devices()[0].platform in ("tpu", "axon")
    ):
        cfg = cfg.replace(qp=cfg.qp.replace(backend="fused"))
    N, nu = ocp.N, ocp.nu

    def solve_one(x0):
        o = ocp.replace(bc=ocp.bc.replace(x0=x0))
        xf = o.bc.xf if o.bc.xf is not None else o.refs.xref[-1]
        traj0 = Trajectory.linear_interp(x0, xf, N, nu, dt_init)
        res = sqp_solve(o, traj0, cfg)
        return res.traj.U, res.objective, res.status, res.iterations

    fn = jax.vmap(solve_one)
    if mesh is None:
        return jax.jit(fn)
    if mesh.size > 1:
        fn = jax.shard_map(
            fn, mesh=mesh,
            in_specs=P("batch"), out_specs=P("batch"),
            check_vma=False,
        )
    sh = NamedSharding(mesh, P("batch"))
    return jax.jit(fn, in_shardings=sh, out_shardings=sh)


def make_batched_closed_loop(
    controller: PredictiveController,
    plant: SimulatedPlant,
    T_steps: int,
    dt: float,
    mesh: Optional[Mesh] = None,
):
    """Returns jitted fn (x0s [B,nx], keys [B,2]) → ClosedLoopResult batch."""
    # batched rollouts put the per-step QP under a single vmap level — the
    # fused Pallas kernel's envelope — so scenario MPC (BASELINE config 5)
    # gets the same kernel as the open-loop batch solver
    if (
        controller.solver == "sqp"
        and controller.cfg.qp.backend is None
        and controller.ocp.ng == 0
        and jax.devices()[0].platform in ("tpu", "axon")
    ):
        controller = controller.replace(
            cfg=controller.cfg.replace(
                qp=controller.cfg.qp.replace(backend="fused")
            )
        )

    def rollout(x0, key):
        return run_closed_loop(
            plant, controller, x0, T_steps=T_steps, dt=dt, key=key
        )

    fn = jax.vmap(rollout)
    if mesh is None:
        return jax.jit(fn)
    if mesh.size > 1:
        # same shard_map treatment as make_batched_solver: a pallas_call
        # inside the per-step QP is opaque to GSPMD auto-partitioning, so
        # each shard runs the whole rollout scan (and its fused kernel) on
        # its LOCAL batch — collective-free, every lane independent
        fn = jax.shard_map(
            fn, mesh=mesh,
            in_specs=(P("batch"), P("batch")), out_specs=P("batch"),
            check_vma=False,
        )
    sh = NamedSharding(mesh, P("batch"))
    return jax.jit(fn, in_shardings=(sh, sh), out_shardings=sh)
