"""TPU-executed test lane — the production-configuration gate.

Run on the chip:   python -m pytest -m tpu tests/ -q
(The `-m tpu` flag makes tests/conftest.py skip its CPU pin; these tests
self-skip on any non-TPU backend, so default CPU runs just deselect them.)

Why this lane exists (round-3 post-mortem): all 163 CPU tests were green
while the TPU production path returned wrong answers for ~100% of
benchmark lanes — the CPU suite pins f64 + interpret-mode Pallas and is
NOT evidence for the f32/Mosaic path. Everything here executes the real
compiled kernels on the real chip.

Ref strategy: SURVEY.md §4's dense-oracle cross-check, aimed at the device;
solver status contract nlp_solver_interface.h:67-116.
"""
import os
import pathlib
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

ROOT = pathlib.Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.default_backend() not in ("tpu", "axon"),
        reason="requires the real TPU chip (run: pytest -m tpu tests/ -q)",
    ),
]


@pytest.fixture(scope="module", autouse=True)
def _precision():
    jax.config.update("jax_default_matmul_precision", "highest")
    yield


@pytest.fixture(scope="module")
def flagship():
    from __graft_entry__ import _flagship

    return _flagship(N=50)


@pytest.fixture(scope="module")
def x0s():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.uniform(-1.0, 1.0, size=(256, 2)).astype(np.float32))


def test_fused_one_shot_matches_xla_outer_loop(flagship, x0s):
    """The fused one-shot production path and the XLA outer-loop path must
    agree on the converged control sequences, and both must converge
    (the round-3 regression: one-shot shipped 0.2% convergence, 0.32 max
    control deviation)."""
    from control_box_rst_tpu.parallel import make_batched_solver

    ocp, cfg = flagship
    solver_f = make_batched_solver(ocp, cfg, dt_init=0.1)
    solver_x = make_batched_solver(
        ocp, cfg.replace(qp=cfg.qp.replace(backend="xla")), dt_init=0.1
    )
    Uf, _, stf, _ = jax.block_until_ready(solver_f(x0s))
    Ux, _, stx, _ = jax.block_until_ready(solver_x(x0s))
    conv_f = float(jnp.mean((stf == 1).astype(jnp.float32)))
    conv_x = float(jnp.mean((stx == 1).astype(jnp.float32)))
    assert conv_f >= 0.99, f"fused converged_frac {conv_f}"
    assert conv_x >= 0.99, f"xla converged_frac {conv_x}"
    dU = float(jnp.max(jnp.abs(Uf - Ux)))
    assert dU < 1e-3, f"fused vs xla max |dU| = {dU}"


def test_flagship_f32_matches_f64_oracle(flagship, x0s):
    """f32 TPU production solves vs the f64 CPU oracle (subprocess):
    max control error < 1e-3 (the BASELINE fidelity bar at the production
    operating point — round 3 only ever checked f64/CPU/XLA configs)."""
    import subprocess

    from control_box_rst_tpu.parallel import make_batched_solver

    ocp, cfg = flagship
    solver = make_batched_solver(ocp, cfg, dt_init=0.1)
    U, _, st, _ = jax.block_until_ready(solver(x0s))

    sub = 32
    np.savez("/tmp/tpu_lane_in.npz", x0s=np.asarray(x0s[:sub]))
    subprocess.run(
        [sys.executable, str(ROOT / "tools" / "oracle_solve.py"),
         "/tmp/tpu_lane_in.npz", "/tmp/tpu_lane_out.npz"],
        check=True, capture_output=True, timeout=1200,
    )
    U_oracle = np.load("/tmp/tpu_lane_out.npz")["U"]
    err = float(np.max(np.abs(np.asarray(U[:sub], np.float64) - U_oracle)))
    assert err < 1e-3, f"max |U - f64 oracle| = {err}"


def test_golden_plan_parity_f32_production(flagship):
    """Step-0 plan vs the C++ reference golden, solved at the f32 fused
    production configuration on the chip. Uses golden case 7 (bounded
    double integrator at x0 = (1.0, 0.0)) — the flagship problem INCLUDES
    |u| <= 1, so a bounded golden is the matching oracle (case 1's plan is
    the unconstrained problem, where u reaches -2.59), and the bench-
    distribution magnitude keeps the comparison inside the f32
    absolute-error floor (case 3's (2.0, 0.5) start measures ~2.8e-3 for
    EVERY f32 configuration — that config is covered by the f64 CPU test
    in tests/test_golden_parity.py)."""
    from control_box_rst_tpu.parallel import make_batched_solver

    golden = ROOT / "tests" / "golden" / "closed_loop_di_bounded_x1.tsv.plan"
    u_ref = []
    for line in golden.read_text().splitlines():
        parts = line.split("\t")
        if parts[0] == "u":
            u_ref.append([float(v) for v in parts[1:]])
    u_ref = np.asarray(u_ref)[:50]  # reference repeats the last control

    ocp, cfg = flagship
    solver = make_batched_solver(ocp, cfg, dt_init=0.1)
    x0 = jnp.broadcast_to(
        jnp.asarray([1.0, 0.0], jnp.float32), (64, 2)
    )  # batch ≥ 64 so the fused kernel engages
    U, _, st, _ = jax.block_until_ready(solver(x0))
    assert int(st[0]) == 1
    err = float(np.max(np.abs(np.asarray(U[0], np.float64) - u_ref)))
    assert err < 1e-3, f"plan control err vs C++ reference = {err}"


def test_bcr_matches_scan_linsolver_on_device():
    """Block-cyclic-reduction vs scan block-Cholesky on the chip (the CPU
    suite exercises both, but only through the interpreter/XLA-CPU)."""
    from control_box_rst_tpu.ops.btridiag import btridiag_cholesky, btridiag_solve
    from control_box_rst_tpu.ops.btridiag_cr import bcr_factor, bcr_solve

    rng = np.random.default_rng(1)
    Kst, nz = 17, 4
    A = rng.standard_normal((Kst, nz, nz)) * 0.3
    D = jnp.asarray(
        (np.einsum("kij,klj->kil", A, A) + 3.0 * np.eye(nz)).astype(np.float32)
    )
    O = jnp.asarray(rng.standard_normal((Kst - 1, nz, nz)).astype(np.float32) * 0.2)
    rhs = jnp.asarray(rng.standard_normal((Kst, nz)).astype(np.float32))

    Ld, Lo = jax.jit(btridiag_cholesky)(D, O)
    x_scan = jax.jit(btridiag_solve)(Ld, Lo, rhs)
    # factor+solve inside ONE jit: BCRFactors.K is static Python control
    # flow and must not cross a jit boundary as data
    x_bcr = jax.jit(lambda d, o, r: bcr_solve(bcr_factor(d, o), r))(D, O, rhs)
    err = float(jnp.max(jnp.abs(x_scan - x_bcr)))
    assert err < 1e-4, f"bcr vs scan max err {err}"


def test_residual_consistency_all_schemes():
    """The axon backend has miscompiled vmapped stage evaluations before
    (ocp/transcribe.py:adjacent_rows work-around); audit every defect
    scheme's jitted residuals/Jacobians against eager evaluation."""
    sys.path.insert(0, str(ROOT / "tools"))
    from tpu_consistency_check import check_residual_consistency

    assert check_residual_consistency()


def test_solution_feasibility_audit():
    """Batched flagship solves: lanes reported CONVERGED must satisfy the
    true (eagerly re-evaluated) dynamics to 1e-3."""
    sys.path.insert(0, str(ROOT / "tools"))
    from tpu_consistency_check import check_solution_feasibility

    assert check_solution_feasibility(B=128)


def test_vdp_ms_nonlinear_f32_production():
    """Config 2 (Van der Pol MS, box bounds) at the f32 production
    configuration on the chip: the REAL multi-iteration SQP outer loop
    (mean ~6 iterations) with the fused QP kernel per iteration — the
    round-4 bench only ever exercised the convex one-shot (VERDICT r4
    missing #2). Gates: ≥99% converged, fused-vs-XLA agreement < 1e-3."""
    from control_box_rst_tpu.parallel import make_batched_solver
    from __graft_entry__ import _vdp_ms

    ocp, cfg = _vdp_ms(N=20)
    rng = np.random.default_rng(7)
    x0s = jnp.asarray(rng.uniform(-1.5, 1.5, size=(256, 2)).astype(np.float32))
    solver_f = make_batched_solver(ocp, cfg, dt_init=0.1)
    solver_x = make_batched_solver(
        ocp, cfg.replace(qp=cfg.qp.replace(backend="xla")), dt_init=0.1
    )
    Uf, _, stf, itf = jax.block_until_ready(solver_f(x0s))
    Ux, _, stx, _ = jax.block_until_ready(solver_x(x0s))
    conv_f = float(jnp.mean((stf == 1).astype(jnp.float32)))
    conv_x = float(jnp.mean((stx == 1).astype(jnp.float32)))
    assert conv_f >= 0.99, f"fused converged_frac {conv_f}"
    assert conv_x >= 0.99, f"xla converged_frac {conv_x}"
    # the outer loop actually iterates (not the one-shot)
    assert float(jnp.mean(itf.astype(jnp.float32))) > 2.0
    dU = float(jnp.max(jnp.abs(Uf - Ux)))
    assert dU < 1e-3, f"fused vs xla max |dU| = {dU}"


def test_time_optimal_f32_production():
    """Config 3 (uniform-grid time-optimal) at f32 on the chip, checked
    against the ANALYTIC golden T* = 2√d (exact under Crank-Nicolson for
    the double integrator; the C++ reference reproduces it to 7 digits,
    tests/test_golden_parity.py:224)."""
    from control_box_rst_tpu.ocp.problem import Trajectory
    from control_box_rst_tpu.solvers.sqp import sqp_solve
    from __graft_entry__ import _time_optimal

    ocp0, cfg = _time_optimal(N=20)

    def solve_one(x0):
        o = ocp0.replace(bc=ocp0.bc.replace(x0=x0))
        traj0 = Trajectory.linear_interp(x0, jnp.zeros(2), 20, 1, 0.12)
        r = sqp_solve(o, traj0, cfg)
        return r.traj.dts, r.status

    rng = np.random.default_rng(8)
    ds = rng.uniform(0.5, 2.0, size=(256,)).astype(np.float32)
    x0s = jnp.asarray(np.stack([ds, np.zeros_like(ds)], axis=1))
    dts, st = jax.block_until_ready(jax.jit(jax.vmap(solve_one))(x0s))
    conv = float(jnp.mean((st == 1).astype(jnp.float32)))
    assert conv >= 0.99, f"converged_frac {conv}"
    T = np.asarray(jnp.sum(dts, axis=1)).reshape(-1)
    T_err = float(np.max(np.abs(T - 2.0 * np.sqrt(ds.astype(np.float64)))))
    assert T_err < 1e-3, f"max |T - 2 sqrt(d)| = {T_err}"
