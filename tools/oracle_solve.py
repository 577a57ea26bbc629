"""f64 CPU oracle for the bench problems (subprocess tool).

Solves the same batch of MPC problems as bench.py, but in float64 on CPU
with the XLA backend at tight tolerances — the ground truth for the bench
quality gates and for fidelity experiments (ref strategy: the dense-oracle
cross-check of SURVEY.md §4, aimed at the production operating point).

Usage:  python tools/oracle_solve.py IN.npz OUT.npz [problem]
  problem: 'flagship' (default, BASELINE config 1) or 'vdp_ms' (config 2)
  IN.npz:  x0s [B, 2] float
  OUT.npz: U [B, N, 1] float64, obj [B], converged [B] bool
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np


def main(in_path: str, out_path: str, problem: str = "flagship") -> None:
    from control_box_rst_tpu.ocp.problem import Trajectory
    from control_box_rst_tpu.solvers import QPConfig, SQPConfig
    from control_box_rst_tpu.solvers.sqp import sqp_solve
    from __graft_entry__ import _flagship, _vdp_ms

    if problem == "vdp_ms":
        ocp, _ = _vdp_ms(N=20)
    else:
        ocp, _ = _flagship(N=50)
    # f64 everywhere
    ocp = jax.tree.map(
        lambda a: a.astype(jnp.float64)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        ocp,
    )
    cfg = SQPConfig(
        max_iter=50,
        qp=QPConfig(max_iter=4000, iters_per_round=100, rho=1.0, tol=1e-10,
                    backend="xla"),
        tol_stat=1e-8,
        tol_feas=1e-9,
    )
    x0s = jnp.asarray(np.load(in_path)["x0s"], jnp.float64)
    N, nu = ocp.N, ocp.nu

    def solve_one(x0):
        o = ocp.replace(bc=ocp.bc.replace(x0=x0))
        xf = o.bc.xf if o.bc.xf is not None else o.refs.xref[-1]
        traj0 = Trajectory.linear_interp(x0, xf, N, nu, 0.1)
        res = sqp_solve(o, traj0, cfg)
        return res.traj.U, res.objective, res.status

    U, obj, status = jax.jit(jax.vmap(solve_one))(x0s)
    np.savez(
        out_path,
        U=np.asarray(U),
        obj=np.asarray(obj),
        converged=np.asarray(status == 1),
    )


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else "flagship")
