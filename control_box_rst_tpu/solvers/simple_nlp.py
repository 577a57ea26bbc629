"""Generic (non-OCP) NLP interface.

Ref parity: SimpleOptimizationProblem / SimpleOptimizationProblemWithCallbacks
(ref: src/optimization/include/corbo-optimization/simple_optimization_problem.h:
51,203) and the generic lambda edges (generic_edge.h:68,150,211) — define an
NLP from plain callables and solve it with the same machinery as the OCPs.

  min  f(z)
  s.t. h(z) = 0,  g(z) ≤ 0,  lb ≤ z ≤ ub

Implementation: lowered to a single-interval instance of the canonical stage
NLP with z living in the *control* slot (u_0), a 1-D dummy state, and a
trivially-satisfied defect — one jitted SQP covers hypergraph OCPs and plain
NLPs, like the reference's shared NlpSolverInterface.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from control_box_rst_tpu.models.base import FunctionalDynamics
from control_box_rst_tpu.ocp.constraints import FunctionalStageConstraint
from control_box_rst_tpu.ocp.costs import StageCost
from control_box_rst_tpu.ocp.grids import Grid
from control_box_rst_tpu.ocp.problem import Bounds, Trajectory
from control_box_rst_tpu.ocp.transcribe import transcribe
from control_box_rst_tpu.solvers.sqp import SQPConfig, SQPResult, sqp_solve
from control_box_rst_tpu.utils.tree import pytree_dataclass, static_field


@pytree_dataclass
class _FnCost(StageCost):
    fn: Callable = static_field(default=None)

    def stage(self, x, u, dt, xref, uref):
        return self.fn(u)


def solve_nlp(
    objective: Callable[[jax.Array], jax.Array],
    z0: jax.Array,
    eq: Optional[Callable] = None,
    neq: int = 0,
    ineq: Optional[Callable] = None,
    nineq: int = 0,
    lb: Optional[jax.Array] = None,
    ub: Optional[jax.Array] = None,
    cfg: Optional[SQPConfig] = None,
) -> SQPResult:
    """Solve min f(z) s.t. h(z)=0, g(z)≤0, lb ≤ z ≤ ub from initial z0.

    Pure & jittable (given static neq/nineq). Solution: `nlp_solution(res)`.
    """
    z0 = jnp.atleast_1d(jnp.asarray(z0))
    n = z0.shape[0]
    dtype = z0.dtype

    grid = Grid(N=1, kind="fd", fd_scheme="forward", dt_mode="fixed")
    system = FunctionalDynamics(
        nx=1, nu=n, fn=lambda x, u: jnp.zeros_like(x)
    )
    cost = _FnCost(fn=objective)
    stage_con = None
    if (eq is not None and neq) or (ineq is not None and nineq):
        stage_con = FunctionalStageConstraint(
            neq=neq if eq is not None else 0,
            nineq=nineq if ineq is not None else 0,
            eq_fn=(lambda x, u: eq(u)) if eq is not None else None,
            ineq_fn=(lambda x, u: ineq(u)) if ineq is not None else None,
        )
    bounds = Bounds.unbounded(1, n, dtype=dtype)
    if lb is not None or ub is not None:
        bounds = bounds.with_u(
            -jnp.inf if lb is None else lb, jnp.inf if ub is None else ub
        )
    ocp = transcribe(
        system, grid, cost, bounds=bounds,
        x0=jnp.zeros((1,), dtype), stage_con=stage_con,
    )
    traj0 = Trajectory(
        X=jnp.zeros((2, 1), dtype),
        U=z0[None, :],
        dts=jnp.ones((1,), dtype),
    )
    cfg = cfg or SQPConfig()
    return sqp_solve(ocp, traj0, cfg)


def nlp_solution(result: SQPResult) -> jax.Array:
    """Extract the optimizer z* from the result."""
    return result.traj.U[0]
