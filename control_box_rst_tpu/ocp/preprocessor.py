"""Stage preprocessor: shared per-stage quantities for costs/constraints.

Ref parity: corbo::StagePreprocessor (ref: src/optimal_control/include/
corbo-optimal-control/functions/stage_preprocessor.h:41) — a hook that
computes quantities shared by several cost/constraint edges of the same
stage once, before edge evaluation (wired in via
`precomputeVertex/EdgeQuantities`, structured_optimal_control_problem.cpp).

TPU-first redesign: the *performance* role of the reference's preprocessor
(avoiding recomputation across edges evaluated serially) is played by XLA
common-subexpression elimination — all stage functions of one stage are
fused into one kernel by `transcribe`, so an identical `precompute` call
appearing in both a cost and a constraint is computed once after CSE. What
remains is the *API* role: letting users express several stage terms over a
shared intermediate without duplicating code. `PreprocessedStageCost` and
`PreprocessedStageConstraint` wrap user callables

    pre(x, u, dt)             -> q         (any pytree)
    term(q, x, u, dt, xref, uref) -> value

and plug into the standard StageCost / StageConstraint slots of
`ocp.transcribe`.
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from control_box_rst_tpu.ocp.constraints import StageConstraint
from control_box_rst_tpu.ocp.costs import StageCost
from control_box_rst_tpu.utils.tree import pytree_dataclass, static_field


@pytree_dataclass
class StagePreprocessor:
    """Shared per-stage computation. Subclass or pass `fn` directly."""

    fn: Callable = static_field(default=None)

    def precompute(self, x, u, dt):
        if self.fn is None:
            return ()
        return self.fn(x, u, dt)


@pytree_dataclass
class PreprocessedStageCost(StageCost):
    """Stage cost over a preprocessed quantity:
    stage(x,u,dt) = term(pre(x,u,dt), x, u, dt, xref, uref)."""

    pre: StagePreprocessor = static_field(default=None)
    term: Callable = static_field(default=None)
    final_term: Callable = static_field(default=None)  # (q, x, xref) -> value

    def stage(self, x, u, dt, xref, uref):
        if self.term is None:
            return jnp.zeros(())
        q = self.pre.precompute(x, u, dt)
        return jnp.asarray(self.term(q, x, u, dt, xref, uref))

    def final(self, x, xref):
        if self.final_term is None:
            return jnp.zeros(())
        q = self.pre.precompute(x, jnp.zeros(()), jnp.zeros(()))
        return jnp.asarray(self.final_term(q, x, xref))


@pytree_dataclass
class PreprocessedStageConstraint(StageConstraint):
    """Stage constraints over the same preprocessed quantity; set
    neq/nineq to the (static) row counts of eq_term/ineq_term."""

    pre: StagePreprocessor = static_field(default=None)
    eq_term: Callable = static_field(default=None)    # (q,x,u,dt) -> [neq]
    ineq_term: Callable = static_field(default=None)  # (q,x,u,dt) -> [nineq]

    def eq(self, x, u, dt, xref, uref):
        if self.eq_term is None:
            return jnp.zeros((self.neq,))
        q = self.pre.precompute(x, u, dt)
        return jnp.atleast_1d(self.eq_term(q, x, u, dt))

    def ineq(self, x, u, dt, xref, uref):
        if self.ineq_term is None:
            return jnp.zeros((self.nineq,))
        q = self.pre.precompute(x, u, dt)
        return jnp.atleast_1d(self.ineq_term(q, x, u, dt))
