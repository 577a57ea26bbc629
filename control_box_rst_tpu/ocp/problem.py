"""Stage-structured OCP data model.

This is the TPU-native replacement for the reference's hypergraph
(ref: src/optimization/include/corbo-optimization/hyper_graph/*): instead of
vertex objects (VectorVertex/ScalarVertex, vector_vertex.h:51,
scalar_vertex.h:50) and edge objects wired into adjacency lists, the decision
variables are three dense arrays (states X, controls U, time steps dts) and
the "edges" are *stage-indexed pure functions* evaluated for all stages at
once with `vmap`. The hypergraph's block sparsity is not rediscovered from an
adjacency structure — it is the array layout itself.

Vertex fixing (x0 fixed, xf partially fixed, ref vector_vertex.h:276
PartiallyFixedVectorVertex) becomes boolean masks; bounds become arrays; the
vertex back-up stack used for line-search rollback (vertex_interface.h:162)
is unnecessary because trajectories are immutable pytrees — the "backup" is
just keeping the old value.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from control_box_rst_tpu.utils.tree import pytree_dataclass, static_field


@pytree_dataclass
class Trajectory:
    """Decision variables of a transcribed OCP.

    X:   [N+1, nx] state sequence (x_0 .. x_N)
    U:   [N,   nu] control sequence (u_0 .. u_{N-1})
    dts: [N]       per-interval time steps. For fixed/uniform grids all
                   entries are equal; grids decide whether dts are decision
                   variables (see ocp/grids.py dt_mode).
    """

    X: jax.Array
    U: jax.Array
    dts: jax.Array

    @property
    def N(self) -> int:
        return self.U.shape[-2]

    @property
    def nx(self) -> int:
        return self.X.shape[-1]

    @property
    def nu(self) -> int:
        return self.U.shape[-1]

    def total_time(self) -> jax.Array:
        return jnp.sum(self.dts, axis=-1)

    @staticmethod
    def linear_interp(
        x0: jax.Array, xf: jax.Array, N: int, nu: int, dt: float
    ) -> "Trajectory":
        """Initialize states on the line x0 → xf, controls zero, uniform dt.
        (ref: FullDiscretizationGridBase::initializeSequences linear interp,
        full_discretization_grid_base.cpp:134,181)"""
        alphas = jnp.linspace(0.0, 1.0, N + 1)[:, None]
        X = x0[None, :] * (1.0 - alphas) + xf[None, :] * alphas
        U = jnp.zeros((N, nu), dtype=X.dtype)
        dts = jnp.full((N,), dt, dtype=X.dtype)
        return Trajectory(X=X, U=U, dts=dts)


@pytree_dataclass
class Bounds:
    """Box bounds on states, controls, and time steps.

    Ref parity: vertex bounds (vertex_interface.h box bounds) and grid dt
    bounds (full_discretization_grid_base.h dt limits). +/-inf = unbounded.
    """

    x_lb: jax.Array  # [nx]
    x_ub: jax.Array
    u_lb: jax.Array  # [nu]
    u_ub: jax.Array
    dt_lb: jax.Array  # scalar
    dt_ub: jax.Array

    @staticmethod
    def unbounded(nx: int, nu: int, dtype=jnp.float32) -> "Bounds":
        inf = jnp.inf
        return Bounds(
            x_lb=jnp.full((nx,), -inf, dtype=dtype),
            x_ub=jnp.full((nx,), inf, dtype=dtype),
            u_lb=jnp.full((nu,), -inf, dtype=dtype),
            u_ub=jnp.full((nu,), inf, dtype=dtype),
            dt_lb=jnp.asarray(0.0, dtype=dtype),
            dt_ub=jnp.asarray(inf, dtype=dtype),
        )

    def with_u(self, u_lb, u_ub) -> "Bounds":
        return self.replace(
            u_lb=jnp.broadcast_to(jnp.asarray(u_lb, self.u_lb.dtype), self.u_lb.shape),
            u_ub=jnp.broadcast_to(jnp.asarray(u_ub, self.u_ub.dtype), self.u_ub.shape),
        )

    def with_x(self, x_lb, x_ub) -> "Bounds":
        return self.replace(
            x_lb=jnp.broadcast_to(jnp.asarray(x_lb, self.x_lb.dtype), self.x_lb.shape),
            x_ub=jnp.broadcast_to(jnp.asarray(x_ub, self.x_ub.dtype), self.x_ub.shape),
        )

    def with_dt(self, dt_lb, dt_ub) -> "Bounds":
        return self.replace(
            dt_lb=jnp.asarray(dt_lb, self.dt_lb.dtype),
            dt_ub=jnp.asarray(dt_ub, self.dt_ub.dtype),
        )


@pytree_dataclass
class References:
    """Stage reference trajectories for tracking costs.

    Ref parity: xref/uref caching inside grids
    (ref: reference_trajectory.h:60 getReferenceCached, grid update at
    full_discretization_grid_base.cpp:59-64). xref: [N+1, nx], uref: [N, nu].
    """

    xref: jax.Array
    uref: jax.Array

    @staticmethod
    def constant(xref: jax.Array, uref: jax.Array, N: int) -> "References":
        return References(
            xref=jnp.broadcast_to(xref, (N + 1,) + xref.shape),
            uref=jnp.broadcast_to(uref, (N,) + uref.shape),
        )


@pytree_dataclass
class BoundaryConditions:
    """Initial state and terminal handling.

    x0:       [nx] fixed initial state (the x0 vertex is fixed in the
              reference, full_discretization_grid_base.cpp x0 overwrite).
    xf:       [nx] terminal reference for terminal eq constraints.
    xf_fixed: [nx] boolean mask — which terminal components are pinned to xf
              (ref: `_xf_fixed` partially-fixed terminal vertex,
              full_discretization_grid_base.h:139-153).
    """

    x0: jax.Array
    xf: Optional[jax.Array] = None
    xf_fixed: Optional[jax.Array] = None
