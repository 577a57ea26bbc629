"""Fused ADMM Pallas kernel vs the XLA stage-QP solver.

Same inputs, same fixed-rho iteration count → identical iterates (up to
f32 roundoff). Runs in interpret mode on the CPU mesh.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from control_box_rst_tpu.ops.pallas.admm_kernel import admm_round_pallas
from control_box_rst_tpu.solvers.stage_qp import (
    QPConfig,
    StageQP,
    solve_stage_qp,
)

Kst, NZ, NC, B = 9, 4, 2, 4


def _random_qp(seed):
    rng = np.random.default_rng(seed)
    N = Kst - 1
    A = rng.standard_normal((Kst, NZ, NZ)) * 0.3
    Hd = np.einsum("kij,klj->kil", A, A) + 2.0 * np.eye(NZ)
    g = rng.standard_normal((Kst, NZ))
    J = rng.standard_normal((N, NC, NZ)) * 0.5
    K = rng.standard_normal((N, NC, NZ)) * 0.5
    c = rng.standard_normal((N, NC)) * 0.1
    G = np.zeros((Kst, 0, NZ))
    gl = np.zeros((Kst, 0))
    gu = np.zeros((Kst, 0))
    dlb = np.full((Kst, NZ), -0.7)
    dub = np.full((Kst, NZ), 0.7)
    # pin a few rows (dlb == dub == 0), like fixed x0/dummy stage vars
    dlb[0, :2] = dub[0, :2] = 0.0
    dlb[-1, -1] = dub[-1, -1] = 0.0
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    return StageQP(
        Hd=f32(Hd), g=f32(g), J=f32(J), K=f32(K), c=f32(c),
        G=f32(G), gl=f32(gl), gu=f32(gu), dlb=f32(dlb), dub=f32(dub),
    )


def _stack(qps):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *qps)


@pytest.mark.parametrize("iters", [1, 7, 30])
def test_kernel_matches_xla_admm(iters):
    qps = [_random_qp(10 + i) for i in range(B)]
    batched = _stack(qps)
    cfg = QPConfig(
        max_iter=iters, iters_per_round=iters, tol=1e-30, linsolver="scan",
    )

    sols = jax.vmap(lambda qp: solve_stage_qp(qp, cfg))(batched)

    # kernel with identical init: x0 = 0, z_b = clip(x0, dlb, dub), y = 0
    zeros = jnp.zeros((B, Kst, NZ), jnp.float32)
    z_b0 = jnp.clip(zeros, batched.dlb, batched.dub)
    y_d0 = jnp.zeros((B, Kst - 1, NC), jnp.float32)
    rho = jnp.full((B,), cfg.rho, jnp.float32)
    x, z_b, y_d, y_b, pr, dr = admm_round_pallas(
        batched.Hd, batched.J, batched.K, batched.g, batched.c,
        batched.dlb, batched.dub, rho,
        zeros, z_b0, y_d0, zeros,
        iters=iters, sigma=cfg.sigma, alpha=cfg.alpha,
        rho_eq_scale=cfg.rho_eq_scale, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(x), np.asarray(sols.delta), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(y_d), np.asarray(sols.y_dyn), rtol=2e-3, atol=3e-3
    )
    np.testing.assert_allclose(
        np.asarray(y_b), np.asarray(sols.y_box), rtol=2e-3, atol=3e-3
    )
    # primal residual agrees with the XLA solver's final report
    np.testing.assert_allclose(
        np.asarray(pr), np.asarray(sols.prim_res), rtol=1e-2, atol=1e-4
    )


def test_kernel_padding_lanes_isolated():
    """B=4 pads to 1024 internally: padding lanes must not leak NaNs."""
    qps = [_random_qp(50 + i) for i in range(B)]
    batched = _stack(qps)
    zeros = jnp.zeros((B, Kst, NZ), jnp.float32)
    z_b0 = jnp.clip(zeros, batched.dlb, batched.dub)
    y_d0 = jnp.zeros((B, Kst - 1, NC), jnp.float32)
    out = admm_round_pallas(
        batched.Hd, batched.J, batched.K, batched.g, batched.c,
        batched.dlb, batched.dub, jnp.full((B,), 0.1, jnp.float32),
        zeros, z_b0, y_d0, zeros,
        iters=5, sigma=1e-6, alpha=1.6, rho_eq_scale=1e3, interpret=True,
    )
    for o in out:
        assert bool(jnp.isfinite(o).all())


def test_fused_backend_under_vmap_matches_xla():
    """solve_stage_qp(backend='fused') under vmap (custom_vmap rule →
    kernel in interpret mode on CPU) agrees with the XLA backend."""
    qps = [_random_qp(80 + i) for i in range(B)]
    batched = _stack(qps)
    # single round (no ρ adaptation): backends follow identical updates
    kw = dict(max_iter=10, iters_per_round=10, tol=1e-30, linsolver="scan")
    sol_x = jax.vmap(
        lambda qp: solve_stage_qp(qp, QPConfig(backend="xla", **kw))
    )(batched)
    sol_f = jax.vmap(
        lambda qp: solve_stage_qp(qp, QPConfig(backend="fused", **kw))
    )(batched)
    np.testing.assert_allclose(
        np.asarray(sol_f.delta), np.asarray(sol_x.delta), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(sol_f.y_box), np.asarray(sol_x.y_box), rtol=2e-3, atol=3e-3
    )
    # two rounds: the fused dual residual is a one-step lookahead, so the
    # adapted ρ (and hence iterates) may differ slightly — same solution
    # within loose tolerance
    kw2 = dict(max_iter=20, iters_per_round=10, tol=1e-30, linsolver="scan")
    sol_x2 = jax.vmap(
        lambda qp: solve_stage_qp(qp, QPConfig(backend="xla", **kw2))
    )(batched)
    sol_f2 = jax.vmap(
        lambda qp: solve_stage_qp(qp, QPConfig(backend="fused", **kw2))
    )(batched)
    np.testing.assert_allclose(
        np.asarray(sol_f2.delta), np.asarray(sol_x2.delta), rtol=1e-2, atol=1e-3
    )


def test_fused_backend_unbatched_reference_path():
    """Unbatched call uses the per-lane reference implementation."""
    qp = _random_qp(99)
    kw = dict(max_iter=10, iters_per_round=10, tol=1e-30, linsolver="scan")
    sol_x = solve_stage_qp(qp, QPConfig(backend="xla", **kw))
    sol_f = solve_stage_qp(qp, QPConfig(backend="fused", **kw))
    np.testing.assert_allclose(
        np.asarray(sol_f.delta), np.asarray(sol_x.delta), rtol=2e-4, atol=2e-5
    )
