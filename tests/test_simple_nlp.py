"""Generic NLP interface tests (ref: SimpleOptimizationProblem test style)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from control_box_rst_tpu.solvers import QPConfig, SQPConfig
from control_box_rst_tpu.solvers.simple_nlp import nlp_solution, solve_nlp

CFG = SQPConfig(max_iter=50, qp=QPConfig(max_iter=1000, tol=1e-12),
                psd_clamp=True)


def test_unconstrained_rosenbrock():
    def f(z):
        return (1 - z[0]) ** 2 + 100.0 * (z[1] - z[0] ** 2) ** 2

    res = solve_nlp(f, jnp.array([-1.2, 1.0]), cfg=CFG)
    z = np.asarray(nlp_solution(res))
    np.testing.assert_allclose(z, [1.0, 1.0], atol=1e-4)


def test_equality_constrained():
    # min x^2 + y^2 s.t. x + y = 1 → (0.5, 0.5)
    res = solve_nlp(
        lambda z: z @ z, jnp.array([3.0, -1.0]),
        eq=lambda z: z[0] + z[1] - 1.0, neq=1, cfg=CFG,
    )
    np.testing.assert_allclose(np.asarray(nlp_solution(res)), [0.5, 0.5], atol=1e-6)


def test_inequality_and_bounds():
    # min (x-2)^2 s.t. x <= 1  → x = 1
    res = solve_nlp(
        lambda z: (z[0] - 2.0) ** 2, jnp.array([0.0]),
        ineq=lambda z: z[0] - 1.0, nineq=1, cfg=CFG,
    )
    assert float(nlp_solution(res)[0]) == pytest.approx(1.0, abs=1e-6)
    # bounds variant
    res2 = solve_nlp(
        lambda z: (z[0] - 2.0) ** 2, jnp.array([0.0]),
        lb=jnp.array([-1.0]), ub=jnp.array([0.5]), cfg=CFG,
    )
    assert float(nlp_solution(res2)[0]) == pytest.approx(0.5, abs=1e-6)


def test_jit_and_vmap():
    f = lambda z: jnp.sum((z - 1.0) ** 2)

    @jax.jit
    @jax.vmap
    def solve(z0):
        return nlp_solution(solve_nlp(f, z0, cfg=SQPConfig(max_iter=10)))

    out = solve(jnp.array([[0.0, 0.0], [5.0, -3.0]]))
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)
