"""Integrator convergence-order and golden tests.

Modeled on the reference's numerics-golden unit-test style
(SURVEY.md section 4; ref src/numerics/test/)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from control_box_rst_tpu.models import VanDerPolOscillator, LinearStateSpaceModel
from control_box_rst_tpu.ops import (
    AdaptiveStepIntegrator,
    make_integrator,
)


def _linear_system():
    # xdot = A x + B u with known matrix exponential solution
    A = np.array([[0.0, 1.0], [-2.0, -0.5]])
    B = np.array([[0.0], [1.0]])
    return LinearStateSpaceModel.from_matrices(A, B), A, B


def _exact_linear(A, B, x0, u, t):
    import scipy.linalg

    n = A.shape[0]
    # Augmented exact ZOH discretization
    M = np.zeros((n + B.shape[1], n + B.shape[1]))
    M[:n, :n] = A * t
    M[:n, n:] = B * t
    E = scipy.linalg.expm(M)
    return E[:n, :n] @ x0 + E[:n, n:] @ u


ORDERS = {"euler": 1, "rk2": 2, "rk3": 3, "rk4": 4, "rk5": 5, "rk6": 6, "rk7": 7}


@pytest.mark.parametrize("name", list(ORDERS))
def test_convergence_order(name):
    """Halving dt must reduce the one-step error by ~2^(order+1) (local) /
    2^order (global over fixed interval)."""
    sys_, A, B = _linear_system()
    x0 = np.array([1.0, -0.5])
    u = np.array([0.3])
    T = 0.5
    exact = _exact_linear(A, B, x0, u, T)

    integ = make_integrator(name)
    errs = []
    for n_sub in (4, 8):
        x = integ.replace(num_substeps=n_sub).solve_ivp(
            sys_, jnp.asarray(x0), jnp.asarray(u), T
        )
        errs.append(float(np.max(np.abs(np.asarray(x) - exact))))
    rate = np.log2(errs[0] / (errs[1] + 1e-300))
    order = ORDERS[name]
    # Observed order should be at least the nominal order (minus tolerance);
    # very high-order methods hit float64 roundoff, so cap the check.
    if errs[1] > 1e-14:
        assert rate > order - 0.6, f"{name}: observed order {rate:.2f} < {order}"


@pytest.mark.parametrize("name", ["euler", "rk4", "rk7"])
def test_accuracy_vs_exact(name):
    sys_, A, B = _linear_system()
    x0 = np.array([1.0, -0.5])
    u = np.array([0.3])
    T = 1.0
    exact = _exact_linear(A, B, x0, u, T)
    integ = make_integrator(name, num_substeps=64)
    x = integ.solve_ivp(sys_, jnp.asarray(x0), jnp.asarray(u), T)
    tol = {"euler": 2e-2, "rk4": 1e-8, "rk7": 1e-12}[name]
    assert np.max(np.abs(np.asarray(x) - exact)) < tol


def test_adaptive_matches_rk7_on_vdp():
    sys_ = VanDerPolOscillator()
    x0 = jnp.array([1.2, 0.0])
    u = jnp.array([0.1])
    T = 2.0
    ref = make_integrator("rk7", num_substeps=256).solve_ivp(sys_, x0, u, T)
    ada = AdaptiveStepIntegrator(abs_tol=1e-9, max_substeps=128).solve_ivp(
        sys_, x0, u, T
    )
    assert np.max(np.abs(np.asarray(ada) - np.asarray(ref))) < 1e-6


def test_integrators_jit_and_vmap():
    sys_ = VanDerPolOscillator()
    integ = make_integrator("rk4", num_substeps=4)
    solve = jax.jit(lambda x, u: integ.solve_ivp(sys_, x, u, 0.1))
    xs = jnp.stack([jnp.array([1.0, 0.0]), jnp.array([0.0, 1.0])])
    us = jnp.zeros((2, 1))
    batched = jax.vmap(solve)(xs, us)
    assert batched.shape == (2, 2)
    single = solve(xs[0], us[0])
    np.testing.assert_allclose(np.asarray(batched[0]), np.asarray(single), rtol=1e-12)


def test_trajectory_output():
    sys_ = VanDerPolOscillator()
    integ = make_integrator("rk4", num_substeps=5)
    traj = integ.solve_ivp_traj(sys_, jnp.array([1.0, 0.0]), jnp.array([0.0]), 0.5)
    assert traj.shape == (6, 2)
    end = integ.solve_ivp(sys_, jnp.array([1.0, 0.0]), jnp.array([0.0]), 0.5)
    np.testing.assert_allclose(np.asarray(traj[-1]), np.asarray(end), rtol=1e-12)
