"""FD-collocation defect tests (ref: finite_differences_collocation.h forms)."""
import jax.numpy as jnp
import numpy as np
import pytest

from control_box_rst_tpu.models import LinearStateSpaceModel, VanDerPolOscillator
from control_box_rst_tpu.ops import (
    FD_COLLOCATIONS,
    hermite_simpson_defect,
    make_integrator,
)
from control_box_rst_tpu.ops.collocation import (
    quadrature_hermite_simpson,
    quadrature_left_sum,
    quadrature_trapezoidal,
)


def test_defect_forms_match_reference_convention():
    sys_ = VanDerPolOscillator()
    x1 = jnp.array([0.3, -0.7])
    x2 = jnp.array([0.5, -0.2])
    u = jnp.array([0.9])
    dt = 0.25
    diff = (np.asarray(x2) - np.asarray(x1)) / dt
    np.testing.assert_allclose(
        np.asarray(FD_COLLOCATIONS["forward"](sys_, x1, u, x2, dt)),
        np.asarray(sys_(x1, u)) - diff,
    )
    np.testing.assert_allclose(
        np.asarray(FD_COLLOCATIONS["backward"](sys_, x1, u, x2, dt)),
        np.asarray(sys_(x2, u)) - diff,
    )
    np.testing.assert_allclose(
        np.asarray(FD_COLLOCATIONS["midpoint"](sys_, x1, u, x2, dt)),
        np.asarray(sys_(0.5 * (x1 + x2), u)) - diff,
    )
    np.testing.assert_allclose(
        np.asarray(FD_COLLOCATIONS["crank_nicolson"](sys_, x1, u, x2, dt)),
        0.5 * (np.asarray(sys_(x1, u)) + np.asarray(sys_(x2, u))) - diff,
    )


@pytest.mark.parametrize("name", ["forward", "backward", "midpoint", "crank_nicolson"])
def test_defect_zero_on_consistent_step(name):
    """If x2 comes from a matching one-step rule, the defect vanishes."""
    A = np.array([[0.0, 1.0], [-1.0, 0.0]])
    B = np.array([[0.0], [1.0]])
    sys_ = LinearStateSpaceModel.from_matrices(A, B)
    x1 = jnp.array([1.0, 0.0])
    u = jnp.array([0.2])
    dt = 1e-4  # all rules agree to O(dt^2)
    x2 = x1 + dt * sys_(x1, u)
    defect = FD_COLLOCATIONS[name](sys_, x1, u, x2, dt)
    assert np.max(np.abs(np.asarray(defect))) < 1e-3


def test_hermite_simpson_defect_high_accuracy():
    """HS defect at the true solution should be O(dt^4)-small, much smaller
    than forward Euler's."""
    sys_ = VanDerPolOscillator()
    x1 = jnp.array([1.0, 0.5])
    u = jnp.array([0.3])
    dt = 0.05
    x2 = make_integrator("rk7", num_substeps=32).solve_ivp(sys_, x1, u, dt)
    hs = np.max(np.abs(np.asarray(hermite_simpson_defect(sys_, x1, u, x2, dt))))
    fwd = np.max(np.abs(np.asarray(FD_COLLOCATIONS["forward"](sys_, x1, u, x2, dt))))
    assert hs < 1e-6
    assert hs < fwd * 1e-2


def test_quadrature_rules_on_polynomial():
    """Trapezoid exact for linear l(x) along linear path; HS beats trapezoid
    for the nonlinear case."""

    def l(x, u):
        return x[0]

    x1 = jnp.array([1.0])
    x2 = jnp.array([3.0])
    u = jnp.array([0.0])
    dt = 2.0
    # straight-line x(t): integral of x over [0,2] with x from 1 to 3 = 4
    assert float(quadrature_trapezoidal(l, x1, u, x2, dt)) == pytest.approx(4.0)
    assert float(quadrature_left_sum(l, x1, u, x2, dt)) == pytest.approx(2.0)
    hs = float(quadrature_hermite_simpson(l, x1, u, x2, dt))
    assert hs == pytest.approx(4.0)
