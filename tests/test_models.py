"""Benchmark-system golden tests: dynamics values spot-checked against the
C++ reference equations (nonlinear_benchmark_systems.h, linear_benchmark_systems.h),
plus AD-linearization checks."""
import jax.numpy as jnp
import numpy as np
import pytest

from control_box_rst_tpu.models import (
    ALL_BENCHMARK_SYSTEMS,
    ArtsteinsCircle,
    CartPole,
    DoubleIntegratorDiscreteTime,
    DuffingOscillator,
    FreeSpaceRocket,
    LinearStateSpaceModel,
    MasslessPendulum,
    ParallelIntegratorSystem,
    SerialIntegratorSystem,
    SimplePendulum,
    ToyExample,
    VanDerPolOscillator,
    check_dimensions,
)


def test_all_systems_dimensions():
    for cls in ALL_BENCHMARK_SYSTEMS:
        if cls is LinearStateSpaceModel:
            sys_ = LinearStateSpaceModel.from_matrices(np.eye(3), np.ones((3, 2)))
        else:
            sys_ = cls()
        check_dimensions(sys_)


def test_van_der_pol_values():
    sys_ = VanDerPolOscillator(a=2.0)
    x = jnp.array([0.5, -1.0])
    u = jnp.array([0.7])
    f = sys_(x, u)
    # f1 = -a(x1^2-1)x2 - x1 + u = -2*(0.25-1)*(-1) - 0.5 + 0.7
    np.testing.assert_allclose(np.asarray(f), [-1.0, -2.0 * (0.25 - 1.0) * (-1.0) - 0.5 + 0.7])


def test_serial_integrator_chain():
    sys_ = SerialIntegratorSystem(nx=3, nu=1, time_constant=2.0)
    f = sys_(jnp.array([1.0, 2.0, 3.0]), jnp.array([4.0]))
    np.testing.assert_allclose(np.asarray(f), [2.0, 3.0, 2.0])


def test_parallel_integrators():
    sys_ = ParallelIntegratorSystem(nx=2, nu=2, time_constant=3.0)
    f = sys_(jnp.zeros(2), jnp.array([1.0, -1.0]))
    np.testing.assert_allclose(np.asarray(f), [3.0, -3.0])


def test_double_integrator_discrete_exact():
    sys_ = DoubleIntegratorDiscreteTime(dt=0.1)
    xn = sys_(jnp.array([1.0, 2.0]), jnp.array([0.5]))
    np.testing.assert_allclose(
        np.asarray(xn), [1.0 + 0.1 * 2.0 + 0.5 * 0.01 * 0.5, 2.0 + 0.1 * 0.5]
    )
    assert not sys_.continuous_time


def test_cart_pole_equilibrium():
    sys_ = CartPole()
    f = sys_(jnp.zeros(4), jnp.zeros(1))
    np.testing.assert_allclose(np.asarray(f), np.zeros(4), atol=1e-12)
    # push: force accelerates cart, decelerates pole
    f = sys_(jnp.zeros(4), jnp.array([1.0]))
    assert f[2] > 0 and f[3] < 0


def test_free_space_rocket():
    f = FreeSpaceRocket()(jnp.array([0.0, 10.0, 2.0]), jnp.array([1.0]))
    np.testing.assert_allclose(
        np.asarray(f), [10.0, (1.0 - 0.02 * 100.0) / 2.0, -0.01]
    )


def test_pendulums():
    f = SimplePendulum()(jnp.array([np.pi / 4, 0.1]), jnp.array([0.0]))
    assert f[0] == pytest.approx(0.1)
    assert f[1] == pytest.approx(-9.81 / 0.34 * np.sin(np.pi / 4))
    f = MasslessPendulum(omega0=2.0)(jnp.array([np.pi / 2, 0.0]), jnp.array([0.5]))
    np.testing.assert_allclose(np.asarray(f), [0.0, 0.5 - 2.0])


def test_toy_and_artstein():
    f = ToyExample(mu=0.5)(jnp.array([1.0, 2.0]), jnp.array([0.1]))
    np.testing.assert_allclose(
        np.asarray(f),
        [2.0 + 0.1 * (0.5 + 0.5 * 1.0), 1.0 + 0.1 * (0.5 - 4.0 * 0.5 * 2.0)],
    )
    f = ArtsteinsCircle()(jnp.array([1.0, 2.0]), jnp.array([2.0]))
    np.testing.assert_allclose(np.asarray(f), [(1.0 - 4.0) * 2.0, 2.0 * 1.0 * 2.0 * 2.0])


def test_duffing():
    f = DuffingOscillator(damping=0.2, spring_alpha=1.5, spring_beta=0.3)(
        jnp.array([2.0, 1.0]), jnp.array([0.4])
    )
    np.testing.assert_allclose(
        np.asarray(f), [1.0, -0.2 * 1.0 - 1.5 * 2.0 - 0.3 * 8.0 + 0.4]
    )


def test_ad_linearization_matches_fd():
    """AD linearization replaces the reference's central-FD getLinearA/B
    (system_dynamics_interface.h:144-157): cross-check vs numeric FD."""
    sys_ = VanDerPolOscillator(a=1.3)
    x0 = jnp.array([0.4, -0.2])
    u0 = jnp.array([0.1])
    A = np.asarray(sys_.linear_A(x0, u0))
    B = np.asarray(sys_.linear_B(x0, u0))
    eps = 1e-6
    for i in range(2):
        dx = np.zeros(2)
        dx[i] = eps
        fd = (np.asarray(sys_(x0 + dx, u0)) - np.asarray(sys_(x0 - dx, u0))) / (2 * eps)
        np.testing.assert_allclose(A[:, i], fd, atol=1e-6)
    fd = (np.asarray(sys_(x0, u0 + eps)) - np.asarray(sys_(x0, u0 - eps))) / (2 * eps)
    np.testing.assert_allclose(B[:, 0], fd, atol=1e-6)


def test_linear_state_space():
    A = np.array([[0.0, 1.0], [-1.0, -0.1]])
    B = np.array([[0.0], [1.0]])
    sys_ = LinearStateSpaceModel.from_matrices(A, B)
    x = jnp.array([1.0, 2.0])
    u = jnp.array([3.0])
    np.testing.assert_allclose(np.asarray(sys_(x, u)), A @ np.array([1.0, 2.0]) + B @ [3.0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sys_.linear_A(x, u)), A, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sys_.linear_B(x, u)), B, atol=1e-6)
