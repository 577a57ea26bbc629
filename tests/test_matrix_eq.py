"""Matrix-equation golden tests vs scipy (reference-style numerics tests,
SURVEY.md §4 / ref src/numerics/test/test_algebraic_riccati_*.cpp)."""
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from control_box_rst_tpu.ops.matrix_eq import (
    controllability_matrix,
    is_controllable,
    is_observable,
    lqr_gain_continuous,
    lqr_gain_discrete,
    solve_care,
    solve_dare,
    solve_lyapunov_continuous,
    solve_lyapunov_discrete,
    solve_sylvester_continuous,
    solve_sylvester_discrete,
)

rng = np.random.default_rng(42)


def _random_stabilizable(n, m):
    A = rng.standard_normal((n, n))
    B = rng.standard_normal((n, m))
    return A, B


@pytest.mark.parametrize("n,m", [(2, 1), (4, 2), (6, 3)])
def test_care_vs_scipy(n, m):
    A, B = _random_stabilizable(n, m)
    Q = np.eye(n) * 2.0
    R = np.eye(m) * 0.5
    X = np.asarray(solve_care(A, B, Q, R))
    Xs = scipy.linalg.solve_continuous_are(A, B, Q, R)
    np.testing.assert_allclose(X, Xs, rtol=1e-8, atol=1e-8)
    # residual check
    G = B @ np.linalg.solve(R, B.T)
    res = A.T @ X + X @ A - X @ G @ X + Q
    assert np.max(np.abs(res)) < 1e-8


@pytest.mark.parametrize("n,m", [(2, 1), (4, 2)])
def test_dare_vs_scipy(n, m):
    A, B = _random_stabilizable(n, m)
    A = A / (np.max(np.abs(np.linalg.eigvals(A))) + 0.2)  # keep it tame
    Q = np.eye(n)
    R = np.eye(m)
    X = np.asarray(solve_dare(A, B, Q, R))
    Xs = scipy.linalg.solve_discrete_are(A, B, Q, R)
    np.testing.assert_allclose(X, Xs, rtol=1e-8, atol=1e-8)


def test_lqr_gains_stabilize():
    A = np.array([[0.0, 1.0], [0.5, -0.2]])
    B = np.array([[0.0], [1.0]])
    K = np.asarray(lqr_gain_continuous(A, B, np.eye(2), np.eye(1)))
    eig = np.linalg.eigvals(A - B @ K)
    assert np.all(eig.real < 0)
    Ad = np.eye(2) + 0.1 * A
    Bd = 0.1 * B
    Kd = np.asarray(lqr_gain_discrete(Ad, Bd, np.eye(2), np.eye(1)))
    eigd = np.linalg.eigvals(Ad - Bd @ Kd)
    assert np.all(np.abs(eigd) < 1.0)


def test_lyapunov_continuous():
    A = np.array([[-1.0, 2.0], [0.0, -3.0]])
    Q = np.eye(2)
    X = np.asarray(solve_lyapunov_continuous(A, Q))
    res = A.T @ X + X @ A + Q
    assert np.max(np.abs(res)) < 1e-10
    Xs = scipy.linalg.solve_continuous_lyapunov(A.T, -Q)
    np.testing.assert_allclose(X, Xs, atol=1e-9)


def test_lyapunov_discrete():
    A = np.array([[0.5, 0.1], [-0.2, 0.3]])
    Q = np.eye(2)
    X = np.asarray(solve_lyapunov_discrete(A, Q))
    res = A.T @ X @ A - X + Q
    assert np.max(np.abs(res)) < 1e-10


def test_sylvester_continuous():
    A = rng.standard_normal((3, 3)) - 3 * np.eye(3)
    B = rng.standard_normal((2, 2)) - 3 * np.eye(2)
    C = rng.standard_normal((3, 2))
    X = np.asarray(solve_sylvester_continuous(A, B, C))
    res = A @ X + X @ B + C
    assert np.max(np.abs(res)) < 1e-10


def test_sylvester_discrete():
    A = 0.3 * rng.standard_normal((3, 3))
    B = 0.3 * rng.standard_normal((2, 2))
    C = rng.standard_normal((3, 2))
    X = np.asarray(solve_sylvester_discrete(A, B, C))
    res = A @ X @ B - X + C
    assert np.max(np.abs(res)) < 1e-10


def test_controllability():
    # double integrator is controllable
    A = np.array([[0.0, 1.0], [0.0, 0.0]])
    B = np.array([[0.0], [1.0]])
    Cm = np.asarray(controllability_matrix(A, B))
    np.testing.assert_allclose(Cm, np.hstack([B, A @ B]))
    ok, rank = is_controllable(A, B)
    assert bool(ok) and int(rank) == 2
    # uncontrollable: B in invariant subspace
    A2 = np.diag([1.0, 2.0])
    B2 = np.array([[1.0], [0.0]])
    ok2, rank2 = is_controllable(A2, B2)
    assert not bool(ok2) and int(rank2) == 1


def test_observability():
    A = np.array([[0.0, 1.0], [0.0, 0.0]])
    C = np.array([[1.0, 0.0]])
    ok, rank = is_observable(A, C)
    assert bool(ok)
    C2 = np.array([[0.0, 1.0]])  # only velocity observed → position unobservable
    ok2, _ = is_observable(A, C2)
    assert not bool(ok2)
