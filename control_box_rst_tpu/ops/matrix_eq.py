"""Matrix-equation solvers: Riccati, Lyapunov, Sylvester, controllability.

Ref parity: src/numerics/ matrix-equation suite —
  AlgebraicRiccatiContinuous (algebraic_riccati_continuous.h:58,83,145),
  AlgebraicRiccatiDiscrete (algebraic_riccati_discrete.h:58,85),
  LyapunovContinuous/Discrete (lyapunov_continuous.h:56,95),
  SylvesterContinuous/Discrete (sylvester_continuous.h:56,83),
  Controllability/Observability (controllability.h:46, observability.h:44).

TPU-first redesign: the reference solves these via Hamiltonian/symplectic
*Schur decompositions* (schur.h:157) — sequential QR iterations that map
poorly to accelerators and are unavailable under jit. Here:

  - CARE: matrix sign-function Newton iteration on the 2n×2n Hamiltonian
    (determinant-scaled, quadratically convergent, fixed iteration budget) —
    inverses and solves run on the MXU and the whole solver jits/vmaps.
  - DARE: structure-preserving doubling algorithm (SDA) — fixed ~25
    doubling steps, quadratic convergence.
  - Lyapunov/Sylvester: dense Kronecker linear systems (n² unknowns; MPC
    state dimensions are small, so an MXU dense solve beats Bartels-Stewart).
  - Controllability/Observability: Kalman reachability matrix + SVD rank.

All functions are pure, jittable, vmappable (batched model families get
batched Riccati solves for free — e.g. gain-scheduled LQR).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from control_box_rst_tpu.utils.precision import f32_matmuls


# --------------------------------------------------------------------------
# Continuous algebraic Riccati equation: A'X + XA - X B R^-1 B' X + Q = 0
# --------------------------------------------------------------------------

@f32_matmuls
def solve_care(A, B, Q, R, iters: int = 40):
    """Stabilizing CARE solution via the matrix sign function of the
    Hamiltonian M = [[A, -G], [-Q, -A']], G = B R⁻¹ Bᵀ.

    (ref: AlgebraicRiccatiContinuous::solve via Hamiltonian Schur,
    algebraic_riccati_continuous.h:58-145 — same equation, different
    algorithm.)"""
    A = jnp.asarray(A)
    n = A.shape[0]
    G = B @ jnp.linalg.solve(R, B.T)
    M = jnp.block([[A, -G], [-Q, -A.T]])

    def body(Z, _):
        Zinv = jnp.linalg.inv(Z)
        # determinant scaling: c = |det Z|^(-1/(2n))
        sign, logdet = jnp.linalg.slogdet(Z)
        c = jnp.exp(-logdet / (2 * n))
        c = jnp.where(jnp.isfinite(c) & (c > 0), c, 1.0)
        Znew = 0.5 * (c * Z + Zinv / c)
        return Znew, None

    W, _ = jax.lax.scan(body, M, None, length=iters)
    # stable subspace: (W + I)[I; X] = 0  →  [[W12],[W22+I]] X = [[-(W11+I)],[-W21]]
    I = jnp.eye(n, dtype=A.dtype)
    W11, W12 = W[:n, :n], W[:n, n:]
    W21, W22 = W[n:, :n], W[n:, n:]
    lhs = jnp.concatenate([W12, W22 + I], axis=0)
    rhs = -jnp.concatenate([W11 + I, W21], axis=0)
    X = jnp.linalg.solve(lhs.T @ lhs, lhs.T @ rhs)
    return 0.5 * (X + X.T)


def lqr_gain_continuous(A, B, Q, R):
    """K such that u = -K x stabilizes ẋ = Ax + Bu with LQR weights.
    (ref: LqrController CARE→K, lqr_controller.h:74)"""
    X = solve_care(A, B, Q, R)
    return jnp.linalg.solve(R, B.T @ X)


# --------------------------------------------------------------------------
# Discrete algebraic Riccati equation: A'XA - X - A'XB(R+B'XB)^-1 B'XA + Q = 0
# --------------------------------------------------------------------------

@f32_matmuls
def solve_dare(A, B, Q, R, iters: int = 30):
    """Stabilizing DARE solution via the structure-preserving doubling
    algorithm (SDA). (ref: AlgebraicRiccatiDiscrete, algebraic_riccati_
    discrete.h:58-85 — symplectic Schur there.)"""
    A = jnp.asarray(A)
    n = A.shape[0]
    G0 = B @ jnp.linalg.solve(R, B.T)
    I = jnp.eye(n, dtype=A.dtype)

    def body(carry, _):
        Ak, Gk, Hk = carry
        W = I + Gk @ Hk
        Winv_A = jnp.linalg.solve(W, Ak)
        A1 = Ak @ Winv_A
        G1 = Gk + Ak @ jnp.linalg.solve(W, Gk @ Ak.T)
        H1 = Hk + Ak.T @ Hk @ Winv_A
        return (A1, G1, H1), None

    (_, _, H), _ = jax.lax.scan(body, (A, G0, jnp.asarray(Q)), None, length=iters)
    return 0.5 * (H + H.T)


def lqr_gain_discrete(A, B, Q, R):
    """K such that u = -K x for x⁺ = Ax + Bu."""
    X = solve_dare(A, B, Q, R)
    return jnp.linalg.solve(R + B.T @ X @ B, B.T @ X @ A)


# --------------------------------------------------------------------------
# Lyapunov / Sylvester (Kronecker dense solves)
# --------------------------------------------------------------------------

@f32_matmuls
def solve_lyapunov_continuous(A, Q):
    """X with A'X + XA + Q = 0. (ref: LyapunovContinuous,
    lyapunov_continuous.h:56-95)"""
    A = jnp.asarray(A)
    n = A.shape[0]
    I = jnp.eye(n, dtype=A.dtype)
    L = jnp.kron(I, A.T) + jnp.kron(A.T, I)
    x = jnp.linalg.solve(L, -jnp.asarray(Q).reshape(-1, order="F"))
    X = x.reshape(n, n, order="F")
    return 0.5 * (X + X.T)


@f32_matmuls
def solve_lyapunov_discrete(A, Q):
    """X with A'XA - X + Q = 0. (ref: lyapunov_discrete.h)"""
    A = jnp.asarray(A)
    n = A.shape[0]
    L = jnp.kron(A.T, A.T) - jnp.eye(n * n, dtype=A.dtype)
    x = jnp.linalg.solve(L, -jnp.asarray(Q).reshape(-1, order="F"))
    X = x.reshape(n, n, order="F")
    return 0.5 * (X + X.T)


@f32_matmuls
def solve_sylvester_continuous(A, B, C):
    """X with AX + XB + C = 0. (ref: SylvesterContinuous,
    sylvester_continuous.h:56-83)"""
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    n, m = A.shape[0], B.shape[0]
    L = jnp.kron(jnp.eye(m, dtype=A.dtype), A) + jnp.kron(B.T, jnp.eye(n, dtype=A.dtype))
    x = jnp.linalg.solve(L, -jnp.asarray(C).reshape(-1, order="F"))
    return x.reshape(n, m, order="F")


@f32_matmuls
def solve_sylvester_discrete(A, B, C):
    """X with AXB - X + C = 0. (ref: sylvester_discrete.h)"""
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    n, m = A.shape[0], B.shape[0]
    L = jnp.kron(B.T, A) - jnp.eye(n * m, dtype=A.dtype)
    x = jnp.linalg.solve(L, -jnp.asarray(C).reshape(-1, order="F"))
    return x.reshape(n, m, order="F")


# --------------------------------------------------------------------------
# Schur decomposition (host-side utility)
# --------------------------------------------------------------------------

@f32_matmuls
def schur_ordered(A, select="lhp"):
    """(Ordered) real Schur decomposition A = Q T Qᵀ.

    Ref parity: corbo's Schur utilities with reordering predicate
    (ref: src/numerics/include/corbo-numerics/schur.h:157). Non-symmetric
    Schur has no accelerator-friendly jittable form, and none of this
    framework's solvers need it (Riccati/Lyapunov use sign/doubling/Kronecker
    methods, see module docstring); provided as a HOST-side numpy/scipy
    utility for users porting reference code. select: 'lhp' (stable
    continuous eigenvalues first), 'iuc' (inside unit circle first), or None.
    """
    import numpy as np
    import scipy.linalg

    A = np.asarray(A)
    if select is None:
        T, Q = scipy.linalg.schur(A, output="real")
        return T, Q
    T, Q, _ = scipy.linalg.schur(A, output="real", sort=select)
    return T, Q


# --------------------------------------------------------------------------
# System analysis
# --------------------------------------------------------------------------

def controllability_matrix(A, B):
    """[B, AB, …, A^{n-1}B]. (ref: Controllability::checkLinearTimeInvariant
    System, controllability.h:46,57)"""
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    n = A.shape[0]

    def body(Bk, _):
        return A @ Bk, Bk

    _, mats = jax.lax.scan(body, B, None, length=n)
    # mats: [n, n, nu] → [n, n*nu]
    return jnp.concatenate(list(mats), axis=1)


def is_controllable(A, B, tol: float = 1e-9):
    C = controllability_matrix(A, B)
    s = jnp.linalg.svd(C, compute_uv=False)
    rank = jnp.sum(s > tol * s[0])
    return rank == A.shape[0], rank


def observability_matrix(A, C):
    """[C; CA; …; CA^{n-1}]. (ref: Observability, observability.h:44,55)"""
    return controllability_matrix(jnp.asarray(A).T, jnp.asarray(C).T).T


def is_observable(A, C, tol: float = 1e-9):
    O = observability_matrix(A, C)
    s = jnp.linalg.svd(O, compute_uv=False)
    rank = jnp.sum(s > tol * s[0])
    return rank == jnp.asarray(A).shape[0], rank
