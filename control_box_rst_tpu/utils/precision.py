"""Matmul-precision discipline for TPU.

The framework's linear algebra is small-matrix (nx, nu ≲ 10, horizon blocks)
— matmul FLOPs are negligible, but TPU's default bf16 MXU precision (8-bit
mantissa) is catastrophically coarse for Cholesky factorizations, ADMM
iterations, and Riccati recursions: solver state diverges to NaN. The
reference never faces this (CPU doubles everywhere).

`f32_matmuls` pins `jax.default_matmul_precision("highest")` around the
*trace* of a function, so every einsum/dot/conv inside a solver entry point
runs at full f32 on TPU regardless of the caller's global configuration.
This is a trace-time context — zero runtime cost, and it composes with
jit/vmap/scan.
"""
from __future__ import annotations

import functools

import jax


def f32_matmuls(fn):
    """Decorator: trace `fn` under matmul precision 'highest'."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
