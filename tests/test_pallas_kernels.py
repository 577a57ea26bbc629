"""Pallas kernel correctness tests (interpret mode on the CPU mesh)."""
import jax
import jax.numpy as jnp
import numpy as np

from control_box_rst_tpu.ops.btridiag import btridiag_cholesky, btridiag_solve
from control_box_rst_tpu.ops.pallas.btridiag_kernel import btridiag_solve_pallas


def test_btridiag_pallas_matches_scan():
    rng = np.random.default_rng(3)
    B, K, nz = 5, 13, 4
    D = rng.standard_normal((B, K, nz, nz)).astype(np.float32)
    D = D @ D.transpose(0, 1, 3, 2) + 10 * np.eye(nz, dtype=np.float32)
    O = (0.3 * rng.standard_normal((B, K - 1, nz, nz))).astype(np.float32)
    b = rng.standard_normal((B, K, nz)).astype(np.float32)

    ref = jax.vmap(
        lambda D, O, b: btridiag_solve(*btridiag_cholesky(D, O), b)
    )(jnp.asarray(D), jnp.asarray(O), jnp.asarray(b))
    out = btridiag_solve_pallas(
        jnp.asarray(D), jnp.asarray(O), jnp.asarray(b), tile_b=8, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-6)


def test_btridiag_pallas_padding():
    """Batch not divisible by the tile: padding must not corrupt results."""
    rng = np.random.default_rng(5)
    B, K, nz = 3, 7, 3
    D = rng.standard_normal((B, K, nz, nz)).astype(np.float32)
    D = D @ D.transpose(0, 1, 3, 2) + 8 * np.eye(nz, dtype=np.float32)
    O = (0.2 * rng.standard_normal((B, K - 1, nz, nz))).astype(np.float32)
    b = rng.standard_normal((B, K, nz)).astype(np.float32)
    ref = jax.vmap(
        lambda D, O, b: btridiag_solve(*btridiag_cholesky(D, O), b)
    )(jnp.asarray(D), jnp.asarray(O), jnp.asarray(b))
    out = btridiag_solve_pallas(
        jnp.asarray(D), jnp.asarray(O), jnp.asarray(b), tile_b=4, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-6)
