"""Measure boxqp_solve_pallas compile time vs (n_rounds, iters)."""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

from control_box_rst_tpu.ops.pallas.admm_kernel import boxqp_solve_pallas

B, Kst, nz, nc = 1024, 51, 4, 3
rng = np.random.default_rng(0)
f32 = lambda a: jnp.asarray(a, jnp.float32)
A = rng.standard_normal((B, Kst, nz, nz)) * 0.3
Hd = f32(np.einsum("bkij,bklj->bkil", A, A) + 2.0 * np.eye(nz))
J = f32(rng.standard_normal((B, Kst - 1, nc, nz)) * 0.5)
K = f32(rng.standard_normal((B, Kst - 1, nc, nz)) * 0.5)
g = f32(rng.standard_normal((B, Kst, nz)))
c = f32(rng.standard_normal((B, Kst - 1, nc)) * 0.1)
dlb = f32(np.full((B, Kst, nz), -0.7))
dub = f32(np.full((B, Kst, nz), 0.7))
rho = f32(np.full((B,), 1.0))
x = jnp.zeros((B, Kst, nz), jnp.float32)
zb = jnp.zeros((B, Kst, nz), jnp.float32)
yd = jnp.zeros((B, Kst - 1, nc), jnp.float32)
yb = jnp.zeros((B, Kst, nz), jnp.float32)

for n_rounds, iters in [(1, 12), (4, 12), (16, 12), (1, 50), (2, 50)]:
    t0 = time.perf_counter()
    out = boxqp_solve_pallas(
        Hd, J, K, g, c, dlb, dub, rho, x, zb, yd, yb,
        n_rounds=n_rounds, iters=iters, tol=1e-5, sigma=1e-6, alpha=1.6,
        rho_eq_scale=1e3, rho_min=1e-4, rho_max=1e4,
        tol_stat=1e-4, tol_feas=1e-5,
    )
    jax.block_until_ready(out[0])
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = boxqp_solve_pallas(
        Hd, J, K, g, c, dlb, dub, rho, x, zb, yd, yb,
        n_rounds=n_rounds, iters=iters, tol=1e-5, sigma=1e-6, alpha=1.6,
        rho_eq_scale=1e3, rho_min=1e-4, rho_max=1e4,
        tol_stat=1e-4, tol_feas=1e-5,
    )
    jax.block_until_ready(out[0])
    tr = time.perf_counter() - t0
    print(f"n_rounds={n_rounds:3d} iters={iters:3d}: "
          f"compile+run {tc:6.1f}s  steady {tr*1e3:7.1f} ms", flush=True)
