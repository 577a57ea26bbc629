"""Minimal boxqp_solve_pallas smoke test on TPU."""
import time
import jax
import jax.numpy as jnp
import numpy as np

from control_box_rst_tpu.ops.pallas.admm_kernel import boxqp_solve_pallas

B, Kst, nz, nc = 1024, 9, 3, 2
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

print("compiling...", flush=True)
t0 = time.perf_counter()
out = boxqp_solve_pallas(
    Hd, J, K, g, c, dlb, dub, rho, x, zb, yd, yb,
    n_rounds=4, iters=12, tol=1e-5, sigma=1e-6, alpha=1.6,
    rho_eq_scale=1e3, rho_min=1e-4, rho_max=1e4,
)
jax.block_until_ready(out[0])
print(f"first call {time.perf_counter()-t0:.1f}s", flush=True)
print("pr max/median:", float(out[4].max()), float(jnp.median(out[4])))
print("dr max/median:", float(out[5].max()), float(jnp.median(out[5])))
print("iters:", np.unique(np.asarray(out[6])))
t0 = time.perf_counter()
for _ in range(10):
    out = boxqp_solve_pallas(
        Hd, J, K, g, c, dlb, dub, rho, x, zb, yd, yb,
        n_rounds=4, iters=12, tol=1e-5, sigma=1e-6, alpha=1.6,
        rho_eq_scale=1e3, rho_min=1e-4, rho_max=1e4,
    )
jax.block_until_ready(out[0])
print(f"steady: {(time.perf_counter()-t0)/10*1e3:.2f} ms/call", flush=True)
