"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests run on
XLA's host-platform device emulation (SURVEY.md section 4: fake pods via
xla_force_host_platform_device_count).

The image's sitecustomize pins JAX_PLATFORMS=axon (single-TPU tunnel) at
interpreter start, so the env var cannot be overridden here — but the
config flag can, as long as no backend has been initialized yet.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Double precision for numerics-golden tests; the production path uses f32/bf16.
jax.config.update("jax_enable_x64", True)

assert jax.default_backend() == "cpu"
assert jax.device_count() == 8, jax.devices()
