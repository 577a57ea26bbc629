"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests run on
XLA's host-platform device emulation (SURVEY.md section 4: fake pods via
xla_force_host_platform_device_count).

The image's sitecustomize pins JAX_PLATFORMS=axon (single-TPU tunnel) at
interpreter start, so the env var cannot be overridden here — but the
config flag can, as long as no backend has been initialized yet.

TPU lane: `pytest -m tpu tests/` skips the CPU pin and runs the
`@pytest.mark.tpu` subset on the real chip (tests/tpu/) — f32 production
configs, fused-vs-XLA on-device agreement, Pallas kernels compiled by
Mosaic rather than interpret mode. Those tests self-skip when the backend
is not a TPU, so the default CPU run just deselects them.
"""
import os
import sys


def _tpu_lane_requested(argv) -> bool:
    for i, a in enumerate(argv):
        if a == "-m" and i + 1 < len(argv) and "tpu" in argv[i + 1]:
            return True
        if a.startswith("-m=") and "tpu" in a[3:]:
            return True
    return False


# pytest-xdist workers don't carry the original argv; the master process
# (which does) exports the lane decision through the environment, which
# workers inherit. (The suite default is `-n 2 --dist loadfile`, see
# pytest.ini — loadfile keeps every file, including the whole TPU lane,
# on one worker, so module fixtures compile once and the single chip is
# never contended.)
_TPU_LANE = (
    _tpu_lane_requested(sys.argv) or os.environ.get("CBRT_TPU_LANE") == "1"
)
if _TPU_LANE:
    os.environ["CBRT_TPU_LANE"] = "1"

if not _TPU_LANE:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _TPU_LANE:
    jax.config.update("jax_platforms", "cpu")
    # Double precision for numerics-golden tests; production uses f32/bf16.
    jax.config.update("jax_enable_x64", True)

    assert jax.default_backend() == "cpu"
    # an externally-pinned xla_force_host_platform_device_count is honored
    # (e.g. timing experiments); tests that NEED the 8-device mesh assert
    # jax.device_count() themselves and fail loudly if it was overridden
    if "xla_force_host_platform_device_count=8" in os.environ["XLA_FLAGS"]:
        assert jax.device_count() == 8, jax.devices()
