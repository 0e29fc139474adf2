"""Test configuration: CPU backend with 8 virtual devices, fp64 enabled.

Tests run on the CPU backend (JAX runs the same code paths as TPU — the
"fake backend" for TPU-less CI), with 8 virtual devices so the multi-chip
sharding paths in cfd_julia_tpu.parallel compile and execute without real
hardware. fp64 is enabled for accuracy parity with the Float64 reference.

TPU smoke tier: `CFD_TPU_SMOKE=1 python -m pytest tests/test_tpu_smoke.py -q`
keeps the ambient backend (the axon TPU tunnel) instead — fp32, one chip —
to catch backend-only breakage (no IRFFT/complex128, Mosaic compile,
scatter semantics). Run manually when the tunnel is up.
"""
import os

import pytest

TPU_SMOKE = os.environ.get("CFD_TPU_SMOKE") == "1"

if not TPU_SMOKE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

from cfd_julia_tpu.jaxconfig import configure_jax  # noqa: E402

# Compiles dominate test runtime (execution is microseconds/step); the
# persistent cache is keyed on HLO so re-traced-but-identical programs and
# repeated pytest runs skip XLA compilation entirely.  CPU suite pins the
# CPU backend (the env var alone is not honored — see jaxconfig); the TPU
# smoke tier keeps the ambient backend and its own cache dir.
if TPU_SMOKE:
    configure_jax(cache_dir="~/.cache/jax_tpu_smoke_cache",
                  mirror_platform_env=False)
else:
    configure_jax(cache_dir="~/.cache/jax_test_cache", platform="cpu")
    jax.config.update("jax_enable_x64", True)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: requires a real TPU backend (CFD_TPU_SMOKE=1)")


def pytest_collection_modifyitems(config, items):
    skip_tpu = pytest.mark.skip(reason="TPU smoke tier: set CFD_TPU_SMOKE=1")
    skip_cpu = pytest.mark.skip(
        reason="CPU/virtual-device suite; not meaningful under CFD_TPU_SMOKE")
    for item in items:
        has_tpu = "tpu" in item.keywords
        if has_tpu and not TPU_SMOKE:
            item.add_marker(skip_tpu)
        elif not has_tpu and TPU_SMOKE:
            item.add_marker(skip_cpu)
