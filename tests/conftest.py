"""Test configuration: CPU backend with 8 virtual devices, fp64 enabled.

Tests run on the CPU backend (JAX runs the same code paths as TPU — the
"fake backend" for TPU-less CI), with 8 virtual devices so the multi-chip
sharding paths in cfd_julia_tpu.parallel compile and execute without real
hardware. fp64 is enabled for accuracy parity with the Float64 reference.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
