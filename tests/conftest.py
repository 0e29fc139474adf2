"""Test configuration: CPU backend with 8 virtual devices, fp64 enabled.

Tests run on the CPU backend (JAX runs the same code paths as TPU — the
"fake backend" for TPU-less CI), with 8 virtual devices so the multi-chip
sharding paths in cfd_julia_tpu.parallel compile and execute without real
hardware. fp64 is enabled for accuracy parity with the Float64 reference.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the ambient environment pins JAX_PLATFORMS=axon (TPU tunnel); the config
# update below overrides it reliably, the env var alone does not.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Compiles dominate test runtime (execution is microseconds/step); the
# persistent cache is keyed on HLO so re-traced-but-identical programs and
# repeated pytest runs skip XLA compilation entirely.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
