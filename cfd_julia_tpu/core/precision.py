"""Precision policy: fp32 by default (TPU-native), fp64 opt-in for parity tests.

The reference runs everything in Float64 on CPU. TPU v5e has no native fp64
units, so the engine's perf path is fp32 (with fp64 emulation available when
`jax_enable_x64` is on — used by the accuracy parity tests on CPU).

Usage:
    from cfd_julia_tpu.core import precision
    dtype = precision.default_dtype()         # fp32, or fp64 if x64 enabled
    with precision.x64():                      # context-managed fp64
        ...
"""
from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp


def x64_enabled() -> bool:
    return bool(jax.config.jax_enable_x64)


def default_dtype():
    """Default real dtype: float64 when x64 is enabled, else float32."""
    return jnp.float64 if x64_enabled() else jnp.float32


def complex_dtype(real_dtype=None):
    """Matching complex dtype for a real dtype."""
    rd = jnp.dtype(real_dtype or default_dtype())
    return jnp.complex128 if rd == jnp.float64 else jnp.complex64


@contextlib.contextmanager
def x64(enable: bool = True):
    """Temporarily toggle fp64 globally (affects subsequent traces only)."""
    prev = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", enable)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", prev)
