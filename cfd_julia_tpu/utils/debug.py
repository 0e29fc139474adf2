"""Numerical-safety utilities — the engine's analogue of the reference's
(nonexistent) sanitizers (SURVEY §5: JAX purity + NaN checks are the
race-detector/sanitizer equivalent for this workload).

* `nan_guard()` context: enables jax_debug_nans so the first NaN-producing
  primitive raises with a traceback.
* `check_finite(tree, where)`: on-device all-finite check for use at
  checkpoint boundaries; raises with the offending leaf path.
"""
from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def nan_guard(enable: bool = True):
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def check_finite(tree, where: str = "state"):
    """Raise FloatingPointError naming the first non-finite leaf."""
    leaves = jax.tree_util.tree_leaves_with_path(tree)
    for path, leaf in leaves:
        arr = jnp.asarray(leaf)
        if jnp.issubdtype(arr.dtype, jnp.floating) or jnp.issubdtype(
            arr.dtype, jnp.complexfloating
        ):
            if not bool(jnp.isfinite(arr).all()):
                raise FloatingPointError(
                    f"non-finite values in {where}{jax.tree_util.keystr(path)}"
                )
    return tree
