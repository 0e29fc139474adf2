"""Shared JAX runtime configuration (single home for the axon-tunnel
workarounds).

Environment facts this encodes (CLAUDE.md / docs/PERF.md):
* The ambient environment pins JAX_PLATFORMS=axon (remote TPU tunnel).
  Setting the env var is NOT reliably honored once the plugin registers;
  jax.config.update("jax_platforms", ...) is.  Scripts that must respect a
  user's JAX_PLATFORMS=cpu (or be pinned outright) call configure_jax.
* Remote compiles take minutes; the persistent compilation cache makes
  re-runs near-instant.  Cache dirs are separated per use (test vs bench)
  because cross-backend entries spam machine-feature warnings.

Deliberately dependency-free (no cfd_julia_tpu imports) so entry scripts
can use it before anything heavy loads.
"""
from __future__ import annotations

import os


def configure_jax(cache_dir: str | None = "~/.cache/jax_test_cache",
                  platform: str | None = None,
                  mirror_platform_env: bool = True,
                  min_compile_secs: float = 0.3) -> None:
    """Set platform + persistent-cache config before backend init.

    platform: pin this backend (e.g. "cpu" for the multichip dryrun);
    otherwise, with mirror_platform_env, honor a user-set JAX_PLATFORMS.
    cache_dir=None skips cache setup (e.g. the CLI, whose commands set
    their own).
    """
    import jax

    want = platform or (os.environ.get("JAX_PLATFORMS")
                        if mirror_platform_env else None)
    if want:
        try:
            jax.config.update("jax_platforms", want)
        except RuntimeError:
            pass  # backend already initialized; callers that must be sure
                  # check jax.devices(<platform>) themselves
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
