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

import hashlib
import os


def host_cache_key() -> str:
    """Short fingerprint of this host's CPU feature set.

    XLA:CPU persists AOT-compiled executables into the compilation cache
    keyed only by the computation — NOT by the host's CPU features.  A
    cache populated on one machine and read on another with different
    vector extensions makes the loader warn "Compile machine features
    ... doesn't match ... could lead to SIGILL" and is a latent crash
    (observed in MULTICHIP_r03.json when the driver reran the dryrun on
    a different host).  Keying the cache *directory* by the feature set
    makes heterogeneous hosts use disjoint caches.
    """
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    if not feats:
        import platform as _platform

        feats = f"{_platform.machine()}-{_platform.processor()}"
    return hashlib.sha1(feats.encode()).hexdigest()[:10]


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
        # per-host subdirectory: AOT CPU executables from another machine
        # must never be loaded here (SIGILL risk — see host_cache_key).
        # Legacy entries at the unkeyed root are deliberately ORPHANED,
        # not migrated: the cache roots are shared across heterogeneous
        # hosts (MULTICHIP_r03 evidence), entries carry no backend/host
        # marker in their filenames, so a migration would import exactly
        # the foreign CPU AOT artifacts this keying eliminates.  Cost: a
        # one-time cold compile per program on each host (and the bench
        # programs changed this round anyway — chunked windows + physics
        # metrics — so the old entries were already stale).
        keyed = os.path.join(os.path.expanduser(cache_dir),
                             f"host-{host_cache_key()}")
        jax.config.update("jax_compilation_cache_dir", keyed)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
