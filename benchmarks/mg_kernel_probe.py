"""On-chip decomposition of the fused MG edge kernels at 4096^2.

Times each kernel in a scan window (CLAUDE.md discipline: forced sync,
perturbed inputs) while varying the smoothing sweep count and the tile,
to attribute the measured ~5.7 ms descend edge (~40 GB/s apparent) to
DMA, VPU sweep arithmetic, or the banded-matmul restriction:

* sweeps scaling  -> slope = VPU cost per half-update pair, intercept =
  DMA + residual + restrict floor
* rb-only vs descend -> adds the residual+restrict increment
* tile 32 vs 64 (where it fits) -> DMA-grain / pipelining sensitivity

Run in its own subprocess on the TPU tunnel: python benchmarks/mg_kernel_probe.py
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from cfd_julia_tpu.ops import pallas_kernels

    n = 4096
    dx = dy = 1.0 / n
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
    uc = jnp.asarray(rng.standard_normal((n // 2 + 1, n // 2 + 1)),
                     jnp.float32)
    print(f"# devices: {jax.devices()}", flush=True)

    def window(fn, *args, iters=20):
        """jit a scan of `iters` applications with in-program input
        perturbation, synced by an actual host transfer — on the axon
        tunnel block_until_ready returns before remote compute finishes
        (tpu-env-quirks), so the ONLY honest fence is float(scalar)."""
        @jax.jit
        def run(a0, args):
            def body(carry, i):
                out = fn(carry * (1.0 + 1e-7 * i), *args)
                out = out[0] if isinstance(out, tuple) else out
                return out, ()
            out, _ = lax.scan(body, a0,
                              jnp.arange(iters, dtype=jnp.float32))
            return out[1, 1]
        float(run(u, args))                       # compile+warm, fenced
        t0 = time.perf_counter()
        float(run(u * 1.0000001, args))
        return (time.perf_counter() - t0) / iters * 1e3

    for sweeps in (1, 2, 3, 4):
        ms = window(functools.partial(
            pallas_kernels.redblack_sweeps_fused, dx=dx, dy=dy,
            iters=sweeps, tile=32), f)
        print(f'{{"bench": "rb_only_s{sweeps}_t32", "ms": {ms:.3f}}}',
              flush=True)

    for sweeps in (1, 2, 3):
        ms = window(functools.partial(
            pallas_kernels.smooth_residual_restrict_fused, dx=dx, dy=dy,
            sweeps=sweeps, tile=32), f)
        print(f'{{"bench": "descend_s{sweeps}_t32", "ms": {ms:.3f}}}',
              flush=True)

    for tile in (16, 32):
        ms = window(functools.partial(
            pallas_kernels.smooth_residual_restrict_fused, dx=dx, dy=dy,
            sweeps=2, tile=tile), f)
        print(f'{{"bench": "descend_s2_t{tile}", "ms": {ms:.3f}}}',
              flush=True)

    for sweeps in (1, 2):
        ms = window(functools.partial(
            pallas_kernels.prolong_correct_smooth_fused, dx=dx, dy=dy,
            sweeps=sweeps, tile=32), f, uc)
        print(f'{{"bench": "ascend_s{sweeps}_t32", "ms": {ms:.3f}}}',
              flush=True)

    # pure residual+restrict (no smoothing): the floor without sweeps.
    # Output is coarse, so serialize via a scalar dependence (bench.py's
    # `0.0 * chk` trick) instead of carrying it
    def rr(uu, ff):
        fc = pallas_kernels.residual_restrict_fused(uu, ff, dx, dy,
                                                    tile=32)
        return uu * (1.0 + 0.0 * fc[1, 1])
    ms = window(rr, f)
    print(f'{{"bench": "resrestrict_t32", "ms": {ms:.3f}}}', flush=True)


if __name__ == "__main__":
    main()
