"""Headline benchmark: lid-driven cavity steps/sec at 1024^2 (fp32, one chip).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Methodology: the whole measured window is a single `lax.scan` jit (zero
host round-trips per step, the framework's real execution mode); a scalar
host pull after the scan forces materialization (plain block_until_ready
returns early through the remote-TPU tunnel). dt is set diffusively stable
for 1024^2 at Re=100 (nu dt/dx^2 <= 0.2 -> dt = 2e-5) and the result is
checked finite.

vs_baseline: the reference publishes no numbers (BASELINE.md) and Julia is
not in this image, so the denominator is an analytic estimate of the
reference script at 1024^2 on one CPU core: the cavity step is dominated
by 6 DST-I transforms of 1023^2 (lid_driven_cavity.jl:80-110), ~5 n^2
log2 n flops each => ~6e8 flops/step; at the ~2.5 GF/s FFTW single-thread
rate that is ~0.35 s/step => ~2.5 steps/sec. (North star: >= 100x =>
>= 250 steps/sec.)

Secondary metrics go to stderr.
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

JULIA_BASELINE_STEPS_PER_SEC = 2.5  # analytic estimate, see docstring


def _timed_scan(step, state, steps: int, sync):
    from cfd_julia_tpu.stepping import loop

    run = jax.jit(lambda s: loop.run_steps(step, s, steps))
    state = run(state)          # compile + warm up
    sync(state)
    t0 = time.perf_counter()
    state = run(state)
    sync(state)
    dt = time.perf_counter() - t0
    return steps / dt, state


def bench_cavity(nx: int = 1024, steps: int = 200, dtype=jnp.float32):
    from cfd_julia_tpu.models import cavity

    cfg = cavity.CavityConfig(nx=nx, ny=nx, dt=2e-5)
    step = cavity.make_step_fn(cfg)
    w0 = jnp.zeros((nx + 1, nx + 1), dtype)
    state = (w0, jnp.zeros_like(w0), jnp.zeros((), dtype))
    sps, state = _timed_scan(step, state, steps,
                             lambda s: float(s[0].sum()))
    assert bool(jnp.isfinite(state[0]).all()), "cavity bench went non-finite"
    return sps


def bench_pseudospectral(nx: int = 2048, steps: int = 20, dtype=jnp.float32):
    from cfd_julia_tpu.models import vortex

    cfg = vortex.VortexConfig(nx=nx, ny=nx, solver="ps23", dt=1e-3)
    step = vortex.make_spectral_step(cfg, dtype)
    w0 = vortex.initial_vorticity(cfg, dtype)
    wf = jnp.fft.fft2(w0.astype(jnp.complex64))
    sps, wf = _timed_scan(step, wf, steps,
                          lambda s: float(jnp.abs(s).sum()))
    return sps


def bench_multigrid(nx: int = 4096, cycles: int = 10, dtype=jnp.float32):
    """North-star secondary: 4096^2 multigrid Poisson wall-clock (fixed
    10 V-cycles, which reach the fp32 residual floor ~2.7e-6 rel)."""
    from cfd_julia_tpu.models import poisson2d
    from cfd_julia_tpu.poisson import multigrid

    mgc = multigrid.MGConfig(tol=1e-30, max_cycles=cycles)
    cfg = poisson2d.PoissonConfig(nx=nx, ny=nx, solver="multigrid",
                                  problem="poly", mg=mgc)
    _, _, _, _, ue, f = poisson2d.build_problem(cfg, dtype)
    u0 = poisson2d._dirichlet_init(ue)
    res = multigrid.solve(f, u0, cfg.dx, cfg.dy, cfg=mgc)  # compile
    float(res.rms)
    t0 = time.perf_counter()
    res = multigrid.solve(f * (1.0 + 1e-6), u0, cfg.dx, cfg.dy, cfg=mgc)
    float(res.rms)
    return time.perf_counter() - t0


def main():
    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    cavity_sps = bench_cavity()
    print(f"# cavity 1024^2 fp32: {cavity_sps:.1f} steps/s", file=sys.stderr)

    # headline first (secondaries compile for minutes and must never block it)
    print(json.dumps({
        "metric": "cavity_1024_steps_per_sec",
        "value": round(cavity_sps, 2),
        "unit": "steps/s",
        "vs_baseline": round(cavity_sps / JULIA_BASELINE_STEPS_PER_SEC, 1),
    }), flush=True)

    try:
        ps_sps = bench_pseudospectral()
        print(f"# pseudospectral 2048^2 fp32: {ps_sps:.1f} steps/s",
              file=sys.stderr)
    except Exception as e:  # secondary metric must not break the headline
        print(f"# pseudospectral bench failed: {e}", file=sys.stderr)
    try:
        mg_s = bench_multigrid()
        print(f"# multigrid 4096^2 fp32, 10 V-cycles: {mg_s:.3f} s",
              file=sys.stderr)
    except Exception as e:
        print(f"# multigrid bench failed: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
