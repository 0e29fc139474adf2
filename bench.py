"""Headline benchmark: lid-driven cavity steps/sec at 1024^2 (fp32, one chip).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Methodology: the whole measured window is a single `lax.scan` jit (zero
host round-trips per step, the framework's real execution mode); a scalar
host pull after the scan forces materialization (plain block_until_ready
returns early through the remote-TPU tunnel). dt is set diffusively stable
for 1024^2 at Re=100 (nu dt/dx^2 <= 0.2 -> dt = 2e-5) and the result is
checked finite.

vs_baseline: the reference publishes no numbers and Julia is not in this
image, so the denominator is anchored to a MEASUREMENT (BASELINE.md
"Measured reference baseline"): the reference's own NumPy vectorized
vortex-merger port runs 1.89 steps/s at 1024^2 on this machine's CPU
(fair variant); the cavity step does ~half its transform work (6 real
DST-I of 1023^2 vs 6 complex FFTs) plus the same 3 Arakawa RHS evals
=> ~4.2 steps/s NumPy-equivalent; Julia/FFTW <= 2x faster => 5-8 steps/s.
The divisor is the midpoint 6.5 (the emitted JSON carries the range).
North star: >= 100x => >= 650-800 steps/sec.

Secondary metrics go to stderr.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

# measured-anchored Julia estimate, midpoint of 5-8 steps/s (see docstring)
JULIA_BASELINE_STEPS_PER_SEC = 6.5
HEADLINE_METRIC = "cavity_1024_steps_per_sec"


def _emit(value, vs_baseline, metric=HEADLINE_METRIC, **extra):
    print(json.dumps({
        "metric": metric,
        "value": value,
        "unit": "steps/s",
        "vs_baseline": vs_baseline,
        **extra,
    }), flush=True)


def _probe_devices(attempts: int = 3, timeout_s: int = 180) -> bool:
    """Check device availability in a *subprocess* with a hard timeout.

    jax.devices() through the remote-TPU tunnel can hang indefinitely when
    the tunnel is down (this killed the round-1 artifact, BENCH_r01 rc=1);
    an in-process try/except cannot bound that.  Bounded retry with backoff
    rides out transient tunnel flaps.
    """
    for i in range(attempts):
        try:
            # JAX_PLATFORMS as an env var is not reliably honored once the
            # remote-TPU plugin registers; config.update is (CLAUDE.md).
            r = subprocess.run(
                [sys.executable, "-c",
                 "import os, jax\n"
                 "p = os.environ.get('JAX_PLATFORMS')\n"
                 "if p: jax.config.update('jax_platforms', p)\n"
                 "print(jax.devices()[0].platform)"],
                capture_output=True, text=True, timeout=timeout_s,
            )
            if r.returncode == 0:
                print(f"# device probe ok: {r.stdout.strip()}",
                      file=sys.stderr)
                return True
            print(f"# device probe attempt {i+1} rc={r.returncode}: "
                  f"{r.stderr.strip()[-300:]}", file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"# device probe attempt {i+1} timed out ({timeout_s}s)",
                  file=sys.stderr)
        if i < attempts - 1:
            time.sleep(10 * (i + 1))
    return False


def _timed_scan(step, state, steps: int, sync):
    import jax
    from cfd_julia_tpu.stepping import loop

    run = jax.jit(lambda s: loop.run_steps(step, s, steps))
    state = run(state)          # compile + warm up
    sync(state)
    t0 = time.perf_counter()
    state = run(state)
    sync(state)
    dt = time.perf_counter() - t0
    return steps / dt, state


CAVITY_VARIANTS = (
    ("fst", "highest", "xla"), ("fst_half", "highest", "xla"),
    ("matmul", "highest", "xla"), ("matmul_bf16x3", "highest", "xla"),
    ("fst_mxu", "highest", "xla"), ("fst_half_mxu", "highest", "xla"),
    ("fst_half_mxu", "high", "xla"), ("fst", "highest", "pallas"),
    ("fst_half_mxu", "high", "pallas"),
)


def bench_cavity(nx: int = 1024, steps: int = 200, dtype=None,
                 variants=CAVITY_VARIANTS, budget_s: float = 1500.0):
    """Best cavity throughput across Poisson implementations (the rfft
    DST-I paths vs the MXU matmul paths — identical numerics, verified
    in tests); returns (steps_per_sec, winning_variant).

    budget_s: once a variant has been measured, stop racing when the
    elapsed time exceeds the budget — cold remote compiles run minutes
    each and the headline must be emitted before any driver timeout."""
    import jax.numpy as jnp
    from cfd_julia_tpu.models import cavity

    dtype = dtype or jnp.float32
    t_start = time.perf_counter()
    best, best_impl = 0.0, None
    for poisson, prec, rhs in variants:
        if best_impl and time.perf_counter() - t_start > budget_s:
            print(f"# cavity race budget exhausted "
                  f"({time.perf_counter() - t_start:.0f}s); emitting best "
                  f"so far", file=sys.stderr)
            break
        name = poisson if prec == "highest" else f"{poisson}:{prec}"
        if rhs != "xla":
            name += f"+{rhs}rhs"
        # per-variant isolation: a tunnel flap or compile failure in a
        # later variant must not discard an already-measured number
        try:
            cfg = cavity.CavityConfig(nx=nx, ny=nx, dt=2e-5,
                                      poisson=poisson, fft_precision=prec,
                                      rhs_impl=rhs)
            step = cavity.make_step_fn(cfg)
            w0 = jnp.zeros((nx + 1, nx + 1), dtype)
            state = (w0, jnp.zeros_like(w0), jnp.zeros((), dtype))
            sps, state = _timed_scan(step, state, steps,
                                     lambda s: float(s[0].sum()))
            assert bool(jnp.isfinite(state[0]).all()), \
                f"cavity bench ({poisson}) went non-finite"
        except Exception as e:
            print(f"# cavity {nx}^2 poisson={name} failed: {e!r:.200}",
                  file=sys.stderr)
            continue
        print(f"# cavity {nx}^2 poisson={name}: {sps:.1f} steps/s",
              file=sys.stderr)
        if sps > best:
            best, best_impl = sps, name
    if best_impl is None:
        raise RuntimeError("all cavity Poisson variants failed")
    return best, best_impl


PS_VARIANTS = (
    ("xla", "highest", "pack"), ("xla", "highest", "rowsfirst"),
    ("matmul", "high", "pack"), ("matmul", "high", "rowsfirst"),
    ("matmul", "highest", "pack"),
)


def bench_pseudospectral(nx: int = 2048, steps: int = 20, dtype=None,
                         variants=PS_VARIANTS, budget_s: float = 1200.0):
    """Best ps23 throughput across FFT implementations; returns
    (steps_per_sec, winning_variant).  budget_s as in bench_cavity."""
    import jax
    import jax.numpy as jnp
    from cfd_julia_tpu.models import vortex

    dtype = dtype or jnp.float32
    t_start = time.perf_counter()
    w0 = None
    best, best_impl = 0.0, None
    for fft_impl, prec, pair in variants:
        if best_impl and time.perf_counter() - t_start > budget_s:
            print("# ps23 race budget exhausted; emitting best so far",
                  file=sys.stderr)
            break
        name = fft_impl if prec == "highest" else f"{fft_impl}:{prec}"
        if pair != "pack":
            name += f"+{pair}"
        try:
            cfg = vortex.VortexConfig(nx=nx, ny=nx, solver="ps23", dt=1e-3,
                                      fft_impl=fft_impl, fft_precision=prec,
                                      pair_impl=pair)
            # packed (real) state: complex64 jit params/outputs are
            # rejected by the remote-TPU backend (see ops.spectral.pack_c)
            step = vortex.make_spectral_step_half_packed(cfg, dtype)
            if w0 is None:
                w0 = vortex.initial_vorticity(cfg, dtype)
            hf = jax.jit(vortex.half_init_packed)(w0)
            sps, hf = _timed_scan(step, hf, steps,
                                  lambda s: float(jnp.abs(s).sum()))
            assert bool(jnp.isfinite(hf).all()), \
                f"ps23 bench ({name}) went non-finite"
        except Exception as e:
            print(f"# ps23 {nx}^2 fft={name} failed: {e!r:.200}",
                  file=sys.stderr)
            continue
        print(f"# ps23 {nx}^2 fft={name}: {sps:.1f} steps/s",
              file=sys.stderr)
        if sps > best:
            best, best_impl = sps, name
    if best_impl is None:
        raise RuntimeError("all ps23 FFT variants failed")
    return best, best_impl


def bench_multigrid(nx: int = 4096, tol: float = 1e-5, dtype=None):
    """North-star secondary: 4096^2 multigrid Poisson wall-clock, solved
    to rms/rms0 <= 1e-5 (just above the fp32 residual floor ~2.7e-6).
    Races Pallas-fused level edges and the full-multigrid start against
    the pure-XLA zero-start V-cycle, per-variant isolated (an
    uncompilable kernel or an HTTP-413 oversized remote compile must not
    lose the run)."""
    import jax.numpy as jnp
    from cfd_julia_tpu.models import poisson2d
    from cfd_julia_tpu.poisson import multigrid

    dtype = dtype or jnp.float32
    best = None
    for fused, fmg in (("auto", True), ("auto", False), ("off", False)):
        try:
            mgc = multigrid.MGConfig(tol=tol, max_cycles=20, fused=fused,
                                     fmg=fmg)
            cfg = poisson2d.PoissonConfig(nx=nx, ny=nx, solver="multigrid",
                                          problem="poly", mg=mgc)
            _, _, _, _, ue, f = poisson2d.build_problem(cfg, dtype)
            u0 = poisson2d._dirichlet_init(ue)
            res = multigrid.solve(f, u0, cfg.dx, cfg.dy, cfg=mgc)  # compile
            float(res.rms)
            t0 = time.perf_counter()
            res = multigrid.solve(f * (1.0 + 1e-6), u0, cfg.dx, cfg.dy,
                                  cfg=mgc)
            cycles = int(res.iterations)
            ok = float(res.rms / res.rms0) <= tol
            dt = time.perf_counter() - t0
            assert ok, f"did not reach tol ({float(res.rms/res.rms0):.2e})"
        except Exception as e:
            print(f"# multigrid {nx}^2 fused={fused} fmg={fmg} failed: "
                  f"{e!r:.200}", file=sys.stderr)
            continue
        print(f"# multigrid {nx}^2 fused={fused} fmg={fmg}: {dt:.3f} s "
              f"to rms/rms0<={tol:g} ({cycles} V-cycles)", file=sys.stderr)
        if best is None or dt < best:
            best = dt
    if best is None:
        raise RuntimeError("all multigrid variants failed")
    return best


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--quick", action="store_true",
                    help="fewer steps + skip slow secondaries (for flaky-"
                         "tunnel windows: one compile, one number)")
    ap.add_argument("--probe-timeout", type=int, default=180)
    ap.add_argument("--probe-attempts", type=int, default=3)
    ap.add_argument("--nx", type=int, default=1024,
                    help="cavity grid override (debug/CPU smoke only; the "
                         "headline metric is defined at 1024)")
    args = ap.parse_args(argv)

    if not _probe_devices(args.probe_attempts, args.probe_timeout):
        _emit(0.0, 0.0, error="device backend unavailable "
              f"(probe timed out/failed {args.probe_attempts}x; "
              "remote TPU tunnel likely down)")
        return 0

    # Persistent bench compile cache (separate from the test cache) +
    # reliable JAX_PLATFORMS handling — see cfd_julia_tpu.jaxconfig.
    import jax
    from cfd_julia_tpu.jaxconfig import configure_jax

    configure_jax(cache_dir="~/.cache/jax_bench_cache", min_compile_secs=1.0)

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    steps = 50 if args.quick else 200
    # --quick keeps its one-compile-one-number contract: only the proven
    # fst variant; the full run races every formulation
    variants = (("fst", "highest", "xla"),) if args.quick else CAVITY_VARIANTS
    try:
        cavity_sps, cavity_impl = bench_cavity(nx=args.nx, steps=steps,
                                               variants=variants)
    except Exception as e:
        _emit(0.0, 0.0, error=f"cavity bench failed: {e!r:.300}")
        return 0
    print(f"# cavity {args.nx}^2 fp32 best={cavity_impl}: "
          f"{cavity_sps:.1f} steps/s", file=sys.stderr)

    # headline first (secondaries compile for minutes and must never block
    # it); a non-headline grid reports under its OWN metric name so no
    # consumer can record it as the 1024^2 number, and --quick is marked
    metric = HEADLINE_METRIC if args.nx == 1024 \
        else f"cavity_{args.nx}_steps_per_sec"
    extra = {"baseline_steps_per_sec": "6.5 (measured-anchored, range 5-8; "
             "see BASELINE.md)", "poisson_impl": cavity_impl}
    if args.quick:
        extra["quick"] = True
    _emit(round(cavity_sps, 2),
          round(cavity_sps / JULIA_BASELINE_STEPS_PER_SEC, 1),
          metric=metric, **extra)

    if args.quick:
        return 0
    try:
        ps_sps, ps_impl = bench_pseudospectral()
        print(f"# pseudospectral 2048^2 fp32 best={ps_impl}: "
              f"{ps_sps:.1f} steps/s", file=sys.stderr)
    except Exception as e:  # secondary metric must not break the headline
        print(f"# pseudospectral bench failed: {e}", file=sys.stderr)
    try:
        mg_s = bench_multigrid()
        print(f"# multigrid 4096^2 fp32, 10 V-cycles: {mg_s:.3f} s",
              file=sys.stderr)
    except Exception as e:
        print(f"# multigrid bench failed: {e}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
