"""Why does the bench WINDOW shape inflate the mg solve ~3x?

mg_overhead_20260819T1013.log (fused=off, matmul): forced-cycle solves
in their own dispatch cost intercept ~0 + 13.75 ms/cycle on device
(41.5/58.9/82.8 ms at 1/2/4 cycles incl. the ~34 ms tunnel RTT), and a
raw scan of 8 V-cycles runs 11.4 ms/cycle — yet bench.py's window of 4
back-to-back solves inside one lax.fori_loop measured 172 ms/solve
(matmul,off,plain, bench_full_20260818T120555) and 120.6 ms for the
fused winner.  ~60-110 ms per solve appears only in the windowed
composition.  Suspects, each isolated below on the real backend:

  A. the while_loop+tol solve vs a fixed 4-cycle scan (cond/hist cost)
  B. the per-solve RHS rebuild `ff * scale + 0*chk` (new 67 MB buffer)
  C. mask/level-constant rematerialization when the solve body sits
     inside an outer fori_loop (LICM not hoisting 3x67 MB of iota masks)
  D. fused=on vs off in the window (does the winner see the same gap?)

Usage: python benchmarks/mg_window_probe.py [--nx 4096] [--window 4]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=4096)
    ap.add_argument("--window", type=int, default=4)
    args = ap.parse_args()

    from cfd_julia_tpu.jaxconfig import configure_jax

    configure_jax(cache_dir="~/.cache/jax_bench_cache", min_compile_secs=1.0)

    import jax
    import jax.numpy as jnp
    from jax import lax

    from cfd_julia_tpu.models import poisson2d
    from cfd_julia_tpu.poisson import multigrid
    from cfd_julia_tpu.poisson.iterative import color_masks, interior_mask

    print(f"# device={jax.devices()[0]}", flush=True)
    nx, W = args.nx, args.window

    def build(fused):
        mgc = multigrid.MGConfig(tol=1e-5, max_cycles=20,
                                 transfers="matmul", fused=fused)
        cfg = poisson2d.PoissonConfig(nx=nx, ny=nx, solver="multigrid",
                                      problem="poly", mg=mgc)
        _, _, _, _, ue, f = poisson2d.build_problem(cfg, jnp.float32)
        return mgc, cfg, f, poisson2d._dirichlet_init(ue)

    def timed(label, fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)
        # fence through an actual host scalar (tpu-env-quirks)
        float(jnp.asarray(out[0] if isinstance(out, tuple) else out).ravel()[0])
        t0 = time.perf_counter()
        out = fn(*a)
        float(jnp.asarray(out[0] if isinstance(out, tuple) else out).ravel()[0])
        dt = (time.perf_counter() - t0) * 1e3
        print(f"{label}: {dt:.2f} ms total, {dt / W:.2f} ms/solve", flush=True)

    for fused in ("off", "on"):
        mgc, cfg, f, u0 = build(fused)
        dx = dy = cfg.dx

        # (exact bench shape) fori_loop window, tol solve, scaled RHS
        @jax.jit
        def w_bench(ff, uu, scale, mgc=mgc):
            def body(i, acc):
                chk, _ = acc
                fi = ff * (scale * (1.0 + 1e-7 * (i.astype(ff.dtype) + 1.0))) \
                    + 0.0 * chk
                r = multigrid.solve(fi, uu, dx, dy, cfg=mgc)
                return (r.u[1, 1], r.rms / r.rms0)
            return lax.fori_loop(0, W, body,
                                 (jnp.zeros((), ff.dtype),
                                  jnp.zeros((), ff.dtype)))

        one = jnp.ones((), f.dtype)
        timed(f"bench_shape[{fused}]", w_bench, f, u0, one)

        # (B) same window, RHS passed through untouched (chk serializes)
        @jax.jit
        def w_noscale(ff, uu, mgc=mgc):
            def body(i, acc):
                chk, _ = acc
                r = multigrid.solve(ff + 0.0 * chk, uu, dx, dy, cfg=mgc)
                return (r.u[1, 1], r.rms / r.rms0)
            return lax.fori_loop(0, W, body,
                                 (jnp.zeros((), ff.dtype),
                                  jnp.zeros((), ff.dtype)))

        timed(f"noscale[{fused}]", w_noscale, f, u0)

        # (A) window of FIXED 4-cycle scans (no while_loop/hist/tol),
        # masks built once per solve like solve() does
        levels = multigrid._build_levels(nx, nx, dx, dy, mgc.n_levels)

        @jax.jit
        def w_scan(ff, uu, scale, mgc=mgc, levels=levels):
            masks = [color_masks(l[0], l[1], ff.dtype) for l in levels]
            imasks = [interior_mask(l[0], l[1], ff.dtype) for l in levels]

            def body(i, acc):
                chk = acc
                fi = ff * (scale * (1.0 + 1e-7 * (i.astype(ff.dtype) + 1.0))) \
                    + 0.0 * chk
                u = uu
                u = lax.fori_loop(0, 4, lambda _, uc: multigrid.v_cycle(
                    uc, fi, levels, masks, imasks, mgc), u)
                return u[1, 1]
            return lax.fori_loop(0, W, body, jnp.zeros((), ff.dtype))

        timed(f"scan4cyc[{fused}]", w_scan, f, u0, one)


if __name__ == "__main__":
    main()
