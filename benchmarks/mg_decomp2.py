"""Decompose the 4096^2 windowed MG solve with CACHE-SAFE timing.

mg_window_probe.py's 23.9 ms/solve result was an artifact: its timed
call repeated the warm-up call's exact inputs, and the remote-TPU
execution path can serve identical-input jit calls from a cache
(CLAUDE.md / tpu-env-quirks).  bench.worker_mg itself perturbs the
timed input (scale 1+1e-6) and reads 141.4 ms/solve on a quiet chip
(2026-08-19 11:18) — that is the honest number to decompose.

Every timed call here uses a FRESH scale scalar (monotone counter), so
no two executions of the same executable see identical inputs.

Measurements (window W solves per dispatch, exact bench composition
unless stated):
  bench[W]          while_loop-tol solve, rms0, history  (the real thing)
  fixed[N]          same solve body but fori_loop of exactly N V-cycles,
                    rms computed per cycle like fused_rms does
  cycles-only[N]    bare fori_loop of N v_cycle calls, masks hoisted,
                    no rms/history/rms0
  -> marginal cycle cost = (fixed[8]-fixed[4])/4  (fixed costs cancel)
  -> per-solve fixed cost = fixed[4] - 4*marginal

Usage: python benchmarks/mg_decomp2.py [--nx 4096] [--window 4]
"""
from __future__ import annotations

import argparse
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

_COUNTER = itertools.count(1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=4096)
    ap.add_argument("--window", type=int, default=4)
    ap.add_argument("--fused", default="on,off",
                    help="comma list of fused modes to probe")
    args = ap.parse_args()

    from cfd_julia_tpu.jaxconfig import configure_jax

    configure_jax(cache_dir="~/.cache/jax_bench_cache", min_compile_secs=1.0)

    import jax
    import jax.numpy as jnp
    from jax import lax

    from cfd_julia_tpu.models import poisson2d
    from cfd_julia_tpu.poisson import multigrid
    from cfd_julia_tpu.poisson.iterative import color_masks, interior_mask

    print(f"# device={jax.devices()[0]} nx={args.nx} W={args.window}",
          flush=True)
    nx, W = args.nx, args.window

    def fresh_scale(dtype):
        # monotone perturbation: no two timed executions share inputs
        return jnp.asarray(1.0 + 1e-7 * next(_COUNTER), dtype)

    def timed(label, fn, f, u0, per=1):
        import jax as _jax
        _jax.block_until_ready(fn(f, u0, fresh_scale(f.dtype)))  # compile+warm
        t0 = time.perf_counter()
        out = fn(f, u0, fresh_scale(f.dtype))
        float(jnp.asarray(out if not isinstance(out, tuple) else out[0]
                          ).ravel()[0])
        dt = (time.perf_counter() - t0) * 1e3
        print(f"{label}: {dt:.2f} ms total, {dt / per:.3f} ms/unit",
              flush=True)
        return dt / per

    for fused in args.fused.split(","):
        mgc = multigrid.MGConfig(tol=1e-5, max_cycles=20,
                                 transfers="matmul", fused=fused)
        cfg = poisson2d.PoissonConfig(nx=nx, ny=nx, solver="multigrid",
                                      problem="poly", mg=mgc)
        _, _, _, _, ue, f = poisson2d.build_problem(cfg, jnp.float32)
        u0 = poisson2d._dirichlet_init(ue)
        dx = dy = cfg.dx

        # --- exact bench shape ---
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

        timed(f"bench[{fused}]", w_bench, f, u0, per=W)

        # --- fixed-cycle solve windows (N = 4 and 8) ---
        levels = multigrid._build_levels(nx, nx, dx, dy, mgc.n_levels)
        masks = [color_masks(l[0], l[1], f.dtype) for l in levels]
        imasks = [interior_mask(l[0], l[1], f.dtype) for l in levels]
        fused_rms = (len(levels) > 1 and multigrid._use_fused(
            mgc, nx, nx, 2 * mgc.v3 + 1))

        def make_fixed(ncyc):
            @jax.jit
            def w_fixed(ff, uu, scale, mgc=mgc, ncyc=ncyc):
                def body(i, acc):
                    chk, _ = acc
                    fi = ff * (scale
                               * (1.0 + 1e-7 * (i.astype(ff.dtype) + 1.0))) \
                        + 0.0 * chk
                    mask0 = imasks[0]
                    rms0 = multigrid._rms_from_full(
                        multigrid.residual_full(fi, uu, dx, dy, mask0),
                        nx, nx)

                    def cyc(_, c):
                        u, rms = c
                        if fused_rms:
                            u, ssq = multigrid.v_cycle(
                                u, fi, levels, masks, imasks, mgc,
                                want_rms=True)
                            rms = jnp.sqrt(
                                ssq / ((nx - 1) * (nx - 1))).astype(ff.dtype)
                        else:
                            u = multigrid.v_cycle(u, fi, levels, masks,
                                                  imasks, mgc)
                            rms = multigrid._rms_from_full(
                                multigrid.residual_full(fi, u, dx, dy,
                                                        mask0), nx, nx)
                        return u, rms
                    u, rms = lax.fori_loop(0, ncyc, cyc,
                                           (uu, jnp.zeros((), ff.dtype)))
                    return (u[1, 1], rms / rms0)
                return lax.fori_loop(0, W, body,
                                     (jnp.zeros((), ff.dtype),
                                      jnp.zeros((), ff.dtype)))
            return w_fixed

        t4 = timed(f"fixed4[{fused}]", make_fixed(4), f, u0, per=W)
        t8 = timed(f"fixed8[{fused}]", make_fixed(8), f, u0, per=W)
        marg = (t8 - t4) / 4.0
        print(f"-> marginal V-cycle [{fused}]: {marg:.2f} ms; "
              f"per-solve fixed cost: {t4 - 4 * marg:.2f} ms", flush=True)

        # --- bare cycles, no solve bookkeeping at all ---
        def make_bare(ncyc):
            @jax.jit
            def w_bare(ff, uu, scale, mgc=mgc, ncyc=ncyc):
                def body(i, chk):
                    fi = ff * (scale
                               * (1.0 + 1e-7 * (i.astype(ff.dtype) + 1.0))) \
                        + 0.0 * chk
                    u = lax.fori_loop(
                        0, ncyc,
                        lambda _, uc: multigrid.v_cycle(
                            uc, fi, levels, masks, imasks, mgc), uu)
                    return u[1, 1]
                return lax.fori_loop(0, W, body, jnp.zeros((), ff.dtype))
            return w_bare

        b4 = timed(f"bare4[{fused}]", make_bare(4), f, u0, per=W)
        b8 = timed(f"bare8[{fused}]", make_bare(8), f, u0, per=W)
        print(f"-> bare marginal V-cycle [{fused}]: {(b8 - b4) / 4.0:.2f} ms; "
              f"bare fixed: {b4 - (b8 - b4):.2f} ms", flush=True)


if __name__ == "__main__":
    main()
