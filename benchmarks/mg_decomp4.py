"""Final bisection step: is the nested-jit call the windowed-MG killer?

mg_decomp3.py (on chip, 2026-08-19 12:06, 4096^2 W=4):
  bench_asis (fori over @jit multigrid.solve)      94,858 ms/solve (!!)
  A while(it<4)+hist inline                        24.3 ms/solve
  B while(tol cond) no hist inline                 23.7 ms/solve
  C while(tol cond)+hist, 4 cycles/check inline    20.8 ms/solve
Every ingredient of solve()'s loop is individually fast when traced
INLINE; the only structural difference left is that multigrid.solve is
itself a @jax.jit function, so the window traces it as a nested pjit
call.  This probe times:
  D1 exact inline replica of solve's loop (tol cond + hist)
  D2 the SAME replica wrapped in @jax.jit (nested pjit)
  D3 the replica wrapped in @jax.jit but called with inline lowering
     (jax.jit(..., inline=True)) if supported

Usage: python benchmarks/mg_decomp4.py [--nx 4096] [--window 4]
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
    ap.add_argument("--skip-d2", action="store_true",
                    help="skip the (expected-pathological) nested-jit row")
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
        return jnp.asarray(1.0 + 1e-7 * next(_COUNTER), dtype)

    def timed(label, fn, f, u0, per=1, budget=None):
        jax.block_until_ready(fn(f, u0, fresh_scale(f.dtype)))
        t0 = time.perf_counter()
        out = fn(f, u0, fresh_scale(f.dtype))
        float(jnp.asarray(out if not isinstance(out, tuple) else out[0]
                          ).ravel()[0])
        dt = (time.perf_counter() - t0) * 1e3
        print(f"{label}: {dt:.2f} ms total, {dt / per:.3f} ms/unit",
              flush=True)
        return dt / per

    mgc = multigrid.MGConfig(tol=1e-5, max_cycles=20,
                             transfers="matmul", fused="on")
    cfg = poisson2d.PoissonConfig(nx=nx, ny=nx, solver="multigrid",
                                  problem="poly", mg=mgc)
    _, _, _, _, ue, f = poisson2d.build_problem(cfg, jnp.float32)
    u0 = poisson2d._dirichlet_init(ue)
    dx = dy = cfg.dx

    levels = multigrid._build_levels(nx, nx, dx, dy, mgc.n_levels)
    masks = [color_masks(l[0], l[1], f.dtype) for l in levels]
    imasks = [interior_mask(l[0], l[1], f.dtype) for l in levels]

    def solve_replica(fi, uu):
        """Exact replica of multigrid.solve's fp32 loop (fused-rms path),
        traced inline."""
        rms0 = multigrid._rms_from_full(
            multigrid.residual_full(fi, uu, dx, dy, imasks[0]), nx, nx)
        hist0 = jnp.full((mgc.max_cycles + 1, 3), jnp.nan, fi.dtype)

        def cond(c):
            u, it, rms, hist, nrec = c
            return (it < mgc.max_cycles) & (rms / rms0 > mgc.tol)

        def body(c):
            u, it, rms, hist, nrec = c
            u, ssq = multigrid.v_cycle(u, fi, levels, masks, imasks, mgc,
                                       want_rms=True)
            rms = jnp.sqrt(ssq / ((nx - 1) * (nx - 1))).astype(fi.dtype)
            it = it + 1
            rec = jnp.stack([it.astype(fi.dtype), rms, rms / rms0])
            hist = lax.dynamic_update_slice(hist, rec[None], (nrec, 0))
            return (u, it, rms, hist, nrec + 1)

        u, it, rms, hist, nrec = lax.while_loop(
            cond, body, (uu, jnp.array(0), rms0, hist0, jnp.array(0)))
        return u, rms / rms0

    def window_over(solve_one):
        @jax.jit
        def w(ff, uu, scale):
            def body(i, acc):
                chk, _ = acc
                fi = ff * (scale * (1.0 + 1e-7 * (i.astype(ff.dtype) + 1.0))) \
                    + 0.0 * chk
                u, rel = solve_one(fi, uu)
                return (u[1, 1], rel)
            return lax.fori_loop(0, W, body,
                                 (jnp.zeros((), ff.dtype),
                                  jnp.zeros((), ff.dtype)))
        return w

    timed("D1_inline_replica", window_over(solve_replica), f, u0, per=W)

    d3 = jax.jit(solve_replica, inline=True)
    timed("D3_nested_jit_inline_true", window_over(d3), f, u0, per=W)

    if not args.skip_d2:
        d2 = jax.jit(solve_replica)
        timed("D2_nested_jit", window_over(d2), f, u0, per=W)


if __name__ == "__main__":
    main()
