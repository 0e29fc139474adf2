"""Bisect the windowed-while_loop MG pathology (cache-safe timing).

mg_decomp2.py established (on chip, 2026-08-19 11:39, 4096^2 W=4):
  bench[on]   fori(W) over solve() [tol while_loop]   702.9 ms/solve
  fixed4[on]  fori(W) over fori(4 cycles) same rms    22.5 ms/solve
and mg_overhead showed a SINGLE solve() dispatch is ~83 ms total
(~34 ms of that is tunnel RTT), i.e. the while_loop alone is cheap —
only while-inside-fori explodes.  This probe isolates WHICH ingredient:

  A whileN      while_loop, cond = (it < 4) ONLY (no rms in cond),
                body identical to solve's (rms + hist + record)
  B whiletol    while_loop, cond = rms-dependent like solve, but hist
                dynamic_update_slice REMOVED from the body
  C chunk4      while_loop, rms cond, body = 4 V-cycles per iteration
                (check_every=4) -> single while iteration at this size
  D nohist      solve-shaped while (rms cond) with history carried but
                recorded via lax.cond-free fixed indexing? (skip; B
                covers the hist hypothesis)
  E scanwin     the window as lax.scan instead of fori_loop over the
                as-is solve()

Every timed execution perturbs inputs with a fresh monotone scale
(remote execution cache, CLAUDE.md / tpu-env-quirks).

Usage: python benchmarks/mg_decomp3.py [--nx 4096] [--window 4]
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

    def timed(label, fn, f, u0, per=1):
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
    fused_rms = (len(levels) > 1 and multigrid._use_fused(
        mgc, nx, nx, 2 * mgc.v3 + 1))
    assert fused_rms, "probe expects the fused-rms path"

    def cycle_with_rms(u, fi):
        u, ssq = multigrid.v_cycle(u, fi, levels, masks, imasks, mgc,
                                   want_rms=True)
        rms = jnp.sqrt(ssq / ((nx - 1) * (nx - 1))).astype(fi.dtype)
        return u, rms

    def rms0_of(fi, uu):
        return multigrid._rms_from_full(
            multigrid.residual_full(fi, uu, dx, dy, imasks[0]), nx, nx)

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

    # --- baseline: the as-is solve (rms cond + hist) ---
    def solve_asis(fi, uu):
        r = multigrid.solve(fi, uu, dx, dy, cfg=mgc)
        return r.u, r.rms / r.rms0

    timed("bench_asis", window_over(solve_asis), f, u0, per=W)

    # --- A: while_loop, trip-count cond only (no rms in cond) ---
    def solve_whileN(fi, uu):
        rms0 = rms0_of(fi, uu)
        hist0 = jnp.full((mgc.max_cycles + 1, 3), jnp.nan, fi.dtype)

        def cond(c):
            u, it, rms, hist, nrec = c
            return it < 4

        def body(c):
            u, it, rms, hist, nrec = c
            u, rms = cycle_with_rms(u, fi)
            it = it + 1
            rec = jnp.stack([it.astype(fi.dtype), rms, rms / rms0])
            hist = lax.dynamic_update_slice(hist, rec[None], (nrec, 0))
            return (u, it, rms, hist, nrec + 1)

        u, it, rms, hist, nrec = lax.while_loop(
            cond, body, (uu, jnp.array(0), rms0, hist0, jnp.array(0)))
        return u, rms / rms0

    timed("A_whileN_cond_it_only", window_over(solve_whileN), f, u0, per=W)

    # --- B: while_loop, rms cond, NO history ---
    def solve_nohist(fi, uu):
        rms0 = rms0_of(fi, uu)

        def cond(c):
            u, it, rms = c
            return (it < mgc.max_cycles) & (rms / rms0 > mgc.tol)

        def body(c):
            u, it, rms = c
            u, rms = cycle_with_rms(u, fi)
            return (u, it + 1, rms)

        u, it, rms = lax.while_loop(
            cond, body, (uu, jnp.array(0), rms0))
        return u, rms / rms0

    timed("B_whiletol_nohist", window_over(solve_nohist), f, u0, per=W)

    # --- C: while_loop, rms cond + hist, 4 cycles per check ---
    def solve_chunk4(fi, uu):
        rms0 = rms0_of(fi, uu)
        hist0 = jnp.full((mgc.max_cycles + 1, 3), jnp.nan, fi.dtype)

        def cond(c):
            u, it, rms, hist, nrec = c
            return (it < mgc.max_cycles) & (rms / rms0 > mgc.tol)

        def body(c):
            u, it, rms, hist, nrec = c
            for _ in range(4):
                u, rms = cycle_with_rms(u, fi)
            it = it + 4
            rec = jnp.stack([it.astype(fi.dtype), rms, rms / rms0])
            hist = lax.dynamic_update_slice(hist, rec[None], (nrec, 0))
            return (u, it, rms, hist, nrec + 1)

        u, it, rms, hist, nrec = lax.while_loop(
            cond, body, (uu, jnp.array(0), rms0, hist0, jnp.array(0)))
        return u, rms / rms0

    timed("C_chunk4_per_check", window_over(solve_chunk4), f, u0, per=W)

    # --- E: window as lax.scan over the as-is solve ---
    @jax.jit
    def scan_win(ff, uu, scale):
        def body(carry, i):
            fi = ff * (scale * (1.0 + 1e-7 * (i.astype(ff.dtype) + 1.0))) \
                + 0.0 * carry
            r = multigrid.solve(fi, uu, dx, dy, cfg=mgc)
            return r.u[1, 1], r.rms / r.rms0
        chk, rels = lax.scan(body, jnp.zeros((), ff.dtype),
                             jnp.arange(W, dtype=jnp.int32))
        return chk, rels[-1]

    timed("E_scan_asis", scan_win, f, u0, per=W)


if __name__ == "__main__":
    main()
