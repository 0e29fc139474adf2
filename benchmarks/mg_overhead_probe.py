"""Decompose the mg 4096^2 solve wall-clock: fixed overhead vs per-cycle.

Round-4 on-chip finding (bench_full_20260818T102642.log): the full solve
measures ~0.83 s at 4096^2 whether it runs 4 cycles (plain), 2 (fmg), or
5 (cheb) — wall-clock nearly independent of cycle count — while the
round-3 microbench recorded a single V-cycle at 18.2 ms.  This probe
times, on the real backend, each suspect in isolation:

  1. dispatch+sync round-trip (tiny op + scalar pull)
  2. residual_full + rms (the per-cycle convergence check)
  3. one jitted V-cycle, amortized over an on-device scan of 8
  4. one jitted V-cycle as a single dispatch
  5. solve() at max_cycles = 1 / 2 / 4 with tol=0 (forced cycle counts)

If (5) is flat in max_cycles while (3) is small, the overhead is in
solve()'s prologue (mask/level constant materialization, donation
copies, while_loop carry setup); if (4) >> (3), it's per-dispatch cost.

Usage: python benchmarks/mg_overhead_probe.py [--nx 4096]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=4096)
    args = ap.parse_args()

    from cfd_julia_tpu.jaxconfig import configure_jax

    configure_jax(cache_dir="~/.cache/jax_bench_cache", min_compile_secs=1.0)

    import jax
    import jax.numpy as jnp
    from jax import lax

    from cfd_julia_tpu.models import poisson2d
    from cfd_julia_tpu.poisson import multigrid
    from cfd_julia_tpu.poisson.iterative import (
        _rms_from_full, color_masks, interior_mask, residual_full)

    print(f"# default_backend={jax.default_backend()} "
          f"device={jax.devices()[0]}", flush=True)

    nx = args.nx
    mgc = multigrid.MGConfig(tol=1e-5, max_cycles=20, transfers="matmul",
                             fused="off")
    cfg = poisson2d.PoissonConfig(nx=nx, ny=nx, solver="multigrid",
                                  problem="poly", mg=mgc)
    _, _, _, _, ue, f = poisson2d.build_problem(cfg, jnp.float32)
    u0 = poisson2d._dirichlet_init(ue)
    dx = dy = cfg.dx

    def timed(label, fn, *a, warm=1, iters=3):
        out = None
        for _ in range(warm):
            out = fn(*a)
            jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{label}: {dt * 1e3:.2f} ms", flush=True)
        return out

    # 1. dispatch+sync RTT
    tiny = jnp.zeros((8, 128), jnp.float32)
    add = jax.jit(lambda x: x + 1.0)
    timed("rtt_tiny_dispatch", lambda x: float(add(x).sum()), tiny, iters=5)

    # 2. per-cycle convergence check
    mask0 = interior_mask(nx, nx, f.dtype)
    check = jax.jit(lambda ff, uu: _rms_from_full(
        residual_full(ff, uu, dx, dy, mask0), nx, nx))
    timed("residual_rms", check, f, u0)

    # 3/4. one V-cycle: scanned (amortized) vs single-dispatch
    levels = multigrid._build_levels(nx, nx, dx, dy, mgc.n_levels)
    masks = [color_masks(l[0], l[1], f.dtype) for l in levels]
    imasks = [interior_mask(l[0], l[1], f.dtype) for l in levels]

    vc1 = jax.jit(lambda uu, ff: multigrid.v_cycle(
        uu, ff, levels, masks, imasks, mgc))
    timed("vcycle_single_dispatch", vc1, u0, f)

    vc8 = jax.jit(lambda uu, ff: lax.scan(
        lambda u, _: (multigrid.v_cycle(u, ff, levels, masks, imasks, mgc),
                      None), uu, None, length=8)[0])
    t_scan = timed("vcycle_scan8_total", vc8, u0, f)
    del t_scan

    # 5. forced cycle counts through the real solve
    for mc in (1, 2, 4):
        c = multigrid.MGConfig(tol=0.0, max_cycles=mc, transfers="matmul",
                               fused="off")
        timed(f"solve_maxcycles_{mc}",
              lambda ff: multigrid.solve(ff, u0, dx, dy, cfg=c).rms, f,
              warm=1, iters=3)

    # perturbed-input single solve (the bench's exact timed shape)
    res = multigrid.solve(f, u0, dx, dy, cfg=mgc)
    float(res.rms)
    t0 = time.perf_counter()
    f1 = f * (1.0 + 1e-6)
    res = multigrid.solve(f1, u0, dx, dy, cfg=mgc)
    rel = float(res.rms / res.rms0)
    print(f"bench_shape_solve: {(time.perf_counter() - t0) * 1e3:.2f} ms "
          f"({int(res.iterations)} cycles, rel {rel:.2e})", flush=True)
    _ = np.asarray(res.rms)


if __name__ == "__main__":
    main()
