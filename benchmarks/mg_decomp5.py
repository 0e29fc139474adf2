"""Positional-pathology test for windowed MG timings.

Across mg_decomp2/3/4 the pathological windowed measurement was always
the FIRST timed item in the process (702 ms -> 94.9 s -> 2.87 s per
solve), and every later item — including structurally identical ones —
ran at 21-25 ms/solve.  Structure (while_loop vs fori, nested jit vs
inline, rms cond vs trip cond, history vs none) does NOT predict it.

This probe times the SAME as-is solve window three times in a row
(fresh jit wrappers so each is its own executable instance, but the
same HLO -> compile-cache hit), with perturbed inputs each execution:
  R1 asis window        (expected pathological if positional)
  R2 asis window again  (expected fast)
  R3 asis window again  (expected fast)
And then re-times R1's wrapper object itself (R1b) — if R1b is fast,
the pathology is not even attached to the executable, only to the
first post-compile execution window in the process.

Usage: python benchmarks/mg_decomp5.py [--nx 4096] [--window 4]
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

    print(f"# device={jax.devices()[0]} nx={args.nx} W={args.window}",
          flush=True)
    nx, W = args.nx, args.window

    def fresh_scale(dtype):
        return jnp.asarray(1.0 + 1e-7 * next(_COUNTER), dtype)

    def timed(label, fn, f, u0, per=1):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(f, u0, fresh_scale(f.dtype)))
        warm = (time.perf_counter() - t0) * 1e3
        t0 = time.perf_counter()
        out = fn(f, u0, fresh_scale(f.dtype))
        float(jnp.asarray(out if not isinstance(out, tuple) else out[0]
                          ).ravel()[0])
        dt = (time.perf_counter() - t0) * 1e3
        print(f"{label}: warm {warm:.1f} ms; timed {dt:.2f} ms total, "
              f"{dt / per:.3f} ms/unit", flush=True)
        return dt / per

    mgc = multigrid.MGConfig(tol=1e-5, max_cycles=20,
                             transfers="matmul", fused="on")
    cfg = poisson2d.PoissonConfig(nx=nx, ny=nx, solver="multigrid",
                                  problem="poly", mg=mgc)
    _, _, _, _, ue, f = poisson2d.build_problem(cfg, jnp.float32)
    u0 = poisson2d._dirichlet_init(ue)
    dx = dy = cfg.dx

    def make_window():
        @jax.jit
        def w(ff, uu, scale):
            def body(i, acc):
                chk, _ = acc
                fi = ff * (scale * (1.0 + 1e-7 * (i.astype(ff.dtype) + 1.0))) \
                    + 0.0 * chk
                r = multigrid.solve(fi, uu, dx, dy, cfg=mgc)
                return (r.u[1, 1], r.rms / r.rms0)
            return lax.fori_loop(0, W, body,
                                 (jnp.zeros((), ff.dtype),
                                  jnp.zeros((), ff.dtype)))
        return w

    r1 = make_window()
    timed("R1_asis_first", r1, f, u0, per=W)
    timed("R2_asis_again", make_window(), f, u0, per=W)
    timed("R3_asis_again", make_window(), f, u0, per=W)
    timed("R1b_same_wrapper_retimed", r1, f, u0, per=W)


if __name__ == "__main__":
    main()
