"""Stage-8: poison threshold inside the half solve.

Stage 7: the COMPLETE fst_half solve downstream corrupts the prefix wt
(rel 0.14), but no single component (one half-DST, cumsum, prepass,
interleave, reverse) does.  Grow the downstream from one transform to
the full solve to find the threshold:

  d1_rows      : dst1(g, -1, half)
  d1_cols      : dst1(g, -2, half)          (moveaxis transposes)
  d2_fwd       : dst1(dst1(g, -1), -2)      (2D forward)
  d2_div       : 2D forward / den
  d3           : + inverse cols
  d4 = solve   : + inverse rows (the full solve, known poison)
  d2_fwd_rfft  : control — 2D forward with impl='rfft' (full-length)

Usage: python benchmarks/fsthalf_repro8.py [--nx 128]
"""
import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cfd_julia_tpu.models import cavity
    from cfd_julia_tpu.ops import arakawa, spectral
    from cfd_julia_tpu.poisson import direct

    print(f"# devices: {jax.devices()}")
    nx = args.nx
    cfg = cavity.CavityConfig(nx=nx, ny=nx, poisson="fst", rhs_impl="xla")
    dx, dy, dt = cfg.dx, cfg.dy, cfg.dt

    def prefix(w, s):
        wcur, scur = w, s
        wt = w
        for i in range(3):
            if i == 0:
                r = arakawa.vorticity_rhs(wcur, scur, dx, dy,
                                          cfg.re)[1:-1, 1:-1]
                wi = wcur[1:-1, 1:-1] + dt * r
            elif i == 1:
                r = arakawa.vorticity_rhs(wt, scur, dx, dy,
                                          cfg.re)[1:-1, 1:-1]
                wi = (0.75 * wcur[1:-1, 1:-1]
                      + 0.25 * wt[1:-1, 1:-1] + 0.25 * dt * r)
            else:
                r = arakawa.vorticity_rhs(wt, scur, dx, dy,
                                          cfg.re)[1:-1, 1:-1]
                wi = (wcur[1:-1, 1:-1] + 2.0 * wt[1:-1, 1:-1]
                      + 2.0 * dt * r) / 3.0
            wt = cavity.assemble_with_wall_bc(wi, scur, dx, dy,
                                              cfg.bc_order)
            if i < 2:
                scur = direct.solve_fst(-wt, dx, dy)
        return wt

    def consumer(tag):
        def fn(w, s):
            wt = prefix(w, s)
            g = -wt[1:-1, 1:-1]
            mx, my = g.shape
            nxx, nyy = mx + 1, my + 1
            i = jnp.arange(1, nxx, dtype=g.dtype)
            j = jnp.arange(1, nyy, dtype=g.dtype)
            den = ((2.0 / dx**2) * (jnp.cos(jnp.pi * i / nxx) - 1.0)[:, None]
                   + (2.0 / dy**2)
                   * (jnp.cos(jnp.pi * j / nyy) - 1.0)[None, :])
            h = lambda a, ax: spectral.dst1(a, axis=ax, impl="half")
            if tag == "d1_rows":
                t = h(g, -1).sum()
            elif tag == "d1_cols":
                t = h(g, -2).sum()
            elif tag == "d2_fwd":
                t = h(h(g, -1), -2).sum()
            elif tag == "d2_div":
                t = (h(h(g, -1), -2) / den).sum()
            elif tag == "d3":
                t = h(h(h(g, -1), -2) / den, -2).sum()
            elif tag == "d4":
                t = h(h(h(h(g, -1), -2) / den, -2), -1).sum()
            elif tag == "d2_fwd_rfft":
                r = lambda a, ax: spectral.dst1(a, axis=ax)
                t = r(r(g, -1), -2).sum()
            return wt, t
        return fn

    w0 = jnp.zeros((nx + 1, nx + 1), jnp.float32)
    s0 = jnp.zeros_like(w0)

    base = None
    for tag in ("d1_rows", "d1_cols", "d2_fwd", "d2_div", "d3", "d4",
                "d2_fwd_rfft"):
        wt, _ = jax.jit(consumer(tag))(w0, s0)
        wt = np.asarray(wt)
        if base is None:
            # d1_rows was clean in stage 7 terms? establish baseline from
            # a no-consumer program instead
            pass
        if base is None:
            bwt, _ = jax.jit(lambda w, s: (prefix(w, s),
                                           jnp.zeros(())))(w0, s0)
            base = np.asarray(bwt)
            scale = max(np.abs(base).max(), 1e-30)
        rel = np.abs(wt - base).max() / scale
        print(f'{{"case": "{tag}", "wt_rel": {rel:.3e}}}', flush=True)


if __name__ == "__main__":
    main()
