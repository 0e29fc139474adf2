"""Stage-7: find the poison op.

Stage 6 proved the UPSTREAM prefix (wt after two fst stage-closes)
compiles to DIFFERENT VALUES (rel 0.14!) depending on what consumes it
downstream — the half-DST's presence corrupts the prefix compilation.
This stage keeps the prefix fixed and swaps the downstream consumer:

  none       : prefix only (baseline wt)
  half_solve : the full fst_half Poisson solve
  dst_half   : one _dst1_half_last along the last axis
  cumsum     : jnp.cumsum along the last axis
  prepass    : the sin/reverse/concat pre-pass + rfft (no cumsum)
  interleave : the odd/even stack+reshape (no fft, no cumsum)
  rev        : just v[..., ::-1]

Each variant outputs (wt, tail_scalar); rel(wt vs baseline) != 0 marks
the poison op.  Usage: python benchmarks/fsthalf_repro7.py [--nx 128]
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
            if tag == "none":
                t = g.sum()
            elif tag == "half_solve":
                t = direct.solve_fst(-wt, dx, dy, impl="half").sum()
            elif tag == "dst_half":
                t = spectral._dst1_half_last(g).sum()
            elif tag == "cumsum":
                t = jnp.cumsum(g, axis=-1).sum()
            elif tag == "prepass":
                m = g.shape[-1]
                n = m + 1
                jj = jnp.arange(1, n, dtype=g.dtype)
                sn = jnp.sin(jnp.pi * jj / n)
                b = g[..., ::-1]
                y1 = sn * (g + b) + 0.5 * (g - b)
                y = jnp.concatenate(
                    [jnp.zeros(g.shape[:-1] + (1,), g.dtype), y1], axis=-1)
                Y = jnp.fft.rfft(y, axis=-1)
                t = jnp.real(Y).sum() + jnp.imag(Y).sum()
            elif tag == "interleave":
                h = g.shape[-1] // 2
                inter = jnp.stack([g[..., :h], g[..., h:2 * h]],
                                  axis=-1).reshape(g.shape[:-1] + (2 * h,))
                t = inter.sum()
            elif tag == "rev":
                t = (g[..., ::-1] * jj_weight(g)).sum()
            return wt, t
        return fn

    def jj_weight(g):
        import jax.numpy as jnp
        return jnp.arange(g.shape[-1], dtype=g.dtype)

    w0 = jnp.zeros((nx + 1, nx + 1), jnp.float32)
    s0 = jnp.zeros_like(w0)

    base, _ = jax.jit(consumer("none"))(w0, s0)
    base = np.asarray(base)
    scale = max(np.abs(base).max(), 1e-30)
    for tag in ("half_solve", "dst_half", "cumsum", "prepass",
                "interleave", "rev"):
        wt, _ = jax.jit(consumer(tag))(w0, s0)
        rel = np.abs(np.asarray(wt) - base).max() / scale
        print(f'{{"case": "{tag}", "wt_rel": {rel:.3e}}}', flush=True)


if __name__ == "__main__":
    main()
