"""Stage-6: input-vs-solve attribution for the chain2 divergence.

chain2 (two fst stage-closes then a final solve) diverges 4e-3 between
final-solve impls.  Both programs share a bit-identical PREFIX
DEFINITION; if their compiled prefixes produce different wt, the
miscompile is in how XLA recompiles the prefix in the presence of the
downstream half-DST; if wt matches and psi differs, the half solve
itself miscompiles for this upstream shape/layout.

Probes:
  A. chain2 variants output (wt_final, psi_final): rel(wt), rel(psi).
  B. replay: wt_final captured from the fst program is fed to an
     ISOLATED jit half solve (known good to 1e-7): compare with the
     in-chain half psi.

Usage: python benchmarks/fsthalf_repro6.py [--nx 128]
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
    from cfd_julia_tpu.ops import arakawa
    from cfd_julia_tpu.poisson import direct

    print(f"# devices: {jax.devices()}")
    nx = args.nx
    cfg = cavity.CavityConfig(nx=nx, ny=nx, poisson="fst", rhs_impl="xla")
    dx, dy, dt = cfg.dx, cfg.dy, cfg.dt

    def chain2(impl):
        def fn(w, s):
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
                use = impl if i == 2 else "rfft"
                scur = direct.solve_fst(-wt, dx, dy, impl=use)
            return wt, scur
        return fn

    w0 = jnp.zeros((nx + 1, nx + 1), jnp.float32)
    s0 = jnp.zeros_like(w0)

    wt_f, psi_f = jax.jit(chain2("rfft"))(w0, s0)
    wt_h, psi_h = jax.jit(chain2("half"))(w0, s0)
    wt_f, psi_f = np.asarray(wt_f), np.asarray(psi_f)
    wt_h, psi_h = np.asarray(wt_h), np.asarray(psi_h)
    wscale = max(np.abs(wt_f).max(), 1e-30)
    pscale = max(np.abs(psi_f).max(), 1e-30)
    print(f'{{"case": "A_wt", "rel": '
          f'{np.abs(wt_h - wt_f).max() / wscale:.3e}}}')
    print(f'{{"case": "A_psi", "rel": '
          f'{np.abs(psi_h - psi_f).max() / pscale:.3e}}}')

    # B: replay the fst program's wt through isolated solves
    iso_half = jax.jit(
        lambda g: direct.solve_fst(-g, dx, dy, impl="half"))
    iso_fst = jax.jit(lambda g: direct.solve_fst(-g, dx, dy))
    ph = np.asarray(iso_half(jnp.asarray(wt_f)))
    pf = np.asarray(iso_fst(jnp.asarray(wt_f)))
    print(f'{{"case": "B_replay_iso_halfvsfst", "rel": '
          f'{np.abs(ph - pf).max() / pscale:.3e}}}')
    print(f'{{"case": "B_inchain_vs_replay_half", "rel": '
          f'{np.abs(psi_h - ph).max() / pscale:.3e}}}')


if __name__ == "__main__":
    main()
