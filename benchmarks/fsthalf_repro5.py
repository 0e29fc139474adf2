"""Stage-5 bisection: minimal failing program by prefix length.

Stage 4 ruled out the output boundary (a single [RHS -> assembly ->
half-solve] program's OUTPUT agrees to 1.4e-5).  Stage 3 showed the
full step with the half solve at STAGE 3 ONLY diverges 4e-3 in one
step from the zero state.  So the trigger needs some prefix of the
3-stage structure.  This stage grows the program one stage at a time:

  chain(k): from the zero state, k complete fst stage-closes (RHS ->
  assembly -> fst solve), then ONE more RHS -> assembly -> final solve
  with impl in {fst, half}; output = final psi.  rel(k) = divergence of
  the two impls' outputs.  The smallest k with big rel is the minimal
  repro; its HLO is then dumped for inspection alongside the passing
  k-1 (the interesting suspects: how the cumsum lowers, reverse
  fusions, layout assignment of the interleave reshape).

Usage: python benchmarks/fsthalf_repro5.py [--nx 128] [--dump-hlo]
"""
import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=128)
    ap.add_argument("--dump-hlo", action="store_true")
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

    def chain(k, impl):
        """k fst stage-closes then one impl-solve; RK3 coefficients of
        the real step so the arithmetic is identical to stage 3."""
        def fn(w, s):
            wcur, scur = w, s
            wt = w
            for i in range(k + 1):
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
                use = impl if i == k else "fst"
                scur = direct.solve_fst(
                    -wt, dx, dy, impl=("half" if use == "half" else "rfft"))
            return scur
        return fn

    w0 = jnp.zeros((nx + 1, nx + 1), jnp.float32)
    s0 = jnp.zeros_like(w0)

    for k in (0, 1, 2):
        jf = jax.jit(chain(k, "fst"))
        jh = jax.jit(chain(k, "half"))
        a = np.asarray(jf(w0, s0))
        b = np.asarray(jh(w0, s0))
        scale = max(np.abs(a).max(), 1e-30)
        rel = np.abs(b - a).max() / scale
        print(f'{{"case": "chain{k}", "rel": {rel:.3e}}}', flush=True)
        if args.dump_hlo and rel > 1e-3:
            txt = jh.lower(w0, s0).compile().as_text()
            path = f"/tmp/fsthalf_chain{k}_half.hlo"
            with open(path, "w") as fh:
                fh.write(txt)
            txt2 = jax.jit(chain(k - 1, "half")).lower(
                w0, s0).compile().as_text() if k else ""
            if txt2:
                with open(f"/tmp/fsthalf_chain{k-1}_half.hlo", "w") as fh:
                    fh.write(txt2)
            print(f"# dumped {path}")
            break


if __name__ == "__main__":
    main()
