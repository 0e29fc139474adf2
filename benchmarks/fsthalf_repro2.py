"""Stage-2 bisection of the fst_half on-chip physics reject (VERDICT r4
item 3).  Stage 1 (fsthalf_repro.py) proved: reproduces at 128^2 in 6
steps (rel 0.15 with the XLA RHS, 5.6e-6 with the Pallas RHS), and NO
single optimization_barrier inside _dst1_half_last fixes it — the
miscompiling seam is not inside the half-DST kernel itself.

This stage bisects one level up:
  A. in-program divergence: inside ONE jit, run the XLA RHS + assembly,
     then BOTH solvers on the identical wt and output max|s_half-s_full|
     per step — isolates whether one solve already diverges (compiler
     bug in the solve program) or the trajectories only drift through
     feedback (e.g. a solver-dependent BC/assembly fusion).
  B. seam barriers BETWEEN the four dst1 calls / around the eigen divide
     in fst_poisson_dirichlet (stage 1 only barriered inside
     _dst1_half_last).
  C. input/output barriers around the whole half solve.

Usage: python benchmarks/fsthalf_repro2.py [--nx 128] [--steps 6]
(axon tunnel; own process.)
"""
import argparse
import functools

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=128)
    ap.add_argument("--steps", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cfd_julia_tpu.models import cavity
    from cfd_julia_tpu.ops import spectral
    from cfd_julia_tpu.poisson import direct

    print(f"# devices: {jax.devices()}")
    nx = args.nx

    # ---- A. in-program solver divergence along the fst trajectory ----
    # The two solvers agree to 7e-8 when compared in an ISOLATED jit on
    # identical inputs (first stage-2 run) — the divergence needs the
    # XLA RHS fused into the same program.  So the probe program is:
    # XLA Arakawa RHS -> wall-BC assembly -> BOTH solvers -> |diff|,
    # all one jit — the exact fusion neighborhood of the failing step.
    from cfd_julia_tpu.ops import arakawa

    cfg = cavity.CavityConfig(nx=nx, ny=nx, poisson="fst",
                              rhs_impl="xla")
    step = jax.jit(cavity.make_step_fn(cfg))
    dx, dy, dt = cfg.dx, cfg.dy, cfg.dt

    @jax.jit
    def probe(w, s):
        r = arakawa.vorticity_rhs(w, s, dx, dy, cfg.re)[1:-1, 1:-1]
        wt = cavity.assemble_with_wall_bc(w[1:-1, 1:-1] + dt * r, s,
                                          dx, dy, cfg.bc_order)
        s_full = direct.solve_fst(-wt, dx, dy)
        s_half = direct.solve_fst(-wt, dx, dy, impl="half")
        return jnp.abs(s_half - s_full).max(), jnp.abs(s_full).max()

    w0 = jnp.zeros((nx + 1, nx + 1), jnp.float32)
    st = (w0, jnp.zeros_like(w0), jnp.zeros((), jnp.float32))
    for k in range(args.steps):
        st = step(st)
        d, m = probe(st[0], st[1])
        print(f'{{"case": "inprog_step{k}", "absdiff": {float(d):.3e}, '
              f'"scale": {float(m):.3e}}}')

    # ---- B/C. seam barriers one level up ----
    def run(poisson):
        # rhs_impl pinned to "xla": the config default auto-resolves to
        # the Pallas RHS on TPU, which hides the failure (first stage-2
        # run measured 5.6e-6 for exactly that reason)
        c = cavity.CavityConfig(nx=nx, ny=nx, poisson=poisson,
                                rhs_impl="xla")
        stp = jax.jit(cavity.make_step_fn(c))
        s = (w0, jnp.zeros_like(w0), jnp.zeros((), jnp.float32))
        for _ in range(args.steps):
            s = stp(s)
        return np.asarray(s[1])

    base = run("fst")
    scale = max(np.abs(base).max(), 1e-30)

    def rel(x):
        return np.abs(x - base).max() / scale

    print(f'{{"case": "fst_half baseline", "rel": {rel(run("fst_half")):.3e}}}')

    orig = spectral.fst_poisson_dirichlet

    def patched(f_interior, dx, dy, mesh=None, impl="rfft",
                precision="highest", *, seam):
        bar = jax.lax.optimization_barrier
        if impl != "half":
            return orig(f_interior, dx, dy, mesh=mesh, impl=impl,
                        precision=precision)
        mx, my = f_interior.shape[-2], f_interior.shape[-1]
        nxx, nyy = mx + 1, my + 1
        dtype = f_interior.dtype
        i = jnp.arange(1, nxx, dtype=dtype)
        j = jnp.arange(1, nyy, dtype=dtype)
        den = (2.0 / dx**2) * (jnp.cos(jnp.pi * i / nxx) - 1.0)[:, None] + (
            2.0 / dy**2) * (jnp.cos(jnp.pi * j / nyy) - 1.0)[None, :]
        x = f_interior
        if seam == "input":
            x = bar(x)
        x = spectral.dst1(x, axis=-1, impl="half")
        if seam == "fwd_rows":
            x = bar(x)
        x = spectral.dst1(x, axis=-2, impl="half")
        if seam == "fwd_cols":
            x = bar(x)
        x = x / den
        if seam == "divide":
            x = bar(x)
        x = spectral.dst1(x, axis=-2, impl="half")
        if seam == "inv_cols":
            x = bar(x)
        x = spectral.dst1(x, axis=-1, impl="half")
        if seam == "output":
            x = bar(x)
        return x / (4.0 * nxx * nyy)

    seams = ("input", "fwd_rows", "fwd_cols", "divide", "inv_cols",
             "output")
    for seam in seams:
        spectral.fst_poisson_dirichlet = functools.partial(patched,
                                                           seam=seam)
        # direct.py binds spectral.fst_poisson_dirichlet at call time via
        # module attribute — confirm that assumption loudly if it breaks
        try:
            r = rel(run("fst_half"))
        finally:
            spectral.fst_poisson_dirichlet = orig
        print(f'{{"case": "barrier@{seam}", "rel": {r:.3e}}}')


if __name__ == "__main__":
    main()
