"""Stage-3 bisection of the fst_half on-chip reject (VERDICT r4 item 3).

Stage 2 established: along the failing trajectory, a ONE-jit program
[XLA RHS -> assembly -> solve] gives |s_half - s_full| ~ 1e-7, barriers
at every seam of fst_poisson_dirichlet change nothing, and the full
3-stage step still lands rel 0.1502 (deterministically) after 6 steps.
So the trigger lives in the step *structure*, not the solve in
isolation.  This stage:

  A. per-step trajectory divergence (does step 1 already diverge, or
     does it grow?) — both trajectories stepped side by side.
  B. one-step paired divergence along the fst trajectory: apply BOTH
     full step functions to the identical state each step.
  C. stage substitution: a step whose stage-1-only / stage-2-only /
     stage-3-only Poisson solve is fst_half (others fst) — which stage
     triggers the reject?

Usage: python benchmarks/fsthalf_repro3.py [--nx 128] [--steps 6]
"""
import argparse

import numpy as np


def build_mixed_step(cavity, cfg, which):
    """cavity.make_step_fn clone with a PER-STAGE solver choice.
    which: 3-tuple of "fst"|"half" per RK stage."""
    import jax.numpy as jnp

    from cfd_julia_tpu.ops import arakawa
    from cfd_julia_tpu.poisson import direct

    dx, dy, dt = cfg.dx, cfg.dy, cfg.dt

    def rhs_interior(w, s):
        return arakawa.vorticity_rhs(w, s, dx, dy, cfg.re)[1:-1, 1:-1]

    def solve_for(tag):
        if tag == "half":
            return lambda f: direct.solve_fst(f, dx, dy, impl="half")
        return lambda f: direct.solve_fst(f, dx, dy)

    solves = [solve_for(t) for t in which]

    def stage_close(wt_interior, s_prev, k):
        wt = cavity.assemble_with_wall_bc(wt_interior, s_prev, dx, dy,
                                          cfg.bc_order)
        return wt, solves[k](-wt)

    def step(state):
        w, s, _ = state
        sp = s
        r = rhs_interior(w, s)
        wt, s = stage_close(w[1:-1, 1:-1] + dt * r, s, 0)
        r = rhs_interior(wt, s)
        wt, s = stage_close(
            0.75 * w[1:-1, 1:-1] + 0.25 * wt[1:-1, 1:-1] + 0.25 * dt * r,
            s, 1)
        r = rhs_interior(wt, s)
        wn, s = stage_close(
            (w[1:-1, 1:-1] + 2.0 * wt[1:-1, 1:-1] + 2.0 * dt * r) / 3.0,
            s, 2)
        rms = jnp.sqrt(jnp.mean((s - sp) ** 2))
        return (wn, s, rms)

    return step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=128)
    ap.add_argument("--steps", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cfd_julia_tpu.models import cavity

    print(f"# devices: {jax.devices()}")
    nx = args.nx

    cfg = cavity.CavityConfig(nx=nx, ny=nx, poisson="fst", rhs_impl="xla")
    w0 = jnp.zeros((nx + 1, nx + 1), jnp.float32)
    init = (w0, jnp.zeros_like(w0), jnp.zeros((), jnp.float32))

    step_fst = jax.jit(build_mixed_step(cavity, cfg, ("fst",) * 3))
    step_half = jax.jit(build_mixed_step(cavity, cfg, ("half",) * 3))

    # A + B: side-by-side trajectories and one-step paired divergence
    st_f, st_h = init, init
    for k in range(args.steps):
        paired = step_half(st_f)        # one half-step from the fst state
        st_f = step_fst(st_f)
        st_h = step_half(st_h)
        scale = max(float(jnp.abs(st_f[1]).max()), 1e-30)
        traj = float(jnp.abs(st_h[1] - st_f[1]).max()) / scale
        one = float(jnp.abs(paired[1] - st_f[1]).max()) / scale
        print(f'{{"case": "step{k}", "traj_rel": {traj:.3e}, '
              f'"paired_rel": {one:.3e}}}')

    # C: which stage triggers it
    def run(step):
        st = init
        for _ in range(args.steps):
            st = step(st)
        return np.asarray(st[1])

    base = run(step_fst)
    scale = max(np.abs(base).max(), 1e-30)
    for which in (("half", "fst", "fst"), ("fst", "half", "fst"),
                  ("fst", "fst", "half"), ("half",) * 3):
        s = run(jax.jit(build_mixed_step(cavity, cfg, which)))
        rel = np.abs(s - base).max() / scale
        print(f'{{"case": "stages={"+".join(which)}", "rel": {rel:.3e}}}')


if __name__ == "__main__":
    main()
