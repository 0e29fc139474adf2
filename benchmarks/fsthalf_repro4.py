"""Stage-4 bisection: the output-boundary hypothesis.

Stage 3 found: ONLY stage 3 (the final RK stage, whose psi is a program
OUTPUT) triggers the fst_half reject; stages whose psi feeds further
in-program ops are fine, and an in-program |s_half - s_full| diff is
1e-7.  Hypothesis: materializing the half-DST result as a jit output
(its stack+reshape interleave near the output edge) miscompiles —
a layout/copy bug, not a fusion bug (barriers did nothing).

Probes (all from the same nonzero state, XLA RHS + assembly upstream):
  A. one jit returning BOTH s_full and s_half -> host diff
  B. s_half output alone vs s_full output alone (separate jits)
  C. s_half output + a scalar (sum) output -> does the scalar match the
     in-program reduction of a correct value while the array is wrong?
  D. the same with x2 = s_half * 1.0 + 0.0 (copy op before the output)

Usage: python benchmarks/fsthalf_repro4.py [--nx 128]
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

    # a nonzero state: 3 fst steps from rest
    step = jax.jit(cavity.make_step_fn(cfg))
    st = (jnp.zeros((nx + 1, nx + 1), jnp.float32),
          jnp.zeros((nx + 1, nx + 1), jnp.float32),
          jnp.zeros((), jnp.float32))
    for _ in range(3):
        st = step(st)
    w, s = st[0], st[1]

    def pipeline(ww, ss, impl):
        r = arakawa.vorticity_rhs(ww, ss, dx, dy, cfg.re)[1:-1, 1:-1]
        wt = cavity.assemble_with_wall_bc(ww[1:-1, 1:-1] + dt * r, ss,
                                          dx, dy, cfg.bc_order)
        if impl == "fst":
            return direct.solve_fst(-wt, dx, dy)
        return direct.solve_fst(-wt, dx, dy, impl="half")

    # A: both as outputs of ONE program
    both = jax.jit(lambda ww, ss: (pipeline(ww, ss, "fst"),
                                   pipeline(ww, ss, "half")))
    sf, sh = both(w, s)
    sf, sh = np.asarray(sf), np.asarray(sh)
    scale = max(np.abs(sf).max(), 1e-30)
    print(f'{{"case": "A_both_outputs", "rel": '
          f'{np.abs(sh - sf).max() / scale:.3e}}}')

    # B: each alone
    sf1 = np.asarray(jax.jit(lambda ww, ss: pipeline(ww, ss, "fst"))(w, s))
    sh1 = np.asarray(jax.jit(lambda ww, ss: pipeline(ww, ss, "half"))(w, s))
    print(f'{{"case": "B_separate_outputs", "rel": '
          f'{np.abs(sh1 - sf1).max() / scale:.3e}}}')

    # C: array output + in-program scalar of the same value
    arr, tot = jax.jit(lambda ww, ss: (
        pipeline(ww, ss, "half"),
        pipeline(ww, ss, "half").sum()))(w, s)
    print(f'{{"case": "C_array_vs_scalar", '
          f'"arr_sum": {float(np.asarray(arr).sum()):.6e}, '
          f'"scalar": {float(tot):.6e}}}')

    # D: a copy/identity chain before the output edge
    shc = np.asarray(jax.jit(
        lambda ww, ss: pipeline(ww, ss, "half") * 1.0 + 0.0)(w, s))
    print(f'{{"case": "D_copy_before_output", "rel": '
          f'{np.abs(shc - sf1).max() / scale:.3e}}}')


if __name__ == "__main__":
    main()
