"""Decompose the cavity step's wall-clock at 1024^2 (route to a
certified-precision >=1000 steps/s headline, VERDICT r4 item 2a).

Motivation (round-5 numbers): bf16x3+pallas steps at ~934/s (1.07 ms)
and bf16x1+pallas at ~1284/s (0.78 ms); the MXU share is only ~0.39 /
0.13 ms of that, so ~0.65 ms/step is NON-matmul — RHS kernel, BC
assembly, RK combines, eigen divide, pad/slice relayouts, bf16 splits.
This probe times each component in its own windowed scan (multiples of
50 inner iterations inside one jit call, serialized carries, perturbed
inputs per CLAUDE.md timing discipline) so the 0.65 ms gets an owner.

Usage: python benchmarks/cavity_step_decomp.py [--nx 1024] [--iters 200]
(axon tunnel; own process.)
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from cfd_julia_tpu.models import cavity
    from cfd_julia_tpu.ops import pallas_kernels
    from cfd_julia_tpu.poisson import direct

    print(f"# devices: {jax.devices()}", flush=True)
    nx = args.nx
    N = args.iters
    dx = dy = 1.0 / nx
    dt = 2e-5
    re = 100.0

    rng = jax.random.PRNGKey(0)
    w0 = 0.01 * jax.random.normal(rng, (nx + 1, nx + 1), jnp.float32)
    s0 = 0.001 * jax.random.normal(jax.random.PRNGKey(1),
                                   (nx + 1, nx + 1), jnp.float32)

    def timed(label, body):
        """body(carry) -> carry; N serialized reps in ONE jit call."""
        @jax.jit
        def win(c):
            return lax.fori_loop(0, N, lambda i, c: body(c), c)
        c0 = (w0, s0)
        c = win(c0)
        jax.block_until_ready(c[0])
        t0 = time.perf_counter()
        c = win(c)               # warm output as input: uncacheable
        jax.block_until_ready(c[0])
        ms = (time.perf_counter() - t0) / N * 1e3
        print(f'{{"component": "{label}", "ms": {ms:.4f}}}', flush=True)
        return ms

    # full steps for reference
    for poisson in ("matmul_bf16x3", "matmul_bf16x1"):
        cfg = cavity.CavityConfig(nx=nx, ny=nx, dt=dt, poisson=poisson,
                                  rhs_impl="pallas")
        step = cavity.make_step_fn(cfg)

        def body(c, step=step):
            w, s = c
            w2, s2, _ = step((w, s, jnp.zeros((), jnp.float32)))
            return (w2, s2)
        timed(f"full_step_{poisson}", body)

    # pallas RHS alone
    def rhs_body(c):
        w, s = c
        r = pallas_kernels.arakawa_rhs_fused(w, s, dx, dy, re)
        return (w + 1e-20 * r, s)
    timed("pallas_rhs", rhs_body)

    # solve alone, each tier (serialized on its own output)
    for prec, label in (("high", "solve_bf16x3"),
                        ("default", "solve_bf16x1"),
                        ("highest", "solve_fp32x6")):
        def solve_body(c, prec=prec):
            w, s = c
            psi = direct.solve_fst_matmul_interior(-w, nx, nx, dx, dy,
                                                   mm_precision=prec)
            return (w * (1.0 + 1e-20 * psi[1, 1]), psi)
        timed(label, solve_body)

    # rfft DST solve for comparison
    def fst_body(c):
        w, s = c
        psi = direct.solve_fst(-w, dx, dy)
        return (w * (1.0 + 1e-20 * psi[1, 1]), psi)
    timed("solve_fst_rfft", fst_body)

    # BC assembly alone
    def bc_body(c):
        w, s = c
        wt = cavity.assemble_with_wall_bc(w[1:-1, 1:-1], s, dx, dy, 2)
        return (wt, s)
    timed("assemble_bc", bc_body)

    # RK combine alone (stage-3 shape)
    def rk_body(c):
        w, s = c
        wn = (w + 2.0 * s + 2.0 * dt * w) / 3.0
        return (wn, s)
    timed("rk_combine", rk_body)

    # one full stage: rhs -> combine -> assemble -> solve (bf16x3)
    def stage_body(c):
        w, s = c
        r = pallas_kernels.arakawa_rhs_fused(w, s, dx, dy, re)[1:-1, 1:-1]
        wt = cavity.assemble_with_wall_bc(w[1:-1, 1:-1] + dt * r, s,
                                          dx, dy, 2)
        psi = direct.solve_fst_matmul_interior(-wt, nx, nx, dx, dy,
                                               mm_precision="high")
        return (wt, psi)
    timed("one_stage_bf16x3", stage_body)


if __name__ == "__main__":
    main()
