"""Compiled-loop reference-cavity denominator: the ch. 18 cavity
algorithm with its stencil/BC/stage loops as single-thread C (-O3,
the faithful stand-in for Julia's compiled fused loops) and the DST-I
via scipy-pocketfft, timed end to end at the north-star 1024^2 grid.

    python benchmarks/reference_cavity_c.py [--nx 1024] [--steps 20]

Why (BASELINE.md round 3): reference_cavity_numpy.py measures the
algorithm in vectorized NumPy and then has to GRANT Julia a 1-8x
compiled-loop factor on the non-DST share — the single largest
uncertainty in the denominator.  Here that share is MEASURED: the C
kernels (benchmarks/native/ref_kernels.c) use the reference's own
two-pass structure (an Arakawa RHS pass writing r, then a stage-combine
pass; lid_driven_cavity.jl:80-110,124-159), compiled -O3 on this
machine, so the only remaining adjustment is FFTW-vs-pocketfft on the
DST share (measured 1.9x via the round-2 MKL-class calibration,
bounded 1.5-2.5x).

    julia_est = t_dst / f_fftw  +  t_c_rest / 1.0

Verified identical to the NumPy port (hence to the JAX model, hence to
the reference numerics) in tests/test_reference_parity.py.

Output: one JSON line with the measured C-proxy steps/s, the component
split, and the derived Julia-denominator range.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import native_kernels as nk  # noqa: E402
import reference_cavity_numpy as refnp  # noqa: E402


def make_stepper(nx: int, ny: int, dx: float, dy: float, dt: float,
                 re: float, den: np.ndarray):
    """One SSP-RK3 cavity step with C stencil loops; returns step(w, s) ->
    (w, s).  Buffers are preallocated; each stage is RHS pass -> combine
    pass -> wall BCs -> DST Poisson solve, exactly the reference's
    per-stage structure."""
    r = np.zeros((nx + 1, ny + 1))
    wt = np.zeros_like(r)
    wt2 = np.zeros_like(r)
    wn = np.zeros_like(r)

    def close(wtbuf, s):
        nk.bc2(wtbuf, s, dx, dy)
        s_new = np.zeros_like(wtbuf)
        s_new[1:-1, 1:-1] = refnp.solve_fst(-wtbuf[1:-1, 1:-1], den)
        return s_new

    def step(w, s):
        nk.arakawa_rhs(w, s, r, dx, dy, re)
        nk.stage_combine(w, w, r, wt, 1.0, 0.0, dt)
        s1 = close(wt, s)

        nk.arakawa_rhs(wt, s1, r, dx, dy, re)
        nk.stage_combine(w, wt, r, wt2, 0.75, 0.25, 0.25 * dt)
        s2 = close(wt2, s1)

        nk.arakawa_rhs(wt2, s2, r, dx, dy, re)
        nk.stage_combine(w, wt2, r, wn, 1.0 / 3.0, 2.0 / 3.0, 2.0 * dt / 3.0)
        sn = close(wn, s2)
        return wn.copy(), sn

    return step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--re", type=float, default=100.0)
    ap.add_argument("--dt", type=float, default=2e-5)
    args = ap.parse_args()
    nx = ny = args.nx
    dx = dy = 1.0 / nx
    den = refnp.make_eigen_den(nx, ny, dx, dy)
    step = make_stepper(nx, ny, dx, dy, args.dt, args.re, den)
    w = np.zeros((nx + 1, ny + 1))
    s = np.zeros_like(w)
    for _ in range(2):                      # warm pocketfft plans + pages
        w, s = step(w, s)
    refnp._DST_SECONDS = 0.0
    t0 = time.perf_counter()
    for _ in range(args.steps):
        w, s = step(w, s)
    total = time.perf_counter() - t0
    assert np.isfinite(w).all()
    per_step = total / args.steps
    t_dst = refnp._DST_SECONDS / args.steps
    t_rest = per_step - t_dst
    julia_fast = t_dst / 2.5 + t_rest      # loops already compiled: 1.0
    julia_slow = t_dst / 1.5 + t_rest
    print(json.dumps({
        "metric": f"reference_cavity_c_{nx}",
        "c_proxy_steps_per_sec": round(1.0 / per_step, 3),
        "per_step_s": round(per_step, 5),
        "dst_share_s": round(t_dst, 5),
        "c_stencil_share_s": round(t_rest, 5),
        "julia_est_steps_per_sec": [round(1.0 / julia_slow, 2),
                                    round(1.0 / julia_fast, 2)],
        "steps": args.steps,
    }))


if __name__ == "__main__":
    main()
