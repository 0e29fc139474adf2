"""Direct reference-cavity denominator: the ch. 18 cavity ALGORITHM
(lid_driven_cavity.jl:58-118 — SSP-RK3 + Arakawa RHS + bc2 walls + DST-I
Poisson) re-expressed in vectorized NumPy + scipy-pocketfft, scaled to the
north-star 1024^2 grid, timed on one CPU core.

    python benchmarks/reference_cavity_numpy.py [--nx 1024] [--steps 20]

Why this exists (BASELINE.md): Julia is not installable in this image, so
the Julia denominator must be inferred.  Round 2 inferred it from the
reference's NumPy vortex-merger port (a *different* solver) plus
per-transform arithmetic; this script measures the *actual cavity
algorithm* end to end instead, and splits the step time into its DST-I
share and everything-else share so the Julia adjustment can be applied
per part:

    julia_est = t_dst / f_fftw  +  t_rest / f_loops

* f_fftw: FFTW (what Julia calls via FFTW.jl r2r RODFT00) vs
  scipy-pocketfft for the same DST-I — measured 1.9x at these sizes via
  the torch/MKL-class FFT calibration (BASELINE.md round-2), bounded
  here as 1.5-2.5x.
* f_loops: compiled Julia loops vs vectorized NumPy for the stencil/BC
  arithmetic — bounded 1-8x: the Arakawa RHS is one fused 17-point loop
  in Julia (~25 MB of HBM traffic per eval at 1025^2 fp64) while the
  vectorized NumPy form materializes ~20 full-array temporaries
  (~160 MB) — the 8x upper bound is that traffic ratio, i.e. a
  perfectly memory-bound fused loop.

Output: one JSON line with the measured NumPy steps/s, the component
split, and the derived Julia-denominator range.

This is an original NumPy implementation of the same numerics as
cfd_julia_tpu.models.cavity (verified equal to it in
tests/test_reference_parity.py::test_numpy_cavity_port_matches_model);
nothing is copied from the reference sources.
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np
import scipy.fft as sfft

_DST_SECONDS = 0.0  # accumulated inside solve_fst


def arakawa_rhs_interior(w, s, dx, dy, re):
    """-J(w,s) + lap(w)/re on the interior (Arakawa 1966 three-form
    average; same formulas as cfd_julia_tpu.ops.arakawa, NumPy slices)."""
    c = w[1:-1, 1:-1]
    wE, wW = w[2:, 1:-1], w[:-2, 1:-1]
    wN, wS = w[1:-1, 2:], w[1:-1, :-2]
    sE, sW = s[2:, 1:-1], s[:-2, 1:-1]
    sN, sS = s[1:-1, 2:], s[1:-1, :-2]
    wNE, wSW = w[2:, 2:], w[:-2, :-2]
    wNW, wSE = w[:-2, 2:], w[2:, :-2]
    sNE, sSW = s[2:, 2:], s[:-2, :-2]
    sNW, sSE = s[:-2, 2:], s[2:, :-2]
    gg = 1.0 / (4.0 * dx * dy)
    j1 = (wE - wW) * (sN - sS) - (wN - wS) * (sE - sW)
    j2 = (wE * (sNE - sSE) - wW * (sNW - sSW)
          - wN * (sNE - sNW) + wS * (sSE - sSW))
    j3 = (wNE * (sN - sE) - wSW * (sW - sS)
          - wNW * (sN - sW) + wSE * (sE - sS))
    jac = gg * (j1 + j2 + j3) / 3.0
    lap = ((wE - 2 * c + wW) / dx**2 + (wN - 2 * c + wS) / dy**2)
    return -jac + lap / re


def apply_wall_bc2(w, s, dx, dy):
    """Jensen 2nd-order vorticity wall closures; top lid moving in +x
    (the -3/dy lid term).  y-walls written last (own the corners)."""
    w[0, 1:-1] = (-4.0 * s[1, 1:-1] + 0.5 * s[2, 1:-1]) / dx**2
    w[-1, 1:-1] = (-4.0 * s[-2, 1:-1] + 0.5 * s[-3, 1:-1]) / dx**2
    w[:, 0] = (-4.0 * s[:, 1] + 0.5 * s[:, 2]) / dy**2
    w[:, -1] = (-4.0 * s[:, -2] + 0.5 * s[:, -3]) / dy**2 - 3.0 / dy


def solve_fst(f_int, den):
    """Homogeneous-Dirichlet Poisson solve via DST-I (scipy pocketfft,
    the FFTW-RODFT00 equivalent), eigenvalue divide, inverse DST-I."""
    global _DST_SECONDS
    t0 = time.perf_counter()
    e = sfft.dstn(f_int, type=1)
    t1 = time.perf_counter()
    e = e / den
    t2 = time.perf_counter()
    u = sfft.idstn(e, type=1)
    _DST_SECONDS += (t1 - t0) + (time.perf_counter() - t2)
    return u


def make_eigen_den(nx, ny, dx, dy):
    i = np.arange(1, nx)
    j = np.arange(1, ny)
    return ((2.0 / dx**2) * (np.cos(np.pi * i / nx) - 1.0)[:, None]
            + (2.0 / dy**2) * (np.cos(np.pi * j / ny) - 1.0)[None, :])


def step(w, s, dx, dy, dt, re, den):
    """One SSP-RK3 cavity step (3 x [RHS, combine, walls, Poisson])."""
    def close(wt):
        apply_wall_bc2(wt, s_cur[0], dx, dy)
        s_new = np.zeros_like(wt)
        s_new[1:-1, 1:-1] = solve_fst(-wt[1:-1, 1:-1], den)
        s_cur[0] = s_new
        return wt, s_new

    s_cur = [s]
    r = arakawa_rhs_interior(w, s, dx, dy, re)
    wt = w.copy()
    wt[1:-1, 1:-1] = w[1:-1, 1:-1] + dt * r
    wt, s1 = close(wt)

    r = arakawa_rhs_interior(wt, s1, dx, dy, re)
    wt2 = wt.copy()
    wt2[1:-1, 1:-1] = (0.75 * w[1:-1, 1:-1] + 0.25 * wt[1:-1, 1:-1]
                       + 0.25 * dt * r)
    wt2, s2 = close(wt2)

    r = arakawa_rhs_interior(wt2, s2, dx, dy, re)
    wn = wt2.copy()
    wn[1:-1, 1:-1] = (w[1:-1, 1:-1] + 2.0 * wt2[1:-1, 1:-1]
                      + 2.0 * dt * r) / 3.0
    wn, sn = close(wn)
    return wn, sn


def main():
    global _DST_SECONDS
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--re", type=float, default=100.0)
    ap.add_argument("--dt", type=float, default=2e-5)
    args = ap.parse_args()
    nx = ny = args.nx
    dx = dy = 1.0 / nx
    den = make_eigen_den(nx, ny, dx, dy)
    w = np.zeros((nx + 1, ny + 1))
    s = np.zeros_like(w)
    # warm: a couple of steps so pocketfft plans/caches exist
    for _ in range(2):
        w, s = step(w, s, dx, dy, args.dt, args.re, den)
    _DST_SECONDS = 0.0
    t0 = time.perf_counter()
    for _ in range(args.steps):
        w, s = step(w, s, dx, dy, args.dt, args.re, den)
    total = time.perf_counter() - t0
    assert np.isfinite(w).all()
    per_step = total / args.steps
    t_dst = _DST_SECONDS / args.steps
    t_rest = per_step - t_dst
    # Julia estimate: FFTW 1.5-2.5x faster than pocketfft on the DST
    # share; compiled loops 1-8x faster than vectorized NumPy on the
    # rest (see module docstring)
    julia_fast = t_dst / 2.5 + t_rest / 8.0
    julia_slow = t_dst / 1.5 + t_rest / 1.0
    print(json.dumps({
        "metric": f"reference_cavity_numpy_{nx}",
        "numpy_steps_per_sec": round(1.0 / per_step, 3),
        "per_step_s": round(per_step, 5),
        "dst_share_s": round(t_dst, 5),
        "rest_share_s": round(t_rest, 5),
        "julia_est_steps_per_sec": [round(1.0 / julia_slow, 2),
                                    round(1.0 / julia_fast, 2)],
        "steps": args.steps,
    }))


if __name__ == "__main__":
    main()
