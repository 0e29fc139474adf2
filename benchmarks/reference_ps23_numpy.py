"""Direct reference-ps23 denominator: the ch. 22 pseudospectral 2/3-rule
vortex-merger ALGORITHM (pseudospectral_23_rule.jl:13-144 — 3-stage
low-storage RK3/CN over the vorticity spectrum; per jacobian: 4 masked
derivative spectra -> 4 ifft2 -> physical product -> 1 fft2, i.e. 15
full complex transforms per step) in vectorized NumPy (complex128 —
what FFTW.jl computes), timed at the north-star 2048^2 on one CPU core.

    python benchmarks/reference_ps23_numpy.py [--nx 2048] [--steps 5]

Same methodology as reference_cavity_numpy.py (which re-anchored the
cavity denominator): measure the actual algorithm end to end, split the
step into its transform share and everything-else share, and apply the
Julia adjustment per part:

    julia_est = t_fft / f_fftw + t_rest / f_loops

* f_fftw in 1.5-2.5x (FFTW vs numpy-pocketfft, complex128 — the round-2
  MKL-class calibration measured 1.9x at 2048^2);
* f_loops in 1-4x (compiled fused loops vs NumPy temporaries for the
  elementwise spectrum updates — lighter than the cavity's 1-8x because
  this solver's non-transform work is a handful of broadcasts, not a
  17-point stencil).

Numerics mirror cfd_julia_tpu.models.vortex.make_spectral_step
(solver="ps23"), which carries the documented reference deviations
(symmetric 2/3 band, Nyquist zeroing); trajectory equality vs the JAX
model is pinned in tests/test_reference_parity.py.  Nothing is copied
from the reference sources.
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np

ALPHAS = (8.0 / 15.0, 2.0 / 15.0, 1.0 / 3.0)
GAMMAS = (8.0 / 15.0, 5.0 / 12.0, 3.0 / 4.0)
RHOS = (0.0, -17.0 / 60.0, -5.0 / 12.0)

_FFT_SECONDS = 0.0


def _ifft2(a):
    global _FFT_SECONDS
    t0 = time.perf_counter()
    r = np.fft.ifft2(a)
    _FFT_SECONDS += time.perf_counter() - t0
    return r


def _fft2(a):
    global _FFT_SECONDS
    t0 = time.perf_counter()
    r = np.fft.fft2(a)
    _FFT_SECONDS += time.perf_counter() - t0
    return r


def make_consts(nx, ny, dx, dy, eps=1e-6):
    hx = 2 * np.pi / (nx * dx)
    hy = 2 * np.pi / (ny * dy)
    ix, iy = np.arange(nx), np.arange(ny)
    kx = hx * np.where(ix < nx // 2, ix, ix - nx).astype(float)
    ky = hy * np.where(iy < ny // 2, iy, iy - ny).astype(float)
    kxg, kyg = kx.copy(), ky.copy()
    kxg[0] = eps
    kyg[0] = eps
    k2 = kxg[:, None] ** 2 + kyg[None, :] ** 2
    # derivative wavenumbers: k=0 and Nyquist zeroed (models/vortex.py
    # _deriv_spectra conventions)
    kx0, ky0 = kx.copy(), ky.copy()
    kx0[0] = 0.0
    ky0[0] = 0.0
    nyq = (((nx % 2 != 0) | (ix != nx // 2))[:, None]
           & ((ny % 2 != 0) | (iy != ny // 2))[None, :])
    # symmetric 2/3 band
    nxe, nye = (2 * nx) // 3, (2 * ny) // 3
    keep_x = (ix < nxe // 2) | (ix > nx - nxe // 2)
    keep_y = (iy < nye // 2) | (iy > ny - nye // 2)
    band = keep_x[:, None] & keep_y[None, :]
    mean = np.ones((nx, ny))
    mean[0, 0] = 0.0
    return kx0, ky0, k2, nyq & band, mean


def jacobian_23(wf, kx0, ky0, k2, mask):
    """4 masked derivative spectra -> 4 ifft2 -> product -> fft2
    (the reference's transform count; 15 per 3-stage step)."""
    ikx = 1j * kx0[:, None]
    iky = 1j * ky0[None, :]
    sx = _ifft2(ikx * wf / k2 * mask).real     # psi_x
    wy = _ifft2(iky * wf * mask).real
    sy = _ifft2(iky * wf / k2 * mask).real     # psi_y
    wx = _ifft2(ikx * wf * mask).real
    return _fft2(sx * wy - sy * wx)


def step(wf, consts, dt, re):
    kx0, ky0, k2, mask, mean = consts
    jn = jacobian_23(wf, kx0, ky0, k2, mask)
    out = wf
    jprev = jn
    for s in range(3):
        d = ALPHAS[s] * 0.5 * dt * k2 / re
        j = jprev if s == 0 else jacobian_23(out, kx0, ky0, k2, mask)
        out = (((1.0 - d) / (1.0 + d)) * out
               + (RHOS[s] * dt * jprev + GAMMAS[s] * dt * j) / (1.0 + d))
        out *= mean
        jprev = j
    return out


def vm_ic(nx, ny, dx, dy):
    x = np.arange(nx) * dx
    y = np.arange(ny) * dy
    X, Y = np.meshgrid(x, y, indexing="ij")
    s = np.pi
    return (np.exp(-s * ((X - np.pi + np.pi / 4) ** 2 + (Y - np.pi) ** 2))
            + np.exp(-s * ((X - np.pi - np.pi / 4) ** 2
                           + (Y - np.pi) ** 2)))


def main():
    global _FFT_SECONDS
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--re", type=float, default=1000.0)
    ap.add_argument("--dt", type=float, default=1e-3)
    args = ap.parse_args()
    nx = ny = args.nx
    dx = dy = 2 * np.pi / nx
    consts = make_consts(nx, ny, dx, dy)
    wf = np.fft.fft2(vm_ic(nx, ny, dx, dy).astype(complex))
    wf[0, 0] = 0.0
    wf = step(wf, consts, args.dt, args.re)      # warm
    _FFT_SECONDS = 0.0
    t0 = time.perf_counter()
    for _ in range(args.steps):
        wf = step(wf, consts, args.dt, args.re)
    total = time.perf_counter() - t0
    assert np.isfinite(wf).all()
    per_step = total / args.steps
    t_fft = _FFT_SECONDS / args.steps
    t_rest = per_step - t_fft
    julia_fast = t_fft / 2.5 + t_rest / 4.0
    julia_slow = t_fft / 1.5 + t_rest / 1.0
    print(json.dumps({
        "metric": f"reference_ps23_numpy_{nx}",
        "numpy_steps_per_sec": round(1.0 / per_step, 4),
        "per_step_s": round(per_step, 4),
        "fft_share_s": round(t_fft, 4),
        "rest_share_s": round(t_rest, 4),
        "julia_est_steps_per_sec": [round(1.0 / julia_slow, 3),
                                    round(1.0 / julia_fast, 3)],
        "steps": args.steps,
    }))


if __name__ == "__main__":
    main()
