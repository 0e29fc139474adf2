"""Build-on-demand ctypes wrapper for the compiled reference-proxy
kernels (benchmarks/native/ref_kernels.c).

The shared library is compiled once into benchmarks/native/ with
`gcc -O3 -march=native` (single-threaded fp64 loops — the faithful
stand-in for the Julia reference's compiled stencil sweeps) and cached;
rebuilds happen automatically when the .c file is newer than the .so.
No pip/pybind dependency: plain ctypes over a C ABI.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_SRC = os.path.join(_DIR, "ref_kernels.c")
_SO = os.path.join(_DIR, "ref_kernels.so")

_lib = None


def _build() -> None:
    cmd = ["gcc", "-O3", "-march=native", "-fno-math-errno", "-shared",
           "-fPIC", _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def load() -> ctypes.CDLL:
    """Load (building if stale) the kernel library."""
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        _build()
    lib = ctypes.CDLL(_SO)
    d = ctypes.POINTER(ctypes.c_double)
    lib.arakawa_rhs.argtypes = [d, d, d, ctypes.c_int, ctypes.c_double,
                                ctypes.c_double, ctypes.c_double]
    lib.stage_combine.argtypes = [d, d, d, d, ctypes.c_int, ctypes.c_double,
                                  ctypes.c_double, ctypes.c_double]
    lib.bc2.argtypes = [d, d, ctypes.c_int, ctypes.c_double, ctypes.c_double]
    lib.gs_sweep.argtypes = [d, d, ctypes.c_int, ctypes.c_double,
                             ctypes.c_double, ctypes.c_int]
    lib.residual.argtypes = [d, d, d, ctypes.c_int, ctypes.c_double,
                             ctypes.c_double]
    lib.restrict_fw.argtypes = [d, d, ctypes.c_int]
    lib.prolong_correct.argtypes = [d, d, ctypes.c_int]
    u8 = ctypes.POINTER(ctypes.c_uint8)
    lib.ps23_derivs.argtypes = [d, d, d, d, u8, ctypes.c_int, ctypes.c_int,
                                d, d, d, d]
    lib.ps23_product.argtypes = [d, d, d, d, ctypes.c_longlong, d]
    lib.ps23_stage.argtypes = [d, d, d, d, ctypes.c_longlong,
                               ctypes.c_double, ctypes.c_double,
                               ctypes.c_double, d]
    for f in (lib.arakawa_rhs, lib.stage_combine, lib.bc2, lib.gs_sweep,
              lib.residual, lib.restrict_fw, lib.prolong_correct,
              lib.ps23_derivs, lib.ps23_product, lib.ps23_stage):
        f.restype = None
    _lib = lib
    return lib


def _p(a: np.ndarray):
    assert a.dtype == np.float64 and a.flags["C_CONTIGUOUS"]
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def arakawa_rhs(w, s, r, dx, dy, re):
    load().arakawa_rhs(_p(w), _p(s), _p(r), w.shape[0], dx, dy, re)


def stage_combine(w, wt, r, out, ca, cb, cc):
    load().stage_combine(_p(w), _p(wt), _p(r), _p(out), w.shape[0],
                         ca, cb, cc)


def bc2(w, s, dx, dy):
    load().bc2(_p(w), _p(s), w.shape[0], dx, dy)


def gs_sweep(u, f, dx, dy, iters):
    load().gs_sweep(_p(u), _p(f), u.shape[0], dx, dy, iters)


def residual(u, f, r, dx, dy):
    load().residual(_p(u), _p(f), _p(r), u.shape[0], dx, dy)


def restrict_fw(r_fine, r_coarse):
    load().restrict_fw(_p(r_fine), _p(r_coarse), r_coarse.shape[0])


def prolong_correct(e_coarse, u_fine):
    load().prolong_correct(_p(e_coarse), _p(u_fine), e_coarse.shape[0])


def _pc(a: np.ndarray):
    """complex128 array as an interleaved double pointer."""
    assert a.dtype == np.complex128 and a.flags["C_CONTIGUOUS"]
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def ps23_derivs(wf, kx0, ky0, k2, mask, sxf, wyf, syf, wxf):
    assert mask.dtype == np.uint8 and mask.flags["C_CONTIGUOUS"]
    load().ps23_derivs(_pc(wf), _p(kx0), _p(ky0), _p(k2),
                       mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                       wf.shape[0], wf.shape[1],
                       _pc(sxf), _pc(wyf), _pc(syf), _pc(wxf))


def ps23_product(sx, wy, sy, wx, jacp):
    load().ps23_product(_pc(sx), _pc(wy), _pc(sy), _pc(wx), sx.size,
                        _pc(jacp))


def ps23_stage(inp, jprev, jc, k2, coef, rho_dt, gamma_dt, out):
    load().ps23_stage(_pc(inp), _pc(jprev), _pc(jc), _p(k2), inp.size,
                      coef, rho_dt, gamma_dt, _pc(out))
