"""Direct (transform-based) Poisson solvers on node-centred grids.

Wraps ops.spectral with the reference's full-grid conventions:
* periodic FFT solvers take/return (nx+1, ny+1) node grids, solving on the
  nx x ny unique nodes and wrapping the duplicated boundary
  (fft_p.jl:92-104, fft_s.jl).
* the FST solver takes the full grid, solves the (nx-1)x(ny-1) interior
  with homogeneous Dirichlet boundaries and zero-fills the boundary ring
  (fft_d.jl:70-76).
"""
from __future__ import annotations

import jax.numpy as jnp

from cfd_julia_tpu.ops import spectral


def solve_fft(f, dx: float, dy: float, eigen: str = "fdm", mesh=None):
    """Periodic Poisson solve; f, result: (nx+1, ny+1) with wrapped edges."""
    un = spectral.fft_poisson_periodic(f[:-1, :-1], dx, dy, eigen=eigen, mesh=mesh)
    row = un[:1, :]
    un_full = jnp.concatenate([un, row], axis=0)
    col = un_full[:, :1]
    return jnp.concatenate([un_full, col], axis=1)


def solve_fst(f, dx: float, dy: float, mesh=None):
    """Homogeneous-Dirichlet Poisson solve via DST-I on the interior.
    (Boundary ring rebuilt with jnp.pad, not scatter — GSPMD-safe.)"""
    interior = spectral.fst_poisson_dirichlet(f[1:-1, 1:-1], dx, dy, mesh=mesh)
    return jnp.pad(interior, 1)
