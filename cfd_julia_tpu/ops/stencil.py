"""Shift/stencil primitives: the building blocks every FD solver shares.

The reference expresses stencils as `@unroll u[2:nx] ... u[3:nx+1] ...` index
arithmetic (e.g. 01_Heat_Equation_FTCS/ftcs.jl:37) or explicit loops; here
they are whole-array shifted views that XLA fuses into single kernels.

Conventions:
* `shift(u, k, axis)` -> u_{i+k} with *periodic* wrap (jnp.roll).
* slicing helpers return interior-sized arrays for Dirichlet-style updates.
"""
from __future__ import annotations

import jax.numpy as jnp


def shift(u, k: int, axis: int = -1):
    """u_{i+k} along `axis`, periodic wrap. k>0 looks forward (+x)."""
    return jnp.roll(u, -k, axis=axis)


def laplacian_1d(u, dx: float):
    """Second difference on interior nodes: (u[i+1]-2u[i]+u[i-1])/dx^2.

    Input (n,), output (n-2,) interior values.
    """
    return (u[2:] - 2 * u[1:-1] + u[:-2]) / dx**2


def laplacian_2d(u, dx: float, dy: float):
    """5-point Laplacian on interior nodes of a (nx+1, ny+1) field -> (nx-1, ny-1)."""
    return (
        (u[2:, 1:-1] - 2 * u[1:-1, 1:-1] + u[:-2, 1:-1]) / dx**2
        + (u[1:-1, 2:] - 2 * u[1:-1, 1:-1] + u[1:-1, :-2]) / dy**2
    )


def laplacian_periodic(u, dx: float, dy: float):
    """5-point Laplacian with periodic wrap, same shape as u (nx, ny)."""
    return (
        (shift(u, 1, 0) - 2 * u + shift(u, -1, 0)) / dx**2
        + (shift(u, 1, 1) - 2 * u + shift(u, -1, 1)) / dy**2
    )


def central_diff_1d_periodic(u, dx: float):
    """(u_{i+1} - u_{i-1}) / (2 dx), periodic."""
    return (shift(u, 1) - shift(u, -1)) / (2 * dx)
