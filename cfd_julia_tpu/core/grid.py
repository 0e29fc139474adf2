"""Structured-grid containers.

The reference hardcodes `nx, Δx, x = dx*(0:nx)` in every script (e.g.
reference 01_Heat_Equation_FTCS/ftcs.jl:12-21); here grids are small frozen
dataclasses usable as static arguments to jitted solvers.

Conventions (matching the reference):
* Node-centred grids carry nx+1 points x_0..x_nx including both boundaries.
* Cell-centred grids (used by the flux-splitting Burgers solver, reference
  07_.../burgers_flux_splitting.jl) carry nx midpoints.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Grid1D:
    """1D uniform grid on [x0, x1] with nx cells (nx+1 nodes)."""

    nx: int
    x0: float = 0.0
    x1: float = 1.0

    @property
    def dx(self) -> float:
        return (self.x1 - self.x0) / self.nx

    def nodes(self, dtype=None):
        """nx+1 node coordinates, including both boundaries."""
        return jnp.linspace(self.x0, self.x1, self.nx + 1, dtype=dtype)

    def centers(self, dtype=None):
        """nx cell-centre coordinates x0 + (i-1/2)dx, i=1..nx.
        dtype=None follows the ambient default like nodes() (a hardcoded
        fp32 fallback silently downgraded fp64 parity runs)."""
        dx = self.dx
        return self.x0 + dx / 2 + dx * jnp.arange(self.nx, dtype=dtype)


@dataclasses.dataclass(frozen=True)
class Grid2D:
    """2D uniform grid on [x0,x1]x[y0,y1] with nx*ny cells ((nx+1)*(ny+1) nodes)."""

    nx: int
    ny: int
    x0: float = 0.0
    x1: float = 1.0
    y0: float = 0.0
    y1: float = 1.0

    @property
    def dx(self) -> float:
        return (self.x1 - self.x0) / self.nx

    @property
    def dy(self) -> float:
        return (self.y1 - self.y0) / self.ny

    def nodes(self, dtype=None):
        """(x, y) 1D node coordinate arrays (nx+1 and ny+1 points)."""
        x = jnp.linspace(self.x0, self.x1, self.nx + 1, dtype=dtype)
        y = jnp.linspace(self.y0, self.y1, self.ny + 1, dtype=dtype)
        return x, y

    def mesh(self, dtype=None, indexing: str = "ij"):
        """(X, Y) meshgrid over the nodes, 'ij' indexing (rows = x)."""
        x, y = self.nodes(dtype)
        return jnp.meshgrid(x, y, indexing=indexing)

    def periodic_nodes(self, dtype=None):
        """First nx / ny nodes only (periodic wrap: x_nx == x_0)."""
        x, y = self.nodes(dtype)
        return x[: self.nx], y[: self.ny]

    def coarsen(self) -> "Grid2D":
        """Next-coarser multigrid level (half the cells per dimension)."""
        assert self.nx % 2 == 0 and self.ny % 2 == 0, "grid not coarsenable"
        return dataclasses.replace(self, nx=self.nx // 2, ny=self.ny // 2)
