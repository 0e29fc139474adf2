"""Flow diagnostics for the periodic 2D solvers (beyond the reference,
which only writes raw fields): kinetic-energy spectrum E(k), integral
invariants (energy, enstrophy, palinstrophy), and their viscous decay
rates — the standard quantities for 2D-turbulence studies like the
vortex merger (reference ch. 19-22 problems).

All device-resident jnp; the radial binning is a one-hot matmul (no
scatters — TPU rule)."""
from __future__ import annotations

import jax.numpy as jnp


def _wavenumber_grid(nx: int, ny: int):
    """Integer wavenumber magnitudes on the rfft2 half grid (nx, ny//2+1)
    and the multiplicity weights that make half-spectrum sums equal full
    ones (interior columns count twice)."""
    kx = jnp.where(jnp.arange(nx) < nx // 2, jnp.arange(nx),
                   jnp.arange(nx) - nx)[:, None]
    ky = jnp.arange(ny // 2 + 1)[None, :]
    ftype = jnp.zeros(()).dtype            # follows the x64 config
    kmag = jnp.sqrt(kx.astype(ftype) ** 2 + ky.astype(ftype) ** 2)
    w = jnp.where((ky == 0) | ((ny % 2 == 0) & (ky == ny // 2)), 1.0, 2.0)
    return kmag, jnp.broadcast_to(w, kmag.shape)


def energy_spectrum(w, packed: bool = False):
    """Radially binned kinetic-energy spectrum E(k) of a periodic 2D
    vorticity field w (nx, ny): E(k) = sum_{|k'| in [k-1/2,k+1/2)}
    |w_hat|^2 / (2 |k'|^2) with Parseval normalization 1/(nx ny)^2.

    Returns (k_bins, E) with k_bins = 1..min(nx,ny)//2.  packed=True
    takes the real-packed (2, nx, ny//2+1) half spectrum instead of the
    physical field (the solver state — no extra transform)."""
    if packed:
        H = w[0] + 1j * w[1]
        nx, hy = H.shape
        ny = 2 * (hy - 1)
    else:
        nx, ny = w.shape
        H = jnp.fft.rfft2(w)
    kmag, mult = _wavenumber_grid(nx, ny)
    k2 = jnp.maximum(kmag**2, 1e-12)
    dens = mult * jnp.abs(H) ** 2 / (2.0 * k2) / (nx * ny) ** 2
    nbins = min(nx, ny) // 2
    kb = jnp.arange(1, nbins + 1)
    onehot = (jnp.round(kmag)[None, :, :]
              == kb[:, None, None]).astype(dens.dtype)
    return kb, jnp.einsum("kij,ij->k", onehot, dens)


def invariants(w, dx: float, dy: float):
    """(energy, enstrophy, palinstrophy) integrals of a periodic 2D
    vorticity field: E = 1/2 int |u|^2, Z = 1/2 int w^2,
    P = 1/2 int |grad w|^2.  For decaying 2D NS: dE/dt = -2 nu Z,
    dZ/dt = -2 nu P (the enstrophy-budget identity used as a solver
    diagnostic)."""
    nx, ny = w.shape
    H = jnp.fft.rfft2(w)
    kmag, mult = _wavenumber_grid(nx, ny)
    k2 = jnp.maximum(kmag**2, 1e-12)
    mult = jnp.where(kmag == 0, 0.0, mult)   # gauge: mean mode carries
                                             # no velocity/enstrophy
    area = (nx * dx) * (ny * dy)
    cell = area / (nx * ny) ** 2
    # spectral integrals (exact for band-limited fields)
    scale_x = 2.0 * jnp.pi / (nx * dx)   # physical wavenumber spacing
    k2phys = k2 * scale_x**2             # isotropic grids (dx == dy)
    e = 0.5 * jnp.sum(mult * jnp.abs(H) ** 2 / k2phys) * cell
    z = 0.5 * jnp.sum(mult * jnp.abs(H) ** 2) * cell
    p = 0.5 * jnp.sum(mult * k2phys * jnp.abs(H) ** 2) * cell
    return e, z, p
