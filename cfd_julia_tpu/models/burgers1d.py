"""1D inviscid Burgers equation u_t + u u_x = 0 (reference ch. 05-08).

Five solver variants, all SSP-RK3 in time, IC u0 = sin(2 pi x) on [0,1]:

* ``weno``        non-conservative upwind form, WENO-5 reconstruction;
                  Dirichlet (extrapolated ghosts) or periodic BCs
                  (05_.../weno_dirichlet.jl, weno_periodic.jl)
* ``crweno``      same form with compact CRWENO-5 (tridiagonal) recon;
                  Dirichlet or periodic (06_.../crweno_*.jl)
* ``central``     2nd-order central difference baseline (05_.../weno_trial.jl)
* ``flux_split``  conservative Lax-Friedrichs flux splitting on cell centres,
                  f+- = (f +- ps u)/2 with 5-point local max wavespeed,
                  periodic (07_.../burgers_flux_splitting.jl)
* ``rusanov``     conservative Riemann form: WENO state reconstruction +
                  Rusanov interface flux, cell-centred periodic
                  (08_.../burgers_riemann.jl)

Reference run configs: node solvers nx in {100..1600}, dt=1e-4, t=0.25,
ns=10 snapshots; flux_split nx=150; rusanov nx=200.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from cfd_julia_tpu.core import precision
from cfd_julia_tpu.ops import crweno, weno
from cfd_julia_tpu.ops.stencil import shift
from cfd_julia_tpu.stepping import loop, ssprk3


@dataclasses.dataclass(frozen=True)
class BurgersConfig:
    nx: int = 200
    solver: str = "weno"        # weno | crweno | central | flux_split | rusanov
    bc: str = "periodic"        # dirichlet | periodic (node solvers only)
    dt: float = 1e-4
    t_final: float = 0.25
    ns: int = 10                # number of snapshots
    tridiag_method: str = "pcr"

    @property
    def dx(self) -> float:
        return 1.0 / self.nx

    @property
    def nt(self) -> int:
        return round(self.t_final / self.dt)


@dataclasses.dataclass
class BurgersResult:
    x: jnp.ndarray
    u: jnp.ndarray          # final field
    snapshots: jnp.ndarray  # (ns+1, n) including the IC


# ------------------------------------------------------- non-conservative

def _rhs_upwind_dirichlet(u, dx, recon_l, recon_r):
    """r_i = -u_i * one-sided WENO derivative, interior nodes only
    (weno_dirichlet.jl:62-70). u: (N+1,) nodes."""
    uL = recon_l(u)   # (N,) at x_{j+1/2} centred u_j
    uR = recon_r(u)   # (N,) at x_{j+1/2} centred u_{j+1}
    ui = u[1:-1]
    dpos = (uL[1:] - uL[:-1]) / dx
    dneg = (uR[1:] - uR[:-1]) / dx
    r = -ui * jnp.where(ui >= 0.0, dpos, dneg)
    z = jnp.zeros_like(u[:1])
    return jnp.concatenate([z, r, z])


def _rhs_upwind_periodic(u, dx, recon_l, recon_r):
    """Periodic upwind form (weno_periodic.jl:58-68). u: (n,) unique nodes.
    uL[j] at x_{j+1/2} centred u_j; uR[j] at x_{j-1/2} centred u_j."""
    uL = recon_l(u)
    uR = recon_r(u)
    dpos = (uL - shift(uL, -1)) / dx          # uL_j - uL_{j-1}
    dneg = (shift(uR, 1) - uR) / dx           # uR_{j+1} - uR_j
    return -u * jnp.where(u >= 0.0, dpos, dneg)


def _rhs_central(u, dx):
    """Central-difference baseline (weno_trial.jl:62-67), Dirichlet nodes."""
    r = -u[1:-1] * (u[2:] - u[:-2]) / (2.0 * dx)
    z = jnp.zeros_like(u[:1])
    return jnp.concatenate([z, r, z])


# ----------------------------------------------------------- conservative

def _rhs_flux_split(u, dx):
    """Lax-Friedrichs flux splitting on periodic cell centres
    (burgers_flux_splitting.jl:63-103).

    ps_i = max |u| over the 5-point neighbourhood; f+- = (f +- ps u)/2;
    F+ at x_{i+1/2} by upwind WENO on f+ (centred u_i), F- at x_{i+1/2} by
    downwind WENO on f- (centred u_{i+1})."""
    f = 0.5 * u * u
    ps = jnp.maximum(
        jnp.maximum(jnp.abs(shift(u, -2)), jnp.abs(shift(u, -1))),
        jnp.maximum(
            jnp.abs(u),
            jnp.maximum(jnp.abs(shift(u, 1)), jnp.abs(shift(u, 2))),
        ),
    )
    fP = 0.5 * (f + ps * u)
    fN = 0.5 * (f - ps * u)
    fL = weno.reconstruct_left(fP, "periodic")       # F+_{i+1/2}
    fR = shift(weno.reconstruct_right(fN, "periodic"), 1)  # F-_{i+1/2}
    return -(fL - shift(fL, -1)) / dx - (fR - shift(fR, -1)) / dx


def _rhs_rusanov(u, dx):
    """Riemann form: WENO states + Rusanov flux on periodic cell centres
    (burgers_riemann.jl:66-97)."""
    uL = weno.reconstruct_left(u, "periodic")        # state at x_{i+1/2}-
    uR = shift(weno.reconstruct_right(u, "periodic"), 1)  # state at x_{i+1/2}+
    fL = 0.5 * uL * uL
    fR = 0.5 * uR * uR
    ps = jnp.maximum(jnp.abs(u), jnp.abs(shift(u, 1)))  # max over both cells
    flux = 0.5 * (fL + fR) - 0.5 * ps * (uR - uL)       # F_{i+1/2}
    return -(flux - shift(flux, -1)) / dx


# ----------------------------------------------------------------- driver

def make_rhs(cfg: BurgersConfig):
    dx = cfg.dx
    m = cfg.tridiag_method
    if cfg.solver == "central":
        if cfg.bc != "dirichlet":
            # _rhs_central is the Dirichlet weno_trial.jl baseline
            # (boundary rhs pinned to 0 on nx+1 nodes); running it under
            # the default bc="periodic" silently integrated the wrong
            # problem instead of rejecting
            raise ValueError("solver='central' supports bc='dirichlet' "
                             "only (05_.../weno_trial.jl)")
        return lambda u: _rhs_central(u, dx)
    if cfg.solver == "flux_split":
        return lambda u: _rhs_flux_split(u, dx)
    if cfg.solver == "rusanov":
        return lambda u: _rhs_rusanov(u, dx)
    if cfg.solver == "weno":
        if cfg.bc == "dirichlet":
            rl = lambda u: weno.reconstruct_left(u, "extrapolate")
            rr = lambda u: weno.reconstruct_right(u, "extrapolate")
            return lambda u: _rhs_upwind_dirichlet(u, dx, rl, rr)
        rl = lambda u: weno.reconstruct_left(u, "periodic")
        rr = lambda u: weno.reconstruct_right(u, "periodic")
        return lambda u: _rhs_upwind_periodic(u, dx, rl, rr)
    if cfg.solver == "crweno":
        if cfg.bc == "dirichlet":
            rl = lambda u: crweno.reconstruct_dirichlet_L(u, method=m)
            rr = lambda u: crweno.reconstruct_dirichlet_R(u, method=m)
            return lambda u: _rhs_upwind_dirichlet(u, dx, rl, rr)
        rl = lambda u: crweno.reconstruct_periodic(u, "L", method=m)
        rr = lambda u: crweno.reconstruct_periodic(u, "R", method=m)
        return lambda u: _rhs_upwind_periodic(u, dx, rl, rr)
    raise ValueError(f"unknown Burgers solver {cfg.solver!r}")


def grid_coords(cfg: BurgersConfig, dtype):
    if cfg.solver in ("flux_split", "rusanov"):
        # cell centres x_i = (i + 1/2) dx  (burgers_riemann.jl:28)
        return (jnp.arange(cfg.nx, dtype=dtype) + 0.5) * cfg.dx
    if cfg.bc == "periodic" and cfg.solver in ("weno", "crweno"):
        return jnp.arange(cfg.nx, dtype=dtype) * cfg.dx  # n unique nodes
    return jnp.linspace(0.0, 1.0, cfg.nx + 1, dtype=dtype)


def solve(cfg: BurgersConfig, dtype=None) -> BurgersResult:
    dtype = dtype or precision.default_dtype()
    x = grid_coords(cfg, dtype)
    u0 = jnp.sin(2 * jnp.pi * x)
    if cfg.solver in ("weno", "crweno", "central") and cfg.bc == "dirichlet":
        u0 = u0.at[0].set(0.0).at[-1].set(0.0)
    rhs = make_rhs(cfg)
    step = lambda u: ssprk3.ssprk3_step(rhs, u, cfg.dt)
    final, snaps = loop.run_steps_with_snapshots(
        step, u0, cfg.nt, max(1, cfg.nt // cfg.ns)
    )
    snapshots = jnp.concatenate([u0[None], snaps], axis=0)
    return BurgersResult(x=x, u=final, snapshots=snapshots)
