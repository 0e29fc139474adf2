"""2D Poisson problem definitions + unified solver front-end
(reference ch. 12-17).

Manufactured problems (exact solutions for validation):
* ``sine32``  ue = sin(2 pi x) sin(2 pi y) + (1/256) sin(32 pi x) sin(32 pi y)
              (km=16 in fft_p.jl:67-82; also the FST chapter fft_d.jl:46-63).
              Periodic AND homogeneous-Dirichlet compatible.
* ``poly``    ue = (x^2-1)(y^2-1), f = -2(2-x^2-y^2): the ipr=1 problem of
              the iterative chapters (gauss_seidel.jl:96-111), inhomogeneous
              Dirichlet boundaries taken from ue.
* ``sine16``  ue = sin(2 pi x) sin(2 pi y) + (1/256) sin(16 pi x) sin(16 pi y)
              (ipr=2, gauss_seidel.jl:97-109).

Solvers: fft (FDM eigenvalues), fft_spectral, fst (DST-I), jacobi
(= reference ch. 15 "gauss_seidel"), redblack (true parallel GS), cg,
multigrid (N-level V-cycle).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from cfd_julia_tpu.core import precision
from cfd_julia_tpu.ops import norms
from cfd_julia_tpu.poisson import direct, iterative, multigrid


@dataclasses.dataclass(frozen=True)
class PoissonConfig:
    nx: int = 128
    ny: int = 128
    solver: str = "fft"      # fft | fft_spectral | fst | jacobi | redblack | cg | multigrid | mgcg
    problem: str = "sine32"  # sine32 | poly | sine16
    tol: float = 1e-9
    max_iter: int = 100_000
    freq: int = 100
    mg: multigrid.MGConfig = multigrid.MGConfig()

    @property
    def dx(self) -> float:
        return 1.0 / self.nx

    @property
    def dy(self) -> float:
        return 1.0 / self.ny


@dataclasses.dataclass
class PoissonResult:
    x: jnp.ndarray
    y: jnp.ndarray
    u: jnp.ndarray
    u_exact: jnp.ndarray
    f: jnp.ndarray
    l2_error: jnp.ndarray
    linf_error: jnp.ndarray
    iterations: object = None
    history: object = None
    rms: object = None
    rms0: object = None


def build_problem(cfg: PoissonConfig, dtype):
    x = jnp.linspace(0.0, 1.0, cfg.nx + 1, dtype=dtype)
    y = jnp.linspace(0.0, 1.0, cfg.ny + 1, dtype=dtype)
    X, Y = jnp.meshgrid(x, y, indexing="ij")
    pi = jnp.pi
    if cfg.problem == "sine32":
        km = 16.0
        c1 = (1.0 / km) ** 2
        c2 = -8.0 * pi**2
        ue = jnp.sin(2 * pi * X) * jnp.sin(2 * pi * Y) + c1 * jnp.sin(
            km * 2 * pi * X
        ) * jnp.sin(km * 2 * pi * Y)
        f = c2 * jnp.sin(2 * pi * X) * jnp.sin(2 * pi * Y) + c2 * jnp.sin(
            km * 2 * pi * X
        ) * jnp.sin(km * 2 * pi * Y)
    elif cfg.problem == "poly":
        ue = (X**2 - 1.0) * (Y**2 - 1.0)
        f = -2.0 * (2.0 - X**2 - Y**2)
    elif cfg.problem == "sine16":
        c1 = (1.0 / 16.0) ** 2
        c2 = -2.0 * pi**2
        ue = jnp.sin(2 * pi * X) * jnp.sin(2 * pi * Y) + c1 * jnp.sin(
            16 * pi * X
        ) * jnp.sin(16 * pi * Y)
        f = 4 * c2 * jnp.sin(2 * pi * X) * jnp.sin(2 * pi * Y) + c2 * jnp.sin(
            16 * pi * X
        ) * jnp.sin(16 * pi * Y)
    else:
        raise ValueError(f"unknown problem {cfg.problem!r}")
    return x, y, X, Y, ue, f


def solve(cfg: PoissonConfig, dtype=None) -> PoissonResult:
    dtype = dtype or precision.default_dtype()
    x, y, X, Y, ue, f = build_problem(cfg, dtype)
    it_res = None

    if cfg.solver in ("fft", "fft_spectral"):
        eigen = "fdm" if cfg.solver == "fft" else "spectral"
        u = direct.solve_fft(f, cfg.dx, cfg.dy, eigen=eigen)
        # gauge: periodic solves are defined up to a constant; the reference
        # MMS has zero mean so the zero-mean solve matches ue directly
    elif cfg.solver == "fst":
        u = direct.solve_fst(f, cfg.dx, cfg.dy)
    elif cfg.solver in ("jacobi", "redblack"):
        u0 = _dirichlet_init(ue)
        it_res = iterative.relax_solve(
            f, u0, cfg.dx, cfg.dy, tol=cfg.tol, max_iter=cfg.max_iter,
            freq=cfg.freq, method=cfg.solver,
        )
        u = it_res.u
    elif cfg.solver == "cg":
        u0 = _dirichlet_init(ue)
        it_res = iterative.cg_solve(
            f, u0, cfg.dx, cfg.dy, tol=cfg.tol, max_iter=cfg.max_iter,
            freq=cfg.freq,
        )
        u = it_res.u
    elif cfg.solver == "multigrid":
        u0 = _dirichlet_init(ue)
        it_res = multigrid.solve(f, u0, cfg.dx, cfg.dy, cfg=cfg.mg)
        u = it_res.u
    elif cfg.solver == "mgcg":
        # beyond the reference: V-cycle-preconditioned flexible CG
        u0 = _dirichlet_init(ue)
        it_res = iterative.mgcg_solve(
            f, u0, cfg.dx, cfg.dy, tol=cfg.tol,
            max_iter=cfg.max_iter, mg_cfg=cfg.mg,
        )
        u = it_res.u
    else:
        raise ValueError(f"unknown solver {cfg.solver!r}")

    err = u - ue
    res = PoissonResult(
        x=x, y=y, u=u, u_exact=ue, f=f,
        l2_error=norms.l2norm_interior(err),
        linf_error=norms.linf(err),
    )
    if it_res is not None:
        res.iterations = it_res.iterations
        res.history = it_res.history
        res.rms = it_res.rms
        res.rms0 = it_res.rms0
    return res


def _dirichlet_init(ue):
    """Zero interior, exact boundary values (gauss_seidel.jl:113-119)."""
    u0 = jnp.zeros_like(ue)
    u0 = u0.at[0, :].set(ue[0, :]).at[-1, :].set(ue[-1, :])
    u0 = u0.at[:, 0].set(ue[:, 0]).at[:, -1].set(ue[:, -1])
    return u0
