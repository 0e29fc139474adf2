"""Odd / rectangular / non-power-of-two grid sizes across the solver
families — the size class a `run --sweep nx=...` user actually hits, and
where the anisotropic-MG crash (review repro, 20x16) lived.  A compact
always-on subset of the wider fuzz run during round 4 (all clean):
DST impls at 12 odd lengths vs scipy, poisson/cavity/burgers/vortex at
odd and rectangular sizes."""
import numpy as np
import pytest


def test_cavity_rectangular_and_odd():
    from cfd_julia_tpu.models import cavity

    for nx, ny, po in ((32, 48, "fst"), (33, 33, "fst_half_mxu"),
                       (40, 24, "matmul")):
        cfg = cavity.CavityConfig(nx=nx, ny=ny, dt=1e-3, t_final=0.01,
                                  poisson=po)
        res = cavity.solve(cfg)
        assert np.isfinite(np.asarray(res.s)).all(), (nx, ny, po)


def test_poisson_iterative_rectangular():
    from cfd_julia_tpu.models import poisson2d

    for nx, ny, solver in ((33, 65, "fst"), (50, 30, "mgcg"),
                           (21, 21, "cg")):
        cfg = poisson2d.PoissonConfig(nx=nx, ny=ny, solver=solver,
                                      problem="poly", tol=1e-6,
                                      max_iter=200_000)
        res = poisson2d.solve(cfg)
        assert np.isfinite(float(res.l2_error)), (nx, ny, solver)


def test_vortex_odd_grids():
    """ps23/hybrid/fdm support odd grids (Nyquist guards); ps32's
    3/2-rule block moves cannot and must reject loudly."""
    from cfd_julia_tpu.models import vortex

    for solver in ("ps23", "hybrid", "fdm"):
        cfg = vortex.VortexConfig(nx=33, ny=33, solver=solver, dt=1e-3,
                                  t_final=0.01, ns=1)
        res = vortex.solve(cfg)
        assert np.isfinite(np.asarray(res.w)).all(), solver
    with pytest.raises(ValueError, match="even grid"):
        vortex.solve(vortex.VortexConfig(nx=33, ny=33, solver="ps32",
                                         dt=1e-3, t_final=0.01, ns=1))


def test_burgers_odd_nx():
    from cfd_julia_tpu.models import burgers1d

    for solver, bc in (("weno", "periodic"), ("crweno", "dirichlet"),
                       ("flux_split", "periodic")):
        cfg = burgers1d.BurgersConfig(nx=101, solver=solver, bc=bc,
                                      dt=1e-4, t_final=0.01, ns=1)
        res = burgers1d.solve(cfg)
        assert np.isfinite(np.asarray(res.u)).all(), solver
