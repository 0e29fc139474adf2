"""1D heat equation: error norms vs the exact solution (reference ch. 01-04).

The reference validates each scheme against u(x,t) = -exp(-t) sin(pi x)
(ftcs.jl:26,43-52). Golden L2 errors at the reference resolution (nx=80,
dt=.0025, t=1), verified against an independent numpy implementation:
FTCS 1.928e-4, RK3 1.346e-4, CN 1.344e-4, ICP 1.054e-7 (4th order).
"""
import numpy as np
import pytest

from cfd_julia_tpu.models import heat1d


@pytest.mark.parametrize(
    "scheme,l2_tol",
    [("ftcs", 2.1e-4), ("rk3", 1.5e-4), ("cn", 1.5e-4), ("icp", 2e-7)],
)
def test_reference_resolution_error(scheme, l2_tol):
    cfg = heat1d.HeatConfig(scheme=scheme)
    res = heat1d.solve(cfg)
    assert float(res.l2_error) < l2_tol, float(res.l2_error)
    assert float(res.linf_error) < 10 * l2_tol


def test_ftcs_matches_rk3():
    """Both explicit schemes integrate the same ODE system; solutions agree
    closely at this resolution."""
    u1 = heat1d.solve(heat1d.HeatConfig(scheme="ftcs")).u
    u2 = heat1d.solve(heat1d.HeatConfig(scheme="rk3")).u
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), atol=6e-4)


@pytest.mark.parametrize("scheme,order,floor", [("cn", 2.0, 0.2), ("icp", 4.0, 0.4)])
def test_convergence_order(scheme, order, floor):
    """Spatial convergence order via grid-pair error ratios (the reference's
    order-study methodology, 06_.../order.jl:53-75). dt shrunk with dx^2 so
    time error does not pollute the spatial order."""
    errs = []
    for nx, dt in [(20, 4e-4), (40, 1e-4), (80, 2.5e-5)]:
        cfg = heat1d.HeatConfig(nx=nx, dt=dt, t_final=0.1, scheme=scheme)
        errs.append(float(heat1d.solve(cfg).l2_error))
    p1 = np.log(errs[0] / errs[1]) / np.log(2.0)
    p2 = np.log(errs[1] / errs[2]) / np.log(2.0)
    assert p1 > order - floor, (errs, p1)
    assert p2 > order - floor, (errs, p2)


def test_tridiag_methods_agree():
    a = heat1d.solve(heat1d.HeatConfig(scheme="cn", tridiag_method="pcr")).u
    b = heat1d.solve(heat1d.HeatConfig(scheme="cn", tridiag_method="thomas")).u
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)
