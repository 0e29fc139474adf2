"""Burgers solvers: smooth-regime accuracy vs the characteristics solution,
cross-solver consistency, and shock sanity (reference ch. 05-08).

The reference validates Burgers only by eyeball plots and convergence-order
studies (06_.../order.jl); here the pre-shock solution u = sin(2 pi (x-ut))
(fixed-point of the characteristics relation, valid for t < 1/(2 pi)) gives
a quantitative golden target.
"""
import numpy as np
import pytest

from cfd_julia_tpu.models import burgers1d


def exact_smooth(x, t, iters=60):
    """Solve u = sin(2 pi (x - u t)) by fixed-point iteration (pre-shock)."""
    u = np.sin(2 * np.pi * x)
    for _ in range(iters):
        u = np.sin(2 * np.pi * (x - u * t))
    return u


SMOOTH_T = 0.1  # shock forms at t = 1/(2 pi) ~ 0.159


@pytest.mark.parametrize(
    "solver,bc,tol",
    [
        ("weno", "periodic", 2e-4),
        ("crweno", "periodic", 2e-4),
        ("weno", "dirichlet", 2e-4),
        ("crweno", "dirichlet", 2e-4),
        # flux_split carries the reference scheme's own O(dx) error from the
        # non-smooth 5-point local-max wavespeed (verified bit-parity with a
        # literal port of burgers_flux_splitting.jl rhs: diff ~3e-13)
        ("flux_split", "periodic", 2.5e-2),
        ("rusanov", "periodic", 5e-4),
        ("central", "dirichlet", 5e-3),
    ],
)
def test_smooth_accuracy(solver, bc, tol):
    cfg = burgers1d.BurgersConfig(
        nx=128, solver=solver, bc=bc, dt=1e-4, t_final=SMOOTH_T, ns=1
    )
    res = burgers1d.solve(cfg)
    ue = exact_smooth(np.asarray(res.x), SMOOTH_T)
    err = np.abs(np.asarray(res.u) - ue).max()
    assert err < tol, (solver, bc, err)


@pytest.mark.parametrize("solver,bc", [("weno", "periodic"), ("rusanov", "periodic")])
def test_shock_sanity(solver, bc):
    """Past shock formation (reference final time t=.25): the solution must
    stay bounded by the IC range and keep the N-wave shape (no oscillation
    blow-up)."""
    cfg = burgers1d.BurgersConfig(nx=200, solver=solver, bc=bc, t_final=0.25)
    res = burgers1d.solve(cfg)
    u = np.asarray(res.u)
    assert np.all(np.isfinite(u))
    assert np.abs(u).max() < 1.05
    # total variation of the N-wave stays close to the IC's TV (= 4 for
    # one sine period with a single shock, less after decay)
    tv = np.abs(np.diff(u, append=u[:1])).sum()
    assert tv < 4.2


def test_weno_crweno_agree_at_shock_time():
    a = burgers1d.solve(
        burgers1d.BurgersConfig(nx=200, solver="weno", bc="dirichlet", t_final=0.25)
    ).u
    b = burgers1d.solve(
        burgers1d.BurgersConfig(nx=200, solver="crweno", bc="dirichlet", t_final=0.25)
    ).u
    # agreement away from the shock cell at x=0.5 (node 100 +- 2)
    a, b = np.asarray(a), np.asarray(b)
    mask = np.ones_like(a, dtype=bool)
    mask[98:103] = False
    assert np.abs((a - b)[mask]).max() < 5e-3


def test_weno_convergence_order():
    """Grid-pair observed order on the smooth solution (methodology of
    06_.../order.jl:53-75). WENO-5 should exceed 3rd order here."""
    errs = []
    for nx in (64, 128, 256):
        cfg = burgers1d.BurgersConfig(
            nx=nx, solver="weno", bc="periodic", dt=5e-5, t_final=0.05, ns=1
        )
        res = burgers1d.solve(cfg)
        ue = exact_smooth(np.asarray(res.x), 0.05)
        errs.append(np.sqrt(np.mean((np.asarray(res.u) - ue) ** 2)))
    p1 = np.log(errs[0] / errs[1]) / np.log(2)
    p2 = np.log(errs[1] / errs[2]) / np.log(2)
    assert p1 > 3.0 and p2 > 3.0, (errs, p1, p2)


def test_snapshots_shape():
    cfg = burgers1d.BurgersConfig(nx=100, solver="weno", bc="periodic")
    res = burgers1d.solve(cfg)
    assert res.snapshots.shape == (cfg.ns + 1, cfg.nx)
