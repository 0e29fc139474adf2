"""Spectral diagnostics (utils.diagnostics) against analytic fields."""
import jax.numpy as jnp
import numpy as np

from cfd_julia_tpu.utils import diagnostics


def _tgv(n, k):
    x = jnp.arange(n) * (2 * jnp.pi / n)
    X, Y = jnp.meshgrid(x, x, indexing="ij")
    return 2.0 * k * jnp.cos(k * X) * jnp.cos(k * Y)


def test_energy_spectrum_peaks_at_tgv_mode():
    """w = 2k cos(kx)cos(ky) lives entirely at |k'| = k sqrt(2)."""
    n, k = 64, 4
    kb, E = diagnostics.energy_spectrum(_tgv(n, k))
    E = np.asarray(E)
    peak = int(np.asarray(kb)[np.argmax(E)])
    assert peak == round(k * np.sqrt(2.0))
    assert E.max() > 0.999 * E.sum()         # single-mode field


def test_energy_spectrum_packed_matches_field():
    from cfd_julia_tpu.models import vortex
    from cfd_julia_tpu.ops import spectral

    cfg = vortex.VortexConfig(nx=64, ny=64)
    w = vortex.initial_vorticity(cfg, jnp.float64)
    _, Ef = diagnostics.energy_spectrum(w)
    h = spectral.pack_c(jnp.fft.rfft2(w))
    _, Ep = diagnostics.energy_spectrum(h, packed=True)
    np.testing.assert_allclose(np.asarray(Ep), np.asarray(Ef),
                               rtol=1e-12, atol=1e-18)


def test_invariants_analytic_tgv():
    """TGV: w = 2k cos kx cos ky on [0,2pi]^2 has Z = (1/2)int w^2 =
    (2k)^2 pi^2, P = k^2 * 2Z... verified against quadrature, and the
    enstrophy-budget identity dZ/dt = -2 nu P against the analytic
    decay rate d/dt[e^{-4 nu k^2 t}] scaling."""
    n, k = 128, 4
    w = _tgv(n, k)
    dx = 2 * np.pi / n
    e, z, p = (float(v) for v in diagnostics.invariants(w, dx, dx))
    w_np = np.asarray(w)
    z_quad = 0.5 * (w_np**2).sum() * dx * dx
    np.testing.assert_allclose(z, z_quad, rtol=1e-10)
    # single mode |k'|^2 = 2k^2: P = 2k^2 Z exactly, E = Z/(2k^2)
    np.testing.assert_allclose(p, 2 * k**2 * z, rtol=1e-10)
    np.testing.assert_allclose(e, z / (2 * k**2), rtol=1e-10)


def test_invariants_anisotropic_domain():
    """Non-square domain (Lx = 2pi, Ly = 4pi): w = sin(2 ky y) with
    physical wavenumber ky = 2pi m / Ly must give P = ky^2 * 2Z... i.e.
    per-axis wavenumber scaling (regression for the single-scale bug:
    using 2pi/(nx dx) for both axes was wrong whenever nx dx != ny dy)."""
    nx, ny, m = 64, 64, 3
    dx = 2 * np.pi / nx          # Lx = 2 pi
    dy = 4 * np.pi / ny          # Ly = 4 pi
    ky = 2 * np.pi * m / (ny * dy)
    y = jnp.arange(ny) * dy
    w = jnp.broadcast_to(jnp.sin(ky * y)[None, :], (nx, ny))
    e, z, p = (float(v) for v in diagnostics.invariants(w, dx, dy))
    w_np = np.asarray(w)
    z_quad = 0.5 * (w_np**2).sum() * dx * dy
    np.testing.assert_allclose(z, z_quad, rtol=1e-10)
    np.testing.assert_allclose(p, ky**2 * z, rtol=1e-10)
    np.testing.assert_allclose(e, z / ky**2, rtol=1e-10)


def test_enstrophy_budget_matches_solver_decay():
    """dZ/dt from the ps23 solver over a short window matches -2 nu P to
    leading order (the 2D enstrophy budget)."""
    import jax
    from cfd_julia_tpu.models import vortex
    from cfd_julia_tpu.stepping import loop

    cfg = vortex.VortexConfig(nx=64, ny=64, solver="ps23", dt=1e-3,
                              re=100.0, ic="tgv")
    step = vortex.make_spectral_step_half_packed(cfg, jnp.float64)
    h0 = jax.jit(vortex.half_init_packed)(
        vortex.initial_vorticity(cfg, jnp.float64))
    n_steps = 10
    hf = jax.jit(lambda h: loop.run_steps(step, h, n_steps))(h0)
    w0 = vortex.half_decode_packed(h0, cfg.ny, jnp.float64)
    wf = vortex.half_decode_packed(hf, cfg.ny, jnp.float64)
    _, z0, p0 = diagnostics.invariants(w0, cfg.dx, cfg.dy)
    _, zf, _ = diagnostics.invariants(wf, cfg.dx, cfg.dy)
    dz_dt = (float(zf) - float(z0)) / (n_steps * cfg.dt)
    nu = 1.0 / cfg.re
    np.testing.assert_allclose(dz_dt, -2.0 * nu * float(p0), rtol=1e-2)
