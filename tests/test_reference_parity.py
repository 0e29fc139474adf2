"""Bit-level parity against literal numpy ports of the reference kernels.

Each reference routine is re-implemented here as a direct 1-based->0-based
loop translation (from /root/reference, cited per test) and compared with
the framework's vectorized op on random data. These lock the index
conventions permanently.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from cfd_julia_tpu.models import cavity
from cfd_julia_tpu.ops import arakawa, spectral, weno
from cfd_julia_tpu.poisson import multigrid

RNG = np.random.default_rng(42)


def ref_wcL(v1, v2, v3, v4, v5, eps=1e-6):
    """Common.jl:292-314."""
    s1 = 13 / 12 * (v1 - 2 * v2 + v3) ** 2 + 0.25 * (v1 - 4 * v2 + 3 * v3) ** 2
    s2 = 13 / 12 * (v2 - 2 * v3 + v4) ** 2 + 0.25 * (v2 - v4) ** 2
    s3 = 13 / 12 * (v3 - 2 * v4 + v5) ** 2 + 0.25 * (3 * v3 - 4 * v4 + v5) ** 2
    c1, c2, c3 = 0.1 / (eps + s1) ** 2, 0.6 / (eps + s2) ** 2, 0.3 / (eps + s3) ** 2
    q1 = v1 / 3 - 7 / 6 * v2 + 11 / 6 * v3
    q2 = -v2 / 6 + 5 / 6 * v3 + v4 / 3
    q3 = v3 / 3 + 5 / 6 * v4 - v5 / 6
    return (c1 * q1 + c2 * q2 + c3 * q3) / (c1 + c2 + c3)


def ref_wcR(v1, v2, v3, v4, v5, eps=1e-6):
    """Common.jl:319-339."""
    s1 = 13 / 12 * (v1 - 2 * v2 + v3) ** 2 + 0.25 * (v1 - 4 * v2 + 3 * v3) ** 2
    s2 = 13 / 12 * (v2 - 2 * v3 + v4) ** 2 + 0.25 * (v2 - v4) ** 2
    s3 = 13 / 12 * (v3 - 2 * v4 + v5) ** 2 + 0.25 * (3 * v3 - 4 * v4 + v5) ** 2
    c1, c2, c3 = 0.3 / (eps + s1) ** 2, 0.6 / (eps + s2) ** 2, 0.1 / (eps + s3) ** 2
    q1 = -v1 / 6 + 5 / 6 * v2 + v3 / 3
    q2 = v2 / 3 + 5 / 6 * v3 - v4 / 6
    q3 = 11 / 6 * v3 - 7 / 6 * v4 + v5 / 3
    return (c1 * q1 + c2 * q2 + c3 * q3) / (c1 + c2 + c3)


def test_weno_weights():
    v = RNG.standard_normal((5, 100))
    np.testing.assert_allclose(
        np.asarray(weno.weno5_L(*map(jnp.asarray, v))),
        ref_wcL(*v), rtol=1e-13)
    np.testing.assert_allclose(
        np.asarray(weno.weno5_R(*map(jnp.asarray, v))),
        ref_wcR(*v), rtol=1e-13)


def test_weno_periodic_line():
    """wenoL/wenoR, Common.jl:400-509 — reference f[i] indexing shifted to
    the canonical layout: ref wenoL f[j] (0-based j=0..n) is centred on
    u_{j-1}, so f[j+1] == reconstruct_left(u)[j]."""
    n = 32
    u = RNG.standard_normal(n)
    fL_ref = np.array([
        ref_wcL(*[u[(j - 3 + k) % n] for k in range(5)]) for j in range(n + 1)
    ])
    fR_ref = np.array([
        ref_wcR(*[u[(j - 2 + k) % n] for k in range(5)]) for j in range(n + 1)
    ])
    uL = np.asarray(weno.reconstruct_left(jnp.asarray(u), "periodic"))
    uR = np.asarray(weno.reconstruct_right(jnp.asarray(u), "periodic"))
    np.testing.assert_allclose(uL, fL_ref[1:], rtol=1e-13)
    np.testing.assert_allclose(uR, fR_ref[:-1], rtol=1e-13)


def test_weno_mirror_euler():
    """wenoL_roe/wenoR_roe end stencils, Common.jl:516-629."""
    n = 16
    u = RNG.standard_normal(n)

    def gl(i):  # left mirror ghosts: u_{-k} = u_{k-1}
        return u[-i - 1] if i < 0 else (u[n - 1 - (i - n)] if i >= n else u[i])

    fL_ref, fR_ref = [], []
    for j in range(n + 1):
        fL_ref.append(ref_wcL(*[gl(j - 3 + k) for k in range(5)]))
        fR_ref.append(ref_wcR(*[gl(j - 2 + k) for k in range(5)]))
    uL = np.asarray(weno.reconstruct_left(jnp.asarray(u), "mirror"))
    uR = np.asarray(weno.reconstruct_right(jnp.asarray(u), "mirror"))
    np.testing.assert_allclose(uL, fL_ref, rtol=1e-12)
    np.testing.assert_allclose(uR, fR_ref, rtol=1e-12)


def test_arakawa_jacobian():
    """vm_rhs Arakawa terms, Common.jl:154-181 (periodic, literal loop)."""
    n = 12
    w = RNG.standard_normal((n, n))
    s = RNG.standard_normal((n, n))
    dx = dy = 2 * np.pi / n
    gg = 1 / (4 * dx * dy)
    jac_ref = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            ip, im = (i + 1) % n, (i - 1) % n
            jp, jm = (j + 1) % n, (j - 1) % n
            j1 = (w[ip, j] - w[im, j]) * (s[i, jp] - s[i, jm]) - (
                w[i, jp] - w[i, jm]) * (s[ip, j] - s[im, j])
            j2 = (w[ip, j] * (s[ip, jp] - s[ip, jm])
                  - w[im, j] * (s[im, jp] - s[im, jm])
                  - w[i, jp] * (s[ip, jp] - s[im, jp])
                  + w[i, jm] * (s[ip, jm] - s[im, jm]))
            j3 = (w[ip, jp] * (s[i, jp] - s[ip, j])
                  - w[im, jm] * (s[im, j] - s[i, jm])
                  - w[im, jp] * (s[i, jp] - s[im, j])
                  + w[ip, jm] * (s[ip, j] - s[i, jm]))
            jac_ref[i, j] = gg * (j1 + j2 + j3) / 3
    out = np.asarray(arakawa.jacobian(jnp.asarray(w), jnp.asarray(s), dx, dy))
    np.testing.assert_allclose(out, jac_ref, rtol=1e-12, atol=1e-13)


def test_restriction_prolongation():
    """Common.jl:21-76 literal loops vs the conv-based transfers."""
    nf = 16
    r = RNG.standard_normal((nf + 1, nf + 1))
    nc = nf // 2
    ec = np.zeros((nc + 1, nc + 1))
    for I in range(1, nc):
        for J in range(1, nc):
            c = 4 * r[2 * I, 2 * J]
            g = 2 * (r[2 * I, 2 * J + 1] + r[2 * I, 2 * J - 1]
                     + r[2 * I + 1, 2 * J] + r[2 * I - 1, 2 * J])
            k = (r[2 * I + 1, 2 * J + 1] + r[2 * I + 1, 2 * J - 1]
                 + r[2 * I - 1, 2 * J + 1] + r[2 * I - 1, 2 * J - 1])
            ec[I, J] = (c + g + k) / 16
    ec[0, :] = r[0, ::2]
    ec[-1, :] = r[-1, ::2]
    ec[:, 0] = r[::2, 0]
    ec[:, -1] = r[::2, -1]
    out = np.asarray(multigrid.restriction(jnp.asarray(r)))
    np.testing.assert_allclose(out, ec, rtol=1e-13, atol=1e-14)

    uc = RNG.standard_normal((nc + 1, nc + 1))
    ef = np.zeros((nf + 1, nf + 1))
    for I in range(nc):
        for J in range(nc):
            ef[2 * I, 2 * J] = uc[I, J]
            ef[2 * I, 2 * J + 1] = 0.5 * (uc[I, J] + uc[I, J + 1])
            ef[2 * I + 1, 2 * J] = 0.5 * (uc[I, J] + uc[I + 1, J])
            ef[2 * I + 1, 2 * J + 1] = 0.25 * (
                uc[I, J] + uc[I, J + 1] + uc[I + 1, J] + uc[I + 1, J + 1])
    for I in range(nc + 1):
        ef[2 * I, -1] = uc[I, -1]
    for J in range(nc + 1):
        ef[-1, 2 * J] = uc[-1, J]
    # odd boundary lines from the loops above already covered; fill the
    # remaining odd entries on the last row/col edges
    for J in range(nc):
        ef[-1, 2 * J + 1] = 0.5 * (uc[-1, J] + uc[-1, J + 1])
    for I in range(nc):
        ef[2 * I + 1, -1] = 0.5 * (uc[I, -1] + uc[I + 1, -1])
    out = np.asarray(multigrid.prolongation(jnp.asarray(uc)))
    np.testing.assert_allclose(out, ef, rtol=1e-13, atol=1e-14)


def test_fps_periodic_poisson():
    """fps, Common.jl:97-125 (literal port with FDM eigenvalues)."""
    n = 16
    dx = dy = 2 * np.pi / n
    f = RNG.standard_normal((n, n))
    aa = -2 / dx**2 - 2 / dy**2
    bb = 2 / dx**2
    cc = 2 / dy**2
    hx = 2 * np.pi / n
    kx = np.array([hx * i if i < n // 2 else hx * (i - n) for i in range(n)])
    kx[0] = 1e-6
    e = np.fft.fft2(f)
    e[0, 0] = 0
    den = aa + bb * np.cos(kx)[:, None] + cc * np.cos(kx)[None, :]
    ref = np.real(np.fft.ifft2(e / den))
    out = np.asarray(spectral.fft_poisson_periodic(jnp.asarray(f), dx, dy,
                                                   eigen="fdm"))
    np.testing.assert_allclose(out, ref, rtol=1e-11, atol=1e-12)


def test_cavity_wall_bc():
    """bc2, lid_driven_cavity.jl:39-51 (literal port)."""
    n = 12
    dx = dy = 1.0 / n
    w = RNG.standard_normal((n + 1, n + 1))
    s = RNG.standard_normal((n + 1, n + 1))
    ref = w.copy()
    for j in range(n + 1):
        ref[0, j] = (-4 * s[1, j] + 0.5 * s[2, j]) / dx**2
        ref[n, j] = (-4 * s[n - 1, j] + 0.5 * s[n - 2, j]) / dx**2
    for i in range(n + 1):
        ref[i, 0] = (-4 * s[i, 1] + 0.5 * s[i, 2]) / dy**2
        ref[i, n] = (-4 * s[i, n - 1] + 0.5 * s[i, n - 2]) / dy**2 - 3.0 / dy
    out = np.asarray(cavity.apply_wall_bc(jnp.asarray(w), jnp.asarray(s),
                                          dx, dy, 2))
    np.testing.assert_allclose(out, ref, rtol=1e-13, atol=1e-14)


def _bench_module(name):
    import importlib
    import pathlib
    import sys

    bench_dir = str(pathlib.Path(__file__).parent.parent / "benchmarks")
    if bench_dir not in sys.path:
        sys.path.insert(0, bench_dir)
    return importlib.import_module(name)


def test_numpy_cavity_port_matches_model():
    """The baseline-denominator port (benchmarks/reference_cavity_numpy.py,
    the measured stand-in for lid_driven_cavity.jl) computes the exact
    same trajectory as the JAX cavity model — so its measured steps/s is
    the reference algorithm's, not an approximation of it."""
    rcn = _bench_module("reference_cavity_numpy")

    import jax

    nx = 32
    cfg = cavity.CavityConfig(nx=nx, ny=nx, dt=1e-3)
    step = jax.jit(cavity.make_step_fn(cfg))
    st = (jnp.zeros((nx + 1, nx + 1)), jnp.zeros((nx + 1, nx + 1)),
          jnp.zeros(()))
    w = np.zeros((nx + 1, nx + 1))
    s = np.zeros_like(w)
    den = rcn.make_eigen_den(nx, nx, cfg.dx, cfg.dy)
    for _ in range(5):
        st = step(st)
        w, s = rcn.step(w, s, cfg.dx, cfg.dy, cfg.dt, cfg.re, den)
    np.testing.assert_allclose(np.asarray(st[0]), w, rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(st[1]), s, rtol=0, atol=1e-15)


def test_numpy_ps23_port_matches_model():
    """The ps23 baseline-denominator port (benchmarks/reference_ps23_numpy
    .py) computes the same trajectory as the JAX full-spectrum step —
    its measured steps/s is the reference algorithm's."""
    rp = _bench_module("reference_ps23_numpy")

    import jax

    from cfd_julia_tpu.models import vortex

    nx = 64
    cfg = vortex.VortexConfig(nx=nx, ny=nx, solver="ps23", dt=1e-2)
    w0 = vortex.initial_vorticity(cfg, jnp.float64)
    wf_j = spectral.zero_mean_mode(jnp.fft.fft2(w0.astype(jnp.complex128)))
    step_j = jax.jit(vortex.make_spectral_step(cfg, jnp.float64))
    consts = rp.make_consts(nx, nx, cfg.dx, cfg.dy)
    wf_n = np.asarray(wf_j)
    for _ in range(3):
        wf_j = step_j(wf_j)
        wf_n = rp.step(wf_n, consts, cfg.dt, cfg.re)
    scale = np.abs(wf_n).max()
    assert np.abs(np.asarray(wf_j) - wf_n).max() / scale < 1e-14


def test_c_cavity_stepper_matches_numpy_port():
    """The compiled-loop denominator (benchmarks/reference_cavity_c.py,
    C stencils + scipy DST) computes the exact same trajectory as the
    NumPy port — and hence, via test_numpy_cavity_port_matches_model,
    as the JAX model and the reference numerics."""
    rcn = _bench_module("reference_cavity_numpy")
    rcc = _bench_module("reference_cavity_c")

    nx = 32
    dx = dy = 1.0 / nx
    dt, re = 1e-3, 100.0
    den = rcn.make_eigen_den(nx, nx, dx, dy)
    step_c = rcc.make_stepper(nx, nx, dx, dy, dt, re, den)
    wc = np.zeros((nx + 1, nx + 1))
    sc = np.zeros_like(wc)
    wn = np.zeros_like(wc)
    sn = np.zeros_like(wc)
    for _ in range(5):
        wc, sc = step_c(wc, sc)
        wn, sn = rcn.step(wn, sn, dx, dy, dt, re, den)
    np.testing.assert_allclose(wc, wn, rtol=0, atol=1e-13)
    np.testing.assert_allclose(sc, sn, rtol=0, atol=1e-16)


def test_c_mg_kernels_match_loop_translations():
    """The C multigrid kernels (benchmarks/native/ref_kernels.c) against
    independent formulations: gs_sweep vs a literal in-place lexicographic
    loop (Common.jl:78-92 — update order matters), residual/restriction/
    prolongation vs vectorized NumPy (Common.jl:239-246, 21-48, 50-76)."""
    nk = _bench_module("native_kernels")

    n = 16
    dx = dy = 1.0 / n
    f = RNG.standard_normal((n + 1, n + 1))
    u = RNG.standard_normal((n + 1, n + 1))

    u_c = u.copy()
    nk.gs_sweep(u_c, f, dx, dy, 2)
    u_py = u.copy()
    den = 1.0 / (2.0 / dx**2 + 2.0 / dy**2)
    for _ in range(2):
        for i in range(1, n):
            for j in range(1, n):
                u_py[i, j] = ((u_py[i + 1, j] + u_py[i - 1, j]) / dx**2
                              + (u_py[i, j + 1] + u_py[i, j - 1]) / dy**2
                              - f[i, j]) * den
    np.testing.assert_allclose(u_c, u_py, rtol=1e-14, atol=0)

    r_c = np.zeros_like(u)
    nk.residual(u, f, r_c, dx, dy)
    lap = np.zeros_like(u)
    lap[1:-1, 1:-1] = ((u[2:, 1:-1] - 2 * u[1:-1, 1:-1] + u[:-2, 1:-1])
                       / dx**2
                       + (u[1:-1, 2:] - 2 * u[1:-1, 1:-1] + u[1:-1, :-2])
                       / dy**2)
    np.testing.assert_allclose(r_c[1:-1, 1:-1], (f - lap)[1:-1, 1:-1],
                               rtol=1e-13, atol=1e-14)

    rc = np.zeros((n // 2 + 1, n // 2 + 1))
    nk.restrict_fw(r_c, rc)
    rf = r_c
    expect = (4 * rf[2:-2:2, 2:-2:2]
              + 2 * (rf[3:-1:2, 2:-2:2] + rf[1:-3:2, 2:-2:2]
                     + rf[2:-2:2, 3:-1:2] + rf[2:-2:2, 1:-3:2])
              + rf[3:-1:2, 3:-1:2] + rf[1:-3:2, 1:-3:2]
              + rf[3:-1:2, 1:-3:2] + rf[1:-3:2, 3:-1:2]) / 16.0
    np.testing.assert_allclose(rc[1:-1, 1:-1], expect, rtol=1e-14, atol=0)

    ec = RNG.standard_normal((n // 2 + 1, n // 2 + 1))
    ec[0, :] = ec[-1, :] = ec[:, 0] = ec[:, -1] = 0.0   # error field BCs
    uf = RNG.standard_normal((n + 1, n + 1))
    uf_c = uf.copy()
    nk.prolong_correct(ec, uf_c)
    add = np.zeros_like(uf)
    add[0::2, 0::2] = ec
    add[1::2, 0::2] = 0.5 * (ec[:-1, :] + ec[1:, :])
    add[0::2, 1::2] = 0.5 * (ec[:, :-1] + ec[:, 1:])
    add[1::2, 1::2] = 0.25 * (ec[:-1, :-1] + ec[1:, :-1]
                              + ec[:-1, 1:] + ec[1:, 1:])
    np.testing.assert_allclose(uf_c, uf + add, rtol=1e-13, atol=1e-14)


def test_c_mg_vcycle_solves_exactly_representable_problem():
    """End-to-end V-cycle check: the ``poly`` exact solution is
    biquadratic, so the 5-point Laplacian has zero truncation error and
    the solve must reproduce ue to tolerance level (reference_mg_c.py,
    mirroring mg_N.jl:53-106)."""
    rmc = _bench_module("reference_mg_c")

    nx = 128
    ue, f, u0 = rmc.build_poly(nx)
    u, cycles, hist = rmc.solve(nx, f, u0, tol=1e-9)
    assert hist[-1] <= 1e-9
    assert cycles <= 12          # healthy V-cycle contraction
    assert np.abs(u - ue).max() < 1e-6
