"""TPU smoke tier: small fp32 runs on the REAL TPU backend.

Run manually when the tunnel is up:

    CFD_TPU_SMOKE=1 python -m pytest tests/test_tpu_smoke.py -q

The CPU suite (tests/conftest.py pins the CPU backend) never exercises the
TPU backend's divergences — no IRFFT, no complex128, compiled Mosaic
(Pallas) kernels, different scatter/FFT codegen — so each family gets one
small compiled-and-executed check here, cross-validated against the same
program on the in-process CPU backend where possible.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def tpu():
    dev = jax.devices()[0]
    assert dev.platform != "cpu", (
        "CFD_TPU_SMOKE=1 but the default backend is CPU; "
        "is the TPU tunnel up?")
    return dev


def _on_cpu(fn, *args):
    """Run fn on the in-process CPU backend for cross-checking."""
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        return fn(*[jax.device_put(a, cpu) for a in args])


def test_cavity_step_matches_cpu(tpu):
    """One cavity step (Arakawa + DST-I Poisson): TPU vs CPU backend.
    Impls pinned explicitly — this is a same-program cross-backend
    parity check, so the backend-dependent "auto" resolution (which
    would hand the CPU run a Mosaic kernel) must not apply; the TPU
    auto winners' accuracy is covered by
    test_cavity_new_poisson_variants and the bench physics anchors."""
    from cfd_julia_tpu.models import cavity

    cfg = cavity.CavityConfig(nx=64, ny=64, poisson="fst", rhs_impl="xla")
    step = cavity.make_step_fn(cfg)
    w0 = jnp.zeros((65, 65), jnp.float32)
    state = (w0, jnp.zeros_like(w0), jnp.zeros((), jnp.float32))
    run = lambda st: step(step(st))  # two steps so BCs feed back
    out_tpu = jax.jit(run)(jax.device_put(state, tpu))
    out_cpu = _on_cpu(jax.jit(run), state)
    np.testing.assert_allclose(np.asarray(out_tpu[0]), np.asarray(out_cpu[0]),
                               rtol=0, atol=5e-5)


def test_cavity_matmul_poisson_matches_fst(tpu):
    """MXU sine-matmul Poisson vs the rfft DST path, both on TPU."""
    from cfd_julia_tpu.models import cavity

    w0 = jnp.zeros((65, 65), jnp.float32)
    state = (w0, jnp.zeros_like(w0), jnp.zeros((), jnp.float32))
    outs = {}
    for poisson in ("fst", "matmul"):
        cfg = cavity.CavityConfig(nx=64, ny=64, poisson=poisson)
        step = jax.jit(cavity.make_step_fn(cfg))
        st = state
        for _ in range(3):
            st = step(st)
        outs[poisson] = np.asarray(st[1])
    np.testing.assert_allclose(outs["matmul"], outs["fst"],
                               rtol=0, atol=5e-5)


def test_ps23_half_spectrum_step(tpu):
    """Half-spectrum pseudospectral step executes on TPU (rfft2 forward,
    packed-pair inverse — the no-IRFFT path) and matches CPU."""
    from cfd_julia_tpu.models import vortex

    cfg = vortex.VortexConfig(nx=64, ny=64, solver="ps23", dt=0.01)
    step = vortex.make_spectral_step_half_packed(cfg, jnp.float32)
    w0 = vortex.initial_vorticity(cfg, jnp.float32)
    # real-packed state end to end: the remote backend rejects complex64
    # at jit boundaries and on host transfers (spectral.pack_c)
    run = jax.jit(lambda w: step(step(vortex.half_init_packed(w))))
    out_tpu = np.asarray(run(jax.device_put(w0, tpu)))
    out_cpu = np.asarray(_on_cpu(run, w0))
    np.testing.assert_allclose(out_tpu, out_cpu, rtol=0, atol=1e-4)


def test_multigrid_fp32(tpu):
    """One V-cycle stack at 256^2 converges on TPU (red-black smoother,
    conv transfers; Pallas smoother path if selected)."""
    from cfd_julia_tpu.models import poisson2d
    from cfd_julia_tpu.poisson import multigrid

    mgc = multigrid.MGConfig(tol=1e-5, max_cycles=20)
    cfg = poisson2d.PoissonConfig(nx=256, ny=256, solver="multigrid",
                                  problem="poly", mg=mgc)
    _, _, _, _, ue, f = poisson2d.build_problem(cfg, jnp.float32)
    u0 = poisson2d._dirichlet_init(ue)
    res = multigrid.solve(f, u0, cfg.dx, cfg.dy, cfg=mgc)
    # res.rms is the RAW residual rms (the round-4 residual-report
    # contract); the convergence claim is relative — CPU gives the same
    # 8.4e-7 ratio / 4 cycles for this problem (rms0 ~ 4255)
    assert float(res.rms / res.rms0) <= mgc.tol
    assert np.isfinite(np.asarray(res.u)).all()


def test_multigrid_cheb_fp32(tpu):
    """The raced Chebyshev-smoothed form (matmul,off,plain,cheb) runs
    on the real backend at 512^2 before the 4096^2 bench race trusts
    it: converges to tol and matches the RB solve within fp32 slack."""
    from cfd_julia_tpu.models import poisson2d
    from cfd_julia_tpu.poisson import multigrid

    sols = {}
    for smoother in ("auto", "cheb"):
        mgc = multigrid.MGConfig(tol=1e-5, max_cycles=20,
                                 transfers="matmul", smoother=smoother)
        cfg = poisson2d.PoissonConfig(nx=512, ny=512, solver="multigrid",
                                      problem="poly", mg=mgc)
        _, _, _, _, ue, f = poisson2d.build_problem(cfg, jnp.float32)
        u0 = poisson2d._dirichlet_init(ue)
        res = multigrid.solve(f, u0, cfg.dx, cfg.dy, cfg=mgc)
        assert float(res.rms / res.rms0) <= 1e-5, smoother
        sols[smoother] = np.asarray(res.u)
    scale = np.abs(sols["auto"]).max()
    assert np.abs(sols["cheb"] - sols["auto"]).max() / scale < 1e-3


def test_pallas_redblack_compiled(tpu):
    """The fused red-black smoother compiles through Mosaic (not
    interpret mode) and matches the XLA sweep."""
    from cfd_julia_tpu.ops import pallas_kernels
    from cfd_julia_tpu.poisson import iterative

    n = 256
    dx = dy = 1.0 / n
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
    mr, mb = iterative.color_masks(n, n, jnp.float32)
    ref = iterative.redblack_sweep(u, f, dx, dy, mr, mb)
    out = pallas_kernels.redblack_sweep_fused(u, f, dx, dy)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_euler_sod_fp32(tpu):
    """Euler HLLC Sod tube at the ch. 10 config stays physical on TPU."""
    from cfd_julia_tpu.models import euler1d

    cfg = euler1d.EulerConfig(nx=1024, t_final=0.05, solver="hllc")
    res = euler1d.solve(cfg, jnp.float32)
    rho, u, p, _ = euler1d.primitives_from_result(res, cfg.gamma)
    assert float(jnp.min(rho)) > 0 and float(jnp.min(p)) > 0
    assert np.isfinite(np.asarray(res.q)).all()


def test_fp32_tgv_error(tpu):
    """fp32 TGV decay error on TPU stays near the fp64 CPU value
    (spectral solver: CN time error ~8.5e-6 at 64^2 in fp64; fp32 adds
    roundoff -> allow 5e-5)."""
    from cfd_julia_tpu.models import vortex

    cfg = vortex.VortexConfig(nx=64, ny=64, solver="ps23", dt=0.01,
                              t_final=1.0, re=10.0, ic="tgv", ns=1)
    res = vortex.solve(cfg, jnp.float32)
    l2, _ = vortex.tgv_error(cfg, res)
    assert float(l2) < 5e-5, float(l2)


def test_fused_mg_edges_compiled(tpu):
    """The fused V-cycle level-edge kernels compile through Mosaic and
    match the XLA compositions at a TPU-selected level size (512)."""
    from cfd_julia_tpu.ops import pallas_kernels
    from cfd_julia_tpu.poisson import iterative, multigrid

    n = 512
    dx = 1.0 / n
    rng = np.random.default_rng(6)
    u = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((n + 1, n + 1)), jnp.float32)
    mask = iterative.interior_mask(n, n, jnp.float32)
    masks = iterative.color_masks(n, n, jnp.float32)
    uc = jnp.asarray(rng.standard_normal((n // 2 + 1, n // 2 + 1)),
                     jnp.float32)

    su, fc = pallas_kernels.smooth_residual_restrict_fused(u, f, dx, dx, 2)
    ref_u = multigrid.smooth(u, f, dx, dx, 2, masks, impl="xla")
    ref_fc = multigrid.restriction(
        iterative.residual_full(f, ref_u, dx, dx, mask))
    # residual-scale values are O(1/dx^2): compare in ulps of the field
    # scale, not absolutely (fp32 accumulation order differs between the
    # slab kernel and the XLA composition)
    def close(a, b, rel=1e-6):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=0,
                                   atol=rel * max(np.abs(b).max(), 1.0))

    close(su, ref_u)
    close(fc, ref_fc)

    out = pallas_kernels.prolong_correct_smooth_fused(u, f, uc, dx, dx, 2)
    ref = multigrid.smooth(u + multigrid.prolongation(uc) * mask, f,
                           dx, dx, 2, masks, impl="xla")
    close(out, ref)


def test_mxu_fft_variants(tpu):
    """Blocked four-step MXU FFT on the real chip: fp32 round trip and
    rfft2 parity vs the XLA FFT at both precisions."""
    from cfd_julia_tpu.ops import mxu_fft, spectral

    rng = np.random.default_rng(8)
    h = jnp.asarray(rng.standard_normal((2, 256, 256)), jnp.float32)
    xr = jnp.asarray(rng.standard_normal((256, 256)), jnp.float32)
    # measured tier errors on chip (variant_err/microbench 2026-08-18):
    # highest (6-pass bf16) 5.5e-7 rel, high (3-pass) 3.4e-5 rel — the
    # bounds are RELATIVE to the spectrum scale (fwd values are O(N))
    for prec, rel in (("highest", 3e-6), ("high", 2e-4)):
        @jax.jit
        def err(hh, p=prec):
            z = spectral.unpack_c(hh)
            fwd = jnp.fft.fft2(z)
            a = jnp.abs(mxu_fft.fft2_matmul(z, p) - fwd).max()
            b = jnp.abs(mxu_fft.ifft2_matmul(z, p) - jnp.fft.ifft2(z)).max()
            rr = jnp.fft.rfft2(xr)
            c = jnp.abs(mxu_fft.rfft2_matmul(xr, p) - rr).max()
            return (a / jnp.abs(fwd).max(), b,
                    c / jnp.abs(rr).max())

        a, b, c = err(h)
        assert float(a) < rel, (prec, float(a))
        assert float(b) < 1e-5, (prec, float(b))   # inverse is O(1)
        assert float(c) < rel, (prec, float(c))


def test_ps23_variant_steps_match_on_tpu(tpu):
    """The raced ps23 formulations (matmul FFT at high precision,
    mirror-after-rows pairs) all step to the same fp32 state on TPU."""
    from cfd_julia_tpu.models import vortex

    w0 = None
    outs = {}
    for name, kw in {
        "base": dict(),
        "mm_high": dict(fft_impl="matmul", fft_precision="high"),
        "rowsfirst": dict(pair_impl="rowsfirst"),
    }.items():
        cfg = vortex.VortexConfig(nx=128, ny=128, solver="ps23", dt=5e-3,
                                  **kw)
        step = vortex.make_spectral_step_half_packed(cfg, jnp.float32)
        if w0 is None:
            w0 = vortex.initial_vorticity(cfg, jnp.float32)
        run = jax.jit(lambda w, s=step: s(s(vortex.half_init_packed(w))))
        outs[name] = np.asarray(run(w0))
    scale = np.abs(outs["base"]).max()
    for name in ("mm_high", "rowsfirst"):
        d = np.abs(outs[name] - outs["base"]).max() / scale
        assert d < 1e-4, (name, d)


def test_cavity_new_poisson_variants(tpu):
    """fst_half_mxu (both precisions) and the Pallas cavity RHS step to
    the fst baseline's state on TPU."""
    from cfd_julia_tpu.models import cavity

    w0 = jnp.zeros((129, 129), jnp.float32)
    state = (w0, jnp.zeros_like(w0), jnp.zeros((), jnp.float32))
    outs = {}
    for name, kw in {
        "base": dict(poisson="fst"),
        "half_mxu_hi": dict(poisson="fst_half_mxu"),
        "half_mxu_fast": dict(poisson="fst_half_mxu", fft_precision="high"),
        "pallas_rhs": dict(poisson="fst", rhs_impl="pallas"),
        # 3-pass-bf16 dots: the on-chip counterpart of the emulated
        # bound in test_poisson2d (CPU ignores precision hints)
        "bf16x3": dict(poisson="matmul_bf16x3"),
        "bf16x3_pallas": dict(poisson="matmul_bf16x3", rhs_impl="pallas"),
    }.items():
        cfg = cavity.CavityConfig(nx=128, ny=128, **kw)
        step = jax.jit(cavity.make_step_fn(cfg))
        st = state
        for _ in range(3):
            st = step(st)
        outs[name] = np.asarray(st[1])
    scale = max(np.abs(outs["base"]).max(), 1e-30)
    for name in ("half_mxu_hi", "half_mxu_fast", "pallas_rhs",
                 "bf16x3", "bf16x3_pallas"):
        d = np.abs(outs[name] - outs["base"]).max() / scale
        assert d < 1e-3, (name, d)
