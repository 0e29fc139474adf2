"""Differentiability of the solvers — a capability the reference's Julia
scripts do not have at all: every solver here is a pure JAX function, so
adjoint sensitivities of any output functional w.r.t. physical
parameters or initial conditions come from jax.grad through the full
lax.scan time loop (reverse-mode through the DST/FFT Poisson solves and
the RK3 stages).  Verified against central finite differences."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _cavity_loss(re, nx=24, steps=40):
    """Mean-square streamfunction after `steps` — a smooth functional of
    the Reynolds number through the REAL cavity step (make_step_fn
    accepts a traced re)."""
    from cfd_julia_tpu.models import cavity
    from cfd_julia_tpu.stepping import loop

    cfg = cavity.CavityConfig(nx=nx, ny=nx, dt=1e-3)
    step = cavity.make_step_fn(cfg, re=re)
    w0 = jnp.zeros((nx + 1, nx + 1), jnp.float64)
    state = (w0, jnp.zeros_like(w0), jnp.zeros((), jnp.float64))
    final = loop.run_steps(step, state, steps)
    return 1e6 * jnp.mean(final[1] ** 2)


def test_grad_cavity_wrt_reynolds_matches_fd():
    """Reverse-mode sensitivity d(loss)/d(Re) through 40 cavity steps
    (DST Poisson solve + wall BCs + RK3 inside lax.scan) matches central
    finite differences."""
    loss = jax.jit(_cavity_loss)
    g = float(jax.grad(_cavity_loss)(100.0))
    h = 0.5
    fd = (float(loss(100.0 + h)) - float(loss(100.0 - h))) / (2 * h)
    assert np.isfinite(g) and abs(g) > 0
    np.testing.assert_allclose(g, fd, rtol=1e-4)  # FD truncation O(h^2)


def test_grad_vortex_wrt_ic_through_spectral_step():
    """Gradient w.r.t. the initial vorticity FIELD through the ps23
    pseudospectral step (packed half-spectrum, complex intermediates):
    directional derivative matches finite differences."""
    from cfd_julia_tpu.models import vortex
    from cfd_julia_tpu.stepping import loop

    cfg = vortex.VortexConfig(nx=32, ny=32, solver="ps23", dt=5e-3)
    step = vortex.make_spectral_step_half_packed(cfg, jnp.float64)

    def loss(w0):
        h = vortex.half_init_packed(w0)
        hf = loop.run_steps(step, h, 10)
        w = vortex.half_decode_packed(hf, cfg.ny, jnp.float64)
        return jnp.sum(w ** 2)   # enstrophy proxy

    w0 = vortex.initial_vorticity(cfg, jnp.float64)
    rng = np.random.default_rng(11)
    v = jnp.asarray(rng.standard_normal(w0.shape))
    g = jax.grad(loss)(w0)
    directional = float(jnp.vdot(g, v))
    h = 1e-6
    fd = (float(loss(w0 + h * v)) - float(loss(w0 - h * v))) / (2 * h)
    np.testing.assert_allclose(directional, fd, rtol=1e-6)


def test_grad_composes_with_vmap_ensemble():
    """grad-of-vmap: per-member sensitivities across a Reynolds ensemble
    in one compiled program (DP + adjoint together)."""
    res = jnp.asarray([80.0, 100.0, 120.0])
    grads = jax.vmap(jax.grad(lambda r: _cavity_loss(r, nx=16, steps=10)))(
        res)
    assert grads.shape == (3,)
    assert bool(jnp.all(jnp.isfinite(grads)))
    assert len({float(g) for g in grads}) == 3  # distinct sensitivities
