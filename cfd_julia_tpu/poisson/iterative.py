"""Iterative Poisson solvers: Jacobi, red-black Gauss-Seidel, conjugate
gradient — all as single `lax.while_loop` programs with on-device residual
histories (zero host round-trips until the solve finishes).

Reference parity notes:
* ch. 15's `gauss_seidel` (gauss_seidel.jl:8-54) is **point Jacobi** despite
  its name (the residual of the whole field is computed before any update);
  `jacobi` here is the exact equivalent.
* The reference's true Gauss-Seidel (`gauss_seidel_mg`, Common.jl:78-92) is
  lexicographic and order-dependent — inherently serial. `redblack_gs` is
  the TPU-native replacement: two data-parallel half-sweeps with the same
  asymptotic smoothing behaviour.
* `cg` follows conjugate_gradient.jl:7-79 update-for-update.
* Residual histories: the reference streams "(it, rms, rms/rms0)" lines to
  text files every `freq` iterations (gauss_seidel.jl:41-47,
  conjugate_gradient.jl:64-71). Here a preallocated on-device buffer is
  filled at the same cadence and returned.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from cfd_julia_tpu.ops import norms


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class IterativeResult:
    u: jax.Array
    iterations: jax.Array       # scalar int
    rms: jax.Array              # final residual L2 norm
    rms0: jax.Array             # initial residual L2 norm
    history: jax.Array          # (max_records, 3): it, rms, rms/rms0 (NaN pad)
    n_records: jax.Array


def _interior_residual(f, u, dx, dy):
    return f[1:-1, 1:-1] - (
        (u[2:, 1:-1] - 2 * u[1:-1, 1:-1] + u[:-2, 1:-1]) / dx**2
        + (u[1:-1, 2:] - 2 * u[1:-1, 1:-1] + u[1:-1, :-2]) / dy**2
    )


def _rms_interior(r_int):
    """Matches compute_l2norm over interior nodes (Common.jl:229-232):
    r_int is the (nx-1, ny-1) interior block of an (nx+1, ny+1) field."""
    return jnp.sqrt(jnp.sum(r_int**2) / (r_int.shape[0] * r_int.shape[1]))


def jacobi_sweep(u, f, dx: float, dy: float):
    """One point-Jacobi update (gauss_seidel.jl:33-39)."""
    r = _interior_residual(f, u, dx, dy)
    return u.at[1:-1, 1:-1].add(r / (-2.0 / dx**2 - 2.0 / dy**2))


def redblack_sweep(u, f, dx: float, dy: float, mask_red, mask_black):
    """One red-black Gauss-Seidel sweep: two masked half-updates; the black
    half sees the freshly updated red values (data-parallel true GS)."""
    diag = -2.0 / dx**2 - 2.0 / dy**2
    r = _interior_residual(f, u, dx, dy)
    u = u.at[1:-1, 1:-1].add(jnp.where(mask_red, r / diag, 0.0))
    r = _interior_residual(f, u, dx, dy)
    return u.at[1:-1, 1:-1].add(jnp.where(mask_black, r / diag, 0.0))


def interior_masks(nx: int, ny: int, dtype=jnp.bool_):
    """Checkerboard masks for the (nx-1, ny-1) interior of a node grid,
    coloured by global node parity (i + j)."""
    i = jnp.arange(1, nx)[:, None]
    j = jnp.arange(1, ny)[None, :]
    red = ((i + j) % 2 == 0)
    return red.astype(dtype), (~red).astype(dtype)


@partial(jax.jit, static_argnames=("method", "max_iter", "freq", "dx", "dy"))
def relax_solve(
    f,
    u0,
    dx: float,
    dy: float,
    tol: float = 1e-9,
    max_iter: int = 100_000,
    freq: int = 100,
    method: str = "jacobi",
) -> IterativeResult:
    """Relaxation solve (Jacobi or red-black GS) until rms/rms0 <= tol.

    Runs `freq` sweeps per convergence check, exactly the reference cadence
    (gauss_seidel.jl:41-47 with freq=10_000)."""
    nx, ny = f.shape[0] - 1, f.shape[1] - 1
    if method == "jacobi":
        sweep = lambda u: jacobi_sweep(u, f, dx, dy)
    elif method == "redblack":
        mr, mb = interior_masks(nx, ny)
        sweep = lambda u: redblack_sweep(u, f, dx, dy, mr, mb)
    else:
        raise ValueError(f"unknown relaxation {method!r}")

    max_records = max(1, max_iter // freq) + 1
    r0 = _interior_residual(f, u0, dx, dy)
    rms0 = _rms_interior(r0)
    hist0 = jnp.full((max_records, 3), jnp.nan, f.dtype)

    def cond(c):
        u, it, rms, hist, nrec = c
        return (it < max_iter) & (rms / rms0 > tol)

    def body(c):
        u, it, rms, hist, nrec = c
        u = lax.fori_loop(0, freq, lambda _, uu: sweep(uu), u)
        it = it + freq
        rms = _rms_interior(_interior_residual(f, u, dx, dy))
        rec = jnp.stack([it.astype(f.dtype), rms, rms / rms0])
        hist = lax.dynamic_update_slice(hist, rec[None], (nrec, 0))
        return (u, it, rms, hist, nrec + 1)

    u, it, rms, hist, nrec = lax.while_loop(
        cond, body, (u0, jnp.array(0), rms0, hist0, jnp.array(0))
    )
    return IterativeResult(u=u, iterations=it, rms=rms, rms0=rms0,
                           history=hist, n_records=nrec)


@partial(jax.jit, static_argnames=("max_iter", "freq", "dx", "dy"))
def cg_solve(
    f,
    u0,
    dx: float,
    dy: float,
    tol: float = 1e-9,
    max_iter: int = 100_000,
    freq: int = 100,
) -> IterativeResult:
    """Matrix-free conjugate gradient (conjugate_gradient.jl:7-79): the
    5-point Laplacian is applied as a stencil, convergence on rms/rms0,
    history recorded every `freq` iterations."""
    eps = 1e-16
    r0_int = _interior_residual(f, u0, dx, dy)
    rms0 = _rms_interior(r0_int)
    r_full0 = jnp.zeros_like(f).at[1:-1, 1:-1].set(r0_int)
    max_records = max(1, max_iter // freq) + 1
    hist0 = jnp.full((max_records, 3), jnp.nan, f.dtype)

    def lap_interior(p):
        return (
            (p[2:, 1:-1] - 2 * p[1:-1, 1:-1] + p[:-2, 1:-1]) / dx**2
            + (p[1:-1, 2:] - 2 * p[1:-1, 1:-1] + p[1:-1, :-2]) / dy**2
        )

    def cond(c):
        u, r, p, it, rms, hist, nrec = c
        return (it < max_iter) & (rms / rms0 > tol)

    def body(c):
        u, r, p, it, rms, hist, nrec = c
        it = it + 1
        ap = lap_interior(p)
        rr = jnp.sum(r[1:-1, 1:-1] ** 2)
        alpha = rr / (jnp.sum(ap * p[1:-1, 1:-1]) + eps)
        u = u.at[1:-1, 1:-1].add(alpha * p[1:-1, 1:-1])
        r = r.at[1:-1, 1:-1].add(-alpha * ap)
        rr_new = jnp.sum(r[1:-1, 1:-1] ** 2)
        beta = rr_new / (rr + eps)
        p = r + beta * p  # boundaries stay 0: r and p start 0 there
        rms = jnp.sqrt(rr_new / ((f.shape[0] - 2) * (f.shape[1] - 2)))
        rec = jnp.stack([it.astype(f.dtype), rms, rms / rms0])
        do_rec = (it % freq) == 0
        hist = lax.cond(
            do_rec,
            lambda h: lax.dynamic_update_slice(h, rec[None], (nrec, 0)),
            lambda h: h,
            hist,
        )
        nrec = nrec + do_rec.astype(nrec.dtype)
        return (u, r, p, it, rms, hist, nrec)

    init = (u0, r_full0, r_full0, jnp.array(0), rms0, hist0, jnp.array(0))
    u, r, p, it, rms, hist, nrec = lax.while_loop(cond, body, init)
    return IterativeResult(u=u, iterations=it, rms=rms, rms0=rms0,
                           history=hist, n_records=nrec)
