"""Geometric multigrid V-cycle for the 2D Poisson equation.

Reference: 17_Poisson_Solver_Multigrid/mg.jl (2-level) and mg_N.jl
(N-level, the general case this module implements). Transfer operators are
full-weighting restriction (Common.jl:21-48) and bilinear prolongation
(Common.jl:50-76).

TPU-native deviations from the reference:
* The smoother is red-black Gauss-Seidel (two data-parallel half-sweeps)
  instead of the order-dependent lexicographic sweep of `gauss_seidel_mg`
  (Common.jl:78-92) — same O(1) smoothing factor, fully vector-parallel
  (SURVEY §3.3: the one reference algorithm that cannot map directly to
  data-parallel hardware).
* The level pyramid is static (shapes fixed at trace time); the V-cycle is
  Python-unrolled inside a single `lax.while_loop`, convergence checked
  on-device once per cycle — zero host round-trips.
* No scatters anywhere: sweeps are roll+mask elementwise math
  (poisson.iterative), restriction assembles by concatenation, and
  prolongation interleaves by stack+reshape (TPU scatters are ~6.5x
  slower than the equivalent dataflow ops at 4096^2).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from cfd_julia_tpu.poisson.iterative import (
    IterativeResult,
    _rms_from_full,
    color_masks,
    interior_mask,
    redblack_sweep,
    residual_full,
)


_RESTRICT_KERNEL = jnp.array(
    [[1.0, 2.0, 1.0], [2.0, 4.0, 2.0], [1.0, 2.0, 1.0]]
) / 16.0
_PROLONG_KERNEL = jnp.array(
    [[0.25, 0.5, 0.25], [0.5, 1.0, 0.5], [0.25, 0.5, 0.25]]
)


def restriction(r):
    """Full-weighting fine -> coarse transfer on node-centred grids
    (Common.jl:21-48). r: (nxf+1, nyf+1) -> (nxf//2+1, nyf//2+1).

    Interior = 3x3 full-weighting stencil at even fine nodes, expressed as
    a stride-2 convolution (strided-slice gathers cost ~25x more on TPU:
    443 ms vs 18 ms at 4096^2); boundary rows/cols are direct injection of
    the coincident fine nodes."""
    k = _RESTRICT_KERNEL.astype(r.dtype)[None, None]
    interior = lax.conv_general_dilated(
        r[None, None], k, window_strides=(2, 2), padding=((1, 1), (1, 1))
    )[0, 0, 1:-1, 1:-1]
    mid = jnp.concatenate(
        [r[2:-2:2, :1], interior, r[2:-2:2, -1:]], axis=1
    )
    return jnp.concatenate([r[:1, ::2], mid, r[-1:, ::2]], axis=0)


def prolongation(uc):
    """Bilinear coarse -> fine transfer (Common.jl:50-76): transposed
    stride-2 convolution with the bilinear kernel (lhs dilation); verified
    element-identical to the reference's injection/average formulas."""
    k = _PROLONG_KERNEL.astype(uc.dtype)[None, None]
    return lax.conv_general_dilated(
        uc[None, None], k, window_strides=(1, 1),
        padding=((1, 1), (1, 1)), lhs_dilation=(2, 2),
    )[0, 0]


def smooth(u, f, dx: float, dy: float, iters: int, masks,
           impl: str = "xla"):
    """`iters` red-black GS sweeps (replaces gauss_seidel_mg).

    impl="pallas" uses the fused single-pass kernel
    (ops.pallas_kernels.redblack_sweep_fused): both colour half-updates run
    on one VMEM-resident row slab — ~1.5x the best XLA roll+mask form and
    ~10x the naive one at 4096^2."""
    if impl == "pallas":
        from cfd_julia_tpu.ops import pallas_kernels

        return pallas_kernels.redblack_sweeps_fused(
            u, f, dx, dy, iters, interpret=False
        )
    mr, mb = masks
    return lax.fori_loop(
        0, iters, lambda _, uu: redblack_sweep(uu, f, dx, dy, mr, mb), u
    )


def _pick_smoother(nx: int, ny: int) -> str:
    """Fused Pallas smoother on TPU for levels big enough to amortize the
    kernel's DMA setup; XLA rolls elsewhere (and on CPU)."""
    if jax.default_backend() == "tpu" and min(nx, ny) >= 512:
        return "pallas"
    return "xla"


@dataclasses.dataclass(frozen=True)
class MGConfig:
    n_levels: int = 0          # 0 -> auto (coarsen to 2x2 cells)
    v1: int = 2                # pre-smoothing sweeps (mg_N.jl v1)
    v2: int = 2                # coarsest-level sweeps (v2)
    v3: int = 2                # post-smoothing sweeps (v3)
    tol: float = 1e-9
    max_cycles: int = 100


def _build_levels(nx, ny, dx, dy, n_levels):
    if n_levels <= 0:
        n_levels = 1
        m = min(nx, ny)
        while m % 2 == 0 and m > 2:
            m //= 2
            n_levels += 1
    levels = []
    for l in range(n_levels):
        levels.append((nx >> l, ny >> l, dx * (1 << l), dy * (1 << l)))
        assert (nx >> l) >= 2 and (ny >> l) >= 2, "too many MG levels"
    return levels


def v_cycle(u, f, levels, masks, imasks, cfg: MGConfig, impls=None):
    """One V-cycle over the static level pyramid (mg_N.jl:53-106)."""
    n = len(levels)
    impls = impls or [_pick_smoother(l[0], l[1]) for l in levels]
    nx0, ny0, dx0, dy0 = levels[0]
    u = smooth(u, f, dx0, dy0, cfg.v1, masks[0], impls[0])

    # descend: residual -> restrict -> relax from zero
    fs = [f]
    us = [u]
    for k in range(1, n):
        nxp, nyp, dxp, dyp = levels[k - 1]
        r = residual_full(fs[k - 1], us[k - 1], dxp, dyp, imasks[k - 1])
        fk = restriction(r)
        nxk, nyk, dxk, dyk = levels[k]
        uk = jnp.zeros((nxk + 1, nyk + 1), u.dtype)
        iters = cfg.v1 if k < n - 1 else cfg.v2
        uk = smooth(uk, fk, dxk, dyk, iters, masks[k], impls[k])
        fs.append(fk)
        us.append(uk)

    # ascend: prolongate -> correct -> relax
    for k in range(n - 1, 0, -1):
        nxp, nyp, dxp, dyp = levels[k - 1]
        corr = prolongation(us[k]) * imasks[k - 1]
        us[k - 1] = us[k - 1] + corr
        us[k - 1] = smooth(us[k - 1], fs[k - 1], dxp, dyp, cfg.v3,
                           masks[k - 1], impls[k - 1])
    return us[0]


@partial(jax.jit, static_argnames=("dx", "dy", "cfg"))
def solve(f, u0, dx: float, dy: float, cfg: MGConfig = MGConfig()) -> IterativeResult:
    """V-cycle iteration until rms/rms0 <= tol (mg_N.jl:53-106), residual
    history recorded once per cycle on-device."""
    nx, ny = f.shape[0] - 1, f.shape[1] - 1
    levels = _build_levels(nx, ny, dx, dy, cfg.n_levels)
    masks = [color_masks(l[0], l[1], f.dtype) for l in levels]
    imasks = [interior_mask(l[0], l[1], f.dtype) for l in levels]

    mask0 = imasks[0]
    rms0 = _rms_from_full(residual_full(f, u0, dx, dy, mask0), nx, ny)
    hist0 = jnp.full((cfg.max_cycles + 1, 3), jnp.nan, f.dtype)

    def cond(c):
        u, it, rms, hist, nrec = c
        return (it < cfg.max_cycles) & (rms / rms0 > cfg.tol)

    def body(c):
        u, it, rms, hist, nrec = c
        u = v_cycle(u, f, levels, masks, imasks, cfg)
        it = it + 1
        rms = _rms_from_full(residual_full(f, u, dx, dy, mask0), nx, ny)
        rec = jnp.stack([it.astype(f.dtype), rms, rms / rms0])
        hist = lax.dynamic_update_slice(hist, rec[None], (nrec, 0))
        return (u, it, rms, hist, nrec + 1)

    u, it, rms, hist, nrec = lax.while_loop(
        cond, body, (u0, jnp.array(0), rms0, hist0, jnp.array(0))
    )
    return IterativeResult(u=u, iterations=it, rms=rms, rms0=rms0,
                           history=hist, n_records=nrec)
