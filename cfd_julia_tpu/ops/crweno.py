"""CRWENO-5 compact reconstruction.

Compact WENO: the interface values f_{j+1/2} solve a tridiagonal system
whose coefficients (a1,a2,a3 | b1,b2,b3) are nonlinear functions of local
smoothness (`crwcL`/`crwcR` Common.jl:344-393). The reference assembles the
system row-by-row and solves with serial Thomas / cyclic Thomas
(06_Inviscid_Burgers_CRWENO/crweno_dirichlet.jl:79-152,
crweno_periodic.jl:101-192). Here coefficient assembly is one fused
vector computation over the whole line and the solve is batched parallel
cyclic reduction (ops.tridiag), cyclic via Sherman-Morrison for periodic.

Output convention matches ops.weno (canonical cell-centred):
* periodic: L[j] at x_{j+1/2} centred u_j; R[j] at x_{j-1/2} centred u_j
  (n nodes -> n interface values each, cyclic systems).
* dirichlet: N+1 nodes u_0..u_N -> N values at x_{j+1/2}, j=0..N-1;
  L centred u_j, R centred u_{j+1}; one-sided compact closures at the ends
  exactly as the reference rows.
"""
from __future__ import annotations

import jax.numpy as jnp

from cfd_julia_tpu.ops import tridiag
from cfd_julia_tpu.ops.weno import EPS_WENO, _smoothness, _stencils


def crwc_L(v1, v2, v3, v4, v5, eps: float = EPS_WENO):
    """Upwind CRWENO coefficients (Common.jl:344-366): returns
    (a1,a2,a3,b1,b2,b3) — LHS tridiagonal row and RHS stencil weights."""
    s1, s2, s3 = _smoothness(v1, v2, v3, v4, v5)
    c1 = 0.2 / (eps + s1) ** 2
    c2 = 0.5 / (eps + s2) ** 2
    c3 = 0.3 / (eps + s3) ** 2
    t = c1 + c2 + c3
    w1, w2, w3 = c1 / t, c2 / t, c3 / t
    a1 = (2 * w1 + w2) / 3.0
    a2 = (w1 + 2 * w2 + 2 * w3) / 3.0
    a3 = w3 / 3.0
    b1 = w1 / 6.0
    b2 = (5 * w1 + 5 * w2 + w3) / 6.0
    b3 = (w2 + 5 * w3) / 6.0
    return a1, a2, a3, b1, b2, b3


def crwc_R(v1, v2, v3, v4, v5, eps: float = EPS_WENO):
    """Downwind CRWENO coefficients (Common.jl:371-393)."""
    s1, s2, s3 = _smoothness(v1, v2, v3, v4, v5)
    c1 = 0.3 / (eps + s1) ** 2
    c2 = 0.5 / (eps + s2) ** 2
    c3 = 0.2 / (eps + s3) ** 2
    t = c1 + c2 + c3
    w1, w2, w3 = c1 / t, c2 / t, c3 / t
    a1 = w1 / 3.0
    a2 = (w3 + 2 * w2 + 2 * w1) / 3.0
    a3 = (2 * w3 + w2) / 3.0
    b1 = (w2 + 5 * w1) / 6.0
    b2 = (5 * w3 + 5 * w2 + w1) / 6.0
    b3 = w3 / 6.0
    return a1, a2, a3, b1, b2, b3


def _stencils_centered(u_pad, n_out):
    """v1..v5 = u_{j-2}..u_{j+2} given a line padded by 2 on each side
    (= weno._stencils: ONE slice helper for both reconstructions)."""
    return _stencils(u_pad, n_out)


def reconstruct_periodic(u, direction: str, eps: float = EPS_WENO,
                         method: str = "pcr"):
    """Cyclic CRWENO reconstruction; u: (..., n) periodic nodes."""
    n = u.shape[-1]
    up = jnp.concatenate([u[..., -2:], u, u[..., :2]], axis=-1)
    v = _stencils_centered(up, n)
    wc = crwc_L if direction == "L" else crwc_R
    a1, a2, a3, b1, b2, b3 = wc(*v, eps)
    um = up[..., 1 : n + 1]   # u_{j-1}
    uc = u                     # u_j
    upp = up[..., 3 : n + 3]  # u_{j+1}
    d = b1 * um + b2 * uc + b3 * upp
    return tridiag.solve_cyclic(a1, a2, a3, d, method=method)


def reconstruct_dirichlet_L(u, eps: float = EPS_WENO, method: str = "pcr"):
    """Upwind compact reconstruction on N+1 Dirichlet nodes -> N interface
    values at x_{j+1/2} centred u_j (crweno_dirichlet.jl:79-112)."""
    nn = u.shape[-1]          # N+1 nodes
    n_out = nn - 1            # N interfaces
    g_l = 2 * u[..., :1] - u[..., 1:2]  # ghost u_{-1} for row j=1
    up = jnp.concatenate([g_l, g_l, u, u[..., -1:]], axis=-1)  # pad 2 left, 1 right
    v = _stencils_centered(up, n_out)
    a1, a2, a3, b1, b2, b3 = crwc_L(*v, eps)
    um = up[..., 1 : n_out + 1]
    uc = u[..., :n_out]
    upp = u[..., 1 : n_out + 1]
    d = b1 * um + b2 * uc + b3 * upp

    # boundary closure rows (reference rows i=1 and i=n):
    a1 = a1.at[..., 0].set(0.0).at[..., -1].set(1.0 / 3.0)
    a2 = a2.at[..., 0].set(2.0 / 3.0).at[..., -1].set(2.0 / 3.0)
    a3 = a3.at[..., 0].set(1.0 / 3.0).at[..., -1].set(0.0)
    d = d.at[..., 0].set((u[..., 0] + 5 * u[..., 1]) / 6.0)
    d = d.at[..., -1].set((5 * u[..., -2] + u[..., -1]) / 6.0)
    return tridiag.solve(a1, a2, a3, d, method=method)


def reconstruct_dirichlet_R(u, eps: float = EPS_WENO, method: str = "pcr"):
    """Downwind compact reconstruction -> N values at x_{j+1/2} centred
    u_{j+1} (crweno_dirichlet.jl:119-152)."""
    nn = u.shape[-1]
    n_out = nn - 1
    g_r = 2 * u[..., -1:] - u[..., -2:-1]  # ghost u_{N+1} for row m=n-2
    # stencil for output m is centred u_{m+1}: needs u_{m-1}..u_{m+3}
    up = jnp.concatenate([u[..., :1], u, g_r, g_r], axis=-1)
    v = _stencils_centered(up, n_out)
    a1, a2, a3, b1, b2, b3 = crwc_R(*v, eps)
    um = u[..., :n_out]
    uc = u[..., 1 : n_out + 1]
    upp = up[..., 3 : n_out + 3]
    d = b1 * um + b2 * uc + b3 * upp

    a1 = a1.at[..., 0].set(0.0).at[..., -1].set(1.0 / 3.0)
    a2 = a2.at[..., 0].set(2.0 / 3.0).at[..., -1].set(2.0 / 3.0)
    a3 = a3.at[..., 0].set(1.0 / 3.0).at[..., -1].set(0.0)
    d = d.at[..., 0].set((u[..., 0] + 5 * u[..., 1]) / 6.0)
    d = d.at[..., -1].set((5 * u[..., -2] + u[..., -1]) / 6.0)
    return tridiag.solve(a1, a2, a3, d, method=method)
