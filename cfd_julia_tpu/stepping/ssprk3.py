"""Explicit SSP-RK3 (Shu–Osher) stage combination.

The reference duplicates these three stages in every hyperbolic/NS script
(e.g. 02_Heat_Equation_RK3/rk3.jl:32-47, 09_Euler_1D_Roe/euler_roe.jl:53-71):

    u1 = u  + dt * L(u)
    u2 = 3/4 u + 1/4 u1 + 1/4 dt * L(u1)
    u  = 1/3 u + 2/3 u2 + 2/3 dt * L(u2)

Here it is a single higher-order function over an arbitrary pytree state and
rhs operator; XLA fuses each stage's rhs + axpy chain into one kernel.
"""
from __future__ import annotations

import jax


def ssprk3_step(rhs, u, dt):
    """One SSP-RK3 step. `rhs(u) -> du/dt` maps pytree -> matching pytree."""
    ax = jax.tree_util.tree_map
    u1 = ax(lambda x, r: x + dt * r, u, rhs(u))
    u2 = ax(lambda x, x1, r: 0.75 * x + 0.25 * x1 + 0.25 * dt * r, u, u1, rhs(u1))
    return ax(
        lambda x, x2, r: (x + 2.0 * x2 + 2.0 * dt * r) / 3.0, u, u2, rhs(u2)
    )


def ssprk3_step_with_post(rhs, post, u, dt):
    """SSP-RK3 with a per-stage post-processor (e.g. boundary-condition
    enforcement, as the cavity solver applies wall vorticity BCs after each
    stage — reference 18_NS2D_Lid_Driven_Cavity/lid_driven_cavity.jl:78-107)."""
    ax = jax.tree_util.tree_map
    u1 = post(ax(lambda x, r: x + dt * r, u, rhs(u)))
    u2 = post(
        ax(lambda x, x1, r: 0.75 * x + 0.25 * x1 + 0.25 * dt * r, u, u1, rhs(u1))
    )
    return post(
        ax(lambda x, x2, r: (x + 2.0 * x2 + 2.0 * dt * r) / 3.0, u, u2, rhs(u2))
    )
