"""Adjoint sensitivity of the lid-driven cavity to the Reynolds number.

The reference's Julia scripts can only *run* the cavity; here the whole
solver (RK3 + wall BCs + DST Poisson, inside lax.scan) is a pure JAX
function, so reverse-mode AD delivers d(loss)/d(Re) in one backward
pass — the building block for data assimilation / design optimization.

    JAX_PLATFORMS=cpu python examples/adjoint_cavity.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cfd_julia_tpu.jaxconfig import configure_jax

configure_jax()

from cfd_julia_tpu.models import cavity          # noqa: E402
from cfd_julia_tpu.ops import arakawa            # noqa: E402
from cfd_julia_tpu.poisson import direct         # noqa: E402
from cfd_julia_tpu.stepping import loop          # noqa: E402

NX, STEPS, DT = 32, 100, 1e-3
cfg = cavity.CavityConfig(nx=NX, ny=NX, dt=DT)
dx, dy = cfg.dx, cfg.dy


def loss(re):
    """Mean-square streamfunction after STEPS steps, as a function of a
    *traced* Reynolds number."""
    def step(state):
        w, s, _ = state
        def close(wt_i, s_prev):
            wt = cavity.assemble_with_wall_bc(wt_i, s_prev, dx, dy, 2)
            return wt, direct.solve_fst(-wt, dx, dy)
        r = arakawa.vorticity_rhs(w, s, dx, dy, re)[1:-1, 1:-1]
        wt, s1 = close(w[1:-1, 1:-1] + DT * r, s)
        r = arakawa.vorticity_rhs(wt, s1, dx, dy, re)[1:-1, 1:-1]
        wt, s2 = close(0.75 * w[1:-1, 1:-1] + 0.25 * wt[1:-1, 1:-1]
                       + 0.25 * DT * r, s1)
        r = arakawa.vorticity_rhs(wt, s2, dx, dy, re)[1:-1, 1:-1]
        wn, s3 = close((w[1:-1, 1:-1] + 2.0 * wt[1:-1, 1:-1]
                        + 2.0 * DT * r) / 3.0, s2)
        return (wn, s3, jnp.zeros((), w.dtype))

    w0 = jnp.zeros((NX + 1, NX + 1), jnp.float32)
    final = loop.run_steps(step, (w0, jnp.zeros_like(w0),
                                  jnp.zeros((), jnp.float32)), STEPS)
    return 1e6 * jnp.mean(final[1] ** 2)


if __name__ == "__main__":
    val, grad = jax.jit(jax.value_and_grad(loss))(100.0)
    print(f"loss(Re=100)      = {float(val):.6f}")
    print(f"d loss / d Re     = {float(grad):.6e}")
    res = jnp.asarray([50.0, 100.0, 200.0])
    grads = jax.jit(jax.vmap(jax.grad(loss)))(res)
    for r, g in zip(res, grads):
        print(f"d loss / d Re @ Re={float(r):5.0f} : {float(g):.6e}")
