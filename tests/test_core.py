"""Core grid/stencil/profiling coverage."""
import jax.numpy as jnp
import numpy as np

from cfd_julia_tpu.core.grid import Grid1D, Grid2D
from cfd_julia_tpu.ops import stencil
from cfd_julia_tpu.utils import profiling


def test_grid1d():
    g = Grid1D(nx=80, x0=-1.0, x1=1.0)
    assert g.dx == 0.025
    x = np.asarray(g.nodes())
    assert x[0] == -1.0 and x[-1] == 1.0 and len(x) == 81
    c = np.asarray(g.centers())
    assert len(c) == 80
    np.testing.assert_allclose(c[0], -1.0 + 0.0125)


def test_grid2d_coarsen():
    g = Grid2D(nx=64, ny=32)
    gc = g.coarsen()
    assert (gc.nx, gc.ny) == (32, 16)
    assert gc.dx == 2 * g.dx
    x, y = g.periodic_nodes()
    assert len(x) == 64 and len(y) == 32


def test_stencil_ops():
    u = jnp.asarray(np.arange(8.0))
    np.testing.assert_array_equal(np.asarray(stencil.shift(u, 1))[:-1],
                                  np.arange(1.0, 8.0))
    lap = stencil.laplacian_1d(u, 1.0)
    np.testing.assert_allclose(np.asarray(lap), 0.0)  # linear -> zero

    v = jnp.asarray(np.random.default_rng(0).standard_normal((6, 6)))
    lp = stencil.laplacian_periodic(v, 1.0, 1.0)
    # periodic Laplacian sums to 0 (telescoping)
    assert abs(float(lp.sum())) < 1e-10


def test_steps_per_second_runs():
    step = lambda x: x * 0.5 + 1.0
    sps, out = profiling.steps_per_second(step, jnp.zeros(16), steps=10)
    assert sps > 0
    assert out.shape == (16,)
