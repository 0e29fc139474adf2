"""Unit tests for the spectral primitives (ops.spectral): DST-I vs scipy,
Poisson eigenvalue solves vs discrete operators, Hermitian packing helpers,
dealiasing pad/truncate round trips."""
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.fft import dstn

from cfd_julia_tpu.ops import spectral

RNG = np.random.default_rng(7)


@pytest.mark.parametrize("shape", [(7, 5), (16, 16), (31, 33)])
def test_dst1_matches_scipy(shape):
    v = RNG.standard_normal(shape)
    mine = np.asarray(spectral.dst1_2d(jnp.asarray(v)))
    np.testing.assert_allclose(mine, dstn(v, type=1), rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("shape", [(7, 5), (16, 16), (31, 33), (63, 63)])
def test_dst1_half_matches_scipy(shape):
    """Half-length-rfft DST (FFTPACK pre/post) == scipy RODFT00."""
    v = RNG.standard_normal(shape)
    mine = np.asarray(spectral.dst1_2d(jnp.asarray(v), impl="half"))
    np.testing.assert_allclose(mine, dstn(v, type=1), rtol=1e-12, atol=1e-11)


@pytest.mark.parametrize("impl", ["matmul", "half_mxu"])
@pytest.mark.parametrize("shape", [(7, 5), (16, 16), (31, 33), (63, 63)])
def test_dst1_mxu_impls_match_scipy(shape, impl):
    """MXU-matmul DST forms (odd-extension real-rfft and half-length
    real-rfft) == scipy RODFT00."""
    v = RNG.standard_normal(shape)
    mine = np.asarray(spectral.dst1_2d(jnp.asarray(v), impl=impl))
    np.testing.assert_allclose(mine, dstn(v, type=1), rtol=1e-11, atol=1e-10)


def test_dst1_involution():
    """DST-I is its own inverse up to 2(m+1) per axis."""
    v = RNG.standard_normal((15, 15))
    round_trip = np.asarray(
        spectral.idst1_2d(spectral.dst1_2d(jnp.asarray(v)), 16, 16)
    )
    np.testing.assert_allclose(round_trip, v, rtol=1e-12, atol=1e-12)


def test_fst_poisson_inverts_discrete_laplacian():
    nx = ny = 32
    dx = dy = 1.0 / nx
    ue = RNG.standard_normal((nx + 1, ny + 1))
    ue[0, :] = ue[-1, :] = 0.0
    ue[:, 0] = ue[:, -1] = 0.0
    lap = (
        (ue[2:, 1:-1] - 2 * ue[1:-1, 1:-1] + ue[:-2, 1:-1]) / dx**2
        + (ue[1:-1, 2:] - 2 * ue[1:-1, 1:-1] + ue[1:-1, :-2]) / dy**2
    )
    sol = np.asarray(spectral.fst_poisson_dirichlet(jnp.asarray(lap), dx, dy))
    np.testing.assert_allclose(sol, ue[1:-1, 1:-1], rtol=1e-10, atol=1e-10)


def test_fft_poisson_inverts_discrete_laplacian():
    n = 32
    dx = dy = 1.0 / n
    u = RNG.standard_normal((n, n))
    u -= u.mean()
    up = np.pad(u, 1, mode="wrap")
    lap = (
        (up[2:, 1:-1] - 2 * up[1:-1, 1:-1] + up[:-2, 1:-1]) / dx**2
        + (up[1:-1, 2:] - 2 * up[1:-1, 1:-1] + up[1:-1, :-2]) / dy**2
    )
    sol = np.asarray(spectral.fft_poisson_periodic(jnp.asarray(lap), dx, dy,
                                                   eigen="fdm"))
    np.testing.assert_allclose(sol, u, rtol=1e-9, atol=1e-10)


def test_fft_poisson_periodic_fp32_finite():
    """fp32 regression: cos(eps) == 1.0 exactly in float32, so the FDM
    eigenvalue denominator used to be exactly 0 at the mean mode -> 0/0
    NaN spread by the ifft (caught via the fp32 CLI path, round 2)."""
    n = 32
    dx = 2 * np.pi / n
    x = jnp.arange(n, dtype=jnp.float32) * dx
    f = jnp.sin(x)[:, None] * jnp.cos(x)[None, :]
    for eigen in ("fdm", "spectral"):
        u = spectral.fft_poisson_periodic(f, dx, dx, eigen=eigen)
        assert np.isfinite(np.asarray(u)).all(), eigen
        # lap(u) = f with f a (1,1) eigenmode => u = -f/2
        np.testing.assert_allclose(np.asarray(u), np.asarray(-f / 2),
                                   atol=1e-2)


@pytest.mark.parametrize("n", [8, 9, 16, 33])
def test_fft2_real_matches_complex(n):
    x = jnp.asarray(RNG.standard_normal((n, n)))
    np.testing.assert_allclose(
        np.asarray(spectral.fft2_real(x)), np.asarray(jnp.fft.fft2(x)),
        rtol=1e-12, atol=1e-12,
    )


def test_ifft2_pair_separation():
    A = jnp.fft.fft2(jnp.asarray(RNG.standard_normal((16, 16))))
    B = jnp.fft.fft2(jnp.asarray(RNG.standard_normal((16, 16))))
    a, b = spectral.ifft2_pair(A, B)
    np.testing.assert_allclose(np.asarray(a),
                               np.asarray(jnp.fft.ifft2(A).real),
                               rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(np.asarray(b),
                               np.asarray(jnp.fft.ifft2(B).real),
                               rtol=1e-12, atol=1e-13)


def test_pad_truncate_roundtrip():
    a = jnp.asarray(RNG.standard_normal((8, 8))
                    + 1j * RNG.standard_normal((8, 8)))
    rt = spectral.truncate_32(spectral.pad_32(a, 12, 12), 8, 8)
    np.testing.assert_array_equal(np.asarray(rt), np.asarray(a))


def test_dealias_mask_symmetric():
    m = np.asarray(spectral.dealias_mask_23(32, 32))
    # Hermitian symmetry: mask[i, j] == mask[-i % n, -j % n]
    for i in range(32):
        for j in range(32):
            assert m[i, j] == m[(-i) % 32, (-j) % 32]
    assert m[0, 0] and not m[16, 0]


def test_wavespace_guard():
    k2 = np.asarray(spectral.wavespace(16, 16, 2 * np.pi / 16,
                                       2 * np.pi / 16, jnp.float64))
    assert k2[0, 0] == pytest.approx(2e-12, rel=1e-6)  # eps^2 + eps^2
    assert k2[1, 0] == pytest.approx(1.0 + 1e-12, rel=1e-6)
    assert k2[8, 8] == pytest.approx(128.0, rel=1e-12)  # (-8)^2 + (-8)^2


def test_unknown_impl_names_rejected():
    """A typo'd variant name must never silently run (and get
    benchmarked as) the default implementation (review finding)."""
    with pytest.raises(ValueError, match="unknown DST impl"):
        spectral.dst1(jnp.ones((4, 7)), impl="half-mxu")
    with pytest.raises(ValueError, match="unknown fft impl"):
        spectral.fft_poisson_periodic(jnp.ones((8, 8)), 0.1, 0.1,
                                      impl="mxu")


def test_32_rule_rejects_odd_sizes():
    """Odd grids would come back a row short / frequency-misplaced from
    the 3/2-rule block moves; the guard fails loudly instead."""
    with pytest.raises(ValueError, match="even grid sizes"):
        spectral.truncate_32(jnp.zeros((13, 13), jnp.complex64), 9, 9)
    with pytest.raises(ValueError, match="even grid sizes"):
        spectral.pad_32(jnp.zeros((9, 9), jnp.complex64), 14, 14)
    with pytest.raises(ValueError, match="even grid sizes"):
        spectral.truncate_32_half(jnp.zeros((13, 7), jnp.complex64), 9, 9)


def test_dst1_mesh_batched_rejected():
    """The pencil constraint is only built for 2D; a batched sharded DST
    must not silently skip it (it could lower into the broken
    partitioned-FFT path)."""
    import jax

    mesh = jax.sharding.Mesh(np.array(jax.devices("cpu")[:1]), ("d",))
    with pytest.raises(NotImplementedError, match="2D"):
        spectral.dst1(jnp.ones((2, 4, 7)), mesh=mesh)
