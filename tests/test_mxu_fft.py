"""Four-step MXU matmul FFT vs jnp.fft (exactness in fp64, tolerance in
fp32), all layouts the solvers use: 1D lines, batched 2D, rfft2."""
import numpy as np
import pytest

import jax.numpy as jnp

from cfd_julia_tpu.ops import mxu_fft

RNG = np.random.default_rng(42)


@pytest.mark.parametrize("n", [16, 64, 128, 512])
def test_fft_matmul_matches(n):
    x = jnp.asarray(RNG.standard_normal((5, n))
                    + 1j * RNG.standard_normal((5, n)))
    np.testing.assert_allclose(np.asarray(mxu_fft.fft_matmul(x)),
                               np.asarray(jnp.fft.fft(x)),
                               rtol=1e-10, atol=1e-9)
    np.testing.assert_allclose(np.asarray(mxu_fft.ifft_matmul(x)),
                               np.asarray(jnp.fft.ifft(x)),
                               rtol=1e-10, atol=1e-12)


def test_fft_matmul_axis0():
    x = jnp.asarray(RNG.standard_normal((64, 7))
                    + 1j * RNG.standard_normal((64, 7)))
    np.testing.assert_allclose(np.asarray(mxu_fft.fft_matmul(x, axis=0)),
                               np.asarray(jnp.fft.fft(x, axis=0)),
                               rtol=1e-10, atol=1e-9)


@pytest.mark.parametrize("shape", [(64, 64), (2, 32, 128)])
def test_fft2_matmul_matches(shape):
    x = jnp.asarray(RNG.standard_normal(shape)
                    + 1j * RNG.standard_normal(shape))
    np.testing.assert_allclose(np.asarray(mxu_fft.fft2_matmul(x)),
                               np.asarray(jnp.fft.fft2(x)),
                               rtol=1e-9, atol=1e-8)
    np.testing.assert_allclose(np.asarray(mxu_fft.ifft2_matmul(x)),
                               np.asarray(jnp.fft.ifft2(x)),
                               rtol=1e-9, atol=1e-11)


def test_rfft2_matmul_matches():
    x = jnp.asarray(RNG.standard_normal((64, 128)))
    np.testing.assert_allclose(np.asarray(mxu_fft.rfft2_matmul(x)),
                               np.asarray(jnp.fft.rfft2(x)),
                               rtol=1e-10, atol=1e-9)


def test_fp32_accuracy():
    """fp32 matmul-FFT error stays near jnp.fft's own fp32 error."""
    x64 = RNG.standard_normal((128, 128)) + 1j * RNG.standard_normal((128, 128))
    ref = np.fft.fft2(x64)
    x32 = jnp.asarray(x64, jnp.complex64)
    err_mm = np.abs(np.asarray(mxu_fft.fft2_matmul(x32)) - ref).max()
    err_jx = np.abs(np.asarray(jnp.fft.fft2(x32)) - ref).max()
    scale = np.abs(ref).max()
    assert err_mm / scale < 1e-5, (err_mm / scale, err_jx / scale)
    assert err_mm < 20 * err_jx + 1e-4 * scale


@pytest.mark.parametrize("n", [48, 96, 3072 // 16])
def test_composite_lengths(n):
    x = jnp.asarray(RNG.standard_normal((3, n))
                    + 1j * RNG.standard_normal((3, n)))
    np.testing.assert_allclose(np.asarray(mxu_fft.fft_matmul(x)),
                               np.asarray(jnp.fft.fft(x)),
                               rtol=1e-10, atol=1e-9)


def test_prime_length_handling():
    """Primes <= 128 run as one dense matmul; larger primes (no composite
    split, dense matrix would be huge) still raise."""
    x = jnp.asarray(np.random.default_rng(3).standard_normal((4, 37)),
                    jnp.complex128)
    np.testing.assert_allclose(np.asarray(mxu_fft.fft_matmul(x)),
                               np.fft.fft(np.asarray(x)),
                               rtol=1e-12, atol=1e-11)
    with pytest.raises(ValueError):
        mxu_fft.fft_matmul(jnp.zeros((4, 131), jnp.complex128))
