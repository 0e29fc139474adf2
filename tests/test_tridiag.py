"""Tridiagonal engine vs scipy dense/banded solves."""
import numpy as np
import pytest
import scipy.linalg

from cfd_julia_tpu.ops import tridiag


def _random_system(n, rng, dominant=True):
    a = rng.standard_normal(n)
    b = rng.standard_normal(n)
    c = rng.standard_normal(n)
    if dominant:
        b = 3.0 + np.abs(a) + np.abs(c) + np.abs(b)
    d = rng.standard_normal(n)
    a[0] = 0.0
    c[-1] = 0.0
    return a, b, c, d


def _dense(a, b, c):
    n = len(b)
    m = np.diag(b)
    m += np.diag(a[1:], -1)
    m += np.diag(c[:-1], 1)
    return m


@pytest.mark.parametrize("method", ["pcr", "thomas"])
@pytest.mark.parametrize("n", [2, 3, 8, 17, 100, 257])
def test_solve_matches_scipy(method, n):
    rng = np.random.default_rng(n)
    a, b, c, d = _random_system(n, rng)
    x_ref = scipy.linalg.solve(_dense(a, b, c), d)
    x = tridiag.solve(a, b, c, d, method=method)
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("method", ["pcr", "thomas"])
def test_batched(method):
    rng = np.random.default_rng(0)
    n, batch = 64, 5
    systems = [_random_system(n, rng) for _ in range(batch)]
    a, b, c, d = (np.stack([s[i] for s in systems]) for i in range(4))
    x = tridiag.solve(a, b, c, d, method=method)
    for k in range(batch):
        x_ref = scipy.linalg.solve(_dense(a[k], b[k], c[k]), d[k])
        np.testing.assert_allclose(np.asarray(x[k]), x_ref, rtol=1e-9, atol=1e-10)


def test_broadcast_same_matrix_multiple_rhs():
    rng = np.random.default_rng(1)
    n = 33
    a, b, c, _ = _random_system(n, rng)
    d = rng.standard_normal((4, n))
    x = tridiag.solve(a, b, c, d)
    m = _dense(a, b, c)
    for k in range(4):
        np.testing.assert_allclose(
            np.asarray(x[k]), scipy.linalg.solve(m, d[k]), rtol=1e-9, atol=1e-10
        )


@pytest.mark.parametrize("method", ["pcr", "thomas"])
@pytest.mark.parametrize("n", [4, 16, 101])
def test_cyclic(method, n):
    rng = np.random.default_rng(n + 1000)
    a, b, c, d = _random_system(n, rng)
    # corner couplings (periodic wrap)
    a[0] = rng.standard_normal() * 0.3
    c[-1] = rng.standard_normal() * 0.3
    m = _dense(a, b, c)
    m[0, -1] = a[0]
    m[-1, 0] = c[-1]
    x_ref = scipy.linalg.solve(m, d)
    x = tridiag.solve_cyclic(a, b, c, d, method=method)
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-8, atol=1e-9)
