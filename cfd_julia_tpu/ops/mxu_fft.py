"""Four-step (Bailey) FFT as MXU matmuls.

XLA's TPU FFT runs on the VPU; at pseudospectral sizes (2048^2 c64 ~1 ms
per transform, round-1 measurement) it is the entire cost of the ps23
step.  The Cooley-Tukey split n = n1*n2 turns one length-n DFT into

    X[k1,k2] = sum_j2 ( TW[k1,j2] * sum_j1 x[j1,j2] F1[k1,j1] ) F2[j2,k2]

i.e. two dense matmuls (n1 x n1 and n2 x n2, batched over the other
index) plus an elementwise twiddle — exactly what the 128x128 systolic
array is for.  FLOPs grow by (n1+n2)/log2(n) (~9x at n=2048) but MXU
peak is 1-2 orders above VPU FFT throughput, so the matmul form can win;
benchmarks/tpu_microbench.py measures it against jnp.fft and the
auto-selection stays data-driven.

Index conventions (decimation-in-time): j = j1 + n1*j2, k = k2 + n2*k1;
the input gather is one (.., n2, n1) -> (.., n1, n2) transpose, the
output is already in natural order.  Any COMPOSITE n works (the DFT
factors are dense matrices — no radix restriction); _split picks the
most balanced factor pair, and prime lengths raise.

fp32 inputs use precision="highest" matmuls (3-pass bf16 ~ fp32
accuracy); fp64 (CPU tests) is exact to roundoff.
"""
from __future__ import annotations

import functools

import numpy as np

import jax.numpy as jnp


def _split(n: int) -> tuple[int, int]:
    """Most balanced factor pair (n1 >= n2); any composite n works —
    the DFT factors are dense matrices, no radix restriction."""
    for n1 in range(int(n**0.5), 1, -1):
        if n % n1 == 0:
            return n // n1, n1
    raise ValueError(f"mxu_fft requires composite length, got prime {n}")


def supported(n: int) -> bool:
    try:
        _split(n)
        return True
    except ValueError:
        return False


@functools.lru_cache(maxsize=None)
def _consts_np(n: int, inverse: bool):
    """(F1, TW, F2) as float64 numpy complex — cast at use site.

    With j = j1 + n1*j2 and k = k2 + n2*k1:
        X[k1,k2] = sum_j1 F1[k1,j1] * TW[j1,k2]
                   * ( sum_j2 x[j1,j2] F2[j2,k2] )
    (the twiddle couples the INNER input index j1 with the inner output
    index k2 — the n2-point transform runs first)."""
    n1, n2 = _split(n)
    sign = 2j if inverse else -2j
    j1 = np.arange(n1)
    j2 = np.arange(n2)
    f1 = np.exp(sign * np.pi * np.outer(j1, j1) / n1)      # [k1, j1]
    tw = np.exp(sign * np.pi * np.outer(j1, j2) / n)       # [j1, k2]
    f2 = np.exp(sign * np.pi * np.outer(j2, j2) / n2)      # [j2, k2]
    return f1, tw, f2


def _apply_last(x, n: int, inverse: bool):
    n1, n2 = _split(n)
    cdtype = x.dtype if jnp.issubdtype(x.dtype, jnp.complexfloating) else (
        jnp.complex128 if x.dtype == jnp.float64 else jnp.complex64)
    f1, tw, f2 = (jnp.asarray(a, cdtype) for a in _consts_np(n, inverse))
    # x[..., j] with j = j1 + n1*j2  ->  xm[..., j1, j2]
    xm = jnp.swapaxes(x.reshape(x.shape[:-1] + (n2, n1)), -1, -2)
    y = jnp.einsum("...ab,bc->...ac", xm, f2, precision="highest")
    z = y * tw
    out = jnp.einsum("ka,...ac->...kc", f1, z, precision="highest")
    if inverse:
        out = out / n
    # out[..., k1, k2] flattens to k = k2 + n2*k1 (natural order)
    return out.reshape(x.shape[:-1] + (n,))


def fft_matmul(x, axis: int = -1):
    """DFT along `axis` via two MXU matmuls; matches jnp.fft.fft."""
    x = jnp.moveaxis(x, axis, -1)
    out = _apply_last(x, x.shape[-1], inverse=False)
    return jnp.moveaxis(out, -1, axis)


def ifft_matmul(x, axis: int = -1):
    x = jnp.moveaxis(x, axis, -1)
    out = _apply_last(x, x.shape[-1], inverse=True)
    return jnp.moveaxis(out, -1, axis)


def fft2_matmul(x):
    """2D DFT over the last two axes; matches jnp.fft.fft2."""
    return fft_matmul(fft_matmul(x, axis=-1), axis=-2)


def ifft2_matmul(x):
    return ifft_matmul(ifft_matmul(x, axis=-1), axis=-2)


def rfft2_matmul(x):
    """rfft2 of a REAL field: full matmul transform along the last axis
    keeps only the non-redundant half before the (complex) second axis —
    the first-axis matmuls run on real input (XLA uses real multiplies
    for the real operand), so cost is close to a true rfft."""
    n = x.shape[-1]
    half = _apply_last(x, n, inverse=False)[..., : n // 2 + 1]
    return fft_matmul(half, axis=-2)
