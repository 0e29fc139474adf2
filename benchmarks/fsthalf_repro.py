"""Minimal on-chip reproducer + fusion bisection for the fst_half
physics reject (cavity 1024^2: psi_l2 19% low with the XLA RHS, correct
with the Pallas RHS — bench_full_20260818T102642.log).

Hypothesis: with the XLA RHS the whole step is one fusible program and
some fusion across the half-length DST pre/post passes miscompiles on
the TPU backend; the Pallas RHS custom call is a fusion barrier that
hides it.  This script steps a small cavity with poisson="fst" (ground
truth) vs "fst_half", then retries "fst_half" with an
optimization_barrier inserted at candidate seams inside
spectral._dst1_half_last to find the miscompiling fusion.

Usage: python benchmarks/fsthalf_repro.py [--nx 128] [--steps 6]
(requires the axon TPU tunnel; run in its own process — a poisoned TPU
client does not recover).
"""
import argparse
import functools

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=128)
    ap.add_argument("--steps", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cfd_julia_tpu.models import cavity
    from cfd_julia_tpu.ops import spectral

    print(f"# devices: {jax.devices()}")
    nx = args.nx

    def run(poisson, rhs_impl="xla"):
        cfg = cavity.CavityConfig(nx=nx, ny=nx, poisson=poisson,
                                  rhs_impl=rhs_impl)
        step = jax.jit(cavity.make_step_fn(cfg))
        w0 = jnp.zeros((nx + 1, nx + 1), jnp.float32)
        st = (w0, jnp.zeros_like(w0), jnp.zeros((), jnp.float32))
        for _ in range(args.steps):
            st = step(st)
        return np.asarray(st[1])

    base = run("fst")
    scale = max(np.abs(base).max(), 1e-30)

    def rel(x):
        return np.abs(x - base).max() / scale

    print(f'{{"case": "fst_half+xla", "rel": {rel(run("fst_half")):.3e}}}')
    print(f'{{"case": "fst_half+pallas", "rel": '
          f'{rel(run("fst_half", "pallas")):.3e}}}')

    # --- bisection: barrier at one seam of _dst1_half_last at a time ---
    orig = spectral._dst1_half_last

    def patched(v, rfft_fn=None, *, seam):
        bar = jax.lax.optimization_barrier
        m = v.shape[-1]
        n = m + 1
        dtype = v.dtype
        if seam == "input":
            v = bar(v)
        jj = jnp.arange(1, n, dtype=dtype)
        s = jnp.sin(jnp.pi * jj / n)
        b = v[..., ::-1]
        if seam == "reverse":
            b = bar(b)
        y1 = s * (v + b) + 0.5 * (v - b)
        y = jnp.concatenate(
            [jnp.zeros(v.shape[:-1] + (1,), dtype), y1], axis=-1)
        if seam == "pre":
            y = bar(y)
        Y = (rfft_fn or (lambda a: jnp.fft.rfft(a, axis=-1)))(y)
        if seam == "fft":
            Y = bar(Y)
        re = jnp.real(Y).astype(dtype)
        im = jnp.imag(Y).astype(dtype)
        odd = jnp.cumsum(re, axis=-1) - 0.5 * re[..., :1]
        if seam == "cumsum":
            odd = bar(odd)
        n_odd = (m + 1) // 2
        n_even = m // 2
        odd = odd[..., :n_odd]
        even = -im[..., 1 : n_even + 1]
        if n_even < n_odd:
            even = jnp.concatenate(
                [even, jnp.zeros(v.shape[:-1] + (n_odd - n_even,), dtype)],
                axis=-1)
        inter = jnp.stack([odd, even], axis=-1).reshape(
            v.shape[:-1] + (2 * n_odd,))
        if seam == "output":
            inter = bar(inter)
        return inter[..., :m]

    for seam in ("input", "reverse", "pre", "fft", "cumsum", "output"):
        spectral._dst1_half_last = functools.partial(patched, seam=seam)
        try:
            r = rel(run("fst_half"))
        finally:
            spectral._dst1_half_last = orig
        print(f'{{"case": "fst_half+xla barrier@{seam}", "rel": {r:.3e}}}')


if __name__ == "__main__":
    main()
