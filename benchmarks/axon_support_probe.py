"""Characterize which complex/FFT patterns the remote-TPU backend supports.

Findings (2026-08-16, the rules the framework is built to): complex64
INTERMEDIATES inside a jitted program work (XLA lowers them to real
arithmetic + the FFT custom call); complex64 at a jit BOUNDARY (params,
outputs) or on a host transfer fails with UNIMPLEMENTED or hangs — and
the first failure poisons the process's TPU client (afterwards even a
bare iota fails), so each case runs in its own subprocess.  Support also
varied BETWEEN tunnel sessions (early probes accepted complex jit
outputs, later ones rejected them), hence the conservative contract:
real-only boundaries everywhere (ops.spectral.pack_c/unpack_c).

Usage: python benchmarks/axon_support_probe.py         # all, table
       python benchmarks/axon_support_probe.py CASE    # one, in-process
"""
import subprocess
import sys

import numpy as np


def build(case):
    import jax
    import jax.numpy as jnp

    jax.devices()
    r = jnp.asarray(np.random.randn(64, 64), jnp.float32)
    c = jnp.complex64
    rmask = jnp.asarray(np.random.randn(64, 33), jnp.float32)
    cmask = jnp.asarray(
        (np.random.randn(64, 33) + 1j * np.random.randn(64, 33)).astype(np.complex64))

    if case == "rfft2":
        f = jax.jit(lambda x: jnp.fft.rfft2(x))
        y = f(r); return float(jnp.abs(y).sum())
    if case == "rfft2_x_rmask":
        f = jax.jit(lambda x: jnp.fft.rfft2(x) * rmask)
        y = f(r); return float(jnp.abs(y).sum())
    if case == "rfft2_x_cmask":
        f = jax.jit(lambda x: jnp.fft.rfft2(x) * cmask)
        y = f(r); return float(jnp.abs(y).sum())
    if case == "rfft2_x_rmask_realout":
        f = jax.jit(lambda x: jnp.abs(jnp.fft.rfft2(x) * rmask).sum())
        return float(f(r))
    if case == "cparam_elemwise":
        f = jax.jit(lambda z: jnp.abs(z * 2.0).sum())
        return float(f(cmask))
    if case == "cparam_cmul":
        f = jax.jit(lambda z: jnp.abs(z * (1 + 1j)).sum())
        return float(f(cmask))
    if case == "cparam_fft":
        f = jax.jit(lambda z: jnp.abs(jnp.fft.fft(z, axis=-1)).sum())
        return float(f(cmask))
    if case == "cparam_pad_fft":
        f = jax.jit(lambda z: jnp.abs(jnp.fft.fft(jnp.pad(z, ((0, 0), (0, 31))), axis=-1)).sum())
        return float(f(cmask))
    if case == "internal_c_fft":
        f = jax.jit(lambda x: jnp.abs(jnp.fft.fft(x.astype(c), axis=-1)).sum())
        return float(f(r))
    if case == "internal_c_from_pair_fft":
        f = jax.jit(lambda x: jnp.abs(jnp.fft.fft(x + 1j * (2 * x), axis=-1)).sum())
        return float(f(r))
    if case == "cout_from_elemwise":
        f = jax.jit(lambda x: x.astype(c) * (1 + 2j))
        y = f(r); return float(jnp.abs(y).sum())
    if case == "rfft2_then_second_jit_fft":
        h = jax.jit(lambda x: jnp.fft.rfft2(x))(r)
        f = jax.jit(lambda z: jnp.abs(jnp.fft.fft(z, axis=-2)).sum())
        return float(f(h))
    if case == "scan_complex_carry":
        from jax import lax
        def step(hh):
            return hh * cmask
        f = jax.jit(lambda x: jnp.abs(lax.scan(
            lambda cc, _: (step(cc), 0.0),
            jnp.fft.rfft2(x) , None, length=3)[0]).sum())
        return float(f(r))
    if case == "scan_complex_carry_fft":
        from jax import lax
        def step(hh):
            full = jnp.concatenate([hh, jnp.conj(hh[:, ::-1][:, 1:-1])], axis=1)
            z = jnp.fft.ifft2(full)
            return jnp.fft.rfft2(z.real * z.imag)
        f = jax.jit(lambda x: jnp.abs(lax.scan(
            lambda cc, _: (step(cc), 0.0),
            jnp.fft.rfft2(x), None, length=3)[0]).sum())
        return float(f(r))
    raise ValueError(case)


CASES = [
    "rfft2", "rfft2_x_rmask", "rfft2_x_cmask", "rfft2_x_rmask_realout",
    "cparam_elemwise", "cparam_cmul", "cparam_fft", "cparam_pad_fft",
    "internal_c_fft", "internal_c_from_pair_fft", "cout_from_elemwise",
    "rfft2_then_second_jit_fft", "scan_complex_carry",
    "scan_complex_carry_fft",
]

if __name__ == "__main__":
    if len(sys.argv) > 1:
        print("RESULT", build(sys.argv[1]))
        sys.exit(0)
    for case in CASES:
        try:
            # cold remote compiles take MINUTES (tpu-env-quirks); a
            # short cap would report supported patterns as TIMEOUT and
            # corrupt the support table this tool exists to produce
            p = subprocess.run([sys.executable, __file__, case],
                               capture_output=True, text=True, timeout=900)
            ok = p.returncode == 0 and "RESULT" in p.stdout
            out_lines = p.stdout.strip().splitlines()
            err_lines = (p.stderr or "").strip().splitlines()
            msg = out_lines[-1] if ok and out_lines else \
                (err_lines[-1][:110] if err_lines else "?")
        except subprocess.TimeoutExpired:
            ok, msg = False, "TIMEOUT"
        print(f"{'PASS' if ok else 'FAIL':4} {case:28} {msg}", flush=True)
