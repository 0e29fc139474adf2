"""Multi-chip scaling harness: times the sharded cavity and spectral
vortex steps on an n-device mesh vs the single-device step.

On this image only virtual CPU devices exist (the driver validates the
same paths via __graft_entry__.dryrun_multichip); on a real TPU pod the
same script reports the actual scaling curve.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/multichip_scaling.py --nx 256 --devices 1,2,4,8

One JSON line per (problem, n_devices).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cfd_julia_tpu.jaxconfig import configure_jax

configure_jax(cache_dir="~/.cache/jax_bench_cache", min_compile_secs=1.0)


def timed_steps(step, state, iters=20, repeats=3):
    run = jax.jit(lambda s: lax.scan(
        lambda c, _: (step(c), 0.0), s, None, length=iters)[0])
    out = run(state)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    best = float("inf")
    for r in range(repeats):
        sr = jax.tree.map(
            lambda a: a + jnp.asarray(1e-6 * (r + 1), a.dtype), state)
        t0 = time.perf_counter()
        out = run(sr)
        s = sum(float(jnp.abs(a).sum()) for a in jax.tree.leaves(out))
        best = min(best, (time.perf_counter() - t0) / iters)
        assert np.isfinite(s)
    return best


def bench_point(nx: int, ndev: int):
    from cfd_julia_tpu.models import cavity, vortex
    from cfd_julia_tpu.parallel import mesh as mesh_lib, sharded

    devices = jax.devices()[:ndev]
    mesh = mesh_lib.make_mesh(devices)

    cfg = cavity.CavityConfig(nx=nx, ny=nx, dt=2e-5)
    step = sharded.make_sharded_cavity_step(cfg, mesh)
    w0 = sharded.place(
        sharded.pad_to_mesh(jnp.zeros((nx + 1, nx + 1), jnp.float32), mesh),
        mesh)
    st = (w0, jnp.zeros_like(w0), jnp.zeros((), jnp.float32))
    ms = timed_steps(step, st) * 1e3
    print(json.dumps({"bench": f"sharded_cavity_{nx}",
                      "devices": ndev, "ms_per_step": round(ms, 3)}),
          flush=True)

    vcfg = vortex.VortexConfig(nx=nx, ny=nx, solver="ps23", dt=1e-3)
    vstep = sharded.make_sharded_vortex_step(vcfg, mesh, jnp.float32)
    wf0 = sharded.place(
        jnp.fft.fft2(vortex.initial_vorticity(vcfg, jnp.float32)
                     .astype(jnp.complex64)), mesh)
    ms = timed_steps(vstep, wf0) * 1e3
    print(json.dumps({"bench": f"sharded_ps23_{nx}",
                      "devices": ndev, "ms_per_step": round(ms, 3)}),
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=256)
    ap.add_argument("--devices", default="1,2,4,8")
    args = ap.parse_args()
    avail = len(jax.devices())
    print(f"# {avail} devices ({jax.devices()[0].platform})",
          file=sys.stderr)
    for nd in (int(v) for v in args.devices.split(",")):
        if nd > avail:
            print(f"# skipping n={nd} (> {avail} available)",
                  file=sys.stderr)
            continue
        bench_point(args.nx, nd)


if __name__ == "__main__":
    main()
