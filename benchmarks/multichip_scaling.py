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
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cfd_julia_tpu.jaxconfig import configure_jax

configure_jax(cache_dir="~/.cache/jax_bench_cache", min_compile_secs=1.0)

# the canonical scan-window timer (warm-up, additive perturb with host
# sync, min over repeats) — one methodology, one implementation
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from tpu_microbench import timed  # noqa: E402


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
    timed(f"sharded_cavity_{nx}_dev{ndev}", step, st)

    from cfd_julia_tpu.ops import spectral

    vcfg = vortex.VortexConfig(nx=nx, ny=nx, solver="ps23", dt=1e-3)
    vstep = sharded.make_sharded_vortex_step(vcfg, mesh, jnp.float32)
    # packed real boundary (complex64 jit params poison the TPU client)
    hf0 = jax.device_put(
        jax.jit(lambda w: spectral.pack_c(
            jnp.fft.fft2(w.astype(jnp.complex64))))(
            vortex.initial_vorticity(vcfg, jnp.float32)),
        sharded.packed_full_sharding(mesh))
    timed(f"sharded_ps23_{nx}_dev{ndev}", vstep, hf0)

    # the half-spectrum packed fast path (round-3 mesh extension)
    hstep = sharded.make_sharded_vortex_step_half(vcfg, mesh, jnp.float32)
    h0 = jax.device_put(
        jax.jit(vortex.half_init_packed)(
            vortex.initial_vorticity(vcfg, jnp.float32)),
        sharded.packed_half_sharding(mesh))
    timed(f"sharded_ps23_half_{nx}_dev{ndev}", hstep, h0)


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
