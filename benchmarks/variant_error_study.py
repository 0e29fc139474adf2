"""On-backend solution-error study for implementation VARIANTS.

The microbench picks the fastest formulation (matmul FFTs, bf16x3
precision, fused kernels); this quantifies that the winners match the
baseline formulation's *solution*, on the same backend and dtype the
bench runs (fp32 on the TPU — where matmul precision actually changes
results; the CPU fp32 study cannot see it).

Each case steps the same fp32 initial state through a baseline step and
a variant step and reports field deltas relative to the field scale.

    python benchmarks/variant_error_study.py [--quick]

One JSON line per case; record alongside the fp32 study in BASELINE.md.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cfd_julia_tpu.jaxconfig import configure_jax  # noqa: E402

configure_jax(cache_dir="~/.cache/jax_bench_cache", min_compile_secs=1.0)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _run(step, state, steps):
    from cfd_julia_tpu.stepping import loop

    return jax.jit(lambda s: loop.run_steps(step, s, steps))(state)


def cavity_cases(nx: int, steps: int, variants):
    """One base (fst/highest) run, compared against each variant — the
    base is minutes of tunnel time at 1024^2, so it runs ONCE."""
    from cfd_julia_tpu.models import cavity

    def run_one(poisson, prec):
        cfg = cavity.CavityConfig(nx=nx, ny=nx, dt=2e-5, poisson=poisson,
                                  fft_precision=prec)
        w0 = jnp.zeros((nx + 1, nx + 1), jnp.float32)
        s = _run(cavity.make_step_fn(cfg),
                 (w0, jnp.zeros_like(w0), jnp.zeros((), jnp.float32)),
                 steps)
        return np.asarray(s[1], np.float64)

    base = run_one("fst", "highest")
    scale = np.abs(base).max()
    out = []
    for poisson, prec in variants:
        try:
            psi = run_one(poisson, prec)
            d = np.abs(psi - base)
            out.append({"case": f"cavity_{nx}_{poisson}:{prec}",
                        "steps": steps,
                        "rel_linf_psi": float(d.max() / scale),
                        "rel_l2_psi": float(np.sqrt((d ** 2).mean())
                                            / scale),
                        "psi_min_base": float(base.min()),
                        "psi_min_variant": float(psi.min())})
        except Exception as e:
            out.append({"case": f"cavity_{nx}_{poisson}:{prec}",
                        "error": repr(e)[:300]})
    return out


def ps23_case(nx: int, steps: int, fft_impl: str, prec: str):
    from cfd_julia_tpu.models import vortex

    ws = {}
    for tag, (fi, pr) in {"base": ("xla", "highest"),
                          "variant": (fft_impl, prec)}.items():
        cfg = vortex.VortexConfig(nx=nx, ny=nx, solver="ps23", dt=1e-3,
                                  fft_impl=fi, fft_precision=pr)
        step = vortex.make_spectral_step_half_packed(cfg, jnp.float32)
        h0 = jax.jit(vortex.half_init_packed)(
            vortex.initial_vorticity(cfg, jnp.float32))
        hf = _run(step, h0, steps)
        ws[tag] = np.asarray(jax.jit(
            lambda h: vortex.half_decode_packed(h, cfg.ny, jnp.float32)
        )(hf), np.float64)
    scale = np.abs(ws["base"]).max()
    d = np.abs(ws["variant"] - ws["base"])
    return {"case": f"ps23_{nx}_fft={fft_impl}:{prec}",
            "steps": steps,
            "rel_linf_w": float(d.max() / scale),
            "rel_l2_w": float(np.sqrt((d ** 2).mean()) / scale),
            "enstrophy_rel_diff": float(
                abs((ws["variant"] ** 2).sum() - (ws["base"] ** 2).sum())
                / (ws["base"] ** 2).sum())}


def mg_case(nx: int):
    """Fused Pallas V-cycle vs XLA V-cycle, plus the Chebyshev-smoothed
    form: solve to the fp32 floor and compare solutions + iteration
    counts."""
    from cfd_julia_tpu.models import poisson2d
    from cfd_julia_tpu.poisson import multigrid

    us = {}
    its = {}
    for tag, (fused, smoother) in {"base": ("off", "auto"),
                                   "variant": ("auto", "auto"),
                                   "cheb": ("off", "cheb")}.items():
        mgc = multigrid.MGConfig(tol=1e-5, max_cycles=30, fused=fused,
                                 smoother=smoother)
        cfg = poisson2d.PoissonConfig(nx=nx, ny=nx, solver="multigrid",
                                      problem="poly", mg=mgc)
        _, _, _, _, ue, f = poisson2d.build_problem(cfg, jnp.float32)
        u0 = poisson2d._dirichlet_init(ue)
        res = multigrid.solve(f, u0, cfg.dx, cfg.dy, cfg=mgc)
        us[tag] = np.asarray(res.u, np.float64)
        its[tag] = int(res.iterations)
    scale = np.abs(us["base"]).max()
    return {"case": f"mg_{nx}_fused", "cycles_base": its["base"],
            "cycles_variant": its["variant"], "cycles_cheb": its["cheb"],
            "rel_linf_u": float(np.abs(us["variant"] - us["base"]).max()
                                / scale),
            "rel_linf_u_cheb": float(np.abs(us["cheb"] - us["base"]).max()
                                     / scale)}


def _jobs(quick: bool):
    if quick:
        return [lambda: cavity_cases(128, 200, [("fst_half_mxu", "high")]),
                lambda: ps23_case(256, 50, "matmul", "high"),
                lambda: mg_case(256)]
    return [lambda: cavity_cases(1024, 500,
                                 [("fst_half_mxu", "high"),
                                  ("matmul_bf16x3", "highest"),
                                  ("matmul_bf16x1", "highest")]),
            lambda: ps23_case(2048, 60, "matmul", "high"),
            lambda: mg_case(2048)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--job", type=int, default=None,
                    help="internal: run ONE case family in this process")
    ap.add_argument("--job-timeout", type=float, default=1100.0)
    args = ap.parse_args()
    jobs = _jobs(args.quick)

    if args.job is not None:
        # worker mode: one family per interpreter
        try:
            t0 = time.perf_counter()
            rs = jobs[args.job]()
            if isinstance(rs, dict):
                rs = [rs]
            wall = round(time.perf_counter() - t0, 2)
            for r in rs:
                r["wall_s"] = wall
                print(json.dumps(r), flush=True)
        except Exception as e:
            print(json.dumps({"error": repr(e)[:300]}), flush=True)
        return

    # orchestrator: one subprocess per family — a single UNIMPLEMENTED op
    # poisons a process's TPU client (CLAUDE.md), so the families must
    # never share one (same isolation contract as bench.py/run_tpu_smoke)
    import subprocess

    for i in range(len(jobs)):
        cmd = [sys.executable, os.path.abspath(__file__), f"--job={i}"]
        if args.quick:
            cmd.append("--quick")
        try:
            r = subprocess.run(cmd, timeout=args.job_timeout,
                               capture_output=True, text=True)
            sys.stdout.write(r.stdout)
            sys.stderr.write(r.stderr[-2000:])
            if r.returncode != 0 and not r.stdout.strip():
                print(json.dumps({"job": i,
                                  "error": f"worker rc={r.returncode}: "
                                           + r.stderr[-200:]}), flush=True)
        except subprocess.TimeoutExpired:
            print(json.dumps({"job": i,
                              "error": f"timeout {args.job_timeout}s"}),
                  flush=True)
        sys.stdout.flush()


if __name__ == "__main__":
    main()
