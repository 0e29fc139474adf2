"""Command-line interface.

    python -m cfd_julia_tpu list
    python -m cfd_julia_tpu run <preset> [--outdir DIR] [--nx N] [--dt X] ...
    python -m cfd_julia_tpu bench [--nx N] [--steps N]
    python -m cfd_julia_tpu validate

Replaces the reference's run.sh + per-script hardcoded constants
(SURVEY §5 config system). `run` accepts any config dataclass field of
the preset as a --key value override; values parse as int/float/str.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys


def _parse_value(field_type, raw: str):
    for cast in (int, float):
        try:
            v = cast(raw)
            if cast is int and "." in raw:
                continue
            return v
        except ValueError:
            continue
    return raw


def cmd_list(_args):
    from cfd_julia_tpu import presets

    for name in sorted(presets.PRESETS):
        p = presets.PRESETS[name]
        print(f"{name:28s} [{p.family:8s}] {p.reference}")
        if p.description:
            print(f"{'':28s}   {p.description}")
    return 0


def cmd_run(args, extra):
    from cfd_julia_tpu import presets, run

    preset = presets.get(args.preset)
    overrides = {}
    fields = {f.name: f for f in dataclasses.fields(preset.cfg)}
    i = 0
    while i < len(extra):
        key = extra[i].lstrip("-")
        if key not in fields:
            print(f"unknown override --{key} for preset {args.preset}; "
                  f"fields: {', '.join(fields)}", file=sys.stderr)
            return 2
        overrides[key] = _parse_value(fields[key].type, extra[i + 1])
        i += 2
    metrics = run.run_preset(args.preset, outdir=args.outdir, **overrides)
    print(json.dumps(metrics, indent=2))
    return 0


def cmd_bench(args):
    import bench as bench_mod  # repo-root bench

    if args.nx:
        sps = bench_mod.bench_cavity(nx=args.nx, steps=args.steps)
        print(json.dumps({"metric": f"cavity_{args.nx}_steps_per_sec",
                          "value": round(sps, 2), "unit": "steps/s"}))
    else:
        bench_mod.main()
    return 0


def cmd_validate(_args):
    """Quick validation sweep: one representative run per family."""
    import numpy as np

    from cfd_julia_tpu.models import (burgers1d, cavity, euler1d, heat1d,
                                      poisson2d, vortex)

    ok = True

    def check(name, value, tol):
        nonlocal ok
        good = value < tol
        ok &= good
        print(f"{'PASS' if good else 'FAIL'} {name}: {value:.3e} (tol {tol:g})")

    r = heat1d.solve(heat1d.HeatConfig(scheme="icp"))
    check("heat icp L2", float(r.l2_error), 1e-5)
    rb = burgers1d.solve(burgers1d.BurgersConfig(nx=200, t_final=0.25))
    check("burgers finite/bounded", float(abs(np.asarray(rb.u)).max()) - 1.0, 0.05)
    re_ = euler1d.solve(euler1d.EulerConfig(nx=256))
    rho = np.asarray(re_.q[0])
    check("euler sod rho positivity", float(-(rho.min())), 0.0 + 1e-12)
    rp = poisson2d.solve(poisson2d.PoissonConfig(nx=64, ny=64,
                                                 solver="multigrid",
                                                 problem="poly"))
    check("poisson mg error", float(rp.linf_error), 1e-5)
    rc = cavity.solve(cavity.CavityConfig(t_final=2.0))
    check("cavity steady progress", float(rc.rms_history[-1]), 1e-4)
    cfgv = vortex.VortexConfig(nx=64, ny=64, solver="ps23", dt=0.01,
                               t_final=1.0, re=10.0, ic="tgv", ns=1)
    rv = vortex.solve(cfgv)
    check("tgv spectral L2", float(vortex.tgv_error(cfgv, rv)[0]), 1e-4)
    print("validate:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


def main(argv=None):
    parser = argparse.ArgumentParser(prog="cfd_julia_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list")
    pr = sub.add_parser("run")
    pr.add_argument("preset")
    pr.add_argument("--outdir", default="out")
    pb = sub.add_parser("bench")
    pb.add_argument("--nx", type=int, default=0)
    pb.add_argument("--steps", type=int, default=200)
    sub.add_parser("validate")

    args, extra = parser.parse_known_args(argv)
    if args.cmd == "list":
        return cmd_list(args)
    if args.cmd == "run":
        return cmd_run(args, extra)
    if args.cmd == "bench":
        return cmd_bench(args)
    if args.cmd == "validate":
        return cmd_validate(args)
    return 2


if __name__ == "__main__":
    sys.exit(main())
