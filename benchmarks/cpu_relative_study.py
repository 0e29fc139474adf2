"""CPU-backend RELATIVE timing study of every raced bench variant.

Insurance for tunnel downtime (VERDICT r3 item 7): measure each raced
cavity/ps23/mg variant on the CPU backend with identical scan windows,
so the on-chip race can be pruned to the plausible winners when only a
short tunnel window is available.

    *** CPU ratios DO NOT transfer to TPU. ***

The CPU has no MXU (matmul-form transforms lose on CPU but are the
projected TPU winners), XLA:CPU fuses differently, Pallas kernels run
in interpreter mode (orders slower — they are SKIPPED here), and
precision hints are ignored (bf16x3 variants time like fp32 matmul).
Use only for (a) smoke-testing that a variant runs its full window and
(b) ranking variants that differ in DATAFLOW (pair_impl, fused edges,
fmg), where the relative pattern is at least directionally meaningful.

    JAX_PLATFORMS=cpu python benchmarks/cpu_relative_study.py [--quick]

Writes one JSON line per variant + a markdown ratio table to stdout;
log to benchmarks/results/ and summarize in docs/PERF.md.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import bench  # noqa: E402


def _pallas(variant: str) -> bool:
    """Variants whose hot path is a Pallas kernel: interpreter-mode-only
    on CPU, orders slower, not comparable.  mg variants are
    transfers,fused,fmg[,smoother] — parse the fused FIELD rather than
    suffix-matching so 4-field tuples are classified correctly."""
    parts = variant.split(",")
    return "pallas" in parts or (len(parts) >= 3 and parts[1] == "on")


def run_variant(worker: str, variant: str, nx: int, steps: int, tol: float,
                timeout_s: float):
    """bench._spawn_variant pinned to the CPU backend, wall-stamped —
    one implementation of the worker-subprocess contract, not two."""
    t0 = time.perf_counter()
    r = bench._spawn_variant(worker, variant, nx, steps, tol, timeout_s,
                             env={**os.environ, "JAX_PLATFORMS": "cpu"})
    if "error" not in r:
        r["wall_s"] = round(time.perf_counter() - t0, 1)
    return r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="smaller grids/windows (CI smoke)")
    ap.add_argument("--timeout", type=float, default=1500.0)
    args = ap.parse_args()

    if args.quick:
        plan = [("cavity", bench.CAVITY_VARIANTS, 128, 30, 0.0),
                ("ps23", bench.PS_VARIANTS, 128, 10, 0.0),
                ("mg", bench.MG_VARIANTS, 256, 0, 1e-5)]
    else:
        plan = [("cavity", bench.CAVITY_VARIANTS, 512, 100, 0.0),
                ("ps23", bench.PS_VARIANTS, 512, 30, 0.0),
                ("mg", bench.MG_VARIANTS, 1024, 0, 1e-5)]

    tables = {}
    for worker, variants, nx, steps, tol in plan:
        rows = []
        for v in variants:
            vstr = ",".join(v) if isinstance(v, tuple) else v
            if _pallas(vstr):
                rows.append({"worker": worker, "variant": vstr,
                             "skipped": "pallas interpreter mode on CPU "
                                        "(orders slower; not comparable)"})
                print(json.dumps(rows[-1]), flush=True)
                continue
            r = run_variant(worker, vstr, nx, steps, tol, args.timeout)
            r.update(nx=nx)
            rows.append(r)
            print(json.dumps(r), flush=True)
        tables[worker] = rows

    print("\n## CPU relative ratios (CPU != TPU; see module docstring)\n")
    for worker, rows in tables.items():
        ok = [r for r in rows if "value" in r]
        if not ok:
            continue
        minimize = worker == "mg"
        best = min(r["value"] for r in ok) if minimize \
            else max(r["value"] for r in ok)
        print(f"### {worker} (nx per table, {'s' if minimize else 'steps/s'})")
        print("| variant | value | vs best |")
        print("|---|---|---|")
        for r in rows:
            if "value" in r:
                ratio = (best / r["value"]) if not minimize \
                    else (r["value"] / best)
                print(f"| {r['variant']} | {r['value']:.4g} "
                      f"| {ratio:.2f}x |")
            else:
                state = "skipped" if r.get("skipped") else "ERROR"
                print(f"| {r['variant']} | {state} | - |")
        print()


if __name__ == "__main__":
    main()
