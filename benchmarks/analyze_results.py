"""Summarize a microbench log: winner per family + auto-selection hints.

    python benchmarks/analyze_results.py benchmarks/results/microbench_full_*.log

Groups the JSON lines by family prefix, prints each family sorted by
time with the winner marked, and emits the auto-selection implications
(MG transfers/smoother/fused, cavity poisson=, ps23 fft/pair impl) so
heuristic updates stay tied to data."""
from __future__ import annotations

import json
import sys
from collections import OrderedDict

FAMILIES = OrderedDict([
    ("fft2", "raw 2D transform race"),
    ("fst", "DST-I Poisson solve"),
    ("cavpart", "cavity step component breakdown"),
    ("cavity", "cavity step"),
    ("ps23", "ps23 step"),
    ("restrict", "MG restriction (+conv prolong round trip)"),
    ("prolong", "MG prolongation (+conv restrict round trip)"),
    ("edge", "fused V-cycle edges vs XLA"),
    ("vcycle", "full V-cycle"),
    ("arakawa", "vortex RHS"),
    ("euler", "Euler RHS"),
])


def main(paths):
    rows = []
    for p in paths:
        with open(p) as fh:
            for line in fh:
                line = line.strip()
                if not line.startswith("{"):
                    continue
                try:
                    rows.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
    by_family = OrderedDict((k, []) for k in FAMILIES)
    other = []
    for r in rows:
        name = r.get("bench", "")
        for fam in FAMILIES:
            if name.startswith(fam):
                by_family[fam].append(r)
                break
        else:
            other.append(r)

    for fam, items in by_family.items():
        if not items:
            continue
        print(f"\n== {fam}: {FAMILIES[fam]}")
        timed = sorted((r for r in items if "ms" in r),
                       key=lambda r: r["ms"])
        for i, r in enumerate(timed):
            mark = " <== winner" if i == 0 else ""
            print(f"  {r['bench']:<44s} {r['ms']:>10.4f} ms{mark}")
        for r in items:
            if "val" in r:
                print(f"  {r['bench']:<44s} val={r['val']:.3e}")
            if "error" in r:
                print(f"  {r['bench']:<44s} ERROR {r['error'][:120]}")
    if other:
        print("\n== other")
        for r in other:
            print(f"  {r}")


if __name__ == "__main__":
    main(sys.argv[1:] or ["/dev/stdin"])
