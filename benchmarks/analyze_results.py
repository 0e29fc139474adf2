"""Summarize a microbench log: winner per family + auto-selection hints.

    python benchmarks/analyze_results.py benchmarks/results/microbench_full_*.log

Groups the JSON lines by family prefix, prints each family sorted by
time with the winner marked (below-overhead-floor entries rank last —
their clamped 0.0 is a dispatch-noise artifact, not a measurement), and
emits the auto-selection implications (MG transfers/smoother/fused,
cavity poisson=, ps23 fft/pair impl) so heuristic updates stay tied to
data."""
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
    ("ps32", "ps32 step (vs ps23 family above)"),
    ("mxufft", "MXU-FFT relative error records"),
    ("restrict", "MG restriction (+conv prolong round trip)"),
    ("prolong", "MG prolongation (+conv restrict round trip)"),
    ("edge", "fused V-cycle edges vs XLA"),
    ("vcycle", "full V-cycle"),
    ("arakawa", "vortex RHS"),
    ("euler", "Euler RHS"),
])

# family winner -> the auto-selection heuristic it decides.  Hints are
# emitted from the measured winner's name so the operator edits code +
# winners.json from ONE summary instead of re-deriving the mapping.
HEURISTICS = OrderedDict([
    ("restrict", "poisson/multigrid.py:_transfers_choice (transfers=)"),
    ("prolong", "poisson/multigrid.py:_transfers_choice (transfers=)"),
    ("vcycle", "multigrid MGConfig defaults: transfers/smoother/fused "
               "(vcycle_<transfers>_<smoother>_<fused> tag)"),
    ("edge", "multigrid MGConfig.fused default (_use_fused)"),
    ("fst", "models/cavity.py CavityConfig.poisson default"),
    ("cavity", "models/cavity.py CavityConfig.poisson default "
               "(full-step context)"),
    ("fft2", "models/vortex.py VortexConfig.fft_impl default"),
    ("ps23", "vortex solver formulation (half vs full vs mxufft; "
             "pair_impl)"),
    ("arakawa", "VortexConfig.rhs_impl / CavityConfig.rhs_impl default"),
    ("euler", "EulerConfig.rhs_impl default"),
])


def _rank_key(r):
    """Honest measurements first (by ms); below-floor artifacts last."""
    return (1 if r.get("below_overhead_floor") else 0, r["ms"])


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

    winners = {}
    for fam, items in by_family.items():
        if not items:
            continue
        print(f"\n== {fam}: {FAMILIES[fam]}")
        timed = sorted((r for r in items if "ms" in r), key=_rank_key)
        for i, r in enumerate(timed):
            mark = " <== winner" if i == 0 else ""
            floor = " [below overhead floor]" \
                if r.get("below_overhead_floor") else ""
            print(f"  {r['bench']:<44s} {r['ms']:>10.4f} ms{floor}{mark}")
        if timed:
            winners[fam] = timed[0]["bench"]
        for r in items:
            if "val" in r:
                print(f"  {r['bench']:<44s} val={r['val']:.3e}")
            if "error" in r:
                print(f"  {r['bench']:<44s} ERROR {r['error'][:120]}")
    if other:
        print("\n== other")
        for r in other:
            print(f"  {r}")

    if winners:
        print("\n== auto-selection implications "
              "(update code default + benchmarks/results/winners.json + "
              "tests/test_autoselect.py together)")
        for fam, target in HEURISTICS.items():
            if fam in winners:
                print(f"  {fam:<10s} winner {winners[fam]:<44s} -> {target}")


if __name__ == "__main__":
    main(sys.argv[1:] or ["/dev/stdin"])
