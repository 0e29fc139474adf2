#!/usr/bin/env bash
# Round-5 fused-cavity on-chip race: the interior-padded formulation
# (models/cavity_fused.py) at all three precision tiers vs the incumbent
# records, at the north-star 1024^2 / 1000-step methodology.  Each
# variant runs in its own worker subprocess (CLAUDE.md isolation rule).
cd "$(dirname "$0")/.."
OUT=benchmarks/results
STAMP=$(date -u +%Y%m%dT%H%M%S)
LOG="$OUT/fused_race_$STAMP.log"
echo "fused race start $STAMP" | tee "$LOG"
for v in "fused_bf16x1,highest,xla" "fused_bf16x3,highest,xla" \
         "fused,highest,xla"; do
  timeout 900 python bench.py --worker cavity --variant "$v" \
    --nx 1024 --steps 1000 --tol 0 2>&1 | tail -2 | tee -a "$LOG"
done
echo "fused race done $(date -u +%H:%M:%S)" | tee -a "$LOG"
