#!/usr/bin/env bash
# Round-5 measurement battery (trimmed runbook: records first, studies after).
cd "$(dirname "$0")/.."
OUT=benchmarks/results
STAMP=$(date -u +%Y%m%dT%H%M%S)
echo "battery r5 start $STAMP"
if [ -z "$SKIP_QUICK" ]; then
  timeout 1200 python bench.py --quick 2>&1 | tee "$OUT/bench_quick_$STAMP.log"
  timeout 2700 python bench.py --max-variants 1 2>&1 | tee "$OUT/bench_full_secure_$STAMP.log"
fi
timeout 7200 python bench.py 2>&1 | tee "$OUT/bench_full_$STAMP.log"
timeout 3600 python benchmarks/mg_overhead_probe.py 2>&1 | tee "$OUT/mg_decomp_$STAMP.log"
timeout 5400 python benchmarks/run_tpu_smoke.py 2>&1 | tee "$OUT/tpu_smoke_$STAMP.log"
echo "battery r5 done $(date -u +%H:%M:%S)"
