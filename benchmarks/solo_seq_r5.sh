#!/usr/bin/env bash
# Round-5 solo on-chip sequence (one TPU user at a time — run only when
# no other bench/battery process is alive).  Order = decision value:
# 1. fused-cavity race (the certified >=1000 steps/s candidate)
# 2. euler hllc pallas-vs-xla solo rows (the auto policy; the coverage
#    rows ran under two-battery contention, margin 3.6% — too close)
# 3. mg_overhead_probe (VERDICT item 4 decomposition)
# 4. TPU smoke tier
# 5. cavity_step_decomp (fused next-step design data)
cd "$(dirname "$0")/.."
OUT=benchmarks/results
STAMP=$(date -u +%Y%m%dT%H%M%S)
echo "solo seq start $STAMP"
bash benchmarks/fused_race_r5.sh
for v in "hllc,pallas" "hllc,xla"; do
  timeout 900 python bench.py --worker euler --variant "$v" \
    --nx 8192 --steps 1000 --tol 0 2>&1 | tail -2 | \
    tee -a "$OUT/euler_solo_$STAMP.log"
done
# the two coverage rows the old battery's budget cut off
for v in "hybrid" "ps32"; do
  timeout 1200 python bench.py --worker vortex2 --variant "$v" \
    --nx 2048 --steps 100 --tol 0 2>&1 | tail -2 | \
    tee -a "$OUT/vortex2_solo_$STAMP.log"
done
timeout 3600 python benchmarks/mg_overhead_probe.py 2>&1 | \
  tee "$OUT/mg_decomp_$STAMP.log"
timeout 5400 python benchmarks/run_tpu_smoke.py 2>&1 | \
  tee "$OUT/tpu_smoke_$STAMP.log"
timeout 1500 python benchmarks/cavity_step_decomp.py --nx 1024 \
  --iters 200 2>&1 | tee "$OUT/cavity_decomp_$STAMP.log"
echo "solo seq done $(date -u +%H:%M:%S)"
