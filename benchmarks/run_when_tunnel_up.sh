#!/usr/bin/env bash
# One-shot TPU measurement battery: run this the moment the axon tunnel is
# back.  Order matters — cheapest/highest-value first, so a tunnel flap
# mid-run still leaves usable data.  Logs land in benchmarks/results/.
set -uo pipefail

cd "$(dirname "$0")/.."
OUT=benchmarks/results
mkdir -p "$OUT"
STAMP=$(date -u +%Y%m%dT%H%M%S)

probe() {
    timeout 180 python -c "import jax; print(jax.devices()[0])" 2>/dev/null
}

echo "== probing tunnel =="
if ! probe; then
    echo "tunnel down; aborting" >&2
    exit 1
fi

echo "== 1. headline bench (quick: one compile, one number) =="
timeout 1200 python bench.py --quick 2>&1 | tee "$OUT/bench_quick_$STAMP.log"

echo "== 2. secure pass (ONE proven variant per family, full methodology:"
echo "      records all three north-star metrics in ~20 min so a short"
echo "      window can't lose ps23/mg to the cavity race again) =="
timeout 2700 python bench.py --max-variants 1 2>&1 \
    | tee "$OUT/bench_full_secure_$STAMP.log"

echo "== 3. FULL bench (the driver-grade artifact: headline variant race"
echo "      + ps23 + multigrid secondaries, per-variant subprocesses) =="
timeout 4800 python bench.py 2>&1 | tee "$OUT/bench_full_$STAMP.log"

echo "== 4. TPU smoke tier (per-test subprocess isolation) =="
timeout 7200 python benchmarks/run_tpu_smoke.py 2>&1 \
    | tee "$OUT/tpu_smoke_$STAMP.log"

echo "== 5. candidate microbench (small sizes first) =="
# explicit per-family cap: the inner Pallas-family caps (3000 s) exceed
# this stage's outer budget — a hang must cost one family, not the run
timeout 2400 python benchmarks/tpu_microbench.py --sizes small \
    --family-timeout 240 2>&1 \
    | tee "$OUT/microbench_small_$STAMP.log"

echo "== 6. candidate microbench (north-star sizes) =="
timeout 10800 python benchmarks/tpu_microbench.py 2>&1 \
    | tee "$OUT/microbench_full_$STAMP.log"

echo "== 7. variant solution-error study (fp32, on-TPU) =="
timeout 3600 python benchmarks/variant_error_study.py 2>&1 \
    | tee "$OUT/variant_err_$STAMP.log"

echo "== 8. MG solve decomposition (fixed-vs-per-cycle split, winning cfg) =="
timeout 3600 python benchmarks/mg_solve_decomp.py 2>&1 \
    | tee "$OUT/mg_decomp_$STAMP.log"

echo "== 9. bf16x1 Ghia steady-state certification (reference t=10 run) =="
timeout 3600 python benchmarks/bf16x1_ghia_certify.py 2>&1 \
    | tee "$OUT/ghia_certify_$STAMP.log"

echo "== done; next: set auto-selection heuristics from $OUT/microbench_full_$STAMP.log =="
