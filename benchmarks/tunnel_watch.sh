#!/usr/bin/env bash
# Poll the axon tunnel; when it answers, run the measurement battery.
# If the battery ends without a successful full-bench number (tunnel
# flap mid-run), resume watching and retry — up to 3 batteries total.
cd "$(dirname "$0")/.."
echo "watch started $(date -u +%H:%M:%S)"
runs=0
while [ "$runs" -lt 3 ]; do
    if timeout 90 python -c "import jax; print(jax.devices()[0])" >/dev/null 2>&1; then
        echo "tunnel UP at $(date -u +%H:%M:%S); running battery $((runs+1))"
        bash benchmarks/run_when_tunnel_up.sh
        runs=$((runs+1))
        latest=$(ls -t benchmarks/results/bench_full_*.log 2>/dev/null | head -1)
        # any positive headline value counts (0.87 included — a plain
        # [1-9] first-digit match would misread slow-but-real numbers)
        if [ -n "$latest" ] && python - "$latest" <<'EOF'
import json, sys
for line in open(sys.argv[1]):
    line = line.strip()
    if line.startswith("{"):
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        # a cached-fallback emission is NOT a measured headline —
        # accepting it would end the watch without ever measuring
        if d.get("metric") and (d.get("value") or 0) > 0 \
                and not d.get("cached"):
            sys.exit(0)
sys.exit(1)
EOF
        then
            echo "battery complete with measured headline ($latest); done $(date -u +%H:%M:%S)"
            exit 0
        fi
        echo "battery $runs ended without a measured headline; resuming watch"
    else
        echo "tunnel down $(date -u +%H:%M:%S)"
    fi
    sleep 120
done
echo "gave up after $runs batteries $(date -u +%H:%M:%S)"
