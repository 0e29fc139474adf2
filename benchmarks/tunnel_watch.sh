#!/usr/bin/env bash
# Poll the axon tunnel; the moment it answers, run the full measurement
# battery once and exit.  Probe is a bounded subprocess (a down tunnel
# HANGS backend init rather than erroring).
cd "$(dirname "$0")/.."
echo "watch started $(date -u +%H:%M:%S)"
while true; do
    if timeout 90 python -c "import jax; print(jax.devices()[0])" >/dev/null 2>&1; then
        echo "tunnel UP at $(date -u +%H:%M:%S); running battery"
        bash benchmarks/run_when_tunnel_up.sh
        echo "battery done $(date -u +%H:%M:%S)"
        exit 0
    fi
    echo "tunnel down $(date -u +%H:%M:%S)"
    sleep 120
done
