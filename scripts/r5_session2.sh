#!/bin/bash
# Round-5 chip session 2: trace + fused roofline + full-res E2E.
# ONE chip process at a time: strictly sequential.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs
out=logs/r5_session2.log
: > "$out"

echo "=== device trace at bench point ===" | tee -a "$out"
timeout 1200 python scripts/trace_model.py >> "$out" 2>&1
timeout 300 python scripts/trace_breakdown.py /tmp/trace_out 3 \
  >> "$out" 2>&1 || true
tail -30 "$out"

echo "=== fused-graph roofline (compiler cost model) ===" | tee -a "$out"
timeout 1200 env RL_MEASURED_MAPS_S=19.14 python scripts/roofline_fused.py \
  2>>"$out" | tee -a "$out"

echo "=== full-res 5-stage E2E ===" | tee -a "$out"
timeout 7200 python scripts/run_fullres_e2e.py >> "$out" 2>&1
tail -15 "$out"
echo "DONE session2" | tee -a "$out"
