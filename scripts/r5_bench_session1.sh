#!/bin/bash
# Round-5 chip session 1: (a) re-measure the bench-point headline after
# the round-4 f32x3 rewrite, (b) CF-handoff A/B at 384x512
# (FEATS_LOOP_THRESHOLD=1 engages the channel-first feature/cost path
# that currently only turns on at full res — VERDICT r4 weak #3),
# (c) the model-zoo sweep incl. the full-res headline re-measure.
# ONE chip process at a time: everything here is sequential.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs
out=logs/r5_session1.jsonl
: > "$out"

echo "=== baseline 384x512 (post-f32x3) ===" | tee -a "$out"
timeout 1200 python bench.py 2>>"$out.err" | tail -1 | tee -a "$out"

echo "=== CF A/B: FEATS_LOOP_THRESHOLD=1 384x512 ===" | tee -a "$out"
timeout 1800 env FEATS_LOOP_THRESHOLD=1 python bench.py 2>>"$out.err" \
  | tail -1 | tee -a "$out"

for spec in \
  "casmvsnet 384 512" \
  "ucsnet 384 512" \
  "msrednet 384 512" \
  "adamvs 1856 2752" \
  "msrednet 1856 2752" \
; do
  set -- $spec
  echo "=== BENCH_MODEL=$1 ${2}x${3} ===" | tee -a "$out"
  timeout 3000 env BENCH_MODEL=$1 BENCH_H=$2 BENCH_W=$3 SWEEP_STRICT=1 \
    python bench.py 2>>"$out.err" | tail -1 | tee -a "$out"
done
echo "DONE session1" | tee -a "$out"
