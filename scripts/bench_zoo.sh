#!/bin/bash
# Model-zoo bench sweep (VERDICT round-2 item 4): one bench.py line per
# model with its pallas kernels engaged, at the 384x512 bench point and
# at the 1856x2752 production point for the two streaming-recurrence
# models. ONE chip process at a time — run only when the chip is idle.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs
out=logs/bench_zoo_$(date +%H%M).jsonl
for spec in \
  "adamvs 384 512" \
  "casmvsnet 384 512" \
  "ucsnet 384 512" \
  "msrednet 384 512" \
  "adamvs 1856 2752" \
  "msrednet 1856 2752" \
; do
  set -- $spec
  echo "=== BENCH_MODEL=$1 ${2}x${3} ===" | tee -a "$out"
  timeout 3000 env BENCH_MODEL=$1 BENCH_H=$2 BENCH_W=$3 \
    python bench.py 2>>"$out.err" | tail -1 | tee -a "$out"
done
echo "wrote $out"
