#!/bin/bash
# Round-5 chip session 3 (after the long training run): accuracy evals,
# sp2 fine-tune evidence, remaining zoo entry, FEATS_SPLIT A/B, full-res
# E2E rerun with the geometry-adaptive windows. Strictly sequential.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs
out=logs/r5_post_train.log
: > "$out"

# TS_TEX=rich: the eval scene must carry the same GSD-scale texture
# statistics the generator was rebuilt for (real aerial imagery is
# richly textured at the GSD — docs/ACCURACY.md round-3 diagnosis);
# matches the training distribution.
EVAL="TS_EVAL_W=512 TS_EVAL_H=384 TS_EVAL_VIEWS=5 TS_EVAL_NUM_DEPTH=384 \
  TS_EVAL_NDEPTHS=${R5_NDEPTHS:-48,32,16} TS_EVAL_RATIOS=${R5_RATIOS:-4,8,3} \
  TS_EVAL_MIN_INTERVAL=0.1 TS_TEX=rich TS_AA=3"

echo "=== eval_trained @ ref512 r5 ===" | tee -a "$out"
timeout 3600 env $EVAL TS_CKPT_DIR=checkpoints/${R5_CKPT:-synthetic_adamvs_ref512_r5w} \
  python scripts/eval_trained.py >> "$out" 2>&1
grep -a "{" "$out" | tail -2

echo "=== full-res E2E rerun (adaptive windows) ===" | tee -a "$out"
timeout 7200 python scripts/run_fullres_e2e.py >> "$out" 2>&1
grep -a "\[e2e\]" "$out" | tail -8
echo "=== sp2 fine-tune (2 epochs from r5 best) ===" | tee -a "$out"
BEST=$(env CKPT_DIR="checkpoints/${R5_CKPT:-synthetic_adamvs_ref512_r5w}" \
  python -c 'import os
from deep3d_aerial_tpu.train.checkpoint import best_checkpoint
print(best_checkpoint(os.environ["CKPT_DIR"]) or "")')
echo "sp2 warm from: $BEST" | tee -a "$out"
timeout 7200 env TS_MODEL=adamvs TS_VIEWS=5 TS_H=384 TS_W=512 \
  TS_NDEPTHS=${R5_NDEPTHS:-48,32,16} TS_RATIOS=${R5_RATIOS:-4,8,3} \
  TS_NUM_DEPTH=384 TS_GEOM=wide TS_TEX=rich TS_BS=1 \
  TS_EPOCHS=2 TS_TRAIN_SCENES=64 TS_VAL_SCENES=8 TS_FRESH=1 \
  TS_WARP=pallas TS_RED=pallas TS_SHARDS=2 TS_CHUNK=4 TS_LR=2e-4 \
  TS_WARMUP=0 TS_WARM="$BEST" TS_CKPT=synthetic_adamvs_ref512_r5_sp2 \
  python scripts/train_synthetic.py > logs/train_r5_sp2.log 2>&1
grep -aE "eval|warm" logs/train_r5_sp2.log | tail -5 | tee -a "$out"

echo "=== RedStep4 on-chip parity (single-kernel compile probe:" \
     "localizes the msrednet full-graph compile timeout) ===" | tee -a "$out"
timeout 1800 python scripts/check_red4.py >> "$out" 2>&1 \
  && tail -5 "$out" || echo "check_red4 TIMED OUT/FAILED (see $out)" \
  | tee -a "$out"

echo "=== msrednet 384x512 with flax RED (red4 kernel compile pathology" \
     "tracked separately) ===" | tee -a "$out"
timeout 1800 env BENCH_MODEL=msrednet BENCH_H=384 BENCH_W=512 \
  BENCH_RED=flax python bench.py 2>>"$out.err" | tail -1 | tee -a "$out"

echo "=== FEATS_SPLIT A/B at bench point ===" | tee -a "$out"
timeout 1800 env FEATS_SPLIT=1 python bench.py 2>>"$out.err" \
  | tail -1 | tee -a "$out"

echo "=== bf16 mixed-precision train-throughput probe ===" | tee -a "$out"
timeout 3000 env TS_MODEL=adamvs TS_VIEWS=5 TS_H=384 TS_W=512 \
  TS_NDEPTHS=48,32,8 TS_NUM_DEPTH=384 TS_GEOM=wide TS_TEX=rich TS_BS=1 \
  TS_EPOCHS=1 TS_TRAIN_SCENES=16 TS_VAL_SCENES=2 TS_FRESH=0 \
  TS_WARP=pallas TS_RED=pallas TS_DTYPE=bfloat16 TS_CKPT=r5_probe_bf16 \
  python scripts/train_synthetic.py > logs/train_r5_probe_bf16.log 2>&1
grep -aE "step" logs/train_r5_probe_bf16.log | tail -3 | tee -a "$out"

echo "DONE post-train session" | tee -a "$out"
