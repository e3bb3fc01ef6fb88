#!/bin/bash
# Round-5 chip session 2: training.
#  (a) flax-path train-throughput probe (VERDICT r4 item 7): 1 epoch,
#      16 fixed scenes, TS_WARP=xla TS_RED=flax — s/step from the log.
#  (b) the long reference-scale accuracy run on the wide-baseline
#      rich-texture generator, kernels' custom VJPs engaged, clipped +
#      warmed-up optimizer, warm-started from the r4 epoch-3 checkpoint.
# ONE chip process at a time: strictly sequential.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs

COMMON="TS_MODEL=adamvs TS_VIEWS=5 TS_H=384 TS_W=512 \
  TS_NDEPTHS=48,32,8 TS_NUM_DEPTH=384 TS_GEOM=wide TS_TEX=rich TS_BS=1"

echo "=== (a) flax-path throughput probe ==="
timeout 3000 env $COMMON TS_EPOCHS=1 TS_TRAIN_SCENES=16 TS_VAL_SCENES=2 \
  TS_FRESH=0 TS_WARP=xla TS_RED=flax TS_CKPT=r5_probe_flax \
  python scripts/train_synthetic.py > logs/train_r5_probe_flax.log 2>&1
tail -3 logs/train_r5_probe_flax.log

echo "=== (b) long run (pallas VJPs) ==="
timeout 21000 env $COMMON TS_EPOCHS=${R5_EPOCHS:-30} TS_TRAIN_SCENES=64 \
  TS_VAL_SCENES=8 TS_FRESH=1 TS_WARP=pallas TS_RED=pallas \
  TS_WARM=checkpoints/synthetic_adamvs_ref512_r4/model_000003_1.4325 \
  TS_CKPT=synthetic_adamvs_ref512_r5 \
  python scripts/train_synthetic.py > logs/train_r5.log 2>&1
tail -5 logs/train_r5.log
echo "DONE train session"
