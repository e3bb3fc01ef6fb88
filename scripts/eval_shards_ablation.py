"""Blocked-recurrence ('sp') inference ablation (docs/ACCURACY.md): val
metrics at depth_shards 1/2/4 for a given checkpoint.

Round-2 finding (negative, kept reproducible): raising depth_shards at
INFERENCE on a shards=1-trained checkpoint wrecks the scores — blocking
the GRU recurrence is a train-time model spec. Round 3 adds the positive
direction: a shards=2-TRAINED checkpoint evaluated at its own blocking
(set TS_SHARDS_LIST=2 TS_CKPT_DIR=<sp2 run>).

Env: TS_CKPT_DIR (default synthetic_adamvs_256), TS_VIEWS/TS_H/TS_W/
TS_NDEPTHS/TS_NUM_DEPTH (default the toy point), TS_SHARDS_LIST
(default "1,2,4"), TS_VAL_SCENES.

Runs on CPU (forced) so it can execute alongside a chip job."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
import jax
from jax._src import xla_bridge as _xb

jax.config.update("jax_platforms", "cpu")
for _n in list(getattr(_xb, "_backend_factories", {})):
    if "axon" in _n:
        _xb._backend_factories.pop(_n, None)
sys.path.insert(0, "/root/repo")

import json

import numpy as np

from scripts.train_synthetic import batches_of, make_samples_parallel
from deep3d_aerial_tpu.models import build_model
from deep3d_aerial_tpu.train.checkpoint import (best_checkpoint,
                                                restore_checkpoint)
from deep3d_aerial_tpu.train.trainer import Trainer, TrainerConfig

V = int(os.environ.get("TS_VIEWS", "3"))
H = int(os.environ.get("TS_H", "64"))
W = int(os.environ.get("TS_W", "96"))
n_val = int(os.environ.get("TS_VAL_SCENES", "8"))
num_depth = int(os.environ.get("TS_NUM_DEPTH", "64"))
ndepths = tuple(int(x) for x in
                os.environ.get("TS_NDEPTHS", "16,8,8").split(","))
shards_list = tuple(int(x) for x in
                    os.environ.get("TS_SHARDS_LIST", "1,2,4").split(","))

val_s = make_samples_parallel([9000 + i for i in range(n_val)], V, H, W)
val_b = batches_of(val_s, 1)
interval = float(np.mean([s["depth_max"] - s["depth_min"]
                          for s in val_s])) / num_depth

ck = best_checkpoint(os.environ.get(
    "TS_CKPT_DIR", "/root/repo/checkpoints/synthetic_adamvs_256"))
print("ckpt:", ck)
params = restore_checkpoint(ck)["params"]

results = {}
for shards in shards_list:
    model = build_model("adamvs", ndepths=ndepths, num_depth=num_depth,
                        depth_shards=shards)
    tr = Trainer(model, TrainerConfig(min_interval=interval, tb_logdir=None),
                 steps_per_epoch=1)
    tr.params = params
    m = tr.evaluate(val_b)
    results[shards] = m
    print(json.dumps({"depth_shards": shards, **m}), flush=True)
print(json.dumps(results))
