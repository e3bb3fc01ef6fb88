"""Blocked-recurrence inference ablation (docs/ACCURACY.md): val metrics
at depth_shards 1/2/4 with a shards=1-trained checkpoint. Negative result
kept reproducible: blocking the GRU recurrence at inference time is NOT a
free speed knob — train with the blocking you shard with.

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

from scripts.train_synthetic import batches_of, make_sample
from deep3d_aerial_tpu.models import build_model
from deep3d_aerial_tpu.train.checkpoint import (best_checkpoint,
                                                restore_checkpoint)
from deep3d_aerial_tpu.train.trainer import Trainer, TrainerConfig

V, H, W, n_val, num_depth = 3, 64, 96, 8, 64
rng = np.random.default_rng(7)
val_s = [make_sample(rng, 9000 + i, V, H, W) for i in range(n_val)]
val_b = batches_of(val_s, 1)
interval = float(np.mean([s["depth_max"] - s["depth_min"]
                          for s in val_s])) / num_depth

ck = best_checkpoint(os.environ.get("TS_CKPT_DIR", "/root/repo/checkpoints/synthetic_adamvs_256"))
print("ckpt:", ck)
params = restore_checkpoint(ck)["params"]

results = {}
for shards in (1, 2, 4):
    model = build_model("adamvs", ndepths=(16, 8, 8), num_depth=num_depth,
                        depth_shards=shards)
    tr = Trainer(model, TrainerConfig(min_interval=interval, tb_logdir=None),
                 steps_per_epoch=1)
    tr.params = params
    m = tr.evaluate(val_b)
    results[shards] = m
    print(json.dumps({"depth_shards": shards, **m}), flush=True)
print(json.dumps(results))
