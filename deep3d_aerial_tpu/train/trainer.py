"""Training harness: epochs, multi-step LR, eval metrics, checkpointing.

Capability parity with /root/reference/mvs/mvs_cas/train_whu.py:
RMSprop + MultiStepLR ("10,12,14:2" style), per-epoch checkpoint with the
validation abs-error encoded in the name, resume from the newest checkpoint,
metric logging per step.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Dict, Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.train_step import make_optimizer, make_train_step
from . import checkpoint as ckpt
from .metrics import abs_depth_error, interval_accuracy


def parse_lr_epochs(spec: str) -> tuple:
    """'10,12,14:2' -> (milestones=(10,12,14), gamma=1/2) — the reference's
    lr-epochs syntax (train_whu.py:160-163)."""
    steps, downscale = spec.split(":")
    milestones = tuple(int(s) for s in steps.split(","))
    return milestones, 1.0 / float(downscale)


@dataclasses.dataclass
class TrainerConfig:
    lr: float = 0.001
    lr_epochs: str = "10,12,14:2"
    epochs: int = 16
    batch_size: int = 1
    min_interval: float = 0.1
    ckpt_dir: str = "checkpoints"
    log_every: int = 50
    optimizer: str = "rmsprop"
    # Stabilizers (see parallel.train_step.make_optimizer): 0 disables.
    clip_norm: float = 0.0
    warmup_steps: int = 0
    pair_weight: float = 1.0
    stage_weights: Sequence[float] = (0.5, 1.0, 2.0)
    # TensorBoard-compatible event logging (reference utils.py:117-147,
    # hooked every `log_every` steps like train_whu.py:174-178); None
    # disables. Events + a scalars.jsonl mirror land in <ckpt_dir>/tb.
    tb_logdir: Optional[str] = "auto"


class Trainer:
    def __init__(self, model, cfg: TrainerConfig, steps_per_epoch: int = 1000,
                 mesh=None):
        self.model = model
        self.cfg = cfg
        milestones, gamma = parse_lr_epochs(cfg.lr_epochs)
        self.tx = make_optimizer(
            cfg.lr,
            milestones=[m * steps_per_epoch for m in milestones],
            gamma=gamma,
            kind=cfg.optimizer,
            clip_norm=cfg.clip_norm,
            warmup_steps=cfg.warmup_steps,
        )
        self.step_fn = make_train_step(
            model, self.tx,
            stage_weights=cfg.stage_weights,
            pair_weight=cfg.pair_weight,
            mesh=mesh,
        )
        self.params = None
        self.opt_state = None
        self.epoch = 0
        self.global_step = 0
        self._writer = None

    @property
    def writer(self):
        if self._writer is None and self.cfg.tb_logdir is not None:
            from .tb_writer import EventWriter

            logdir = (os.path.join(self.cfg.ckpt_dir, "tb")
                      if self.cfg.tb_logdir == "auto" else self.cfg.tb_logdir)
            self._writer = EventWriter(logdir)
        return self._writer

    def init(self, sample_batch: Dict[str, np.ndarray], seed: int = 0):
        # jit the init: unjitted tracing dispatches each primitive
        # individually, which is pathological through a remote backend
        self.params = jax.jit(self.model.init)(
            jax.random.PRNGKey(seed),
            jnp.asarray(sample_batch["imgs"][0]),
            jnp.asarray(sample_batch["rel_projs"][0]),
            jnp.float32(sample_batch["depth_min"][0]),
            jnp.float32(sample_batch["depth_max"][0]),
        )
        self.opt_state = self.tx.init(self.params)

    def resume(self) -> bool:
        path = ckpt.latest_checkpoint(self.cfg.ckpt_dir)
        if path is None:
            return False
        payload = ckpt.restore_checkpoint(path)
        self.params = payload["params"]
        if "opt_state" in payload and self.opt_state is not None:
            self.opt_state = payload["opt_state"]
        self.epoch = int(payload.get("epoch", 0)) + 1
        return True

    def train_epoch(self, batches: Iterable[Dict[str, np.ndarray]]) -> Dict:
        logs_acc = []
        t0 = time.time()
        for step, batch in enumerate(batches):
            if self.params is None:
                self.init(batch)
            self.params, self.opt_state, logs = self.step_fn(
                self.params, self.opt_state, batch
            )
            self.global_step += 1
            if step % self.cfg.log_every == 0:
                vals = {k: float(v) for k, v in logs.items()}
                print(f"[train] epoch {self.epoch} step {step}: "
                      f"loss={vals['total']:.4f} "
                      f"({time.time() - t0:.1f}s)")
                from .tb_writer import save_scalars

                save_scalars(self.writer, "train", vals, self.global_step)
            logs_acc.append({k: float(v) for k, v in logs.items()})
        mean = {
            k: float(np.mean([l[k] for l in logs_acc]))
            for k in logs_acc[0]
        } if logs_acc else {}
        return mean

    def evaluate(self, batches: Iterable[Dict[str, np.ndarray]]) -> Dict:
        """Validation metrics: outlier-capped abs error + <1/<3/<6 interval."""
        @jax.jit
        def eval_one(params, imgs, rel, dmin, dmax, gt, mask):
            out = self.model.apply(params, imgs, rel, dmin, dmax)
            est = out["depth"]
            if est.shape != gt.shape:
                est = jax.image.resize(est, gt.shape, method="bilinear")
            m = mask > 0.5
            iv = self.cfg.min_interval
            return {
                "abs_error": abs_depth_error(est, gt, m, iv),
                "acc_1": interval_accuracy(est, gt, m, 1.0, iv),
                "acc_3": interval_accuracy(est, gt, m, 3.0, iv),
                "acc_6": interval_accuracy(est, gt, m, 6.0, iv),
            }

        acc = []
        for batch in batches:
            for b in range(batch["imgs"].shape[0]):
                r = eval_one(
                    self.params,
                    jnp.asarray(batch["imgs"][b]),
                    jnp.asarray(batch["rel_projs"][b]),
                    float(batch["depth_min"][b]), float(batch["depth_max"][b]),
                    jnp.asarray(batch["depth_gt"][b]),
                    jnp.asarray(batch["mask"][b]),
                )
                acc.append({k: float(v) for k, v in r.items()})
        return {
            k: float(np.mean([a[k] for a in acc])) for k in acc[0]
        } if acc else {}

    def fit(
        self,
        train_batches_fn: Callable[[], Iterable],
        val_batches_fn: Optional[Callable[[], Iterable]] = None,
    ):
        os.makedirs(self.cfg.ckpt_dir, exist_ok=True)
        record_path = os.path.join(self.cfg.ckpt_dir, "train_record.txt")
        for epoch in range(self.epoch, self.cfg.epochs):
            self.epoch = epoch
            train_logs = self.train_epoch(train_batches_fn())
            abs_err = None
            val = {}
            if val_batches_fn is not None:
                val = self.evaluate(val_batches_fn())
                abs_err = val.get("abs_error")
                print(f"[eval] epoch {epoch}: {val}")
                from .tb_writer import save_scalars

                save_scalars(self.writer, "test", val, self.global_step)
            ckpt.save_checkpoint(
                self.cfg.ckpt_dir, epoch, self.params, self.opt_state, abs_err
            )
            # per-epoch append log (reference train_record.txt,
            # train_whu.py:209-211)
            with open(record_path, "a") as f:
                f.write(f"epoch {epoch} train {train_logs} val {val}\n")
        return self.params
