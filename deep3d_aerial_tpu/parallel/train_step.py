"""Sharded training / inference steps.

Data-parallel over the ref-view batch axis ('dp'); optional depth-hypothesis
sharding ('sp') via the sharding context (parallel.context). Params are
replicated; XLA inserts the gradient all-reduce from the sharding layout —
no hand-written collectives (ICI-friendly by construction).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train.losses import cascade_depth_loss


def make_optimizer(
    lr: float = 0.001,
    milestones: Sequence[int] = (),
    gamma: float = 0.5,
    kind: str = "rmsprop",
    clip_norm: float = 0.0,
    warmup_steps: int = 0,
) -> optax.GradientTransformation:
    """RMSprop + multi-step LR decay (reference train_whu.py:131-163).

    `clip_norm` > 0 adds global-norm gradient clipping and
    `warmup_steps` > 0 a linear LR ramp from 0 — stabilizers the
    reference lacks (its NaN-guard at train_whu.py:290-292 just skips
    the step); the synthetic wide-baseline generator produces occasional
    hard batches whose loss spikes destabilize RMSprop without them.
    """
    if milestones:
        schedule = optax.piecewise_constant_schedule(
            lr, {int(m): gamma for m in milestones}
        )
    else:
        schedule = optax.constant_schedule(lr)
    if warmup_steps > 0:
        ramp = optax.linear_schedule(0.0, 1.0, warmup_steps)
        base = schedule
        schedule = lambda step: base(step) * ramp(step)  # noqa: E731
    if kind == "rmsprop":
        tx = optax.rmsprop(schedule)
    elif kind == "adam":
        tx = optax.adam(schedule)
    elif kind == "adamw":
        tx = optax.adamw(schedule)
    else:
        raise ValueError(f"unknown optimizer {kind!r}")
    if clip_norm and clip_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(float(clip_norm)), tx)
    return tx


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    num_stages: int = 3,
    stage_weights: Sequence[float] = (0.5, 1.0, 2.0),
    pair_weight: float = 1.0,
    normal_weight: float = 0.0,
    gt_pyramid: bool = False,
    mesh: Optional[Mesh] = None,
) -> Callable:
    """Returns jitted step(params, opt_state, batch) -> (params, opt_state, logs).

    batch dict (leading dim B, sharded on 'dp' when a mesh is given):
      imgs [B, V, H, W, 3], rel_projs [B, S, V-1, 4, 4],
      depth_min [B], depth_max [B], depth_gt [B, H, W], mask [B, H, W]
      (+ normal_gt [B, H, W, 3], K_inv [B, 3, 3] when normal_weight > 0)
    """
    # spmd_axis_name makes batched sharding constraints (the models'
    # depth-volume 'sp' annotations) keep the batch dim on 'dp'. Without it
    # the vmapped constraint marks the batch dim replicated, fighting the dp
    # layout (observed: 10x-wrong gradients under a dp x sp mesh).
    vmap_kwargs = {}
    if mesh is not None and "dp" in mesh.axis_names:
        vmap_kwargs["spmd_axis_name"] = "dp"

    def loss_fn(params, batch):
        with_normals = (
            normal_weight > 0 and "normal_gt" in batch and "K_inv" in batch
        )

        def one(imgs, rel_projs, dmin, dmax, gt, mask, normal_gt, K_inv):
            out = model.apply(params, imgs, rel_projs, dmin, dmax)
            if gt_pyramid:
                # true multi-scale GT pyramid (/4, /2, x1 — reference
                # cas_rscv.py:586-594): each stage supervises at its own
                # resolution; nearest keeps depths unmixed across edges
                gts, masks = [], []
                for s in range(num_stages):
                    f = 2 ** (num_stages - 1 - s)
                    shp = (gt.shape[0] // f, gt.shape[1] // f)
                    gts.append(jax.image.resize(gt, shp, method="nearest"))
                    masks.append(
                        jax.image.resize(mask, shp, method="nearest"))
            else:
                # full-res GT at every stage (reference cas_whu_omvs
                # :570-586)
                gts = [gt] * num_stages
                masks = [mask] * num_stages
            logs = cascade_depth_loss(
                out,
                gts,
                masks,
                stage_weights=stage_weights,
                pair_weight=pair_weight,
                normal_gt=normal_gt,
                K_inv=K_inv,
                normal_weight=normal_weight if with_normals else 0.0,
            )
            return logs["total"], logs

        B = batch["imgs"].shape[0]
        normal_gt = batch.get("normal_gt") if with_normals else None
        K_inv = batch.get("K_inv") if with_normals else None
        if normal_gt is None:
            normal_gt = jnp.zeros((B, 1, 1, 3), jnp.float32)
            K_inv = jnp.zeros((B, 3, 3), jnp.float32)
        totals, logs = jax.vmap(one, **vmap_kwargs)(
            batch["imgs"], batch["rel_projs"], batch["depth_min"],
            batch["depth_max"], batch["depth_gt"], batch["mask"],
            normal_gt, K_inv,
        )
        return totals.mean(), jax.tree_util.tree_map(jnp.mean, logs)

    def step(params, opt_state, batch):
        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch
        )
        # NaN guard: skip the update on non-finite loss (reference
        # train_whu.py:290-292 skips backward on NaN)
        finite = jnp.isfinite(loss)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, logs

    if mesh is not None:
        data_spec = NamedSharding(mesh, P("dp"))
        repl = NamedSharding(mesh, P())

        def batch_shardings(batch):
            return {
                k: NamedSharding(mesh, P("dp", *([None] * (v.ndim - 1))))
                for k, v in batch.items()
            }

        def sharded_step(params, opt_state, batch):
            # Depth ('sp') sharding rides the models' blocked-depth design:
            # the block axis created by depth_shards > 1 carries the 'sp'
            # constraint (role 'depth_shards'), blocks have no cross-shard
            # halos, and gradients are exact (tests/test_parallel.py runs
            # the dp x sp equivalence with constraints ON). NOTE: sharding
            # a mid-CNN depth axis directly instead was observed to
            # miscompile in the XLA SPMD partitioner — see
            # parallel/context.py.
            from .context import use_mesh as _use_mesh

            with _use_mesh(mesh):
                fn = jax.jit(
                    step,
                    in_shardings=(repl, repl, batch_shardings(batch)),
                    out_shardings=(repl, repl, repl),
                )
                return fn(params, opt_state, batch)

        return sharded_step
    return jax.jit(step)


def make_infer_step(model, mesh: Optional[Mesh] = None) -> Callable:
    """Returns jitted infer(params, batch) -> {'depth', 'photometric_confidence'}
    over a batch of ref-view samples, batch sharded on 'dp'."""

    vmap_kwargs = {}
    if mesh is not None and "dp" in mesh.axis_names:
        vmap_kwargs["spmd_axis_name"] = "dp"

    def infer(params, imgs, rel_projs, dmin, dmax):
        def one(im, rp, a, b):
            out = model.apply(params, im, rp, a, b)
            return {
                "depth": out["depth"],
                "photometric_confidence": out["photometric_confidence"],
            }
        return jax.vmap(one, **vmap_kwargs)(imgs, rel_projs, dmin, dmax)

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        dp = lambda nd: NamedSharding(mesh, P("dp", *([None] * (nd - 1))))

        def sharded(params, imgs, rel_projs, dmin, dmax):
            from .context import use_mesh as _use_mesh

            with _use_mesh(mesh):
                fn = jax.jit(
                    infer,
                    in_shardings=(
                        repl, dp(imgs.ndim), dp(rel_projs.ndim), dp(1), dp(1)
                    ),
                )
                return fn(params, imgs, rel_projs, dmin, dmax)

        return sharded
    return jax.jit(infer)
