"""Training losses for the cascade MVS zoo.

Mirrors the reference loss family:
  * cas_mvsnet_loss (cas_mvsnet.py:9-28): per-stage masked smooth-L1 on depth,
    weighted by dlossw (default 0.5, 1.0, 2.0 — train_whu.py:45)
  * cas_mvs_vis_loss (adamvs.py:8-47): adds the mean smooth-L1 over per-view
    pair depths at stage 1.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Elementwise Huber/smooth-L1 with beta=1 (torch F.smooth_l1_loss)."""
    diff = jnp.abs(pred - target)
    return jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def _resize_to(depth: jnp.ndarray, shape) -> jnp.ndarray:
    if depth.shape == tuple(shape):
        return depth
    return jax.image.resize(depth, tuple(shape), method="bilinear")


def cascade_depth_loss(
    outputs: Dict,
    depth_gt_stages: Sequence[jnp.ndarray],
    mask_stages: Sequence[jnp.ndarray],
    stage_weights: Sequence[float] = (0.5, 1.0, 2.0),
    pair_weight: float = 1.0,
    normal_gt=None,
    K_inv=None,
    normal_weight: float = 0.0,
) -> Dict[str, jnp.ndarray]:
    """Total cascade loss.

    outputs         : model output dict with 'stageK' sub-dicts
    depth_gt_stages : GT depth per stage, each [h, w] at that stage's output res
    mask_stages     : validity masks per stage (>0.5 = supervised)
    normal_gt/K_inv : optional [H, W, 3] GT camera-frame normals + inverse
                      intrinsics; adds `normal_weight * (1 - cos)` between
                      GT and normals derived from the final predicted depth
                      (the normal-aware training mode — reference GT-normal
                      loader cas_whu_omvs.py:457, consumer
                      fusion_3d_normal.py:191-195)
    Returns {'total', 'depth_loss' (last stage), 'stageK' each}.
    """
    total = 0.0
    logs = {}
    last = None
    for s, (gt, mask) in enumerate(zip(depth_gt_stages, mask_stages)):
        key = f"stage{s + 1}"
        stage_out = outputs[key]
        est = _resize_to(stage_out["depth"], gt.shape)
        m = mask > 0.5
        loss = _masked_mean(smooth_l1(est, gt), m)

        pair_loss = 0.0
        if pair_weight and "pair_results" in stage_out:
            pairs = stage_out["pair_results"]  # [Vs, h, w]
            per = jax.vmap(
                lambda p: _masked_mean(smooth_l1(_resize_to(p, gt.shape), gt), m)
            )(pairs)
            pair_loss = per.mean()

        w = stage_weights[s] if s < len(stage_weights) else 1.0
        total = total + w * (loss + pair_weight * pair_loss)
        logs[key] = loss
        last = loss

    if normal_weight and normal_gt is not None and K_inv is not None:
        from ..ops.normals import normals_from_depth

        gt = depth_gt_stages[-1]
        m = mask_stages[-1] > 0.5
        est = _resize_to(outputs[f"stage{len(depth_gt_stages)}"]["depth"],
                         gt.shape)
        n_pred = normals_from_depth(est, K_inv)
        cos = jnp.sum(n_pred * normal_gt, axis=-1)
        normal_loss = _masked_mean(1.0 - cos, m)
        total = total + normal_weight * normal_loss
        logs["normal_loss"] = normal_loss

    logs["total"] = total
    logs["depth_loss"] = last
    return logs
