"""Depth & normal evaluation metrics.

Same definitions as the reference (/root/reference/mvs/mvs_cas/utils.py):
  * Thres_metrics (:301): fraction of masked pixels with |err| > thres
    (we report the complementary accuracy, fraction WITHIN)
  * Inter_metrics (:311): fraction within k * depth_interval
  * AbsDepthError_metrics (:323): mean |err| over masked pixels with
    |err| < 100 * interval (outlier-capped) — the number encoded in the
    reference checkpoint names (e.g. 0.1330 for AdaMVS)
  * Normal_angles (:331): mean angular error in degrees.
"""

from __future__ import annotations

import jax.numpy as jnp


def _masked(x, mask):
    m = mask.astype(x.dtype)
    return x * m, jnp.maximum(m.sum(), 1.0)


def abs_depth_error(
    est: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray,
    interval: float = 0.1, outlier_cap: float = 100.0,
) -> jnp.ndarray:
    err = jnp.abs(est - gt)
    keep = mask & (err < outlier_cap * interval)
    v, n = _masked(err, keep)
    return v.sum() / n


def threshold_accuracy(est, gt, mask, thres: float) -> jnp.ndarray:
    err = jnp.abs(est - gt)
    v, n = _masked((err < thres).astype(jnp.float32), mask)
    return v.sum() / n


def interval_accuracy(est, gt, mask, k: float, interval: float = 0.1):
    """Fraction of masked pixels with |err| < k * interval (the <1/<3/<6
    interval metrics logged by train_whu.py:343-345)."""
    return threshold_accuracy(est, gt, mask, k * interval)


def normal_angle_error(n_est, n_gt, mask) -> jnp.ndarray:
    """Mean angle (degrees) between unit normal maps [H, W, 3]."""
    cos = jnp.clip(jnp.sum(n_est * n_gt, -1), -1.0, 1.0)
    ang = jnp.degrees(jnp.arccos(cos))
    v, n = _masked(ang, mask)
    return v.sum() / n
