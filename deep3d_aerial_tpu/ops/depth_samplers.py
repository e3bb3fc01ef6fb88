"""Depth-hypothesis samplers for cascade coarse-to-fine sweeps.

Mirrors /root/reference/mvs/mvs_cas/models/module.py:605-650:
  * stage 1: uniform inclusive range over [dmin, dmax]
  * later stages: per-pixel window of `ndepth * interval` centered on the
    upsampled previous-stage depth
  * UCSNet variant: window width from the per-pixel predicted uncertainty
    (ucsnet.py:30, lambda * sigma)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def uniform_depth_samples(depth_min, depth_max, ndepth: int) -> jnp.ndarray:
    """[D] inclusive linspace — min + arange(D) * (max-min)/(D-1)."""
    return jnp.linspace(
        jnp.asarray(depth_min, jnp.float32), jnp.asarray(depth_max, jnp.float32),
        ndepth,
    )


def window_depth_samples(
    center_depth: jnp.ndarray, ndepth: int, interval
) -> jnp.ndarray:
    """Per-pixel window [D, H, W] around `center_depth` [H, W].

    Window spans ndepth * interval, re-gridded into ndepth samples
    (new interval = ndepth*interval/(ndepth-1)), matching
    get_cur_depth_range_samples (module.py:616-630).
    """
    interval = jnp.asarray(interval, jnp.float32)
    lo = center_depth - ndepth / 2.0 * interval
    hi = center_depth + ndepth / 2.0 * interval
    step = (hi - lo) / (ndepth - 1)
    k = jnp.arange(ndepth, dtype=jnp.float32)[:, None, None]
    return lo[None] + k * step[None]


def variance_depth_samples(
    center_depth: jnp.ndarray,
    sigma: jnp.ndarray,
    ndepth: int,
    lamb: float = 1.5,
) -> jnp.ndarray:
    """UCSNet uncertainty-aware window: center ± lamb * sigma, [D, H, W]."""
    lo = center_depth - lamb * sigma
    hi = center_depth + lamb * sigma
    step = (hi - lo) / (ndepth - 1)
    k = jnp.arange(ndepth, dtype=jnp.float32)[:, None, None]
    return lo[None] + k * step[None]


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear 2x upsample of [H, W] (align_corners=False semantics)."""
    H, W = x.shape
    return resize_bilinear(x, (H * 2, W * 2))


def resize_bilinear(x: jnp.ndarray, shape) -> jnp.ndarray:
    """Resize the last two axes to `shape` with bilinear half-pixel
    semantics. Identity and integer-factor upsamples take the
    phase-decomposed slice-lerp path (ops.resize.upsample_axis_lerp —
    exact match to jax.image.resize, without its dot_general lowering
    whose channel-minor relayout dominates inter-stage glue time,
    docs/PERF.md); everything else falls back to jax.image.resize."""
    shape = tuple(shape)
    h, w = x.shape[-2:]
    H, W = shape
    if (h, w) == (H, W):
        return x
    if H % h == 0 and W % w == 0 and H // h == W // w:
        from .resize import upsample_axis_lerp

        p = H // h
        return upsample_axis_lerp(upsample_axis_lerp(x, p, -2), p, -1)
    return jax.image.resize(x, x.shape[:-2] + shape, method="bilinear")
