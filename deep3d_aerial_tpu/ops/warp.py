"""Plane-sweep homography warping (the MVS hot op) — XLA reference path.

Semantics match the reference kernel `homo_warping_float`
(/root/reference/mvs/mvs_cas/models/module.py:516-557): relative projective
transform src_P @ inv(ref_P), per-depth-plane pixel transfer, bilinear
sampling with zero padding at exact pixel coordinates (align_corners=True).

Layout is TPU-native NHWC ([H, W, C] unbatched); geometry runs in float32,
features may be bfloat16. A fused Pallas kernel lives in
`deep3d_aerial_tpu.ops.pallas_warp`; this module is the always-correct
XLA-gather fallback and the numerical oracle for kernel tests.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def relative_projection(src_P: jnp.ndarray, ref_P: jnp.ndarray) -> jnp.ndarray:
    """rel = src_P @ inv(ref_P), both 4x4 (rows 0-2 = K[R|t]). float32."""
    return (src_P.astype(jnp.float32) @ jnp.linalg.inv(ref_P.astype(jnp.float32)))


def bilinear_sample(
    src: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
) -> jnp.ndarray:
    """Sample `src` [H, W, C] at pixel coords (x, y) [...], zero padding.

    Each of the four neighbor taps is zeroed independently when it falls
    outside the image (grid_sample 'zeros' padding behavior).
    """
    H, W, C = src.shape
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    flat = src.reshape(H * W, C)

    def tap(xi, yi, w):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        vals = jnp.take(flat, idx.reshape(-1), axis=0).reshape(*idx.shape, C)
        w = jnp.where(valid, w, 0.0)
        return vals * w[..., None].astype(src.dtype)

    out = (
        tap(x0, y0, (1 - fx) * (1 - fy))
        + tap(x1, y0, fx * (1 - fy))
        + tap(x0, y1, (1 - fx) * fy)
        + tap(x1, y1, fx * fy)
    )
    return out


def sweep_coordinates(
    rel_proj: jnp.ndarray,
    depths: jnp.ndarray,
    ref_shape: Tuple[int, int],
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Source-image pixel coords for each (depth, ref pixel).

    rel_proj : [4, 4] src_P @ inv(ref_P)
    depths   : [D] or [D, H, W] depth hypotheses (ref-view depths)
    returns  : (x_src, y_src, z_src) each [D, H, W] float32
    """
    H, W = ref_shape
    R = rel_proj[:3, :3].astype(jnp.float32)
    t = rel_proj[:3, 3].astype(jnp.float32)

    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # [H, W]
    ones = jnp.ones_like(gx)
    pix = jnp.stack([gx, gy, ones], axis=-1)  # [H, W, 3]

    ray = pix @ R.T  # [H, W, 3] — direction part
    if depths.ndim == 1:
        d = depths[:, None, None]
    else:
        d = depths
    p = ray[None, :, :, :] * d[..., None] + t  # [D, H, W, 3]
    z = p[..., 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    x_src = p[..., 0] / safe_z
    y_src = p[..., 1] / safe_z
    # points behind the source camera must not sample (mirror artifact guard)
    x_src = jnp.where(z > 1e-6, x_src, -1e9)
    y_src = jnp.where(z > 1e-6, y_src, -1e9)
    return x_src, y_src, z


def plane_sweep_warp(
    src_feat: jnp.ndarray,
    rel_proj: jnp.ndarray,
    depths: jnp.ndarray,
    ref_shape: Optional[Tuple[int, int]] = None,
) -> jnp.ndarray:
    """Warp `src_feat` [H, W, C] onto the ref view at each depth hypothesis.

    depths: [D] shared or [D, H, W] per-pixel.  Returns [D, H, W, C].
    """
    if ref_shape is None:
        ref_shape = src_feat.shape[:2]
    x_src, y_src, _ = sweep_coordinates(rel_proj, depths, ref_shape)
    return bilinear_sample(src_feat, x_src, y_src)


def plane_sweep_warp_single(
    src_feat: jnp.ndarray,
    rel_proj: jnp.ndarray,
    depth: jnp.ndarray,
    ref_shape: Optional[Tuple[int, int]] = None,
) -> jnp.ndarray:
    """Warp at ONE depth plane ([H, W] or scalar) -> [H, W, C].

    This is the streaming-inference building block (one `lax.scan` step over
    the depth axis, mirroring the reference's slice-wise loops
    adamvs.py:492-529).
    """
    if ref_shape is None:
        ref_shape = src_feat.shape[:2]
    d = jnp.broadcast_to(jnp.asarray(depth, jnp.float32), ref_shape)
    x_src, y_src, _ = sweep_coordinates(rel_proj, d[None], ref_shape)
    return bilinear_sample(src_feat, x_src[0], y_src[0])
