"""Plane-sweep homography warping (the MVS hot op) — XLA reference path.

Semantics match the reference kernel `homo_warping_float`
(/root/reference/mvs/mvs_cas/models/module.py:516-557): relative projective
transform src_P @ inv(ref_P), per-depth-plane pixel transfer, bilinear
sampling with zero padding at exact pixel coordinates (align_corners=True).

Layout is TPU-native NHWC ([H, W, C] unbatched); geometry runs in float32,
features may be bfloat16. The fused Pallas kernels live in
`deep3d_aerial_tpu.ops.pallas_sweep`; this module is the always-correct
XLA-gather fallback and the numerical oracle for kernel tests.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def relative_projection(src_P: jnp.ndarray, ref_P: jnp.ndarray) -> jnp.ndarray:
    """rel = src_P @ inv(ref_P), both 4x4 (rows 0-2 = K[R|t]). float32."""
    return (src_P.astype(jnp.float32) @ jnp.linalg.inv(ref_P.astype(jnp.float32)))


# ---------------------------------------------------------------------------
# High-precision projective chain (the reference's float64 warp variant,
# module.py:560, for numerically deep scenes). TPUs have no fast fp64, so
# this uses error-free double-single (Dekker/Knuth) arithmetic: each value
# is an unevaluated (hi, lo) float32 pair, giving ~48 effective mantissa
# bits through the x*d + t chain and one compensated division. Select per
# call via `highp=True` or globally via set_high_precision_warp(True)
# (pipeline config DENSEMATCH.warp_precision: 'compensated').
# ---------------------------------------------------------------------------

_WARP_HIGHP = False


def set_high_precision_warp(enabled: bool) -> None:
    global _WARP_HIGHP
    _WARP_HIGHP = bool(enabled)


def _two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _split(a):
    c = a * 4097.0  # 2^12 + 1 (float32 Veltkamp split)
    hi = c - (c - a)
    return hi, a - hi


def _two_prod(a, b):
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    return p, ((ah * bh - p) + ah * bl + al * bh) + al * bl


def _ds_add(x, y):
    s, e = _two_sum(x[0], y[0])
    e = e + x[1] + y[1]
    hi, lo = _two_sum(s, e)
    return hi, lo


def _ds_mul(x, y):
    p, e = _two_prod(x[0], y[0])
    e = e + x[0] * y[1] + x[1] * y[0]
    hi, lo = _two_sum(p, e)
    return hi, lo


def _ds_from(a):
    return a, jnp.zeros_like(a)


def _ds_div(x, z):
    """Compensated (hi+lo)/(zhi+zlo): quotient + one Newton correction."""
    q = x[0] / z[0]
    # residual r = x - q*z evaluated in ds
    qz = _ds_mul(_ds_from(q), z)
    r = _ds_add(x, (-qz[0], -qz[1]))
    return q + (r[0] + r[1]) / z[0]


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
    highp: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Source-image pixel coords for each (depth, ref pixel).

    rel_proj : [4, 4] src_P @ inv(ref_P)
    depths   : [D] or [D, H, W] depth hypotheses (ref-view depths)
    highp    : compensated double-single chain (None -> global toggle);
               the reference's float64 warp analog (module.py:560)
    returns  : (x_src, y_src, z_src) each [D, H, W] float32
    """
    if highp is None:
        highp = _WARP_HIGHP
    H, W = ref_shape
    R = rel_proj[:3, :3].astype(jnp.float32)
    t = rel_proj[:3, 3].astype(jnp.float32)

    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # [H, W]
    ones = jnp.ones_like(gx)

    # ray = pix @ R.T, spelled ELEMENTWISE: a matmul here goes through the
    # TPU MXU whose f32 operands are fed as bf16 — pixel coordinates >= 2^8
    # lose low mantissa bits, i.e. up to +-1 px coordinate error (measured
    # on-chip; the VPU elementwise path is exact f32)
    ray = jnp.stack(
        [R[a, 0] * gx + R[a, 1] * gy + R[a, 2] * ones for a in range(3)],
        axis=-1,
    )  # [H, W, 3] — direction part
    if depths.ndim == 1:
        d = depths[:, None, None]
    else:
        d = depths

    if highp:
        dd = _ds_from(d)
        comps = []
        for a in range(3):
            # ray component in ds too: r0*x + r1*y + r2 rounded in fp32
            # already costs ~1e-4 px at deep operating points
            ra = _ds_add(
                _ds_add(_ds_mul(_ds_from(gx), _ds_from(R[a, 0] * ones)),
                        _ds_mul(_ds_from(gy), _ds_from(R[a, 1] * ones))),
                _ds_from(R[a, 2] * ones),
            )
            prod = _ds_mul((ra[0][None], ra[1][None]), dd)
            comps.append(_ds_add(prod, _ds_from(jnp.full((), t[a]))))
        zhi, zlo = comps[2]
        z = zhi + zlo
        bad = jnp.abs(zhi) < 1e-8
        safe_z = (jnp.where(bad, 1e-8, zhi), jnp.where(bad, 0.0, zlo))
        x_src = _ds_div(comps[0], safe_z)
        y_src = _ds_div(comps[1], safe_z)
    else:
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
    highp: Optional[bool] = None,
) -> jnp.ndarray:
    """Warp `src_feat` [H, W, C] onto the ref view at each depth hypothesis.

    depths: [D] shared or [D, H, W] per-pixel.  Returns [D, H, W, C].
    """
    if ref_shape is None:
        ref_shape = src_feat.shape[:2]
    x_src, y_src, _ = sweep_coordinates(rel_proj, depths, ref_shape, highp)
    return bilinear_sample(src_feat, x_src, y_src)


def plane_sweep_warp_single(
    src_feat: jnp.ndarray,
    rel_proj: jnp.ndarray,
    depth: jnp.ndarray,
    ref_shape: Optional[Tuple[int, int]] = None,
    highp: Optional[bool] = None,
) -> jnp.ndarray:
    """Warp at ONE depth plane ([H, W] or scalar) -> [H, W, C].

    This is the streaming-inference building block (one `lax.scan` step over
    the depth axis, mirroring the reference's slice-wise loops
    adamvs.py:492-529).
    """
    if ref_shape is None:
        ref_shape = src_feat.shape[:2]
    d = jnp.broadcast_to(jnp.asarray(depth, jnp.float32), ref_shape)
    x_src, y_src, _ = sweep_coordinates(rel_proj, d[None], ref_shape, highp)
    return bilinear_sample(src_feat, x_src[0], y_src[0])
