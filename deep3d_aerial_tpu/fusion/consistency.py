"""Multi-view geometric/photometric/normal consistency check — JAX kernel.

TPU-native replacement for the reference CuPy kernel
(/root/reference/fuse/consistency_check_n.py:29-138). Same decision rule:

  reproject ref depth into the src view, read the src depth/normal at the
  (rounded) landing pixel, project that src estimate back into the ref view,
  and accept when
      reprojection distance < position_threshold (px)
   && |depth_reprojected - depth_ref| / depth_ref < depth_threshold
   && ref confidence > confidence_threshold
   && world-normal cosine > cos(normal_threshold)
   && depth_ref > 0  (and, unlike the reference, the landing pixel in-bounds)

All matrix inverses are precomputed HOST-SIDE in float64 (ViewGeometry);
the device kernel is pure fp32 elementwise math + one gather, jit-compiled
once per image shape.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class ViewGeometry:
    """Per-view projective data with host-precomputed float64 inverses."""

    K: np.ndarray  # (3,3)
    T_cw: np.ndarray  # (4,4)
    K_inv: np.ndarray
    T_wc: np.ndarray
    R_wc: np.ndarray  # (3,3) = inv(R_cw), for normal transport

    @classmethod
    def create(cls, K: np.ndarray, T_cw: np.ndarray) -> "ViewGeometry":
        K = np.asarray(K, np.float64)
        T_cw = np.asarray(T_cw, np.float64)
        return cls(
            K=K.astype(np.float32),
            T_cw=T_cw.astype(np.float32),
            K_inv=np.linalg.inv(K).astype(np.float32),
            T_wc=np.linalg.inv(T_cw).astype(np.float32),
            R_wc=np.linalg.inv(T_cw[:3, :3]).astype(np.float32),
        )

    def as_stack(self) -> np.ndarray:
        """Pack into one [5, 4, 4] array (jit-friendly single operand)."""
        out = np.zeros((5, 4, 4), np.float32)
        out[0, :3, :3] = self.K
        out[1] = self.T_cw
        out[2, :3, :3] = self.K_inv
        out[3] = self.T_wc
        out[4, :3, :3] = self.R_wc
        return out


def _unpack(g):
    return g[0, :3, :3], g[1], g[2, :3, :3], g[3], g[4, :3, :3]



def _mm3(v, M):
    """[..., 3] x [3, 3]^T product spelled ELEMENTWISE: jnp matmuls go
    through the TPU MXU whose f32 operands are fed as bf16 — world-scale
    coordinates would lose low mantissa bits, breaking the 1 px / 1%%
    consistency thresholds (measured on-chip for the warp path)."""
    return jnp.stack(
        [v[..., 0] * M[a, 0] + v[..., 1] * M[a, 1] + v[..., 2] * M[a, 2]
         for a in range(3)],
        axis=-1,
    )

@partial(jax.jit, static_argnames=("position_threshold", "depth_threshold",
                                   "normal_cos_threshold", "confidence_threshold"))
def consistency_check(
    depth_ref: jnp.ndarray,  # [H, W]
    normal_ref_world: jnp.ndarray,  # [H, W, 3] (unit, world frame)
    geom_ref: jnp.ndarray,  # [5, 4, 4] ViewGeometry.as_stack()
    depth_src: jnp.ndarray,  # [H, W]
    normal_src: jnp.ndarray,  # [H, W, 3] (camera frame of src)
    geom_src: jnp.ndarray,
    prob_ref: jnp.ndarray,  # [H, W]
    position_threshold: float = 1.0,
    depth_threshold: float = 0.01,
    normal_cos_threshold: float = 0.0,  # cos(90 deg)
    confidence_threshold: float = 0.2,
) -> Dict[str, jnp.ndarray]:
    """Returns dict with:
      mask              [H, W] bool   — consistent pixels
      depth_reprojected [H, W]        — src-supported ref-view depth (0 where ~mask)
      xyz_world_src     [H, W, 3]     — src-supported world points (0 where ~mask)
      angle_confidence  [H, W]        — normal-cosine weight (0 where ~mask or <0)
      src_y, src_x      [H, W] int32  — consumed src pixel per ref pixel
    """
    H, W = depth_ref.shape
    K_ref, T_ref, K_ref_inv, T_ref_inv, R_ref_wc = _unpack(geom_ref)
    K_src, T_src, K_src_inv, T_src_inv, R_src_wc = _unpack(geom_src)

    valid = depth_ref > 0

    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    pix = jnp.stack([gx, gy, jnp.ones_like(gx)], -1)  # [H, W, 3]

    # ref pixel -> world
    cam_ref = _mm3(pix, K_ref_inv) * depth_ref[..., None]
    world = _mm3(cam_ref, T_ref_inv[:3, :3]) + T_ref_inv[:3, 3]

    # world -> src pixel
    cam_src = _mm3(world, T_src[:3, :3]) + T_src[:3, 3]
    z_src = cam_src[..., 2]
    uvw = _mm3(cam_src, K_src)
    safe_w = jnp.where(jnp.abs(uvw[..., 2]) < 1e-8, 1e-8, uvw[..., 2])
    x_s = uvw[..., 0] / safe_w
    y_s = uvw[..., 1] / safe_w

    xi = jnp.round(x_s).astype(jnp.int32)
    yi = jnp.round(y_s).astype(jnp.int32)
    inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H) & (z_src > 1e-6)
    xi_c = jnp.clip(xi, 0, W - 1)
    yi_c = jnp.clip(yi, 0, H - 1)
    flat_idx = yi_c * W + xi_c

    d_src = jnp.take(depth_src.reshape(-1), flat_idx.reshape(-1)).reshape(H, W)
    n_src = jnp.take(
        normal_src.reshape(-1, 3), flat_idx.reshape(-1), axis=0
    ).reshape(H, W, 3)

    # src pixel + sampled src depth -> world -> ref view
    pix_src = jnp.stack(
        [xi_c.astype(jnp.float32), yi_c.astype(jnp.float32), jnp.ones_like(x_s)], -1
    )
    cam_src2 = _mm3(pix_src, K_src_inv) * d_src[..., None]
    world_src = _mm3(cam_src2, T_src_inv[:3, :3]) + T_src_inv[:3, 3]
    cam_ref2 = _mm3(world_src, T_ref[:3, :3]) + T_ref[:3, 3]
    depth_reproj = cam_ref2[..., 2]
    uvw2 = _mm3(cam_ref2, K_ref)
    safe_w2 = jnp.where(jnp.abs(uvw2[..., 2]) < 1e-8, 1e-8, uvw2[..., 2])
    x_r = uvw2[..., 0] / safe_w2
    y_r = uvw2[..., 1] / safe_w2

    dist = jnp.sqrt((x_r - gx) ** 2 + (y_r - gy) ** 2)
    depth_diff = jnp.abs(depth_reproj - depth_ref)
    rel_diff = depth_diff / jnp.where(valid, depth_ref, 1.0)

    # normal agreement in the world frame
    n_src_world = _mm3(n_src, R_src_wc)
    n_src_world = n_src_world / (
        jnp.linalg.norm(n_src_world, axis=-1, keepdims=True) + 1e-12
    )
    cos_sim = jnp.sum(normal_ref_world * n_src_world, axis=-1)

    mask = (
        (dist < position_threshold)
        & (rel_diff < depth_threshold)
        & (prob_ref > confidence_threshold)
        & (cos_sim > normal_cos_threshold)
        & valid
        & inb
        & (d_src > 0)
    )

    angle_conf = jnp.where(mask, jnp.maximum(cos_sim, 0.0), 0.0)
    return {
        "mask": mask,
        "depth_reprojected": jnp.where(mask, depth_reproj, 0.0),
        "xyz_world_src": jnp.where(mask[..., None], world_src, 0.0),
        "angle_confidence": angle_conf,
        "src_y": yi_c,
        "src_x": xi_c,
    }


def normal_cos_threshold(normal_threshold_deg: float) -> float:
    return math.cos(math.radians(normal_threshold_deg))


def backproject_to_world(
    depth: np.ndarray, geom: ViewGeometry
) -> np.ndarray:
    """Host-side: ref depth map [H, W] -> world points [H, W, 3] (float64)."""
    H, W = depth.shape
    K_inv = np.linalg.inv(np.asarray(geom.K, np.float64))
    T_wc = np.asarray(geom.T_wc, np.float64)
    gx, gy = np.meshgrid(np.arange(W, dtype=np.float64),
                         np.arange(H, dtype=np.float64))
    pix = np.stack([gx, gy, np.ones_like(gx)], -1)
    cam = (pix @ K_inv.T) * depth[..., None]
    return (cam @ T_wc[:3, :3].T + T_wc[:3, 3]).astype(np.float32)


def normals_to_world(normals_cam: np.ndarray, geom: ViewGeometry) -> np.ndarray:
    """Camera-frame normals [H, W, 3] -> unit world-frame normals."""
    n = normals_cam @ np.asarray(geom.R_wc, np.float64).T
    n = n / (np.linalg.norm(n, axis=-1, keepdims=True) + 1e-12)
    return n.astype(np.float32)
