"""Normal maps from depth maps (and the inverse refinement direction).

Capability parity with /root/reference/mvs/mvs_cas/models/compute_normals.py:
back-project depth to camera-space points, estimate the surface normal per
pixel from neighboring-point cross products, keep it unit-length and facing
the camera. Vectorized jnp (runs under jit on TPU); the reference loops
8 neighbor shifts in torch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def backproject_cam(depth: jnp.ndarray, K_inv: jnp.ndarray) -> jnp.ndarray:
    """depth [H, W] + K_inv -> camera-space points [H, W, 3]."""
    H, W = depth.shape
    gx, gy = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                          jnp.arange(H, dtype=jnp.float32))
    # elementwise (not @): TPU MXU feeds f32 matmul operands as bf16 and
    # pixel coords >= 2^8 would lose mantissa bits (see fusion/consistency)
    ray = jnp.stack(
        [K_inv[a, 0] * gx + K_inv[a, 1] * gy + K_inv[a, 2] for a in range(3)],
        axis=-1,
    )
    return ray * depth[..., None]


def normals_from_depth(depth: jnp.ndarray, K_inv: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel unit normals [H, W, 3] in the camera frame (z toward camera
    is negative; normals face the camera: n_z <= 0)."""
    pts = backproject_cam(depth, K_inv)

    # central differences (replicated borders)
    dx = jnp.gradient(pts, axis=1)
    dy = jnp.gradient(pts, axis=0)
    n = jnp.cross(dx, dy)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(norm, 1e-12)
    # orient toward the camera (viewing direction ~ -pts)
    facing = jnp.sum(n * pts, axis=-1, keepdims=True)
    n = jnp.where(facing > 0, -n, n)
    valid = (depth > 0)[..., None]
    default = jnp.array([0.0, 0.0, -1.0], jnp.float32)
    return jnp.where(valid, n, default)


def depth_gradient_weights(image_gray: jnp.ndarray, beta: float = 10.0):
    """Image-gradient edge weights in [0, 1] (low at edges), used by the
    depth-from-normal refinement direction (compute_normals.py:84-...)."""
    gx = jnp.gradient(image_gray, axis=1)
    gy = jnp.gradient(image_gray, axis=0)
    mag = jnp.sqrt(gx * gx + gy * gy)
    return jnp.exp(-beta * mag)
