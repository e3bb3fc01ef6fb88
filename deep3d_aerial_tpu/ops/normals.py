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


def depth_from_normal(
    depth: jnp.ndarray,       # [H, W]
    normal: jnp.ndarray,      # [H, W, 3] camera-frame unit normals
    K: jnp.ndarray,           # [3, 3] intrinsics
    image_gray: jnp.ndarray,  # [H, W] luminance for edge weights
    alpha: float = 0.1,
) -> jnp.ndarray:
    """Normal-guided depth propagation (the inverse refinement direction,
    reference compute_depth_by_normal, compute_normals.py:84-225).

    Each pixel's local plane (depth + normal) predicts the depth of its 8
    neighbors: with ray(u) = K_inv [u, 1], a neighbor q on p's plane has
        depth(q) = depth(p) * (ray(p) . n(p)) / (ray(q) . n(p)).
    Every pixel averages the 8 predictions propagated FROM its neighbors,
    weighted by exp(-alpha * |I(p) - I(neighbor)|) so depth does not bleed
    across photometric edges; border pixels with no neighbor in a given
    direction fall back to their own depth (the reference keeps depth_init
    there). NOTE (deviation): reference lines 146-149 reuse
    denominator_y0 for the x1/y1 offsets — a latent copy-paste bug; here
    every offset uses its own plane denominator.
    """
    H, W = depth.shape
    K = jnp.asarray(K, jnp.float32)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    gx, gy = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                          jnp.arange(H, dtype=jnp.float32))
    rx = (gx - cx) / fx
    ry = (gy - cy) / fy

    nx, ny, nz = normal[..., 0], normal[..., 1], normal[..., 2]
    num = rx * nx + ry * ny + nz  # ray(p) . n(p)

    def shift(a, dy, dx, fill):
        """a[y - dy, x - dx] with `fill` outside (value propagated FROM
        the (dy, dx) neighbor)."""
        pad = jnp.pad(a, ((1, 1), (1, 1)), constant_values=fill)
        return pad[1 - dy:1 - dy + H, 1 - dx:1 - dx + W]

    cands, weights = [], []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            d_n = shift(depth, dy, dx, 0.0)
            num_n = shift(num, dy, dx, 0.0)
            nx_n = shift(nx, dy, dx, 0.0)
            ny_n = shift(ny, dy, dx, 0.0)
            nz_n = shift(nz, dy, dx, 1.0)
            den = rx * nx_n + ry * ny_n + nz_n  # ray(p) . n(neighbor)
            den = jnp.where(jnp.abs(den) < 1e-3,
                            jnp.where(den < 0, -1e-3, 1e-3), den)
            cand = d_n * num_n / den
            inb = shift(jnp.ones_like(depth), dy, dx, 0.0) > 0.5
            grad = jnp.abs(image_gray - shift(image_gray, dy, dx, 0.0))
            w = jnp.exp(-alpha * grad) * inb
            cands.append(jnp.where(inb, cand, depth))
            weights.append(jnp.where(inb, w, 1e-6))
    cands = jnp.stack(cands)
    weights = jnp.stack(weights)
    return jnp.sum(cands * weights, 0) / jnp.sum(weights, 0)
