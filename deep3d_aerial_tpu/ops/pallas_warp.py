"""Pallas TPU kernel: windowed plane-sweep warp + product correlation.

The MVS hot loop samples source features at projectively-warped coordinates.
Mosaic has no per-lane vector gather, so this kernel reformulates EXACT
bilinear sampling as two separable one-hot contractions over a per-tile
source WINDOW (bilinear weights w(t) = max(0, 1 - |x - t|) form a matmul
against the window rows on the MXU):

    t[p, wy, c] = sum_wx Ax[p, wx] * win[wy, wx, c]        (MXU)
    out[p, c]   = sum_wy Ay[p, wy] * t[p, wy, c]           (VPU)

Per grid tile, the source window is DMA'd HBM->VMEM with a dynamic origin
(pl.ds starts from a scalar-prefetched per-tile table computed in-graph from
the projected tile centers). Pixels whose footprint escapes the window fall
to zero — exact grid_sample-'zeros' semantics whenever the window covers the
tile footprint, which narrow refinement-stage depth windows guarantee
(docs/PERF.md design). The XLA gather path (ops/warp.py) is the oracle and
general fallback.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _warp_corr_kernel(
    origins_ref,   # scalar prefetch [nTiles, 2] (win_y0, win_x0) int32
    rel_ref,       # [1, 12] SMEM
    depths_ref,    # [TH, TW] ref-tile depth plane (VMEM block)
    ref_tile_ref,  # [TH, TW, C] (VMEM block)
    src_ref,       # [H, W, C] full source, stays in HBM/ANY
    out_ref,       # [TH, TW] (VMEM block)
    win_scratch,   # [WIN_H, WIN_W, C] VMEM scratch
    dma_sem,
    *,
    TH: int, TW: int, WIN_H: int, WIN_W: int, C: int,
    W_img: int, H_img: int, n_tiles_w: int,
):
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    tile_idx = ti * n_tiles_w + tj
    win_y0 = origins_ref[tile_idx, 0]
    win_x0 = origins_ref[tile_idx, 1]

    # source window DMA with dynamic element offsets
    copy = pltpu.make_async_copy(
        src_ref.at[pl.ds(win_y0, WIN_H), pl.ds(win_x0, WIN_W), :],
        win_scratch,
        dma_sem,
    )
    copy.start()

    # projective coordinates of this ref tile at its depth plane
    # Mosaic iota must be integer-typed; cast after
    ys = (ti * TH).astype(jnp.float32) + jax.lax.broadcasted_iota(
        jnp.int32, (TH, TW), 0).astype(jnp.float32)
    xs = (tj * TW).astype(jnp.float32) + jax.lax.broadcasted_iota(
        jnp.int32, (TH, TW), 1).astype(jnp.float32)
    d = depths_ref[...]
    # SMEM only serves scalar loads (Mosaic) — read coefficients one by one
    r = [rel_ref[0, k] for k in range(12)]
    px = (r[0] * xs + r[1] * ys + r[2]) * d + r[3]
    py = (r[4] * xs + r[5] * ys + r[6]) * d + r[7]
    pz = (r[8] * xs + r[9] * ys + r[10]) * d + r[11]
    safe = jnp.where(jnp.abs(pz) < 1e-8, 1e-8, pz)
    x_src = jnp.where(pz > 1e-6, px / safe, -1e9)
    y_src = jnp.where(pz > 1e-6, py / safe, -1e9)
    inb = (
        (x_src > -1.0) & (x_src < W_img) & (y_src > -1.0) & (y_src < H_img)
    )

    P = TH * TW
    lx = (x_src - win_x0.astype(jnp.float32)).reshape(P, 1)
    ly = (y_src - win_y0.astype(jnp.float32)).reshape(P, 1)
    wxs = jax.lax.broadcasted_iota(jnp.int32, (P, WIN_W), 1).astype(jnp.float32)
    Ax = jnp.maximum(0.0, 1.0 - jnp.abs(lx - wxs))  # [P, WIN_W]
    wys = jax.lax.broadcasted_iota(jnp.int32, (P, WIN_H), 1).astype(jnp.float32)
    Ay = jnp.maximum(0.0, 1.0 - jnp.abs(ly - wys))  # [P, WIN_H]

    copy.wait()
    win = win_scratch[...]  # [WIN_H, WIN_W, C]

    # x-contraction on the MXU: [P, WIN_W] @ [WIN_W, WIN_H*C]
    win_t = jnp.transpose(win, (1, 0, 2)).reshape(WIN_W, WIN_H * C)
    t = jnp.dot(Ax, win_t, preferred_element_type=jnp.float32)
    t = t.reshape(P, WIN_H, C)
    sampled = jnp.sum(Ay[:, :, None] * t, axis=1)  # [P, C]  (VPU)
    sampled = sampled * inb.reshape(P, 1).astype(jnp.float32)

    ref_tile = ref_tile_ref[...].reshape(P, C)
    out_ref[...] = jnp.mean(sampled * ref_tile, axis=-1).reshape(TH, TW)


def window_origins(
    rel_flat: jnp.ndarray,  # [12]
    depths: jnp.ndarray,    # [H, W]
    H: int, W: int, TH: int, TW: int, WIN_H: int, WIN_W: int,
) -> jnp.ndarray:
    """Per-tile window origins centered on the projected tile centers,
    clamped inside the source image. [nTiles, 2] int32 (in-graph)."""
    n_th, n_tw = H // TH, W // TW
    cy = jnp.arange(n_th, dtype=jnp.float32) * TH + TH / 2.0
    cx = jnp.arange(n_tw, dtype=jnp.float32) * TW + TW / 2.0
    gy, gx = jnp.meshgrid(cy, cx, indexing="ij")
    d_tiles = depths.reshape(n_th, TH, n_tw, TW).mean(axis=(1, 3))
    r = rel_flat
    px = (r[0] * gx + r[1] * gy + r[2]) * d_tiles + r[3]
    py = (r[4] * gx + r[5] * gy + r[6]) * d_tiles + r[7]
    pz = (r[8] * gx + r[9] * gy + r[10]) * d_tiles + r[11]
    pz = jnp.where(jnp.abs(pz) < 1e-8, 1e-8, pz)
    y0 = jnp.clip(jnp.round(py / pz - WIN_H / 2.0), 0, max(H - WIN_H, 0))
    x0 = jnp.clip(jnp.round(px / pz - WIN_W / 2.0), 0, max(W - WIN_W, 0))
    return jnp.stack([y0.reshape(-1), x0.reshape(-1)], -1).astype(jnp.int32)


def warp_corr_plane_pallas(
    ref_feat: jnp.ndarray,     # [H, W, C]
    src_feat: jnp.ndarray,     # [H, W, C]
    rel: jnp.ndarray,          # [4, 4] or [3, 4]
    depth_plane: jnp.ndarray,  # [H, W] or scalar
    tile: Tuple[int, int] = (16, 128),
    window: Tuple[int, int] = (64, 256),
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused warp + product-correlation at one depth plane -> [H, W].

    Equivalent to mean_c(ref * bilinear_warp(src)) (the AdaMVS pair/stream
    cost, adamvs.py:466-509) when each tile's footprint fits its window.
    Requires H % tile[0] == 0 and W % tile[1] == 0.
    """
    H, W, C = src_feat.shape
    TH, TW = tile
    WIN_H, WIN_W = min(window[0], H), min(window[1], W)
    assert H % TH == 0 and W % TW == 0, (H, W, tile)
    n_th, n_tw = H // TH, W // TW

    d_hw = jnp.broadcast_to(
        jnp.asarray(depth_plane, jnp.float32), (H, W)
    )
    rel_flat = jnp.asarray(rel, jnp.float32).reshape(-1)[:12]
    origins = window_origins(rel_flat, d_hw, H, W, TH, TW, WIN_H, WIN_W)

    kernel = functools.partial(
        _warp_corr_kernel,
        TH=TH, TW=TW, WIN_H=WIN_H, WIN_W=WIN_W, C=C,
        W_img=W, H_img=H, n_tiles_w=n_tw,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_th, n_tw),
        in_specs=[
            pl.BlockSpec((1, 12), lambda i, j, org: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TH, TW), lambda i, j, org: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TH, TW, C), lambda i, j, org: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # full src, manual DMA
        ],
        out_specs=pl.BlockSpec((TH, TW), lambda i, j, org: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((WIN_H, WIN_W, C), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(origins, rel_flat[None, :], d_hw, ref_feat.astype(jnp.float32),
      src_feat.astype(jnp.float32))
