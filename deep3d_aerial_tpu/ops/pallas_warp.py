"""Pallas TPU kernel: windowed plane-sweep warp + product correlation.

The MVS hot loop samples source features at projectively-warped coordinates.
Mosaic has no per-lane vector gather, so this kernel reformulates EXACT
bilinear sampling as separable one-hot contractions over a per-tile source
WINDOW (bilinear weights w(t) = max(0, 1 - |x - t|) form a matmul against
the window rows on the MXU):

    t[wy*C + c, p] = sum_wx win_t[wx, wy*C + c] * AxT[wx, p]     (MXU)
    out[p]         = sum_c ref_t[c, p] * sum_wy ay_wy[p] * t_wy[c, p]

Mosaic-friendliness drives the layout:
  * the source is pre-transposed ONCE per plane to [W, H*C] so the window
    DMA (dynamic origins from a scalar-prefetched table) lands directly in
    matmul layout [WIN_W, WIN_H*C] — no in-kernel transposes;
  * all flattenings collapse INTO the lane dimension ([TH, TW] -> [1, P]),
    never out of it (minor-dim-shrinking casts are unsupported);
  * the y-contraction is a static unrolled loop of [C, P] slices.

Pixels whose footprint escapes the window fall to zero — exact
grid_sample-'zeros' semantics whenever the window covers the tile footprint,
which narrow refinement-stage depth windows guarantee (docs/PERF.md). The
XLA gather path (ops/warp.py) is the oracle and general fallback.
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
    ref_t_ref,     # [C, TH, TW] channel-major ref tile (VMEM block)
    src_t_ref,     # [W, H*C] transposed source, stays in HBM/ANY
    out_ref,       # [1, P] output row (VMEM block)
    win_scratch,   # [WIN_W, WIN_H*C] VMEM scratch
    dma_sem,
    *,
    TH: int, TW: int, WIN_H: int, WIN_W: int, C: int,
    W_img: int, H_img: int, n_tiles_w: int,
):
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    tile_idx = ti * n_tiles_w + tj
    # origins are pre-quantized (x to 8 sublanes, y*C to 128 lanes); the
    # hints let Mosaic prove DMA-offset divisibility
    win_y0 = origins_ref[tile_idx, 0]
    win_x0 = pl.multiple_of(origins_ref[tile_idx, 1], 8)
    win_y0c = pl.multiple_of(win_y0 * C, 128)

    # window DMA: rows = src x, lanes = (y, c) packed -> [WIN_W, WIN_H*C]
    copy = pltpu.make_async_copy(
        src_t_ref.at[pl.ds(win_x0, WIN_W), pl.ds(win_y0c, WIN_H * C)],
        win_scratch,
        dma_sem,
    )
    copy.start()

    # projective coordinates of this ref tile at its depth plane
    ys = (ti * TH).astype(jnp.float32) + jax.lax.broadcasted_iota(
        jnp.int32, (TH, TW), 0).astype(jnp.float32)
    xs = (tj * TW).astype(jnp.float32) + jax.lax.broadcasted_iota(
        jnp.int32, (TH, TW), 1).astype(jnp.float32)
    d = depths_ref[...]
    # SMEM serves scalar loads only — read coefficients one by one
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
    # lane-collapse only: [TH, TW] -> [1, P]
    lx = (x_src - win_x0.astype(jnp.float32)).reshape(1, P)
    ly = (y_src - win_y0.astype(jnp.float32)).reshape(1, P)
    inb_row = inb.astype(jnp.float32).reshape(1, P)  # i1 lane-collapse unsupported

    wxs = jax.lax.broadcasted_iota(jnp.int32, (WIN_W, 1), 0).astype(jnp.float32)
    AxT = jnp.maximum(0.0, 1.0 - jnp.abs(lx - wxs))  # [WIN_W, P]

    copy.wait()
    win_t = win_scratch[...]  # [WIN_W, WIN_H*C]

    # x-contraction on the MXU (contract the shared WIN_W dim):
    # [WIN_W, WIN_H*C] x [WIN_W, P] -> [WIN_H*C, P]
    t = jax.lax.dot_general(
        win_t, AxT,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # y-contraction: static unrolled sum of ay-weighted [C, P] slices
    acc = jnp.zeros((C, P), jnp.float32)
    for wy in range(WIN_H):
        ay = jnp.maximum(0.0, 1.0 - jnp.abs(ly - float(wy)))  # [1, P]
        acc = acc + ay * t[wy * C:(wy + 1) * C, :]

    ref_t = ref_t_ref[...].reshape(C, P)  # lane-collapse
    corr = jnp.sum(ref_t * acc, axis=0, keepdims=True) * inb_row / C
    # out block covers 8 consecutive tiles (sublane-divisibility rule);
    # write this tile's row dynamically
    out_ref[pl.ds(tile_idx % 8, 1), :] = corr


def window_origins(
    rel_flat: jnp.ndarray,  # [12]
    depths: jnp.ndarray,    # [H, W]
    H: int, W: int, TH: int, TW: int, WIN_H: int, WIN_W: int,
    C: int = 32,
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
    # quantize so the in-kernel DMA offsets satisfy Mosaic tiling rules:
    # x (sublane dim of the transposed src) to 8; y*C (lane dim) to 128
    y_quant = max(1, 128 // max(C, 1))
    y0 = jnp.floor(y0 / y_quant) * y_quant
    x0 = jnp.floor(x0 / 8.0) * 8.0
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
    P = TH * TW

    d_hw = jnp.broadcast_to(jnp.asarray(depth_plane, jnp.float32), (H, W))
    rel_flat = jnp.asarray(rel, jnp.float32).reshape(-1)[:12]
    origins = window_origins(rel_flat, d_hw, H, W, TH, TW, WIN_H, WIN_W, C)

    # one-time layout transforms (XLA-side, fused/cheap):
    src_t = jnp.transpose(src_feat.astype(jnp.float32), (1, 0, 2)).reshape(
        W, H * C
    )
    ref_t = jnp.transpose(ref_feat.astype(jnp.float32), (2, 0, 1))  # [C, H, W]

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
            pl.BlockSpec((C, TH, TW), lambda i, j, org: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # src_t, manual DMA
        ],
        out_specs=pl.BlockSpec(
            (8, P), lambda i, j, org: ((i * n_tw + j) // 8, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((WIN_W, WIN_H * C), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    n_tiles_pad = ((n_th * n_tw + 7) // 8) * 8
    flat = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles_pad, P), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(origins, rel_flat[None, :], d_hw, ref_t, src_t)

    # reassemble tiles -> [H, W] (XLA-side)
    return (
        flat[: n_th * n_tw]
        .reshape(n_th, n_tw, TH, TW)
        .transpose(0, 2, 1, 3)
        .reshape(H, W)
    )
