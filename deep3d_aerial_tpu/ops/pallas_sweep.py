"""Pallas TPU kernel: plane-sweep warp + correlation over a chunk of planes.

The MVS hot op is bilinear sampling of source features at projectively
warped coordinates (reference homo_warping_float,
/root/reference/mvs/mvs_cas/models/module.py:516-557). XLA lowers this to
per-element gathers which run at ~26 ns/sample on TPU — measured 85% of
AdaMVS inference time (docs/PERF.md). Mosaic exposes no per-lane vector
gather, so this kernel reformulates EXACT zero-padded 2D bilinear sampling
as per-tile-row one-hot contractions on the MXU:

  for each ref tile (TH x TW) and plane k:
    for each tile row v:
      ybase  = floor(min_u y_src(v, u))            # 2-4 source rows suffice
      rows   = window[ybase : ybase + NR]          # [NR*C, WIN_W] VMEM slice
      SelX   = hat(x_src(v, u) - x_window)         # [WIN_W, TW] built on VPU
      t      = rows @ SelX                         # ONE MXU matmul per row
      out(v) = sum_r hat(y_src - row_r) * t_r      # 2-tap y lerp, VPU
    corr(k, tile) = mean_c(ref * out)              # fused product corr

versus the naive one-hot scheme (the round-1 ops/pallas_warp.py kernel,
retired in round 3 — x-interpolated every window row at every PIXEL) this
is O(NR*C*WIN_W) instead of O(WIN_H*C*WIN_W) work per output pixel, and
the window DMA is shared by ALL K planes of a chunk (refinement-stage
windows are narrow, so the union footprint stays small).

hat(d) = max(0, 1 - |d|) reproduces bilinear weights AND grid_sample
'zeros' padding exactly: out-of-window taps simply don't exist and
in-window taps get the correct fractional weight. Pixels whose footprint
escapes the window (or whose tile row spans > NR-2 source rows) fall to
zero; `chunk_coverage` reports whether a chunk is fully covered so callers
can fall back to the XLA gather path (ops/warp.py — also the oracle).

Arbitrary image sizes: the wrappers lane-pad H to the tile height and W
to a 128-lane multiple (256 via pad_to for the channel-first handoff to
the fused RedStep2 kernel). Zero-padded SOURCE columns/rows are exactly
grid_sample-'zeros' semantics, so sampling needs no masking; padded REF
pixels (outputs that get cropped) are masked to x=y=-1e9 in both the
coverage computation and the kernel so their garbage footprints can
neither trip the coverage flag nor drag a tile row's ybase. This removes
the round-2 W%128 applicability cliff at the reference operating point
(stage widths 2752/1376/688, /root/reference/config.yaml:9-11).

Mosaic constraints encoded (learned building the retired round-1 kernel):
scalar-only SMEM loads, lane-collapse-only reshapes, window DMA origin
aligned to 128 lanes (x) with the leading row dim (y) free, >=8-sublane
output blocks via the 8-tile revisit pattern.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _default_window() -> Tuple[int, int]:
    """Kernel src-window size (rows, lanes). Resolved at TRACE time from
    SWEEP_WIN="H,W" (same pattern as SWEEP_STRICT): the required window
    scales with f*baseline/depth^2 disparity, so the pipeline sets it
    per scene from estimate_window — the (32, 256) default covers the
    bench geometry, NOT every production survey (the r5 full-res E2E
    found a realistic f=3727 px survey needs (48, 512)+)."""
    import os

    spec = os.environ.get("SWEEP_WIN")
    if spec:
        h, w = (int(x) for x in spec.split(","))
        return (h, w)
    return (32, 256)


def _default_nr() -> int:
    """Per-output-row source-row tap count (SWEEP_NR env override)."""
    import os

    return int(os.environ.get("SWEEP_NR", "4"))


def estimate_window(
    rel_stages,          # [S, V-1, 4, 4] host array (per-stage rel projs)
    depth_min: float,
    depth_max: float,
    image_hw: Tuple[int, int],   # full-res (H, W)
    ndepths=(48, 32, 8),
    ratios=(4.0, 2.0, 1.0),
    num_depth: int = 384,
    chunk: int = 8,
    tile: Tuple[int, int] = (8, 128),
):
    """Host-side worst-case (WIN_H, WIN_W, NR) over all stages/views.

    Mirrors chunk_origins_and_coverage's math in NumPy on tile-corner
    grids: for every stage, src view, and depth-chunk endpoint pair, the
    per-tile src-footprint span determines the window the kernel DMA
    must fetch (x0 is quantized down to 128 lanes, so WIN_W pays up to
    +127; y0 is free, +2 bilinear taps). Stage>=2 centers are data-
    dependent (previous-stage depth), so centers sweep [dmin, dmax] —
    conservative for smooth scenes, exact-bound for the constant-depth
    worst case. Returns ladder-quantized sizes (W to 128 multiples, H to
    8, NR even) for compile-cache stability.
    """
    import warnings

    import numpy as np

    H, W = image_hw
    TH, TW = tile
    interval = (depth_max - depth_min) / float(num_depth)
    need_w, need_h, need_nr = 1, 1, 2
    S = len(ndepths)
    for s in range(S):
        scale = 2 ** (S - 1 - s)
        Hs, Ws = H // scale, W // scale
        # tile corner grid (projective map extrema lie on tile edges)
        gy = np.arange(0, _round_up(Hs, TH) + 1, TH, dtype=np.float64)
        gx = np.arange(0, _round_up(max(Ws, TW), TW) + 1, TW, dtype=np.float64)
        gy = np.clip(gy, 0, Hs - 1)
        gx = np.clip(gx, 0, Ws - 1)
        GX, GY = np.meshgrid(gx, gy)
        nd = ndepths[s]
        if s == 0:
            centers = [None]
            win_span = depth_max - depth_min
        else:
            centers = np.linspace(depth_min, depth_max, 5)
            win_span = nd * ratios[s] * interval
        for rel in np.asarray(rel_stages[s], np.float64):
            r = rel.reshape(-1)[:12]
            for c in centers:
                lo = depth_min if c is None else max(
                    depth_min * 0.5, c - win_span / 2)
                hi = depth_max if c is None else c + win_span / 2
                planes = np.linspace(lo, hi, nd)
                for k0 in range(0, nd, chunk):
                    dk = planes[k0:k0 + chunk]
                    ds = np.array([dk[0], dk[-1]])[:, None, None]
                    px = (r[0] * GX + r[1] * GY + r[2])[None] * ds + r[3]
                    py = (r[4] * GX + r[5] * GY + r[6])[None] * ds + r[7]
                    pz = (r[8] * GX + r[9] * GY + r[10])[None] * ds + r[11]
                    ok = pz > 1e-6
                    if not ok.any():
                        continue
                    x = np.where(ok, px / np.where(ok, pz, 1.0), np.nan)
                    y = np.where(ok, py / np.where(ok, pz, 1.0), np.nan)
                    inb = ok & (x > -1) & (x < Ws) & (y > -1) & (y < Hs)
                    if not inb.any():
                        continue
                    x = np.where(inb, x, np.nan)
                    y = np.where(inb, y, np.nan)
                    # per-tile extrema over the 4 corners x chunk planes
                    def tile_minmax(a):
                        quad = np.stack([a[:, :-1, :-1], a[:, :-1, 1:],
                                         a[:, 1:, :-1], a[:, 1:, 1:]])
                        lo_ = np.nanmin(np.nanmin(quad, axis=0), axis=0)
                        hi_ = np.nanmax(np.nanmax(quad, axis=0), axis=0)
                        return lo_, hi_
                    with np.errstate(invalid="ignore"), \
                            warnings.catch_warnings():
                        # tiles with no in-image pixel are all-NaN ->
                        # trivially covered; silence their nanmin warning
                        warnings.simplefilter("ignore", RuntimeWarning)
                        x_lo, x_hi = tile_minmax(x)
                        y_lo, y_hi = tile_minmax(y)
                        # mirror chunk_origins_and_coverage exactly:
                        # x0 = floor(x_min) quantized DOWN to 128 lanes,
                        # need = hi_tap - x0 + 1 taps; y0 = floor(y_min)
                        x0t = np.floor(
                            np.nan_to_num(x_lo, nan=0.0)) // 128 * 128
                        w_req = (np.floor(np.nan_to_num(x_hi, nan=0.0))
                                 + 1 - x0t + 1)
                        w_req = np.where(np.isnan(x_lo), 0, w_req)
                        h_req = (np.floor(np.nan_to_num(y_hi, nan=0.0))
                                 - np.floor(np.nan_to_num(y_lo, nan=0.0))
                                 + 2)
                        h_req = np.where(np.isnan(y_lo), 0, h_req)
                        # per-row span: y across one tile row (both chunk
                        # endpoint planes budget NR independently)
                        row_hi = np.nanmax(np.stack(
                            [y[:, :, :-1], y[:, :, 1:]]), axis=0)
                        row_lo = np.nanmin(np.stack(
                            [y[:, :, :-1], y[:, :, 1:]]), axis=0)
                        rspan = np.nan_to_num(
                            (row_hi - row_lo), nan=0.0).max()
                    need_w = max(need_w, int(w_req.max()))
                    need_h = max(need_h, int(h_req.max()))
                    need_nr = max(need_nr, int(np.ceil(rspan)) + 2)
    win_w = max(256, _round_up(need_w, 128))
    win_h = max(32, _round_up(need_h, 8))
    nr = max(4, _round_up(need_nr, 2))
    return win_h, win_w, nr


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pad_hw(a: jnp.ndarray, Hp: int, Wp: int, axes=(-2, -1)) -> jnp.ndarray:
    """Zero-pad the two spatial axes (identified by `axes`) to (Hp, Wp)."""
    pads = [(0, 0)] * a.ndim
    pads[axes[0] % a.ndim] = (0, Hp - a.shape[axes[0]])
    pads[axes[1] % a.ndim] = (0, Wp - a.shape[axes[1]])
    if all(p == (0, 0) for p in pads):
        return a
    return jnp.pad(a, pads)


def _sel_dot(rows2, SelX, precision):
    """rows2 [M, WIN_W] @ SelX [WIN_W, TW] on the MXU.

    precision='bf16': one pass — Mosaic feeds f32 operands to the MXU as
    bf16, so VALUES >= 2^8 lose low mantissa bits (~0.4% relative operand
    error; measured on-chip, and NOT fixed by lax.Precision.HIGHEST, which
    multiplies pass count without recovering the bits for this layout).
    Fine for normalized learned features, wrong for raw-magnitude data.
    precision='f32x3': manual error-free bf16 split of BOTH operands,
    3 accumulated passes -> f32-faithful products (the exactness mode)."""
    def dot(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if precision != "f32x3":
        return dot(rows2, SelX)
    from .pallas_red import _bf16_split  # fold-proof split (see there)
    r_hi, r_lo = _bf16_split(rows2)
    s_hi, s_lo = _bf16_split(SelX)
    return dot(r_hi, s_hi) + (dot(r_lo, s_hi) + dot(r_hi, s_lo))


def _sweep_corr_kernel(
    origins_ref,   # scalar prefetch [2, nTiles] (win_y0; win_x0) int32
    rel_ref,       # [1, 12] SMEM
    depths_ref,    # [K, TH, TW] depth planes for this tile (VMEM block)
    ref_t_ref,     # [C, TH, TW] channel-major ref tile (VMEM block)
    src_t_ref,     # [H, C, W] channel-middle source (ANY; manual DMA)
    out_ref,       # [K, 8, P] output rows (VMEM block, 8-tile revisit)
    win_scratch,   # [WIN_H, C, WIN_W] VMEM scratch
    dma_sem,
    *,
    K: int, TH: int, TW: int, WIN_H: int, WIN_W: int, NR: int, C: int,
    n_tiles_w: int, precision, ref_valid=None,
):
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    tile_idx = ti * n_tiles_w + tj
    win_y0 = origins_ref[0, tile_idx]
    win_x0 = pl.multiple_of(origins_ref[1, tile_idx], 128)

    copy = pltpu.make_async_copy(
        src_t_ref.at[pl.ds(win_y0, WIN_H), :, pl.ds(win_x0, WIN_W)],
        win_scratch,
        dma_sem,
    )
    copy.start()

    ys_base = (ti * TH).astype(jnp.float32) + jax.lax.broadcasted_iota(
        jnp.int32, (TH, TW), 0).astype(jnp.float32)
    xs_base = (tj * TW).astype(jnp.float32) + jax.lax.broadcasted_iota(
        jnp.int32, (TH, TW), 1).astype(jnp.float32)
    r = [rel_ref[0, i] for i in range(12)]  # SMEM: scalar loads only

    ref_t = ref_t_ref[...]  # [C, TH, TW]
    wxs = jax.lax.broadcasted_iota(
        jnp.int32, (WIN_W, 1), 0).astype(jnp.float32)
    # padded-buffer REF pixels (cropped outputs) must not drag a tile
    # row's ybase or sample anything: same -1e9 marking as _coords
    valid = None
    if ref_valid is not None:
        hv, wv = ref_valid
        valid = (ys_base < float(hv)) & (xs_base < float(wv))

    copy.wait()
    x0f = win_x0.astype(jnp.float32)

    for k in range(K):
        d = depths_ref[k]
        px = (r[0] * xs_base + r[1] * ys_base + r[2]) * d + r[3]
        py = (r[4] * xs_base + r[5] * ys_base + r[6]) * d + r[7]
        pz = (r[8] * xs_base + r[9] * ys_base + r[10]) * d + r[11]
        safe = jnp.where(jnp.abs(pz) < 1e-8, 1e-8, pz)
        ok = pz > 1e-6 if valid is None else (pz > 1e-6) & valid
        x_src = jnp.where(ok, px / safe, -1e9)
        y_src = jnp.where(ok, py / safe, -1e9)

        warped_rows = []
        for v in range(TH):
            xs_v = x_src[v:v + 1, :]  # [1, TW] (static slice)
            ys_v = y_src[v:v + 1, :]
            # first source row this tile row needs (clamped into window);
            # out-of-image pixels contribute nothing and must not drag it
            ymin = jnp.min(jnp.where(ys_v > -1.0, ys_v, 1e9))
            ybase = jnp.clip(
                jnp.floor(ymin).astype(jnp.int32) - win_y0,
                0, WIN_H - NR,
            )
            rows = win_scratch[pl.ds(ybase, NR)]  # [NR, C, WIN_W]
            rows2 = rows.reshape(NR * C, WIN_W)

            # one-hot-lerp selection vs window x coordinates (VPU build)
            SelX = jnp.maximum(
                0.0, 1.0 - jnp.abs((xs_v - x0f) - wxs)
            )  # [WIN_W, TW]
            t = _sel_dot(rows2, SelX, precision)  # [NR*C, TW]

            acc = jnp.zeros((C, TW), jnp.float32)
            for rr in range(NR):
                row_idx = (ybase + rr + win_y0).astype(jnp.float32)
                ay = jnp.maximum(0.0, 1.0 - jnp.abs(ys_v - row_idx))  # [1,TW]
                acc = acc + ay * t[rr * C:(rr + 1) * C, :]
            warped_rows.append(acc.reshape(C, 1, TW))

        # assemble [C, TH, TW] and reduce over C ONCE (canonical layout —
        # Mosaic rejects float ADD reduces over offset-layout slices)
        warped = jnp.concatenate(warped_rows, axis=1)
        tile_corr = jnp.sum(ref_t * warped, axis=0) / C  # [TH, TW]
        out_ref[k, pl.ds(tile_idx % 8, 1), :] = tile_corr.reshape(
            1, TH * TW
        )


def _coords(rel_flat, depths, H, W, ref_valid=None):
    """x_src, y_src [K, H, W] for depth planes [K, H, W] (JAX-side).

    ref_valid=(Hv, Wv) marks ref PAD pixels (rows >= Hv / cols >= Wv of a
    lane-padded buffer; their outputs get cropped) as out-of-image
    (-1e9) so they cannot affect window origins or the coverage flag."""
    gy, gx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    r = rel_flat
    px = (r[0] * gx + r[1] * gy + r[2])[None] * depths + r[3]
    py = (r[4] * gx + r[5] * gy + r[6])[None] * depths + r[7]
    pz = (r[8] * gx + r[9] * gy + r[10])[None] * depths + r[11]
    safe = jnp.where(jnp.abs(pz) < 1e-8, 1e-8, pz)
    x = jnp.where(pz > 1e-6, px / safe, -1e9)
    y = jnp.where(pz > 1e-6, py / safe, -1e9)
    if ref_valid is not None and tuple(ref_valid) != (H, W):
        hv, wv = ref_valid
        pad = (gy >= hv) | (gx >= wv)
        x = jnp.where(pad[None], -1e9, x)
        y = jnp.where(pad[None], -1e9, y)
    return x, y


def chunk_origins_and_coverage(
    rel_flat: jnp.ndarray,   # [12]
    depths: jnp.ndarray,     # [K, H, W]
    H: int, W: int, TH: int, TW: int, WIN_H: int, WIN_W: int, NR: int,
    ref_valid=None,
):
    """Per-tile window origins covering ALL K planes + a global coverage
    flag (True = every in-image footprint is representable; False = some
    pixels would silently zero -> caller should use the XLA fallback).

    Origins: y0 free (leading DMA dim), x0 quantized to 128 lanes.
    H, W are the (possibly lane-padded) buffer dims; ref_valid=(Hv, Wv)
    excludes padded ref pixels (see _coords).
    """
    K = depths.shape[0]
    n_th, n_tw = H // TH, W // TW
    x, y = _coords(rel_flat, depths, H, W, ref_valid)
    inb = (x > -1.0) & (x < W) & (y > -1.0) & (y < H)

    def tileize(a):  # [K, H, W] -> [K, n_th, n_tw, TH*TW]
        return a.reshape(K, n_th, TH, n_tw, TW).transpose(
            0, 1, 3, 2, 4).reshape(K, n_th, n_tw, TH * TW)

    big = 1e9
    xt, yt, it = tileize(x), tileize(y), tileize(inb)
    x_min = jnp.min(jnp.where(it, xt, big), axis=(0, 3))    # [n_th, n_tw]
    x_max = jnp.max(jnp.where(it, xt, -big), axis=(0, 3))
    y_min = jnp.min(jnp.where(it, yt, big), axis=(0, 3))
    y_max = jnp.max(jnp.where(it, yt, -big), axis=(0, 3))

    y0 = jnp.clip(jnp.floor(y_min).astype(jnp.int32), 0,
                  max(H - WIN_H, 0))
    x0 = jnp.clip(
        (jnp.floor(x_min).astype(jnp.int32) // 128) * 128, 0,
        max(W - WIN_W, 0),
    )

    # the taps actually NEEDED are floor(c) / floor(c)+1 clipped into the
    # image — out-of-image taps are zero-padded, never fetched
    def lo_tap(c, n):
        return jnp.clip(jnp.floor(c), 0, n - 1)

    def hi_tap(c, n):
        return jnp.clip(jnp.floor(c) + 1, 0, n - 1)

    any_valid = x_min < big  # tiles with no in-image pixel trivially covered
    x_cov = (
        (lo_tap(x_min, W) >= x0)
        & (hi_tap(x_max, W) <= x0 + WIN_W - 1)
    ) | ~any_valid
    y_cov = (
        (lo_tap(y_min, H) >= y0)
        & (hi_tap(y_max, H) <= y0 + WIN_H - 1)
    ) | ~any_valid

    # per tile ROW of each plane: source rows spanned must fit NR taps
    it5 = it.reshape(K, n_th, n_tw, TH, TW)
    yt5 = yt.reshape(K, n_th, n_tw, TH, TW)
    row_min = jnp.min(jnp.where(it5, yt5, big), axis=4)
    row_max = jnp.max(jnp.where(it5, yt5, -big), axis=4)
    row_ok = (
        hi_tap(row_max, H) - lo_tap(row_min, H) + 1 <= NR
    ) | (row_min >= big)
    covered = jnp.all(x_cov) & jnp.all(y_cov) & jnp.all(row_ok)

    # [2, n_tiles] (row 0 = win_y0, row 1 = win_x0): the tile axis rides
    # the MINOR dim so SMEM lane padding is paid once per coordinate row,
    # not once per tile — a [n_tiles, 2] layout pads every 2-int row to a
    # full 128-lane stripe and blows the 1 MB SMEM at full-res tile
    # counts (measured: u8[10452992] 'prefetched SMEM operand' compile
    # failure at 1856x2752, 20416 tile rows x 512 B)
    origins = jnp.stack(
        [y0.reshape(-1), x0.reshape(-1)], axis=0
    ).astype(jnp.int32)
    return origins, covered


def sweep_corr_chunk_pallas(
    ref_feat: jnp.ndarray,   # [H, W, C]
    src_feat: jnp.ndarray,   # [H, W, C]
    rel: jnp.ndarray,        # [4, 4] / [3, 4] relative projection
    depths: jnp.ndarray,     # [K, H, W] depth planes
    tile: Tuple[int, int] = (8, 128),
    window: Optional[Tuple[int, int]] = None,  # None -> SWEEP_WIN env
    nr: Optional[int] = None,                  # None -> SWEEP_NR env
    precision: str = "f32x3",
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused multi-plane warp + product correlation -> ([K, H, W], covered).

    corr[k] == mean_c(ref * bilinear_warp(src, plane k)) wherever the
    coverage flag is True (exact grid_sample-'zeros' semantics). `covered`
    is a traced bool; callers guard with lax.cond on it.

    Any H, W: unaligned images run in zero-padded buffers (H to the tile
    height, W to a 128-lane multiple) with the padded ref pixels masked
    out of coverage/origins/sampling; the output is cropped back.
    """
    Himg, Wimg, C = src_feat.shape
    K = depths.shape[0]
    TH, TW = tile
    H, W = _round_up(Himg, TH), _round_up(max(Wimg, TW), TW)
    if (H, W) != (Himg, Wimg):
        ref_feat = _pad_hw(ref_feat, H, W, axes=(0, 1))
        src_feat = _pad_hw(src_feat, H, W, axes=(0, 1))
        depths = _pad_hw(depths, H, W, axes=(1, 2))
    ref_valid = (Himg, Wimg) if (H, W) != (Himg, Wimg) else None
    window = window or _default_window()
    nr = nr or _default_nr()
    WIN_H, WIN_W = min(window[0], H), min(window[1], W)
    WIN_W = max(128, (WIN_W // 128) * 128)
    n_th, n_tw = H // TH, W // TW
    P = TH * TW

    rel_flat = jnp.asarray(rel, jnp.float32).reshape(-1)[:12]
    depths = jnp.asarray(depths, jnp.float32)
    origins, covered = chunk_origins_and_coverage(
        rel_flat, depths, H, W, TH, TW, WIN_H, WIN_W, nr,
        ref_valid=ref_valid,
    )

    src_t = jnp.transpose(src_feat.astype(jnp.float32), (0, 2, 1))  # [H,C,W]
    ref_t = jnp.transpose(ref_feat.astype(jnp.float32), (2, 0, 1))  # [C,H,W]

    kernel = functools.partial(
        _sweep_corr_kernel,
        K=K, TH=TH, TW=TW, WIN_H=WIN_H, WIN_W=WIN_W, NR=nr, C=C,
        n_tiles_w=n_tw, precision=precision, ref_valid=ref_valid,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_th, n_tw),
        in_specs=[
            pl.BlockSpec((1, 12), lambda i, j, org: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((K, TH, TW), lambda i, j, org: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, TH, TW), lambda i, j, org: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # src_t, manual DMA
        ],
        out_specs=pl.BlockSpec(
            (K, 8, P), lambda i, j, org: (0, (i * n_tw + j) // 8, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((WIN_H, C, WIN_W), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    n_tiles_pad = ((n_th * n_tw + 7) // 8) * 8
    flat = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((K, n_tiles_pad, P), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(origins, rel_flat[None, :], depths, ref_t, src_t)

    corr = (
        flat[:, : n_th * n_tw]
        .reshape(K, n_th, n_tw, TH, TW)
        .transpose(0, 1, 3, 2, 4)
        .reshape(K, H, W)
    )
    return corr[:, :Himg, :Wimg], covered


def _sweep_cost_kernel(
    origins_ref,   # scalar prefetch [2, V * nTiles] (win_y0; win_x0) int32
    rels_ref,      # [V, 12] SMEM
    depths_ref,    # [K, TH, TW] VMEM block
    ref_t_ref,     # [C, TH, TW] VMEM block
    weights_ref,   # [V, TH, TW] VMEM block (view weights; ones if unused)
    src_t_ref,     # [V, H, C, W] (ANY; manual DMA)
    out_ref,       # [K, 1, C, P] VMEM block (channel-first cost tile)
    win_scratch,   # [V, WIN_H, C, WIN_W] VMEM scratch
    dma_sems,      # [V] DMA semaphores
    *,
    V: int, K: int, TH: int, TW: int, WIN_H: int, WIN_W: int, NR: int,
    C: int, n_tiles_w: int, n_tiles: int, mode: str, precision,
    ref_valid=None,
):
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    tile_idx = ti * n_tiles_w + tj

    copies = []
    for v in range(V):
        win_y0 = origins_ref[0, v * n_tiles + tile_idx]
        win_x0 = pl.multiple_of(origins_ref[1, v * n_tiles + tile_idx], 128)
        cp = pltpu.make_async_copy(
            src_t_ref.at[v, pl.ds(win_y0, WIN_H), :, pl.ds(win_x0, WIN_W)],
            win_scratch.at[v],
            dma_sems.at[v],
        )
        cp.start()
        copies.append(cp)

    ys_base = (ti * TH).astype(jnp.float32) + jax.lax.broadcasted_iota(
        jnp.int32, (TH, TW), 0).astype(jnp.float32)
    xs_base = (tj * TW).astype(jnp.float32) + jax.lax.broadcasted_iota(
        jnp.int32, (TH, TW), 1).astype(jnp.float32)
    wxs = jax.lax.broadcasted_iota(
        jnp.int32, (WIN_W, 1), 0).astype(jnp.float32)
    ref_t = ref_t_ref[...]  # [C, TH, TW]
    valid = None
    if ref_valid is not None:
        hv, wv = ref_valid
        valid = (ys_base < float(hv)) & (xs_base < float(wv))

    for cp in copies:
        cp.wait()

    for k in range(K):
        d = depths_ref[k]
        coords = []
        for v in range(V):
            r = [rels_ref[v, i] for i in range(12)]  # SMEM scalar loads
            px = (r[0] * xs_base + r[1] * ys_base + r[2]) * d + r[3]
            py = (r[4] * xs_base + r[5] * ys_base + r[6]) * d + r[7]
            pz = (r[8] * xs_base + r[9] * ys_base + r[10]) * d + r[11]
            safe = jnp.where(jnp.abs(pz) < 1e-8, 1e-8, pz)
            ok = pz > 1e-6 if valid is None else (pz > 1e-6) & valid
            x_src = jnp.where(ok, px / safe, -1e9)
            y_src = jnp.where(ok, py / safe, -1e9)
            coords.append((x_src, y_src))

        rows_out = []
        for trow in range(TH):
            ref_row = ref_t[:, trow, :]  # [C, TW]
            if mode == "corr":
                num = jnp.zeros((C, TW), jnp.float32)
                den = jnp.zeros((1, TW), jnp.float32)
            else:  # variance
                s1 = ref_row.astype(jnp.float32)
                s2 = ref_row.astype(jnp.float32) * ref_row
            for v in range(V):
                x_src, y_src = coords[v]
                xs_v = x_src[trow:trow + 1, :]
                ys_v = y_src[trow:trow + 1, :]
                win_y0 = origins_ref[0, v * n_tiles + tile_idx]
                win_x0 = origins_ref[1, v * n_tiles + tile_idx]
                ymin = jnp.min(jnp.where(ys_v > -1.0, ys_v, 1e9))
                ybase = jnp.clip(
                    jnp.floor(ymin).astype(jnp.int32) - win_y0,
                    0, WIN_H - NR,
                )
                rows = win_scratch[v, pl.ds(ybase, NR)]  # [NR, C, WIN_W]
                rows2 = rows.reshape(NR * C, WIN_W)
                SelX = jnp.maximum(
                    0.0,
                    1.0 - jnp.abs((xs_v - win_x0.astype(jnp.float32)) - wxs),
                )  # [WIN_W, TW]
                t = _sel_dot(rows2, SelX, precision)  # [NR*C, TW]
                acc = jnp.zeros((C, TW), jnp.float32)
                for rr in range(NR):
                    row_idx = (ybase + rr + win_y0).astype(jnp.float32)
                    ay = jnp.maximum(0.0, 1.0 - jnp.abs(ys_v - row_idx))
                    acc = acc + ay * t[rr * C:(rr + 1) * C, :]
                if mode == "corr":
                    w_v = weights_ref[v, trow:trow + 1, :]  # [1, TW]
                    num = num + w_v * (ref_row * acc)
                    den = den + w_v
                else:
                    s1 = s1 + acc
                    s2 = s2 + acc * acc
            if mode == "corr":
                cost_row = num / (den + 1e-5)
            else:
                nv = float(V + 1)
                mean = s1 / nv
                cost_row = s2 / nv - mean * mean
            rows_out.append(cost_row.reshape(C, 1, TW))

        tile_cost = jnp.concatenate(rows_out, axis=1)  # [C, TH, TW]
        out_ref[k, 0] = tile_cost.reshape(C, TH * TW)


class SweepOperands(NamedTuple):
    """Pre-transposed, pre-padded kernel operands for a whole sweep.

    Built ONCE per stage (prepare_sweep_operands) and passed through the
    depth scan as broadcast args — the round-2 device trace showed the
    per-chunk src transpose + feats-slice relayout executing inside every
    scan step (~1.7 ms/iter at stage 3, docs/PERF.md) because XLA does
    not hoist large loop-invariant transposes out of while loops."""

    ref_t: jnp.ndarray      # [C, Hp, Wp] f32 channel-first ref features
    src_t: jnp.ndarray      # [V, Hp, C, Wp] f32 channel-middle src features
    weights: jnp.ndarray    # [V, Hp, Wp] f32 view weights (zero in pads)
    img_hw: Tuple[int, int]  # static true (H, W) before padding


def prepare_sweep_operands(
    ref_feat: jnp.ndarray,    # [H, W, C]
    src_feats: jnp.ndarray,   # [V, H, W, C]
    weights: Optional[jnp.ndarray] = None,  # [V, H, W]
    tile: Tuple[int, int] = (8, 128),
    pad_to: int = 128,
) -> SweepOperands:
    """Pad (H to tile height, W to a pad_to-lane multiple; 256 matches the
    fused RedStep2 kernel's pad_width) and transpose into kernel layouts."""
    V, Himg, Wimg, C = src_feats.shape
    TH, TW = tile
    lane = max(int(pad_to), TW)
    H, W = _round_up(Himg, TH), _round_up(max(Wimg, lane), lane)
    if weights is None:
        weights = jnp.ones((V, Himg, Wimg), jnp.float32)
    ref = _pad_hw(ref_feat, H, W, axes=(0, 1))
    src = _pad_hw(src_feats, H, W, axes=(1, 2))
    wts = _pad_hw(weights.astype(jnp.float32), H, W, axes=(1, 2))
    return SweepOperands(
        ref_t=jnp.transpose(ref.astype(jnp.float32), (2, 0, 1)),
        src_t=jnp.transpose(src.astype(jnp.float32), (0, 1, 3, 2)),
        weights=wts,
        img_hw=(Himg, Wimg),
    )


def prepare_sweep_operands_cf(
    ref_feat: jnp.ndarray,    # [C, H, W] channel-first
    src_feats: jnp.ndarray,   # [V, C, H, W] channel-first
    weights: Optional[jnp.ndarray] = None,  # [V, H, W]
    tile: Tuple[int, int] = (8, 128),
    pad_to: int = 128,
) -> SweepOperands:
    """prepare_sweep_operands for CHANNEL-FIRST features
    (feature_net.multi_view_features full-res layout). ref arrives in the
    kernel's exact ref layout already; src needs one (0,2,1,3) transpose
    of a well-laid tensor — never materializing an NHWC feature map
    (whose C-minor lane padding is 16-51x at 1856x2752, docs/PERF.md)."""
    V, C, Himg, Wimg = src_feats.shape
    TH, TW = tile
    lane = max(int(pad_to), TW)
    H, W = _round_up(Himg, TH), _round_up(max(Wimg, lane), lane)
    if weights is None:
        weights = jnp.ones((V, Himg, Wimg), jnp.float32)
    ref = _pad_hw(ref_feat.astype(jnp.float32), H, W, axes=(1, 2))
    src = _pad_hw(jnp.transpose(src_feats.astype(jnp.float32), (0, 2, 1, 3)),
                  H, W, axes=(1, 3))
    wts = _pad_hw(weights.astype(jnp.float32), H, W, axes=(1, 2))
    return SweepOperands(ref_t=ref, src_t=src, weights=wts,
                         img_hw=(Himg, Wimg))


def sweep_cost_chunk_prepared(
    ops: SweepOperands,
    rels: jnp.ndarray,        # [V, 4, 4] / [V, 3, 4]
    depths: jnp.ndarray,      # [K, Himg, Wimg] (true-size depth planes)
    mode: str = "corr",       # 'corr' (AdaMVS weighted) | 'variance'
    tile: Tuple[int, int] = (8, 128),
    window: Optional[Tuple[int, int]] = None,  # None -> SWEEP_WIN env
    nr: Optional[int] = None,                  # None -> SWEEP_NR env
    precision: str = "f32x3",
    interpret: bool = False,
    out_layout: str = "khwc",  # 'khwc' | 'kchw' (channel-first)
    keep_pad_w: bool = False,  # emit the padded width (pad cols exact zero)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ALL-VIEW fused warp + cost aggregation -> (cost, covered).

    out_layout='kchw' emits [K, C, H, W] instead of [K, H, W, C]: the
    kernel's raw output is channel-major per tile, so channel-first needs
    only the SAME single tile-stitch pass as NHWC while handing the fused
    RedStep2 kernel its native layout directly — the device trace showed
    the NHWC->CHW relayout between the two kernels costing ~1.5 ms/iter
    at stage 2 alone (docs/PERF.md). With keep_pad_w the cost keeps the
    padded buffer width with EXACTLY-zero pad columns (corr: weights pad
    to 0 -> num 0; variance: ref and all samples 0) — the kernel handoff
    convention (pad_width alignment via prepare's pad_to=256).

    mode='corr':     cost = sum_v w_v * (ref ⊙ warp_v) / (sum_v w_v + 1e-5)
                     (cascade.correlation_cost_plane semantics)
    mode='variance': cost = E[f^2] - E[f]^2 over {ref} ∪ warps
                     (cascade.variance_cost_plane semantics)

    One kernel invocation covers a whole plane chunk and every source view:
    V window DMAs per tile feed V*K*TH selection matmuls; no per-view or
    per-plane intermediates ever reach HBM. `covered` is the AND of all
    views' footprint checks; callers lax.cond to the XLA path on False.
    """
    from functools import partial

    if out_layout not in ("khwc", "kchw"):
        raise ValueError(f"unknown out_layout {out_layout!r}")
    V, H, C, W = ops.src_t.shape
    Himg, Wimg = ops.img_hw
    K = depths.shape[0]
    TH, TW = tile
    if (H, W) != (Himg, Wimg):
        depths = _pad_hw(depths, H, W, axes=(1, 2))
    ref_valid = (Himg, Wimg) if (H, W) != (Himg, Wimg) else None
    window = window or _default_window()
    nr = nr or _default_nr()
    WIN_H, WIN_W = min(window[0], H), min(window[1], W)
    WIN_W = max(128, (WIN_W // 128) * 128)
    n_th, n_tw = H // TH, W // TW
    n_tiles = n_th * n_tw
    P = TH * TW

    rels_flat = jnp.asarray(rels, jnp.float32).reshape(V, -1)[:, :12]
    depths = jnp.asarray(depths, jnp.float32)

    origins_l, covered = [], True
    for v in range(V):
        org_v, cov_v = chunk_origins_and_coverage(
            rels_flat[v], depths, H, W, TH, TW, WIN_H, WIN_W, nr,
            ref_valid=ref_valid,
        )
        origins_l.append(org_v)
        covered = jnp.logical_and(covered, cov_v) if v else cov_v
    origins = jnp.concatenate(origins_l, axis=1)  # [2, V*n_tiles]

    src_t, ref_t, weights = ops.src_t, ops.ref_t, ops.weights

    kernel = partial(
        _sweep_cost_kernel,
        V=V, K=K, TH=TH, TW=TW, WIN_H=WIN_H, WIN_W=WIN_W, NR=nr, C=C,
        n_tiles_w=n_tw, n_tiles=n_tiles, mode=mode,
        precision=precision, ref_valid=ref_valid,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_th, n_tw),
        in_specs=[
            pl.BlockSpec((V, 12), lambda i, j, org: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((K, TH, TW), lambda i, j, org: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, TH, TW), lambda i, j, org: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((V, TH, TW), lambda i, j, org: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # src_t, manual DMA
        ],
        out_specs=pl.BlockSpec(
            (K, 1, C, P), lambda i, j, org: (0, i * n_tw + j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((V, WIN_H, C, WIN_W), jnp.float32),
            pltpu.SemaphoreType.DMA((V,)),
        ],
    )

    flat = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((K, n_tiles, C, P), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(origins, rels_flat, depths, ref_t, weights.astype(jnp.float32), src_t)

    crop_w = W if keep_pad_w else Wimg
    tiles = flat.reshape(K, n_th, n_tw, C, TH, TW)
    if out_layout == "kchw":
        cost = tiles.transpose(0, 3, 1, 4, 2, 5).reshape(K, C, H, W)
        cost = cost[:, :, :Himg, :crop_w]
    else:
        cost = tiles.transpose(0, 1, 4, 2, 5, 3).reshape(K, H, W, C)
        cost = cost[:, :Himg, :crop_w, :]
    return cost, covered


def sweep_cost_chunk_pallas(
    ref_feat: jnp.ndarray,    # [H, W, C]
    src_feats: jnp.ndarray,   # [V, H, W, C]
    rels: jnp.ndarray,        # [V, 4, 4] / [V, 3, 4]
    depths: jnp.ndarray,      # [K, H, W]
    weights: Optional[jnp.ndarray] = None,  # [V, H, W] (corr mode)
    mode: str = "corr",
    tile: Tuple[int, int] = (8, 128),
    window: Optional[Tuple[int, int]] = None,  # None -> SWEEP_WIN env
    nr: Optional[int] = None,                  # None -> SWEEP_NR env
    precision: str = "f32x3",
    interpret: bool = False,
    out_layout: str = "khwc",
    pad_to: int = 128,
    keep_pad_w: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One-shot convenience wrapper: prepare_sweep_operands (pad +
    transpose into kernel layouts) + sweep_cost_chunk_prepared. Callers
    that sweep many chunks over the same features (cascade.streaming_sweep)
    should prepare ONCE outside their scan instead — see SweepOperands."""
    ops = prepare_sweep_operands(ref_feat, src_feats, weights, tile=tile,
                                 pad_to=pad_to)
    return sweep_cost_chunk_prepared(
        ops, rels, depths, mode=mode, tile=tile, window=window, nr=nr,
        precision=precision, interpret=interpret, out_layout=out_layout,
        keep_pad_w=keep_pad_w,
    )


def sweep_corr_chunk_reference(
    ref_feat: jnp.ndarray,
    src_feat: jnp.ndarray,
    rel: jnp.ndarray,
    depths: jnp.ndarray,
) -> jnp.ndarray:
    """XLA-gather oracle with identical semantics -> [K, H, W]."""
    from .warp import plane_sweep_warp_single

    H, W, _ = ref_feat.shape

    def one(d):
        w = plane_sweep_warp_single(src_feat, rel, d, (H, W))
        return (w * ref_feat).mean(-1)

    return jax.lax.map(one, depths)
