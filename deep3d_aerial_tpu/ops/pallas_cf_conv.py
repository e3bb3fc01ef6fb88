"""Pallas TPU kernels: strip-tiled channel-first 3x3 convolution family.

The whole-plane fused RedStep4 kernel (ops/pallas_red4) needs every
pyramid buffer VMEM-resident — tier-1 tops out near the bench stage
sizes. Full-res msrednet planes (1856x2752 production point) instead run
the step as a COMPOSITION of these per-conv kernels with XLA pointwise
glue (red4 tier-2, pallas_red4.red_step4_tiled): each conv still does
its work as MXU matmuls over channel-first [C, rows, W] buffers (zero
lane padding — an NHWC XLA conv at C=8..128 lane-pads up to 16x, the
very disease the fused kernels exist to avoid), while GroupNorm
statistics, gate nonlinearities and state updates are cheap exact XLA
elementwise ops on the same channel-first arrays.

Modes (flax tap semantics, derived and tested in ops/pallas_red):
  * 'same'  — 3x3 stride-1 SAME conv:      [Ci, H, W] -> [Co, H, W]
  * 'down'  — 3x3 stride-2 SAME conv:      [Ci, H, W] -> [Co, H/2, W/2]
              out[q, j] = sum_ab K[a,b] x[2q+a, 2j+b]
  * 'up'    — 3x3 stride-2 SAME ConvTranspose: [Ci, H, W] -> [Co, 2H, 2W]
              phase tap table in pallas_red._phase4_mat

Tiling: a grid of T-row strips (input rows DMA'd with an 8-row halo,
pallas_red.dma pattern) x a host-side loop over <=512-wide column slabs
with a 16-column halo (the even/odd selection matrices are one-hot
[W, W/2] matmuls — O(W^2) operands that stay tiny only inside slabs;
red_step2_tiled's proven structure). Interior slab edges read real halo
data; a slab buffer edge coincides with a true image edge exactly when
SAME zero padding is the correct semantics there.

Row padding: callers keep arrays at a 16-multiple padded height with all
rows >= img_h ZERO; kernels mask their stores at img_h_out so the
invariant survives every conv (pad rows then contribute exactly nothing
to XLA GroupNorm sums).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_red import (
    _im2col9,
    _kron_conv,
    _mm,
    _phase4_mat,
    _sel,
    _sel_mats,
    _shift_l,
    _shift_r,
    _tile_bias,
)

G = 8        # guard rows above the data (in-kernel loads may touch slot -1)
RHALO = 8    # row halo per strip side (RF <= 2; Mosaic DMA rows 8-aligned)
CHALO = 16   # column halo per slab side (RF <= 2; 16 keeps halves even)
SLAB = 512   # max in-kernel buffer width


def _band_rows(Co: int) -> int:
    """Band rows per matmul: keep Co*B ~ 64..128 so the packed
    block-diagonal kron operand stays small as channels grow."""
    if Co <= 16:
        return 8
    if Co <= 32:
        return 4
    return 2


def _pick_T(Hp: int, Ci: int, Co: int, W: int, mode: str,
            itemsize: int) -> int:
    """Strip height: largest 16-multiple divisor of Hp from the candidate
    set whose scratch + output block fit a ~40 MB VMEM budget (Hp is a
    16-multiple by contract, so 16 always qualifies as the floor)."""
    for T in (128, 96, 64, 48, 32, 16):
        if Hp % T:
            continue
        R = T + 2 * RHALO + 2 * G
        scratch = Ci * R * W * itemsize
        if mode == "down":
            scratch += 2 * Ci * R * (W // 2) * itemsize
            out = Co * (T // 2) * (W // 2) * itemsize
        elif mode == "up":
            out = Co * 2 * T * 2 * W * itemsize
        else:
            out = Co * T * W * itemsize
        if T == 16 or scratch + 2 * out < 40 * 2 ** 20:
            return T
    raise ValueError(f"padded height {Hp} is not a multiple of 16")


def _dma_in(src, dst, sem, i, n, T):
    """HBM strip [i*T - RHALO, i*T + T + RHALO) -> dst rows starting at
    slot G; edge strips load fewer rows (the zeroed scratch supplies the
    SAME zero padding at the image top/bottom)."""
    if n == 1:
        cp = pltpu.make_async_copy(
            src.at[:, pl.ds(0, T), :], dst.at[:, pl.ds(G + RHALO, T), :], sem)
        cp.start(); cp.wait()
        return

    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(
            src.at[:, pl.ds(0, T + RHALO), :],
            dst.at[:, pl.ds(G + RHALO, T + RHALO), :], sem)
        cp.start(); cp.wait()

    off = pl.multiple_of(i * T - RHALO, 8)

    @pl.when(i == n - 1)
    def _():
        cp = pltpu.make_async_copy(
            src.at[:, pl.ds(off, T + RHALO), :],
            dst.at[:, pl.ds(G, T + RHALO), :], sem)
        cp.start(); cp.wait()

    @pl.when(jnp.logical_and(i > 0, i < n - 1))
    def _():
        cp = pltpu.make_async_copy(
            src.at[:, pl.ds(off, T + 2 * RHALO), :],
            dst.at[:, pl.ds(G, T + 2 * RHALO), :], sem)
        cp.start(); cp.wait()


def _row_masked(val, i, T_out, r0, img_h_out):
    """Zero output rows whose global index falls at/after img_h_out (the
    caller-side zero-pad-row invariant)."""
    row = i * T_out + r0 + jax.lax.broadcasted_iota(jnp.int32, val.shape, 1)
    return jnp.where(row < img_h_out, val, 0.0)


def _band2d(buf, r0, B):
    C, _, Wb = buf.shape
    return buf[:, r0 + G:r0 + G + B, :].astype(jnp.float32).reshape(
        C * B, Wb)


def _dy3(buf, r0, B):
    return [_band2d(buf, r0 + a - 1, B) for a in range(3)]


# --------------------------------------------------------------------------
# kernels (one strip of output rows each)
# --------------------------------------------------------------------------

def _k_same(x_hbm, L, b, out, x_s, sem, *, Ci, Co, T, Hp, W, B,
            img_h_out, relu, precision):
    i = pl.program_id(0)
    x_s[...] = jnp.zeros(x_s.shape, x_s.dtype)
    _dma_in(x_hbm, x_s, sem, i, Hp // T, T)
    for r0 in range(0, T, B):
        X9 = _im2col9(_dy3(x_s, r0 + RHALO, B), W)
        o = _mm(L, X9, precision) + b[...]
        if relu:
            o = jnp.maximum(o, 0.0)
        o = _row_masked(o.reshape(Co, B, W), i, T, r0, img_h_out)
        out[:, r0:r0 + B, :] = o.astype(out.dtype)


def _k_down(x_hbm, L, b, SelE, SelO, out, x_s, xe_s, xo_s, sem, *,
            Ci, Co, T, Hp, W, B, img_h_out, relu, precision):
    """out[q, j] = sum_ab K[a,b] x[2q+a, 2j+b]; taps 2j+b via the
    (even, odd, even<<1) lane-split buffers (pallas_red pass 5)."""
    i = pl.program_id(0)
    for buf in (x_s, xe_s, xo_s):
        buf[...] = jnp.zeros(buf.shape, buf.dtype)
    _dma_in(x_hbm, x_s, sem, i, Hp // T, T)
    R = T + 2 * RHALO
    W2 = W // 2
    for r0 in range(0, R, 8):
        y = _band2d(x_s, r0, 8)
        xe_s[:, r0 + G:r0 + G + 8, :] = _sel(y, SelE, precision).reshape(
            Ci, 8, W2).astype(xe_s.dtype)
        xo_s[:, r0 + G:r0 + G + 8, :] = _sel(y, SelO, precision).reshape(
            Ci, 8, W2).astype(xo_s.dtype)
    To = T // 2
    for q0 in range(0, To, B):
        pieces = []
        for src, sh in ((xe_s, False), (xo_s, False), (xe_s, True)):
            for a in range(3):
                rows = [src[:, 2 * (q0 + q) + a + RHALO + G:
                            2 * (q0 + q) + a + RHALO + G + 1, :]
                        for q in range(B)]
                pc = jnp.concatenate(rows, axis=1).astype(jnp.float32)
                pc = pc.reshape(Ci * B, W2)
                pieces.append(_shift_l(pc, W2) if sh else pc)
        X9 = jnp.concatenate(pieces, axis=0)
        o = _mm(L, X9, precision) + b[...]
        if relu:
            o = jnp.maximum(o, 0.0)
        o = _row_masked(o.reshape(Co, B, W2), i, To, q0, img_h_out)
        out[:, q0:q0 + B, :] = o.astype(out.dtype)


def _k_up(x_hbm, L, b, SelET, SelOT, out, x_s, sem, *,
          Ci, Co, T, Hp, W, B, img_h_out, relu, precision):
    """ConvTranspose s2 phases from x rows {u-1, u}, cols {c-1, c}
    (pallas_red._phase4_mat tap table); px phases interleave to the
    2W-wide output via one-hot selection matmuls."""
    i = pl.program_id(0)
    x_s[...] = jnp.zeros(x_s.shape, x_s.dtype)
    _dma_in(x_hbm, x_s, sem, i, Hp // T, T)
    W2o = 2 * W
    for u0 in range(0, T, B):
        pieces = []
        for dx in (0, 1):
            for dy in (0, 1):
                pc = _band2d(x_s, u0 + RHALO + dy - 1, B)
                pieces.append(_shift_r(pc, W) if dx == 0 else pc)
        X4 = jnp.concatenate(pieces, axis=0)
        o = _mm(L, X4, precision) + b[...]       # [(py, px, co, u), W]
        for py in (0, 1):
            ph0 = o[(2 * py) * Co * B:(2 * py + 1) * Co * B]
            ph1 = o[(2 * py + 1) * Co * B:(2 * py + 2) * Co * B]
            full = _sel(ph0, SelET, precision) + _sel(ph1, SelOT, precision)
            if relu:
                full = jnp.maximum(full, 0.0)
            full = full.reshape(Co, B, W2o)
            for q in range(B):
                row = 2 * (u0 + q) + py
                v = jnp.where(i * 2 * T + row < img_h_out,
                              full[:, q:q + 1, :], 0.0)
                out[:, row:row + 1, :] = v.astype(out.dtype)


# --------------------------------------------------------------------------
# host-side wrapper
# --------------------------------------------------------------------------

def _one_slab(x, K, bias, *, mode, relu, img_h_out, dtype, precision,
              interpret):
    """One <=SLAB-wide column window through one strip-grid pallas call."""
    Ci, Hp, W = x.shape
    Co = K.shape[-1]
    B = _band_rows(Co)
    T = _pick_T(Hp, Ci, Co, W, mode, jnp.dtype(dtype).itemsize)
    L = _kron_conv(K, B, dtype) if mode != "up" else _phase4_mat(K, B, dtype)
    bt = (_tile_bias(bias, B) if mode != "up"
          else jnp.tile(_tile_bias(bias, B), (4, 1)))
    kw = dict(Ci=Ci, Co=Co, T=T, Hp=Hp, W=W, B=B, img_h_out=img_h_out,
              relu=relu, precision=precision)
    R = T + 2 * RHALO + 2 * G
    weights = [L, bt]
    scratch = [pltpu.VMEM((Ci, R, W), x.dtype)]
    if mode == "same":
        kernel = functools.partial(_k_same, **kw)
        out_shape = (Co, Hp, W)
        out_block, T_out = (Co, T, W), T
    elif mode == "down":
        kernel = functools.partial(_k_down, **kw)
        se, so, _, _ = _sel_mats(W, dtype)
        weights += [se, so]
        scratch += [pltpu.VMEM((Ci, R, W // 2), x.dtype),
                    pltpu.VMEM((Ci, R, W // 2), x.dtype)]
        out_shape = (Co, Hp // 2, W // 2)
        out_block, T_out = (Co, T // 2, W // 2), T // 2
    elif mode == "up":
        kernel = functools.partial(_k_up, **kw)
        _, _, set_, sot = _sel_mats(2 * W, dtype)
        weights += [set_, sot]
        out_shape = (Co, 2 * Hp, 2 * W)
        out_block, T_out = (Co, 2 * T, 2 * W), 2 * T
    else:
        raise ValueError(mode)
    scratch.append(pltpu.SemaphoreType.DMA(()))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(Hp // T,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(weights),
        out_specs=[pl.BlockSpec(out_block, lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=scratch,
    )
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct(out_shape, dtype),),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(x.astype(dtype), *weights)
    return out


def cf_conv3x3(
    x: jnp.ndarray, K: jnp.ndarray, bias: jnp.ndarray, *,
    mode: str = "same", relu: bool = True, img_h: Optional[int] = None,
    dtype=jnp.float32, precision: str = "bf16", interpret: bool = False,
    slab: int = SLAB,
) -> jnp.ndarray:
    """Channel-first 3x3 conv: x [Ci, Hp, W] -> [Co, Hp(, /2, x2), W(...)]

    Hp must be a 16-multiple; rows >= img_h must arrive zero and leave
    zero (kernels mask their stores at the mode's output img_h). Wide
    images run as overlapping column slabs stitched at their centers.
    """
    Ci, Hp, W = x.shape
    if Hp % 16 or (mode == "down" and W % 2):
        raise ValueError(f"bad padded shape {x.shape} for mode {mode}")
    img_h = Hp if img_h is None else img_h
    img_h_out = {"same": img_h, "down": img_h // 2, "up": 2 * img_h}[mode]
    kw = dict(mode=mode, relu=relu, img_h_out=img_h_out, dtype=dtype,
              precision=precision, interpret=interpret)
    if W <= slab:
        return _one_slab(x, K, bias, **kw)
    WC = slab - 2 * CHALO
    n = -(-W // WC)
    cores = []
    for k in range(n):
        a = k * WC
        bcol = min(a + WC, W)
        o = min(max(a - CHALO, 0), W - slab)
        y = _one_slab(x[:, :, o:o + slab], K, bias, **kw)
        lo, hi = a - o, bcol - o
        if mode == "down":
            cores.append(y[:, :, lo // 2:hi // 2])
        elif mode == "up":
            cores.append(y[:, :, 2 * lo:2 * hi])
        else:
            cores.append(y[:, :, lo:hi])
    return jnp.concatenate(cores, axis=-1)
