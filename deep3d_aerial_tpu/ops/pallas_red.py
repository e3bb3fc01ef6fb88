"""Pallas TPU kernel: one fused RedStep2 recurrent-regularizer step.

After the fused sweep kernel removed the gather bound (ops/pallas_sweep),
the AdaMVS hot path became the per-plane RedStep2 GRU chain (measured
~50% of inference, docs/PERF.md round-3 profile): ~10 tiny-channel XLA
convs per depth plane whose NHWC layouts lane-pad C=8..32 up to 128 —
every op runs at a few percent of HBM bandwidth. This kernel fuses the
ENTIRE RedStep2 step (conv1 + ConvGRU1 + strided conv2 + ConvGRU2 +
transposed upconv + score head, reference SliceCostRegNetRED,
/root/reference/mvs/mvs_cas/models/adamvs.py:403-427) into one Mosaic
program per plane:

  * channel-first [C, rows, W] layout — the FULL image width rides the
    lanes (W = 128..512), channels/rows ride sublanes: no lane padding.
  * grid = horizontal strips of T rows; each strip DMAs its input rows
    (+16 full-res / +8 half-res halo — the step's receptive field of
    12/6 rounded up to the 8-row DMA alignment Mosaic requires)
    and computes everything else in VMEM.
  * every conv is ONE MXU matmul per band of B output rows: the 3x3
    weights are packed into a block-diagonal [Co*B, 9*Ci*B] matrix
    (kron with I_B) and the input band into an im2col [9*Ci*B, W] via
    static row slices (dy) and masked lane rolls (dx).
  * stride-2 / transposed convs use phase decomposition: even/odd lane
    split and interleave are one-hot selection matmuls (Mosaic has no
    strided lane slicing — probed), vertical phases are row indexing.
    Tap algebra matches flax exactly (derived empirically):
      Conv s2 SAME:      out[q,j]   = sum_ab K[a,b] x[2q+a, 2j+b]
      ConvTranspose s2:  out[2p+py, 2c+px] picks K rows {0,2}/{1} for
                         py {0}/{1} from x rows {p-1,p}/{p} (same in x).
  * bf16 operand mode mirrors the bf16 flax model; 'f32x3' splits both
    matmul operands error-free for f32-exact parity (see pallas_sweep).

Autodiff: `red_step2_fused` carries a custom VJP whose backward is the
VJP of the mathematically identical flax module (cost_reg.RedStep2), so
training takes the kernel's forward throughput with exact gradients.

States cross the call boundary channel-first ([8, H, W], [16, H/2, W/2])
so consecutive planes chain with zero relayouts; `cost` arrives NHWC from
the sweep-cost kernel and is transposed once per plane in XLA.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#   halos are 8-row aligned (receptive field is 12/6; real Mosaic requires
#   DMA row slices — offset AND size — aligned to the sublane tiling of 8)
HF = 16   # full-res halo rows each side
HH = 8    # half-res halo
# Band rows per matmul: each conv is one MXU matmul per band, so the band
# loop runs R/BF (resp. R2/BH) iterations per pass — the kernel's
# iteration count, and at C=8/16 the matmul row count (C*B), are both set
# here. BF=8/BH=4 give 64-row matmuls (validated defaults); RED_BF=16 /
# RED_BH=8 halve the loop trip count with 128-row matmuls (A/B knob —
# every strip satisfies R % BF == 0 because _pick_strip keeps T % 16 == 0
# and the halos are 32/16 rows).
BF = int(os.environ.get("RED_BF", "8"))   # full-res band rows per matmul
BH = int(os.environ.get("RED_BH", "4"))   # half-res band rows per matmul
G = 8     # guard rows above the data (DMA dst offsets stay 8-aligned;
          # in-kernel vector loads may still read the row at slot -1)


# --------------------------------------------------------------------------
# parameter packing (XLA-side; CSE'd within a jit body)
# --------------------------------------------------------------------------

def _kron_conv(K: jnp.ndarray, B: int, dtype) -> jnp.ndarray:
    """[3,3,Ci,Co] -> block-diagonal [Co*B, 9*Ci*B] band matrix with
    column order (b, a, ci, r) matching the kernel's im2col build."""
    Co = K.shape[-1]
    Ci = K.shape[-2]
    eye = jnp.eye(B, dtype=jnp.float32)
    L = jnp.einsum("abic,rs->crbais", K.astype(jnp.float32), eye)
    return L.reshape(Co * B, 9 * Ci * B).astype(dtype)


def _tile_bias(b: jnp.ndarray, B: int) -> jnp.ndarray:
    """[Co] -> [Co*B, 1] f32 (row order (co, r))."""
    return jnp.repeat(b.astype(jnp.float32), B)[:, None]


def _phase4_mat(K: jnp.ndarray, B: int, dtype):
    """Pack a k=3 s=2 SAME ConvTranspose kernel [3,3,Ci,Co] into ONE
    [(ph, co, u) = 4*Co*B, (dx, dy, ci, u) = 4*Ci*B] matrix computing all
    four (py, px) phases from taps x[u-1..u, c-1..c].

    Phase tap table (empirical, flax ConvTranspose SAME k3 s2):
      (py, px) = (0,0): K[2,2]x[u,c] K[2,0]x[u,c-1] K[0,2]x[u-1,c] K[0,0]x[u-1,c-1]
                 (0,1): K[2,1]x[u,c] K[0,1]x[u-1,c]
                 (1,0): K[1,2]x[u,c] K[1,0]x[u,c-1]
                 (1,1): K[1,1]x[u,c]
    dy index: 0 -> u-1, 1 -> u;  dx index: 0 -> c-1, 1 -> c.
    """
    Ci, Co = K.shape[-2], K.shape[-1]
    Kf = K.astype(jnp.float32)
    # ay map: (py, dy) -> kernel row (or None)
    ay = {(0, 0): 0, (0, 1): 2, (1, 1): 1}
    C4 = jnp.zeros((2, 2, 2, 2, Ci, Co), jnp.float32)  # [py, px, dy, dx, ci, co]
    for py in (0, 1):
        for dy in (0, 1):
            if (py, dy) not in ay:
                continue
            for px in (0, 1):
                for dx in (0, 1):
                    if (px, dx) not in ay:
                        continue
                    C4 = C4.at[py, px, dy, dx].set(Kf[ay[(py, dy)], ay[(px, dx)]])
    eye = jnp.eye(B, dtype=jnp.float32)
    # rows (py, px, co, u); cols (dx, dy, ci, u')
    L = jnp.einsum("pqyxic,rs->pqcrxyis", C4, eye)
    return L.reshape(4 * Co * B, 4 * Ci * B).astype(dtype)


def _sel_mats(W: int, dtype):
    """One-hot even/odd lane selection matrices (exact in bf16)."""
    W2 = W // 2
    idx = np.arange(W2)
    se = np.zeros((W, W2), np.float32)
    so = np.zeros((W, W2), np.float32)
    se[2 * idx, idx] = 1.0
    so[2 * idx + 1, idx] = 1.0
    return (jnp.asarray(se, dtype), jnp.asarray(so, dtype),
            jnp.asarray(se.T, dtype), jnp.asarray(so.T, dtype))


def pack_redstep_params(params, Cin: int, up: bool, W: int, dtype):
    """Flax RedStep2 param tree -> tuple of packed kernel operands."""
    p_conv1 = params["conv1"]["Conv_0"]
    p_g1 = params["gru1"]["gates"]
    p_c1 = params["gru1"]["cand"]
    p_conv2 = params["conv2"]["Conv_0"]
    p_g2 = params["gru2"]["gates"]
    p_c2 = params["gru2"]["cand"]
    p_up1 = params["upconv1"]
    p_sc = params["upconv2d" if up else "out2d"]

    se, so, set_, sot = _sel_mats(W, dtype)
    packed = (
        _kron_conv(p_conv1["kernel"], BF, dtype), _tile_bias(p_conv1["bias"], BF),
        _kron_conv(p_g1["kernel"], BF, dtype), _tile_bias(p_g1["bias"], BF),
        _kron_conv(p_c1["kernel"], BF, dtype), _tile_bias(p_c1["bias"], BF),
        _kron_conv(p_conv2["kernel"], BH, dtype), _tile_bias(p_conv2["bias"], BH),
        _kron_conv(p_g2["kernel"], BH, dtype), _tile_bias(p_g2["bias"], BH),
        _kron_conv(p_c2["kernel"], BH, dtype), _tile_bias(p_c2["bias"], BH),
        _phase4_mat(p_up1["kernel"], BH, dtype),
        jnp.tile(_tile_bias(p_up1["bias"], BH), (4, 1)),
    )
    if up:
        packed += (_phase4_mat(p_sc["kernel"], BF, dtype),
                   jnp.tile(_tile_bias(p_sc["bias"], BF), (4, 1)))
    else:
        packed += (_kron_conv(p_sc["kernel"], BF, dtype),
                   _tile_bias(p_sc["bias"], BF))
    packed += (se, so, set_, sot)
    return packed


# --------------------------------------------------------------------------
# kernel helpers
# --------------------------------------------------------------------------

def _shift_l(x, W):
    """x[..., w] <- x[..., w+1]; zero at the right image edge."""
    r = pltpu.roll(x, shift=W - 1, axis=x.ndim - 1)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(col < W - 1, r, 0.0)


def _shift_r(x, W):
    """x[..., w] <- x[..., w-1]; zero at the left image edge."""
    r = pltpu.roll(x, shift=1, axis=x.ndim - 1)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(col > 0, r, 0.0)


def _bf16_split(a):
    """Fold-proof hi/lo split: hi = a with the low 16 mantissa bits
    truncated (exactly bf16-representable), lo = a - hi (exact).

    The obvious `a.astype(bf16).astype(f32)` split is NOT safe: XLA's
    excess-precision simplifier may elide the f32->bf16->f32 round-trip
    in one use of the value but keep it in another, silently destroying
    the compensation (measured: a supposedly error-free f32x3 matmul
    degraded to plain-bf16 error). Integer masking can't be folded."""
    af = a.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(af, jnp.uint32)
    # +0x8000 then truncate = round-half-up to the nearest bf16
    # (mantissa carry propagates into the exponent exactly as RN does),
    # keeping |lo| <= 2^-9 |a| like the convert-based split
    hi = jax.lax.bitcast_convert_type(
        (bits + jnp.uint32(0x8000)) & jnp.uint32(0xFFFF0000), jnp.float32)
    return hi, af - hi


def _mm(L_ref, X, precision):
    """[rows, K] @ [K, W] on the MXU; 'f32x3' = error-free bf16 split of
    both operands (see pallas_sweep._sel_dot)."""
    def dot(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    L = L_ref[...]
    if precision == "f32x3":
        l_hi, l_lo = _bf16_split(L)
        x_hi, x_lo = _bf16_split(X)
        return dot(l_hi, x_hi) + (dot(l_lo, x_hi) + dot(l_hi, x_lo))
    if precision == "bf16":
        return dot(L.astype(jnp.bfloat16), X.astype(jnp.bfloat16))
    return dot(L.astype(jnp.float32), X.astype(jnp.float32))


def _sel(X, S_ref, precision):
    """Activation [rows, W] x one-hot [W, W'] (selection is exact; only
    the activation needs the hi/lo split in f32x3 mode)."""
    def dot(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    S = S_ref[...]
    if precision == "f32x3":
        x_hi, x_lo = _bf16_split(X)
        Sf = S.astype(jnp.float32)
        return dot(x_hi, Sf) + dot(x_lo, Sf)
    if precision == "bf16":
        return dot(X.astype(jnp.bfloat16), S.astype(jnp.bfloat16))
    return dot(X.astype(jnp.float32), S.astype(jnp.float32))


def _im2col9(pieces, W):
    """pieces: list of 3 [CiB, W] dy-slices -> [9*CiB, W] with column
    order (b, a, ci, r): b-major lane shifts, then the dy stack."""
    X3 = jnp.concatenate(pieces, axis=0)
    return jnp.concatenate([_shift_r(X3, W), X3, _shift_l(X3, W)], axis=0)


# --------------------------------------------------------------------------
# the kernel
# --------------------------------------------------------------------------

def _red_kernel(
    # inputs (order mirrors pack_redstep_params + data)
    cost_hbm, s1_hbm, s2_hbm,
    Lc1, bc1, Lg1, bg1, Lk1, bk1,
    Lc2, bc2, Lg2, bg2, Lk2, bk2,
    Lup, bup, Lsc, bsc,
    SelE, SelO, SelET, SelOT,
    # outputs (+ optional debug tap), then scratch
    score_out, s1n_out, s2n_out, *rest,
    Cin: int, H: int, W: int, Wimg: int, T: int, up: bool, precision: str,
    tap: str | None = None,
):
    """One RedStep2 application over one strip of T output rows.

    W is the (lane-aligned, % 256) buffer width; Wimg <= W is the logical
    image width. Columns >= Wimg are kept ZERO after every pass — exactly
    the SAME zero padding flax applies at the image's right edge — so a
    128-wide stage-1 image runs in 256-wide buffers with identical
    results (wrapper crops the score)."""
    if tap is not None:
        dbg_out, rest = rest[0], rest[1:]
    (cost_s, s1_s, s2_s, x1_s, rg_s, u_s, rs1_s, r1_s, r1e_s, r1o_s,
     x2_s, rg2_s, u2_s, rs2_s, r2_s, fused_s, sem) = rest
    i = pl.program_id(0)
    n = H // T
    R = T + 2 * HF          # full-res data rows (buffers add 2*G guard/slack)
    T2, R2 = T // 2, T // 2 + 2 * HH
    W2 = W // 2
    H2 = H // 2
    f32 = jnp.float32

    # ---- zero scratch (guards, halos, garbage rows) ----------------------
    for buf in (cost_s, s1_s, s2_s, x1_s, rg_s, u_s, rs1_s, r1_s, r1e_s,
                r1o_s, x2_s, rg2_s, u2_s, rs2_s, r2_s, fused_s):
        buf[...] = jnp.zeros(buf.shape, buf.dtype)

    # ---- DMA input strips with halo (edge strips offset + zero-pad) ------
    def dma_in(src, dst, halo, TT):
        """src [C, Himg, W*] -> dst buffer slot k at row k+G; logical slot 0
        = image row i*TT - halo. All row offsets/sizes are 8-aligned
        (halo % 8 == 0, TT % 8 == 0, G == 8 — Mosaic DMA requirement)."""
        RR = TT + 2 * halo
        if n == 1:
            cp = pltpu.make_async_copy(
                src.at[:, pl.ds(0, TT), :],
                dst.at[:, pl.ds(G + halo, TT), :], sem)
            cp.start(); cp.wait()
            return
        @pl.when(i == 0)
        def _():
            cp = pltpu.make_async_copy(
                src.at[:, pl.ds(0, TT + halo), :],
                dst.at[:, pl.ds(G + halo, TT + halo), :], sem)
            cp.start(); cp.wait()
        # TT % 8 == 0 and halo % 8 == 0, but Mosaic needs the hint to
        # prove the dynamic offset's sublane divisibility
        off = pl.multiple_of(i * TT - halo, 8)
        @pl.when(i == n - 1)
        def _():
            cp = pltpu.make_async_copy(
                src.at[:, pl.ds(off, TT + halo), :],
                dst.at[:, pl.ds(G, TT + halo), :], sem)
            cp.start(); cp.wait()
        @pl.when(jnp.logical_and(i > 0, i < n - 1))
        def _():
            cp = pltpu.make_async_copy(
                src.at[:, pl.ds(off, RR), :],
                dst.at[:, pl.ds(G, RR), :], sem)
            cp.start(); cp.wait()

    dma_in(cost_hbm, cost_s, HF, T)
    dma_in(s1_hbm, s1_s, HF, T)
    dma_in(s2_hbm, s2_s, HH, T2)

    def zero_oob(buf, halo, TT, Himg, Wb=None):
        """Zero buffer rows whose logical image row falls outside [0, Himg)
        and (when Wb < lane width) columns >= Wb.

        Every conv in the chain assumes SAME zero padding at the *image*
        boundary; intermediates computed on out-of-image halo rows/cols are
        relu(bias)-style garbage that must not leak into the next conv."""
        j = jax.lax.broadcasted_iota(jnp.int32, buf.shape, 1)
        logical = i * TT - halo + (j - G)
        ok = jnp.logical_and(logical >= 0, logical < Himg)
        if Wb is not None and Wb < buf.shape[2]:
            c = jax.lax.broadcasted_iota(jnp.int32, buf.shape, 2)
            ok = jnp.logical_and(ok, c < Wb)
        buf[...] = jnp.where(ok, buf[...], 0.0).astype(buf.dtype)

    def band(buf, r0, B, C):
        """[C, B, W*] f32 band at logical slots [r0, r0+B) (offset +G)."""
        return buf[:, r0 + G:r0 + G + B, :].astype(f32)

    def dy_pieces(bufs_cs, r0, B):
        """3 dy-slices, each the channel-concat of (buffer, C) pairs."""
        out = []
        for a in range(3):
            parts = [band(buf, r0 + a - 1, B, C).reshape(C * B, buf.shape[2])
                     for buf, C in bufs_cs]
            out.append(jnp.concatenate(parts, axis=0) if len(parts) > 1
                       else parts[0])
        return out

    def store(buf, r0, B, C, val, Wb):
        buf[:, r0 + G:r0 + G + B, :] = val.reshape(C, B, Wb).astype(buf.dtype)

    # ---- pass 1: x1 = relu(conv1(cost)) ---------------------------------
    for r0 in range(0, R, BF):
        X9 = _im2col9(dy_pieces([(cost_s, Cin)], r0, BF), W)
        o = _mm(Lc1, X9, precision) + bc1[...]
        store(x1_s, r0, BF, 8, jnp.maximum(o, 0.0), W)
    zero_oob(x1_s, HF, T, H, Wimg)

    # ---- pass 2: gru1 gates -> rg, u, rs1 = rg * s1 ----------------------
    for r0 in range(0, R, BF):
        X9 = _im2col9(dy_pieces([(x1_s, 8), (s1_s, 8)], r0, BF), W)
        g = jax.nn.sigmoid(_mm(Lg1, X9, precision) + bg1[...])
        rg = g[:8 * BF]
        uu = g[8 * BF:]
        s1b = band(s1_s, r0, BF, 8).reshape(8 * BF, W)
        store(rg_s, r0, BF, 8, rg, W)
        store(u_s, r0, BF, 8, uu, W)
        store(rs1_s, r0, BF, 8, rg * s1b, W)

    # ---- pass 3: cand -> r1 = u*s1 + (1-u)*tanh(cand) --------------------
    for r0 in range(0, R, BF):
        X9 = _im2col9(dy_pieces([(x1_s, 8), (rs1_s, 8)], r0, BF), W)
        c = jnp.tanh(_mm(Lk1, X9, precision) + bk1[...])
        uu = band(u_s, r0, BF, 8).reshape(8 * BF, W)
        s1b = band(s1_s, r0, BF, 8).reshape(8 * BF, W)
        store(r1_s, r0, BF, 8, uu * s1b + (1.0 - uu) * c, W)
    zero_oob(r1_s, HF, T, H, Wimg)

    # new s1 state: r1 at the strip's output rows
    s1n_out[...] = r1_s[:, G + HF:G + HF + T, :].astype(s1n_out.dtype)

    # ---- pass 4: even/odd lane split of r1 (for the strided conv2) -------
    for r0 in range(0, R, BF):
        y = band(r1_s, r0, BF, 8).reshape(8 * BF, W)
        store(r1e_s, r0, BF, 8, _sel(y, SelE, precision), W2)
        store(r1o_s, r0, BF, 8, _sel(y, SelO, precision), W2)

    # ---- pass 5: x2 = relu(conv2_s2(r1)) at half res ----------------------
    # out[q, j] = sum_ab K[a,b] r1[2q+a, 2j+b]; taps 2j+b -> (e, o, e<<1)
    for q0 in range(0, R2, BH):
        pieces = []
        for b, src, sh in ((0, r1e_s, None), (1, r1o_s, None),
                           (2, r1e_s, "l")):
            for a in range(3):
                rows = [src[:, 2 * (q0 + q) + a + G:2 * (q0 + q) + a + G + 1, :]
                        for q in range(BH)]
                pc = jnp.concatenate(rows, axis=1).astype(f32)  # [8, BH, W2]
                pc = pc.reshape(8 * BH, W2)
                pieces.append(_shift_l(pc, W2) if sh else pc)
        X9 = jnp.concatenate(pieces, axis=0)  # [(b, a, ci, q), W2]
        o = _mm(Lc2, X9, precision) + bc2[...]
        store(x2_s, q0, BH, 16, jnp.maximum(o, 0.0), W2)
    zero_oob(x2_s, HH, T2, H2, Wimg // 2)

    # ---- pass 6: gru2 gates ----------------------------------------------
    for q0 in range(0, R2, BH):
        X9 = _im2col9(dy_pieces([(x2_s, 16), (s2_s, 16)], q0, BH), W2)
        g = jax.nn.sigmoid(_mm(Lg2, X9, precision) + bg2[...])
        rg = g[:16 * BH]
        uu = g[16 * BH:]
        s2b = band(s2_s, q0, BH, 16).reshape(16 * BH, W2)
        store(rg2_s, q0, BH, 16, rg, W2)
        store(u2_s, q0, BH, 16, uu, W2)
        store(rs2_s, q0, BH, 16, rg * s2b, W2)

    # ---- pass 7: gru2 cand -> r2 ------------------------------------------
    for q0 in range(0, R2, BH):
        X9 = _im2col9(dy_pieces([(x2_s, 16), (rs2_s, 16)], q0, BH), W2)
        c = jnp.tanh(_mm(Lk2, X9, precision) + bk2[...])
        uu = band(u2_s, q0, BH, 16).reshape(16 * BH, W2)
        s2b = band(s2_s, q0, BH, 16).reshape(16 * BH, W2)
        store(r2_s, q0, BH, 16, uu * s2b + (1.0 - uu) * c, W2)
    zero_oob(r2_s, HH, T2, H2, Wimg // 2)

    s2n_out[...] = r2_s[:, G + HH:G + HH + T2, :].astype(s2n_out.dtype)

    # ---- pass 8: up1 = convT(r2); fused = relu(up1 + r1) ------------------
    # fused needed on logical full rows [HF-1, HF+T+1); u-bands cover it.
    u_lo = ((HF - 1) // 2 // BH) * BH            # 4 for HF=16
    u_hi = u_lo + -(-(T // 2 + HF // 2 + 2 - u_lo) // BH) * BH
    for u0 in range(u_lo, u_hi, BH):
        pieces = []
        for dx in (0, 1):                        # 0 -> c-1, 1 -> c
            for dy in (0, 1):                    # 0 -> u-1, 1 -> u
                pc = band(r2_s, u0 + dy - 1, BH, 16).reshape(16 * BH, W2)
                pieces.append(_shift_r(pc, W2) if dx == 0 else pc)
        X4 = jnp.concatenate(pieces, axis=0)     # [(dx, dy, ci, u), W2]
        o = _mm(Lup, X4, precision) + bup[...]   # [(py, px, co, u), W2]
        for py in (0, 1):
            ph0 = o[(2 * py) * 8 * BH:(2 * py + 1) * 8 * BH]
            ph1 = o[(2 * py + 1) * 8 * BH:(2 * py + 2) * 8 * BH]
            full = _sel(ph0, SelET, precision) + _sel(ph1, SelOT, precision)
            full = full.reshape(8, BH, W)
            for q in range(BH):                  # fused row 2u+py
                row = 2 * (u0 + q) + py
                if row < 0 or row >= R:
                    continue
                r1r = r1_s[:, row + G:row + G + 1, :].astype(f32).reshape(8, 1, W)
                fused_s[:, row + G:row + G + 1, :] = jnp.maximum(
                    full[:, q:q + 1, :] + r1r, 0.0).astype(fused_s.dtype)

    zero_oob(fused_s, HF, T, H, Wimg)

    # ---- pass 9: score head ----------------------------------------------
    if up:
        # ConvTranspose s2 phases from fused rows {p-1, p}, cols {c-1, c}
        for p0 in range(HF, HF + T, BF):
            pieces = []
            for dx in (0, 1):
                for dy in (0, 1):
                    pc = band(fused_s, p0 + dy - 1, BF, 8).reshape(8 * BF, W)
                    pieces.append(_shift_r(pc, W) if dx == 0 else pc)
            X4 = jnp.concatenate(pieces, axis=0)
            o = _mm(Lsc, X4, precision) + bsc[...]  # [(py, px, 1, p), W]
            score_out[:, :, p0 - HF:p0 - HF + BF, :] = o.reshape(
                2, 2, BF, W).astype(score_out.dtype)
    else:
        for p0 in range(HF, HF + T, BF):
            X9 = _im2col9(dy_pieces([(fused_s, 8)], p0, BF), W)
            o = _mm(Lsc, X9, precision) + bsc[...]
            score_out[p0 - HF:p0 - HF + BF, :] = o.reshape(
                BF, W).astype(score_out.dtype)

    if tap is not None:
        bufs = dict(cost=cost_s, s1=s1_s, s2=s2_s, x1=x1_s, rg=rg_s, u=u_s,
                    rs1=rs1_s, r1=r1_s, r1e=r1e_s, r1o=r1o_s, x2=x2_s,
                    rg2=rg2_s, u2=u2_s, rs2=rs2_s, r2=r2_s, fused=fused_s)
        dbg_out[...] = bufs[tap][...].astype(dbg_out.dtype).reshape(
            dbg_out.shape)


_SCRATCH_TAPS = {
    # name -> (channels, full_rows?, full_lanes?) for the tap output shape
    "x1": (8, True, True), "rg": (8, True, True), "u": (8, True, True),
    "rs1": (8, True, True), "r1": (8, True, True), "fused": (8, True, True),
    "r1e": (8, True, False), "r1o": (8, True, False),
    "x2": (16, False, False), "rg2": (16, False, False),
    "u2": (16, False, False), "rs2": (16, False, False),
    "r2": (16, False, False), "s2": (16, False, False),
}

def red_step2_debug_tap(name, params, cost, s1, s2, *, up, dtype=jnp.float32,
                        precision="f32x3", interpret=True):
    """Run the fused forward with scratch tap `name` exposed — parity-debug
    tooling, not a production path. Returns (score, s1n, s2n,
    tapped [n_strips, C, rows, W*]); tapped slot k holds logical strip row
    k - G (see the kernel's buffer layout)."""
    H, Wimg, Cin = cost.shape
    Wpad = pad_width(Wimg)
    T = _pick_strip(H, Wpad, Cin)
    cfg = (Cin, H, Wpad, Wimg, bool(up), T, precision, bool(interpret),
           jnp.dtype(dtype).name, False, name)
    return _forward(cfg, params, cost, s1, s2)


# --------------------------------------------------------------------------
# host-side wrapper
# --------------------------------------------------------------------------

import os as _os

# Scratch budget for strip selection. Larger strips amortize the 2*HF-row
# vertical halo (T=16 loads 4x its output rows; T=64 only 1.75x) at the
# cost of VMEM pressure; tune with RED_VMEM_MB (docs/PERF.md A/B).
_VMEM_BUDGET = int(_os.environ.get("RED_VMEM_MB", "13")) * 2 ** 20


def _pick_strip(H: int, W: int, Cin: int) -> int:
    """Largest strip height T (divisor of H, multiple of 16 so the
    half-res strip T/2 stays 8-row DMA-aligned) whose scratch stays
    within _VMEM_BUDGET."""
    best = 0
    for T in (96, 64, 48, 32, 16):
        if H % T or T % 16:
            continue
        R = T + 2 * HF + 2 * G
        R2 = T // 2 + 2 * HH + 2 * G
        full = (Cin + 8 * 6) * R * W * 4          # cost + 6 f32 full buffers
        half = (16 * 5) * R2 * (W // 2) * 4 + 8 * R * W * 4
        if full + half < _VMEM_BUDGET:
            best = max(best, T)
    return best


def pad_width(Wimg: int) -> int:
    """Buffer width for a logical image width: next multiple of 256 (the
    half-res buffers are W/2 lanes wide and real Mosaic requires lane-dim
    memref slices aligned to the 128 tiling — a 64-lane half-width
    compiles in interpret mode but fails on-chip)."""
    return -(-Wimg // 256) * 256


def red_step2_ok(H: int, W: int) -> bool:
    """Kernel applicability for a logical image [H, W]: narrower images
    run in lane-padded buffers (pad_width) with in-kernel column masking
    that reproduces flax's SAME zero padding exactly."""
    if W % 8 or H % 16:
        return False
    if _pick_strip(H, pad_width(W), 8) == 0:
        return False
    return True


def _forward(cfg, params, cost, s1, s2):
    """cfg = (Cin, H, W, Wimg, up, T, precision, interpret, dtype, cf_in
    [, tap]).

    W is the lane-padded buffer width; cost arrives NHWC at the logical
    Wimg and is padded here — or, with cf_in, already CHANNEL-FIRST at
    the buffer width ([Cin, H, W], pad columns exactly zero: the sweep
    kernel's keep_pad_w handoff), in which case no relayout happens at
    all. States live padded (the kernel keeps their pad columns zero);
    score is cropped back to Wimg."""
    Cin, H, W, Wimg, up, T, precision, interpret, dtype_name, cf_in = cfg[:10]
    tap = cfg[10] if len(cfg) > 10 else None
    dtype = jnp.dtype(dtype_name)
    T2 = T // 2
    H2, W2 = H // 2, W // 2
    n = H // T
    R, R2 = T + 2 * HF, T2 + 2 * HH

    packed = pack_redstep_params(params, Cin, up, W, dtype)
    if cf_in:
        assert cost.shape == (Cin, H, W), (cost.shape, (Cin, H, W))
        cost_t = cost.astype(dtype)
    else:
        cost_t = jnp.transpose(cost, (2, 0, 1)).astype(dtype)  # [Cin,H,Wimg]
        if Wimg < W:
            cost_t = jnp.pad(cost_t, ((0, 0), (0, 0), (0, W - Wimg)))

    kernel = functools.partial(
        _red_kernel, Cin=Cin, H=H, W=W, Wimg=Wimg, T=T, up=up,
        precision=precision, tap=tap)

    score_shape = ((2, 2, H, W) if up else (H, W))
    score_block = ((2, 2, T, W) if up else (T, W))
    score_idx = ((lambda i: (0, 0, i, 0)) if up else (lambda i: (i, 0)))

    out_specs = [
        pl.BlockSpec(score_block, score_idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((8, T, W), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((16, T2, W2), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct(score_shape, dtype),
        jax.ShapeDtypeStruct((8, H, W), dtype),
        jax.ShapeDtypeStruct((16, H2, W2), dtype),
    ]
    if tap is not None:
        tc, frows, flanes = _SCRATCH_TAPS[tap]
        tshape = (tc, (R if frows else R2) + 2 * G, W if flanes else W2)
        out_specs.append(pl.BlockSpec(
            (1, *tshape), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((n, *tshape), jnp.float32))

    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in packed]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3 + w_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((Cin, R + 2 * G, W), dtype),      # cost_s
            pltpu.VMEM((8, R + 2 * G, W), dtype),        # s1_s
            pltpu.VMEM((16, R2 + 2 * G, W2), dtype),     # s2_s
            pltpu.VMEM((8, R + 2 * G, W), jnp.float32),  # x1_s
            pltpu.VMEM((8, R + 2 * G, W), jnp.float32),  # rg_s
            pltpu.VMEM((8, R + 2 * G, W), jnp.float32),  # u_s
            pltpu.VMEM((8, R + 2 * G, W), jnp.float32),  # rs1_s
            pltpu.VMEM((8, R + 2 * G, W), jnp.float32),  # r1_s
            pltpu.VMEM((8, R + 2 * G, W2), jnp.float32),  # r1e_s
            pltpu.VMEM((8, R + 2 * G, W2), jnp.float32),  # r1o_s
            pltpu.VMEM((16, R2 + 2 * G, W2), jnp.float32),  # x2_s
            pltpu.VMEM((16, R2 + 2 * G, W2), jnp.float32),  # rg2_s
            pltpu.VMEM((16, R2 + 2 * G, W2), jnp.float32),  # u2_s
            pltpu.VMEM((16, R2 + 2 * G, W2), jnp.float32),  # rs2_s
            pltpu.VMEM((16, R2 + 2 * G, W2), jnp.float32),  # r2_s
            pltpu.VMEM((8, R + 2 * G, W), jnp.float32),  # fused_s
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(out_shapes),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(cost_t, s1.astype(dtype), s2.astype(dtype), *packed)
    score, s1n, s2n = outs[:3]

    if up:
        # [py, px, p, w] -> [2H, 2W]
        score = jnp.transpose(score, (2, 0, 3, 1)).reshape(2 * H, 2 * W)
        score = score[:, : 2 * Wimg]
    else:
        score = score[:, :Wimg]
    if tap is not None:
        return score, s1n, s2n, outs[3]
    return score, s1n, s2n


# --------------------------------------------------------------------------
# column-slab tiling (full-res operating point)
# --------------------------------------------------------------------------

# Horizontal halo per slab side, in full-res columns. The step's horizontal
# receptive field is <= 12 full-res columns (conv1 + 2 GRU convs -> r1 +-3;
# stride-2 conv2 + GRU2 -> r2 +-9 in full cols; upconv + score head -> 12),
# identical to the vertical field behind HF. 16 keeps the half-res halo (8)
# even and leaves slack.
SLAB_HALO = 16


def _pick_slab(H: int, Wimg: int, Cin: int) -> int:
    """Slab buffer width (multiple of 256, <= Wimg) minimizing total strip
    traffic ~ n_slabs * n_strips * loaded_rows * slab_width; 0 if none fits."""
    best, best_cost = 0, None
    for WS in (256, 512, 768, 1024):
        if WS > Wimg:
            continue
        T = _pick_strip(H, WS, Cin)
        if T == 0:
            continue
        n = -(-Wimg // (WS - 2 * SLAB_HALO))
        cost = n * (H // T) * (T + 2 * HF + 2 * G) * WS
        if best_cost is None or cost < best_cost:
            best, best_cost = WS, cost
    return best


def red_step2_tiled_ok(H: int, Wimg: int, Cin: int = 8) -> bool:
    """Tiled-path applicability: widths too large for one VMEM-resident
    kernel call (red_step2_ok) run as overlapping column slabs."""
    if Wimg % 2 or H % 16:
        return False
    return _pick_slab(H, Wimg, Cin) > 0


def red_step2_tiled(
    params, cost: jnp.ndarray, s1: jnp.ndarray, s2: jnp.ndarray,
    *, up: bool, dtype=jnp.float32, precision: str = "bf16",
    interpret: bool = False, slab: int | None = None,
    cost_cf: bool = False, img_w: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """red_step2_fused over overlapping column slabs — the full-res path.

    The single-call kernel needs the whole buffer width resident in VMEM,
    which tops out around W=768; the production operating point is
    W=2752 (1856x2752 stage 3). This wrapper slices the image into
    `slab`-wide windows overlapping by SLAB_HALO (>= the step's 12-col
    horizontal receptive field), runs the unchanged kernel per slab, and
    stitches the central columns. Interior slab edges see REAL halo data
    (their zero-pad garbage lands in the cropped margin); windows are
    clamped to [0, Wimg] so a slab buffer edge coincides with a true image
    edge exactly when the kernel's SAME zero padding is the correct
    semantics there. Same calling convention as red_step2_fused (states
    lane-padded to pad_width(Wimg)); exact to the single-call kernel.
    cost_cf: cost channel-first at pad_width(img_w) (see red_step2_fused)
    — slabs slice the cf buffer directly, no per-slab relayout.
    """
    if cost_cf:
        assert img_w is not None
        Cin, H, Wbuf = cost.shape
        Wimg = int(img_w)
        assert Wbuf == pad_width(Wimg), (cost.shape, Wimg)
    else:
        H, Wimg, Cin = cost.shape
    Wpad = pad_width(Wimg)
    assert s1.shape[-1] == Wpad, (s1.shape, Wimg, Wpad)
    WS = slab if slab is not None else _pick_slab(H, Wimg, Cin)
    assert 0 < WS <= Wimg and WS % 256 == 0, (WS, Wimg)
    WC = WS - 2 * SLAB_HALO
    n = -(-Wimg // WC)
    kw = dict(up=up, dtype=dtype, precision=precision, interpret=interpret)
    scores, s1cores, s2cores = [], [], []
    for k in range(n):
        a = k * WC
        b = min(a + WC, Wimg)
        o = min(max(a - SLAB_HALO, 0), Wimg - WS)
        cost_slab = (cost[:, :, o:o + WS] if cost_cf
                     else cost[:, o:o + WS, :])
        slab_kw = dict(kw, cost_cf=True, img_w=WS) if cost_cf else kw
        sc, r1, r2 = red_step2_fused(
            params, cost_slab,
            s1[..., o:o + WS], s2[..., o // 2:(o + WS) // 2], **slab_kw)
        lo, hi = a - o, b - o
        s1cores.append(r1[..., lo:hi])
        s2cores.append(r2[..., lo // 2:hi // 2])
        scores.append(sc[:, 2 * lo:2 * hi] if up else sc[:, lo:hi])
    score = jnp.concatenate(scores, axis=1)
    s1n = jnp.concatenate(s1cores, axis=-1)
    s2n = jnp.concatenate(s2cores, axis=-1)
    if Wpad > Wimg:
        s1n = jnp.pad(s1n, ((0, 0), (0, 0), (0, Wpad - Wimg)))
        s2n = jnp.pad(s2n, ((0, 0), (0, 0), (0, (Wpad - Wimg) // 2)))
    return score, s1n, s2n


def red_step2_reference(params, cost, s1, s2, *, up: bool, dtype):
    """The mathematically identical flax path on the fused calling
    convention (channel-first, possibly lane-padded states) — the
    custom-VJP backward and the parity oracle. Crops states to the cost's
    logical width, runs flax, zero-pads the new states back (crop/pad are
    linear, so the VJP through this matches the kernel's convention)."""
    from ..models.cost_reg import RedStep2

    Wimg = cost.shape[1]
    Wpad = s1.shape[-1]
    mod = RedStep2(up=up, dtype=dtype)
    s1_hwc = jnp.transpose(s1[..., :Wimg], (1, 2, 0)).astype(dtype)
    s2_hwc = jnp.transpose(s2[..., : Wimg // 2], (1, 2, 0)).astype(dtype)
    score, r1, r2 = mod.apply({"params": params}, cost.astype(dtype),
                              s1_hwc, s2_hwc)
    r1 = jnp.transpose(r1, (2, 0, 1))
    r2 = jnp.transpose(r2, (2, 0, 1))
    if Wpad > Wimg:
        r1 = jnp.pad(r1, ((0, 0), (0, 0), (0, Wpad - Wimg)))
        r2 = jnp.pad(r2, ((0, 0), (0, 0), (0, (Wpad - Wimg) // 2)))
    return score, r1, r2


@functools.lru_cache(maxsize=None)
def _fused_fn(cfg):
    dtype = jnp.dtype(cfg[8])
    up = cfg[4]
    cf_in = cfg[9]
    Wimg = cfg[3]

    @jax.custom_vjp
    def f(params, cost, s1, s2):
        return _forward(cfg, params, cost, s1, s2)

    def fwd(params, cost, s1, s2):
        return _forward(cfg, params, cost, s1, s2), (params, cost, s1, s2)

    def bwd(res, g):
        params, cost, s1, s2 = res

        def ref_fn(p, c, a, b):
            if cf_in:
                # crop the pad columns + to NHWC; the vjp through this
                # yields zero grads for the pad columns, matching the
                # upstream kernel-handoff convention (pad cols are the
                # image of a zero-pad, whose vjp is a crop)
                c = jnp.transpose(c[:, :, :Wimg], (1, 2, 0))
            return red_step2_reference(p, c, a, b, up=up, dtype=dtype)

        _, vjp = jax.vjp(ref_fn, params, cost, s1, s2)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def red_step2_fused(
    params, cost: jnp.ndarray, s1: jnp.ndarray, s2: jnp.ndarray,
    *, up: bool, dtype=jnp.float32, precision: str = "bf16",
    interpret: bool = False, cost_cf: bool = False, img_w: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused RedStep2: cost [H, W, Cin] NHWC, states channel-first
    (s1 [8, H, W], s2 [16, H/2, W/2]) -> (score, s1', s2').

    score is [2H, 2W] when `up` else [H, W]; exact flax semantics
    (cost_reg.RedStep2) with MXU-feeding precision per `precision`
    ('bf16' mirrors the bf16 model; 'f32x3' is f32-exact; 'f32' is the
    raw one-pass mode). Gradients flow through the flax VJP.

    When W is not a multiple of 256 the STATES must arrive lane-padded to
    pad_width(W) (the kernel keeps their pad columns zero, matching
    flax's SAME zero padding); cost stays at the logical width and the
    score is returned cropped.

    cost_cf: cost arrives CHANNEL-FIRST at the padded buffer width
    ([Cin, H, pad_width(img_w)], pad columns exactly zero — the sweep
    kernel's keep_pad_w handoff); img_w gives the true width and NO
    relayout happens between the two kernels.
    """
    if cost_cf:
        assert img_w is not None
        Cin, H, Wbuf = cost.shape
        Wimg = int(img_w)
        Wpad = pad_width(Wimg)
        assert Wbuf == Wpad, (cost.shape, Wimg, Wpad)
    else:
        H, Wimg, Cin = cost.shape
        Wpad = pad_width(Wimg)
    assert s1.shape[-1] == Wpad, (s1.shape, Wimg, Wpad)
    T = _pick_strip(H, Wpad, Cin)
    assert T > 0, (H, Wpad)
    cfg = (Cin, H, Wpad, Wimg, bool(up), T, precision, bool(interpret),
           jnp.dtype(dtype).name, bool(cost_cf))
    return _fused_fn(cfg)(params, cost, s1, s2)
