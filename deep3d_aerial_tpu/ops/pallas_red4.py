"""Pallas TPU kernel: one fused RedStep4 recurrent-regularizer step.

MSREDNet regularizes each depth plane with a 4-level ConvGRU
encoder-decoder (reference slice_RED_Regularization,
/root/reference/mvs/mvs_cas/models/msrednet.py:337-372): three stride-2
downsample convs, four GroupNorm'd ConvGRU cells (one per level), three
transposed-conv decoder merges and a score head — ~22 tiny-channel XLA
ops per depth plane whose NHWC layouts lane-pad C=8..64 up to 128. This
kernel fuses the ENTIRE step into one whole-plane Mosaic program (the
msrednet analog of ops/pallas_red's RedStep2 kernel):

  * channel-first [C, rows, W_l] buffers at every pyramid level, the
    full level width on the lanes; 8 zero guard rows above/below every
    buffer reproduce SAME zero padding at the image's top/bottom edges
    (left/right edges via masked lane rolls, as in pallas_red).
  * every conv is one MXU matmul per band of B_l output rows via the
    block-diagonal kron weight packing (pallas_red._kron_conv), with
    B = 16/8/4/2 at levels 0..3 so the matmul row count stays ~128-256
    as channels grow.
  * stride-2 convs go through even/odd lane-split buffers + one-hot
    selection matmuls; transposed convs through the 4-phase tap matrix
    (pallas_red._phase4_mat) + interleave selections — exactly the
    RedStep2 tap algebra (derived against flax and tested there).
  * GroupNorm(num_groups=1) statistics are plain in-kernel reductions:
    the whole plane is VMEM-resident (tier-1 applicability), so each
    gate's sum / sum-of-squares accumulate across the band loop as
    traced f32 scalars. Fast-variance semantics (mean(x^2) - mean(x)^2,
    eps=1e-6) match flax.
  * the model's leading negation (neg = -cost, cost_reg.RedStep4) is
    folded into the packed weights of every consumer of the cost (d1
    conv + the X-part columns of the level-0 gates/candidate packs).
  * buffer reuse: the decoder's upsample slabs alias the (dead) r-gate
    halves of the gate buffers; state updates run in place; the score
    head's skip sum reuses the dead level-0 r*h buffer.

Applicability (red_step4_ok): H % 16 == 0, W % 8 == 0, whole-plane VMEM
estimate under budget — covers the bench-point stage sizes (96x128 ..
384x512 in bf16). Larger planes (full-res production) fall back to the
flax body; a strip-phased tier-2 is future work.

Autodiff: `red_step4_fused` carries a custom VJP whose backward is the
VJP of the mathematically identical flax module (cost_reg.RedStep4), so
training takes the kernel's forward throughput with exact gradients.
"""

from __future__ import annotations

import functools
import os as _os
from typing import Tuple

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

G = 8          # zero guard rows above/below every buffer
GN_EPS = 1e-6  # flax GroupNorm default

# per-level band heights: matmul rows = C_out * B stays ~128-256
BANDS = (16, 8, 4, 2)
HIDDEN = (8, 16, 32, 64)


# --------------------------------------------------------------------------
# parameter packing
# --------------------------------------------------------------------------

def pack_red4_params(params, Cin: int, W: int, dtype):
    """Flax RedStep4 param tree -> (packed matmul operands, gn vectors).

    The model's leading negation (neg = -cost) is folded into d1's
    weights and into the X-channel rows of the level-0 gates/candidate
    kron packs, so the kernel consumes the cost directly.
    """
    def neg_x(K, cx):
        return K.at[:, :, :cx, :].multiply(-1.0)

    p = params
    packed = []
    # downsample convs (biased + relu); d1 consumes -cost
    packed += [_kron_conv(neg_x(p["conv1"]["Conv_0"]["kernel"], Cin),
                          BANDS[1], dtype),
               _tile_bias(p["conv1"]["Conv_0"]["bias"], BANDS[1])]
    packed += [_kron_conv(p["conv2"]["Conv_0"]["kernel"], BANDS[2], dtype),
               _tile_bias(p["conv2"]["Conv_0"]["bias"], BANDS[2])]
    packed += [_kron_conv(p["conv3"]["Conv_0"]["kernel"], BANDS[3], dtype),
               _tile_bias(p["conv3"]["Conv_0"]["bias"], BANDS[3])]
    # gates + cand per level (gru1..gru4); level-0 X part negated
    for l, name in enumerate(("gru1", "gru2", "gru3", "gru4")):
        g = p[name]
        kg, kc = g["gates"]["kernel"], g["cand"]["kernel"]
        if l == 0:
            kg, kc = neg_x(kg, Cin), neg_x(kc, Cin)
        B = BANDS[l]
        packed += [_kron_conv(kg, B, dtype), _tile_bias(g["gates"]["bias"], B),
                   _kron_conv(kc, B, dtype), _tile_bias(g["cand"]["bias"], B)]
    # decoder transposed convs (biased + relu): upconv3/2/1, then score
    for l, name in ((3, "upconv3"), (2, "upconv2"), (1, "upconv1")):
        d = p[name]["ConvTranspose_0"]
        B = BANDS[l]
        packed += [_phase4_mat(d["kernel"], B, dtype),
                   jnp.tile(_tile_bias(d["bias"], B), (4, 1))]
    packed += [_kron_conv(p["out2d"]["kernel"], BANDS[0], dtype),
               _tile_bias(p["out2d"]["bias"], BANDS[0])]
    # selection matrices per source-level width (W, W/2, W/4): stride
    # splits use (se, so) at the source width; deconv interleaves use
    # (se.T, so.T) at the target width
    for w in (W, W // 2, W // 4):
        packed += list(_sel_mats(w, dtype))
    # GroupNorm vectors: per level, (rn, un, on) x (scale, bias) as
    # [C, 1, 1] f32 (broadcast over rows/lanes in-kernel)
    gn = []
    for name, C in zip(("gru1", "gru2", "gru3", "gru4"), HIDDEN):
        for gname in ("rn", "un", "on"):
            q = p[name][gname]
            gn += [q["scale"].astype(jnp.float32).reshape(C, 1, 1),
                   q["bias"].astype(jnp.float32).reshape(C, 1, 1)]
    return packed, gn


# --------------------------------------------------------------------------
# the kernel
# --------------------------------------------------------------------------

def _red4_kernel(*refs, Cin: int, H: int, W: int, precision: str):
    """Whole-plane fused RedStep4 (straight-line, no grid). refs order:
    cost [Cin,H,W], s1..s4, 30 packed matmul operands, 12 selection
    mats, 24 gn vectors | outputs score [H,W], h1..h4 | scratch."""
    (cost_in, s1_in, s2_in, s3_in, s4_in), rest = refs[:5], refs[5:]
    packed, rest = rest[:30], rest[30:]
    sels, rest = rest[:12], rest[12:]
    gn, rest = rest[:24], rest[24:]
    outs, scratch = rest[:5], rest[5:]
    score_out, h_outs = outs[0], outs[1:]
    cost_s = scratch[0]
    s_bufs = scratch[1:5]
    xe_bufs = scratch[5:8]
    xo_bufs = scratch[8:11]
    d_bufs = scratch[11:14]
    gp_bufs = scratch[14:18]
    rs_bufs = scratch[18:22]
    cp_bufs = scratch[22:26]

    Ld1, bd1, Ld2, bd2, Ld3, bd3 = packed[:6]
    gates_w = [packed[6 + 4 * l: 10 + 4 * l] for l in range(4)]
    dec_w = [packed[22:24], packed[24:26], packed[26:28]]  # up3, up2, up1
    Lsc, bsc = packed[28:30]
    sel_lvl = [sels[0:4], sels[4:8], sels[8:12]]           # widths W, W/2, W/4

    f32 = jnp.float32
    Hs = (H, H // 2, H // 4, H // 8)
    Ws = (W, W // 2, W // 4, W // 8)

    # ---- zero scratch, copy inputs into guarded buffers -------------------
    for buf in ((cost_s,) + tuple(s_bufs) + tuple(xe_bufs) + tuple(xo_bufs)
                + tuple(d_bufs) + tuple(gp_bufs) + tuple(rs_bufs)
                + tuple(cp_bufs)):
        buf[...] = jnp.zeros(buf.shape, buf.dtype)
    cost_s[:, G:G + H, :] = cost_in[...].astype(cost_s.dtype)
    for s_in, s_s, hl in zip((s1_in, s2_in, s3_in, s4_in), s_bufs, Hs):
        s_s[:, G:G + hl, :] = s_in[...].astype(s_s.dtype)

    def band(buf, r0, B):
        """[C, B, W*] f32 at logical rows [r0, r0+B) (guard offset +G)."""
        return buf[:, r0 + G:r0 + G + B, :].astype(f32)

    def band2d(buf, r0, B):
        C, _, Wb = buf.shape
        return band(buf, r0, B).reshape(C * B, Wb)

    def store(buf, r0, B, val):
        C, _, Wb = buf.shape
        buf[:, r0 + G:r0 + G + B, :] = val.reshape(C, B, Wb).astype(buf.dtype)

    def dy_pieces(bufs, r0, B):
        out = []
        for a in range(3):
            parts = [band2d(buf, r0 + a - 1, B) for buf in bufs]
            out.append(jnp.concatenate(parts, axis=0) if len(parts) > 1
                       else parts[0])
        return out

    # ---- downsample chain: splits + stride-2 convs -------------------------
    def split_level(src, dste, dsto, Hl, B, SelE, SelO):
        for r0 in range(0, Hl, B):
            y = band2d(src, r0, B)
            store(dste, r0, B, _sel(y, SelE, precision))
            store(dsto, r0, B, _sel(y, SelO, precision))

    def conv_s2(srce, srco, dst, L, b, Hout, Wout, B):
        """out[q, j] = sum_ab K[a,b] x[2q+a, 2j+b]; taps 2j+b handled by
        the (even, odd, even<<1) split-buffer reads (pallas_red pass 5)."""
        C = srce.shape[0]
        for q0 in range(0, Hout, B):
            pieces = []
            for src, sh in ((srce, False), (srco, False), (srce, True)):
                for a in range(3):
                    rows = [src[:, 2 * (q0 + q) + a + G:
                                2 * (q0 + q) + a + G + 1, :]
                            for q in range(B)]
                    pc = jnp.concatenate(rows, axis=1).astype(f32)
                    pc = pc.reshape(C * B, Wout)
                    pieces.append(_shift_l(pc, Wout) if sh else pc)
            X9 = jnp.concatenate(pieces, axis=0)
            o = _mm(L, X9, precision) + b[...]
            store(dst, q0, B, jnp.maximum(o, 0.0))

    split_level(cost_s, xe_bufs[0], xo_bufs[0], H, BANDS[0],
                sel_lvl[0][0], sel_lvl[0][1])
    conv_s2(xe_bufs[0], xo_bufs[0], d_bufs[0], Ld1, bd1,
            Hs[1], Ws[1], BANDS[1])
    split_level(d_bufs[0], xe_bufs[1], xo_bufs[1], Hs[1], BANDS[1],
                sel_lvl[1][0], sel_lvl[1][1])
    conv_s2(xe_bufs[1], xo_bufs[1], d_bufs[1], Ld2, bd2,
            Hs[2], Ws[2], BANDS[2])
    split_level(d_bufs[1], xe_bufs[2], xo_bufs[2], Hs[2], BANDS[2],
                sel_lvl[2][0], sel_lvl[2][1])
    conv_s2(xe_bufs[2], xo_bufs[2], d_bufs[2], Ld3, bd3,
            Hs[3], Ws[3], BANDS[3])

    x_bufs = (cost_s, d_bufs[0], d_bufs[1], d_bufs[2])

    # ---- gates convs + GN statistics ---------------------------------------
    # gp_l = conv([X_l, h_l]) stored as [2C, rows, W] (kron row order is
    # already channel-major: channels [0,C) = r, [C,2C) = u, flax's split)
    stats = []  # per level: (r_mean, r_inv, u_mean, u_inv)
    for l in range(4):
        Lg, bg = gates_w[l][0], gates_w[l][1]
        C, B, Hl = HIDDEN[l], BANDS[l], Hs[l]
        sr = su = sr2 = su2 = jnp.float32(0.0)
        for r0 in range(0, Hl, B):
            X9 = _im2col9(dy_pieces([x_bufs[l], s_bufs[l]], r0, B), Ws[l])
            g = _mm(Lg, X9, precision) + bg[...]
            store(gp_bufs[l], r0, B, g)
            r_part, u_part = g[:C * B], g[C * B:]
            sr = sr + jnp.sum(r_part)
            su = su + jnp.sum(u_part)
            sr2 = sr2 + jnp.sum(r_part * r_part)
            su2 = su2 + jnp.sum(u_part * u_part)
        N = C * Hl * Ws[l]
        rm, um = sr / N, su / N
        r_inv = jax.lax.rsqrt(jnp.maximum(sr2 / N - rm * rm, 0.0) + GN_EPS)
        u_inv = jax.lax.rsqrt(jnp.maximum(su2 / N - um * um, 0.0) + GN_EPS)
        stats.append((rm, r_inv, um, u_inv))

    # ---- rs_l = sigmoid(GN_r(gp_r)) * h_l ----------------------------------
    for l in range(4):
        C, B, Hl = HIDDEN[l], BANDS[l], Hs[l]
        rm, r_inv = stats[l][0], stats[l][1]
        g_sc, g_bi = gn[6 * l + 0], gn[6 * l + 1]
        for r0 in range(0, Hl, B):
            pre = gp_bufs[l][:C, r0 + G:r0 + G + B, :].astype(f32)
            r = jax.nn.sigmoid((pre - rm) * r_inv * g_sc[...] + g_bi[...])
            store(rs_bufs[l], r0, B,
                  (r * band(s_bufs[l], r0, B)).reshape(C * B, Ws[l]))

    # ---- cand convs + GN statistics ----------------------------------------
    ostats = []
    for l in range(4):
        Lk, bk = gates_w[l][2], gates_w[l][3]
        C, B, Hl = HIDDEN[l], BANDS[l], Hs[l]
        sx = sx2 = jnp.float32(0.0)
        for r0 in range(0, Hl, B):
            X9 = _im2col9(dy_pieces([x_bufs[l], rs_bufs[l]], r0, B), Ws[l])
            o = _mm(Lk, X9, precision) + bk[...]
            store(cp_bufs[l], r0, B, o)
            sx = sx + jnp.sum(o)
            sx2 = sx2 + jnp.sum(o * o)
        N = C * Hl * Ws[l]
        om = sx / N
        o_inv = jax.lax.rsqrt(jnp.maximum(sx2 / N - om * om, 0.0) + GN_EPS)
        ostats.append((om, o_inv))

    # ---- state updates (in place): h' = u*h + (1-u)*tanh(GN_o(cp)) ---------
    for l in range(4):
        C, B, Hl = HIDDEN[l], BANDS[l], Hs[l]
        um, u_inv = stats[l][2], stats[l][3]
        om, o_inv = ostats[l]
        u_sc, u_bi = gn[6 * l + 2], gn[6 * l + 3]
        o_sc, o_bi = gn[6 * l + 4], gn[6 * l + 5]
        for r0 in range(0, Hl, B):
            gu = gp_bufs[l][C:, r0 + G:r0 + G + B, :].astype(f32)
            u = jax.nn.sigmoid((gu - um) * u_inv * u_sc[...] + u_bi[...])
            o = jnp.tanh((band(cp_bufs[l], r0, B) - om) * o_inv
                         * o_sc[...] + o_bi[...])
            hb = band(s_bufs[l], r0, B)
            store(s_bufs[l], r0, B,
                  (u * hb + (1.0 - u) * o).reshape(C * B, Ws[l]))
    # updated-state guards are still zero (only core rows were written)
    for l in range(4):
        h_outs[l][...] = s_bufs[l][:, G:G + Hs[l], :].astype(h_outs[l].dtype)

    # ---- decoder ------------------------------------------------------------
    # upsample slabs alias the dead r-halves of the gate buffers
    u3 = gp_bufs[2].at[:32]
    u2 = gp_bufs[1].at[:16]
    u1 = gp_bufs[0].at[:8]

    def deconv_up(src, dst, Lup, bup, l_src, extra=None):
        """dst[2u+py, 2c+px] = relu(convT)(src [+ extra]) — src at level
        l_src, dst at l_src-1 (both guarded CF buffers)."""
        Ci, B = src.shape[0], BANDS[l_src]
        Hl, Wl, Wout = Hs[l_src], Ws[l_src], Ws[l_src - 1]
        SelET, SelOT = sel_lvl[l_src - 1][2], sel_lvl[l_src - 1][3]
        Co = dst.shape[0]
        for u0 in range(0, Hl, B):
            pieces = []
            for dx in (0, 1):
                for dy in (0, 1):
                    pc = band(src, u0 + dy - 1, B)
                    if extra is not None:
                        pc = pc + band(extra, u0 + dy - 1, B)
                    pc = pc.reshape(Ci * B, Wl)
                    pieces.append(_shift_r(pc, Wl) if dx == 0 else pc)
            X4 = jnp.concatenate(pieces, axis=0)
            o = jnp.maximum(_mm(Lup, X4, precision) + bup[...], 0.0)
            for py in (0, 1):
                ph0 = o[(2 * py) * Co * B:(2 * py + 1) * Co * B]
                ph1 = o[(2 * py + 1) * Co * B:(2 * py + 2) * Co * B]
                full = _sel(ph0, SelET, precision) + _sel(ph1, SelOT,
                                                          precision)
                full = full.reshape(Co, B, Wout)
                for q in range(B):
                    row = 2 * (u0 + q) + py
                    dst[:, row + G:row + G + 1, :] = (
                        full[:, q:q + 1, :].astype(dst.dtype))

    deconv_up(s_bufs[3], u3, dec_w[0][0], dec_w[0][1], 3)
    deconv_up(u3, u2, dec_w[1][0], dec_w[1][1], 2, extra=s_bufs[2])
    deconv_up(u2, u1, dec_w[2][0], dec_w[2][1], 1, extra=s_bufs[1])

    # ---- score head: conv3x3(u1 + h1) — skip sum into the dead rs1 ---------
    B = BANDS[0]
    for r0 in range(0, H, B):
        v = band(u1, r0, B) + band(s_bufs[0], r0, B)
        store(rs_bufs[0], r0, B, v.reshape(8 * B, W))
    for r0 in range(0, H, B):
        X9 = _im2col9(dy_pieces([rs_bufs[0]], r0, B), W)
        o = _mm(Lsc, X9, precision) + bsc[...]
        score_out[r0:r0 + B, :] = o.reshape(B, W).astype(score_out.dtype)


# --------------------------------------------------------------------------
# host-side wrapper
# --------------------------------------------------------------------------

_VMEM_BUDGET = int(_os.environ.get("RED4_VMEM_MB", "72")) * 2 ** 20


def _vmem_estimate(H: int, W: int, Cin: int, itemsize: int) -> int:
    """Bytes of guarded scratch + packed weights (approximate)."""
    hw = H * W
    # per-HW channel-units: cost Cin + states 15 + splits (Cin+4+2) +
    # d(4+2+1) + gp 30 + rs 15 + cp 15
    units = Cin + 15 + (Cin + 6) + 7 + 30 + 15 + 15
    guards = sum((2 * G) * (W >> l) * c * 26 // 26
                 for l, c in ((0, Cin + 8 + 2 * Cin), (1, 16 * 5), (2, 32 * 5),
                              (3, 64 * 4)))
    weights = 6 * 10 ** 6  # packed kron/phase mats, ~constant
    return units * hw * itemsize + guards * itemsize + weights


def red_step4_ok(H: int, W: int, Cin: int, dtype=jnp.float32) -> bool:
    """Tier-1 (whole-plane) applicability."""
    if H % 16 or W % 8 or H < 32 or W < 32:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    return _vmem_estimate(H, W, Cin, itemsize) < _VMEM_BUDGET


def _forward(cfg, params, cost, s1, s2, s3, s4):
    """cfg = (Cin, H, W, precision, interpret, dtype_name). cost arrives
    NHWC [H, W, Cin]; states channel-first ([8,H,W], [16,H/2,W/2],
    [32,H/4,W/4], [64,H/8,W/8])."""
    Cin, H, W, precision, interpret, dtype_name = cfg
    dtype = jnp.dtype(dtype_name)
    packed, gnv = pack_red4_params(params, Cin, W, dtype)
    cost_t = jnp.transpose(cost, (2, 0, 1)).astype(dtype)

    kernel = functools.partial(_red4_kernel, Cin=Cin, H=H, W=W,
                               precision=precision)
    Hs = (H, H // 2, H // 4, H // 8)
    Ws = (W, W // 2, W // 4, W // 8)
    out_shapes = [jax.ShapeDtypeStruct((H, W), dtype)] + [
        jax.ShapeDtypeStruct((HIDDEN[l], Hs[l], Ws[l]), dtype)
        for l in range(4)
    ]

    def gb(c, hl, wl, dt):  # guarded buffer
        return pltpu.VMEM((c, hl + 2 * G, wl), dt)

    scratch = [gb(Cin, H, W, dtype)]                       # cost_s
    scratch += [gb(HIDDEN[l], Hs[l], Ws[l], dtype) for l in range(4)]  # s
    scratch += [gb((Cin, 16, 32)[l], Hs[l], Ws[l] // 2, dtype)
                for l in range(3)]                          # xe
    scratch += [gb((Cin, 16, 32)[l], Hs[l], Ws[l] // 2, dtype)
                for l in range(3)]                          # xo
    scratch += [gb((16, 32, 64)[l], Hs[l + 1], Ws[l + 1], dtype)
                for l in range(3)]                          # d1..d3
    scratch += [gb(2 * HIDDEN[l], Hs[l], Ws[l], dtype) for l in range(4)]  # gp
    scratch += [gb(HIDDEN[l], Hs[l], Ws[l], dtype) for l in range(4)]      # rs
    scratch += [gb(HIDDEN[l], Hs[l], Ws[l], dtype) for l in range(4)]      # cp

    n_in = 5 + len(packed) + len(gnv)
    outs = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2 ** 20),
        interpret=interpret,
    )(cost_t, s1.astype(dtype), s2.astype(dtype), s3.astype(dtype),
      s4.astype(dtype), *packed, *gnv)
    return tuple(outs)


def red_step4_reference(params, cost, s1, s2, s3, s4, *, dtype):
    """The mathematically identical flax path on the fused calling
    convention (channel-first states) — the custom-VJP backward and the
    parity oracle."""
    from ..models.cost_reg import RedStep4

    mod = RedStep4(dtype=dtype)
    hwc = lambda s: jnp.transpose(s, (1, 2, 0)).astype(dtype)
    score, r1, r2, r3, r4 = mod.apply(
        {"params": params}, cost.astype(dtype),
        hwc(s1), hwc(s2), hwc(s3), hwc(s4))
    cf = lambda s: jnp.transpose(s, (2, 0, 1))
    return score, cf(r1), cf(r2), cf(r3), cf(r4)


@functools.lru_cache(maxsize=None)
def _fused_fn(cfg):
    dtype = jnp.dtype(cfg[5])

    @jax.custom_vjp
    def f(params, cost, s1, s2, s3, s4):
        return _forward(cfg, params, cost, s1, s2, s3, s4)

    def fwd(params, cost, s1, s2, s3, s4):
        return (_forward(cfg, params, cost, s1, s2, s3, s4),
                (params, cost, s1, s2, s3, s4))

    def bwd(res, g):
        _, vjp = jax.vjp(
            lambda p, c, a, b, cc, d: red_step4_reference(
                p, c, a, b, cc, d, dtype=dtype), *res)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


# --------------------------------------------------------------------------
# tier-2: strip/slab-tiled composition (full-res planes)
# --------------------------------------------------------------------------
#
# The whole-plane kernel above needs every pyramid buffer VMEM-resident;
# production full-res planes (up to 1856x2752) instead run the step as a
# composition of the strip-tiled channel-first conv kernels
# (ops/pallas_cf_conv) with exact XLA glue for the GroupNorm statistics
# (which are GLOBAL per plane — the reason the step cannot simply run the
# tier-1 kernel over column slabs) and the gate/state pointwise math.
# Every tensor stays channel-first [C, rows, W] end to end: the XLA ops
# are pure elementwise/reduction work at perfect layouts, while all nine
# convs + three deconvs + score head feed the MXU through the same kron
# packing as tier-1.


def _ceil16(n: int) -> int:
    return -(-n // 16) * 16


def red_step4_tiled_ok(H: int, W: int, Cin: int = 8) -> bool:
    """Tier-2 applicability: the pyramid needs exact halvings down to /8
    (the flax body handles odd sizes via crop, which the tiled kernels do
    not reproduce); any plane too large for tier-1 but satisfying this
    runs tiled."""
    return H % 8 == 0 and W % 8 == 0 and H >= 32 and W >= 32


def _mask_rows(x, Hl: int):
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 2)
    return jnp.where(row < Hl, x, 0.0)


def _pad_rows(x, Hp: int):
    if x.shape[-2] == Hp:
        return x
    if x.shape[-2] > Hp:
        return x[..., :Hp, :]
    pad = [(0, 0)] * (x.ndim - 2) + [(0, Hp - x.shape[-2]), (0, 0)]
    return jnp.pad(x, pad)


def _gn_apply(pre, gn_params, Hl: int, Wl: int):
    """GroupNorm(num_groups=1) over the LOGICAL (C, Hl, Wl) elements of a
    channel-first map whose pad rows are zero (so plain full-array sums
    are exact); returns f32, unmasked (caller masks after the
    nonlinearity)."""
    C = pre.shape[0]
    x = pre.astype(jnp.float32)
    N = C * Hl * Wl
    m = jnp.sum(x) / N
    v = jnp.maximum(jnp.sum(x * x) / N - m * m, 0.0)
    inv = jax.lax.rsqrt(v + GN_EPS)
    scale = gn_params["scale"].astype(jnp.float32).reshape(C, 1, 1)
    bias = gn_params["bias"].astype(jnp.float32).reshape(C, 1, 1)
    return (x - m) * inv * scale + bias


def _forward_tiled(cfg, params, cost, s1, s2, s3, s4):
    """cost NHWC [H, W, Cin]; states channel-first (tier-1 convention)."""
    Cin, H, W, precision, interpret, dtype_name = cfg
    dtype = jnp.dtype(dtype_name)
    from .pallas_cf_conv import cf_conv3x3

    p = params
    Hs = (H, H // 2, H // 4, H // 8)
    Ws = (W, W // 2, W // 4, W // 8)
    Hp = tuple(_ceil16(h) for h in Hs)
    kw = dict(dtype=dtype, precision=precision, interpret=interpret)

    def neg_x(K, cx):
        return K.astype(jnp.float32).at[:, :, :cx, :].multiply(-1.0)

    # the model's leading negation (neg = -cost) folds into the weights of
    # every consumer of the cost, exactly as in the tier-1 packing
    x0 = _pad_rows(jnp.transpose(cost, (2, 0, 1)).astype(dtype), Hp[0])
    d1 = cf_conv3x3(x0, neg_x(p["conv1"]["Conv_0"]["kernel"], Cin),
                    p["conv1"]["Conv_0"]["bias"], mode="down", relu=True,
                    img_h=Hs[0], **kw)
    d1 = _pad_rows(d1, Hp[1])
    d2 = _pad_rows(cf_conv3x3(d1, p["conv2"]["Conv_0"]["kernel"],
                              p["conv2"]["Conv_0"]["bias"], mode="down",
                              relu=True, img_h=Hs[1], **kw), Hp[2])
    d3 = _pad_rows(cf_conv3x3(d2, p["conv3"]["Conv_0"]["kernel"],
                              p["conv3"]["Conv_0"]["bias"], mode="down",
                              relu=True, img_h=Hs[2], **kw), Hp[3])

    X = (x0, d1, d2, d3)
    hs = [_pad_rows(s.astype(dtype), Hp[l])
          for l, s in enumerate((s1, s2, s3, s4))]

    newh = []
    for l, name in enumerate(("gru1", "gru2", "gru3", "gru4")):
        g = p[name]
        C = HIDDEN[l]
        kg, kc = g["gates"]["kernel"], g["cand"]["kernel"]
        if l == 0:
            kg, kc = neg_x(kg, Cin), neg_x(kc, Cin)
        gp = cf_conv3x3(jnp.concatenate([X[l], hs[l]], axis=0), kg,
                        g["gates"]["bias"], mode="same", relu=False,
                        img_h=Hs[l], **kw)
        r = _mask_rows(jax.nn.sigmoid(
            _gn_apply(gp[:C], g["rn"], Hs[l], Ws[l])), Hs[l])
        u = jax.nn.sigmoid(_gn_apply(gp[C:], g["un"], Hs[l], Ws[l]))
        hf = hs[l].astype(jnp.float32)
        cp = cf_conv3x3(
            jnp.concatenate([X[l], (r * hf).astype(dtype)], axis=0), kc,
            g["cand"]["bias"], mode="same", relu=False, img_h=Hs[l], **kw)
        o = jnp.tanh(_gn_apply(cp, g["on"], Hs[l], Ws[l]))
        newh.append(_mask_rows(u * hf + (1.0 - u) * o,
                               Hs[l]).astype(dtype))

    up3 = p["upconv3"]["ConvTranspose_0"]
    up2 = p["upconv2"]["ConvTranspose_0"]
    up1 = p["upconv1"]["ConvTranspose_0"]
    u3 = cf_conv3x3(newh[3], up3["kernel"], up3["bias"], mode="up",
                    relu=True, img_h=Hs[3], **kw)[:, :Hp[2], :]
    u2 = cf_conv3x3(u3 + newh[2], up2["kernel"], up2["bias"], mode="up",
                    relu=True, img_h=Hs[2], **kw)[:, :Hp[1], :]
    u1 = cf_conv3x3(u2 + newh[1], up1["kernel"], up1["bias"], mode="up",
                    relu=True, img_h=Hs[1], **kw)[:, :Hp[0], :]
    score = cf_conv3x3(u1 + newh[0], p["out2d"]["kernel"],
                       p["out2d"]["bias"], mode="same", relu=False,
                       img_h=Hs[0], **kw)
    return ((score[0, :H, :],)
            + tuple(h[:, :Hs[l], :] for l, h in enumerate(newh)))


@functools.lru_cache(maxsize=None)
def _tiled_fn(cfg):
    dtype = jnp.dtype(cfg[5])

    @jax.custom_vjp
    def f(params, cost, s1, s2, s3, s4):
        return _forward_tiled(cfg, params, cost, s1, s2, s3, s4)

    def fwd(params, cost, s1, s2, s3, s4):
        return (_forward_tiled(cfg, params, cost, s1, s2, s3, s4),
                (params, cost, s1, s2, s3, s4))

    def bwd(res, grads):
        _, vjp = jax.vjp(
            lambda pp, c, a, b, cc, d: red_step4_reference(
                pp, c, a, b, cc, d, dtype=dtype), *res)
        return vjp(grads)

    f.defvjp(fwd, bwd)
    return f


def red_step4_tiled(
    params, cost: jnp.ndarray, s1, s2, s3, s4,
    *, dtype=jnp.float32, precision: str = "bf16", interpret: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Tier-2 fused RedStep4 (same calling convention and semantics as
    red_step4_fused) for planes beyond the whole-plane VMEM tier.
    Gradients flow through the flax VJP, exactly as in tier-1."""
    H, W, Cin = cost.shape
    assert s1.shape == (8, H, W), (s1.shape, cost.shape)
    cfg = (Cin, H, W, precision, bool(interpret), jnp.dtype(dtype).name)
    return _tiled_fn(cfg)(params, cost, s1, s2, s3, s4)


def red_step4_fused(
    params, cost: jnp.ndarray, s1, s2, s3, s4,
    *, dtype=jnp.float32, precision: str = "bf16", interpret: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Fused RedStep4: cost [H, W, Cin] NHWC, states channel-first
    (s1 [8,H,W], s2 [16,H/2,W/2], s3 [32,H/4,W/4], s4 [64,H/8,W/8]) ->
    (score [H,W], s1', s2', s3', s4').

    Exact flax semantics (cost_reg.RedStep4) with MXU-feeding precision
    per `precision` ('bf16' mirrors the bf16 model; 'f32x3' is f32-exact;
    'f32' the raw one-pass mode). Gradients flow through the flax VJP.
    """
    H, W, Cin = cost.shape
    assert s1.shape == (8, H, W), (s1.shape, cost.shape)
    cfg = (Cin, H, W, precision, bool(interpret), jnp.dtype(dtype).name)
    return _fused_fn(cfg)(params, cost, s1, s2, s3, s4)
