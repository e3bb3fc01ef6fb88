"""Cost-volume regularizers.

  * CostRegNet3D   — 3D-CNN hourglass over [D, H, W, C] volumes
                     (reference cas_mvsnet.py:81-121 / ucsnet.py:56-96)
  * CostRegNet2D   — 2D hourglass over [H, W, D] score maps (adamvs.py:198-238)
  * RedStep2       — 2-level ConvGRU recurrent step, one depth plane at a time
                     (adamvs SliceCostRegNetRED, adamvs.py:403-427)
  * RedStep4       — 4-level ConvGRU encoder-decoder step
                     (msrednet slice_RED_Regularization, msrednet.py:337-372)

The recurrent steps are pure one-plane functions: streaming inference wraps
them in `nn.scan` over the depth axis — the TPU analog of the reference's
Python plane loops, with O(H*W) state instead of O(D*H*W) volumes.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .blocks import ConvBlock, ConvGRUCell, DeconvBlock


def _crop_like(x, ref):
    """Crop a decoder output to a skip tensor's spatial shape (transposed
    convs overshoot by one on odd input sizes)."""
    slices = tuple(slice(0, s) for s in ref.shape)
    return x[slices]


class CostRegNet3D(nn.Module):
    """Hourglass over [D, H, W, C_in] -> [D, H, W] scores. D,H,W % 8 == 0."""

    norm: str = "group"
    dtype: Any = jnp.float32
    base: int = 8

    @nn.compact
    def __call__(self, vol):
        b, norm, dt = self.base, self.norm, self.dtype
        c0 = ConvBlock(b, ndim=3, norm=norm, dtype=dt)(vol)
        c1 = ConvBlock(2 * b, ndim=3, stride=2, norm=norm, dtype=dt)(c0)
        c2 = ConvBlock(2 * b, ndim=3, norm=norm, dtype=dt)(c1)
        c3 = ConvBlock(4 * b, ndim=3, stride=2, norm=norm, dtype=dt)(c2)
        c4 = ConvBlock(4 * b, ndim=3, norm=norm, dtype=dt)(c3)
        c5 = ConvBlock(8 * b, ndim=3, stride=2, norm=norm, dtype=dt)(c4)
        x = ConvBlock(8 * b, ndim=3, norm=norm, dtype=dt)(c5)
        x = c4 + _crop_like(DeconvBlock(4 * b, ndim=3, norm=norm, dtype=dt)(x), c4)
        x = c2 + _crop_like(DeconvBlock(2 * b, ndim=3, norm=norm, dtype=dt)(x), c2)
        x = c0 + _crop_like(DeconvBlock(b, ndim=3, norm=norm, dtype=dt)(x), c0)
        x = nn.Conv(1, (3, 3, 3), padding="SAME", dtype=dt, name="prob")(x)
        return x[..., 0]  # [D, H, W]


class CostRegNet2D(nn.Module):
    """2D hourglass treating the D score planes as channels: [H, W, D] -> [H, W, D]."""

    norm: str = "group"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        norm, dt = self.norm, self.dtype
        c = x.shape[-1]
        c0 = ConvBlock(c, norm=norm, dtype=dt)(x)
        c2 = ConvBlock(c, norm=norm, dtype=dt)(
            ConvBlock(c, stride=2, norm=norm, dtype=dt)(c0))
        c4 = ConvBlock(c, norm=norm, dtype=dt)(
            ConvBlock(c, stride=2, norm=norm, dtype=dt)(c2))
        x = ConvBlock(c, norm=norm, dtype=dt)(
            ConvBlock(c, stride=2, norm=norm, dtype=dt)(c4))
        x = c4 + _crop_like(DeconvBlock(c, norm=norm, dtype=dt)(x), c4)
        x = c2 + _crop_like(DeconvBlock(c, norm=norm, dtype=dt)(x), c2)
        x = c0 + _crop_like(DeconvBlock(c, norm=norm, dtype=dt)(x), c0)
        x = nn.Conv(c, (3, 3), padding="SAME", dtype=dt, name="prob")(x)
        return x


class RedStep2(nn.Module):
    """One recurrent-regularization step (2-level GRU), AdaMVS flavor.

    impl='flax' (default): cost [H, W, C_in], states HWC
    (s1 [H,W,8], s2 [H/2,W/2,16]) -> score [2H,2W] if `up` else [H,W],
    new states.

    impl='pallas' runs the fused Mosaic kernel (ops/pallas_red): the whole
    step is ONE VMEM-resident program per plane instead of ~10 lane-padded
    XLA convs, and the state layout becomes CHANNEL-FIRST (s1 [8,H,W],
    s2 [16,H/2,W/2]) so consecutive planes chain with zero relayouts. The
    param tree is identical to impl='flax' — checkpoints interchangeable —
    and gradients flow through the kernel's custom VJP (the flax backward).
    Falls back to the flax body (with state transposes) while initializing,
    off-TPU, on unsupported shapes (pallas_red.red_step2_ok), or when a
    leading depth-block axis is present at non-kernel shapes.
    """

    up: bool = True
    base: int = 8
    dtype: Any = jnp.float32
    impl: str = "flax"        # 'flax' | 'pallas'
    interpret: bool = False   # pallas interpret mode (CPU tests only)

    @nn.compact
    def __call__(self, cost, s1, s2, cost_cf: bool = False,
                 img_w: "int | None" = None):
        """cost_cf: cost arrives CHANNEL-FIRST at the kernel's padded
        buffer width ([Cin, H, Wpad], or [n, Cin, H, Wpad] with a leading
        depth-block axis; pad columns exactly zero) — the zero-relayout
        handoff from the fused sweep kernel (cascade.chunk_costs_prepared).
        img_w is the true image width (required with cost_cf)."""
        if cost_cf:
            assert img_w is not None, "cost_cf needs the true image width"
            if self.impl == "pallas":
                return self._pallas_path(cost, s1, s2, cost_cf=True,
                                         img_w=img_w)
            cost = jnp.transpose(
                cost[..., :img_w],
                (1, 2, 0) if cost.ndim == 3 else (0, 2, 3, 1))
            return self._flax_body(cost, s1, s2)
        if self.impl == "pallas":
            return self._pallas_path(cost, s1, s2)
        return self._flax_body(cost, s1, s2)

    def _flax_body(self, cost, s1, s2):
        b, dt = self.base, self.dtype
        x1 = ConvBlock(b, norm="none", dtype=dt, name="conv1")(cost)
        r1 = ConvGRUCell(b, dtype=dt, name="gru1")(x1, s1)
        x2 = ConvBlock(2 * b, stride=2, norm="none", dtype=dt, name="conv2")(r1)
        r2 = ConvGRUCell(2 * b, dtype=dt, name="gru2")(x2, s2)
        up1 = nn.ConvTranspose(b, (3, 3), strides=(2, 2), padding="SAME",
                               dtype=dt, name="upconv1")(r2)
        fused = nn.relu(_crop_like(up1, r1) + r1)
        if self.up:
            score = nn.ConvTranspose(1, (3, 3), strides=(2, 2), padding="SAME",
                                     dtype=dt, name="upconv2d")(fused)
        else:
            score = nn.Conv(1, (3, 3), padding="SAME", dtype=dt, name="out2d")(fused)
        return score[..., 0], r1, r2

    def _pallas_path(self, cost, s1, s2, cost_cf: bool = False,
                     img_w: "int | None" = None):
        import jax

        from ..ops.pallas_red import (
            pad_width,
            red_step2_fused,
            red_step2_ok,
            red_step2_tiled,
            red_step2_tiled_ok,
        )

        Hs = s1.shape[-2]
        if cost_cf:
            Wimg = img_w
            Cin = cost.shape[-3]
            assert cost.shape[-1] == pad_width(Wimg) == s1.shape[-1], (
                cost.shape, Wimg, s1.shape)
        else:
            Wimg = cost.shape[-2]
            Cin = cost.shape[-1]
        import os

        interp = (self.interpret
                  or os.environ.get("PALLAS_INTERPRET", "0") == "1")
        backend_ok = (
            not self.is_initializing()
            and self.base == 8
            and (jax.default_backend() != "cpu" or interp)
        )
        # single-call when the whole width fits in VMEM; column-slab tiled
        # kernel at full-res widths (pallas_red.red_step2_tiled)
        fn = None
        if backend_ok and red_step2_ok(Hs, Wimg):
            fn = red_step2_fused
        elif backend_ok and red_step2_tiled_ok(Hs, Wimg, Cin):
            fn = red_step2_tiled
        if fn is not None:
            params = self.variables["params"]
            precision = ("bf16" if jnp.dtype(self.dtype) == jnp.bfloat16
                         else "f32x3")
            kw = dict(up=self.up, dtype=self.dtype, precision=precision,
                      interpret=interp)
            if cost_cf:
                kw.update(cost_cf=True, img_w=Wimg)
            if s1.ndim == 4:
                # leading depth-block axis: unrolled kernel calls (the
                # kernel is per-image; n is a small static block count)
                outs = [fn(params, cost[i], s1[i], s2[i], **kw)
                        for i in range(s1.shape[0])]
                return tuple(jnp.stack([o[j] for o in outs])
                             for j in range(3))
            return fn(params, cost, s1, s2, **kw)

        # fallback: flax body on HWC layouts (crop the lane padding,
        # compute, zero-pad back — pad cols stay zero by construction)
        Wpad = s1.shape[-1]
        if s1.ndim == 4:
            perm_in, perm_out = (0, 2, 3, 1), (0, 3, 1, 2)
        else:
            perm_in, perm_out = (1, 2, 0), (2, 0, 1)
        if cost_cf:
            cost = jnp.transpose(cost[..., :Wimg], perm_in)
        score, r1, r2 = self._flax_body(
            cost,
            jnp.transpose(s1[..., :Wimg], perm_in),
            jnp.transpose(s2[..., : Wimg // 2], perm_in),
        )
        r1 = jnp.transpose(r1, perm_out)
        r2 = jnp.transpose(r2, perm_out)
        if Wpad > Wimg:
            pad = [(0, 0)] * (r1.ndim - 1)
            r1 = jnp.pad(r1, pad + [(0, Wpad - Wimg)])
            r2 = jnp.pad(r2, pad + [(0, (Wpad - Wimg) // 2)])
        return score, r1, r2

    def init_states(self, H: int, W: int):
        b = self.base
        if self.impl == "pallas":
            from ..ops.pallas_red import pad_width

            Wp = pad_width(W)
            return (
                jnp.zeros((b, H, Wp), self.dtype),
                jnp.zeros((2 * b, H // 2, Wp // 2), self.dtype),
            )
        return (
            jnp.zeros((H, W, b), self.dtype),
            jnp.zeros((H // 2, W // 2, 2 * b), self.dtype),
        )

    def out_shape(self, H: int, W: int):
        return (2 * H, 2 * W) if self.up else (H, W)


class NormGRUCell(nn.Module):
    """ConvGRU with GroupNorm(1) on gates and candidate (reference
    ConvGRUCell2, module.py:53-99) — the MSREDNet recurrence."""

    hidden: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, h):
        k = (3, 3)
        # reduction over (H, W, C) regardless of leading batch/block dims:
        # flax's default treats dim 0 as batch, which on an unbatched
        # [H, W, C] map would normalize per ROW — explicit negative axes
        # match the reference's per-sample GroupNorm (module.py:53-99) and
        # keep batched-block and unbatched calls numerically identical
        axes = (-3, -2, -1)
        gn = lambda name: nn.GroupNorm(num_groups=1, dtype=self.dtype,
                                       reduction_axes=axes, name=name)
        gates = nn.Conv(2 * self.hidden, k, padding="SAME", dtype=self.dtype,
                        name="gates")(jnp.concatenate([x, h], axis=-1))
        r, u = jnp.split(gates, 2, axis=-1)
        r = nn.sigmoid(gn("rn")(r))
        u = nn.sigmoid(gn("un")(u))
        o = nn.Conv(self.hidden, k, padding="SAME", dtype=self.dtype,
                    name="cand")(jnp.concatenate([x, r * h], axis=-1))
        o = jnp.tanh(gn("on")(o))
        return u * h + (1.0 - u) * o


class RedStep4(nn.Module):
    """One 4-level recurrent encoder-decoder step (MSREDNet flavor).

    cost [H, W, C_in] (negated variance fed by caller), states pyramid
    (s1 [H,W,8], s2 [H/2,W/2,16], s3 [H/4,W/4,32], s4 [H/8,W/8,64])
    -> score [H, W], new states.

    impl='pallas' runs the fused whole-plane Mosaic kernel
    (ops/pallas_red4): the entire step — downsample chain, four
    GroupNorm'd ConvGRUs with in-kernel global statistics, decoder,
    score head — is ONE program per plane, and the state layout becomes
    CHANNEL-FIRST (s1 [8,H,W] .. s4 [64,H/8,W/8]) so consecutive planes
    chain with zero relayouts. Param tree identical to impl='flax'
    (checkpoints interchangeable); gradients via the kernel's custom VJP
    (the flax backward). Falls back to the flax body while initializing,
    off-TPU, or on shapes outside the whole-plane VMEM tier
    (pallas_red4.red_step4_ok).
    """

    base: int = 8
    dtype: Any = jnp.float32
    impl: str = "flax"        # 'flax' | 'pallas'
    interpret: bool = False   # pallas interpret mode (CPU tests only)

    @nn.compact
    def __call__(self, cost, s1, s2, s3, s4):
        if self.impl == "pallas":
            return self._pallas_path(cost, s1, s2, s3, s4)
        return self._flax_body(cost, s1, s2, s3, s4)

    def _pallas_path(self, cost, s1, s2, s3, s4):
        import os

        import jax

        from ..ops.pallas_red4 import (
            red_step4_fused,
            red_step4_ok,
            red_step4_tiled,
            red_step4_tiled_ok,
        )

        H, W, Cin = cost.shape[-3:]
        interp = (self.interpret
                  or os.environ.get("PALLAS_INTERPRET", "0") == "1")
        backend_ok = (
            not self.is_initializing()
            and self.base == 8
            and (jax.default_backend() != "cpu" or interp)
        )
        # whole-plane kernel in the VMEM tier; strip/slab-tiled
        # composition (cf_conv kernels + exact XLA GN glue) at full-res
        fn = None
        if backend_ok and red_step4_ok(H, W, Cin, self.dtype):
            fn = red_step4_fused
        elif backend_ok and red_step4_tiled_ok(H, W, Cin):
            fn = red_step4_tiled
        if fn is not None:
            params = self.variables["params"]
            precision = ("bf16" if jnp.dtype(self.dtype) == jnp.bfloat16
                         else "f32x3")
            kw = dict(dtype=self.dtype, precision=precision,
                      interpret=interp)
            if s1.ndim == 4:
                # leading depth-block axis: unrolled kernel calls (the
                # kernel is per-image; n is a small static block count)
                outs = [fn(params, cost[i], s1[i], s2[i],
                           s3[i], s4[i], **kw)
                        for i in range(s1.shape[0])]
                return tuple(jnp.stack([o[j] for o in outs])
                             for j in range(5))
            return fn(params, cost, s1, s2, s3, s4, **kw)

        # fallback: flax body on HWC layouts
        if s1.ndim == 4:
            perm_in, perm_out = (0, 2, 3, 1), (0, 3, 1, 2)
        else:
            perm_in, perm_out = (1, 2, 0), (2, 0, 1)
        outs = self._flax_body(cost, *(jnp.transpose(s, perm_in)
                                       for s in (s1, s2, s3, s4)))
        return (outs[0],) + tuple(jnp.transpose(s, perm_out)
                                  for s in outs[1:])

    def _flax_body(self, cost, s1, s2, s3, s4):
        b, dt = self.base, self.dtype
        neg = -cost
        d1 = ConvBlock(2 * b, stride=2, norm="none", dtype=dt, name="conv1")(neg)
        d2 = ConvBlock(4 * b, stride=2, norm="none", dtype=dt, name="conv2")(d1)
        d3 = ConvBlock(8 * b, stride=2, norm="none", dtype=dt, name="conv3")(d2)
        r4 = NormGRUCell(8 * b, dtype=dt, name="gru4")(d3, s4)
        u3 = DeconvBlock(4 * b, norm="none", dtype=dt, name="upconv3")(r4)
        r3 = NormGRUCell(4 * b, dtype=dt, name="gru3")(d2, s3)
        u2 = DeconvBlock(2 * b, norm="none", dtype=dt,
                         name="upconv2")(_crop_like(u3, r3) + r3)
        r2 = NormGRUCell(2 * b, dtype=dt, name="gru2")(d1, s2)
        u1 = DeconvBlock(b, norm="none", dtype=dt,
                         name="upconv1")(_crop_like(u2, r2) + r2)
        r1 = NormGRUCell(b, dtype=dt, name="gru1")(neg, s1)
        score = nn.Conv(1, (3, 3), padding="SAME", dtype=dt,
                        name="out2d")(_crop_like(u1, r1) + r1)
        return score[..., 0], r1, r2, r3, r4

    def init_states(self, H: int, W: int):
        b = self.base
        if self.impl == "pallas":
            return (
                jnp.zeros((b, H, W), self.dtype),
                jnp.zeros((2 * b, H // 2, W // 2), self.dtype),
                jnp.zeros((4 * b, H // 4, W // 4), self.dtype),
                jnp.zeros((8 * b, H // 8, W // 8), self.dtype),
            )
        return (
            jnp.zeros((H, W, b), self.dtype),
            jnp.zeros((H // 2, W // 2, 2 * b), self.dtype),
            jnp.zeros((H // 4, W // 4, 4 * b), self.dtype),
            jnp.zeros((H // 8, W // 8, 8 * b), self.dtype),
        )
