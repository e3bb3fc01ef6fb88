"""Multi-scale feature extractors (3-stage pyramids at 1/4, 1/2, 1/1 res).

Three architectures, matching the reference zoo:
  * 'fpn'    — FPN top-down merge (FeatureNet_mvsnet, module.py:653-755)
  * 'unet'   — deconv-fuse decoder (same class, arch_mode='unet')
  * 'branch' — UNet decoder + dual avg-pool context branches per stage
               (AdaMVS FeatureNet, adamvs.py:50-153)

Output channels per stage: [4b, 2b, b] with base b=8.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .blocks import ConvBlock, DeconvFuse, avgpool_branch, upsample_nearest2x


def _upsample2x_nearest(x):
    # repeats, not jax.image.resize — the resize lowering forces
    # channel-minor layouts at full res (see blocks._upsample_axis_lerp)
    return upsample_nearest2x(x)


class FeatureNet(nn.Module):
    base_channels: int = 8
    arch: str = "fpn"  # 'fpn' | 'unet' | 'branch'
    norm: str = "group"
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> Tuple[int, int, int]:
        b = self.base_channels
        return (4 * b, 2 * b, b)

    @nn.compact
    def __call__(self, x):
        """x: [H, W, 3] -> (stage1 [H/4,W/4,4b], stage2 [H/2,W/2,2b], stage3 [H,W,b])."""
        b = self.base_channels
        norm, dt = self.norm, self.dtype

        conv0 = ConvBlock(b, 3, norm=norm, dtype=dt)(x)
        conv0 = ConvBlock(b, 3, norm=norm, dtype=dt)(conv0)

        conv1 = ConvBlock(2 * b, 5, stride=2, norm=norm, dtype=dt)(conv0)
        conv1 = ConvBlock(2 * b, 3, norm=norm, dtype=dt)(conv1)
        conv1 = ConvBlock(2 * b, 3, norm=norm, dtype=dt)(conv1)

        conv2 = ConvBlock(4 * b, 5, stride=2, norm=norm, dtype=dt)(conv1)
        conv2 = ConvBlock(4 * b, 3, norm=norm, dtype=dt)(conv2)
        conv2 = ConvBlock(4 * b, 3, norm=norm, dtype=dt)(conv2)

        if self.arch == "fpn":
            s1 = nn.Conv(4 * b, (1, 1), use_bias=False, dtype=dt, name="out1")(conv2)
            intra = _upsample2x_nearest(conv2) + nn.Conv(
                4 * b, (1, 1), dtype=dt, name="inner1")(conv1)
            s2 = nn.Conv(2 * b, (3, 3), padding="SAME", use_bias=False, dtype=dt,
                         name="out2")(intra)
            intra = _upsample2x_nearest(intra) + nn.Conv(
                4 * b, (1, 1), dtype=dt, name="inner2")(conv0)
            s3 = nn.Conv(b, (3, 3), padding="SAME", use_bias=False, dtype=dt,
                         name="out3")(intra)
            return s1, s2, s3

        if self.arch == "unet":
            s1 = nn.Conv(4 * b, (1, 1), use_bias=False, dtype=dt, name="out1")(conv2)
            intra = DeconvFuse(2 * b, norm=norm, dtype=dt, name="deconv1")(conv1, conv2)
            s2 = nn.Conv(2 * b, (1, 1), use_bias=False, dtype=dt, name="out2")(intra)
            intra = DeconvFuse(b, norm=norm, dtype=dt, name="deconv2")(conv0, intra)
            s3 = nn.Conv(b, (1, 1), use_bias=False, dtype=dt, name="out3")(intra)
            return s1, s2, s3

        if self.arch == "branch":
            # stage1: context branches on conv2
            br1 = avgpool_branch(conv2, 4, 2 * b, norm, dt, "branch1_1")
            br2 = avgpool_branch(conv2, 8, 2 * b, norm, dt, "branch1_2")
            s1 = nn.Conv(4 * b, (1, 1), use_bias=False, dtype=dt, name="out1")(
                jnp.concatenate([br1, br2, conv2], axis=-1)
            )

            intra = DeconvFuse(2 * b, norm=norm, dtype=dt, name="deconv1")(conv1, conv2)
            br1 = avgpool_branch(intra, 4, b, norm, dt, "branch2_1")
            br2 = avgpool_branch(intra, 8, b, norm, dt, "branch2_2")
            s2 = nn.Conv(2 * b, (1, 1), use_bias=False, dtype=dt, name="out2")(
                jnp.concatenate([br1, br2, intra], axis=-1)
            )

            intra = DeconvFuse(b, norm=norm, dtype=dt, name="deconv2")(conv0, intra)
            br1 = avgpool_branch(intra, 4, b // 2, norm, dt, "branch3_1")
            br2 = avgpool_branch(intra, 8, b // 2, norm, dt, "branch3_2")
            s3 = nn.Conv(b, (1, 1), use_bias=False, dtype=dt, name="out3")(
                jnp.concatenate([br1, br2, intra], axis=-1)
            )
            return s1, s2, s3

        raise ValueError(f"unknown feature arch {self.arch!r}")


# Pixel-count threshold above which multi_view_features switches from
# nn.vmap to the per-view loop + channel-first stacks (full-res memory:
# see multi_view_features). 2^21 px keeps every <=1024x2048 point on the
# (cached, measured) vmap path; 1856x2752 = 5.1M px takes the loop.
import os as _os

FEATS_LOOP_THRESHOLD = int(_os.environ.get("FEATS_LOOP_THRESHOLD",
                                           str(2 ** 21)))


class ViewStack:
    """A logically-stacked [V, ...] view tensor kept as separate ref
    ([...]) and srcs ([V-1, ...]) arrays so downstream feats[0]/feats[1:]
    indexing costs no slice/relayout. Quacks like the stacked array for
    the access patterns the models use (shape, dtype, [0], [1:])."""

    __slots__ = ("ref", "srcs")

    def __init__(self, ref, srcs):
        self.ref = ref
        self.srcs = srcs

    @property
    def shape(self):
        return (self.srcs.shape[0] + 1,) + tuple(self.ref.shape)

    @property
    def dtype(self):
        return self.ref.dtype

    def __getitem__(self, idx):
        if isinstance(idx, int):
            if idx == 0:
                return self.ref
            return self.srcs[idx - 1]
        if idx == slice(1, None):
            return self.srcs
        raise TypeError(f"ViewStack supports [int] and [1:], got {idx!r}")


# pytree registration: ViewStacks ride through jit/vmap/custom_vjp (the
# pair branch's _pair_volumes_pallas takes the stage-1 stack as a
# custom_vjp argument)
jax.tree_util.register_pytree_node(
    ViewStack,
    lambda v: ((v.ref, v.srcs), None),
    lambda _, children: ViewStack(*children),
)


def multi_view_features(feature: FeatureNet, imgs):
    """Extract the 3-stage pyramid for every view.

    imgs [V, H, W, 3] -> ((s1, s2, s3), cf_flags): stage tensors stacked
    over views, cf_flags[s] saying whether stage s is CHANNEL-FIRST
    ([V, c, h, w]) instead of NHWC.

    Small frames (H*W < FEATS_LOOP_THRESHOLD): nn.vmap over views, all
    NHWC — the measured-fast path at the 384x512 bench point.

    Full-res frames: nn.vmap makes XLA tile the (view, channel) dims as
    (sublane, lane) on the stage-3 maps — 25-51x lane padding, 4 x 9.74 GB
    buffers at 1856x2752 (the round-3 full-res OOM). Instead the views
    run as an unrolled loop (shared params, identical tree to the vmap —
    checkpoints interchangeable), each view's NHWC working set is
    transient, and stages 2-3 are stacked CHANNEL-FIRST ([V, c, h, w]:
    spatial dims on the tiling, 1x padding) — also the sweep kernel's
    native operand layout (pallas_sweep.prepare_sweep_operands_cf).
    Stage 1 is 1/16 the pixels and feeds the NHWC pair branch, so it
    stays NHWC.
    """
    V, H, W = imgs.shape[:3]
    if H * W < FEATS_LOOP_THRESHOLD:
        Vmap = nn.vmap(
            lambda m, x: m(x),
            in_axes=0, out_axes=0,
            variable_axes={"params": None},
            split_rngs={"params": False},
        )
        # default ON: paired same-session A/B measured 19.58 vs 19.00
        # maps/s at the bench point (r5; the slice/relayout pair the
        # stacked output forces was ~2 ms/iter in the trace)
        if _os.environ.get("FEATS_SPLIT", "1") == "1":
            # A/B lever (r5 trace): the stacked [V,H,W,C] output forces a
            # feats[1:]/feats[0] slice + relayout pair downstream
            # (slice.21339/21340 + copy.6001-class, ~2 ms/iter at the
            # bench point). Running ref un-vmapped + srcs vmapped never
            # materializes the stack; ViewStack keeps the [0]/[1:]
            # consumer indexing. Same module instance twice -> shared
            # params, identical tree to the vmap path (checkpoints
            # interchangeable).
            ref_stages = feature(imgs[0])
            src_stages = Vmap(feature, imgs[1:])
            return tuple(
                ViewStack(r, s) for r, s in zip(ref_stages, src_stages)
            ), (False, False, False)
        return Vmap(feature, imgs), (False, False, False)

    per_view = [feature(imgs[v]) for v in range(V)]
    s1 = jnp.stack([f[0] for f in per_view])
    s2 = jnp.stack([jnp.transpose(f[1], (2, 0, 1)) for f in per_view])
    s3 = jnp.stack([jnp.transpose(f[2], (2, 0, 1)) for f in per_view])
    return (s1, s2, s3), (False, True, True)
