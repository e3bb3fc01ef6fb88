"""MSREDNet — cascade recurrent encoder-decoder MVS (RED-Net family).

Redesign of the reference (/root/reference/mvs/mvs_cas/models/msrednet.py):
per-depth-plane variance cost regularized by a 4-level ConvGRU
encoder-decoder (slice_RED_Regularization :337-372), with the exp-weighted
online depth accumulation of the streaming inference path (:373-438) —
expressed here as one `lax.scan` over depth planes (cascade.streaming_sweep),
so the same graph serves train and inference with O(H*W) memory.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.depth_samplers import (
    resize_bilinear,
    uniform_depth_samples,
    window_depth_samples,
)
from .cascade import streaming_sweep
from .cost_reg import RedStep4
from .feature_net import FeatureNet, multi_view_features


class MSREDNet(nn.Module):
    ndepths: Tuple[int, ...] = (48, 32, 8)
    depth_interval_ratios: Tuple[float, ...] = (4.0, 2.0, 1.0)
    num_depth: int = 384
    base_channels: int = 8
    arch: str = "unet"
    norm: str = "group"
    dtype: Any = jnp.float32
    depth_shards: int = 1  # see AdaMVS.depth_shards
    plane_chunk: int = 8
    warp_impl: str = "xla"  # see AdaMVS.warp_impl
    red_impl: str = "flax"  # 'pallas' = fused whole-plane RedStep4 kernel
                            # (ops/pallas_red4), flax fallback off-tier

    @nn.compact
    def __call__(self, imgs, rel_projs, depth_min, depth_max):
        """imgs [V, H, W, 3]; rel_projs [3, V-1, 4, 4] per-stage src-vs-ref
        transforms (host float64 precompute); scalar depth range."""
        stage_feats, stage_cf = multi_view_features(
            FeatureNet(base_channels=self.base_channels, arch=self.arch,
                       norm=self.norm, dtype=self.dtype, name="feature"),
            imgs)

        interval = (depth_max - depth_min) / self.num_depth
        depth = None
        conf = None
        outputs = {}
        for s in range(len(self.ndepths)):
            feats = stage_feats[s]
            cf = stage_cf[s]
            H, W = feats.shape[-2:] if cf else feats.shape[1:3]
            if depth is None:
                depths = uniform_depth_samples(depth_min, depth_max, self.ndepths[s])
            else:
                center = resize_bilinear(depth, (H, W))
                depths = window_depth_samples(
                    center, self.ndepths[s],
                    self.depth_interval_ratios[s] * interval,
                )
            reg = RedStep4(dtype=self.dtype, impl=self.red_impl,
                           name=f"red{s}")
            depth, conf = streaming_sweep(
                reg=reg, cost_mode="variance", up=False,
                depths=depths,
                ref_feat=feats[0],
                src_feats=feats[1:],
                rel_projs=rel_projs[s].astype(jnp.float32),
                weights=None,
                plane_chunk=self.plane_chunk,
                depth_shards=self.depth_shards,
                warp_impl=self.warp_impl,
                feats_cf=cf,
            )
            outputs[f"stage{s + 1}"] = {
                "depth": depth, "photometric_confidence": conf,
            }
        outputs["depth"] = depth
        outputs["photometric_confidence"] = conf
        return outputs
