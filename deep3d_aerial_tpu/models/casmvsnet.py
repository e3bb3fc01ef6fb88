"""Cascade MVSNet — feedforward coarse-to-fine plane-sweep network.

TPU-native redesign of the reference Infer_CascadeMVSNet
(/root/reference/mvs/mvs_cas/models/cas_mvsnet.py:140-240): FPN features,
variance cost volume, 3D-CNN hourglass regularizer, soft-argmax depth with
4-window probability confidence, 3 stages with interval ratios (4, 2, 1).

Differences from the reference (deliberate):
  * NHWC layout, GroupNorm instead of BatchNorm (train == eval behavior)
  * depth hypotheses are generated directly at each stage's resolution
    instead of full-res + trilinear downsample (same information, no
    wasted interpolation)
  * unbatched call ([V, H, W, 3]); batch via vmap / shard_map.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.depth_samplers import (
    resize_bilinear,
    uniform_depth_samples,
    window_depth_samples,
)
from .cascade import (
    blocked_volume_scores,
    masked_softmax_depth_head,
    window_confidence,
)
from .cost_reg import CostRegNet3D
from .feature_net import FeatureNet


class CasMVSNet(nn.Module):
    ndepths: Tuple[int, ...] = (48, 32, 8)
    depth_interval_ratios: Tuple[float, ...] = (4.0, 2.0, 1.0)
    num_depth: int = 384
    base_channels: int = 8
    arch: str = "fpn"
    norm: str = "group"
    dtype: Any = jnp.float32
    depth_shards: int = 1  # 'sp' depth blocking; see cascade.blocked_volume_scores
    # 'pallas': variance volume built by the fused sweep kernel
    # (cascade._variance_volume_pallas); 'xla': gather path / oracle
    warp_impl: str = "xla"

    @nn.compact
    def __call__(self, imgs, rel_projs, depth_min, depth_max):
        """imgs [V, H, W, 3]; rel_projs [3, V-1, 4, 4] per-stage src-vs-ref
        transforms (geometry.camera.stage_relative_projections, float64 host
        precompute); scalar depth range."""
        VmapFeature = nn.vmap(
            FeatureNet,
            in_axes=0, out_axes=0,
            variable_axes={"params": None},
            split_rngs={"params": False},
        )
        stage_feats = VmapFeature(
            base_channels=self.base_channels, arch=self.arch,
            norm=self.norm, dtype=self.dtype, name="feature",
        )(imgs)  # tuple of [V, h, w, c] per stage

        interval = (depth_max - depth_min) / self.num_depth
        depth = None
        conf = None
        outputs = {}
        for s in range(len(self.ndepths)):
            feats = stage_feats[s]
            H, W = feats.shape[1:3]
            if depth is None:
                depths = uniform_depth_samples(depth_min, depth_max, self.ndepths[s])
            else:
                center = resize_bilinear(depth, (H, W))
                depths = window_depth_samples(
                    center, self.ndepths[s],
                    self.depth_interval_ratios[s] * interval,
                )
            scores = blocked_volume_scores(
                CostRegNet3D, {"norm": self.norm, "dtype": self.dtype},
                f"cost_reg{s}", feats, rel_projs[s], depths,
                depth_shards=self.depth_shards, warp_impl=self.warp_impl,
            )
            prob, depth, _ = masked_softmax_depth_head(
                scores.astype(jnp.float32), depths
            )
            conf = window_confidence(prob)
            outputs[f"stage{s + 1}"] = {
                "depth": depth, "photometric_confidence": conf,
            }
        outputs["depth"] = depth
        outputs["photometric_confidence"] = conf
        return outputs
