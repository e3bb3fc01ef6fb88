"""UCSNet — uncertainty-aware cascade MVS.

Redesign of the reference (/root/reference/mvs/mvs_cas/models/ucsnet.py):
stage-k hypothesis window = depth ± lambda * sigma where sigma is the
probability-weighted depth standard deviation of the previous stage
(uncertainty_aware_samples :30, variance :148-150, lambda = 1.5).
Same cost volume / 3D regularizer family as CasMVSNet.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.depth_samplers import (
    resize_bilinear,
    uniform_depth_samples,
    variance_depth_samples,
)
from .cascade import (
    blocked_volume_scores,
    masked_softmax_depth_head,
    soft_argmax_depth,
    window_confidence,
)
from .cost_reg import CostRegNet3D
from .feature_net import FeatureNet


class UCSNet(nn.Module):
    ndepths: Tuple[int, ...] = (64, 32, 8)
    lamb: float = 1.5
    num_depth: int = 384
    base_channels: int = 8
    arch: str = "unet"
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
        )(imgs)

        depth = None
        sigma = None
        conf = None
        outputs = {}
        for s in range(len(self.ndepths)):
            feats = stage_feats[s]
            H, W = feats.shape[1:3]
            if depth is None:
                depths = uniform_depth_samples(depth_min, depth_max, self.ndepths[s])
            else:
                center = resize_bilinear(depth, (H, W))
                spread = resize_bilinear(sigma, (H, W))
                depths = variance_depth_samples(
                    center, spread, self.ndepths[s], self.lamb
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

            d_expand = depths if depths.ndim == 3 else depths[:, None, None]
            var = soft_argmax_depth(prob, (d_expand - depth[None]) ** 2)
            sigma = jnp.sqrt(jnp.maximum(var, 1e-10))

            outputs[f"stage{s + 1}"] = {
                "depth": depth, "photometric_confidence": conf,
                "variance": sigma,
            }
        outputs["depth"] = depth
        outputs["photometric_confidence"] = conf
        return outputs
