"""AdaMVS — adaptive-aggregation cascade MVS (the pipeline's default model).

Redesign of the reference (/root/reference/mvs/mvs_cas/models/adamvs.py):

  * context-branch feature pyramid (FeatureNet 'branch', adamvs.py:50-153)
  * stage 1: per-source-view product-correlation score volumes regularized by
    a 2D hourglass (CostRegNet2D) -> per-view depth + confidence, which become
    the fixed view weights for all later aggregation (adamvs.py:466-489)
  * every stage: confidence-weighted correlation cost streamed one depth plane
    at a time through a 2-level ConvGRU regularizer with online exp-weighted
    soft-argmax (adamvs.py:492-529) — here a single `lax.scan`
    (cascade.streaming_sweep) with a numerically-stable running max
  * stages 1-2 emit depth at 2x their feature resolution (the regularizer's
    transposed conv does the upsampling); stage 3 at full resolution.
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
from ..ops.warp import plane_sweep_warp_single
from .cascade import streaming_sweep
from .cost_reg import CostRegNet2D, RedStep2
from .feature_net import FeatureNet, multi_view_features


def _pair_volumes_xla(f1, rel1, d_hw):
    """XLA gather formulation [V-1, D, H1, W1] — the fallback path AND
    the kernel path's custom-VJP backward."""
    H1, W1 = f1.shape[1:3]
    D = d_hw.shape[0]

    def one_view(src_feat, rel):
        def corr_plane(d):
            w = plane_sweep_warp_single(src_feat, rel, d, (H1, W1))
            return (w * f1[0]).mean(-1)
        # 8 planes per gather batch; a full-volume warp lane-pads 4x
        return jax.lax.map(corr_plane, d_hw, batch_size=min(8, D))

    return jax.vmap(one_view)(f1[1:], rel1).astype(f1.dtype)


@jax.custom_vjp
def _pair_volumes_pallas(f1, rel1, d_hw):
    """Kernel forward / XLA backward (pallas_call defines no autodiff
    rule; the two formulations agree to <1e-5 — same contract as
    cascade._pallas_chunk_costs). Required for TS_WARP=pallas training:
    without the custom VJP, differentiating the pair branch raises
    NotImplementedError from the pallas JVP rule."""
    from ..ops.pallas_sweep import sweep_corr_chunk_pallas
    from .cascade import _pallas_interpret, _sweep_strict

    D, H1, W1 = d_hw.shape
    K = 8
    while D % K:
        K -= 1
    chunks = d_hw.reshape(D // K, K, H1, W1)
    vols, covs = [], []
    for v in range(f1.shape[0] - 1):
        corr_v, cov_v = jax.lax.map(
            lambda dc, _v=v: sweep_corr_chunk_pallas(
                f1[0], f1[1 + _v], rel1[_v], dc,
                interpret=_pallas_interpret()),
            chunks,
        )
        vols.append(corr_v.reshape(D, H1, W1))
        covs.append(jnp.all(cov_v))
    covered = jnp.all(jnp.stack(covs))
    pallas_vol = jnp.stack(vols)
    if _sweep_strict():
        return jnp.where(covered, pallas_vol, jnp.nan).astype(f1.dtype)
    return jax.lax.cond(
        covered, lambda: pallas_vol.astype(f1.dtype),
        lambda: _pair_volumes_xla(f1, rel1, d_hw))


def _pair_volumes_fwd(f1, rel1, d_hw):
    return _pair_volumes_pallas(f1, rel1, d_hw), (f1, rel1, d_hw)


def _pair_volumes_bwd(res, g):
    _, vjp = jax.vjp(_pair_volumes_xla, *res)
    return vjp(g)


_pair_volumes_pallas.defvjp(_pair_volumes_fwd, _pair_volumes_bwd)


def pair_corr_volumes(
    f1: jnp.ndarray,       # [V, H1, W1, C] stage-1 features
    rel1: jnp.ndarray,     # [V-1, 4, 4]
    depths1: jnp.ndarray,  # [D]
    warp_impl: str = "xla",
) -> jnp.ndarray:
    """Per-source-view product-correlation volumes [V-1, D, H1, W1].

    'pallas' uses the fused sweep kernel per (view, plane-chunk) with a
    whole-branch lax.cond fallback to the gather build when any chunk's
    footprint escapes its windows, and the XLA formulation's gradient
    (custom VJP) so training runs through the kernel forward."""
    from .cascade import _pallas_tile_ok

    H1, W1 = f1.shape[1:3]
    D = depths1.shape[0]
    d_hw = jnp.broadcast_to(depths1[:, None, None], (D, H1, W1))

    if warp_impl != "pallas" or not _pallas_tile_ok(H1, W1):
        return _pair_volumes_xla(f1, rel1, d_hw)
    # (tile_ok already excludes the CPU backend)
    return _pair_volumes_pallas(f1, rel1, d_hw)


class _PairBranch(nn.Module):
    """Per-source-view matching head: 2D hourglass over a precomputed
    correlation volume -> (confidence, pair depth) at stage-1 resolution
    (adamvs.py:466-489; the volume build is pair_corr_volumes)."""

    norm: str = "group"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, corr, depths1):
        scores = CostRegNet2D(norm=self.norm, dtype=self.dtype, name="reg")(
            jnp.transpose(corr, (1, 2, 0)).astype(self.dtype)
        )  # [H, W, D]
        prob = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        conf = prob.max(-1)
        pair_depth = jnp.sum(prob * depths1[None, None, :], axis=-1)
        return conf, pair_depth


class AdaMVS(nn.Module):
    ndepths: Tuple[int, ...] = (48, 32, 8)
    depth_interval_ratios: Tuple[float, ...] = (4.0, 2.0, 1.0)
    num_depth: int = 384
    base_channels: int = 8
    norm: str = "group"
    dtype: Any = jnp.float32
    # depth ('sp') sharding: split each stage's hypotheses into this many
    # independently-scanned blocks merged by exact online-softmax algebra
    # (cascade.streaming_sweep) — identical math on 1 or n devices
    depth_shards: int = 1
    plane_chunk: int = 8
    # 'xla' (gather build, exact oracle) | 'pallas' (fused MXU sweep
    # kernel, ops/pallas_sweep; lax.cond fallback on window overflow)
    warp_impl: str = "xla"
    # 'flax' | 'pallas': recurrent regularizer implementation — 'pallas'
    # fuses the whole RedStep2 into one Mosaic program per plane
    # (ops/pallas_red) with per-stage shape gating + flax fallback
    red_impl: str = "flax"

    @nn.compact
    def __call__(self, imgs, rel_projs, depth_min, depth_max):
        """imgs [V, H, W, 3]; rel_projs [3, V-1, 4, 4] per-stage src-vs-ref
        transforms (host float64 precompute); scalar depth range."""
        stage_feats, stage_cf = multi_view_features(
            FeatureNet(base_channels=self.base_channels, arch="branch",
                       norm=self.norm, dtype=self.dtype, name="feature"),
            imgs)

        interval = (depth_max - depth_min) / self.num_depth

        # ---- stage 1: per-view matching -> view weights -------------------
        f1 = stage_feats[0]  # [V, H/4, W/4, 4b]
        H1, W1 = f1.shape[1:3]
        rel1 = rel_projs[0].astype(jnp.float32)
        depths1 = uniform_depth_samples(depth_min, depth_max, self.ndepths[0])

        pair_corrs = pair_corr_volumes(
            f1, rel1, depths1, warp_impl=self.warp_impl
        )  # [V-1, D, H1, W1]
        # one vmapped pair branch over source views (shared params) —
        # unrolling V-1 copies of the 2D hourglass multiplies compile time
        VmapPair = nn.vmap(
            _PairBranch,
            in_axes=(0, None),
            out_axes=0,
            variable_axes={"params": None},
            split_rngs={"params": False},
        )
        view_weights, pair_depths = VmapPair(
            norm=self.norm, dtype=self.dtype, name="pair_reg",
        )(pair_corrs, depths1)
        # view_weights [V-1, H1, W1] are the fixed aggregation weights for
        # all stages (reference reuses stage-1 pair confs, adamvs.py:291-302)

        # ---- streaming cascade -------------------------------------------
        depth = None
        conf = None
        outputs = {}
        for s in range(len(self.ndepths)):
            feats = stage_feats[s]
            cf = stage_cf[s]
            H, W = feats.shape[-2:] if cf else feats.shape[1:3]
            up = s < len(self.ndepths) - 1
            if depth is None:
                depths = uniform_depth_samples(depth_min, depth_max, self.ndepths[s])
            else:
                center = resize_bilinear(depth, (H, W))
                depths = window_depth_samples(
                    center, self.ndepths[s],
                    self.depth_interval_ratios[s] * interval,
                )
            weights = jax.vmap(lambda w: resize_bilinear(w, (H, W)))(view_weights)
            reg = RedStep2(up=up, dtype=self.dtype, impl=self.red_impl,
                           name=f"red{s}")
            depth, conf = streaming_sweep(
                reg=reg, cost_mode="correlation", up=up,
                depths=depths,
                ref_feat=feats[0],
                src_feats=feats[1:],
                rel_projs=rel_projs[s].astype(jnp.float32),
                weights=weights,
                plane_chunk=self.plane_chunk,
                depth_shards=self.depth_shards,
                warp_impl=self.warp_impl,
                feats_cf=cf,
            )
            outputs[f"stage{s + 1}"] = {
                "depth": depth, "photometric_confidence": conf,
            }
            if s == 0:
                outputs["stage1"]["pair_results"] = pair_depths
                outputs["stage1"]["pair_confidence"] = view_weights

        outputs["depth"] = depth
        outputs["photometric_confidence"] = conf
        return outputs
