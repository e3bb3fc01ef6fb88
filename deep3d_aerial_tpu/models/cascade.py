"""Shared cascade machinery: cost volumes, soft-argmax heads, streaming sweeps.

All functions are unbatched (one reference view); wrap with vmap/shard_map for
batching. Geometry stays float32; features may run in bfloat16.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.warp import plane_sweep_warp, plane_sweep_warp_single


def variance_cost_volume(
    feats: jnp.ndarray, rel: jnp.ndarray, depths: jnp.ndarray,
    warp_impl: str = "xla",
) -> jnp.ndarray:
    """Variance cost volume over views (MVSNet aggregation).

    feats  [V, H, W, C], rel [V-1, 4, 4] (src_P @ inv(ref_P), host-precomputed
    in float64 — geometry.camera.relative_projections), depths [D] or
    [D, H, W] -> [D, H, W, C] = E[f^2] - E[f]^2 over the V warped features
    (reference cas_mvsnet.py:45-60).

    warp_impl='pallas' builds the volume in 8-plane chunks through the
    fused sweep kernel (mode='variance', prepared operands, custom VJP;
    the casmvsnet/ucsnet analog of the AdaMVS streaming kernel path).

    The XLA path is built PLANE-BY-PLANE (lax.map over D): a full-volume
    warp materializes [D*H*W, C] gather buffers that XLA lane-pads 4x for
    C=32 (measured 18 GB at 768x1024 stage 1 — HBM OOM); per-plane gathers
    keep the live intermediates at [H*W, C].
    """
    rel = rel.astype(jnp.float32)
    ref = feats[0]

    if depths.ndim == 1:
        depths_hw = jnp.broadcast_to(
            depths[:, None, None], (depths.shape[0], *ref.shape[:2])
        )
    else:
        depths_hw = depths

    if warp_impl == "pallas" and _pallas_tile_ok(*ref.shape[:2]):
        return _variance_volume_pallas(feats, rel, depths_hw)

    # chunked: 8 planes per gather (big DMA batches; peak stays bounded)
    return jax.lax.map(
        lambda d: variance_cost_plane(ref, feats[1:], rel, d), depths_hw,
        batch_size=min(8, depths_hw.shape[0]),
    )


def _variance_volume_pallas(feats, rel, depths_hw):
    """[D, H, W, C] variance volume via the fused sweep kernel, 8-plane
    chunks under lax.map (a scan: the per-chunk coverage lax.cond stays a
    cond, unlike under vmap — docs/PERF.md). Operands prepared once
    outside the scan; gradients via the chunk custom VJP."""
    from ..ops.pallas_sweep import prepare_sweep_operands

    D, H, W = depths_hw.shape
    K = 8
    while D % K:
        K -= 1
    ops = prepare_sweep_operands(feats[0], feats[1:], None)
    chunks = depths_hw.reshape(D // K, K, H, W)
    vol = jax.lax.map(
        lambda dc: chunk_costs_prepared("variance", dc, ops, rel,
                                        feats.dtype),
        chunks,
    )
    return vol.reshape(D, H, W, feats.shape[-1])


def variance_cost_plane(
    ref_feat: jnp.ndarray,
    src_feats: jnp.ndarray,
    rel_projs: jnp.ndarray,
    depth_plane: jnp.ndarray,
) -> jnp.ndarray:
    """Single-plane variance cost [H, W, C] (streaming building block)."""
    V = src_feats.shape[0] + 1

    def warp_one(feat, r):
        return plane_sweep_warp_single(feat, r, depth_plane, ref_feat.shape[:2])

    warped = jax.vmap(warp_one)(src_feats, rel_projs)  # [V-1, H, W, C]
    vol_sum = ref_feat + warped.sum(0)
    vol_sq = ref_feat * ref_feat + (warped * warped).sum(0)
    mean = vol_sum / V
    return vol_sq / V - mean * mean


def correlation_cost_plane(
    ref_feat: jnp.ndarray,
    src_feats: jnp.ndarray,
    rel_projs: jnp.ndarray,
    depth_plane: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Product-correlation cost at one plane, optionally confidence-weighted.

    weights [V-1, H, W] (AdaMVS view weights); None -> plain mean over views.
    Returns [H, W, C] (reference adamvs.py:492-509).
    """
    def warp_one(feat, r):
        return plane_sweep_warp_single(feat, r, depth_plane, ref_feat.shape[:2])

    warped = jax.vmap(warp_one)(src_feats, rel_projs)  # [V-1, H, W, C]
    corr = warped * ref_feat[None]
    if weights is None:
        return corr.mean(0)
    w = weights[..., None]
    return (corr * w).sum(0) / (w.sum(0) + 1e-5)


def split_depth_blocks(depths: jnp.ndarray, depth_shards: int):
    """-> (n, depths or [n, D/n, ...] blocks); n = largest divisor of D
    not exceeding depth_shards."""
    D = depths.shape[0]
    n = max(1, int(depth_shards))
    while D % n:
        n -= 1
    if n == 1:
        return 1, depths
    return n, depths.reshape(n, D // n, *depths.shape[1:])


def blocked_volume_scores(
    reg_cls, reg_kwargs: dict, name: str,
    feats: jnp.ndarray, rel: jnp.ndarray, depths: jnp.ndarray,
    depth_shards: int = 1,
    warp_impl: str = "xla",
) -> jnp.ndarray:
    """Variance cost volume + 3D regularizer, optionally blocked along D
    for 'sp' sharding -> scores [D, H, W].

    With depth_shards = n > 1 the volume is built and regularized as n
    independent [D/n, H, W, C] blocks (shared regularizer params, block
    axis carrying the 'sp' sharding). Directly sharding the D axis of one
    volume through the strided 3D hourglass MISCOMPILES under the XLA SPMD
    partitioner (forward diff in f64; see parallel/context.py docstring) —
    blocked regularization has no cross-shard halos, at the cost of the
    regularizer not mixing information across block boundaries (deviation
    from the reference's full-volume regularization, exact when n=1).
    Param shapes are independent of n, so checkpoints port across shard
    counts.
    """
    from ..parallel.context import constrain

    n, blocks = split_depth_blocks(depths, depth_shards)
    if n == 1:
        return reg_cls(**reg_kwargs, name=name)(
            variance_cost_volume(feats, rel, depths, warp_impl=warp_impl)
        )
    # blocked ('sp') path: vmap over blocks would turn the kernel's
    # coverage cond into select-both-branches, so it stays on the gather
    # build (the sp axis is an inference-scaling path, not the single-chip
    # throughput path)
    vols = jax.vmap(
        lambda d: variance_cost_volume(feats, rel, d)
    )(blocks)
    vols = constrain(vols, "depth_shards")
    VReg = nn.vmap(
        reg_cls, in_axes=0, out_axes=0,
        variable_axes={"params": None}, split_rngs={"params": False},
    )
    scores = VReg(**reg_kwargs, name=name)(vols)
    scores = constrain(scores, "depth_shards")
    return scores.reshape(-1, *scores.shape[2:])


def soft_argmax_depth(prob: jnp.ndarray, depths: jnp.ndarray) -> jnp.ndarray:
    """Expected depth under prob [D, H, W]; depths [D] or [D, H, W]."""
    if depths.ndim == 1:
        depths = depths[:, None, None]
    return jnp.sum(prob * depths, axis=0)


def window_confidence(prob: jnp.ndarray, window: int = 4) -> jnp.ndarray:
    """Sum of `window` consecutive probabilities around the expected index.

    Matches the reference confidence head (cas_mvsnet.py:72-76): prob volume
    padded (1 front, 2 back) in D, 4-tap sliding sum, gathered at the
    rounded soft-argmax index.
    """
    D = prob.shape[0]
    padded = jnp.pad(prob, ((1, 2), (0, 0), (0, 0)))
    kernel = jnp.ones((window,), prob.dtype)
    summed = jax.vmap(
        lambda col: jnp.convolve(col, kernel, mode="valid"),
        in_axes=1, out_axes=1,
    )(padded.reshape(D + 3, -1)).reshape(D, *prob.shape[1:])
    idx = jnp.sum(prob * jnp.arange(D, dtype=prob.dtype)[:, None, None], axis=0)
    idx = jnp.clip(idx.astype(jnp.int32), 0, D - 1)
    return jnp.take_along_axis(summed, idx[None], axis=0)[0]


def masked_softmax_depth_head(
    scores: jnp.ndarray, depths: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """softmax over D -> (prob [D,H,W], depth [H,W], maxprob [H,W])."""
    prob = jax.nn.softmax(scores, axis=0)
    depth = soft_argmax_depth(prob, depths)
    return prob, depth, prob.max(axis=0)


def _pallas_interpret() -> bool:
    """CPU-test escape hatch: with PALLAS_INTERPRET=1 the fused kernels
    run in Pallas interpret mode, so tests exercise the EXACT production
    graph (prepared operands, channel-first handoff, coverage cond)
    off-chip."""
    return os.environ.get("PALLAS_INTERPRET", "0") == "1"


def _sweep_strict() -> bool:
    """SWEEP_STRICT=1 removes the in-graph XLA gather fallback from the
    kernel coverage cond and NaN-poisons the cost chunk if coverage ever
    fails (detectable host-side; re-run that map with warp_impl='xla').

    Why it exists: the fallback branch's gather buffers are lane-padded
    by XLA (C=8 -> 128, measured), so at the 1856x2752 production point
    the never-taken branch alone plans ~2.6 GB per [H, W, C] chunk and
    the whole-model compile exceeds HBM (39.2 G planned vs 15.75 G,
    round-3 full-res bench). Coverage at the production geometry is
    statically checked by scripts/check_coverage.py."""
    return os.environ.get("SWEEP_STRICT", "0") == "1"


def _pallas_tile_ok(H: int, W: int) -> bool:
    """Kernel applicability. Shape is no longer a gate: the sweep wrappers
    zero-pad any H, W to their tile/lane alignment internally (padded ref
    pixels masked, output cropped — ops/pallas_sweep), so the reference
    production widths 2752/1376/688 all take the kernel. Only the backend
    gate remains: the CPU backend (which cannot run Mosaic) silently gets
    the gather path — tests and multihost CPU workers never trip on
    pallas_call."""
    del H, W
    return jax.default_backend() != "cpu" or _pallas_interpret()


def _xla_chunk_costs(cost_mode, depth_chunk, ref_feat, src_feats, rel_projs,
                     weights):
    if cost_mode == "variance":
        out = jax.vmap(
            lambda d: variance_cost_plane(ref_feat, src_feats, rel_projs, d)
        )(depth_chunk)
    else:
        out = jax.vmap(
            lambda d: correlation_cost_plane(
                ref_feat, src_feats, rel_projs, d, weights)
        )(depth_chunk)
    # weight/variance math may promote bf16 features to f32; all paths
    # must agree with the feature dtype
    return out.astype(ref_feat.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _pallas_chunk_costs(cost_mode, depth_chunk, ref_feat, src_feats,
                        rel_projs, weights):
    """Differentiable fused-kernel cost build: FORWARD runs the Pallas
    sweep kernel (with coverage fallback), BACKWARD is the VJP of the
    mathematically-identical XLA gather formulation — pallas_call defines
    no autodiff rule, and the two compute the same function to <1e-5, so
    training gets the kernel's forward throughput with exact gradients."""
    from ..ops.pallas_sweep import sweep_cost_chunk_pallas

    mode = "variance" if cost_mode == "variance" else "corr"
    cost_p, covered = sweep_cost_chunk_pallas(
        ref_feat, src_feats, rel_projs, depth_chunk,
        weights=None if mode == "variance" else weights,
        mode=mode, interpret=_pallas_interpret(),
    )
    if _sweep_strict():
        # no in-graph fallback (its lane-padded gather buffers OOM the
        # full-res compile — see _sweep_strict); poison on coverage miss
        return jnp.where(covered, cost_p,
                         jnp.nan).astype(ref_feat.dtype)
    return jax.lax.cond(
        covered,
        lambda: cost_p.astype(ref_feat.dtype),
        lambda: _xla_chunk_costs(cost_mode, depth_chunk, ref_feat,
                                 src_feats, rel_projs, weights),
    )


def _pallas_chunk_costs_fwd(cost_mode, depth_chunk, ref_feat, src_feats,
                            rel_projs, weights):
    out = _pallas_chunk_costs(cost_mode, depth_chunk, ref_feat, src_feats,
                              rel_projs, weights)
    return out, (depth_chunk, ref_feat, src_feats, rel_projs, weights)


def _pallas_chunk_costs_bwd(cost_mode, res, g):
    depth_chunk, ref_feat, src_feats, rel_projs, weights = res
    _, vjp = jax.vjp(
        lambda d, rf, sf, rp, w: _xla_chunk_costs(cost_mode, d, rf, sf,
                                                  rp, w),
        depth_chunk, ref_feat, src_feats, rel_projs, weights,
    )
    return vjp(g)


_pallas_chunk_costs.defvjp(_pallas_chunk_costs_fwd, _pallas_chunk_costs_bwd)


def _xla_costs_from_prepared(cost_mode, img_hw, out_cf, depth_chunk,
                             ref_t, src_t, rels, wts):
    """XLA gather fallback on PREPARED operands (pallas_sweep.SweepOperands
    layouts), emitting the same layout as the kernel path: kchw at the
    padded buffer width (out_cf) or cropped khwc. Also the custom-VJP
    backward formulation — the transposes/crops are linear, so gradients
    through it are exact."""
    H, W = img_hw
    ref = jnp.transpose(ref_t, (1, 2, 0))[:H, :W]
    src = jnp.transpose(src_t, (0, 1, 3, 2))[:, :H, :W]
    out = _xla_chunk_costs(cost_mode, depth_chunk, ref, src, rels,
                           wts[:, :H, :W])  # [K, H, W, C]
    if not out_cf:
        return out
    Wp = src_t.shape[-1]
    out = jnp.transpose(out, (0, 3, 1, 2))
    if Wp > W:
        out = jnp.pad(out, ((0, 0), (0, 0), (0, 0), (0, Wp - W)))
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _pallas_chunk_costs_prepared(spec, depth_chunk, ref_t, src_t, rels, wts):
    """Fused-kernel cost build on prepared operands; spec is the static
    (cost_mode, img_hw, out_cf, dtype_name) tuple. Same forward-kernel /
    XLA-backward contract as _pallas_chunk_costs."""
    cost_mode, img_hw, out_cf, dtype_name = spec
    from ..ops.pallas_sweep import SweepOperands, sweep_cost_chunk_prepared

    ops = SweepOperands(ref_t, src_t, wts, img_hw)
    mode = "variance" if cost_mode == "variance" else "corr"
    cost_p, covered = sweep_cost_chunk_prepared(
        ops, rels, depth_chunk, mode=mode,
        out_layout="kchw" if out_cf else "khwc", keep_pad_w=out_cf,
        interpret=_pallas_interpret(),
    )
    dt = jnp.dtype(dtype_name)
    if _sweep_strict():
        return jnp.where(covered, cost_p, jnp.nan).astype(dt)
    return jax.lax.cond(
        covered,
        lambda: cost_p.astype(dt),
        lambda: _xla_costs_from_prepared(
            cost_mode, img_hw, out_cf, depth_chunk, ref_t, src_t, rels,
            wts).astype(dt),
    )


def _pcp_fwd(spec, depth_chunk, ref_t, src_t, rels, wts):
    out = _pallas_chunk_costs_prepared(spec, depth_chunk, ref_t, src_t,
                                       rels, wts)
    return out, (depth_chunk, ref_t, src_t, rels, wts)


def _pcp_bwd(spec, res, g):
    cost_mode, img_hw, out_cf, dtype_name = spec
    _, vjp = jax.vjp(
        lambda d, rt, st, rl, w: _xla_costs_from_prepared(
            cost_mode, img_hw, out_cf, d, rt, st, rl, w
        ).astype(jnp.dtype(dtype_name)),
        *res,
    )
    return vjp(g)


_pallas_chunk_costs_prepared.defvjp(_pcp_fwd, _pcp_bwd)


def chunk_costs_prepared(cost_mode, depth_chunk, ops, rels, dtype,
                         out_cf: bool = False) -> jnp.ndarray:
    """Kernel cost build over prepared operands -> [K, H, W, C] (or
    [K, C, H, Wpad] channel-first at the RedStep2 buffer width when
    out_cf — the zero-relayout kernel handoff, docs/PERF.md)."""
    spec = (cost_mode, tuple(ops.img_hw), bool(out_cf),
            jnp.dtype(dtype).name)
    return _pallas_chunk_costs_prepared(spec, depth_chunk, ops.ref_t,
                                        ops.src_t, rels, ops.weights)


def chunk_costs(
    cost_mode: str,
    depth_chunk: jnp.ndarray,   # [K, H, W]
    ref_feat: jnp.ndarray,
    src_feats: jnp.ndarray,
    rel_projs: jnp.ndarray,
    weights: jnp.ndarray,
    warp_impl: str = "xla",
    warp_precision: str = "f32x3",
) -> jnp.ndarray:
    """Cost volume for a chunk of planes -> [K, H, W, C].

    warp_impl='pallas' uses the fused MXU sweep kernel
    (ops/pallas_sweep.sweep_cost_chunk_pallas — measured 12-30x over the
    XLA gather on-chip) with a lax.cond fallback to the gather path when a
    tile footprint escapes the kernel's windows, and a custom VJP (the XLA
    formulation's gradient) so the flagship trains through it; 'xla' is
    the plain gather build (also the oracle)."""
    H, W = ref_feat.shape[:2]
    if warp_impl != "pallas" or not _pallas_tile_ok(H, W):
        return _xla_chunk_costs(cost_mode, depth_chunk, ref_feat, src_feats,
                                rel_projs, weights)
    return _pallas_chunk_costs(cost_mode, depth_chunk, ref_feat, src_feats,
                               rel_projs, weights)


class _ChunkSweepStep(nn.Module):
    """One CHUNK of depth planes of a streaming sweep: build the chunk's
    costs in a single batched warp (one large gather instead of K small
    ones — the TPU throughput lever, or the fused Pallas kernel), then
    fold K recurrent regularizer steps + online-softmax updates
    sequentially (numerics identical to the one-plane-at-a-time loop).

    depth_chunk may carry a leading BLOCK axis ([n, K, H, W] instead of
    [K, H, W]): all n depth blocks advance in lockstep, the regularizer
    runs BATCHED over the block axis (one n-batched conv dispatch per
    plane instead of n vmapped graphs — same math, n-fold larger MXU
    batches), and the cost build flattens blocks into one n*K-plane
    kernel call with a single coverage cond (a vmapped lax.cond would
    execute BOTH branches — docs/PERF.md).

    With `prepared`, the broadcast (ref_feat, src_feats, weights) args
    carry pallas_sweep.SweepOperands layouts (padded + pre-transposed
    ONCE outside the scan; img_hw holds the true size), and with `out_cf`
    the cost chunk flows channel-first at the RedStep2 kernel's buffer
    width — zero relayouts between the two kernels (docs/PERF.md)."""

    reg: nn.Module
    cost_mode: str  # 'variance' | 'correlation'
    up: bool
    warp_impl: str = "xla"
    prepared: bool = False
    out_cf: bool = False
    img_hw: Optional[Tuple[int, int]] = None

    @nn.compact
    def __call__(self, carry, depth_chunk, ref_feat, src_feats, rel_projs, weights):
        states, osm = carry
        batched = depth_chunk.ndim == 4
        if batched:
            n, K = depth_chunk.shape[:2]
            flat = depth_chunk.reshape(n * K, *depth_chunk.shape[2:])
        else:
            K = depth_chunk.shape[0]
            flat = depth_chunk
        if self.prepared:
            from ..ops.pallas_sweep import SweepOperands

            ops = SweepOperands(ref_feat, src_feats, weights, self.img_hw)
            costs = chunk_costs_prepared(
                self.cost_mode, flat, ops, rel_projs,
                getattr(self.reg, "dtype", jnp.float32), out_cf=self.out_cf,
            )
        else:
            costs = chunk_costs(
                self.cost_mode, flat, ref_feat, src_feats, rel_projs,
                weights, warp_impl=self.warp_impl,
            )
        if self.up:
            # integer-2x lerp on [K, H, W] directly — jax.image.resize's
            # dot_general lowering relayouts the plane stack (docs/PERF.md)
            from ..ops.resize import upsample_axis_lerp

            dvs = upsample_axis_lerp(upsample_axis_lerp(flat, 2, -2), 2, -1)
        else:
            dvs = flat
        if batched:
            costs = costs.reshape(n, K, *costs.shape[1:])
            dvs = dvs.reshape(n, K, *dvs.shape[1:])
        reg_kw = ({"cost_cf": True, "img_w": self.img_hw[1]}
                  if self.out_cf else {})
        for k in range(K):
            out = self.reg(costs[:, k] if batched else costs[k], *states,
                           **reg_kw)
            score, states = out[0], tuple(out[1:])
            osm = OnlineSoftmaxState.update(osm, score.astype(jnp.float32),
                                            dvs[:, k] if batched else dvs[k])
        return (states, osm), None


class _ShardSweep(nn.Module):
    """The chunked scan over ONE depth block -> raw OnlineSoftmaxState.

    vmapped over blocks (shared params) for depth sharding: each block's
    recurrence runs independently (blocked recurrence — the documented
    deviation from the reference's single sequential slice loop), and the
    blocks' softmax states merge exactly afterwards."""

    reg: nn.Module
    cost_mode: str
    up: bool
    plane_chunk: int
    warp_impl: str = "xla"
    prepared: bool = False
    out_cf: bool = False
    img_hw: Optional[Tuple[int, int]] = None

    @nn.compact
    def __call__(self, depths, ref_feat, src_feats, rel_projs, weights):
        """depths [D, H, W], or [n, D/n, H, W] for the batched-block
        ('sp') recurrence — n blocks advance in lockstep with the block
        axis as a conv batch dim (see _ChunkSweepStep). With `prepared`,
        (ref_feat, src_feats, weights) carry SweepOperands layouts and
        H, W come from img_hw."""
        H, W = self.img_hw if self.prepared else ref_feat.shape[:2]
        batched = depths.ndim == 4
        n = depths.shape[0] if batched else 1
        D = depths.shape[1] if batched else depths.shape[0]
        out_shape = (2 * H, 2 * W) if self.up else (H, W)
        osm0 = OnlineSoftmaxState.init((n, *out_shape) if batched
                                       else out_shape)
        base_states = self.reg.init_states(H, W)
        if batched:
            init_states = tuple(jnp.zeros((n, *s.shape), s.dtype)
                                for s in base_states)
        else:
            init_states = base_states

        # largest divisor of D not exceeding plane_chunk
        K = max(1, min(int(self.plane_chunk), D))
        while D % K:
            K -= 1
        if batched:
            # [steps, n, K, H, W]: scan steps outermost, blocks in lockstep
            chunks = depths.reshape(n, D // K, K, H, W).swapaxes(0, 1)
        else:
            chunks = depths.reshape(D // K, K, H, W)

        Scan = nn.scan(
            _ChunkSweepStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(0, nn.broadcast, nn.broadcast, nn.broadcast,
                     nn.broadcast),
            out_axes=0,
        )
        (_, osm), _ = Scan(reg=self.reg, cost_mode=self.cost_mode,
                           up=self.up, warp_impl=self.warp_impl,
                           prepared=self.prepared, out_cf=self.out_cf,
                           img_hw=self.img_hw)(
            (init_states, osm0), chunks, ref_feat, src_feats, rel_projs,
            weights,
        )
        return osm


def streaming_sweep(
    reg: nn.Module,
    cost_mode: str,
    up: bool,
    depths: jnp.ndarray,
    ref_feat: jnp.ndarray,
    src_feats: jnp.ndarray,
    rel_projs: jnp.ndarray,
    weights: Optional[jnp.ndarray],
    init_states: Tuple[jnp.ndarray, ...] = (),
    plane_chunk: int = 8,
    depth_shards: int = 1,
    warp_impl: str = "xla",
    feats_cf: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Chunked (and optionally depth-sharded) scan over depth planes with
    O(H*W) state -> (depth, confidence).

    The TPU equivalent of the reference's slice loops (adamvs.py:492-529,
    msrednet.py:400-438): GRU states + online exp-weighted soft-argmax carried
    across planes, never materializing a [D, H, W, C] volume. `plane_chunk`
    planes are processed per scan step — their warps batch into one gather
    and the K regularizer steps unroll (same numerics, far less loop
    overhead); the peak live warp buffer is [K, V-1, H, W, C].

    depth_shards = n > 1 splits D into n contiguous blocks scanned
    INDEPENDENTLY (vmapped, shared params) and merges their online-softmax
    states exactly afterwards. The block axis carries the 'sp' sharding
    under an active mesh (parallel.context) — the merge then compiles to a
    psum across depth shards. The computation is identical on 1 or n
    devices: blocking is part of the model spec, not the layout, so
    sharded-vs-single equivalence is exact. (Deviation from the reference:
    the GRU recurrence restarts at block boundaries; the softmax merge
    itself is exact — see docs/PERF.md.)
    """
    from ..parallel.context import constrain

    # feats_cf: ref_feat [C, H, W] / src_feats [V-1, C, H, W] channel-
    # first (feature_net.multi_view_features full-res layout): spatial
    # dims ride the (8, 128) tiling, so full-res feature maps store at 1x
    # instead of NHWC's 16-51x lane padding (the round-3 full-res OOM).
    # CF forces the prepared-operand kernel path (the layouts are the
    # kernel's own); the XLA gather path transposes back at entry (the
    # CPU/test path only).
    H, W = ref_feat.shape[-2:] if feats_cf else ref_feat.shape[:2]
    if feats_cf and not (warp_impl == "pallas" and _pallas_tile_ok(H, W)):
        ref_feat = jnp.transpose(ref_feat, (1, 2, 0))
        src_feats = jnp.transpose(src_feats, (0, 2, 3, 1))
        feats_cf = False
    D = depths.shape[0]
    if depths.ndim == 1:
        depths = jnp.broadcast_to(depths[:, None, None], (D, H, W))
    if weights is None:
        weights = jnp.ones((src_feats.shape[0], H, W), jnp.float32)

    # Optional A/B paths (measured NEGATIVE at 384x512 — docs/PERF.md
    # round-3 A/B: legacy 19.23, prepared 18.84, prepared+cf 17.40
    # maps/s — XLA already handles the in-loop transposes well, so both
    # stay OFF by default): SWEEP_PREPARED=1 pads + transposes the sweep
    # operands once outside the scan; SWEEP_CF=1 additionally hands costs
    # to the fused RedStep2 kernel channel-first at its buffer width.
    from .cost_reg import RedStep2

    prepared = (warp_impl == "pallas" and _pallas_tile_ok(H, W)
                and (feats_cf
                     or os.environ.get("SWEEP_PREPARED", "0") == "1"))
    # the channel-first handoff contract (cost_cf kwarg + pad_width
    # buffers) is a RedStep2-kernel convention; RedStep4 takes NHWC
    out_cf = (prepared and isinstance(reg, RedStep2)
              and getattr(reg, "impl", "flax") == "pallas"
              and os.environ.get("SWEEP_CF", "1") == "1")
    if prepared:
        from ..ops.pallas_sweep import (
            prepare_sweep_operands,
            prepare_sweep_operands_cf,
        )

        prep = prepare_sweep_operands_cf if feats_cf else prepare_sweep_operands
        ops = prep(ref_feat, src_feats, weights,
                   pad_to=256 if out_cf else 128)
        ref_arg, src_arg, w_arg = ops.ref_t, ops.src_t, ops.weights
        img_hw = ops.img_hw
    else:
        ref_arg, src_arg, w_arg = ref_feat, src_feats, weights
        img_hw = None

    n = max(1, int(depth_shards))
    while D % n:
        n -= 1
    if n == 1:
        osm = _ShardSweep(reg=reg, cost_mode=cost_mode, up=up,
                          plane_chunk=plane_chunk, warp_impl=warp_impl,
                          prepared=prepared, out_cf=out_cf, img_hw=img_hw)(
            depths, ref_arg, src_arg, rel_projs, w_arg)
        return OnlineSoftmaxState.finalize(osm)

    # batched-block path: the block axis rides through the regularizer as
    # a conv batch dim (n-fold larger dispatches) and through ONE fused
    # cost-kernel call per chunk — not nn.vmap, whose lax.cond lowering
    # executes both kernel and fallback branches (docs/PERF.md)
    blocks = constrain(depths.reshape(n, D // n, H, W), "depth_shards")
    osm_blocks = _ShardSweep(reg=reg, cost_mode=cost_mode, up=up,
                             plane_chunk=plane_chunk, warp_impl=warp_impl,
                             prepared=prepared, out_cf=out_cf,
                             img_hw=img_hw)(
        blocks, ref_arg, src_arg, rel_projs, w_arg)
    osm_blocks = tuple(constrain(s, "depth_shards") for s in osm_blocks)
    return OnlineSoftmaxState.finalize(
        OnlineSoftmaxState.merge_axis0(osm_blocks))


class OnlineSoftmaxState:
    """Numerically-stable online softmax accumulation over depth planes.

    Computes the same estimator as the reference's streaming loops
    (adamvs.py:514-529, msrednet.py:400-438):
        depth = sum_d exp(s_d) * depth_d / sum_d exp(s_d)
        conf  = max_d exp(s_d) / sum_d exp(s_d)
    but carries a running max so exp never overflows — the standard online
    softmax merge (also what a depth-sharded psum-merge uses in parallel/).
    """

    @staticmethod
    def init(shape, dtype=jnp.float32):
        return (
            jnp.full(shape, -jnp.inf, dtype),  # running max m
            jnp.zeros(shape, dtype),  # scaled exp sum
            jnp.zeros(shape, dtype),  # scaled depth accumulator
            jnp.zeros(shape, dtype),  # scaled max prob
        )

    @staticmethod
    def update(state, score, depth_value):
        m, s, acc, pmax = state
        m_new = jnp.maximum(m, score)
        scale = jnp.exp(m - m_new)
        e = jnp.exp(score - m_new)
        s = s * scale + e
        acc = acc * scale + e * depth_value
        pmax = jnp.maximum(pmax * scale, e)
        return (m_new, s, acc, pmax)

    @staticmethod
    def merge_axis0(states):
        """Exact merge of per-depth-block states stacked on axis 0 — the
        same algebra as `update`, applied across blocks. Under an 'sp'
        sharding of axis 0 this compiles to a pmax/psum across shards."""
        m, s, acc, pmax = states
        m_g = jnp.max(m, axis=0)
        scale = jnp.exp(m - m_g[None])
        # blocks that never saw a plane have m = -inf -> exp(-inf - m_g)
        scale = jnp.where(jnp.isfinite(m), scale, 0.0)
        return (
            m_g,
            jnp.sum(s * scale, axis=0),
            jnp.sum(acc * scale, axis=0),
            jnp.max(pmax * scale, axis=0),
        )

    @staticmethod
    def finalize(state):
        _, s, acc, pmax = state
        s = s + 1e-10
        return acc / s, pmax / s  # (depth, confidence)
