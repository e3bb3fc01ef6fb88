"""Tests for the separable one-hot plane-sweep kernel (ops/pallas_sweep).

Runs in interpret mode on CPU; the real-Mosaic compile check happens on
the chip (scripts/microbench.py / bench.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep3d_aerial_tpu.geometry.camera import proj_matrix
from deep3d_aerial_tpu.ops.pallas_sweep import (
    chunk_origins_and_coverage,
    sweep_corr_chunk_pallas,
    sweep_corr_chunk_reference,
)
from deep3d_aerial_tpu.ops.warp import relative_projection
from tests.conftest import random_pose, toy_camera

H, W, C, K = 32, 128, 8, 4


def scene_rel(rng, baseline=6.0, tilt=0.03):
    """An MVS-like stereo pair: strong overlap, small relative rotation
    (real view pairs are selected for exactly this; wild relative poses are
    the fallback path's job — see test_coverage_flag_trips_on_wild_geometry)."""
    from deep3d_aerial_tpu.geometry.camera import Pose

    cam = toy_camera(width=W, height=H, f=110.0)
    R_down = np.array([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]])
    ref_pose = Pose(R_down, -R_down @ np.array([0.0, 0.0, 100.0]))
    a = tilt * rng.standard_normal()
    R_jit = np.array(
        [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1.0]]
    )
    R_src = R_jit @ R_down
    c_src = np.array([baseline * rng.uniform(0.5, 1.0),
                      baseline * rng.uniform(-0.5, 0.5), 100.0])
    src_pose = Pose(R_src, -R_src @ c_src)
    ref_P = proj_matrix(cam.K, ref_pose)
    src_P = proj_matrix(cam.K, src_pose)
    return np.asarray(
        relative_projection(jnp.asarray(src_P), jnp.asarray(ref_P))
    )


def test_sweep_corr_matches_oracle(rng):
    rel = scene_rel(rng)
    ref = jnp.asarray(rng.standard_normal((H, W, C)), jnp.float32)
    src = jnp.asarray(rng.standard_normal((H, W, C)), jnp.float32)
    depths = jnp.broadcast_to(
        jnp.linspace(98.0, 102.0, K)[:, None, None], (K, H, W)
    )

    corr, covered = sweep_corr_chunk_pallas(
        ref, src, rel, depths, tile=(8, 128), window=(32, 128),
        interpret=True,
    )
    assert bool(covered), "toy geometry should be fully covered"
    oracle = sweep_corr_chunk_reference(ref, src, rel, depths)
    np.testing.assert_allclose(
        np.asarray(corr), np.asarray(oracle), rtol=2e-3, atol=1e-4
    )


def test_sweep_corr_per_pixel_depths(rng):
    """Refinement-style per-pixel depth windows (the kernel's target case)."""
    rel = scene_rel(rng)
    ref = jnp.asarray(rng.standard_normal((H, W, C)), jnp.float32)
    src = jnp.asarray(rng.standard_normal((H, W, C)), jnp.float32)
    base = 100.0 + 2.0 * jnp.sin(
        jnp.arange(H)[:, None] * 0.2 + jnp.arange(W)[None, :] * 0.1
    )
    offs = jnp.linspace(-1.0, 1.0, K)[:, None, None]
    depths = (base[None] + offs).astype(jnp.float32)

    corr, covered = sweep_corr_chunk_pallas(
        ref, src, rel, depths, tile=(8, 128), window=(32, 128),
        interpret=True,
    )
    assert bool(covered)
    oracle = sweep_corr_chunk_reference(ref, src, rel, depths)
    np.testing.assert_allclose(
        np.asarray(corr), np.asarray(oracle), rtol=2e-3, atol=1e-4
    )


def test_coverage_flag_trips_on_wild_geometry(rng):
    """Strongly rotated relative poses (steep epipolar y-variation) cannot
    fit the NR-row taps; the flag must say so instead of silently zeroing."""
    cam = toy_camera(width=W, height=H, f=110.0)
    ref_P = proj_matrix(cam.K, random_pose(rng))
    src_P = proj_matrix(cam.K, random_pose(rng))
    rel = np.asarray(
        relative_projection(jnp.asarray(src_P), jnp.asarray(ref_P))
    )
    depths = jnp.broadcast_to(
        jnp.linspace(20.0, 500.0, 8)[:, None, None], (8, H, W)
    )
    _, covered = chunk_origins_and_coverage(
        jnp.asarray(rel, jnp.float32).reshape(-1)[:12], depths,
        H, W, 8, 128, 32, 128, 4,
    )
    assert not bool(covered)


def test_zero_padding_semantics(rng):
    """Pixels projecting outside the source image must be exactly zero,
    matching grid_sample 'zeros' (via the oracle)."""
    rel = scene_rel(rng)
    ref = jnp.ones((H, W, C), jnp.float32)
    src = jnp.ones((H, W, C), jnp.float32)
    depths = jnp.broadcast_to(
        jnp.linspace(95.0, 105.0, K)[:, None, None], (K, H, W)
    )
    corr, covered = sweep_corr_chunk_pallas(
        ref, src, rel, depths, tile=(8, 128), window=(32, 128),
        interpret=True,
    )
    oracle = sweep_corr_chunk_reference(ref, src, rel, depths)
    if bool(covered):
        np.testing.assert_allclose(
            np.asarray(corr), np.asarray(oracle), rtol=2e-3, atol=1e-4
        )
    # out-of-image zeros agree wherever oracle is exactly 0
    zero_mask = np.asarray(oracle) == 0.0
    assert np.all(np.abs(np.asarray(corr)[zero_mask]) < 1e-6)


# ---------------------------------------------------------------------------
# multi-view fused cost kernel (corr / variance), padded unaligned shapes
# ---------------------------------------------------------------------------

from deep3d_aerial_tpu.models.cascade import _xla_chunk_costs
from deep3d_aerial_tpu.ops.pallas_sweep import sweep_cost_chunk_pallas


def _mv_scene(rng, H_, W_, V=3, C_=8, K_=4):
    from deep3d_aerial_tpu.geometry.camera import Pose

    cam = toy_camera(width=W_, height=H_, f=110.0)
    R_down = np.array([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]])
    ref_pose = Pose(R_down, -R_down @ np.array([0.0, 0.0, 100.0]))
    ref_P = proj_matrix(cam.K, ref_pose)
    rels = []
    for _ in range(V - 1):
        c = np.array([4.0 * rng.uniform(0.5, 1.0),
                      4.0 * rng.uniform(-0.5, 0.5), 100.0])
        pose = Pose(R_down, -R_down @ c)
        rels.append(np.asarray(relative_projection(
            jnp.asarray(proj_matrix(cam.K, pose)), jnp.asarray(ref_P))))
    ref = jnp.asarray(rng.standard_normal((H_, W_, C_)), jnp.float32)
    srcs = jnp.asarray(rng.standard_normal((V - 1, H_, W_, C_)), jnp.float32)
    depths = jnp.broadcast_to(
        jnp.linspace(98.0, 102.0, K_)[:, None, None], (K_, H_, W_))
    weights = jnp.asarray(
        rng.uniform(0.1, 1.0, size=(V - 1, H_, W_)), jnp.float32)
    return ref, srcs, jnp.asarray(np.stack(rels), jnp.float32), depths, weights


@pytest.mark.parametrize("mode", ["corr", "variance"])
@pytest.mark.parametrize("shape", [(32, 128), (24, 192), (20, 150)])
def test_cost_chunk_matches_oracle_padded(rng, mode, shape):
    """The fused all-view kernel matches the XLA gather oracle at aligned
    AND unaligned shapes (W=192 has the production 2752%128=64 residue;
    (20,150) pads both axes). Padded ref pixels are masked, output cropped."""
    H_, W_ = shape
    ref, srcs, rels, depths, weights = _mv_scene(rng, H_, W_)
    cost, covered = sweep_cost_chunk_pallas(
        ref, srcs, rels, depths,
        weights=weights if mode == "corr" else None,
        mode=mode, interpret=True,
    )
    assert bool(covered), "toy geometry should be fully covered"
    oracle = _xla_chunk_costs(
        "variance" if mode == "variance" else "correlation",
        depths, ref, srcs, rels, weights)
    assert cost.shape == oracle.shape == (depths.shape[0], H_, W_, 8)
    np.testing.assert_allclose(
        np.asarray(cost), np.asarray(oracle), rtol=2e-3, atol=1e-4)


def test_cost_chunk_kchw_layout_and_pad_zero(rng):
    """kchw == khwc.transpose; keep_pad_w pad columns are EXACTLY zero
    (the channel-first RedStep2 handoff relies on it); unknown layouts
    raise."""
    H_, W_ = 16, 160
    ref, srcs, rels, depths, weights = _mv_scene(rng, H_, W_)
    khwc, cov1 = sweep_cost_chunk_pallas(
        ref, srcs, rels, depths, weights=weights, mode="corr",
        interpret=True, out_layout="khwc")
    kchw, cov2 = sweep_cost_chunk_pallas(
        ref, srcs, rels, depths, weights=weights, mode="corr",
        interpret=True, out_layout="kchw")
    assert bool(cov1) and bool(cov2)
    np.testing.assert_array_equal(
        np.asarray(kchw), np.asarray(khwc).transpose(0, 3, 1, 2))

    padded, _ = sweep_cost_chunk_pallas(
        ref, srcs, rels, depths, weights=weights, mode="corr",
        interpret=True, out_layout="kchw", pad_to=256, keep_pad_w=True)
    assert padded.shape[-1] == 256
    np.testing.assert_array_equal(
        np.asarray(padded[..., :W_]), np.asarray(kchw))
    assert np.all(np.asarray(padded[..., W_:]) == 0.0)

    with pytest.raises(ValueError):
        sweep_cost_chunk_pallas(ref, srcs, rels, depths, out_layout="nope")


def test_single_view_corr_padded(rng):
    """Single-view kernel (pair branch) at an unaligned width."""
    H_, W_ = 24, 144
    ref, srcs, rels, depths, _ = _mv_scene(rng, H_, W_, V=2)
    corr, covered = sweep_corr_chunk_pallas(
        ref, srcs[0], rels[0], depths, interpret=True)
    assert bool(covered)
    oracle = sweep_corr_chunk_reference(ref, srcs[0], rels[0], depths)
    assert corr.shape == oracle.shape == (depths.shape[0], H_, W_)
    np.testing.assert_allclose(
        np.asarray(corr), np.asarray(oracle), rtol=2e-3, atol=1e-4)


def test_gating_accepts_production_stage_shapes():
    """The round-2 cliff is gone: every reference production stage shape
    (1856x2752 @ scale 1, /2, /4 — /root/reference/config.yaml:9-11) maps
    to legal padded kernel geometry."""
    from deep3d_aerial_tpu.ops.pallas_sweep import _round_up

    for H_, W_ in [(1856, 2752), (928, 1376), (464, 688)]:
        Hp, Wp = _round_up(H_, 8), _round_up(W_, 128)
        assert Hp % 8 == 0 and Wp % 128 == 0 and Wp - W_ < 128
        # and the 256-aligned red-handoff variant
        Wp2 = _round_up(W_, 256)
        assert Wp2 % 256 == 0 and Wp2 - W_ < 256
