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
