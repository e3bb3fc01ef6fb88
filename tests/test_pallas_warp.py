"""Pallas windowed warp+corr kernel vs the XLA gather oracle (interpret
mode on CPU; compiled-mode TPU benchmarking is a bench.py/round-2 task)."""

import jax.numpy as jnp
import numpy as np
import pytest

from deep3d_aerial_tpu.geometry.camera import proj_matrix
from deep3d_aerial_tpu.ops.pallas_warp import warp_corr_plane_pallas
from deep3d_aerial_tpu.ops.warp import plane_sweep_warp_single
from tests.conftest import random_pose, toy_camera
from tests.test_warp import host_rel

H, W, C = 32, 128, 8


def xla_corr(ref, src, rel, depth_hw):
    warped = plane_sweep_warp_single(src, rel, depth_hw)
    return np.asarray((warped * ref).mean(-1))


def make_pair(rng, jitter=2.0):
    cam = toy_camera(width=W, height=H, f=300.0)  # long focal: small disparity
    p_ref = random_pose(rng, dist=100.0)
    # src close to ref so footprints stay inside modest windows
    import dataclasses

    from deep3d_aerial_tpu.geometry.camera import Pose

    center = p_ref.center + np.array([jitter, jitter / 2, 0.0])
    p_src = Pose(p_ref.R_cw, -p_ref.R_cw @ center)
    rel = host_rel(proj_matrix(cam.K, p_src), proj_matrix(cam.K, p_ref))
    ref = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
    src = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
    return ref, src, rel


def test_pallas_matches_xla_constant_depth(rng):
    ref, src, rel = make_pair(rng)
    depth = jnp.full((H, W), 100.0)
    got = np.asarray(warp_corr_plane_pallas(
        ref, src, rel, depth, tile=(8, 128), window=(32, 128), interpret=True
    ))
    want = xla_corr(ref, src, rel, depth)
    assert np.allclose(got, want, atol=1e-4), np.abs(got - want).max()


def test_pallas_matches_xla_varying_depth(rng):
    ref, src, rel = make_pair(rng)
    gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    depth = jnp.asarray(
        (100.0 + 0.02 * gx + 0.03 * gy).astype(np.float32)
    )
    got = np.asarray(warp_corr_plane_pallas(
        ref, src, rel, depth, tile=(8, 128), window=(32, 128), interpret=True
    ))
    want = xla_corr(ref, src, rel, depth)
    assert np.allclose(got, want, atol=1e-4), np.abs(got - want).max()


def test_pallas_identity_rel(rng):
    """rel = identity -> correlation is just mean(ref * src)."""
    ref = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
    src = jnp.asarray(rng.normal(size=(H, W, C)).astype(np.float32))
    rel = jnp.eye(4)
    got = np.asarray(warp_corr_plane_pallas(
        ref, src, rel, jnp.full((H, W), 50.0),
        tile=(8, 128), window=(32, 128), interpret=True,
    ))
    want = np.asarray((ref * src).mean(-1))
    assert np.allclose(got, want, atol=1e-5)
