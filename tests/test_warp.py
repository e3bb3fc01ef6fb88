import jax
import jax.numpy as jnp
import numpy as np
import pytest

import numpy as _np

from deep3d_aerial_tpu.geometry.camera import proj_matrix


def host_rel(P_src, P_ref):
    """float64 host-side relative projection (the production path)."""
    return jnp.asarray(
        _np.asarray(P_src, _np.float64) @ _np.linalg.inv(_np.asarray(P_ref, _np.float64)),
        jnp.float32,
    )
from deep3d_aerial_tpu.ops.warp import (
    bilinear_sample,
    plane_sweep_warp,
    plane_sweep_warp_single,
)
from tests.conftest import random_pose, toy_camera


def test_bilinear_sample_exact_at_pixels(rng):
    src = jnp.asarray(rng.normal(size=(10, 12, 4)).astype(np.float32))
    xs, ys = jnp.meshgrid(jnp.arange(12.0), jnp.arange(10.0))
    out = bilinear_sample(src, xs, ys)
    assert np.allclose(out, src, atol=1e-6)


def test_bilinear_sample_interpolates(rng):
    # bilinear of a linear ramp is exact
    xs, ys = np.meshgrid(np.arange(16.0), np.arange(12.0))
    src = jnp.asarray((2.0 * xs + 3.0 * ys).astype(np.float32)[..., None])
    qx = jnp.asarray(rng.uniform(0, 15, size=(50,)).astype(np.float32))
    qy = jnp.asarray(rng.uniform(0, 11, size=(50,)).astype(np.float32))
    out = bilinear_sample(src, qx, qy)[..., 0]
    assert np.allclose(out, 2.0 * np.array(qx) + 3.0 * np.array(qy), atol=1e-4)


def test_bilinear_sample_zero_padding(rng):
    src = jnp.ones((8, 8, 1), jnp.float32)
    out = bilinear_sample(src, jnp.array([-5.0, 20.0, -0.5]),
                          jnp.array([4.0, 4.0, 4.0]))
    assert out[0, 0] == 0.0 and out[1, 0] == 0.0
    assert np.isclose(out[2, 0], 0.5)  # half in, half out


def test_identity_warp(rng):
    """Warping a view onto itself returns the view at every depth."""
    pose = random_pose(rng)
    cam = toy_camera(width=32, height=24)
    P = proj_matrix(cam.K, pose)
    rel = host_rel(P, P)
    src = jnp.asarray(rng.normal(size=(24, 32, 8)).astype(np.float32))
    depths = jnp.linspace(80.0, 120.0, 5)
    out = plane_sweep_warp(src, rel, depths)
    assert out.shape == (5, 24, 32, 8)
    for d in range(5):
        assert np.allclose(out[d], src, atol=1e-3)


def test_warp_ground_truth_consistency(rng):
    """At the TRUE depth of a fronto-parallel plane, the warped source must
    reproduce the pattern seen by the reference view (interior pixels)."""
    cam = toy_camera(width=64, height=48, f=100.0)
    ref_pose = random_pose(rng, dist=100.0)
    src_pose = random_pose(rng, dist=100.0)

    # world plane z=0; pattern value = smooth function of world xy
    def pattern(x, y):
        return np.sin(0.2 * x) + np.cos(0.3 * y) + 0.1 * x

    # ref-view image of the plane: backproject each ref pixel to z=0
    H, W = 48, 64
    xs, ys = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
    # solve for depth where ray hits z=0
    Kinv = np.linalg.inv(cam.K)
    rays = np.stack([xs, ys, np.ones_like(xs)], -1) @ Kinv.T @ ref_pose.R_wc.T
    t = ref_pose.center
    depth_true = (0.0 - t[2]) / rays[..., 2]  # world z=0
    world = t + rays * depth_true[..., None]
    ref_img = pattern(world[..., 0], world[..., 1])

    # src-view image of the same plane
    rays_s = np.stack([xs, ys, np.ones_like(xs)], -1) @ Kinv.T @ src_pose.R_wc.T
    t_s = src_pose.center
    ds = (0.0 - t_s[2]) / rays_s[..., 2]
    world_s = t_s + rays_s * ds[..., None]
    src_img = pattern(world_s[..., 0], world_s[..., 1]).astype(np.float32)

    rel = host_rel(proj_matrix(cam.K, src_pose), proj_matrix(cam.K, ref_pose))

    warped = plane_sweep_warp_single(
        jnp.asarray(src_img[..., None]), rel,
        jnp.asarray(depth_true.astype(np.float32)),
    )[..., 0]

    # compare on interior pixels whose src projection landed inside the frame
    uv_src, _ = src_pose.world_to_image(cam.K, world.reshape(-1, 3))
    inside = (
        (uv_src[:, 0] > 1) & (uv_src[:, 0] < W - 2)
        & (uv_src[:, 1] > 1) & (uv_src[:, 1] < H - 2)
    ).reshape(H, W)
    assert inside.sum() > 200
    err = np.abs(np.array(warped) - ref_img)[inside]
    assert err.mean() < 0.01  # bilinear interp error on a smooth pattern


def test_warp_wrong_depth_mismatch(rng):
    """Same setup but a wrong depth plane should NOT match."""
    cam = toy_camera(width=64, height=48, f=100.0)
    ref_pose = random_pose(rng, dist=100.0)
    src_pose = random_pose(rng, dist=100.0)
    rel = host_rel(proj_matrix(cam.K, src_pose), proj_matrix(cam.K, ref_pose))

    src = jnp.asarray(rng.normal(size=(48, 64, 1)).astype(np.float32))
    w_good = plane_sweep_warp_single(src, rel, jnp.float32(100.0))
    w_bad = plane_sweep_warp_single(src, rel, jnp.float32(60.0))
    assert not np.allclose(w_good, w_bad, atol=1e-2)


def test_per_pixel_depths(rng):
    cam = toy_camera(width=16, height=16)
    p1, p2 = random_pose(rng), random_pose(rng)
    rel = host_rel(proj_matrix(cam.K, p2), proj_matrix(cam.K, p1))
    src = jnp.asarray(rng.normal(size=(16, 16, 2)).astype(np.float32))
    d_hw = jnp.full((3, 16, 16), 100.0)
    out_hw = plane_sweep_warp(src, rel, d_hw)
    out_1d = plane_sweep_warp(src, rel, jnp.full((3,), 100.0))
    assert np.allclose(out_hw, out_1d, atol=1e-5)


def test_warp_jit_compiles(rng):
    cam = toy_camera(width=32, height=32)
    p1, p2 = random_pose(rng), random_pose(rng)
    rel = host_rel(proj_matrix(cam.K, p2), proj_matrix(cam.K, p1))
    src = jnp.asarray(rng.normal(size=(32, 32, 8)).astype(np.float32))
    fn = jax.jit(lambda s, r, d: plane_sweep_warp(s, r, d))
    out = fn(src, rel, jnp.linspace(90.0, 110.0, 4))
    assert out.shape == (4, 32, 32, 8)


def test_compensated_warp_precision_extreme_depths():
    """Double-single projective chain (reference float64 warp analog,
    module.py:560): at deep scenes the fp32 chain loses sub-pixel
    precision; the compensated path must track a numpy float64 oracle to
    ~1e-3 px while plain fp32 drifts an order of magnitude more."""
    import numpy as np
    import jax.numpy as jnp

    from deep3d_aerial_tpu.ops.warp import sweep_coordinates

    H, W = 16, 128
    # deep scene at full-res-aerial magnitudes: |ray| ~ 4e4 (long focal x
    # large principal offsets), big depths, and a translation that cancels
    # ray*d back into the image — the fp32 chain then loses
    # eps*|ray*d|/|pz| ~ 2.4e-3 px while the compensated chain is limited
    # only by fp32 OUTPUT representability (~1e-5 px at x~100)
    rel = np.array([
        [1.0002, 3e-4, -40000.0, 2.1735e9],
        [-2.1e-4, 0.9998, -35000.0, 1.9020e9],
        [1.5e-6, -2.5e-6, 1.0001, 12.5],
        [0, 0, 0, 1.0],
    ])
    depths = np.full((1, H, W), 54321.75, np.float32)

    # float64 oracle ON THE FLOAT32-ROUNDED INPUTS (the chain's own inputs;
    # otherwise input quantization dominates and hides the chain error)
    rel = np.float32(rel).astype(np.float64)
    gx, gy = np.meshgrid(np.arange(W, dtype=np.float64),
                         np.arange(H, dtype=np.float64))
    ray = np.stack([gx, gy, np.ones_like(gx)], -1) @ rel[:3, :3].T
    p = ray * depths[0][..., None] + rel[:3, 3]
    x64 = p[..., 0] / p[..., 2]
    y64 = p[..., 1] / p[..., 2]

    x32, y32, _ = sweep_coordinates(
        jnp.asarray(rel, jnp.float32), jnp.asarray(depths), (H, W),
        highp=False)
    xhp, yhp, _ = sweep_coordinates(
        jnp.asarray(rel, jnp.float32), jnp.asarray(depths), (H, W),
        highp=True)

    err32 = max(np.abs(np.asarray(x32[0]) - x64).max(),
                np.abs(np.asarray(y32[0]) - y64).max())
    errhp = max(np.abs(np.asarray(xhp[0]) - x64).max(),
                np.abs(np.asarray(yhp[0]) - y64).max())
    assert errhp < 2e-3, errhp
    assert errhp < err32 / 10, (errhp, err32)
