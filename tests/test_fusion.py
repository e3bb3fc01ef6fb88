import numpy as np
import pytest

from deep3d_aerial_tpu.fusion import (
    DepthFusion,
    FusionConfig,
    ViewGeometry,
    consistency_check,
)
from deep3d_aerial_tpu.fusion.consistency import backproject_to_world
from deep3d_aerial_tpu.fusion.fuse import ViewData
from tests.conftest import random_pose, toy_camera

import jax.numpy as jnp

H, W = 48, 64


def make_scene(rng, n_views=5, noise=0.0):
    """Cameras over a bumpy ground plane; per-view GT depth maps."""
    cam = toy_camera(width=W, height=H, f=90.0)

    def terrain(x, y):
        return 2.0 * np.sin(0.08 * x) * np.cos(0.1 * y)

    views = {}
    for i in range(n_views):
        pose = random_pose(rng, dist=100.0)
        geom = ViewGeometry.create(cam.K, pose.T_cw)

        # ray-march each pixel to the terrain (2 fixed-point iterations)
        gx, gy = np.meshgrid(np.arange(W, dtype=np.float64),
                             np.arange(H, dtype=np.float64))
        Kinv = np.linalg.inv(cam.K)
        rays = np.stack([gx, gy, np.ones_like(gx)], -1) @ Kinv.T @ pose.R_wc.T
        t = pose.center
        z_ground = 0.0
        depth = (z_ground - t[2]) / rays[..., 2]
        for _ in range(25):
            world = t + rays * depth[..., None]
            z_t = terrain(world[..., 0], world[..., 1])
            depth = (z_t - t[2]) / rays[..., 2]
        world = t + rays * depth[..., None]

        d = depth.astype(np.float32)
        if noise > 0:
            d = d + rng.normal(0, noise, d.shape).astype(np.float32)
        views[f"v{i}"] = ViewData(
            name=f"v{i}", image_id=i + 1, geom=geom, depth=d,
            prob=np.full((H, W), 0.9, np.float32),
            image=np.dstack([
                (np.sin(0.3 * world[..., 0]) * 0.5 + 0.5).astype(np.float32)
            ] * 3),
        )
    return views


def test_consistency_check_accepts_true_geometry(rng):
    views = make_scene(rng, n_views=2)
    a, b = views["v0"], views["v1"]
    res = consistency_check(
        jnp.asarray(a.depth), jnp.asarray(np.tile([0, 0, 1.0], (H, W, 1)).astype(np.float32)),
        jnp.asarray(a.geom.as_stack()),
        jnp.asarray(b.depth), jnp.asarray(b.normal_cam),
        jnp.asarray(b.geom.as_stack()), jnp.asarray(a.prob),
        normal_cos_threshold=-1.0,  # normals unconstrained here
    )
    mask = np.asarray(res["mask"])
    # a solid fraction passes (overlap between two random tilted views is
    # partial; pixels projecting outside the src frame can never pass)
    assert mask.mean() > 0.2
    # reprojected depth agrees with ref depth where masked
    d_re = np.asarray(res["depth_reprojected"])
    rel = np.abs(d_re[mask] - a.depth[mask]) / a.depth[mask]
    assert rel.max() < 0.01 + 1e-6

    # self-check: a view against itself passes (almost) everywhere
    res_self = consistency_check(
        jnp.asarray(a.depth), jnp.asarray(np.tile([0, 0, 1.0], (H, W, 1)).astype(np.float32)),
        jnp.asarray(a.geom.as_stack()),
        jnp.asarray(a.depth), jnp.asarray(a.normal_cam),
        jnp.asarray(a.geom.as_stack()), jnp.asarray(a.prob),
        normal_cos_threshold=-1.0,
    )
    assert np.asarray(res_self["mask"]).mean() > 0.99


def test_consistency_check_rejects_wrong_depth(rng):
    views = make_scene(rng, n_views=2)
    a, b = views["v0"], views["v1"]
    wrong = a.depth * 1.2  # 20% depth error >> 1% threshold
    res = consistency_check(
        jnp.asarray(wrong), jnp.asarray(np.tile([0, 0, 1.0], (H, W, 1)).astype(np.float32)),
        jnp.asarray(a.geom.as_stack()),
        jnp.asarray(b.depth), jnp.asarray(b.normal_cam),
        jnp.asarray(b.geom.as_stack()), jnp.asarray(a.prob),
        normal_cos_threshold=-1.0,
    )
    assert np.asarray(res["mask"]).mean() < 0.05


def test_consistency_low_confidence_rejected(rng):
    views = make_scene(rng, n_views=2)
    a, b = views["v0"], views["v1"]
    res = consistency_check(
        jnp.asarray(a.depth), jnp.asarray(np.tile([0, 0, 1.0], (H, W, 1)).astype(np.float32)),
        jnp.asarray(a.geom.as_stack()),
        jnp.asarray(b.depth), jnp.asarray(b.normal_cam),
        jnp.asarray(b.geom.as_stack()),
        jnp.asarray(np.zeros((H, W), np.float32)),  # zero confidence
        normal_cos_threshold=-1.0,
    )
    assert np.asarray(res["mask"]).sum() == 0


def test_backproject_world_consistency(rng):
    views = make_scene(rng, n_views=1)
    a = views["v0"]
    world = backproject_to_world(a.depth, a.geom)
    # all points must lie on the terrain surface
    z_t = 2.0 * np.sin(0.08 * world[..., 0]) * np.cos(0.1 * world[..., 1])
    assert np.abs(world[..., 2] - z_t).max() < 1e-2


def test_fuse_block_points_on_surface(rng):
    views = make_scene(rng, n_views=5)
    cfg = FusionConfig(min_geo_consist=3, fusion_num=4, skip_line=1,
                       normal_threshold_deg=180.0)
    fusion = DepthFusion(cfg)
    view_list = [(f"v{i}", [f"v{j}" for j in range(5) if j != i])
                 for i in range(5)]
    out = fusion.fuse_block(views, view_list)

    assert out.xyz.shape[0] > 1000
    z_t = 2.0 * np.sin(0.08 * out.xyz[:, 0]) * np.cos(0.1 * out.xyz[:, 1])
    err = np.abs(out.xyz[:, 2] - z_t)
    assert np.median(err) < 0.05
    assert len(out.visibility) == out.xyz.shape[0]
    # every point is seen by ref + at least min_geo-1 srcs
    assert min(len(v) for v in out.visibility) >= cfg.min_geo_consist


def test_fuse_block_dedup_across_refs(rng):
    """Consumption: two refs fusing the same surface must not double-count —
    total points stay well below 2x one ref's count."""
    views = make_scene(rng, n_views=4)
    cfg = FusionConfig(min_geo_consist=2, fusion_num=3, skip_line=1,
                       normal_threshold_deg=180.0)

    one = DepthFusion(cfg).fuse_block(
        {k: ViewData(v.name, v.image_id, v.geom, v.depth.copy(), v.prob.copy(),
                     v.normal_cam.copy(), v.image)
         for k, v in views.items()},
        [("v0", ["v1", "v2", "v3"])],
    )
    both = DepthFusion(cfg).fuse_block(
        {k: ViewData(v.name, v.image_id, v.geom, v.depth.copy(), v.prob.copy(),
                     v.normal_cam.copy(), v.image)
         for k, v in views.items()},
        [("v0", ["v1", "v2", "v3"]), ("v1", ["v0", "v2", "v3"])],
    )
    assert both.xyz.shape[0] < 2 * one.xyz.shape[0] * 0.9


def test_fuse_dedup_persists_across_blocks(rng):
    """Views shared by overlapping blocks must not re-emit consumed points
    (reference tmp/*_init.pfm semantics span all blocks). Fusing the same
    ref twice on one DepthFusion instance yields ~no new points the second
    time; a fresh instance yields the full count again."""
    views = make_scene(rng, n_views=4)
    cfg = FusionConfig(min_geo_consist=2, fusion_num=3, skip_line=1,
                       normal_threshold_deg=180.0)
    view_list = [("v0", ["v1", "v2", "v3"])]

    fusion = DepthFusion(cfg)
    first = fusion.fuse_block(dict(views), view_list)
    second = fusion.fuse_block(dict(views), view_list)
    assert first.xyz.shape[0] > 1000
    # the ref's surviving pixels re-fuse from its own masked depth, but the
    # consumed sources no longer corroborate fresh duplicates en masse
    assert second.xyz.shape[0] < first.xyz.shape[0]

    fresh = DepthFusion(cfg).fuse_block(dict(views), view_list)
    assert fresh.xyz.shape[0] == first.xyz.shape[0]


def test_fuse_block_scene_range_crop(rng):
    views = make_scene(rng, n_views=5)
    cfg = FusionConfig(min_geo_consist=3, fusion_num=4, skip_line=1,
                       normal_threshold_deg=180.0)
    fusion = DepthFusion(cfg)
    view_list = [("v0", ["v1", "v2", "v3", "v4"])]
    out = fusion.fuse_block(views, view_list, scene_range=[0, 20, -20, 20, -10, 10])
    if out.xyz.shape[0]:
        assert out.xyz[:, 0].min() > 0 and out.xyz[:, 0].max() < 20
        assert out.xyz[:, 1].min() > -20 and out.xyz[:, 1].max() < 20
