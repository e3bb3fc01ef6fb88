import numpy as np

from deep3d_aerial_tpu.fusion.evaluate import (
    cloud_agreement,
    depth_agreement,
    surface_rmse,
)


def test_depth_agreement_basic():
    a = np.full((10, 10), 100.0)
    b = a * 1.005  # 0.5% off -> within 1%
    assert depth_agreement(a, b) == 1.0
    c = a * 1.02  # 2% off
    assert depth_agreement(a, c) == 0.0
    # invalid pixels excluded
    b2 = b.copy()
    b2[0, :] = 0.0
    assert depth_agreement(a, b2) == 1.0


def test_cloud_agreement_identical(rng):
    pts = rng.uniform(0, 10, (500, 3))
    fa, fb = cloud_agreement(pts, pts, dist_threshold=0.05)
    assert fa == 1.0 and fb == 1.0


def test_cloud_agreement_offset(rng):
    pts = rng.uniform(0, 10, (500, 3))
    moved = pts + np.array([5.0, 0, 0])  # far beyond threshold
    fa, fb = cloud_agreement(pts, moved, dist_threshold=0.05)
    assert fa < 0.05 and fb < 0.05


def test_cloud_agreement_partial(rng):
    pts = rng.uniform(0, 10, (400, 3))
    half = np.concatenate([pts[:200], pts[200:] + 3.0])
    fa, _ = cloud_agreement(half, pts, dist_threshold=0.05, sample=400)
    assert 0.4 < fa < 0.6


def test_surface_rmse():
    x = np.linspace(0, 10, 100)
    pts = np.stack([x, x, 0.1 * x + 0.05], -1)  # constant 0.05 offset
    rmse = surface_rmse(pts, lambda a, b: 0.1 * a)
    assert abs(rmse - 0.05) < 1e-6
