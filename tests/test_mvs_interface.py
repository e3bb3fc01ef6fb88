import numpy as np

from deep3d_aerial_tpu.geometry.camera import Camera
from deep3d_aerial_tpu.io.mvs_interface import (
    MVSScene,
    read_mvs,
    scene_from_fusion,
    write_mvs,
)
from tests.conftest import random_pose, toy_camera


def build_scene(rng, n_pts=200):
    cam = toy_camera(width=640, height=480, f=500.0)
    images = []
    for i in range(4):
        pose = random_pose(rng)
        images.append((i + 1, 0, f"im_{i}.png", pose.R_cw, pose.center))
    pts = rng.normal(size=(n_pts, 3)).astype(np.float32)
    vis = [
        np.array(sorted(rng.choice([1, 2, 3, 4], size=rng.integers(2, 5),
                                   replace=False)), np.int64)
        for _ in range(n_pts)
    ]
    normals = rng.normal(size=(n_pts, 3)).astype(np.float32)
    colors = rng.integers(0, 255, size=(n_pts, 3)).astype(np.uint8)
    return scene_from_fusion([cam], images, pts, vis, normals, colors)


def test_mvs_round_trip(tmp_path, rng):
    scene = build_scene(rng)
    path = tmp_path / "scene.mvs"
    write_mvs(path, scene)
    back = read_mvs(path)

    assert len(back.platforms) == 1
    assert len(back.platforms[0].cameras) == 1
    assert back.platforms[0].cameras[0].width == 640
    assert np.allclose(back.platforms[0].cameras[0].K, scene.platforms[0].cameras[0].K)
    assert len(back.platforms[0].poses) == 4
    assert np.allclose(back.platforms[0].poses[2].R, scene.platforms[0].poses[2].R)

    assert len(back.images) == 4
    assert back.images[0].name == "im_0.png"
    assert back.images[3].id == 4

    assert np.allclose(back.vertices, scene.vertices)
    assert np.allclose(back.normals, scene.normals)
    assert np.array_equal(back.colors, scene.colors)
    for a, b in zip(back.vertex_views, scene.vertex_views):
        assert np.array_equal(a, b)


def test_mvs_header_magic(tmp_path, rng):
    scene = build_scene(rng, n_pts=5)
    path = tmp_path / "s.mvs"
    write_mvs(path, scene)
    raw = open(path, "rb").read(12)
    assert raw[:4] == b"MVSI"
    version = int.from_bytes(raw[4:8], "little")
    assert version == 6


def test_mvs_reference_reader_compat(tmp_path, rng):
    """The reference's own .mvs loader parses our file."""
    import sys

    sys.path.insert(0, "/root/reference")
    np.float = float
    np.int = int
    try:
        from IO import mvs_io
    except Exception:
        import pytest

        pytest.skip("reference mvs_io not importable in this env")

    scene = build_scene(rng, n_pts=20)
    path = tmp_path / "ref.mvs"
    write_mvs(path, scene)

    class _Shim(mvs_io.Interface):
        def __init__(self):
            # bypass COLMAP-reading constructor
            self.platforms = []
            self.images = []
            self.vertices = []
            self.verticesNormal = []
            self.verticesColor = []
            self.transform = np.eye(4)

    inter = _Shim()
    inter.readMVS(str(path))
    assert len(inter.platforms) == 1
    assert len(inter.images) == 4
    assert len(inter.vertices) == 20
    assert np.allclose(
        np.asarray(inter.vertices[0].X).reshape(3),
        scene.vertices[0], atol=1e-6,
    )
    assert list(inter.vertices[0].views) == list(scene.vertex_views[0])
