import numpy as np

from deep3d_aerial_tpu.geometry.camera import Camera
from deep3d_aerial_tpu.io import text_formats as tf
from deep3d_aerial_tpu.io.pfm import read_pfm, write_pfm
from tests.conftest import random_pose


def test_pfm_round_trip_gray(tmp_path, rng):
    img = rng.normal(size=(37, 53)).astype(np.float32)
    p = tmp_path / "d.pfm"
    write_pfm(p, img)
    back, scale = read_pfm(p)
    assert np.array_equal(back, img)
    assert scale == 1.0


def test_pfm_round_trip_color(tmp_path, rng):
    img = rng.normal(size=(16, 24, 3)).astype(np.float32)
    p = tmp_path / "n.pfm"
    write_pfm(p, img)
    back, _ = read_pfm(p)
    assert np.array_equal(back, img)


def test_pfm_reference_compatible(tmp_path, rng):
    """Byte layout identical to the reference writer (IO/pfm.py:57-84)."""
    img = rng.normal(size=(8, 8)).astype(np.float32)
    p = tmp_path / "ref.pfm"
    write_pfm(p, img)
    raw = open(p, "rb").read()
    assert raw.startswith(b"Pf\n8 8\n")
    payload = raw.split(b"\n", 3)[3]
    assert np.array_equal(
        np.frombuffer(payload, dtype="<f4").reshape(8, 8), np.flipud(img)
    )


def test_predef_round_trip(tmp_path, rng):
    cams = [
        Camera(camera_id=1, width=640, height=480, fx=500.0, fy=501.0,
               cx=320.0, cy=240.0, pixelsize=0.004,
               distortion=(0.01, -0.02, 0.001, 0.0)),
    ]
    images = [
        tf.PredefImage(7, 1, random_pose(rng), 80.0, 120.0, "img_007.png"),
        tf.PredefImage(9, 1, random_pose(rng), 85.0, 125.0, "img_009.png"),
    ]
    tf.write_predef_cameras(tmp_path / "cameras.txt", cams)
    tf.write_predef_images(tmp_path / "images.txt", images)

    cams2 = tf.read_predef_cameras(tmp_path / "cameras.txt")
    imgs2 = tf.read_predef_images(tmp_path / "images.txt")

    assert cams2[1].fx == 500.0 and cams2[1].distortion[1] == -0.02
    for im in images:
        got = imgs2[im.image_id]
        assert np.allclose(got.pose.R_cw, im.pose.R_cw, atol=1e-5)
        assert np.allclose(got.pose.t_cw, im.pose.t_cw, atol=1e-3)
        assert got.name == im.name
        assert np.isclose(got.depth_min, im.depth_min, atol=1e-5)


def test_viewpair_blocks_border_round_trip(tmp_path):
    score = [(3, [(5, 120.0), (6, 88.0)]), (4, [(3, 10.5)])]
    tf.write_view_pairs(tmp_path / "viewpair.txt", score)
    back = tf.read_view_pairs(tmp_path / "viewpair.txt")
    assert back[0][0] == 3 and back[0][1][0] == (5, 120.0)
    assert back[1][1] == [(3, 10.5)]

    blocks = [([0.0, 10.0, 0.0, 10.0, -5.0, 5.0], [3, 4])]
    tf.write_blocks(tmp_path / "blocks.txt", blocks)
    bback = tf.read_blocks(tmp_path / "blocks.txt")
    assert bback[0][1] == [3, 4]
    assert np.allclose(bback[0][0], blocks[0][0])

    tf.write_border(tmp_path / "border.txt", [1, 2, 3, 4, 5, 6])
    assert np.allclose(tf.read_border(tmp_path / "border.txt"), [1, 2, 3, 4, 5, 6])


def test_expand_view_pairs():
    pairs = [(5, 1.0), (6, 0.5)]
    assert tf.expand_view_pairs(pairs, view_num=5) == [5, 6, 5, 5]
    assert tf.expand_view_pairs(pairs, view_num=3) == [5, 6]
    assert tf.expand_view_pairs([], view_num=5) == []


def test_mvs_cam_round_trip(tmp_path, rng):
    pose = random_pose(rng)
    K = np.array([[400.0, 0, 160], [0, 400.0, 120], [0, 0, 1]])
    cam = tf.MVSCam(pose.T_cw, K, 80.0, 0.1, 384, 118.4,
                    320, 240, 12, "img_012", "/data/img_012.png")
    tf.write_mvs_cam(tmp_path / "cam.txt", cam)
    back = tf.read_mvs_cam(tmp_path / "cam.txt")
    assert np.allclose(back.T_cw, pose.T_cw)
    assert np.allclose(back.K, K)
    assert back.depth_num == 384 and back.width == 320
    assert back.name == "img_012" and back.image_path == "/data/img_012.png"
