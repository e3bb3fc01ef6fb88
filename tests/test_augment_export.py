import numpy as np

from deep3d_aerial_tpu.pipeline.augment import (
    random_gaussian_noise,
    random_photometric,
)
from deep3d_aerial_tpu.sparse.export import export_rednet_cams
from deep3d_aerial_tpu.io import text_formats as tf
from deep3d_aerial_tpu.geometry.camera import Camera
from deep3d_aerial_tpu.train.dataset_whu import read_train_cam
from tests.conftest import random_pose


def test_random_photometric_valid(rng):
    img = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
    out = random_photometric(img, rng)
    assert out.shape == img.shape and out.dtype == np.uint8
    # different draws give different images
    out2 = random_photometric(img, rng)
    assert not np.array_equal(out, out2)


def test_random_gaussian_noise(rng):
    img = np.full((16, 16, 3), 128, np.uint8)
    out = random_gaussian_noise(img, rng)
    assert out.dtype == np.uint8
    assert 0 < np.std(out.astype(float)) < 30


def test_export_rednet_cams_round_trip(tmp_path, rng):
    cams = [Camera(camera_id=1, width=640, height=480, fx=500.0, fy=500.0,
                   cx=320.0, cy=240.0)]
    pose = random_pose(rng)
    images = [tf.PredefImage(3, 1, pose, 80.0, 120.0, "im_003.png")]
    tf.write_predef_cameras(tmp_path / "cameras.txt", cams)
    tf.write_predef_images(tmp_path / "images.txt", images)

    out = export_rednet_cams(
        str(tmp_path / "cameras.txt"), str(tmp_path / "images.txt"),
        str(tmp_path / "cams"),
    )
    assert len(out) == 1

    # our training-cam reader recovers the same canonical pose + range
    pose2, K, dmin, dmax = read_train_cam(out[0])
    assert np.allclose(pose2.R_cw, pose.R_cw, atol=1e-5)
    assert np.allclose(pose2.center, pose.center, atol=1e-3)
    assert np.isclose(K[0, 0], 500.0)
    assert dmin == 80.0 and dmax == 120.0
