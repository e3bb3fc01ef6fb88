import os

import numpy as np
import pytest

from deep3d_aerial_tpu.geometry.camera import Pose
from deep3d_aerial_tpu.io.pfm import write_pfm
from deep3d_aerial_tpu.train.dataset_whu import WHUOMVSDataset, read_train_cam
from tests.conftest import random_pose

H, W = 64, 96


def write_cam(path, pose: Pose, K, dmin, dmax):
    R, t = pose.to_convention(axes="xrightyup", rotation="Rwc",
                              translation="twc")
    with open(path, "w") as f:
        f.write("Twc\n")
        for i in range(3):
            f.write(f"{R[i,0]:.6f} {R[i,1]:.6f} {R[i,2]:.6f} {t[i]:.6f}\n")
        f.write("0 0 0 1\n\nK_mat\n")
        f.write(f"{K[0,0]:.3f} 0 {K[0,2]:.3f}\n0 {K[1,1]:.3f} {K[1,2]:.3f}\n0 0 1\n\n")
        f.write(f"{dmin} {dmax} 0.1\n\nname 0 0 0 0 {W} {H}\n")


@pytest.fixture
def whu_root(tmp_path, rng):
    import cv2

    root = tmp_path / "whu"
    scene = root / "scene_a"
    for sub in ["images", "cams", "depths", "info"]:
        (scene / sub).mkdir(parents=True)
    (root / "index.txt").write_text("scene_a\n")

    K = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]])
    names = {}
    for i in range(1, 5):
        name = f"v{i:03d}"
        names[i] = name
        img = rng.integers(0, 255, (H, W, 3)).astype(np.uint8)
        cv2.imwrite(str(scene / "images" / f"{name}.png"), img)
        write_cam(scene / "cams" / f"{name}.txt", random_pose(rng), K,
                  80.0, 120.0)
        depth = rng.uniform(80, 120, (H, W)).astype(np.float32)
        write_pfm(scene / "depths" / f"{name}.pfm", depth)

    with open(scene / "info" / "image_path.txt", "w") as f:
        f.write("4\n")
        for i, n in names.items():
            f.write(f"{i} {n}.png images/{n}.png\n")
    with open(scene / "info" / "viewpair.txt", "w") as f:
        f.write("2\n1\n3 2 100 3 80 4 60\n2\n3 1 90 3 70 4 50\n")
    return root


def test_whu_dataset_pfm(whu_root):
    ds = WHUOMVSDataset(str(whu_root), view_num=3, gt_format="pfm")
    assert len(ds) == 2
    s = ds.build(0)
    assert s.imgs.shape == (3, H, W, 3)
    assert s.rel_projs.shape == (3, 2, 4, 4)
    assert s.depth_min == 80.0 and s.depth_max == 120.0
    assert s.depth_gt.shape == (H, W)
    assert s.mask.mean() > 0.99
    assert np.isfinite(s.imgs).all()


def test_whu_dataset_batches(whu_root):
    ds = WHUOMVSDataset(str(whu_root), view_num=3, gt_format="pfm")
    batches = list(ds.batches(2, shuffle=False))
    assert len(batches) == 1
    b = batches[0]
    assert b["imgs"].shape == (2, 3, H, W, 3)
    assert b["depth_gt"].shape == (2, H, W)


def test_whu_dataset_augment(whu_root):
    ds = WHUOMVSDataset(str(whu_root), view_num=3, gt_format="pfm",
                        augment=True, normalize="standard")
    ds2 = WHUOMVSDataset(str(whu_root), view_num=3, gt_format="pfm",
                         augment=False, normalize="standard")
    a = ds.build(0).imgs
    b = ds2.build(0).imgs
    assert not np.allclose(a, b)


def test_read_train_cam_round_trip(tmp_path, rng):
    pose = random_pose(rng)
    K = np.array([[120.0, 0, 50], [0, 120.0, 40], [0, 0, 1]])
    write_cam(tmp_path / "c.txt", pose, K, 70.0, 130.0)
    p2, K2, dmin, dmax = read_train_cam(tmp_path / "c.txt")
    assert np.allclose(p2.R_cw, pose.R_cw, atol=1e-5)
    assert np.allclose(K2, K, atol=1e-3)
    assert dmin == 70.0 and dmax == 130.0

def test_gt_cropped_with_same_window_as_image(tmp_path, rng):
    """Oversized images are CENTER-cropped; GT must use the same window
    (regression: GT was top-left sliced, shifting supervision)."""
    import cv2

    BH, BW = 96, 160  # bigger than network size
    root = tmp_path / "whu_big"
    scene = root / "scene_a"
    for sub in ["images", "cams", "depths", "info"]:
        (scene / sub).mkdir(parents=True)
    (root / "index.txt").write_text("scene_a\n")
    K = np.array([[100.0, 0, BW / 2], [0, 100.0, BH / 2], [0, 0, 1]])
    names = {}
    for i in range(1, 4):
        name = f"v{i:03d}"
        names[i] = name
        img = rng.integers(0, 255, (BH, BW, 3)).astype(np.uint8)
        cv2.imwrite(str(scene / "images" / f"{name}.png"), img)
        write_cam(scene / "cams" / f"{name}.txt", random_pose(rng), K,
                  80.0, 120.0)
        # depth encodes absolute pixel position so any shift is detectable
        yy, xx = np.mgrid[0:BH, 0:BW]
        depth = (yy * 1000 + xx).astype(np.float32) + 1.0
        write_pfm(scene / "depths" / f"{name}.pfm", depth)
    with open(scene / "info" / "image_path.txt", "w") as f:
        f.write("3\n")
        for i, n in names.items():
            f.write(f"{i} {n}.png images/{n}.png\n")
    with open(scene / "info" / "viewpair.txt", "w") as f:
        f.write("1\n1\n2 2 100 3 80\n")

    ds = WHUOMVSDataset(str(root), view_num=3, gt_format="pfm",
                        max_h=64, max_w=96)
    s = ds.build(0)
    assert s.imgs.shape[1:3] == (64, 96)
    # center window: start_h=(96-64)//2=16, start_w=(160-96)//2=32
    yy, xx = np.mgrid[16:16 + 64, 32:32 + 96]
    expected = (yy * 1000 + xx).astype(np.float32) + 1.0
    assert np.array_equal(s.depth_gt, expected)


def test_blendedmvs_layout(tmp_path, rng):
    """BlendedMVS-layout loader: MVSNet cam txt (Tcw direct), pair.txt,
    %08d naming (reference BlendedMVS_list, cas_rscv.py:195-240)."""
    import cv2

    from deep3d_aerial_tpu.train.dataset_whu import BlendedMVSDataset

    root = tmp_path / "bmvs"
    scan = root / "scan1"
    for sub in ["blended_images", "cams", "rendered_depth_maps"]:
        (scan / sub).mkdir(parents=True)
    (root / "index.txt").write_text("scan1\n")
    K = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]])
    for i in range(3):
        img = rng.integers(0, 255, (H, W, 3)).astype(np.uint8)
        cv2.imwrite(str(scan / "blended_images" / f"{i:08d}.jpg"), img)
        pose = random_pose(rng)
        T = pose.T_cw
        with open(scan / "cams" / f"{i:08d}_cam.txt", "w") as f:
            f.write("extrinsic\n")
            for r in range(4):
                f.write(" ".join(str(T[r, c]) for c in range(4)) + "\n")
            f.write("\nintrinsic\n")
            for r in range(3):
                f.write(" ".join(str(K[r, c]) for c in range(3)) + "\n")
            f.write("\n80.0 0.5 80 120.0\n")
        depth = rng.uniform(80, 120, (H, W)).astype(np.float32)
        write_pfm(scan / "rendered_depth_maps" / f"{i:08d}.pfm", depth)
    with open(scan / "cams" / "pair.txt", "w") as f:
        f.write("1\n0\n2 1 100 2 80\n")

    ds = BlendedMVSDataset(str(root), view_num=3)
    assert len(ds) == 1
    s = ds.build(0)
    assert s.imgs.shape == (3, H, W, 3)
    assert s.depth_min == 80.0 and s.depth_max == 120.0
    assert s.depth_gt.shape == (H, W)
    assert s.K_inv is not None
