import numpy as np
import pytest

from deep3d_aerial_tpu.geometry.camera import Pose, rotmat2qvec
from deep3d_aerial_tpu.io import text_formats as tf
from deep3d_aerial_tpu.sparse import colmap, view_selection
from deep3d_aerial_tpu.sparse.export import export_predef
from tests.conftest import random_pose, toy_camera


def synthetic_model(rng, n_images=8, n_points=400):
    """A downward-looking camera ring over a ground plane patch, with full
    per-point visibility tracks."""
    cam = toy_camera(width=640, height=480, f=600.0)
    cameras = {
        1: colmap.ColmapCamera(
            1, "PINHOLE", 640, 480,
            np.array([cam.fx, cam.fy, cam.cx, cam.cy], dtype=np.float64),
        )
    }

    poses = {}
    for i in range(n_images):
        pose = random_pose(rng, dist=100.0)
        poses[i + 1] = pose

    xyz = np.stack(
        [rng.uniform(-30, 30, n_points), rng.uniform(-30, 30, n_points),
         rng.uniform(-2, 2, n_points)], axis=1,
    )

    # visibility: point p seen by image i if it projects inside the frame
    tracks = {p: [] for p in range(n_points)}
    img_pts = {i: [] for i in poses}
    for iid, pose in poses.items():
        uv, depth = pose.world_to_image(cam.K, xyz)
        vis = (
            (uv[:, 0] >= 0) & (uv[:, 0] < 640) & (uv[:, 1] >= 0) & (uv[:, 1] < 480)
            & (depth > 0)
        )
        for p in np.nonzero(vis)[0]:
            tracks[p].append((iid, len(img_pts[iid])))
            img_pts[iid].append((uv[p], p))

    points = {}
    for p, track in tracks.items():
        if len(track) < 2:
            continue
        points[p + 1] = colmap.ColmapPoint3D(
            p + 1, xyz[p], np.array([128, 128, 128], np.uint8), 0.5,
            np.array([t[0] for t in track], np.int64),
            np.array([t[1] for t in track], np.int64),
        )

    images = {}
    for iid, pose in poses.items():
        obs = img_pts[iid]
        p3d = np.array(
            [p + 1 if (p + 1) in points else -1 for (_, p) in obs], np.int64
        )
        xys = np.array([uv for (uv, _) in obs]).reshape(-1, 2)
        images[iid] = colmap.ColmapImage(
            iid, rotmat2qvec(pose.R_cw), pose.t_cw, 1, f"img_{iid:03d}.png",
            xys, p3d,
        )
    return cameras, images, points


def test_colmap_binary_round_trip(tmp_path, rng):
    cameras, images, points = synthetic_model(rng)
    colmap.write_model(cameras, images, points, tmp_path)
    c2, i2, p2 = colmap.read_model(str(tmp_path))

    assert set(c2) == set(cameras) and set(i2) == set(images) and set(p2) == set(points)
    for iid in images:
        assert np.allclose(i2[iid].qvec, images[iid].qvec)
        assert np.allclose(i2[iid].tvec, images[iid].tvec)
        assert i2[iid].name == images[iid].name
        assert np.array_equal(i2[iid].point3D_ids, images[iid].point3D_ids)
    for pid in points:
        assert np.allclose(p2[pid].xyz, points[pid].xyz)
        assert np.array_equal(p2[pid].image_ids, points[pid].image_ids)


def test_scene_blocks_cover_border(rng):
    xyz = rng.uniform(-50, 50, size=(1000, 3))
    blocks, border = view_selection.compute_scene_blocks(
        xyz, block_size=[30, 30, 100], overlap=2.0
    )
    assert len(blocks) >= 9
    for b in blocks:
        assert b[1] - b[0] == pytest.approx(32.0)
    # the union of blocks covers the whole border
    assert min(b[0] for b in blocks) <= border[0]
    assert max(b[1] for b in blocks) >= border[1]


def test_view_selection_end_to_end(tmp_path, rng):
    cameras, images, points = synthetic_model(rng, n_images=10, n_points=800)
    colmap.write_model(cameras, images, points, tmp_path)

    xyz = np.stack([p.xyz for p in points.values()])
    blocks, border = view_selection.compute_scene_blocks(
        xyz, block_size=[40, 40, 100], overlap=2.0
    )
    block_refs, viewpairs = view_selection.select_views(
        str(tmp_path), blocks, mode="triangulated_points"
    )

    assert len(viewpairs) > 0
    ref_ids = {r for r, _ in viewpairs}
    for ref, pairs in viewpairs:
        assert ref not in [s for s, _ in pairs]  # no self pairing
        scores = [s for _, s in pairs]
        assert scores == sorted(scores, reverse=True)
        assert all(s > 10 for s in scores)

    # round-trip through the text contracts
    tf.write_view_pairs(tmp_path / "viewpair.txt", viewpairs)
    tf.write_blocks(tmp_path / "blocks.txt", block_refs)
    pairs_back = tf.read_view_pairs(tmp_path / "viewpair.txt")
    assert {r for r, _ in pairs_back} == ref_ids


def test_covisibility_matches_bruteforce(tmp_path, rng):
    cameras, images, points = synthetic_model(rng, n_images=6, n_points=300)
    index = view_selection.TrackIndex(images, points)

    for ref in images:
        counts = index.covisibility_counts(ref)
        # brute force
        brute = {}
        for pid in images[ref].point3D_ids:
            if pid > 0 and pid in points:
                for other in points[pid].image_ids:
                    brute[other] = brute.get(other, 0) + 1
        for iid in images:
            assert counts[iid] == brute.get(iid, 0)


def test_export_predef_depth_ranges(tmp_path, rng):
    cameras, images, points = synthetic_model(rng)
    colmap.write_model(cameras, images, points, tmp_path)
    out = tmp_path / "export"
    cams, predef = export_predef(str(tmp_path), str(out))

    assert (out / "cameras.txt").exists() and (out / "images.txt").exists()
    for im in predef.values():
        # cameras hover ~100 above ground at z in [-2, 2] (with tilt jitter)
        assert 80 < im.depth_min < 105
        assert im.depth_min < im.depth_max < 115

    # reading back produces the same canonical poses
    back = tf.read_predef_images(out / "images.txt")
    for iid, im in predef.items():
        assert np.allclose(back[iid].pose.R_cw, im.pose.R_cw, atol=1e-5)
        assert np.allclose(back[iid].pose.center, im.pose.center, atol=1e-3)
