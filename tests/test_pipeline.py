"""End-to-end pipeline test on a tiny synthetic workspace.

Builds a synthetic COLMAP model + rendered images of a textured terrain,
then runs every stage of AerialPipeline (with a tiny model config) and
checks the artifacts exist and are sane.
"""

import os

import numpy as np
import pytest

from deep3d_aerial_tpu.geometry.camera import Pose, rotmat2qvec
from deep3d_aerial_tpu.io import text_formats as tf
from deep3d_aerial_tpu.io.geotiff import read_geotiff
from deep3d_aerial_tpu.io.pfm import read_pfm
from deep3d_aerial_tpu.io.ply import read_ply
from deep3d_aerial_tpu.pipeline.config import PipelineConfig
from deep3d_aerial_tpu.pipeline.orchestrator import AerialPipeline
from deep3d_aerial_tpu.sparse import colmap

W_IMG, H_IMG = 96, 64
N_GRID = 3


def terrain_z(x, y):
    return 2.0 * np.sin(0.15 * x) * np.cos(0.1 * y)


def texture(x, y):
    return (
        0.5 + 0.25 * np.sin(0.9 * x) * np.cos(0.7 * y)
        + 0.25 * np.sin(0.23 * x + 1.3 * y)
    )


def render_view(pose, K):
    gx, gy = np.meshgrid(np.arange(W_IMG, dtype=np.float64),
                         np.arange(H_IMG, dtype=np.float64))
    Kinv = np.linalg.inv(K)
    rays = np.stack([gx, gy, np.ones_like(gx)], -1) @ Kinv.T @ pose.R_wc.T
    t = pose.center
    depth = (0.0 - t[2]) / rays[..., 2]
    for _ in range(30):
        w = t + rays * depth[..., None]
        depth = (terrain_z(w[..., 0], w[..., 1]) - t[2]) / rays[..., 2]
    w = t + rays * depth[..., None]
    img = texture(w[..., 0], w[..., 1])
    return np.clip(img * 255, 0, 255).astype(np.uint8)


def build_synthetic_workspace(ws, n_grid=N_GRID):
    """Build the tiny synthetic COLMAP workspace under `ws` (reused by the
    multihost driver test and scaling bench)."""
    ws.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(3)
    K = np.array([[110.0, 0, W_IMG / 2], [0, 110.0, H_IMG / 2], [0, 0, 1]])

    # camera grid, nadir with small jitter
    poses = {}
    iid = 1
    for gy in range(n_grid):
        for gx in range(n_grid):
            R_down = np.array([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]])
            c = np.array([(gx - (n_grid - 1) / 2) * 12.0,
                          (gy - (n_grid - 1) / 2) * 12.0, 100.0])
            poses[iid] = Pose(R_down, -R_down @ c)
            iid += 1

    # render images
    img_dir = ws / "images"
    img_dir.mkdir()
    from PIL import Image

    for i, pose in poses.items():
        img = render_view(pose, K)
        Image.fromarray(np.dstack([img] * 3)).save(img_dir / f"im_{i:02d}.png")

    # sparse points on the terrain
    n_pts = 4000
    xyz = np.stack([
        rng.uniform(-35, 35, n_pts), rng.uniform(-35, 35, n_pts),
        np.zeros(n_pts)], -1)
    xyz[:, 2] = terrain_z(xyz[:, 0], xyz[:, 1])

    tracks = {p: [] for p in range(n_pts)}
    imgobs = {i: [] for i in poses}
    for i, pose in poses.items():
        uv, d = pose.world_to_image(K, xyz)
        vis = ((uv[:, 0] >= 0) & (uv[:, 0] < W_IMG) & (uv[:, 1] >= 0)
               & (uv[:, 1] < H_IMG) & (d > 0))
        for p in np.nonzero(vis)[0]:
            tracks[p].append((i, len(imgobs[i])))
            imgobs[i].append((uv[p], p))

    points = {
        p + 1: colmap.ColmapPoint3D(
            p + 1, xyz[p], np.array([120, 120, 120], np.uint8), 0.4,
            np.array([t[0] for t in tr], np.int64),
            np.array([t[1] for t in tr], np.int64))
        for p, tr in tracks.items() if len(tr) >= 2
    }
    cameras = {1: colmap.ColmapCamera(
        1, "PINHOLE", W_IMG, H_IMG, np.array([K[0, 0], K[1, 1], K[0, 2], K[1, 2]]))}
    images = {
        i: colmap.ColmapImage(
            i, rotmat2qvec(poses[i].R_cw), poses[i].t_cw, 1, f"im_{i:02d}.png",
            np.array([uv for uv, _ in imgobs[i]]).reshape(-1, 2),
            np.array([p + 1 if p + 1 in points else -1 for _, p in imgobs[i]],
                     np.int64))
        for i in poses
    }

    sparse = ws / "sparse"
    sparse.mkdir()
    colmap.write_model(cameras, images, points, sparse)

    # image_path.txt
    export = ws / "export"
    export.mkdir()
    tf.write_image_paths(
        export / "image_path.txt",
        [(i, f"im_{i:02d}.png", str(img_dir / f"im_{i:02d}.png"))
         for i in poses],
    )
    return ws


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    return build_synthetic_workspace(tmp_path_factory.mktemp("ws"))


@pytest.fixture(scope="module")
def pipeline(workspace):
    cfg = PipelineConfig(
        image_w=W_IMG, image_h=H_IMG, image_scale=1.0,
        scene_block_size=[40.0, 40.0, 120.0], block_overlap=2.0,
        view_num=3, num_depth=32, min_interval=0.5,
        model_type="casmvsnet", allow_random_weights=True,
        fusion_num=4, geo_consist_num=2, photomatric_threshold=0.0,
        position_threshold=2.0, depth_threshold=0.05, normal_threshold=180.0,
        refine_photometric=True,
        dsm_source="pc", pc_select_method="Max",
        pc_interpolation_method="MovingAverage",
        dsm_uint=[2.0, 2.0], dsm_size=None,
    )
    # tiny model override through build kwargs: use default ndepths scaled in
    # dense_match via num_depth; casmvsnet default ndepths=(48,32,8) works at
    # num_depth=32 since hypotheses counts are independent
    return AerialPipeline(str(workspace), cfg)


def test_stage1_view_selection(pipeline, workspace):
    pipeline.select_view()
    export = workspace / "export"
    assert (export / "cameras.txt").exists()
    assert (export / "viewpair.txt").exists()
    blocks = tf.read_blocks(export / "blocks.txt")
    assert len(blocks) >= 1
    pairs = tf.read_view_pairs(export / "viewpair.txt")
    assert len(pairs) >= 4


def test_stage2_dense_match(pipeline, workspace):
    pipeline.cfg.save_dmap = True  # optional OpenMVS .dmap export
    pipeline.dense_match()
    mvs = workspace / "dense" / "MVS"
    pfms = [f for f in os.listdir(mvs) if f.endswith("_init.pfm")]
    assert len(pfms) >= 4
    d, _ = read_pfm(mvs / pfms[0])
    assert d.shape == (64, 96)
    assert np.isfinite(d).all()
    # depths near the hypothesis range (cameras at ~100 over terrain +-2)
    assert 80 < np.median(d) < 120

    # .dmap sidecar: same depth payload, camera pose round-trips
    from deep3d_aerial_tpu.io.dmap import read_dmap

    name = pfms[0][: -len("_init.pfm")]
    dm = read_dmap(mvs / f"{name}.dmap")
    np.testing.assert_array_equal(dm.depth, d)
    assert dm.confidence is not None and dm.confidence.shape == d.shape
    assert len(dm.neighbor_ids) >= 1
    assert dm.d_min < dm.d_max
    pipeline.cfg.save_dmap = False


def test_stage3_fusion(pipeline, workspace):
    results = pipeline.fuse_depth_map()
    assert len(results) >= 1
    pts, normals, colors = read_ply(results[0])
    # untrained network -> depths are noisy, but points must exist & be finite
    assert pts.shape[0] > 0
    assert np.isfinite(pts).all()
    assert colors is not None


def test_stage4_mesh(pipeline, workspace):
    out = pipeline.create_mesh()
    assert len(out) >= 1
    from deep3d_aerial_tpu.mesh.trimesh_io import read_mesh_ply

    v, f = read_mesh_ply(out[0])
    assert len(v) > 0


def test_stage5_dsm(pipeline, workspace):
    out = pipeline.create_dsm()
    assert out is not None
    grid, origin, cell, nodata = read_geotiff(out)
    assert cell == (2.0, 2.0)
    assert (workspace / "dsm" / "dsm.tfw").exists()


def test_production_copy(pipeline, workspace):
    pipeline.move_production()
    prod = workspace / "production"
    assert any((prod / "Point_Cloud").iterdir())
    assert any((prod / "DSM").iterdir())


def test_ensure_image_paths_from_data_folder(workspace, tmp_path):
    """--data_folder flow: image_path.txt is built from COLMAP names."""
    import shutil

    from deep3d_aerial_tpu.pipeline.config import PipelineConfig
    from deep3d_aerial_tpu.pipeline.orchestrator import AerialPipeline

    ws2 = tmp_path / "ws2"
    shutil.copytree(workspace / "sparse", ws2 / "sparse")
    pipe = AerialPipeline(str(ws2), PipelineConfig(),
                          data_folder=str(workspace / "images"))
    pipe._ensure_image_paths()
    paths, names = tf.read_image_paths(ws2 / "export" / "image_path.txt")
    assert len(paths) == N_GRID * N_GRID
    assert all(os.path.exists(p) for p in paths.values())
