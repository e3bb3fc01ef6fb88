"""Full-resolution end-to-end pipeline run (VERDICT r4 item 5).

Drives ALL five stages through AerialPipeline at the reference
production operating point — 1856x2752 frames (= 3712x5504 @ scale 0.5,
/root/reference/config.yaml:6-25), 5 views, 48/32/8 cascade, 384 depth
hypotheses — on a synthetic oblique survey, recording per-stage
wall-clock and host peak-RSS. The model/bench path was proven at this
size in round 3; fusion/mesh/DSM at production point-counts (5.1 Mpx
maps -> millions of candidate points) had never been driven.

Usage (chip):   python scripts/run_fullres_e2e.py
Knobs: E2E_H/E2E_W (default 1856/2752), E2E_GRID (default 3x2 views),
       E2E_CKPT (default the r4 epoch-3 adamvs checkpoint).
Writes logs/fullres_e2e.json + a markdown table on stdout.
"""

import json
import os
import pathlib
import resource
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def build_workspace(ws: pathlib.Path, W, H, nx, ny):
    from PIL import Image

    from deep3d_aerial_tpu.geometry.camera import Pose, rotmat2qvec
    from deep3d_aerial_tpu.io import text_formats as tf
    from deep3d_aerial_tpu.sparse import colmap
    from scripts.train_synthetic import render, terrain_z

    ws.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(42)
    # focal scaled as in train_synthetic: ~37 m half-footprint at 100 m
    f = 130.0 * (W / 96.0)
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    seed = 7

    poses = {}
    iid = 1
    # survey grid at ~55% side-lap (0.45 footprint spacing)
    fp = W / f * 100.0
    for gy in range(ny):
        for gx in range(nx):
            R_down = np.array([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]])
            c = np.array([(gx - (nx - 1) / 2) * 0.45 * fp,
                          (gy - (ny - 1) / 2) * 0.45 * fp * H / W,
                          100.0 + rng.uniform(-2, 2)])
            poses[iid] = Pose(R_down, -R_down @ c)
            iid += 1

    img_dir = ws / "images"
    img_dir.mkdir(exist_ok=True)
    t0 = time.time()
    for i, pose in poses.items():
        p = img_dir / f"im_{i:02d}.png"
        if p.exists():
            continue
        img, _ = render(pose, K, W, H, seed, aa=1)
        Image.fromarray(
            np.dstack([(img * 255).astype(np.uint8)] * 3)).save(p)
    print(f"[e2e] rendered {len(poses)} {W}x{H} views in "
          f"{time.time()-t0:.0f}s", flush=True)

    # sparse points for per-image depth ranges + view selection
    n_pts = 20000
    xyz = np.stack([rng.uniform(-60, 60, n_pts),
                    rng.uniform(-60, 60, n_pts),
                    np.zeros(n_pts)], -1)
    xyz[:, 2] = terrain_z(xyz[:, 0], xyz[:, 1], seed)

    tracks = {p: [] for p in range(n_pts)}
    imgobs = {i: [] for i in poses}
    for i, pose in poses.items():
        uv, d = pose.world_to_image(K, xyz)
        vis = ((uv[:, 0] >= 0) & (uv[:, 0] < W) & (uv[:, 1] >= 0)
               & (uv[:, 1] < H) & (d > 0))
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
        1, "PINHOLE", W, H,
        np.array([K[0, 0], K[1, 1], K[0, 2], K[1, 2]]))}
    images = {
        i: colmap.ColmapImage(
            i, rotmat2qvec(poses[i].R_cw), poses[i].t_cw, 1,
            f"im_{i:02d}.png",
            np.array([uv for uv, _ in imgobs[i]]).reshape(-1, 2),
            np.array([p + 1 if p + 1 in points else -1
                      for _, p in imgobs[i]], np.int64))
        for i in poses
    }
    sparse = ws / "sparse"
    if not sparse.exists():
        sparse.mkdir()
        colmap.write_model(cameras, images, points, sparse)
    export = ws / "export"
    export.mkdir(exist_ok=True)
    tf.write_image_paths(
        export / "image_path.txt",
        [(i, f"im_{i:02d}.png", str(img_dir / f"im_{i:02d}.png"))
         for i in poses])
    return ws


def peak_rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20


def main():
    H = int(os.environ.get("E2E_H", "1856"))
    W = int(os.environ.get("E2E_W", "2752"))
    nx, ny = (int(x) for x in os.environ.get("E2E_GRID", "3,2").split(","))
    ckpt = os.environ.get(
        "E2E_CKPT",
        "checkpoints/synthetic_adamvs_ref512_r4/model_000003_1.4325")

    from deep3d_aerial_tpu.pipeline.config import PipelineConfig
    from deep3d_aerial_tpu.pipeline.orchestrator import AerialPipeline

    ws = pathlib.Path(os.environ.get("E2E_WS", "/tmp/fullres_e2e_ws"))
    build_workspace(ws, W, H, nx, ny)

    cfg = PipelineConfig(
        image_w=W, image_h=H, image_scale=1.0,
        scene_block_size=[200.0, 200.0, 300.0], block_overlap=4.0,
        view_num=5, num_depth=384, min_interval=0.1,
        model_type="adamvs", ndepths=[48, 32, 8],
        pretrain_weight=os.path.abspath(ckpt),
        compute_dtype="bfloat16",
        fusion_num=5, geo_consist_num=3,
        photomatric_threshold=0.2, position_threshold=1.0,
        depth_threshold=0.01, normal_threshold=90.0,
        refine_photometric=False,  # variational refine at 5 Mpx x V
        # images is a many-hour CPU job; reconstruct+texture (the
        # reference's own staged split) is the timed path
        dsm_source="pc", pc_select_method="Robust_Max",
        pc_interpolation_method="MovingAverage",
        dsm_uint=[0.2, 0.2], dsm_size=None,
    )
    pipe = AerialPipeline(str(ws), cfg)

    stages = [
        ("view_selection", pipe.select_view),
        ("dense_match", pipe.dense_match),
        ("fusion", pipe.fuse_depth_map),
        ("mesh", pipe.create_mesh),
        ("dsm", pipe.create_dsm),
    ]
    timings = {}
    for name, fn in stages:
        t0 = time.time()
        fn()
        timings[name] = {"wall_s": round(time.time() - t0, 1),
                         "peak_rss_gb": round(peak_rss_gb(), 2)}
        print(f"[e2e] {name}: {timings[name]}", flush=True)

    out = {"H": H, "W": W, "views": nx * ny, "ckpt": ckpt,
           "timings": timings}
    pathlib.Path("logs").mkdir(exist_ok=True)
    with open("logs/fullres_e2e.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print("| stage | wall (s) | peak RSS (GB) |")
    print("|---|---|---|")
    for k, v in timings.items():
        print(f"| {k} | {v['wall_s']} | {v['peak_rss_gb']} |")


if __name__ == "__main__":
    main()
