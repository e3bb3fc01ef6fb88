"""Accuracy loop closure: run the PIPELINE with the TRAINED checkpoint on a
held-out synthetic scene and measure depth + fused-cloud quality vs GT —
and vs the random-weights control.

Run AFTER scripts/train_synthetic.py. Appends the table to docs/ACCURACY.md.
"""

import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_workspace(ws, scene_seed, n_grid=3, W_IMG=96, H_IMG=64):
    from PIL import Image

    from deep3d_aerial_tpu.geometry.camera import Pose, rotmat2qvec
    from deep3d_aerial_tpu.io import text_formats as tf
    from deep3d_aerial_tpu.sparse import colmap
    from scripts.train_synthetic import render, terrain_z

    os.makedirs(ws, exist_ok=True)
    rng = np.random.default_rng(scene_seed)
    # focal tracks image width (same footprint at every eval resolution —
    # matches train_synthetic.make_sample)
    f = 130.0 * (W_IMG / 96.0)
    K = np.array([[f, 0, W_IMG / 2], [0, f, H_IMG / 2], [0, 0, 1.0]])

    poses, gt_depths, iid = {}, {}, 1
    img_dir = os.path.join(ws, "images")
    os.makedirs(img_dir, exist_ok=True)
    # Grid spacing in meters. The legacy 10 m spacing at 100 m height is
    # depth-INSENSITIVE (~0.7 px/m at W=512): one 1%-relative depth step
    # moves features < 1 px, capping achievable agreement regardless of
    # the model (see train_synthetic.make_sample 'wide' note). Default
    # tracks the footprint (0.55 half-footprints between neighbors, ~65%
    # overlap — a realistic survey); TS_EVAL_SPACING overrides.
    half_fp = (W_IMG / 2) / f * 100.0
    spacing = float(os.environ.get("TS_EVAL_SPACING",
                                   str(round(0.55 * half_fp, 2))))
    for gy in range(n_grid):
        for gx in range(n_grid):
            R = np.array([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]])
            c = np.array([(gx - (n_grid - 1) / 2) * spacing,
                          (gy - (n_grid - 1) / 2) * spacing, 100.0])
            pose = Pose(R, -R @ c)
            poses[iid] = pose
            img, depth = render(pose, K, W_IMG, H_IMG, scene_seed)
            gt_depths[iid] = depth
            Image.fromarray(
                (np.dstack([img] * 3) * 255).astype(np.uint8)
            ).save(os.path.join(img_dir, f"im_{iid:02d}.png"))
            iid += 1

    # sparse points from GT depth back-projections (subsampled)
    rng2 = np.random.default_rng(scene_seed + 1)
    xyz = np.column_stack([
        rng2.uniform(-25, 25, 4000), rng2.uniform(-25, 25, 4000),
        np.zeros(4000)])
    xyz[:, 2] = terrain_z(xyz[:, 0], xyz[:, 1], scene_seed)

    tracks = {p: [] for p in range(len(xyz))}
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
        for p, tr in tracks.items() if len(tr) >= 2}
    cameras = {1: colmap.ColmapCamera(
        1, "PINHOLE", W_IMG, H_IMG,
        np.array([K[0, 0], K[1, 1], K[0, 2], K[1, 2]]))}
    images = {
        i: colmap.ColmapImage(
            i, rotmat2qvec(poses[i].R_cw), poses[i].t_cw, 1,
            f"im_{i:02d}.png",
            np.array([uv for uv, _ in imgobs[i]]).reshape(-1, 2),
            np.array([p + 1 if p + 1 in points else -1
                      for _, p in imgobs[i]], np.int64))
        for i in poses}
    sp = os.path.join(ws, "sparse")
    os.makedirs(sp, exist_ok=True)
    colmap.write_model(cameras, images, points, sp)
    export = os.path.join(ws, "export")
    os.makedirs(export, exist_ok=True)
    tf.write_image_paths(
        os.path.join(export, "image_path.txt"),
        [(i, f"im_{i:02d}.png", os.path.join(img_dir, f"im_{i:02d}.png"))
         for i in poses])
    return gt_depths, scene_seed


def run_pipe(ws, ckpt, label, W_IMG=96, H_IMG=64, view_num=3,
             num_depth=64, ndepths=(16, 8, 8), min_interval=0.5,
             depth_ratios=None):
    from deep3d_aerial_tpu.io.pfm import read_pfm
    from deep3d_aerial_tpu.pipeline.config import PipelineConfig
    from deep3d_aerial_tpu.pipeline.orchestrator import AerialPipeline

    cfg = PipelineConfig(
        image_w=W_IMG, image_h=H_IMG, image_scale=1.0,
        scene_block_size=[60.0, 60.0, 120.0], block_overlap=2.0,
        view_num=view_num, num_depth=num_depth, ndepths=list(ndepths),
        depth_ratios=list(depth_ratios) if depth_ratios else None,
        min_interval=min_interval,
        model_type="adamvs",
        pretrain_weight=ckpt, allow_random_weights=ckpt is None,
        # fusion strictness: defaults follow the REFERENCE production
        # acceptance (config.yaml:28-34 — geo>=4, prob>0.2, 1 px, 1%);
        # env knobs let ablations relax them (the round-3 evals ran
        # geo>=3 / prob>0.1, looser than the reference's own filter)
        fusion_num=int(os.environ.get("TS_EVAL_FUSION_NUM", "8")),
        geo_consist_num=int(os.environ.get("TS_EVAL_GEO", "4")),
        photomatric_threshold=float(os.environ.get("TS_EVAL_PROB", "0.2")),
        position_threshold=1.0, depth_threshold=0.01, normal_threshold=180.0,
        run_create_mesh=False, run_create_dsm=False,
    )
    pipe = AerialPipeline(ws, cfg)
    pipe.select_view()
    pipe.dense_match()
    pipe.fuse_depth_map()
    depths = {}
    mvs = os.path.join(ws, "dense", "MVS")
    for f in os.listdir(mvs):
        if f.endswith("_init.pfm"):
            iid = int(f.split("_")[1])
            depths[iid] = read_pfm(os.path.join(mvs, f))[0]
    clouds = []
    fus = os.path.join(ws, "dense", "fusion")
    from deep3d_aerial_tpu.io.ply import read_ply

    for f in os.listdir(fus):
        if f.endswith(".ply"):
            clouds.append(read_ply(os.path.join(fus, f))[0])
    cloud = np.concatenate(clouds) if clouds else np.zeros((0, 3))
    return depths, cloud


def main():
    from deep3d_aerial_tpu.fusion.evaluate import surface_rmse
    from scripts.train_synthetic import terrain_z

    model = os.environ.get("TS_MODEL", "adamvs")
    ckpt_root = os.environ.get(
        "TS_CKPT_DIR",
        os.path.join(os.path.dirname(__file__), "..",
                     "checkpoints", f"synthetic_{model}"))
    from deep3d_aerial_tpu.train.checkpoint import best_checkpoint

    ckpt = best_checkpoint(os.path.abspath(ckpt_root))
    assert ckpt, f"no checkpoint under {ckpt_root} — run train_synthetic first"
    print(f"[ckpt] {ckpt}")

    seed = int(os.environ.get("TS_EVAL_SEED", "9100"))  # held out
    # operating point (defaults = the toy point; the reference-scale runs
    # set these to the training config: 384x512, 5 views, 48/32/8, 384)
    W_IMG = int(os.environ.get("TS_EVAL_W", "96"))
    H_IMG = int(os.environ.get("TS_EVAL_H", "64"))
    view_num = int(os.environ.get("TS_EVAL_VIEWS", "3"))
    num_depth = int(os.environ.get("TS_EVAL_NUM_DEPTH", "64"))
    ndepths = tuple(int(x) for x in
                    os.environ.get("TS_EVAL_NDEPTHS", "16,8,8").split(","))
    min_interval = float(os.environ.get("TS_EVAL_MIN_INTERVAL", "0.5"))
    ratios_env = os.environ.get("TS_EVAL_RATIOS")
    depth_ratios = (tuple(float(x) for x in ratios_env.split(","))
                    if ratios_env else None)
    skip_random = os.environ.get("TS_EVAL_SKIP_RANDOM", "0") == "1"
    results = {}
    cases = [("trained", ckpt)] + ([] if skip_random else [("random", None)])
    for label, c in cases:
        ws = f"/tmp/eval_trained/{label}"
        import shutil

        if os.path.exists(ws):
            shutil.rmtree(ws)
        gt_depths, _ = build_workspace(ws, seed, W_IMG=W_IMG, H_IMG=H_IMG)
        depths, cloud = run_pipe(ws, c, label, W_IMG=W_IMG, H_IMG=H_IMG,
                                 view_num=view_num, num_depth=num_depth,
                                 ndepths=ndepths, min_interval=min_interval,
                                 depth_ratios=depth_ratios)
        errs, agree = [], []
        for iid, est in depths.items():
            gt = gt_depths[iid]
            v = gt > 0
            err = np.abs(est[v] - gt[v])
            errs.append(np.mean(np.minimum(err, 50.0)))
            agree.append(np.mean(np.abs(est[v] - gt[v]) / gt[v] < 0.01))
        rmse = surface_rmse(
            cloud, lambda x, y: terrain_z(x, y, seed)) if len(cloud) else None
        # the BASELINE acceptance is on the FUSED cloud: fraction of fused
        # points within 1% relative depth of the true surface (cameras at
        # z ~= 100, so depth ~= 100 - z). The per-pixel depth-map number
        # (rel_1pct_agreement) is the stricter unfiltered metric.
        fused_agree = None
        if len(cloud):
            dz = np.abs(cloud[:, 2]
                        - terrain_z(cloud[:, 0], cloud[:, 1], seed))
            fused_agree = float(np.mean(
                dz < 0.01 * np.maximum(100.0 - cloud[:, 2], 1.0)))
        results[label] = {
            "depth_mae": float(np.mean(errs)),
            "rel_1pct_agreement": float(np.mean(agree)),
            "fused_rel_1pct_agreement": fused_agree,
            "fused_points": int(len(cloud)),
            "fused_surface_rmse_trim95": rmse,
        }
        print(json.dumps({label: results[label]}), flush=True)

    out = {"checkpoint": ckpt, "eval_seed": seed,
           "operating_point": {"W": W_IMG, "H": H_IMG, "views": view_num,
                               "ndepths": list(ndepths),
                               "depth_ratios": (list(depth_ratios)
                                                if depth_ratios else None),
                               "num_depth": num_depth,
                               "min_interval": min_interval},
           **results}
    acc_path = os.path.join(os.path.dirname(__file__), "..", "docs",
                            "ACCURACY.md")
    with open(acc_path, "a") as f:
        f.write("\n## eval_trained run\n\n```json\n"
                + json.dumps(out, indent=1) + "\n```\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
