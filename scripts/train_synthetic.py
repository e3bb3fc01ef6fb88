"""Train the flagship model on a realistic synthetic oblique dataset and
demonstrate the full accuracy loop: convergence curve -> checkpoint ->
pipeline inference with the TRAINED weights -> fused cloud agreement.

WHU_OMVS itself is not present in this environment (the reference's
checkpoints are missing blobs upstream too — BASELINE.md); this script is
the reference-statistics stand-in: textured terrain with buildings,
oblique multi-view geometry, per-scene depth ranges, photometric noise.

Usage:
  python scripts/train_synthetic.py            # train on the chip (or CPU
                                               #   with JAX_PLATFORMS=cpu)
  TS_STEPS=400 TS_MODEL=adamvs ... knobs below
Outputs:
  checkpoints/synthetic_<model>/  orbax checkpoints + train_record.txt + tb/
  docs/ACCURACY.md                 metrics table (appended)
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


# ----------------------------------------------------------- scene maker
def terrain_z(x, y, seed):
    """Terrain + box buildings: oblique-scene statistics in miniature."""
    rng = np.random.default_rng(seed)
    f1, f2 = rng.uniform(0.08, 0.2, 2)
    a = rng.uniform(1.0, 3.0)
    z = a * np.sin(f1 * x) * np.cos(f2 * y)
    # rectangular "buildings"
    for _ in range(3):
        cx, cy = rng.uniform(-20, 20, 2)
        w, h = rng.uniform(4, 9, 2)
        ht = rng.uniform(4, 10)
        z = z + ht * ((np.abs(x - cx) < w / 2) & (np.abs(y - cy) < h / 2))
    return z


def texture(x, y, seed):
    rng = np.random.default_rng(seed + 1)
    ph = rng.uniform(0, 6.28, 4)
    t = (0.5 + 0.2 * np.sin(0.9 * x + ph[0]) * np.cos(0.7 * y + ph[1])
         + 0.2 * np.sin(0.31 * x + 1.3 * y + ph[2])
         + 0.1 * np.sin(2.3 * x + ph[3]))
    if os.environ.get("TS_TEX", "legacy") == "rich":
        # high-frequency octaves (0.15-0.8 m wavelengths): real aerial
        # imagery is richly textured at the GSD; the legacy 3-sinusoid
        # texture has nothing to match below ~2.7 m wavelength, which
        # caps fine-interval (0.09 m) convergence — the round-3 plateau
        # (docs/ACCURACY.md)
        ph2 = rng.uniform(0, 6.28, 6)
        fr = rng.uniform(0.85, 1.15, 6)
        t = (t + 0.12 * np.sin(8.1 * fr[0] * x + ph2[0])
             * np.cos(7.3 * fr[1] * y + ph2[1])
             + 0.10 * np.sin(17.0 * fr[2] * x + 13.0 * fr[3] * y + ph2[2])
             + 0.08 * np.sin(41.0 * fr[4] * x + ph2[3])
             * np.sin(37.0 * fr[5] * y + ph2[4])
             + 0.05 * np.sin(23.0 * (x + y) * fr[0] + ph2[5]))
    return t


def render(pose, K, W, H, seed, aa=None):
    gx, gy = np.meshgrid(np.arange(W, dtype=np.float64),
                         np.arange(H, dtype=np.float64))
    Kinv = np.linalg.inv(K)
    rays = np.stack([gx, gy, np.ones_like(gx)], -1) @ Kinv.T @ pose.R_wc.T
    t = pose.center
    depth = (0.0 - t[2]) / rays[..., 2]
    for _ in range(40):
        w = t + rays * depth[..., None]
        depth = (terrain_z(w[..., 0], w[..., 1], seed) - t[2]) / rays[..., 2]
    w = t + rays * depth[..., None]
    if aa is None:
        aa = int(os.environ.get("TS_AA", "3"))
    if aa <= 1:
        img = np.clip(texture(w[..., 0], w[..., 1], seed), 0, 1)
    else:
        # Pixel-footprint antialiasing: a camera integrates radiance over
        # the pixel, so point-sampling the texture turns any near-Nyquist
        # octave (TS_TEX=rich's 0.15-0.19 m wavelengths at the 384x512
        # GSD of ~0.14 m/px) into VIEW-INCONSISTENT noise that actively
        # hurts matching. Box-average an aa x aa subpixel grid at the
        # converged depth (depth varies negligibly within one footprint).
        e_u = Kinv.T[0] @ pose.R_wc.T
        e_v = Kinv.T[1] @ pose.R_wc.T
        offs = (np.arange(aa) + 0.5) / aa - 0.5
        img = np.zeros((H, W))
        for du in offs:
            for dv in offs:
                wo = t + (rays + du * e_u + dv * e_v) * depth[..., None]
                img += texture(wo[..., 0], wo[..., 1], seed)
        img = np.clip(img / (aa * aa), 0, 1)
    return img.astype(np.float32), depth.astype(np.float32)


def _look_at(center, target):
    """R_cw rows = camera axes in world coords, +z toward `target`,
    up-hint keeping the nadir limit at the canonical XrightYdown frame."""
    z = target - center
    z = z / np.linalg.norm(z)
    x = np.cross(np.array([0.0, -1.0, 0.0]), z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    return np.stack([x, y, z])


def make_sample(rng, scene_seed, V, H, W):
    from deep3d_aerial_tpu.geometry.camera import (
        Pose, proj_matrix, stage_relative_projections,
    )

    # focal scales with W so the ground footprint (and the fixed-point GT
    # ray marcher's convergence) is size-invariant: 130 px at W=96 ==
    # the reference-like ~20 deg half-FOV at every training resolution
    f = 130.0 * (W / 96.0)
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    imgs, projs = [], []
    depth_gt = None
    grid_style = rng.random() < 0.5  # half the scenes mimic nadir surveys
    wide = os.environ.get("TS_GEOM", "wide") == "wide"
    # Depth sensitivity is set by the base-to-height ratio: d(disparity)/
    # d(depth) ~= f * baseline / depth^2. The legacy ring (offsets <= ~14 m
    # at 100 m height) gives ~0.8 px/m at W=512 — one hypothesis interval
    # (0.09 m) is 0.07 px of parallax, so fine-interval accuracy was
    # GEOMETRY-capped, not model-capped (the round-3 plateau). Real aerial
    # surveys (WHU: ~60-80% overlap) fly ~0.3-0.6 footprint baselines;
    # 'wide' mimics that: sources on a ring of ~0.55-0.9x the half-
    # footprint, AIMED at the scene (real oblique rigs point their
    # cameras), ~1.5-2.3 px/m — while keeping every source's view overlap.
    half_fp = (W / 2) / f * 100.0  # ~37 m half-footprint at 100 m
    ref_xy = np.zeros(2)
    for v in range(V):
        h = rng.uniform(90, 110)
        if grid_style:
            if wide:
                # survey row: sources ring the REFERENCE view at 0.35-0.7
                # half-footprints (the ~60-80% overlap the reference's
                # covisibility-scored view selection would pick), instead
                # of independent uniform draws whose corner pairs barely
                # overlap
                if v == 0:
                    cx, cy = rng.uniform(-6, 6, 2)
                    ref_xy = np.array([cx, cy])
                else:
                    yaw = rng.uniform(0, 2 * np.pi)
                    r = rng.uniform(0.35, 0.7) * half_fp
                    cx = ref_xy[0] + r * np.cos(yaw)
                    cy = ref_xy[1] + r * np.sin(yaw)
            else:
                cx = rng.uniform(-12, 12)
                cy = rng.uniform(-12, 12)
            tilt = rng.uniform(0, 0.04)
        else:
            if v == 0:
                cx, cy = rng.uniform(-4, 4, 2)
                tilt = rng.uniform(0, 0.05)
            else:
                yaw = rng.uniform(0, 2 * np.pi)
                r = (rng.uniform(0.55, 0.9) * half_fp if wide
                     else 10 * rng.uniform(0.2, 1.0))
                cx = r * np.cos(yaw) + rng.uniform(-4, 4)
                cy = r * np.sin(yaw) + rng.uniform(-4, 4)
                tilt = rng.uniform(0.05, 0.25)
        center = np.array([cx, cy, h])
        if wide and not grid_style and v > 0:
            # aim at a jittered point near the scene center: the oblique
            # ring keeps the reference view's ground area in frame
            target = np.array([rng.uniform(-5, 5), rng.uniform(-5, 5), 0.0])
            R_cw = _look_at(center, target)
        else:
            R_down = np.array([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]])
            ca, sa = np.cos(tilt), np.sin(tilt)
            R_tilt = np.array([[1, 0, 0], [0, ca, -sa], [0, sa, ca]])
            R_cw = R_tilt @ R_down
        pose = Pose(R_cw, -R_cw @ center)
        img, depth = render(pose, K, W, H, scene_seed)
        img = img + rng.normal(0, 0.01, img.shape)  # sensor noise
        imgs.append(np.dstack([img] * 3))
        projs.append(proj_matrix(K, pose))
        if v == 0:
            depth_gt = depth
    rel = stage_relative_projections(np.stack(projs), 3)
    dmin, dmax = float(depth_gt.min() * 0.9), float(depth_gt.max() * 1.1)
    return {
        "imgs": np.stack(imgs).astype(np.float32),
        "rel_projs": rel.astype(np.float32),
        "depth_min": dmin,
        "depth_max": dmax,
        "depth_gt": depth_gt,
        "mask": (depth_gt > 0).astype(np.float32),
    }


def _make_sample_seeded(args):
    """Picklable worker: per-scene camera rng derived from the scene seed
    (deterministic regardless of pool scheduling)."""
    scene_seed, V, H, W = args
    rng = np.random.default_rng(10_000_019 + scene_seed)
    return make_sample(rng, scene_seed, V, H, W)


def make_samples_parallel(seeds, V, H, W, workers=None):
    """Render scenes across processes — the 384x512 reference-scale point
    costs seconds/scene serially."""
    import multiprocessing as mp

    args = [(s, V, H, W) for s in seeds]
    if len(args) <= 2 or (workers is not None and workers <= 1):
        return [_make_sample_seeded(a) for a in args]
    workers = workers or min(mp.cpu_count(), 8, len(args))
    # spawn, not fork: forking a multithreaded JAX process can deadlock
    # a worker on a copied lock (observed: r5w run futex-stuck before
    # the first eval); spawn re-imports but renders are seconds each
    with mp.get_context(os.environ.get("TS_MP", "spawn")).Pool(workers) as pool:
        return pool.map(_make_sample_seeded, args)


def batches_of(samples, bs):
    out = []
    for i in range(0, len(samples) - bs + 1, bs):
        grp = samples[i:i + bs]
        out.append({
            "imgs": np.stack([s["imgs"] for s in grp]),
            "rel_projs": np.stack([s["rel_projs"] for s in grp]),
            "depth_min": np.array([s["depth_min"] for s in grp], np.float32),
            "depth_max": np.array([s["depth_max"] for s in grp], np.float32),
            "depth_gt": np.stack([s["depth_gt"] for s in grp]),
            "mask": np.stack([s["mask"] for s in grp]),
        })
    return out


def main():
    model_name = os.environ.get("TS_MODEL", "adamvs")
    V = int(os.environ.get("TS_VIEWS", "3"))
    H = int(os.environ.get("TS_H", "64"))
    W = int(os.environ.get("TS_W", "96"))
    epochs = int(os.environ.get("TS_EPOCHS", "12"))
    n_train = int(os.environ.get("TS_TRAIN_SCENES", "48"))
    n_val = int(os.environ.get("TS_VAL_SCENES", "8"))
    bs = int(os.environ.get("TS_BS", "2"))
    ndepths = tuple(int(x) for x in
                    os.environ.get("TS_NDEPTHS", "16,8,8").split(","))
    num_depth = int(os.environ.get("TS_NUM_DEPTH", "64"))
    # compute path: the fused kernels carry custom VJPs (XLA-formulation
    # backward), so training takes the kernel forward throughput with
    # exact gradients — required at the reference-scale operating point
    warp_impl = os.environ.get("TS_WARP", "xla")
    red_impl = os.environ.get("TS_RED", "flax")
    depth_shards = int(os.environ.get("TS_SHARDS", "1"))

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from deep3d_aerial_tpu.models import build_model
    from deep3d_aerial_tpu.train.trainer import Trainer, TrainerConfig

    fresh = os.environ.get("TS_FRESH", "1") == "1"

    print(f"[data] rendering {n_train}+{n_val} scenes ...", flush=True)
    if os.environ.get("TS_PAR_RENDER", "1") == "1":
        train_s = make_samples_parallel(
            [1000 + i for i in range(n_train)], V, H, W)
        val_s = make_samples_parallel(
            [9000 + i for i in range(n_val)], V, H, W)
    else:
        rng = np.random.default_rng(7)
        train_s = [make_sample(rng, 1000 + i, V, H, W) for i in range(n_train)]
        val_s = [make_sample(rng, 9000 + i, V, H, W) for i in range(n_val)]
    train_b = batches_of(train_s, bs)
    val_b = batches_of(val_s, 1)

    if fresh:
        # Infinite procedural data: render a brand-new scene set for every
        # epoch in a background thread (~0.07 s/scene — fully overlapped
        # with the on-chip epoch). Kills the small-set overfitting that
        # plateaued the fixed-64-scene run at val 1.14.
        import queue as _queue
        import threading

        q: "_queue.Queue" = _queue.Queue(maxsize=1)
        seed_counter = [1000 + n_train]

        def _producer():
            while True:
                s0 = seed_counter[0]
                seed_counter[0] += n_train
                # process-parallel render: serial generation at the
                # reference-scale point (~7 s/scene) would starve the chip
                scenes = make_samples_parallel(
                    [s0 + i for i in range(n_train)], V, H, W)
                q.put(batches_of(scenes, bs))

        threading.Thread(target=_producer, daemon=True).start()

        def next_epoch_batches():
            return q.get()
    else:
        def next_epoch_batches():
            return train_b

    # min_interval for metrics: mean range / num_depth
    rngs = [s["depth_max"] - s["depth_min"] for s in val_s]
    interval = float(np.mean(rngs)) / num_depth

    extra = {"warp_impl": warp_impl}
    if os.environ.get("TS_RATIOS"):
        # cascade window ratios (reference predict.py:54-55 analog).
        # The r5 stage-localization probe (logs/stage_probe.log) showed
        # the default (4,2,1) windows are narrower than stage-1's
        # achievable accuracy at synthetic depth ranges (stage-2 window
        # +-1.0 m vs stage-1 MAE 1.3-3.0 m -> truth escapes the cascade);
        # wide-window training fixes the mismatch the reference's fixed
        # min_interval=0.1 m avoids implicitly.
        extra["depth_interval_ratios"] = tuple(
            float(x) for x in os.environ["TS_RATIOS"].split(","))
    if os.environ.get("TS_DTYPE", "float32") == "bfloat16":
        # mixed-precision training: bf16 compute (features/convs —
        # flax param_dtype stays f32, geometry stays f32 by design), a
        # lever on the XLA-formulation backward that bounds the step
        # time (docs/PERF.md round-5 train-throughput note)
        import jax.numpy as _jnp

        extra["dtype"] = _jnp.bfloat16
    if model_name in ("adamvs", "msrednet"):
        extra["depth_shards"] = depth_shards
        extra["red_impl"] = red_impl
        # smaller scan chunks shrink the live warp buffers (the sp2
        # training graph at 384x512 misses the HBM budget by 47 MB at
        # chunk=8 — the batched-block backward doubles the chunk volume)
        extra["plane_chunk"] = int(os.environ.get("TS_CHUNK", "8"))
    model = build_model(model_name, ndepths=ndepths, num_depth=num_depth,
                        **extra)
    ckpt_dir = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "checkpoints",
                     os.environ.get("TS_CKPT", f"synthetic_{model_name}")))
    tcfg = TrainerConfig(
        lr=float(os.environ.get("TS_LR", "8e-4")),
        lr_epochs=os.environ.get(
            "TS_LR_EPOCHS", f"{epochs * 2 // 3},{epochs * 5 // 6}:2"),
        epochs=epochs, batch_size=bs, min_interval=interval,
        ckpt_dir=ckpt_dir, log_every=10, optimizer="adam",
        # defaults on: the r4 run showed loss spikes to 13-15 on the
        # wide-baseline generator that clipping + a short warmup tame
        clip_norm=float(os.environ.get("TS_CLIP", "3.0")),
        warmup_steps=int(os.environ.get("TS_WARMUP", "200")),
        pair_weight=1.0 if model_name == "adamvs" else 0.0,
    )
    trainer = Trainer(model, tcfg, steps_per_epoch=len(train_b))
    trainer.init(train_b[0])
    warm = os.environ.get("TS_WARM")
    if warm:
        # warm start (reference --loadckpt analog, train_whu.py:148-153);
        # param trees port across depth_shards (blocking is a model spec,
        # not a param shape — models/cascade.py)
        from deep3d_aerial_tpu.train import checkpoint as _ckpt

        payload = _ckpt.restore_checkpoint(warm)
        merged, n_ok, n_skip, skipped = _ckpt.merge_matching_params(
            trainer.params, payload["params"])
        trainer.params = merged
        import jax as _jax
        n_warm = len(_jax.tree_util.tree_leaves(payload["params"]))
        n_unmatched = n_warm - n_ok - n_skip
        print(f"[warm] loaded params from {warm} "
              f"({n_ok} leaves ported, {n_skip} shape/dtype-mismatched "
              f"kept at init, {n_unmatched} warm leaves with no matching "
              f"init path"
              f"{': ' + ', '.join(skipped[:4]) if skipped else ''})",
              flush=True)
    before = trainer.evaluate(val_b)
    print(f"[eval] untrained: {before}", flush=True)
    t0 = time.time()
    trainer.fit(next_epoch_batches, lambda: val_b)
    after = trainer.evaluate(val_b)
    print(f"[eval] trained:   {after}  ({time.time()-t0:.0f}s)", flush=True)

    summary = {
        "model": model_name, "ndepths": list(ndepths),
        "num_depth": num_depth, "interval": interval,
        "scenes": n_train, "epochs": epochs,
        "untrained": before, "trained": after,
        "ckpt_dir": ckpt_dir,
    }
    with open(os.path.join(ckpt_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items()
                      if k in ("untrained", "trained")}))


if __name__ == "__main__":
    main()
