"""Benchmark: depth-maps/sec/chip for the flagship AdaMVS cascade.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Operating point mirrors the reference config (BASELINE.md): 5 views, 384
depth hypotheses (cascade 48/32/8 x ratios 4/2/1). Spatial size via
BENCH_H/BENCH_W (default 384x512); per-map time scales ~linearly with area
toward the reference's full 1856x2752 point.

Timing note: this TPU is reached through a relay where
`block_until_ready` does not reliably round-trip, so timing uses a
DATA-DEPENDENT chain of steps (each step consumes a scalar produced by the
previous one) closed by a single pre-compiled scalar fetch — the only
honest clock through an async tunnel. Rate = (t_long - t_short) / (N - 1).

vs_baseline is an ASSUMPTION-ANCHORED estimate, not a measured ratio: the
reference publishes no timing (BASELINE.md), so it anchors to an assumed
~50 s/image full-res single-GPU rate (2080Ti-class, per-image time scale
printed by predict.py), scaled by area. The JSON carries
"vs_baseline_assumed": true so the number cannot be read as beating a
measured reference.
"""

import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _example_inputs
    from deep3d_aerial_tpu.models import build_model

    V = int(os.environ.get("BENCH_VIEWS", "5"))
    H = int(os.environ.get("BENCH_H", "384"))
    W = int(os.environ.get("BENCH_W", "512"))
    n_short = int(os.environ.get("BENCH_SHORT", "1"))
    n_long = int(os.environ.get("BENCH_LONG", "6"))

    import jax.numpy as _jnp

    # default bf16 features (geometry stays f32 — docs/PERF.md): the
    # measured-best configuration, 14.31 vs 12.99 maps/s in f32
    dtype = {"float32": _jnp.float32, "bfloat16": _jnp.bfloat16}[
        os.environ.get("BENCH_DTYPE", "bfloat16")
    ]
    model_name = os.environ.get("BENCH_MODEL", "adamvs")
    warp_impl = os.environ.get("BENCH_WARP", "pallas")
    batch = int(os.environ.get("BENCH_BATCH", "1"))
    extra = {}
    if model_name in ("adamvs", "msrednet"):
        # A/B knobs: planes per scan chunk, blocked-recurrence depth shards
        extra["plane_chunk"] = int(os.environ.get("BENCH_CHUNK", "8"))
        extra["depth_shards"] = int(os.environ.get("BENCH_SHARDS", "1"))
    if model_name in ("adamvs", "msrednet"):
        # fused recurrent-regularizer kernels (RedStep2 ops/pallas_red;
        # RedStep4 ops/pallas_red4); follow the warp impl by default
        extra["red_impl"] = os.environ.get(
            "BENCH_RED", "pallas" if warp_impl == "pallas" else "flax")
    model = build_model(model_name, ndepths=(48, 32, 8), num_depth=384,
                        dtype=dtype, warp_impl=warp_impl, **extra)
    imgs, rel = _example_inputs(V=V, H=H, W=W)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), imgs, rel, 80.0, 120.0)

    if batch > 1:
        # B ref views per step, UNROLLED (not vmap: vmap turns the pallas
        # kernel's lax.cond coverage fallback into select-both-branches —
        # measured 1.44 maps/s vs 14.3 at batch=1, docs/PERF.md)
        imgs = jnp.broadcast_to(imgs[None], (batch,) + imgs.shape)
        rel = jnp.broadcast_to(rel[None], (batch,) + rel.shape)

        @jax.jit
        def step(p, imgs, rel, feedback):
            outs = [model.apply(p, imgs[i] + feedback, rel[i], 80.0, 120.0)
                    for i in range(batch)]
            d = jnp.stack([o["depth"] for o in outs])
            conf = jnp.stack([o["photometric_confidence"] for o in outs])
            return d, conf, jnp.mean(d) * 1e-12

        fetch = jax.jit(lambda d: d[0, 0, 0])
    else:

        @jax.jit
        def step(p, imgs, rel, feedback):
            out = model.apply(p, imgs + feedback, rel, 80.0, 120.0)
            d = out["depth"]
            # tiny scalar derived from the result chains the next input
            return d, out["photometric_confidence"], jnp.mean(d) * 1e-12

        fetch = jax.jit(lambda d: d[0, 0])

    def run_chain(n):
        fb = jnp.float32(0.0)
        t0 = time.perf_counter()
        d = None
        for _ in range(n):
            d, c, fb = step(params, imgs, rel, fb)
        _ = float(fetch(d))  # true sync: host readback of a chained value
        return time.perf_counter() - t0

    # compile everything (step + fetch) before timing
    run_chain(1)
    run_chain(1)

    t_short = min(run_chain(n_short) for _ in range(2))
    t_long = min(run_chain(n_long) for _ in range(2))
    dt = max((t_long - t_short) / (n_long - n_short), 1e-9)

    maps_per_s = batch / dt

    ref_full_rate = 1.0 / 50.0
    scale = (1856 * 2752) / (H * W)
    baseline_rate = ref_full_rate * scale

    print(json.dumps({
        "metric": (f"{model_name}_depth_maps_per_s_{V}view_384depth_{H}x{W}"
                   + ("_pallas" if warp_impl == "pallas" else "")),
        "value": round(maps_per_s, 4),
        "unit": "depth_maps/s/chip",
        # anchored to an ASSUMED ~50 s/image full-res reference GPU rate
        # (the reference publishes no timing — BASELINE.md), area-scaled
        "vs_baseline": round(maps_per_s / baseline_rate, 3),
        "vs_baseline_assumed": True,
    }))


if __name__ == "__main__":
    main()
