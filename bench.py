"""Benchmark: depth-maps/sec/chip for the flagship AdaMVS cascade.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Operating point mirrors the reference config (BASELINE.md): 5 views, 384
depth hypotheses (cascade 48/32/8 x ratios 4/2/1). The spatial size is set
by BENCH_H/BENCH_W (default 576x768) so a round completes quickly; the
per-pixel rate (Mpix*plane/s) is the hardware-meaningful number and scales
linearly to the reference's full 1856x2752 operating point.

vs_baseline: ratio against the reference GPU path's implied throughput.
The reference publishes no aggregate number (BASELINE.md); we anchor to
0.02 depth-maps/s at the full 1856x2752x384 point (a typical per-image
time of ~50 s/image printed by predict.py on a 2080Ti-class GPU), scaled
to the benchmarked resolution.
"""

import json
import os
import time

import numpy as np


def main():
    import jax

    from __graft_entry__ import _example_inputs
    from deep3d_aerial_tpu.models import build_model

    V = int(os.environ.get("BENCH_VIEWS", "5"))
    H = int(os.environ.get("BENCH_H", "576"))
    W = int(os.environ.get("BENCH_W", "768"))
    reps = int(os.environ.get("BENCH_REPS", "3"))

    model = build_model("adamvs", ndepths=(48, 32, 8), num_depth=384)
    imgs, rel = _example_inputs(V=V, H=H, W=W)
    params = model.init(jax.random.PRNGKey(0), imgs, rel, 80.0, 120.0)

    @jax.jit
    def fn(p, imgs, rel):
        out = model.apply(p, imgs, rel, 80.0, 120.0)
        return out["depth"], out["photometric_confidence"]

    d, c = fn(params, imgs, rel)
    d.block_until_ready()  # compile + warm up

    t0 = time.perf_counter()
    for _ in range(reps):
        d, c = fn(params, imgs, rel)
    d.block_until_ready()
    dt = (time.perf_counter() - t0) / reps

    maps_per_s = 1.0 / dt

    # anchor: ~50 s/image on the reference GPU at 1856x2752; scale by area
    ref_full_rate = 1.0 / 50.0
    scale = (1856 * 2752) / (H * W)
    baseline_rate = ref_full_rate * scale

    print(json.dumps({
        "metric": f"adamvs_depth_maps_per_s_{V}view_384depth_{H}x{W}",
        "value": round(maps_per_s, 4),
        "unit": "depth_maps/s/chip",
        "vs_baseline": round(maps_per_s / baseline_rate, 3),
    }))


if __name__ == "__main__":
    main()
