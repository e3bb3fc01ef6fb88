"""Recompute the per-map roofline from the CURRENT fused graph (VERDICT
r4 weak #4: the 'speed of light' claim was argued from the round-2
UNFUSED graph's 61.7 GB/map).

Compiles the exact bench-point step (bf16 + pallas sweep/red kernels)
and reads the compiler's own cost model: bytes accessed (HBM traffic)
and FLOPs. Prints GB/map, the HBM-bandwidth-implied ceiling, and where
the measured rate sits against it.

Run on the chip: python scripts/roofline_fused.py
"""
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from __graft_entry__ import _example_inputs  # noqa: E402
from deep3d_aerial_tpu.models import build_model  # noqa: E402

H = int(os.environ.get("RL_H", "384"))
W = int(os.environ.get("RL_W", "512"))
HBM_GBPS = float(os.environ.get("RL_HBM_GBPS", "819"))  # v5e-class chip
MEASURED = os.environ.get("RL_MEASURED_MAPS_S")  # optional, for the ratio

m = build_model("adamvs", ndepths=(48, 32, 8), num_depth=384,
                dtype=jnp.bfloat16, warp_impl="pallas", red_impl="pallas",
                plane_chunk=8, depth_shards=1)
imgs, rel = _example_inputs(V=5, H=H, W=W)
params = jax.jit(m.init)(jax.random.PRNGKey(0), imgs, rel, 80.0, 120.0)
step = jax.jit(lambda p, i, r: m.apply(p, i, r, 80.0, 120.0)["depth"])
lowered = step.lower(params, imgs, rel)
compiled = lowered.compile()
ca = compiled.cost_analysis()
if isinstance(ca, (list, tuple)):
    ca = ca[0]
bytes_acc = float(ca.get("bytes accessed", float("nan")))
flops = float(ca.get("flops", float("nan")))
mem = compiled.memory_analysis()
out = {
    "H": H, "W": W,
    "bytes_accessed_GB_per_map": round(bytes_acc / 1e9, 3),
    "flops_G_per_map": round(flops / 1e9, 1),
    "arith_intensity_flop_per_byte": round(flops / bytes_acc, 3)
    if bytes_acc else None,
    "hbm_roofline_ms_per_map": round(bytes_acc / (HBM_GBPS * 1e9) * 1e3, 2),
    "hbm_roofline_maps_per_s": round(HBM_GBPS * 1e9 / bytes_acc, 2)
    if bytes_acc else None,
    "temp_alloc_MB": round(
        getattr(mem, "temp_size_in_bytes", 0) / 2**20, 1),
}
if MEASURED:
    meas = float(MEASURED)
    out["measured_maps_per_s"] = meas
    out["pct_of_hbm_roofline"] = round(
        100.0 * meas / out["hbm_roofline_maps_per_s"], 1)
print(json.dumps(out))
