"""Capture a jax.profiler device trace of the flagship AdaMVS forward at
the bench operating point (bf16 + both Pallas kernels), then feed the
output dir to scripts/trace_breakdown.py. Runs on the real chip; the
axon relay supports profiling (verified round 2)."""
import os, sys, glob
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
from deep3d_aerial_tpu.models import build_model
from deep3d_aerial_tpu.utils.profiling import profile_fn


def _example_inputs(V=5, H=384, W=512, seed=0):
    from deep3d_aerial_tpu.geometry.camera import (
        Pose, proj_matrix, stage_relative_projections)

    rng = np.random.default_rng(seed)
    K = np.array([[150.0, 0, W / 2], [0, 150.0, H / 2], [0, 0, 1.0]])
    projs = []
    for _ in range(V):
        R_down = np.array([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]])
        center = np.array([rng.uniform(-8, 8), rng.uniform(-8, 8), 100.0])
        pose = Pose(R_down, -R_down @ center)
        projs.append(proj_matrix(K, pose))
    rel = stage_relative_projections(np.stack(projs), 3)
    imgs = rng.normal(size=(V, H, W, 3)).astype(np.float32)
    return jnp.asarray(imgs), jnp.asarray(rel, jnp.float32)


H = int(os.environ.get("TRACE_H", "384"))
W = int(os.environ.get("TRACE_W", "512"))
m = build_model("adamvs", ndepths=(48, 32, 8), num_depth=384,
                dtype=jnp.bfloat16, warp_impl="pallas", red_impl="pallas",
                plane_chunk=8, depth_shards=1)
imgs, rel = _example_inputs(V=5, H=H, W=W)
params = jax.jit(m.init)(jax.random.PRNGKey(0), imgs, rel, 80.0, 120.0)
step = jax.jit(lambda p, i, r: m.apply(p, i, r, 80.0, 120.0)["depth"])
dt, _ = profile_fn(step, params, imgs, rel, warmup=3, iters=3,
                   trace_dir="/tmp/trace_out")
print("mean s/iter:", dt)
print(glob.glob("/tmp/trace_out/**/*", recursive=True)[:10])
